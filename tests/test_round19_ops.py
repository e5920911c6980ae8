"""Round-19 operator tests: the VARIANT JSON path pin (encoding switch is
semantics-preserving vs the get_json_object form), the SQL-defined
function pair (scalar UDF inlines into the plan with no Python boundary;
table UDTF conserves cents exactly across the fan-out), plus pins for the
transformWithStateInPandas sessionizer (timer-fired eviction), statestore
reconciliation, and compaction-apply (added as those land this round).

Same discipline as test_round15..18_ops: every scale claim gets an
executable plan pin and every result gets an independent twin."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from cdc_dedupe_spark.queries.registry import REGISTRY
from cdc_dedupe_spark.tables import table


def _pdf(df, cols):
    return (
        df.toPandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# fn_json_variant — VARIANT encoding is semantics-preserving


def test_variant_matches_get_json_object_form(spark, sf_dir):
    """The binary-VARIANT extraction must be row-identical to the string
    re-parse form (fn_json's get_json_object) on the shared columns —
    the pin that makes the encoding switch safe to roll out."""
    via_variant = REGISTRY["fn_json_variant"].spark(spark, sf_dir)
    ev = table(spark, sf_dir, "events")
    via_string = ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("double").alias("k_dbl"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )
    cols = ["event_id", "k_int", "k_str", "k_dbl", "missing"]
    pd.testing.assert_frame_equal(_pdf(via_variant, cols), _pdf(via_string, cols))


def test_variant_missing_path_is_null_not_error(spark, sf_dir):
    """try_variant_get on an absent path yields NULL for every row (the
    try_ contract; the throwing form would fail the whole scan)."""
    out = REGISTRY["fn_json_variant"].spark(spark, sf_dir)
    assert out.filter(F.col("missing").isNotNull()).count() == 0
    assert out.filter(F.col("k_int").isNull()).count() == 0


# ---------------------------------------------------------------------------
# fn_sql_udf_scalar — SQL UDF inlines: no Python boundary in the plan


def test_sql_udf_plan_has_no_python_boundary(spark, sf_dir):
    """The CREATE FUNCTION body must be inlined into the Catalyst plan:
    no BatchEvalPython / ArrowEvalPython / PythonUDF node anywhere —
    that absence IS the scale claim (codegen'd expression, zero
    serialization boundary), vs udf_python whose plan carries one."""
    out = REGISTRY["fn_sql_udf_scalar"].spark(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan
    # and the inlined arithmetic matches the hand-written expression
    li = table(spark, sf_dir, "lineitem")
    twin = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(
            F.round(F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100)
            .cast("long")
        ).cast("long").alias("disc_cents"),
    )
    cols = ["l_returnflag", "n_items", "disc_cents"]
    pd.testing.assert_frame_equal(_pdf(out, cols), _pdf(twin, cols))


# ---------------------------------------------------------------------------
# fn_sql_udtf_table — exact conservation across the lateral fan-out


def test_sql_udtf_conserves_cents_and_fans_out_exactly(spark, sf_dir):
    """Summing the 4 installments over all orders must reproduce the
    total order cents EXACTLY (div + remainder-spread arithmetic), and
    every order contributes exactly 4 rows."""
    out = REGISTRY["fn_sql_udtf_table"].spark(spark, sf_dir).toPandas()
    o = table(spark, sf_dir, "orders")
    n_orders = o.count()
    total_cents = (
        o.select(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c")
        ).toPandas()["c"][0]
    )
    assert sorted(out["installment"]) == [1, 2, 3, 4]
    assert (out["n_orders"] == n_orders).all()
    assert int(out["total_cents"].sum()) == int(total_cents)
    # remainder spread: installment 1 carries >= installment 4's total
    by_i = out.set_index("installment")["total_cents"]
    assert by_i[1] >= by_i[4]


def test_sql_udtf_plan_has_no_python_boundary(spark, sf_dir):
    """The SQL table function must also inline — the LATERAL fan-out is
    codegen'd explode, not a Python UDTF eval node."""
    out = REGISTRY["fn_sql_udtf_table"].spark(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan


# ---------------------------------------------------------------------------
# pipeline_compaction_apply — the rewrite honors the plan's bin layout


def test_compaction_apply_file_count_equals_plan_bins(spark, sf_dir):
    """The OPTIMIZE contract (VERDICT r18 ask #5): after the rewrite,
    the physical file count under the compacted table equals the plan's
    bin count exactly — one output file per (lang, bin_id) bin — and
    the read-back rollup agrees with the plan's per-bin audit."""
    import os

    plan = REGISTRY["pipeline_compaction_plan"].spark(spark, sf_dir).toPandas()
    applied = REGISTRY["pipeline_compaction_apply"].spark(spark, sf_dir).toPandas()
    bins = plan[["lang", "bin_id"]].drop_duplicates()
    assert len(applied) == len(bins)

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    root = os.path.join(wh, "compacted_corpus")
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert len(files) == len(bins), (len(files), len(bins))

    # read-back bin payloads equal the plan's (same aggregation grain)
    plan_bins = (
        plan.groupby(["lang", "bin_id"], as_index=False)
        .agg(bin_docs=("bin_docs", "first"), bin_bytes=("bin_bytes", "first"),
             bin_inputs=("bin_inputs", "first"))
        .sort_values(["lang", "bin_id"])
        .reset_index(drop=True)
    )
    got = (
        applied[["lang", "bin_id", "bin_docs", "bin_bytes", "bin_inputs"]]
        .sort_values(["lang", "bin_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, plan_bins[["lang", "bin_id", "bin_docs", "bin_bytes", "bin_inputs"]]
    )


def test_compaction_apply_no_file_exceeds_two_targets(spark, sf_dir):
    """Every rewritten bin's payload respects the greedy binning bound:
    a bin exceeds the ~16 KB target only when a SINGLE input unit does
    (greedy running-total binning never splits a unit)."""
    from cdc_dedupe_spark.queries.pipeline_ops import _COMPACT_TARGET, _compaction_bins

    b = _compaction_bins(spark, sf_dir).toPandas()
    per_bin = b.groupby(["lang", "bin_id"])["part_bytes"].sum()
    single = b.groupby(["lang", "bin_id"])["part_bytes"].max()
    over = per_bin[per_bin > 2 * _COMPACT_TARGET]
    for key in over.index:
        assert single[key] > _COMPACT_TARGET, (key, per_bin[key], single[key])


# ---------------------------------------------------------------------------
# stream_sessionize_state_tws — timer-fired eviction (arbitrary state v2)


def test_tws_session_closed_by_timer_with_no_further_input(spark, tmp_path):
    """The case the v1 fold CANNOT express (VERDICT r18 ask #1): user A
    sends events only in batch 1; batch 2 carries only user B's much
    later event, which advances the event-time watermark past A's
    gap timer — A's open session must be closed BY THE TIMER, with no
    further input rows for A ever arriving."""
    from cdc_dedupe_spark.queries.streaming import sessionize_tws
    from cdc_dedupe_spark.streaming.pb_shim import ensure_tws_protobuf
    from cdc_dedupe_spark.streaming.run import run_to_memory

    ensure_tws_protobuf(spark)
    d = tmp_path / "tws_stream"
    spark.createDataFrame(
        [(1, 1_000_000, "a1"), (1, 1_060_000, "a2"), (2, 1_000_000, "b1")],
        "user_id long, ts_ms long, event_id string",
    ).coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame(
        [(2, 9_000_000, "b2")], "user_id long, ts_ms long, event_id string"
    ).coalesce(1).write.parquet(str(d / "b2"))

    stream = (
        spark.readStream.schema("user_id long, ts_ms long, event_id string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d / "b*"))
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )
    out = run_to_memory(
        sessionize_tws(stream), "tws_timer_test", output_mode="update",
        state_store="rocksdb",
    ).toPandas()

    a = out[out.user_id == 1].sort_values("emit_seq")
    # batch-1 snapshot: open session, nothing closed yet
    assert not a.iloc[0].via_timer and a.iloc[0].n_closed == 0
    # final emission: TIMER-fired, session now closed, state drained
    last_a = a.iloc[-1]
    assert bool(last_a.via_timer), out.to_string()
    assert last_a.n_closed == 1 and last_a.n_sessions == 1
    assert last_a.n_events == 2 and last_a.total_duration_us == 60_000_000
    # user B: gap closure happened IN the fold (second event arrived),
    # two sessions total, only the first closed by arrival-time gap
    b = out[out.user_id == 2].sort_values("emit_seq")
    assert b.iloc[-1].n_sessions == 2
    assert not b.iloc[-1].via_timer


def test_tws_stale_timer_after_session_extension_is_noop(spark, tmp_path):
    """A timer armed for an earlier open_last must NOT close a session
    that a newer batch extended: batch 2 extends A's session (gap not
    elapsed), so the only closure comes from the re-armed timer at the
    NEW expiry; the session survives as one."""
    from cdc_dedupe_spark.queries.streaming import sessionize_tws
    from cdc_dedupe_spark.streaming.pb_shim import ensure_tws_protobuf
    from cdc_dedupe_spark.streaming.run import run_to_memory

    ensure_tws_protobuf(spark)
    d = tmp_path / "tws_stream2"
    spark.createDataFrame(
        [(1, 1_000_000, "a1")], "user_id long, ts_ms long, event_id string"
    ).coalesce(1).write.parquet(str(d / "b1"))
    # 10 minutes later: inside the 30-minute gap -> same session
    spark.createDataFrame(
        [(1, 1_600_000, "a2")], "user_id long, ts_ms long, event_id string"
    ).coalesce(1).write.parquet(str(d / "b2"))

    stream = (
        spark.readStream.schema("user_id long, ts_ms long, event_id string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d / "b*"))
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )
    out = run_to_memory(
        sessionize_tws(stream), "tws_timer_test2", output_mode="update",
        state_store="rocksdb",
    ).toPandas()
    last = out[out.user_id == 1].sort_values("emit_seq").iloc[-1]
    assert last.n_sessions == 1 and last.n_events == 2
    assert last.total_duration_us == 600_000_000


# ---------------------------------------------------------------------------
# stream_state_reconcile — statestore reader audits


def test_statestore_rows_reconcile_with_streaming_sink(spark, sf_dir):
    """The state store's rows must agree with what the streaming query
    EMITTED (state is the source of truth the sink was derived from):
    reconcile the statestore-reader result against the
    stream_user_features sink fold, column for column."""
    st = REGISTRY["stream_state_reconcile"].spark(spark, sf_dir)
    sink = REGISTRY["stream_user_features"].spark(spark, sf_dir)
    cols = ["user_id", "n_events", "n_purchases", "n_types",
            "spend_cents", "last_seen_us"]
    pd.testing.assert_frame_equal(_pdf(st, cols), _pdf(sink, cols))


def test_statestore_partition_rowcount_audit(spark, sf_dir):
    """Per-partition state-row-count audit (VERDICT r18 ask #2): the
    counts must sum to the distinct-user total (no partition dropped or
    double-read) and the store must actually spread across partitions —
    the state-sizing signal an operator reads before re-sharding."""
    import hashlib
    import os
    import tempfile

    # the declared query just ran in-session (or runs now) and leaves
    # its checkpoint at a deterministic path per sf_dir
    REGISTRY["stream_state_reconcile"].spark(spark, sf_dir).count()
    ckpt = os.path.join(
        tempfile.gettempdir(),
        f"cdc_dedupe_state_reconcile_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    st = spark.read.format("statestore").option("path", ckpt).load()
    per_part = st.groupBy("partition_id").count().toPandas()
    n_users = (
        table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert int(per_part["count"].sum()) == n_users
    assert len(per_part) > 1  # spread, not a single hot store
    # every state partition id is within the stream's shuffle width
    assert per_part["partition_id"].between(0, 7).all()


# ---------------------------------------------------------------------------
# stream_user_features_bootstrap — initial-state warm start


def test_bootstrap_emits_initial_state_only_users(spark, tmp_path):
    """A user whose events are ALL in the historical batch (never seen
    by the stream) must still surface in the final snapshot, carrying
    exactly the batch-seeded values — the timer-driven emission path
    for initial-state-only keys."""
    from cdc_dedupe_spark.queries.streaming import features_bootstrap_plan
    from cdc_dedupe_spark.streaming.pb_shim import ensure_tws_protobuf
    from cdc_dedupe_spark.streaming.run import run_to_memory

    ensure_tws_protobuf(spark)
    historical = spark.createDataFrame(
        [
            (99, "purchase", 12.5, "2024-01-30 10:00:00"),
            (99, "view", 0.0, "2024-01-30 10:01:00"),
            (1, "click", 0.0, "2024-01-30 10:00:00"),
        ],
        "user_id long, event_type string, value double, ts_str string",
    ).withColumn("ts", F.col("ts_str").cast("timestamp")).drop("ts_str")
    d = tmp_path / "boot_stream"
    spark.createDataFrame(
        [(1, "purchase", 2.0, "2024-01-30 11:00:00")],
        "user_id long, event_type string, value double, ts_str string",
    ).withColumn("ts", F.col("ts_str").cast("timestamp")).drop("ts_str").write.parquet(str(d))
    stream = spark.readStream.schema(
        "user_id long, event_type string, value double, ts timestamp"
    ).parquet(str(d))
    out = run_to_memory(
        features_bootstrap_plan(historical, stream),
        "boot_test", output_mode="update", state_store="rocksdb",
    ).toPandas()
    final = (
        out.sort_values("emit_seq").groupby("user_id").last().reset_index()
    )
    u99 = final[final.user_id == 99].iloc[0]
    assert u99.n_events == 2 and u99.n_purchases == 1
    assert u99.n_types == 2 and u99.spend_cents == 1250
    # streamed user merges batch seed + live fold
    u1 = final[final.user_id == 1].iloc[0]
    assert u1.n_events == 2 and u1.n_purchases == 1
    assert u1.n_types == 2 and u1.spend_cents == 200


# ---------------------------------------------------------------------------
# stream_recent_events_liststate — bounded buffer across batches


def test_liststate_buffer_truncates_and_merges_across_batches(spark, tmp_path):
    """Batch 2's newer events must displace batch 1's older ones; the
    buffer never exceeds K rows per user."""
    from cdc_dedupe_spark.queries.streaming import (
        _RECENT_K,
        RecentEventsProcessor,
        _RECENT_OUT,
    )
    from cdc_dedupe_spark.streaming.pb_shim import ensure_tws_protobuf
    from cdc_dedupe_spark.streaming.run import run_to_memory

    ensure_tws_protobuf(spark)
    d = tmp_path / "recent_stream"
    spark.createDataFrame(
        [(1, 1_000_000 + i, i) for i in range(4)],
        "user_id long, ts_ms long, event_id long",
    ).coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame(
        [(1, 2_000_000, 9), (1, 2_000_001, 8)],
        "user_id long, ts_ms long, event_id long",
    ).coalesce(1).write.parquet(str(d / "b2"))
    stream = (
        spark.readStream.schema("user_id long, ts_ms long, event_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d / "b*"))
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withColumn("ts_us", F.col("ts_ms") * 1000)
        .withWatermark("ts", "0 seconds")
    )
    folded = stream.groupBy("user_id").transformWithStateInPandas(
        RecentEventsProcessor(),
        outputStructType=_RECENT_OUT,
        outputMode="Update",
        timeMode="EventTime",
    )
    out = run_to_memory(
        folded, "recent_test", output_mode="update", state_store="rocksdb"
    ).toPandas()
    final = out[out.emit_seq == out.emit_seq.max()].sort_values("rank")
    assert len(final) == _RECENT_K
    # the two batch-2 events lead; the single survivor from batch 1 is id 3
    assert final.event_id.tolist() == [8, 9, 3]


# ---------------------------------------------------------------------------
# stream_user_counts_mapstate — point updates accumulate across batches


def test_mapstate_counts_accumulate_across_batches(spark, tmp_path):
    """User 1's counter must carry across micro-batches (point update on
    the existing entry), and n_users_tracked reflects the full map."""
    from cdc_dedupe_spark.queries.streaming import UserCountsProcessor, _MAPC_OUT
    from cdc_dedupe_spark.streaming.pb_shim import ensure_tws_protobuf
    from cdc_dedupe_spark.streaming.run import run_to_memory

    ensure_tws_protobuf(spark)
    d = tmp_path / "mapc_stream"
    spark.createDataFrame(
        [("click", 1_000_000, 1), ("click", 1_000_001, 1), ("click", 1_000_002, 2)],
        "event_type string, ts_ms long, user_id long",
    ).coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame(
        [("click", 2_000_000, 1), ("click", 2_000_001, 3)],
        "event_type string, ts_ms long, user_id long",
    ).coalesce(1).write.parquet(str(d / "b2"))
    stream = (
        spark.readStream.schema("event_type string, ts_ms long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d / "b*"))
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("ts", "0 seconds")
    )
    folded = stream.groupBy("event_type").transformWithStateInPandas(
        UserCountsProcessor(),
        outputStructType=_MAPC_OUT,
        outputMode="Update",
        timeMode="EventTime",
    )
    out = run_to_memory(
        folded, "mapc_test", output_mode="update", state_store="rocksdb"
    ).toPandas()
    final = out[out.emit_seq == out.emit_seq.max()].set_index("user_id")
    assert final.loc[1, "n_events"] == 3  # 2 (batch 1) + 1 (batch 2)
    assert final.loc[2, "n_events"] == 1
    assert final.loc[3, "n_events"] == 1
    assert (final["n_users_tracked"] == 3).all()


# ---------------------------------------------------------------------------
# state TTL — the other v2 eviction mechanism (wall-clock expiry)


def test_value_state_ttl_expires_between_processing_time_triggers(spark, tmp_path):
    """ValueState created with ttlDurationMs must be GONE after the TTL
    elapses in wall-clock time: batch 1 seeds a counter, the second file
    arrives after > TTL, and the batch-2 fold sees no prior state — the
    counter restarts instead of accumulating. (The declared queries use
    timers for *semantic* eviction; TTL is the *operational* backstop
    that caps state lifetime even when no timer logic exists.)"""
    import time

    from pyspark.sql.streaming import StatefulProcessor
    from cdc_dedupe_spark.streaming.pb_shim import ensure_tws_protobuf
    from cdc_dedupe_spark.streaming.run import (
        STATE_STORE_PROVIDERS,
        _PROVIDER_CONF,
    )

    ensure_tws_protobuf(spark)

    class TtlCounter(StatefulProcessor):
        def init(self, handle):
            self.count = handle.getValueState("c", "n LONG", ttlDurationMs=1000)

        def close(self):
            pass

        def handleInputRows(self, key, rows, timerValues):
            n_new = sum(len(p) for p in rows)
            had_state = self.count.exists()
            base = self.count.get()[0] if had_state else 0
            self.count.update((base + n_new,))
            yield pd.DataFrame(
                [{"user_id": key[0], "n": base + n_new, "had_state": had_state}]
            )

    d = tmp_path / "ttl_stream"
    d.mkdir()
    spark.createDataFrame(
        [(1, 1_000_000)], "user_id long, ts_ms long"
    ).coalesce(1).write.parquet(str(d / "b1"))

    stream = (
        spark.readStream.schema("user_id long, ts_ms long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d / "b*"))
    )
    folded = stream.groupBy("user_id").transformWithStateInPandas(
        TtlCounter(),
        outputStructType="user_id long, n long, had_state boolean",
        outputMode="Update",
        timeMode="ProcessingTime",
    )
    prev_provider = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, STATE_STORE_PROVIDERS["rocksdb"])
    try:
        q = (
            folded.writeStream.format("memory")
            .queryName("ttl_test")
            .outputMode("update")
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        deadline = time.time() + 60
        while not q.recentProgress and time.time() < deadline:
            time.sleep(0.2)
        time.sleep(2.5)  # > TTL since batch-1 state write
        spark.createDataFrame(
            [(1, 2_000_000), (1, 2_000_001)], "user_id long, ts_ms long"
        ).coalesce(1).write.parquet(str(d / "b2"))
        while time.time() < deadline:
            if spark.sql("SELECT count(*) FROM ttl_test").first()[0] >= 2:
                break
            time.sleep(0.3)
        q.stop()
        q.awaitTermination()
    finally:
        if prev_provider is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prev_provider)
    out = spark.table("ttl_test").toPandas()
    assert len(out) == 2, out.to_string()
    b1 = out[out.n == 1].iloc[0]
    b2 = out[out.n == 2].iloc[0]
    assert not b1.had_state  # fresh key
    assert not b2.had_state, out.to_string()  # TTL evicted batch-1 state


# ---------------------------------------------------------------------------
# stream_state_reshard — the migration widened the store without loss


def test_reshard_widens_partitions_and_conserves_rows(spark, sf_dir):
    """After stream_state_reshard, the target checkpoint's state must
    span MORE partitions than the 8-wide source (the re-shard actually
    happened) with identical row totals and identical per-user values."""
    import hashlib
    import os
    import tempfile

    from cdc_dedupe_spark.queries.streaming import (
        features_from_state,
        user_features_ckpt_path,
        user_features_state_raw,
    )

    out = REGISTRY["stream_state_reshard"].spark(spark, sf_dir)
    dig = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    src_ckpt = user_features_ckpt_path(sf_dir)
    dst_ckpt = os.path.join(
        tempfile.gettempdir(), f"cdc_dedupe_state_reshard_{dig}"
    )
    src = spark.read.format("statestore").option("path", src_ckpt).load()
    dst = (
        spark.read.format("statestore")
        .option("path", dst_ckpt)
        .option("stateVarName", "feat")
        .load()
    )
    src_parts = {r.partition_id for r in src.select("partition_id").distinct().collect()}
    dst_parts = {r.partition_id for r in dst.select("partition_id").distinct().collect()}
    assert max(src_parts) <= 7
    assert max(dst_parts) > 7  # state now lives beyond the old width
    assert src.count() == dst.count()
    # values identical through the migration: reshard output == the
    # source store's feature projection
    cols = ["user_id", "n_events", "n_purchases", "n_types",
            "spend_cents", "last_seen_us"]
    src_feats = features_from_state(user_features_state_raw(spark, src_ckpt))
    pd.testing.assert_frame_equal(_pdf(out, cols), _pdf(src_feats, cols))
