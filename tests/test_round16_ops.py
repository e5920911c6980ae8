"""Round-16 operator tests: changelog MERGE apply, outer-join exact
audit, and the spacesaving guaranteed-subset projection.

Same discipline as test_round10/15_ops: each operator gets an independent
pure-python twin plus at least one semantic property it exists to provide,
and the scale claims get executable plan pins."""

from __future__ import annotations

import contextlib
import io
import uuid

import pandas as pd

from pyspark.sql import functions as F

from cdc_dedupe_spark.queries.registry import REGISTRY


# ---------------------------------------------------------------------------
# cdc_merge_apply (r16)


def _merge_folds(sf_dir):
    """Python twin of the two last-wins folds: returns (base, chg) dicts
    user_id -> (n_versions, last_ts_us, last_event_id, last_cents).
    The change batch mirrors the fixture: second-half events minus the
    %5=4 keep cohort, plus the %11=5 cohort re-keyed to -(id+1)."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ts_us = ev.ts.astype("datetime64[us]").astype("int64")
    day = ts_us // 86_400_000_000
    mid = (day.min() + day.max() + 1) // 2
    cents = (ev.value * 100).round().astype("int64")

    def fold(rows):
        out = {}
        for uid, t, eid, c in sorted(rows, key=lambda r: (r[1], r[2])):
            n = out.get(uid, (0,))[0]
            out[uid] = (n + 1, t, eid, c)
        # last_ts_us is MAX(ts) while fields follow the (ts, event_id)
        # tie-break; with sorted input both are the final row's values
        return out

    def rows(mask):
        return list(zip(ev.user_id[mask], ts_us[mask], ev.event_id[mask], cents[mask]))

    second = day >= mid
    chg_rows = rows(second & (ev.user_id % 5 != 4)) + [
        (-(uid + 1), t, eid, c) for uid, t, eid, c in rows(second & (ev.user_id % 11 == 5))
    ]
    return fold(rows(day < mid)), fold(chg_rows)


def _c_mod(a, m):
    """C-style % (sign of dividend), matching Spark SQL and DuckDB."""
    r = abs(a) % m
    return -r if a < 0 else r


def test_merge_apply_python_twin_and_action_mix(spark, sf_dir):
    """Independent twin of the full merge: recompute both folds and the
    merge rules (change-wins, %13 tombstones drop, delete-of-absent is a
    no-op, untouched rows 'keep') and require exact equality with the
    round-tripped registry output. The fixture must be non-degenerate:
    all three actions present and at least one base row actually deleted
    (delete-of-absent is corpus-dependent at small sf — pinned
    corpus-independently in test_merge_into_frame_all_paths)."""
    base, chg = _merge_folds(sf_dir)
    expected = {}
    for uid, (n, t, eid, c) in base.items():
        if uid not in chg:
            expected[uid] = (n, t, eid, c, "keep")
    deleted = absent_deletes = 0
    for uid, (n, t, eid, c) in chg.items():
        if _c_mod(uid, 13) == 0:
            deleted += uid in base
            absent_deletes += uid not in base
            continue
        bn = base.get(uid, (0,))[0]
        expected[uid] = (bn + n, t, eid, c, "insert" if uid not in base else "update")

    got = {
        r.user_id: (r.n_versions, r.last_ts_us, r.last_event_id, r.last_cents, r.action)
        for r in REGISTRY["cdc_merge_apply"].spark(spark, sf_dir).collect()
    }
    assert got == expected
    actions = {a for *_, a in got.values()}
    assert actions == {"keep", "insert", "update"}, actions
    assert deleted > 0, "fixture degenerate: no base row was tombstoned"
    assert all(_c_mod(uid, 13) != 0 or uid not in chg for uid in got), "tombstone survived"


def test_merge_into_frame_all_paths(spark):
    """Corpus-independent pin of every MERGE path on a 5-key hand-built
    pair: update, keep, insert, delete-of-present, delete-of-absent."""
    from cdc_dedupe_spark.queries.cdc import merge_into_frame

    cols = ["user_id", "n_versions", "last_ts_us", "last_event_id", "last_cents"]
    base = spark.createDataFrame(
        [(1, 2, 100, 10, 500), (2, 1, 90, 9, 400), (3, 3, 80, 8, 300)], cols
    )
    chg = spark.createDataFrame(
        [
            (1, 1, 200, 20, 600, "u"),  # update
            (3, 1, 210, 21, 700, "d"),  # delete present
            (4, 2, 220, 22, 800, "u"),  # insert
            (5, 1, 230, 23, 900, "d"),  # delete absent -> no-op
        ],
        cols + ["op"],
    )
    got = {
        r.user_id: (r.n_versions, r.last_ts_us, r.last_event_id, r.last_cents, r.action)
        for r in merge_into_frame(base, chg).collect()
    }
    assert got == {
        1: (3, 200, 20, 600, "update"),
        2: (1, 90, 9, 400, "keep"),
        4: (2, 220, 22, 800, "insert"),
    }


def test_merge_join_base_side_exchange_free(spark, sf_dir):
    """The MERGE cost-model pin (VERDICT r15 #4): against a bucketed base
    AND a bucketed change batch the full-outer merge join plans with ZERO
    Exchange (both sides co-located on the entity key); against the same
    base as a plain (non-bucketed) frame an Exchange reappears. At 100 TB
    that exchange is a full shuffle of the base table per apply."""
    from cdc_dedupe_spark.queries.cdc import merge_into_frame

    suffix = uuid.uuid4().hex[:8]
    t_base, t_chg = f"m_base_{suffix}", f"m_chg_{suffix}"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    fold = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.max("ts_us").alias("last_ts_us"),
        F.max("event_id").alias("last_event_id"),
        F.max("cents").alias("last_cents"),
    )
    chg = fold.withColumn(
        "op", F.when(F.col("user_id") % 13 == 0, F.lit("d")).otherwise(F.lit("u"))
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fold.write.bucketBy(8, "user_id").sortBy("user_id").mode(
            "overwrite"
        ).saveAsTable(t_base)
        chg.write.bucketBy(8, "user_id").sortBy("user_id").mode(
            "overwrite"
        ).saveAsTable(t_chg)

        def plan_of(df):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            return buf.getvalue()

        co_located = plan_of(merge_into_frame(spark.table(t_base), spark.table(t_chg)))
        assert "SortMergeJoin" in co_located, co_located
        assert "Exchange" not in co_located, co_located

        unbucketed = plan_of(merge_into_frame(spark.table(t_base).select("*").repartition(16), spark.table(t_chg)))
        assert "Exchange" in unbucketed, unbucketed
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql(f"DROP TABLE IF EXISTS {t_base}")
        spark.sql(f"DROP TABLE IF EXISTS {t_chg}")


# ---------------------------------------------------------------------------
# stream_topk_exact_audit (r16)


def test_topk_exact_audit_matches_python_truth(spark, sf_dir):
    """The audit's SQL-computable columns recomputed in pure python from
    the raw events (per-shard totals, floor(n/k) threshold, truly-heavy
    count), and the two guarantee columns MUST be zero — the fold's
    Space-Saving theorems are order-independent, so any non-zero is an
    implementation bug, not noise."""
    from collections import Counter

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    K = 64
    per_shard = {}
    for uid in ev.user_id:
        per_shard.setdefault(uid % 8, Counter())[uid] += 1
    rows = REGISTRY["stream_topk_exact_audit"].spark(spark, sf_dir).collect()
    assert len(rows) == len(per_shard)
    for r in rows:
        c = per_shard[r.shard]
        n = sum(c.values())
        assert r.n_seen == n
        assert r.thresh_floor == n // K
        assert r.n_heavy_true == sum(1 for v in c.values() if v * K > n)
        assert r.n_heavy_missing == 0
        assert r.n_bound_violations == 0
    assert any(r.n_heavy_true > 0 for r in rows), "fixture degenerate: no heavy keys"


# ---------------------------------------------------------------------------
# cdc_ivm_agg (r16)


def test_ivm_agg_deltas_actually_flow(spark, sf_dir):
    """The oracle's from-scratch recompute vs the Spark side's delta-only
    maintenance is the correctness proof (hash parity in the sweep); this
    unit pins non-degeneracy: the maintained view differs from the base
    view (so the delta path did work), totals stay positive, and entity
    conservation holds — total entities = base + inserts - deletes,
    recomputed independently from the raw events."""
    from cdc_dedupe_spark.queries.cdc import cdc_ivm_agg

    got = {r.event_type: (r.n_entities, r.sum_cents) for r in cdc_ivm_agg(spark, sf_dir).collect()}
    assert got and all(n > 0 and s > 0 for n, s in got.values())

    base, chg = _merge_folds(sf_dir)
    n_expected = (
        len(base)
        + sum(1 for u in chg if u not in base and _c_mod(u, 13) != 0)
        - sum(1 for u in chg if u in base and _c_mod(u, 13) == 0)
    )
    assert sum(n for n, _ in got.values()) == n_expected


# ---------------------------------------------------------------------------
# pipeline_schema_evolution (r16)


def test_schema_evolution_merge_and_pruning(spark, sf_dir):
    """mergeSchema must surface the evolved column as nullable with
    generation-0 rows backfilled NULL (never a mis-bound column), and the
    gen partition column must still prune: a gen=1 filter's scan carries
    the partition predicate so gen=0 files are never read."""
    import os

    from cdc_dedupe_spark.queries.registry import REGISTRY
    from cdc_dedupe_spark.queries.pipeline_ops import _EVO_DIR

    rows = REGISTRY["pipeline_schema_evolution"].spark(spark, sf_dir).collect()
    by_gen = {}
    for r in rows:
        g = by_gen.setdefault(r.gen, [0, 0])
        g[0] += r.n_rows
        g[1] += r.n_null_quality
    assert set(by_gen) == {0, 1}
    assert by_gen[0][0] == by_gen[0][1] > 0  # gen0: every quality is NULL
    assert by_gen[1][1] == 0 and by_gen[1][0] > 0  # gen1: none NULL

    root = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), _EVO_DIR
    )
    merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert dict(merged.dtypes)["quality"] == "bigint"
    pruned = merged.filter(F.col("gen") == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "gen" in plan.split("PartitionFilters")[1][:120], plan


# ---------------------------------------------------------------------------
# pipeline_partition_prune_dynamic (r16)


def test_dpp_prunes_unselected_partitions(spark, sf_dir):
    """Dynamic partition pruning must actually engage: the executed plan
    carries a dynamicpruningexpression on the fact scan's
    PartitionFilters, the returned types are exactly the above-average
    cohort recomputed in python (>=1 selected, >=1 pruned — max > avg >
    min whenever counts differ), and the per-type numbers match a direct
    pandas rollup."""
    from collections import Counter

    from cdc_dedupe_spark.queries.registry import REGISTRY

    df = REGISTRY["pipeline_partition_prune_dynamic"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cnt = Counter(ev.event_type)
    avg = sum(cnt.values()) / len(cnt)
    want_types = {t for t, c in cnt.items() if c > avg}
    rows = {r.event_type: r for r in df.collect()}
    assert set(rows) == want_types
    assert 0 < len(want_types) < len(cnt), "gate degenerate"
    for t in want_types:
        sub = ev[ev.event_type == t]
        assert rows[t].n_rows == len(sub)
        assert rows[t].n_users == sub.user_id.nunique()
        assert rows[t].sum_cents == int((sub.value * 100).round().astype("int64").sum())


# ---------------------------------------------------------------------------
# stream_stream_join_full_outer (r16)


def test_full_outer_purchase_orphan_emission_timing(spark, tmp_path):
    """The purchase-side orphan (a purchase no click preceded within the
    hour) must emit its null-click row only after the watermark passes
    purchase_ts — never in the ingest batch — while a matched pair emits
    watermark-independently and an undecided late purchase never emits."""
    import json, os, time

    src = tmp_path / "src"
    src.mkdir()
    batch0 = [
        {"user_id": 3, "ts": "2024-01-01 10:00:00", "event_type": "purchase"},
        {"user_id": 2, "ts": "2024-01-01 10:00:00", "event_type": "click"},
        {"user_id": 2, "ts": "2024-01-01 10:30:00", "event_type": "purchase"},
    ]
    batch1 = [
        {"user_id": 100, "ts": "2024-01-01 13:00:00", "event_type": "click"},
        {"user_id": 200, "ts": "2024-01-01 13:00:00", "event_type": "purchase"},
    ]
    for i, batch in enumerate([batch0, batch1]):
        p = src / f"{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in batch))
        os.utime(p, (time.time() + i, time.time() + i))

    stream = (
        spark.readStream.schema("user_id long, ts string, event_type string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user_id"), F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 60 MINUTES")),
        "full_outer",
    ).select(
        F.coalesce("user_id", "p_user_id").alias("uid"), "click_ts", "purchase_ts"
    )

    emitted = []

    def sink(bdf, bid):
        for r in bdf.collect():
            emitted.append((bid, r.uid, r.click_ts, r.purchase_ts))

    q = joined.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()

    by_uid = {}
    for bid, uid, cts, pts in emitted:
        by_uid.setdefault(uid, []).append((bid, cts, pts))
    # matched pair: exactly once, both sides present
    assert len(by_uid.get(2, [])) == 1
    assert by_uid[2][0][1] is not None and by_uid[2][0][2] is not None
    # purchase orphan: exactly one row, null click, AFTER the ingest batch
    assert len(by_uid.get(3, [])) == 1
    bid3, cts3, pts3 = by_uid[3][0]
    assert cts3 is None and pts3 is not None
    ingest_bid = min(b for b, *_ in emitted)
    assert bid3 > ingest_bid, f"orphan emitted in ingest batch: {emitted}"
    # undecided late rows never emit
    assert 100 not in by_uid and 200 not in by_uid, emitted


def test_new_streaming_ops_match_under_rocksdb(spark, sf_dir, monkeypatch):
    """The three new state-heavy streaming queries (outer join state,
    session-window merge state, full-outer two-side state) must return
    identical results under SPARK_GRAFT_STATE_STORE=rocksdb — the
    cluster-deploy switch for billion-key state."""
    for name in (
        "stream_stream_join_outer",
        "stream_session_window_native",
        "stream_stream_join_full_outer",
    ):
        q = REGISTRY[name].spark
        # null-safe sort key: outer rows carry None in the padded columns
        key = lambda r: tuple((v is None, v) for v in r)
        monkeypatch.delenv("SPARK_GRAFT_STATE_STORE", raising=False)
        default_rows = sorted(map(tuple, q(spark, sf_dir).collect()), key=key)
        monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "rocksdb")
        rocks_rows = sorted(map(tuple, q(spark, sf_dir).collect()), key=key)
        monkeypatch.delenv("SPARK_GRAFT_STATE_STORE", raising=False)
        assert rocks_rows == default_rows, name


# ---------------------------------------------------------------------------
# pipeline_dq_checks (r16)


def test_dq_checks_match_pandas_twin_and_fire(spark, sf_dir):
    """Every check's counts recomputed in pandas; the suite must be LIVE
    on this corpus (>=1 failing and >=1 passing check) so it demonstrably
    distinguishes rather than rubber-stamping."""
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cu = pd.read_parquet(f"{sf_dir}/customer.parquet")
    expected = {
        "lineitem.pk_unique": (len(li), len(li) - len(li[["l_orderkey", "l_linenumber"]].drop_duplicates())),
        "lineitem.qty_in_1_50": (len(li), int(((li.l_quantity < 1) | (li.l_quantity > 50)).sum())),
        "lineitem.fk_orders": (len(li), int((~li.l_orderkey.isin(od.o_orderkey)).sum())),
        "orders.fk_customer": (len(od), int((~od.o_custkey.isin(cu.c_custkey)).sum())),
        "events.user_id_complete": (len(ev), int(ev.user_id.isna().sum())),
        "events.value_in_0_100": (len(ev), int(((ev.value < 0) | (ev.value >= 100)).sum())),
        "events.event_id_unique": (len(ev), len(ev) - ev.event_id.nunique()),
    }
    got = {
        r.check_name: (r.n_checked, r.n_violations, r.passed)
        for r in REGISTRY["pipeline_dq_checks"].spark(spark, sf_dir).collect()
    }
    assert {k: v[:2] for k, v in got.items()} == expected
    for k, (n, viol, passed) in got.items():
        assert passed == (1 if viol == 0 else 0), k
    verdicts = {p for *_, p in got.values()}
    assert verdicts == {0, 1}, f"suite not live: {got}"
