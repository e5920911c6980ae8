"""Round-17 operator tests: the engine-native optimizer twins —
AQE skew-join splitting (vs the manual salted join) and the runtime
bloom filter (vs the hand-rolled bloom prefilter) — plus the
temp-conf hygiene both rely on.

Same discipline as test_round10/15/16_ops: every scale claim gets an
executable plan pin and every result gets an independent pandas twin."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from cdc_dedupe_spark.queries.registry import REGISTRY
from cdc_dedupe_spark.session import temp_sql_confs
from cdc_dedupe_spark.tables import spread_scan, table


# ---------------------------------------------------------------------------
# join_skew_aqe (r17): OptimizeSkewedJoin must actually split


# The query itself uses 64 KiB / 32 KiB (right for its sf0.1 bench corpus);
# the unit suite runs at sf0.001 where the hot partition compresses to a
# few KiB, so the pin uses proportionally smaller thresholds — the RULE
# under test is threshold-relative either way.
_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2048",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1024",
}


def _skewed_join(spark, sf_dir):
    """The exact join join_skew_aqe materializes, pre-aggregation."""
    li = spread_scan(
        table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    ).select(
        F.when(F.col("l_partkey") % 10 < 3, F.lit(0))
        .otherwise(F.col("l_partkey"))
        .alias("sk"),
        "l_quantity",
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return li.join(p, F.col("sk") == F.col("p_partkey")).select(
        "p_brand", "l_quantity"
    )


def test_skew_join_split_pinned(spark, sf_dir):
    """The planted power-law key (30% of fact rows on partkey 0) must make
    OptimizeSkewedJoin mark and split the straggler partition: the
    executed SortMergeJoin node carries skew=true and the fact-side
    AQEShuffleRead reads skewed partitions. A/B: with skew splitting
    DISABLED under otherwise identical confs, the same join executes
    without the marker — so the pin is the rule firing, not a string
    that happens to be in every plan."""
    joined = _skewed_join(spark, sf_dir)
    with temp_sql_confs(spark, _SKEW_CONFS):
        rows_on = joined.collect()
        plan_on = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan_on, plan_on
    assert "skewed" in plan_on, plan_on  # AQEShuffleRead ... skewed

    joined_b = _skewed_join(spark, sf_dir)
    with temp_sql_confs(
        spark, {**_SKEW_CONFS, "spark.sql.adaptive.skewJoin.enabled": "false"}
    ):
        rows_off = joined_b.collect()
        plan_off = joined_b._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in plan_off

    # splitting must never change the logical result
    assert sorted(map(tuple, rows_on)) == sorted(map(tuple, rows_off))


def test_skew_aqe_rollup_matches_pandas_twin(spark, sf_dir):
    """The registered query's per-brand rollup recomputed independently
    in pandas over the same planted key."""
    got = {
        r.p_brand: (r.n_items, r.sum_qty)
        for r in REGISTRY["join_skew_aqe"].spark(spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"])
    p = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    li["sk"] = li.l_partkey.where(li.l_partkey % 10 >= 3, 0)
    j = li.merge(p, left_on="sk", right_on="p_partkey")
    want = {
        brand: (len(g), int(g.l_quantity.round().astype("int64").sum()))
        for brand, g in j.groupby("p_brand")
    }
    # sum_qty is the _determinism dsum integerization of l_quantity
    # (whole numbers 1..50 in this corpus, so round == identity)
    assert got == want
    # the planted key is genuinely skewed: brand of part 0 carries ~30%
    hot = j[j.sk == 0]
    assert len(hot) > 0.25 * len(j)


def test_temp_sql_confs_restores_and_unsets(spark):
    """Set-then-restore for a pre-existing conf; set-then-unset for a conf
    with no prior value; restoration also runs on exceptions."""
    key_existing = "spark.sql.autoBroadcastJoinThreshold"
    before = spark.conf.get(key_existing)
    key_fresh = "spark.cdc.dedupe.test.round17"
    try:
        spark.conf.get(key_fresh)
        had_fresh = True
    except Exception:
        had_fresh = False
    assert not had_fresh

    with temp_sql_confs(spark, {key_existing: "-1", key_fresh: "x"}):
        assert spark.conf.get(key_existing) == "-1"
        assert spark.conf.get(key_fresh) == "x"
    assert spark.conf.get(key_existing) == before
    try:
        spark.conf.get(key_fresh)
        assert False, "fresh conf should have been unset"
    except Exception:
        pass

    try:
        with temp_sql_confs(spark, {key_existing: "-1"}):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key_existing) == before


# ---------------------------------------------------------------------------
# join_bloom_runtime (r17): InjectRuntimeFilter must plant the probe


_BLOOM_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


def _bloom_join(spark, sf_dir):
    sup = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 9)
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    return li.join(sup, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "l_suppkey", "l_extendedprice"
    )


def test_bloom_runtime_filter_injected(spark, sf_dir):
    """The executed plan must carry the injected bloom: a might_contain
    probe on the fact side fed by a bloom_filter_agg over the selective
    supplier cohort. A/B: with the rule disabled, no probe — and the
    join result is row-identical (the bloom only ever passes extra rows
    to the exact join, never drops)."""
    j = _bloom_join(spark, sf_dir)
    with temp_sql_confs(spark, _BLOOM_CONFS):
        rows_on = j.collect()
        plan_on = j._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan_on, plan_on
    assert "bloom_filter_agg" in plan_on, plan_on

    j_b = _bloom_join(spark, sf_dir)
    with temp_sql_confs(
        spark,
        {**_BLOOM_CONFS, "spark.sql.optimizer.runtime.bloomFilter.enabled": "false"},
    ):
        rows_off = j_b.collect()
        plan_off = j_b._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" not in plan_off

    assert sorted(map(tuple, rows_on)) == sorted(map(tuple, rows_off))


def test_bloom_runtime_rollup_matches_prefilter_twin(spark, sf_dir):
    """join_bloom_runtime and the hand-rolled join_bloom_prefilter declare
    the SAME contract; both must equal the pandas plain-join rollup."""
    native = {
        r.l_suppkey: (r.n_items, r.revenue_cents)
        for r in REGISTRY["join_bloom_runtime"].spark(spark, sf_dir).collect()
    }
    manual = {
        r.l_suppkey: (r.n_items, r.revenue_cents)
        for r in REGISTRY["join_bloom_prefilter"].spark(spark, sf_dir).collect()
    }
    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_extendedprice"])
    keep = set(sup.s_suppkey[sup.s_nationkey == 9])
    j = li[li.l_suppkey.isin(keep)]
    want = {
        k: (len(g), int((g.l_extendedprice * 100).round().astype("int64").sum()))
        for k, g in j.groupby("l_suppkey")
    }
    assert native == want
    assert manual == want


# ---------------------------------------------------------------------------
# r16 outer stream-stream joins: restart-mid-stream recovery (VERDICT r16 #8)


import json
import os
import time

import pytest

from cdc_dedupe_spark.streaming.run import _PROVIDER_CONF, STATE_STORE_PROVIDERS


def _outer_join_stream(spark, src_dir: str, how: str):
    stream = (
        spark.readStream.schema("user_id long, ts string, event_type string")
        .option("maxFilesPerTrigger", "1")
        .json(src_dir)
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
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 60 MINUTES")),
        how,
    ).select(
        F.coalesce("user_id", "p_user_id").alias("uid"), "click_ts", "purchase_ts"
    )


@pytest.mark.parametrize("provider", ["hdfs", "rocksdb"])
@pytest.mark.parametrize("how", ["left_outer", "full_outer"])
def test_outer_join_restart_mid_stream(spark, tmp_path, how, provider):
    """Kill between micro-batches, resume from the checkpoint: the join
    state (an unmatched click, an unmatched purchase, a consumed match)
    must survive the restart intact — the post-restart watermark advance
    evicts the orphans and emits each null-padded row EXACTLY once, the
    pre-restart matched pair is never re-emitted, and nothing is lost.
    The r16 eviction-timing units pinned the emission schedule; this
    pins the recovery path, under both state-store providers."""
    src = tmp_path / "src"
    src.mkdir()
    work = str(tmp_path / "ckpt")

    batch0 = [
        {"user_id": 1, "ts": "2024-01-01 10:00:00", "event_type": "click"},
        {"user_id": 1, "ts": "2024-01-01 10:30:00", "event_type": "purchase"},
        {"user_id": 5, "ts": "2024-01-01 10:00:00", "event_type": "click"},
        {"user_id": 6, "ts": "2024-01-01 10:05:00", "event_type": "purchase"},
    ]
    batch1 = [
        {"user_id": 9, "ts": "2024-01-01 13:00:00", "event_type": "click"},
        {"user_id": 9, "ts": "2024-01-01 13:05:00", "event_type": "purchase"},
    ]

    emitted: list[tuple] = []

    def run_phase(phase: int) -> None:
        def sink(bdf, bid):
            for r in bdf.collect():
                emitted.append((phase, bid, r.uid, r.click_ts, r.purchase_ts))

        with temp_sql_confs(
            spark, {_PROVIDER_CONF: STATE_STORE_PROVIDERS[provider]}
        ):
            q = (
                _outer_join_stream(spark, str(src), how)
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", work)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    p0 = src / "0.json"
    p0.write_text("\n".join(json.dumps(r) for r in batch0))
    run_phase(0)  # drain batch0, then the query STOPS (= kill between batches)

    # pre-restart: watermark is only 10:20 — nothing evicted yet, so the
    # ONLY emission is the matched pair; the orphans are still in state
    rows0 = [(u, c, p) for _, _, u, c, p in emitted]
    assert (1,) == tuple(sorted({u for u, *_ in rows0})), rows0
    assert len(rows0) == 1 and rows0[0][1] is not None and rows0[0][2] is not None

    p1 = src / "1.json"
    p1.write_text("\n".join(json.dumps(r) for r in batch1))
    os.utime(p1, (time.time() + 5, time.time() + 5))
    run_phase(1)  # resume from checkpoint; watermark advance evicts orphans

    by_uid: dict[int, list] = {}
    for phase, bid, uid, cts, pts in emitted:
        by_uid.setdefault(uid, []).append((phase, cts, pts))

    # matched pairs: exactly once each, never re-emitted after restart
    assert len(by_uid[1]) == 1 and by_uid[1][0][0] == 0
    assert len(by_uid[9]) == 1 and by_uid[9][0][0] == 1
    # click orphan: exactly one null-padded row, post-restart
    assert len(by_uid[5]) == 1, by_uid
    ph5, cts5, pts5 = by_uid[5][0]
    assert ph5 == 1 and cts5 is not None and pts5 is None
    # purchase orphan: full outer emits it exactly once post-restart;
    # left outer must NEVER emit the right-side orphan
    if how == "full_outer":
        assert len(by_uid[6]) == 1, by_uid
        ph6, cts6, pts6 = by_uid[6][0]
        assert ph6 == 1 and cts6 is None and pts6 is not None
    else:
        assert 6 not in by_uid, by_uid
    # completeness: nothing else emitted, nothing lost
    want_uids = {1, 5, 9} | ({6} if how == "full_outer" else set())
    assert set(by_uid) == want_uids


# ---------------------------------------------------------------------------
# AQE runtime join-strategy demotion (r17): the third engine-native knob


def test_aqe_runtime_broadcast_conversion(spark, sf_dir):
    """With static broadcast OFF, a statically-planned SortMergeJoin whose
    build side turns out tiny at runtime (selective p_size filter) must be
    CONVERTED to a BroadcastHashJoin by AQE using actual shuffle stats —
    the initial plan says SortMergeJoin, the final executed plan says
    BroadcastHashJoin. This is the runtime half of the broadcast
    discipline SCALING.md's global posture declares; result identity vs
    the conversion-disabled run rides along."""
    def build():
        li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
        p = (
            table(spark, sf_dir, "part")
            .filter(F.col("p_size") == 1)
            .select("p_partkey", "p_brand")
        )
        return li.join(p, F.col("l_partkey") == F.col("p_partkey")).select(
            "p_brand", "l_quantity"
        )

    base = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    j = build()
    with temp_sql_confs(
        spark, {**base, "spark.sql.adaptive.autoBroadcastJoinThreshold": "10m"}
    ):
        rows_on = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    initial = plan.split("== Initial Plan ==")[1] if "== Initial Plan ==" in plan else ""
    assert "SortMergeJoin" in initial, plan
    assert "BroadcastHashJoin" in final, plan

    j_b = build()
    with temp_sql_confs(
        spark, {**base, "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}
    ):
        rows_off = j_b.collect()
        plan_off = j_b._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan_off.split("== Initial Plan ==")[0]
    assert sorted(map(tuple, rows_on)) == sorted(map(tuple, rows_off))


# ---------------------------------------------------------------------------
# bench corpus rechunk (r17): layout changed, values must not


def test_bench_rechunk_value_identity(tmp_path):
    """_maybe_rechunk must produce byte-equal VALUES (same rows, order,
    schema) in >1 row group, cache by source fingerprint, and fall back
    to the original dir when opted out."""
    import os
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.parquet as pq

    import bench

    src = tmp_path / "sfX"
    src.mkdir()
    t = pa.table({"a": list(range(1000)), "b": [f"s{i}" for i in range(1000)]})
    pq.write_table(t, src / "t1.parquet")  # single row group by default

    out, did = bench._maybe_rechunk(str(src), parts=8)
    assert did and out != str(src)
    f = pq.ParquetFile(Path(out) / "t1.parquet")
    assert f.metadata.num_row_groups >= 4
    assert pq.read_table(Path(out) / "t1.parquet").equals(t)

    # cached: second call returns the same directory without rewriting
    out2, did2 = bench._maybe_rechunk(str(src), parts=8)
    assert (out2, did2) == (out, True)

    # opt-out env
    os.environ["SPARK_GRAFT_BENCH_RECHUNK"] = "0"
    try:
        out3, did3 = bench._maybe_rechunk(str(src), parts=8)
        assert (out3, did3) == (str(src), False)
    finally:
        del os.environ["SPARK_GRAFT_BENCH_RECHUNK"]


def test_aqe_partition_coalescing(spark, sf_dir):
    """The fourth AQE runtime feature, completing the pinned set (skew
    split, runtime broadcast conversion, DPP in r16, THIS): a shuffle
    whose 32 hash partitions come out tiny at runtime must be coalesced
    by AQE into fewer post-shuffle partitions — visible as
    'AQEShuffleRead coalesced' in the final executed plan, and as an
    actual reduction of result-stage partitions vs the static width."""
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    with temp_sql_confs(spark, {"spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m"}):
        agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "AQEShuffleRead coalesced" in final, plan


# ---------------------------------------------------------------------------
# curation_domain_blocklist (r17)


def test_domain_blocklist_matches_python_twin_and_broadcasts(spark, sf_dir):
    """Per-source block counts recomputed with an independent pure-python
    suffix matcher over the same derived URLs; the blocked sources are
    exactly the blocklist's (src3/src7/src11 at 100%), the no-op entry
    matches nothing, and the blocklist join is a BROADCAST hash join
    (the list must never shuffle the corpus)."""
    from cdc_dedupe_spark.queries.web_dedup import _BLOCKLIST

    df = REGISTRY["curation_domain_blocklist"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan

    got = {r.source: (r.n_docs, r.n_blocked, r.n_kept) for r in df.collect()}

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    def blocked(source: str) -> bool:
        host = f"{source}.example.com".lower()  # canonical host for every doc
        return any(host == d or host.endswith("." + d) for d in _BLOCKLIST)

    want = {}
    for source, g in docs.groupby("source"):
        b = len(g) if blocked(source) else 0
        want[source] = (len(g), b, len(g) - b)
    assert got == want
    blocked_sources = {s for s in want if want[s][1] > 0}
    assert blocked_sources == {"src3", "src7", "src11"}
    # rate column consistency
    for r in df.collect():
        assert abs(r.block_rate - round(r.n_blocked / r.n_docs, 4)) < 1e-9


# ---------------------------------------------------------------------------
# ann_ivf_recall_curve (r17)


def test_ivf_recall_curve_monotone_and_exact_at_full_probe(spark, sf_dir):
    """Structural guarantees of the IVF tuning curve: candidate mass and
    hits are NON-DECREASING in nprobe (probing more cells can only add
    candidates, and top-k over a superset can only match more of the
    truth it converges to), and at nprobe = #cells (8) the search is
    exhaustive so recall@k is EXACTLY 1.0. A numpy twin recomputes the
    full curve from the raw embeddings."""
    import numpy as np

    rows = {
        r.nprobe: (r.n_candidates, r.hits, r.recall)
        for r in REGISTRY["ann_ivf_recall_curve"].spark(spark, sf_dir).collect()
    }
    assert sorted(rows) == [1, 2, 4, 8]
    for a, b in zip([1, 2, 4], [2, 4, 8]):
        assert rows[a][0] <= rows[b][0]
        assert rows[a][1] <= rows[b][1]
    assert rows[8][2] == 1.0

    # numpy twin (integer-scaled like functions.vector.iscale: round(x*2^14))
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.array([np.array(x) for x in emb.embedding])
    ids = emb.vec_id.to_numpy()
    order = np.argsort(ids)
    v, ids = v[order], ids[order]
    s = np.round(v * (1 << 14)).astype("int64")
    cents = s[ids < 8]
    d2 = ((s[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cid = d2.argmin(axis=1)  # argmin takes lowest index on ties = lowest cid
    K = 10
    want = {p: [0, 0] for p in (1, 2, 4, 8)}  # n_candidates, hits
    for qid in range(8, 16):
        q = s[qid]
        qrank = np.argsort(((cents - q) ** 2).sum(axis=1), kind="stable")
        rank_of_cid = np.empty(8, dtype=int)
        rank_of_cid[qrank] = np.arange(1, 9)
        cos = (s @ q) / (np.sqrt((s * s).sum(axis=1)) * np.sqrt(q @ q))
        cos = np.round(cos, 4)
        mask_not_self = ids != qid
        def topk(mask):
            cand_ids = ids[mask]
            cand_cos = cos[mask]
            o = np.lexsort((cand_ids, -cand_cos))
            return set(cand_ids[o[:K]])
        truth = topk(mask_not_self)
        for p in (1, 2, 4, 8):
            m = mask_not_self & (rank_of_cid[cid] <= p)
            want[p][0] += int(m.sum())
            want[p][1] += len(topk(m) & truth)
    for p in (1, 2, 4, 8):
        assert rows[p][0] == want[p][0], (p, rows[p], want[p])
        assert rows[p][1] == want[p][1], (p, rows[p], want[p])


# ---------------------------------------------------------------------------
# pipeline_incremental_ingest (r17)


def test_incremental_ingest_reads_only_new_files(spark, sf_dir):
    """The manifest mechanics the oracle can't see: round 2's landing
    listing strictly grows, the round-2 increment is disjoint from the
    round-1 file set, per-round counts equal a pandas recomputation of
    the day-split, and the running total is consistent (so no file was
    re-read or missed)."""
    import os

    df = REGISTRY["pipeline_incremental_ingest"].spark(spark, sf_dir)
    rows = df.collect()

    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    day = ev.ts.astype("datetime64[us]").astype("int64") // 86_400_000_000
    mid = (day.min() + day.max() + 1) // 2
    first = ev[day < mid].groupby("event_type").size().to_dict()
    second = ev[day >= mid].groupby("event_type").size().to_dict()

    got = {(r.ingest_round, r.event_type): r.n_rows_ingested for r in rows}
    for t, n in first.items():
        assert got[(1, t)] == n
    for t, n in second.items():
        assert got[(2, t)] == n
    assert len(got) == len(first) + len(second)

    # running totals: every round-2 row carries the grand total
    n1, n2 = sum(first.values()), sum(second.values())
    for r in rows:
        assert r.n_rows_total_after == (n1 if r.ingest_round == 1 else n1 + n2)

    # landing dir holds BOTH generations; a second full read double-counts
    # vs the audit — proving the audit really read only the increments
    landing = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
        "incremental_ingest_landing",
        "landing",
    )
    total_on_disk = spark.read.parquet(landing).count()
    assert total_on_disk == n1 + n2
    assert sum(r.n_rows_ingested for r in rows) == n1 + n2
