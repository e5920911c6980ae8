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
