"""Round-18 operator tests: the cost-based-optimization (CBO) join-reorder
pin — completing the engine-native optimizer family after r16's DPP and
r17's AQE skew-split / runtime bloom pins — plus the ADVICE r17 guard for
pipeline_incremental_ingest's empty-increment round.

Same discipline as test_round15/16/17_ops: every scale claim gets an
executable plan pin and every result gets an independent twin."""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import functions as F

from cdc_dedupe_spark.queries.registry import REGISTRY
from cdc_dedupe_spark.session import temp_sql_confs


# ---------------------------------------------------------------------------
# parity_sweep --golden / --changed plumbing (r18, VERDICT r17 asks #5/#7)


def _sweep_mod():
    import importlib.util
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "parity_sweep.py"
    spec = importlib.util.spec_from_file_location("parity_sweep", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_canon_value_is_bit_and_type_sensitive():
    """The golden hash must distinguish everything the driver's value hash
    does: -0.0 vs 0.0, int vs float, None/NaN collapse, bytes, nesting."""
    import numpy as np

    c = _sweep_mod()._canon_value
    assert c(0.0) != c(-0.0)
    assert c(1) != c(1.0)
    assert c(None) == c(float("nan")) == "\\N"
    assert c(np.float64(-0.0)) == c(-0.0)  # numpy scalars unwrap
    assert c(np.int64(7)) == c(7)
    assert c(b"\x00\xff") == "0x00ff"
    assert c([1, [2.5, None]]) == "[1,[2.5,\\N]]"
    assert c({"b": 1, "a": 2}) == c({"a": 2, "b": 1})  # dict order-free


def test_golden_sample_spans_every_group_with_oracles():
    """Every registry group is represented in GOLDEN_QUERIES and every
    sampled query has an exact oracle (golden is a value-drift tripwire;
    rows-only queries can't pin values)."""
    g = _sweep_mod()
    groups = {REGISTRY[n].group for n in g.GOLDEN_QUERIES}
    assert groups == {q.group for q in REGISTRY.values()}
    assert all(REGISTRY[n].oracle is not None for n in g.GOLDEN_QUERIES)


def test_registry_module_field_maps_to_query_files():
    """--changed maps git-diff paths to defining modules via
    QueryDef.module: every entry must carry a real module under
    cdc_dedupe_spark.queries so a changed file selects its queries."""
    import importlib

    mods = {q.module for q in REGISTRY.values()}
    assert all(m.startswith("cdc_dedupe_spark.queries.") for m in mods), mods
    for m in mods:
        importlib.import_module(m)  # path round-trips
    # the path -> module translation --changed performs
    assert (
        "cdc_dedupe_spark/queries/relational_ext.py".removesuffix(".py").replace("/", ".")
        == REGISTRY["join_cbo_reorder"].module
    )


# ---------------------------------------------------------------------------
# join_cbo_reorder (r18): the DP reorderer must actually reorder


def _cost_blind_join(spark, sf_dir):
    """The exact 4-way join join_cbo_reorder materializes, pre-aggregation,
    in its deliberately fact-first syntactic order."""
    from cdc_dedupe_spark.queries.relational_ext import cbo_tables

    t = cbo_tables(spark, sf_dir)
    li = spark.table(t["lineitem"]).select("l_orderkey", "l_extendedprice")
    o = (
        spark.table(t["orders"])
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    c = (
        spark.table(t["customer"])
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_nationkey")
    )
    n = spark.table(t["nation"]).select("n_nationkey", "n_name")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "l_extendedprice")
    )


def _leaf_order(plan: str) -> list[str]:
    """Catalog-twin leaf tables in order of first appearance in the
    optimized-plan tree string (top-down print = join order, outermost
    probe side first)."""
    out: list[str] = []
    for m in re.finditer(r"cbo_(\w+?)_[0-9a-f]{8}", plan):
        if m.group(1) not in out:
            out.append(m.group(1))
    return out


_CBO_CONFS = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
}


def test_cbo_reorder_demotes_fact_table(spark, sf_dir):
    """With ANALYZE column stats + cbo.joinReorder, the DP reorderer must
    rewrite the fact-first syntactic tree to dims-first: lineitem (the
    fact, written as the FIRST leaf) ends up joined LAST, and the two
    filtered relations join before it. Without CBO the optimized plan
    keeps the syntactic order — that's the A/B the pin grades."""
    with temp_sql_confs(spark, _CBO_CONFS):
        plan_on = (
            _cost_blind_join(spark, sf_dir)._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
    plan_off = (
        _cost_blind_join(spark, sf_dir)._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    on, off = _leaf_order(plan_on), _leaf_order(plan_off)
    assert off[0] == "lineitem", off  # syntactic order survives without CBO
    assert on[0] != "lineitem", plan_on  # CBO demotes the fact table
    assert on[-1] == "lineitem", plan_on  # ... all the way to the last join
    assert set(on) == set(off) == {"lineitem", "orders", "customer", "nation"}


def test_cbo_reorder_result_identity(spark, sf_dir):
    """Reordering must never change semantics: the aggregated result is
    row-identical with CBO on vs off, and matches a pandas recomputation
    from the raw parquet."""
    def agg(df):
        return df.groupBy("n_name").agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "revenue_cents"
            ),
        )

    with temp_sql_confs(spark, _CBO_CONFS):
        got_on = {
            r.n_name: (r.n_items, r.revenue_cents)
            for r in agg(_cost_blind_join(spark, sf_dir)).collect()
        }
    got_off = {
        r.n_name: (r.n_items, r.revenue_cents)
        for r in agg(_cost_blind_join(spark, sf_dir)).collect()
    }
    assert got_on == got_off

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderpriority"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_mktsegment"])
    n = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    j = (
        li.merge(o[o.o_orderpriority == "1-URGENT"], left_on="l_orderkey", right_on="o_orderkey")
        .merge(c[c.c_mktsegment == "BUILDING"], left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
    )
    j["cents"] = (j.l_extendedprice * 100).round().astype("int64")
    want = {
        name: (int(g.shape[0]), int(g.cents.sum()))
        for name, g in j.groupby("n_name")
    }
    assert got_on == want


def test_histogram_stats_fix_skewed_selectivity(spark, sf_dir):
    """The other half of the CBO stats story: basic column stats assume
    UNIFORM value distribution (estimate = rows / NDV), so a filter on a
    planted power-law key (the join_skew_aqe shape: 30% of lineitem rows
    on one key) is under-estimated by orders of magnitude — the estimate
    that feeds joinReorder and broadcast decisions. With
    `spark.sql.statistics.histogram.enabled` the ANALYZE pass builds an
    equi-height histogram and the hot-key estimate lands within 25% of
    actual. Measured at sf0.01 while building this pin: basic 45 vs
    histogram 18,189 against an actual 18,165 — a 400× estimation error
    closed by one ANALYZE flag."""
    t = "hist_probe_r18"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    skewed = li.select(
        F.when(F.col("l_partkey") % 10 < 3, F.lit(0))
        .otherwise(F.col("l_partkey"))
        .alias("sk")
    )
    try:
        skewed.write.mode("overwrite").saveAsTable(t)
        actual = spark.table(t).filter(F.col("sk") == 0).count()

        def estimate(with_hist: bool) -> int:
            with temp_sql_confs(
                spark,
                {"spark.sql.statistics.histogram.enabled": str(with_hist).lower()},
            ):
                spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR COLUMNS sk")
            df = spark.table(t).filter(F.col("sk") == 0)
            with temp_sql_confs(spark, {"spark.sql.cbo.enabled": "true"}):
                rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
                assert rc.isDefined()
                return int(str(rc.get()))

        basic, hist = estimate(False), estimate(True)
        assert basic < actual / 10, (basic, actual)  # uniformity lie
        assert abs(hist - actual) <= 0.25 * actual, (hist, actual)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_weighted_median_is_two_pass(spark, sf_dir):
    """r18 rewrite pin: agg_weighted_median's old single cumulative window
    ran serially over the per-cents rollup, and prices are near-unique —
    at sf1 that was a 4.4M-row single task (the last standing skew-flag
    class). The two-pass selection's structural signature: the fact table
    is scanned more than once (bucket histogram pass + matched-bucket
    re-scan), the bucket targets reach pass 2 as a BROADCAST join (never
    a shuffle), and the bucketing expression runs map-side. Values are
    unchanged — the DuckDB oracle still computes the full-domain
    cumulative."""
    plan = (
        REGISTRY["agg_weighted_median"]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") >= 2, plan  # two-pass, not one
    assert plan.count("BroadcastHashJoin") == 1, plan  # targets broadcast
    assert "div 65536" in plan, plan  # map-side bucketing


# ---------------------------------------------------------------------------
# pipeline_incremental_ingest: empty-increment round (ADVICE r17)


def test_incremental_ingest_empty_round(spark, tmp_path):
    """An events corpus spanning a SINGLE day makes ingest round 1 empty
    (mid == the only day, so `day < mid` matches nothing): the partitioned
    write emits no files for that generation and the query must degrade to
    zero round-1 rows — matching the oracle's day-split — instead of
    raising on an empty read path list (ADVICE r17)."""
    ev = pd.DataFrame(
        {
            "event_id": range(20),
            "ts": pd.to_datetime("2026-01-02 12:00:00")
            + pd.to_timedelta(range(20), unit="m"),
            "user_id": [i % 5 for i in range(20)],
            "event_type": ["view" if i % 2 else "click" for i in range(20)],
            "value": [float(i) for i in range(20)],
            "props": ["{}"] * 20,
        }
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev.to_parquet(tmp_path / "events.parquet", index=False)

    rows = (
        REGISTRY["pipeline_incremental_ingest"].spark(spark, str(tmp_path)).collect()
    )
    assert all(r.ingest_round == 2 for r in rows), rows
    got = {r.event_type: r.n_rows_ingested for r in rows}
    assert got == {"view": 10, "click": 10}
    assert all(r.n_rows_total_after == 20 for r in rows)
