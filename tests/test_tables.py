"""spread_scan / parallelism-probe contracts (VERDICT r13 next-step #5b,
ADVICE r13 #2): the zero-exchange-at-scale claim must be pinned by a test
on a genuinely WIDE (multi-file) scan, not just documented."""

from __future__ import annotations

from types import SimpleNamespace

from pyspark.sql import functions as F

from cdc_dedupe_spark.tables import plan_width, session_parallelism, spread_scan


def test_spread_scan_noop_on_wide_scan(spark, tmp_path):
    """On a multi-file scan at least as wide as the session's shuffle
    parallelism — the 100 TB case — spread_scan must return the SAME
    DataFrame object: no exchange, no plan change, nothing for Catalyst
    to even see. This is what makes it a local-layout adaptation rather
    than a scale crutch (tables.py spread_scan docstring)."""
    par = session_parallelism(spark)
    wide_dir = str(tmp_path / "wide.parquet")
    spark.range(0, par * 100).withColumn("payload", F.md5(F.col("id").cast("string"))) \
        .repartition(par + 8).write.parquet(wide_dir)
    # The fixture files are tiny, so Spark's bin-packing would pack several
    # per split; raise the per-file open cost so each file is its own split
    # — the shape a real multi-file 100 TB scan has.
    prev_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024 * 1024))
    try:
        df = spark.read.parquet(wide_dir)
        assert plan_width(df) >= par, "fixture must produce a wide scan"

        out = spread_scan(df, "id")
        assert out is df, "wide scan must be identity (zero-exchange) in spread_scan"
        out2 = spread_scan(df)
        assert out2 is df
    finally:
        spark.conf.set("spark.sql.files.openCostInBytes", prev_cost)


def test_spread_scan_widens_narrow_scan(spark, tmp_path):
    """On a one-file (narrow) scan spread_scan inserts exactly one hash
    exchange at the requested width so downstream per-row kernels run
    parallel — the eleven-sighting defect-class fix."""
    par = session_parallelism(spark)
    narrow_dir = str(tmp_path / "narrow.parquet")
    spark.range(0, 1000).coalesce(1).write.parquet(narrow_dir)
    df = spark.read.parquet(narrow_dir)
    assert plan_width(df) < par, "fixture must produce a narrow scan"

    out = spread_scan(df, "id")
    assert out is not df
    assert plan_width(out) == par
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" in plan, plan


def test_session_parallelism_survives_non_numeric_conf():
    """Platforms that resolve spark.sql.shuffle.partitions to a sentinel
    like "auto" must fall back to defaultParallelism instead of raising
    ValueError (ADVICE r13 #2)."""
    fake = SimpleNamespace(
        conf=SimpleNamespace(get=lambda *_a, **_k: "auto"),
        sparkContext=SimpleNamespace(defaultParallelism=7),
    )
    assert session_parallelism(fake) == 7
    fake_none = SimpleNamespace(
        conf=SimpleNamespace(get=lambda *_a, **_k: None),
        sparkContext=SimpleNamespace(defaultParallelism=5),
    )
    assert session_parallelism(fake_none) == 5


def test_plan_width_adds_no_python_stage(spark, sf_dir):
    """plan_width must probe via queryExecution.toRdd (plan-only, no
    JVM->Python serialization stage) and agree with the df.rdd count the
    old implementation used."""
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert plan_width(df) == df.rdd.getNumPartitions()
