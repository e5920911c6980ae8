"""Loaders for the driver-generated parquet corpus (TESTDATA.md).

``spark.read.parquet`` gives us the vectorized reader + predicate pushdown
+ column pruning for free; callers filter/select on the returned DataFrame
and Catalyst pushes it into the scan. At 100 TB the same call reads a
partitioned directory tree and partition pruning applies unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. Read nanos as long (runtime SQL conf) and rebuild the
    column as a µs timestamp with integer division — stays a distributed
    columnar scan; truncation to µs matches DuckDB's TIMESTAMP_NS ->
    TIMESTAMP cast (SURVEY.md §7 timestamp-parity risk)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as F

    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
