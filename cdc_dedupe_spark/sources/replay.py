"""Replay sources: batch parquet tables re-read as Structured Streaming
inputs (the test-harness stand-in for the reference's Redis Stream source,
RedisSource.java:72-93 — offsets/consumer-group state map to the stream's
checkpoint/file-source log)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """`events` parquet as a stream. The parquet streaming source needs a
    directory, so point it at sf_dir with a glob filter; ts (parquet NANOS)
    is read as long and rebuilt as a µs timestamp (see tables._events)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    reader = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(sf_dir)
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
