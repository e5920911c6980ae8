"""Replay sources: batch parquet tables re-read as Structured Streaming
inputs (the test-harness stand-in for the reference's Redis Stream source,
RedisSource.java:72-93 — offsets/consumer-group state map to the stream's
checkpoint/file-source log)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """`events` parquet as a stream. The parquet streaming source needs a
    directory, so point it at sf_dir with a glob filter; `ts` is normalized
    to session-tz TIMESTAMP by the same schema-adaptive helper the batch
    loader uses (tables.normalize_event_ts), so a generator encoding change
    can only break in one place."""
    from ..tables import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    reader = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return normalize_event_ts(reader.parquet(sf_dir))
