"""Helpers to execute a finite Structured Streaming plan to completion
(availableNow trigger) and read the result back — the test/driver analogue
of the reference's run-until-drained pipeline (WatchStream.java:120-130:
graceful shutdown after in-flight drains; availableNow gives us exactly
that contract declaratively)."""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame

_SEQ = itertools.count()


def run_to_memory(sdf: DataFrame, name_prefix: str, output_mode: str = "append") -> DataFrame:
    """Run a (bounded) streaming DataFrame to the in-memory sink until the
    availableNow trigger drains it; return the sink table."""
    spark = sdf.sparkSession
    name = f"{name_prefix}_{next(_SEQ)}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
