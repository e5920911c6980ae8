"""Helpers to execute a finite Structured Streaming plan to completion
(availableNow trigger) and read the result back — the test/driver analogue
of the reference's run-until-drained pipeline (WatchStream.java:120-130:
graceful shutdown after in-flight drains; availableNow gives us exactly
that contract declaratively)."""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame

_SEQ = itertools.count()

# Streaming STATE partitions are a state-volume sizing decision, distinct
# from the batch shuffle width: every stateful operator instantiates one
# state-store instance per shuffle partition PER QUERY START, and on the
# local replay corpus (<=1.5 M events, <=200 distinct keys) 32 instances
# are ~0.4 s of pure instantiation per query — measured r13: the no-op
# availableNow floor is 0.67 s at 32 partitions vs 0.54 s at 8, and a
# stateful dedupe is 1.0 s vs 0.6 s. On a real cluster you size this UP
# with state volume (it is pinned into the checkpoint at first start);
# here the default 8 keeps multi-core state spread without paying 4x the
# instantiation. Batch-side confs are untouched — the value is scoped to
# the .start() call and restored immediately after the drain.
_STATE_PARTITIONS = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")


def run_to_memory(sdf: DataFrame, name_prefix: str, output_mode: str = "append") -> DataFrame:
    """Run a (bounded) streaming DataFrame to the in-memory sink until the
    availableNow trigger drains it; return the sink table.

    The streaming plan is started under `_STATE_PARTITIONS` shuffle
    partitions (state sizing, see above); the session's batch value is
    restored before returning, so the batch ops downstream of the sink
    table see the session's own tuning."""
    spark = sdf.sparkSession
    name = f"{name_prefix}_{next(_SEQ)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _STATE_PARTITIONS)
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
