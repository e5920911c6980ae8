"""Streaming-semantics unit tests not expressible as DuckDB oracles
(SURVEY.md §5.2 items 3/5): watermark TTL re-emission and stateful-agg
final-state equivalence."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from cdc_dedupe_spark.queries.registry import REGISTRY
from cdc_dedupe_spark.tables import table


def test_watermark_dedupe_reemits_after_ttl(spark, tmp_path):
    """dropDuplicatesWithinWatermark is a TTL contract, NOT global dedupe:
    an id recurring after the watermark passed its state is emitted again —
    the upgrade path of the reference's window-scoped dedupe (S8/S9)."""
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        [{"user_id": 1, "ts": "2024-01-01 10:00:00"}],
        # advances watermark to 11:00 - 10min = 10:50 > 10:00 + TTL
        [{"user_id": 2, "ts": "2024-01-01 11:00:00"}],
        # state eviction applies one batch after the watermark advances,
        # so an intervening batch lets user 1's entry age out...
        [{"user_id": 3, "ts": "2024-01-01 11:02:00"}],
        # ...and this recurrence of user 1 is re-emitted
        [{"user_id": 1, "ts": "2024-01-01 11:05:00"}],
    ]
    for i, batch in enumerate(rows):
        p = src / f"{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in batch))
        os.utime(p, (time.time() + i, time.time() + i))

    stream = (
        spark.readStream.schema("user_id long, ts string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(["user_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("wm_ttl_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("wm_ttl_test").groupBy("user_id").count().collect()
    counts = {r.user_id: r["count"] for r in got}
    assert counts[1] == 2, f"user 1 should be re-emitted after TTL eviction: {counts}"
    assert counts[2] == 1


def test_stateful_agg_final_state_matches_batch(spark, sf_dir):
    """applyInPandasWithState running counts: the final state per user must
    equal the batch groupBy count (rows-only query's real assertion)."""
    out = REGISTRY["stream_stateful_agg"].spark(spark, sf_dir)
    final = {
        r.user_id: r.n_events
        for r in out.groupBy("user_id").agg(F.max("n_events").alias("n_events")).collect()
    }
    expected = {
        r.user_id: r["count"]
        for r in table(spark, sf_dir, "events").groupBy("user_id").count().collect()
    }
    assert final == expected


def test_dedupe_stream_matches_batch_distinct(spark, sf_dir):
    out = REGISTRY["cdc_dedupe_stream"].spark(spark, sf_dir)
    got = sorted(r.user_id for r in out.collect())
    expected = sorted(
        r.user_id for r in table(spark, sf_dir, "events").select("user_id").distinct().collect()
    )
    assert got == expected
