"""Group 1 — CDC core queries (SURVEY.md §2B), batch-replayed over `events`.

`events` stands in for the CDC stream: event_id = record offset, user_id =
entity id, event_type = routing key (FIXTURES.md §C). Reference semantics
cited per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.cdc import (
    DEFAULT_ROUTING,
    batch_pack,
    batch_pack_keyed,
    dedupe_first,
    fanout,
    routing_df,
)
from ..functions.text import SQL_PADDED_ORDER_KEY, padded_order_key
from ..tables import table
from .registry import register

# DuckDB VALUES list for the routing map, kept in lockstep with DEFAULT_ROUTING.
_ROUTING_VALUES = ", ".join(
    f"('{etype}', '{tgt}')" for etype, tgts in DEFAULT_ROUTING.items() for tgt in tgts
)
_ROUTING_CTE = f"routing(event_type, target) AS (SELECT * FROM (VALUES {_ROUTING_VALUES}))"


@register(
    "cdc_parse_extract",
    group="cdc",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
)
def cdc_parse_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload parse + int field extract (S3, RedisSource.java:63-66)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register(
    "cdc_dedupe_first",
    group="cdc",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           event_type
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def cdc_dedupe_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins dedupe per entity id (S9, WatchStream.java:272-274):
    earliest event per user_id by (ts, event_id)."""
    ev = table(spark, sf_dir, "events")
    first = dedupe_first(ev, ["user_id"], [F.col("ts"), F.col("event_id")])
    return first.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
    )


@register(
    "cdc_dedupe_window",
    group="cdc",
    oracle="""
    SELECT user_id,
           (epoch_us(CAST(ts AS TIMESTAMP)) // 300000000) * 300000000 AS bucket_us,
           event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 300000000
        ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def cdc_dedupe_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed first-wins dedupe (S8+S9, WatchStream.java:271-274): first
    event per (user_id, 5-minute tumbling bucket). Uses F.window — the same
    primitive the streaming path uses; window starts align to the epoch so
    the oracle's integer-division bucket matches exactly."""
    ev = table(spark, sf_dir, "events")
    win = ev.withColumn("w", F.window("ts", "5 minutes"))
    first = dedupe_first(win, ["user_id", "w"], [F.col("ts"), F.col("event_id")])
    return first.select(
        "user_id",
        F.unix_micros(F.col("w.start")).alias("bucket_us"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )


@register(
    "cdc_fanout_route",
    group="cdc",
    oracle=f"""
    WITH {_ROUTING_CTE}
    SELECT e.event_id, e.user_id, e.event_type, r.target
    FROM events e JOIN routing r USING (event_type)
    """,
)
def cdc_fanout_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static fan-out (S6, WatchStream.java:346-352): one row per
    (event, routed target); routing side broadcast."""
    ev = table(spark, sf_dir, "events")
    routed = fanout(ev, routing_df(spark))
    return routed.select("event_id", "user_id", "event_type", "target")


@register(
    "cdc_ack_expect",
    group="cdc",
    oracle=f"""
    WITH {_ROUTING_CTE}
    SELECT e.event_id, count(*) AS expect
    FROM events e JOIN routing r USING (event_type)
    GROUP BY e.event_id
    """,
)
def cdc_ack_expect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refcount expectation (S5, WatchStream.java:337-344): per event, its
    fan-out width — the number of target copies that must complete before
    the source record may be acknowledged."""
    ev = table(spark, sf_dir, "events")
    routed = fanout(ev, routing_df(spark))
    return routed.groupBy("event_id").agg(F.count(F.lit(1)).alias("expect"))


@register(
    "cdc_batch_pack",
    group="cdc",
    oracle="""
    WITH firsts AS (
      SELECT user_id, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), deduped AS (
      SELECT user_id, ts, event_id FROM firsts WHERE rn = 1
    ), ordered AS (
      SELECT user_id,
             CAST(ceil(row_number() OVER (ORDER BY ts, event_id) / 100.0) AS BIGINT) AS bucket
      FROM deduped
    )
    SELECT bucket,
           to_json(list_sort(list(user_id))) AS ids_json,
           count(*) AS n_ids
    FROM ordered GROUP BY bucket
    """,
)
def cdc_batch_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output batching + JSON encode (S12/S13, WatchStream.java:284-293):
    deduped ids in arrival order packed into buckets of <=100, each bucket
    a sorted JSON id array (the `{"ids": "[...]"}` payload)."""
    ev = table(spark, sf_dir, "events")
    first = dedupe_first(ev, ["user_id"], [F.col("ts"), F.col("event_id")])
    return batch_pack(first, "user_id", [F.col("ts"), F.col("event_id")], batch_size=100)


@register(
    "cdc_batch_pack_scalable",
    group="cdc",
    oracle="""
    WITH firsts AS (
      SELECT user_id, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), deduped AS (
      SELECT user_id, ts, event_id FROM firsts WHERE rn = 1
    ), keyed AS (
      SELECT user_id,
             user_id % 4 AS pk,
             row_number() OVER (PARTITION BY user_id % 4 ORDER BY ts, event_id) AS prn
      FROM deduped
    )
    SELECT CAST(pk * 4294967296 + ceil(prn / 10.0) AS BIGINT) AS bucket,
           to_json(list_sort(list(user_id))) AS ids_json,
           count(*) AS n_ids
    FROM keyed GROUP BY 1
    """,
)
def cdc_batch_pack_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-shape of cdc_batch_pack (S12/S13, WatchStream.java:284-293):
    ids pack per CONTENT-derived key group (user_id % 4) instead of one
    global row_number, so the sort is key-group parallel (4 here; P at scale) and no single
    partition ever holds the whole stream — the scalable plan SCALING.md
    §4.2 promises, now a declared oracle-checked entry. Batch-size bound
    (<=10 per bucket) holds per group; cross-batch order is unspecified,
    exactly the reference's contract (batch SIZE only, README.md:7)."""
    ev = table(spark, sf_dir, "events")
    first = dedupe_first(ev, ["user_id"], [F.col("ts"), F.col("event_id")])
    return batch_pack_keyed(
        first,
        "user_id",
        F.col("user_id") % 4,
        [F.col("ts"), F.col("event_id")],
        batch_size=10,
    )


@register(
    "cdc_dedupe_stream",
    group="cdc",
    oracle="SELECT DISTINCT user_id FROM events",
)
def cdc_dedupe_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 executed on Structured Streaming: replay `events` parquet as a
    stream, `dropDuplicates` on the entity id, availableNow trigger, memory
    sink. Output = the distinct entity-id set (which event carries each id
    first is batch-split dependent in a real stream, so only the id is
    emitted — the deterministic-first variant is cdc_dedupe_first)."""
    from ..sources.replay import events_stream
    from ..streaming.run import run_to_memory

    stream = events_stream(spark, sf_dir)
    deduped = stream.select("user_id").dropDuplicates(["user_id"])
    return run_to_memory(deduped, "cdc_dedupe_stream_sink", output_mode="append")


@register(
    "cdc_upsert_latest",
    group="cdc",
    oracle=f"""
    WITH e AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), k AS (
      SELECT *, {SQL_PADDED_ORDER_KEY.format(ts='ts_us', id='event_id')} AS ok
      FROM e
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           MAX(ts_us) AS last_ts_us,
           arg_max(event_id, ok) AS last_event_id,
           arg_max(event_type, ok) AS last_event_type,
           arg_max(cents, ok) AS last_cents
    FROM k GROUP BY user_id
    """,
)
def cdc_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-wins upsert materialization — the current-state table a CDC
    consumer builds from the change stream (SCD-type-1 / Debezium
    read-model; the dual of cdc_dedupe_first's first-wins): per entity,
    the latest version's fields plus the fold count, order (ts, event_id)
    with the unique tie-break via the zero-padded string key
    (functions/text.padded_order_key — full-int64-width safe).

    Shape at scale: ONE partial-aggregated shuffle of O(|entities|) rows
    (max_by folds map-side) — not a window + filter, which would move
    every version to the entity's partition; the same declarative
    aggregate runs unchanged as a streaming aggregation (the
    stream_upsert_latest twin; update mode against a real sink keeps
    the materialization continuously current — the bounded-replay
    harness uses complete mode to read the whole table back)."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).withColumn("ok", padded_order_key("ts_us", "event_id"))
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.max("ts_us").alias("last_ts_us"),
        F.max_by("event_id", "ok").alias("last_event_id"),
        F.max_by("event_type", "ok").alias("last_event_type"),
        F.max_by("cents", "ok").alias("last_cents"),
    )


@register(
    "cdc_scd2_history",
    group="cdc",
    oracle="""
    WITH e AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
             event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), v AS (
      SELECT user_id, event_id, event_type, cents, valid_from_us,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
             LEAD(valid_from_us) OVER w AS nxt
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY valid_from_us, event_id)
    )
    SELECT user_id, version, event_id, event_type, cents,
           valid_from_us,
           COALESCE(nxt, -1) AS valid_to_us,
           CAST(CASE WHEN nxt IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current,
           CASE WHEN nxt IS NULL THEN -1 ELSE nxt - valid_from_us END AS duration_us
    FROM v
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history materialization — the versioned read model a
    CDC consumer builds when the question is "what did the entity look
    like at time T", the history-preserving dual of [[cdc_upsert_latest]]
    (SCD-1, last-wins): every change event becomes a version row with a
    validity interval [valid_from, valid_to) closed by the NEXT version's
    timestamp (lead), the open current version flagged and sentineled at
    -1 (NULL-free output hashes identically cross-engine). Version
    numbers and interval ends come from TWO window functions over the
    SAME (user_id | ts, event_id) partitioning, so the whole history
    build is ONE exchange — no self-join of the change log against
    itself, which is the quadratic trap in hand-rolled SCD-2 SQL.

    Shape at scale: the change log shuffles once on the entity key;
    each entity's version chain is processed within its partition.
    Skewed entities (one key with millions of versions) are the same
    hazard as any per-key window — mitigated upstream by the compaction
    cdc_upsert_latest provides. Reference analogue: the dedupe ledger
    (S9, WatchStream.java:272-274) keeps only first-wins state; SCD-2 is
    the full-history generalization a warehouse sink needs."""
    w = Window.partitionBy("user_id").orderBy("valid_from_us", "event_id")
    e = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("valid_from_us"),
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    v = e.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version"),
        "event_id",
        "event_type",
        "cents",
        "valid_from_us",
        F.lead("valid_from_us").over(w).alias("nxt"),
    )
    return v.select(
        "user_id",
        "version",
        "event_id",
        "event_type",
        "cents",
        "valid_from_us",
        F.coalesce(F.col("nxt"), F.lit(-1)).alias("valid_to_us"),
        F.when(F.col("nxt").isNull(), F.lit(1)).otherwise(F.lit(0)).cast("long").alias("is_current"),
        F.when(F.col("nxt").isNull(), F.lit(-1)).otherwise(F.col("nxt") - F.col("valid_from_us")).alias("duration_us"),
    )


@register(
    "cdc_tombstone_lifecycle",
    group="cdc",
    oracle="""
    WITH e AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             event_id,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_del
      FROM events
    ), l AS (
      SELECT user_id, ts_us, event_id, is_del,
             LAG(is_del) OVER w AS prev_del,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts_us DESC, event_id DESC) AS rn_last
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_ops,
           CAST(SUM(is_del) AS BIGINT) AS n_deletes,
           CAST(SUM(CASE WHEN prev_del = 1 AND is_del = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_resurrections,
           CAST(1 - MAX(CASE WHEN rn_last = 1 THEN is_del END) AS BIGINT) AS is_live,
           MIN(ts_us) AS first_op_us,
           MAX(ts_us) AS last_op_us
    FROM l GROUP BY user_id
    """,
)
def cdc_tombstone_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone-aware entity lifecycle — the delete-handling dimension of
    the CDC read model ([[cdc_upsert_latest]] ignores deletes; Debezium
    emits them as tombstone records, here `event_type = 'error'` stands
    in as the delete op per FIXTURES.md's routing): per entity, op and
    delete counts, RESURRECTION count (a delete followed by any
    non-delete — the compaction hazard case: a consumer that dropped
    state on the tombstone must rebuild it), and whether the entity is
    live after its last operation. A compacted sink (Kafka log
    compaction, an upsert table) keeps exactly the is_live = 1 rows.

    One user_id exchange: the lag window and the last-op row_number
    share the partitioning with the final groupBy (Catalyst stacks all
    three on one shuffle), and every aggregate is a plain conditional
    count — O(entities) output rows, no self-join of the changelog."""
    wl = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wr = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    e = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        (F.col("event_type") == "error").cast("long").alias("is_del"),
    )
    l = e.select(
        "user_id",
        "ts_us",
        "event_id",
        "is_del",
        F.lag("is_del").over(wl).alias("prev_del"),
        F.row_number().over(wr).alias("rn_last"),
    )
    return l.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ops"),
        F.sum("is_del").cast("long").alias("n_deletes"),
        F.sum(
            ((F.col("prev_del") == 1) & (F.col("is_del") == 0)).cast("long")
        ).alias("n_resurrections"),
        (1 - F.max(F.when(F.col("rn_last") == 1, F.col("is_del"))))
        .cast("long")
        .alias("is_live"),
        F.min("ts_us").alias("first_op_us"),
        F.max("ts_us").alias("last_op_us"),
    )


_ASOF_T_US = 1_705_276_800_000_000  # 2024-01-15T00:00:00Z, mid-corpus


@register(
    "cdc_snapshot_asof",
    group="cdc",
    oracle=f"""
    WITH e AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE epoch_us(CAST(ts AS TIMESTAMP)) <= {_ASOF_T_US}
    ), k AS (
      SELECT *, {SQL_PADDED_ORDER_KEY.format(ts='ts_us', id='event_id')} AS ok
      FROM e
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS version_at_t,
           arg_max(event_id, ok) AS asof_event_id,
           arg_max(event_type, ok) AS asof_event_type,
           arg_max(cents, ok) AS asof_cents,
           MAX(ts_us) AS last_change_us,
           CAST({_ASOF_T_US} AS BIGINT) - MAX(ts_us) AS staleness_us
    FROM k GROUP BY user_id
    """,
)
def cdc_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension snapshot — "the table as of T": each
    entity's version in force at a FIXED timestamp, the read pattern
    behind feature-store PIT joins and reproducible-training snapshots
    ([[cdc_scd2_history]] materializes ALL intervals; this answers one
    instant and never builds them). The time predicate pushes into the
    parquet scan (at 100 TB with time-partitioned storage it prunes
    partitions — the reason this beats filtering the SCD-2 output), and
    the snapshot itself is the [[cdc_upsert_latest]] max_by fold — ONE
    partial-agg shuffle of O(entities) rows. Also emits per-entity
    staleness at T (snapshot-quality monitoring).

    Entities created after T are correctly ABSENT (a PIT join against
    this snapshot can't leak the future)."""
    e = (
        table(spark, sf_dir, "events")
        .where(F.unix_micros("ts") <= _ASOF_T_US)
        .select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .withColumn("ok", padded_order_key("ts_us", "event_id"))
    )
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("version_at_t"),
        F.max_by("event_id", "ok").alias("asof_event_id"),
        F.max_by("event_type", "ok").alias("asof_event_type"),
        F.max_by("cents", "ok").alias("asof_cents"),
        F.max("ts_us").alias("last_change_us"),
        (F.lit(_ASOF_T_US) - F.max("ts_us")).cast("long").alias("staleness_us"),
    )
