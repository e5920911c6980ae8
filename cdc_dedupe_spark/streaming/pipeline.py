"""The `watch` engine — the reference's streaming pipeline (WatchStream.java)
rebuilt on Structured Streaming.

Reference pipeline (SURVEY.md §3.1): Redis XREADGROUP → envelope decode →
id extract → fan-out to per-target sinks → size-or-time dedupe window →
first-wins dedupe → ≤1000-id JSON batches → XADD + ack barrier → XACK.

Spark mapping: file-stream source of envelope rows (offset, stream, fields)
→ one declarative plan per micro-batch inside ``foreachBatch``: broadcast
routing join (fan-out, S6) → per-target first-wins dedupe scoped to the
micro-batch (S8+S9; the trigger interval IS the dedupe window) → arrival-
order packing into ≤target.size JSON id arrays (S12/S13) → one partitioned
write for all targets (S14) → ack ledger append (S15-S19; the checkpoint
itself is the real at-least-once/effectively-once contract, the ledger is
observability parity with XACK).

Scale: no driver-side loops over data — routing is broadcast, dedupe is a
keyed shuffle (AQE-salted on skew), the multi-target write is a single
partitioned job. State never accumulates across batches (window-scoped
semantics, like the reference); the cross-batch variant is
dropDuplicatesWithinWatermark (queries/streaming.py).

Sink semantics: **effectively-once by default** via a batchId-idempotent
sink layer (``idempotent_sink=True``). The raw JSON-file and XADD sinks
are append-only, so a micro-batch retried after a crash between write and
checkpoint commit would duplicate its output — the reference's
at-least-once contract (crash between XADD and XACK replays pending
entries, RedisSource.java:92). The idempotent layer closes both crash
windows with a per-batch manifest (markers inside the checkpoint dir, so
both share one lifecycle):

 - crash AFTER the sinks ran but BEFORE the checkpoint commit: the
   ``{batchId}.done`` marker exists, so the engine's replay of that batch
   skips every sink write (checkpoint-replay dedupe) and only finishes
   the idempotent source acks (XACK/XDEL);
 - crash DURING the sink writes: the ``{batchId}.started`` marker exists
   without ``.done``, so the replay first scrubs the crashed attempt's
   output — file sinks publish under batch-deterministic names
   (``b{batchId}-*``, staged then moved, the classic committer pattern),
   XADD entries carry a ``batch`` field — then rewrites. Scrub runs ONLY
   on a genuine crash-replay (started-without-done), never in the fresh
   hot path, and is safe precisely because ``done`` is marked BEFORE the
   destructive acknowledge=delete: started-without-done implies the
   source still holds every entry of the batch.

At 1000-executor scale with object-store sinks, swap the file publish for
a transactional table format (Delta/Iceberg appends keyed by batchId) —
the manifest contract is the same. ``idempotent_sink=False`` restores the
reference's raw at-least-once behavior (byte-identical sink layout).
"""

from __future__ import annotations

import json
import shutil
import warnings
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import Config
from ..plans.watch_plan import compile_watch_plan

# FIXTURES.md §A: one row per stream entry. Canonical definition lives
# with the source (sources/redis_stream.py) — the file-stream and Redis
# paths must never diverge in schema.
from ..sources.redis_stream import ENVELOPE_ROW_SCHEMA  # noqa: E402


def routing_rows(spark: SparkSession, cfg: Config) -> DataFrame:
    """(source_stream, column, target_stream) — the full general mapping
    (every column of every table, WatchStream.java:347-352, with the
    correct per-column id extraction the reference gets wrong for tables
    with >1 mapped column; see SURVEY.md §2A fine print)."""
    rows = [
        (f"{cfg.source.prefix}{tbl}", col, f"{cfg.target.prefix}{tgt}")
        for tbl, cols in cfg.mapping.items()
        for col, tgts in cols.items()
        for tgt in tgts
    ]
    return spark.createDataFrame(rows, "stream string, id_column string, target_stream string")


def _needs_seed(work: Path) -> bool:
    """True until ``_mark_seeded`` runs — the marker lives inside the
    checkpoint dir, so wiping the checkpoint (a fresh pipeline) re-seeds;
    restarting on a live checkpoint does not (seeds are not batch-stamped,
    so each restart would otherwise append another). Callers write the
    marker AFTER seeding succeeds: a crash inside the seed window then
    re-seeds on restart (rare duplicate seed) instead of permanently
    losing the target-stream seeds (silent loss — ADVICE r8)."""
    return not (work / "checkpoint" / "targets_seeded").exists()


def _mark_seeded(work: Path) -> None:
    marker = work / "checkpoint" / "targets_seeded"
    marker.parent.mkdir(parents=True, exist_ok=True)
    marker.write_text("")


def seed_targets(spark: SparkSession, cfg: Config, output_dir: str) -> None:
    """Seed every target stream with ``{"ids": "[]"}`` at startup
    (WatchStream.java:262-265; the reference's tests count on it)."""
    seeds = spark.createDataFrame(
        [("[]", f"{cfg.target.prefix}{t}") for t in cfg.targets()],
        "ids string, target_stream string",
    )
    seeds.coalesce(1).write.mode("append").partitionBy("target_stream").json(output_dir)


# Configs whose declared source.format was already checked against observed
# records (warn once per distinct config CONTENT, on the first non-empty
# batch — a content key, because id() can be reused after GC and Config's
# mapping dict makes the object unhashable; VERDICT r6 "What's wrong" #2).
_format_checked: set[str] = set()


def _format_check_key(cfg: Config) -> str:
    import json as _json

    return _json.dumps(
        [cfg.source.format, cfg.source.prefix, cfg.target.prefix, cfg.mapping], sort_keys=True
    )


def _warn_format_mismatch(batch: DataFrame, cfg: Config) -> None:
    """The format knob is declarative (decode detects per record, matching
    the reference: declared config.yaml:3, ignored RedisSource.java:58) —
    but if what it declares contradicts what the stream carries, say so
    once (ADVICE r3). One tiny aggregate job on the first non-empty batch
    only; never in the per-batch hot path."""
    if cfg.source.format not in ("compact", "extended"):
        return
    key = _format_check_key(cfg)
    if key in _format_checked:
        return
    _format_checked.add(key)
    n_compact, n_total = batch.agg(
        F.sum(F.when(F.size("fields") == 1, 1).otherwise(0)), F.count(F.lit(1))
    ).first()
    n_compact = n_compact or 0
    mismatch = (n_total - n_compact) if cfg.source.format == "compact" else n_compact
    if mismatch:
        warnings.warn(
            f"source.format={cfg.source.format!r} but {mismatch}/{n_total} records "
            "in the first batch decode as the other envelope form; detection is "
            "per-record so decoding is unaffected — fix the config to match",
            stacklevel=2,
        )


class SinkManifest:
    """Per-batch sink ledger: ``{batchId}.started`` before any sink action,
    ``{batchId}.done`` after all of them (atomic tmp+replace). Lives INSIDE
    the checkpoint dir so wiping the checkpoint wipes the manifest — the
    two must share one lifecycle or a fresh checkpoint would skip batches
    an old manifest marked done."""

    def __init__(self, root: str | Path) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _touch(self, name: str) -> None:
        tmp = self.root / (name + ".tmp")
        tmp.write_text("")
        tmp.replace(self.root / name)

    def committed(self, batch_id: int) -> bool:
        return (self.root / f"{batch_id}.done").exists()

    def started(self, batch_id: int) -> bool:
        return (self.root / f"{batch_id}.started").exists()

    # Markers retained behind the newest batch. The engine itself only
    # replays the most recent uncommitted batch, so anything older is
    # dead weight — without pruning a 5s-trigger deployment writes ~35k
    # files/day into the checkpoint dir forever.
    RETAIN = 200

    def start(self, batch_id: int) -> None:
        self._touch(f"{batch_id}.started")

    def mark(self, batch_id: int) -> None:
        self._touch(f"{batch_id}.done")
        cutoff = batch_id - self.RETAIN
        if cutoff <= 0:
            return
        for f in self.root.iterdir():
            stem = f.name.split(".", 1)[0]
            if stem.isdigit() and int(stem) < cutoff:
                f.unlink(missing_ok=True)


def _publish_json(
    df: DataFrame, batch_id: int, partition_col: str, final_dir: str, staging_root: Path
) -> None:
    """Append ``df`` to the hive-partitioned ``final_dir`` under
    batch-deterministic file names: stage the write, then move each part
    file into place as ``b{batchId}-<part-name>`` — the committer pattern
    that lets a replay of the same batch identify (and scrub) a crashed
    attempt's files. Moves are driver-side metadata ops, O(part files),
    not O(rows); a cluster deployment swaps this for a transactional
    table append (module docstring)."""
    staging = staging_root / f"b{batch_id}-{Path(final_dir).name}"
    df.write.mode("overwrite").partitionBy(partition_col).json(str(staging))
    final = Path(final_dir)
    for part in staging.rglob("*"):
        if part.is_file() and not part.name.startswith(("_", ".")):
            rel = part.relative_to(staging)
            dest = final / rel.parent / f"b{batch_id}-{rel.name}"
            dest.parent.mkdir(parents=True, exist_ok=True)
            part.replace(dest)
    shutil.rmtree(staging, ignore_errors=True)


def _scrub_batch_files(batch_id: int, *dirs: str) -> None:
    """Delete every file a crashed attempt of this batch published."""
    for d in dirs:
        root = Path(d)
        if root.exists():
            for f in root.rglob(f"b{batch_id}-*"):
                if f.is_file():
                    f.unlink()


def _scrub_batch_redis(batch_id: int, cfg: Config, sink_options: dict[str, str]) -> None:
    """Delete target-stream entries a crashed attempt XADDed (they carry
    ``batch=<batchId>``, written only in idempotent mode). Runs ONLY on a
    started-without-done replay — never in the fresh hot path — so the
    full XRANGE scan is a crash-recovery cost, not a steady-state one."""
    from ..sources.redis_stream import _is_missing_stream, make_client

    client = make_client(sink_options)
    for t in cfg.targets():
        stream = f"{cfg.target.prefix}{t}"
        try:
            entries = client.xrange(stream)
        except Exception as e:
            if not _is_missing_stream(e):
                raise
            continue
        stale = [rid for rid, fields in entries if fields.get("batch") == str(batch_id)]
        if stale:
            client.xdel(stream, *stale)


def _process_batch(
    batch: DataFrame,
    batch_id: int,
    routes: DataFrame,
    cfg: Config,
    output_dir: str,
    ack_dir: str,
    dead_dir: str,
    sink_options: dict[str, str] | None = None,
    manifest: SinkManifest | None = None,
    staging_root: Path | None = None,
    ack_options: dict[str, str] | None = None,
) -> None:
    # Source-side acks (XACK / acknowledge=delete) need the SOURCE's Redis
    # connection, not the sink's: a Redis-source run with JSON file sinks
    # still acks (the S15-S20 contract is about the source stream).
    ack_wanted = ack_options is not None and bool(
        cfg.source.group or cfg.source.acknowledge == "delete"
    )
    already = manifest is not None and manifest.committed(batch_id)
    if already and not ack_wanted:
        # Checkpoint replay of a fully-sunk batch (crash landed between
        # sink actions and checkpoint commit): every sink action below
        # already ran and there is no ack work — skip it all.
        return
    if manifest is not None and not already:
        if manifest.started(batch_id):
            # Crashed mid-write: scrub the partial attempt before rewriting.
            # Safe precisely because the destructive source ack only ever
            # runs AFTER mark() (below): started-without-done implies the
            # source still holds every entry of this batch.
            _scrub_batch_files(batch_id, output_dir, ack_dir, dead_dir)
            if sink_options is not None:
                _scrub_batch_redis(batch_id, cfg, sink_options)
        manifest.start(batch_id)
    # One persist covers every action below (isEmpty, the one-shot format
    # probe, the packed/dead/ack writes and the ack foreachPartition):
    # without it each action re-evaluates the whole lineage from the
    # source — for the Redis source that's up to 4 XRANGEs of every
    # stream's id slice per batch, 4× decode/route/dedupe for the others
    # (VERDICT r7 "What's wrong" #1). The micro-batch is bounded (trigger
    # interval / admission cap), so default MEMORY_AND_DISK is safe; each
    # source partition is fetched exactly once (pinned by
    # tests/test_watch_pipeline.py::test_watch_batch_reads_source_once).
    batch.persist()
    try:
        if batch.isEmpty():
            if manifest is not None and not already:
                manifest.mark(batch_id)  # nothing to sink; replays skip
            return
        if not already:
            _warn_format_mismatch(batch, cfg)

        # Plan compilation is pure (plans/watch_plan.py); this layer only
        # owns the sinks: one partitioned write per relation covers every
        # target (S14) and the ack ledger (S15-S19 — the checkpoint is the
        # real at-least-once contract, the ledger is XACK observability
        # parity).
        packed, acks, dead = compile_watch_plan(batch, routes, cfg)
        if not already:
            if sink_options is not None:
                # XADD straight to the target Redis streams (reference topology).
                opts = dict(sink_options)
                if manifest is not None:
                    # Entries carry their batchId so a crash-replay can scrub
                    # the partial attempt (_scrub_batch_redis).
                    opts["extra_fields"] = json.dumps({"batch": str(batch_id)})
                packed.write.format("redis_stream").options(**opts).mode("append").save()
            elif manifest is not None:
                _publish_json(packed, batch_id, "target_stream", output_dir, staging_root)
            else:
                packed.write.mode("append").partitionBy("target_stream").json(output_dir)
            # Dead-letter sink BEFORE acks: malformed records must have a
            # surviving copy before acknowledge=delete can remove them from
            # the source (plans/watch_plan.py dead relation; the reference
            # instead wedges the stream on the first malformed record,
            # RedisSource.java:63-66).
            if manifest is not None:
                _publish_json(dead, batch_id, "stream", dead_dir, staging_root)
                _publish_json(acks, batch_id, "stream", ack_dir, staging_root)
            else:
                dead.write.mode("append").partitionBy("stream").json(dead_dir)
                acks.write.mode("append").partitionBy("stream").json(ack_dir)
            # Effectively-once ordering: mark done BEFORE the destructive
            # source ack. A crash after mark but mid-ack replays into the
            # ack-only path below (sinks skipped, remaining entries
            # re-acked — XACK/XDEL are idempotent). Marking AFTER the ack
            # would let a crash-replay scrub COMPLETE output whose source
            # entries acknowledge=delete already removed — permanent loss,
            # not duplication.
            if manifest is not None:
                manifest.mark(batch_id)

        # S15-S20: real XACK against the consumer group (WatchStream.java:
        # 196-205 parity — PEL interop with other group consumers), then
        # acknowledge=delete removes acked entries (WatchStream.java:207-220;
        # the reference's tests assert the source is emptied,
        # WatchTests.java:151-154). Uses the SOURCE connection (ack_options)
        # — runs for a Redis source regardless of sink kind. Executor-side
        # per partition, ids grouped per stream and sent in many-id chunks
        # (the reference batches its XDELs the same way) — O(streams ·
        # chunks) round trips, never O(rows). Gate on having anything to
        # send: with no consumer group and acknowledge != delete there is
        # no XACK and no XDEL, so skip the foreachPartition entirely (it
        # would open one Redis client per non-empty partition per batch to
        # do nothing).
        if ack_wanted:
            opts = dict(ack_options)
            group = cfg.source.group
            delete = cfg.source.acknowledge == "delete"

            def _ack(rows) -> None:
                from ..sources.redis_stream import PIPELINE_CHUNK, make_client

                by_stream: dict[str, list[str]] = {}
                for row in rows:
                    by_stream.setdefault(row["stream"], []).append(row["offset"])
                if not by_stream:
                    return
                client = make_client(opts)
                try:
                    for stream, ids in by_stream.items():
                        for i in range(0, len(ids), PIPELINE_CHUNK):
                            chunk = ids[i : i + PIPELINE_CHUNK]
                            if group:
                                client.xack(stream, group, *chunk)
                            if delete:
                                client.xdel(stream, *chunk)
                finally:
                    getattr(client, "close", lambda: None)()

            acks.foreachPartition(_ack)
    finally:
        batch.unpersist()


@dataclass
class WatchHandles:
    query: StreamingQuery
    output_dir: str
    ack_dir: str
    dead_dir: str


def watch(
    spark: SparkSession,
    cfg: Config,
    source_dir: str | None,
    work_dir: str,
    available_now: bool = True,
    trigger_seconds: int | None = None,
    redis_options: dict[str, str] | None = None,
    redis_sink: bool = False,
    idempotent_sink: bool = True,
) -> WatchHandles:
    """Start the watch pipeline.

    Source: a directory of envelope JSON files (``source_dir``), or — when
    ``redis_options`` is given — the ``redis_stream`` data source polling
    the config's source streams directly (the reference's topology,
    RedisSource.java:72-93). ``redis_sink=True`` additionally XADDs packed
    batches to the target streams instead of JSON files.

    availableNow=True drains existing input and stops (the test/replay
    mode); trigger_seconds mirrors the reference's 5 s dedupe window
    (config.yaml:17) for continuous runs. ``idempotent_sink`` (default on)
    dedupes checkpoint-replayed micro-batches via a per-batch manifest —
    effectively-once sinks (module docstring); off = the reference's raw
    at-least-once append behavior."""
    work = Path(work_dir)
    output_dir = str(work / "targets")
    ack_dir = str(work / "acks")
    dead_dir = str(work / "dead")
    checkpoint = str(work / "checkpoint")

    routes = routing_rows(spark, cfg)

    sink_options: dict[str, str] | None = None
    if redis_options is not None:
        from ..sources.redis_stream import (
            RedisStreamDataSource,
            ensure_group,
            make_client,
            seed_payload,
        )

        spark.dataSource.register(RedisStreamDataSource)
        source_streams = ",".join(f"{cfg.source.prefix}{t}" for t in cfg.mapping)
        client = make_client(redis_options)
        # Bootstrap the consumer group on every source stream at 0-0
        # (BUSYGROUP-tolerant), so the XACKs emitted per batch land in a
        # real group PEL — drop-in interop with the reference's consumers
        # (RedisSource.java:72-80).
        if cfg.source.group:
            for t in cfg.mapping:
                ensure_group(client, f"{cfg.source.prefix}{t}", cfg.source.group)
        reader = spark.readStream.format("redis_stream").option("streams", source_streams)
        reader_opts = dict(redis_options)
        # The reference's poll batch cap (buffers.source.size,
        # config.yaml:13-15) becomes the source's per-batch admission cap;
        # an explicit reader option still overrides the config. NOT set in
        # availableNow drain mode: that trigger fixes its target offset
        # with ONE latestOffset call, so a capped answer would truncate the
        # drain instead of pacing it — a drain wants everything. A
        # user-supplied cap is stripped (loudly) for the same reason.
        if available_now and "max_entries_per_batch" in reader_opts:
            warnings.warn(
                "max_entries_per_batch is ignored under availableNow: the drain "
                "trigger fixes its target with one latestOffset call, so a capped "
                "answer would silently truncate the drain instead of pacing it "
                "(sources/redis_stream.py module docstring)",
                stacklevel=2,
            )
            reader_opts.pop("max_entries_per_batch")
        if (
            not available_now
            and "max_entries_per_batch" not in reader_opts
            and cfg.buffers.source.size > 0
        ):
            reader = reader.option("max_entries_per_batch", str(cfg.buffers.source.size))
        # Watermark state lives INSIDE the checkpoint dir (a subdir the
        # engine ignores) so the two share one lifecycle: wiping the
        # checkpoint wipes the watermark, keeping file-absent <=>
        # checkpoint-fresh — what makes capping the very first batch
        # safe. Wired in EVERY mode, capped or not: an uncapped drain on
        # this checkpoint must keep the watermark file fresh, or a later
        # capped run would seed a regressed offset from the stale file
        # (ADVICE r7; redis_stream.py module docstring).
        if "cap_state_dir" not in reader_opts:
            reader = reader.option("cap_state_dir", str(work / "checkpoint" / "redis_cap"))
        for k, v in reader_opts.items():
            reader = reader.option(k, v)
        stream = reader.load()
        ack_options = dict(redis_options)
        if redis_sink:
            sink_options = dict(redis_options)
            # Seed every target stream with {"ids": "[]"} (WatchStream.java:
            # 262-265) — once per pipeline lifetime, not per process start:
            # the seeds carry no batch id, so the idempotent machinery
            # cannot dedupe them and every restart would add another.
            if _needs_seed(work):
                for t in cfg.targets():
                    client.xadd(f"{cfg.target.prefix}{t}", seed_payload())
                _mark_seeded(work)
        elif _needs_seed(work):
            seed_targets(spark, cfg, output_dir)
            _mark_seeded(work)
    else:
        ack_options = None
        if _needs_seed(work):
            seed_targets(spark, cfg, output_dir)
            _mark_seeded(work)
        stream = spark.readStream.schema(ENVELOPE_ROW_SCHEMA).json(source_dir)

    manifest = SinkManifest(work / "checkpoint" / "sink_manifest") if idempotent_sink else None
    staging_root = work / "staging"
    writer = stream.writeStream.foreachBatch(
        lambda b, bid: _process_batch(
            b, bid, routes, cfg, output_dir, ack_dir, dead_dir, sink_options,
            manifest, staging_root, ack_options,
        )
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    q = writer.start()
    return WatchHandles(query=q, output_dir=output_dir, ack_dir=ack_dir, dead_dir=dead_dir)
