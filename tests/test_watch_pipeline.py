"""E2E replays of the reference's WatchTests scenarios (WatchTests.java)
through the config-driven pipeline — availableNow triggers instead of the
reference's 16 s sleeps.

Scenarios:
 - basic: no input -> target streams exist with exactly the seed record
   (WatchTests.java:57-93)
 - compact dedupe: 4 compact events, after-ids 1,2,1,2 -> each mapped
   target gets the seed plus one batch [1,2] (WatchTests.java:96-157)
 - extended format: same via the `value` field (WatchTests.java:159-251)
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from cdc_dedupe_spark.config import load_config
from cdc_dedupe_spark.streaming.pipeline import watch

CONFIG_YAML = """\
source:
  format: compact
  prefix: "m2.m2."
  group: cdc
  consumer: cdc
  acknowledge: {ack}
buffers:
  source: {{size: 1000, time: 1000}}
  dedupe: {{size: 100000, time: 5000}}
  target: {{size: 1000, time: 1000}}
target:
  prefix: "target."
mapping:
  catalog_category_entity:
    entity_id:
      - catalog_product_flat
      - catalog_category_product
"""


def _write_config(tmp: Path, ack: str = "delete") -> Path:
    p = tmp / "config.yaml"
    p.write_text(CONFIG_YAML.format(ack=ack))
    return p


def _envelope_compact(offset: str, entity_id: int) -> dict:
    payload = json.dumps(
        {"before": {"entity_id": entity_id, "v": 4}, "after": {"entity_id": entity_id, "v": 4}}
    )
    return {"offset": offset, "stream": "m2.m2.catalog_category_entity", "fields": {"key": payload}}


def _envelope_extended(offset: str, entity_id: int) -> dict:
    payload = json.dumps({"before": {"entity_id": entity_id, "v": 3}, "after": {"entity_id": entity_id}})
    return {
        "offset": offset,
        "stream": "m2.m2.catalog_category_entity",
        "fields": {"key": "{}", "value": payload},
    }


def _run(spark, tmp: Path, events: list[dict], ack: str = "delete"):
    cfg = load_config(_write_config(tmp, ack))
    src = tmp / "in"
    src.mkdir()
    if events:
        (src / "batch0.json").write_text("\n".join(json.dumps(e) for e in events))
    else:
        (src / "empty.json").write_text("")
    handles = watch(spark, cfg, str(src), str(tmp / "work"))
    handles.query.awaitTermination()
    out = spark.read.json(handles.output_dir)
    return cfg, handles, out


def _target_records(out, target_stream: str) -> list[str]:
    return [r.ids for r in out.filter(out.target_stream == target_stream).collect()]


def test_watch_basic_seed_only(spark, tmp_path):
    _, handles, out = _run(spark, tmp_path, events=[])
    for tgt in ("target.catalog_product_flat", "target.catalog_category_product"):
        assert _target_records(out, tgt) == ["[]"]


@pytest.mark.parametrize("mk", [_envelope_compact, _envelope_extended], ids=["compact", "extended"])
def test_watch_dedupe_both_formats(spark, tmp_path, mk):
    events = [mk(f"100{i}-0", eid) for i, eid in enumerate([1, 2, 1, 2])]
    cfg, handles, out = _run(spark, tmp_path, events, ack="delete" if mk is _envelope_compact else "simple")
    for tgt in ("target.catalog_product_flat", "target.catalog_category_product"):
        recs = _target_records(out, tgt)
        assert len(recs) == 2, recs  # seed + one batch
        assert "[]" in recs
        batch = next(r for r in recs if r != "[]")
        assert json.loads(batch) == [1, 2]  # first-occurrence arrival order
    # ack ledger: all 4 offsets acknowledged, tagged with the ack mode
    acks = spark.read.json(handles.ack_dir)
    rows = acks.collect()
    assert {r.offset for r in rows} == {f"100{i}-0" for i in range(4)}
    assert {r.ack_mode for r in rows} == {cfg.source.acknowledge}


def test_watch_multi_column_general_case(spark, tmp_path):
    """The reference extracts every column's id from the FIRST mapped column
    (WatchStream.java:324 — wrong ids for secondary columns; SURVEY §2A).
    The rebuild extracts each column's own id: one event carrying different
    values in two mapped columns routes each value to its own target."""
    cfg_text = """\
source: {format: compact, prefix: "m2.m2.", group: cdc, consumer: cdc, acknowledge: simple}
buffers: {source: {size: 1000, time: 1000}, dedupe: {size: 100000, time: 5000}, target: {size: 1000, time: 1000}}
target: {prefix: "target."}
mapping:
  catalog_category_product:
    category_id: [cat_index]
    product_id: [prod_index]
"""
    p = tmp_path / "config.yaml"
    p.write_text(cfg_text)
    cfg = load_config(p)
    payload = json.dumps({"after": {"category_id": 7, "product_id": 42}})
    ev = {"offset": "1000-0", "stream": "m2.m2.catalog_category_product", "fields": {"key": payload}}
    src = tmp_path / "in"
    src.mkdir()
    (src / "b.json").write_text(json.dumps(ev))
    handles = watch(spark, cfg, str(src), str(tmp_path / "work"))
    handles.query.awaitTermination()
    out = spark.read.json(handles.output_dir)
    assert _target_records(out, "target.cat_index") == ["[]", "[7]"] or set(
        _target_records(out, "target.cat_index")
    ) == {"[]", "[7]"}
    assert set(_target_records(out, "target.prod_index")) == {"[]", "[42]"}


def test_watch_dead_letter_sink(spark, tmp_path):
    """A malformed envelope (unparseable payload / missing id) must survive
    in the dead-letter sink even under acknowledge=delete — the rebuild's
    upgrade over the reference, which throws and wedges the stream on the
    first malformed record (RedisSource.java:63-66)."""
    good = _envelope_compact("1000-0", 1)
    bad = {
        "offset": "1001-0",
        "stream": "m2.m2.catalog_category_entity",
        "fields": {"key": "{not json"},
    }
    _, handles, out = _run(spark, tmp_path, [good, bad], ack="delete")
    # good record still routed
    for tgt in ("target.catalog_product_flat", "target.catalog_category_product"):
        assert set(_target_records(out, tgt)) == {"[]", "[1]"}
    # bad record survives in the dead-letter dir, once per routed target
    dead = spark.read.json(handles.dead_dir)
    rows = dead.collect()
    assert {r.offset for r in rows} == {"1001-0"}
    assert all(r.stream == "m2.m2.catalog_category_entity" for r in rows)
    # the bad offset was still acked (batch membership is the barrier)
    acks = spark.read.json(handles.ack_dir)
    assert {r.offset for r in acks.collect()} == {"1000-0", "1001-0"}


def test_config_validation_rejects_feedback_loop(tmp_path):
    cfg_text = """\
source: {prefix: "m2.m2."}
target: {prefix: "m2.m2."}
mapping:
  catalog_category_product:
    entity_id: [catalog_category_product]
"""
    p = tmp_path / "bad.yaml"
    p.write_text(cfg_text)
    with pytest.raises(ValueError, match="collides"):
        load_config(p)


def test_debezium_generate(tmp_path):
    from cdc_dedupe_spark.debezium import generate

    cfg = load_config(_write_config(tmp_path))
    out = generate(cfg)
    assert "debezium.source.topic.prefix=m2" in out
    assert "debezium.source.table.include.list=m2.catalog_category_entity" in out
    assert "debezium.source.column.include.list=m2.catalog_category_entity.entity_id" in out
    assert "{{" not in out  # every placeholder substituted


@pytest.mark.parametrize("ack", ["delete", "simple"])
def test_watch_redis_to_redis_topology(spark, tmp_path, ack):
    """The reference's actual topology end-to-end: source events polled
    from Redis streams, packed batches XADDed to target Redis streams
    (RedisSource.java:72-93 in, WatchStream.java:291-293 out) — run over
    the file-backed fake client. acknowledge=delete empties the source
    stream (S20, WatchTests.java:151-154); simple retains all entries
    (WatchTests.java:245-248)."""
    from tests.fake_redis import FakeRedis

    cfg = load_config(_write_config(tmp_path, ack))
    redis_dir = tmp_path / "redis"
    fake = FakeRedis(str(redis_dir))
    for i, eid in enumerate([1, 2, 1, 2], start=1):
        env = _envelope_compact(f"1-{i}", eid)
        fake.xadd(env["stream"], env["fields"])

    handles = watch(
        spark,
        cfg,
        source_dir=None,
        work_dir=str(tmp_path / "work"),
        redis_options={
            "client_factory": "tests.fake_redis:make_client",
            "fake_dir": str(redis_dir),
        },
        redis_sink=True,
    )
    handles.query.awaitTermination()

    for target in ("target.catalog_product_flat", "target.catalog_category_product"):
        entries = fake.xrange(target)
        ids = [json.loads(f["ids"]) for _, f in entries]
        assert ids[0] == []  # seed record first (WatchStream.java:262-265)
        assert ids[1:] == [[1, 2]]  # one deduped batch

    # ack ledger covers all 4 source offsets
    acks = spark.read.json(handles.ack_dir)
    assert acks.count() == 4
    assert acks.select("ack_mode").distinct().first().ack_mode == ack

    # XACK parity (WatchStream.java:196-205): the consumer group exists at
    # the source stream and every offset was XACKed against it
    src_stream = "m2.m2.catalog_category_entity"
    assert fake.groups(src_stream) == ["cdc"]
    assert sorted(fake.acked(src_stream, "cdc")) == [f"1-{i}" for i in range(1, 5)]

    # S20: delete mode empties the source stream, simple retains it
    residue = fake.xrange(src_stream)
    assert len(residue) == (0 if ack == "delete" else 4)

    # the ack path batches: one XACK (+ one XDEL) round trip per
    # stream-chunk, never one per record
    rts = fake.round_trips()
    assert rts.count("xack") <= 2
    assert rts.count("xdel") <= (2 if ack == "delete" else 0)


def test_watch_batch_reads_source_once(spark, tmp_path):
    """VERDICT r7 'What's wrong' #1: the micro-batch is persisted, so the
    4+ actions in _process_batch (isEmpty, format probe, packed/dead/ack
    writes, ack foreachPartition) fetch each source partition exactly ONCE
    — one XRANGE per (stream, batch), not one per action. Redis-sink mode
    with group+delete acks = the maximal action count."""
    from tests.fake_redis import FakeRedis

    cfg = load_config(_write_config(tmp_path, "delete"))
    redis_dir = tmp_path / "redis"
    fake = FakeRedis(str(redis_dir))
    for i, eid in enumerate([1, 2, 1, 2], start=1):
        env = _envelope_compact(f"1-{i}", eid)
        fake.xadd(env["stream"], env["fields"])

    handles = watch(
        spark,
        cfg,
        source_dir=None,
        work_dir=str(tmp_path / "work"),
        redis_options={
            "client_factory": "tests.fake_redis:make_client",
            "fake_dir": str(redis_dir),
        },
        redis_sink=True,
    )
    handles.query.awaitTermination()

    # one stream, one availableNow batch -> exactly one XRANGE round trip
    # (snapshot BEFORE the assertion xrange below, which logs its own trip)
    xranges = [op for op in fake.round_trips() if op == "xrange"]
    assert len(xranges) == 1, f"source re-read: {len(xranges)} XRANGEs for 1 (stream, batch)"
    # output still correct end-to-end
    entries = fake.xrange("target.catalog_product_flat")
    assert [json.loads(f["ids"]) for _, f in entries][1:] == [[1, 2]]


def test_watch_drain_keeps_cap_watermark_fresh(spark, tmp_path):
    """ADVICE r7 (medium): an availableNow drain wires cap_state_dir even
    though it never caps, so the shared checkpoint's watermark file tracks
    the drain's committed end — a later capped continuous run on this work
    dir can never seed a regressed offset from a stale file. A
    user-supplied cap in drain mode is stripped with a warning (a capped
    latestOffset answer would silently truncate the drain)."""
    from tests.fake_redis import FakeRedis

    cfg = load_config(_write_config(tmp_path))
    redis_dir = tmp_path / "redis"
    fake = FakeRedis(str(redis_dir))
    for i, eid in enumerate([1, 2, 3, 4], start=1):
        env = _envelope_compact(f"1-{i}", eid)
        fake.xadd(env["stream"], env["fields"])

    with pytest.warns(UserWarning, match="max_entries_per_batch"):
        handles = watch(
            spark,
            cfg,
            source_dir=None,
            work_dir=str(tmp_path / "work"),
            redis_options={
                "client_factory": "tests.fake_redis:make_client",
                "fake_dir": str(redis_dir),
                "max_entries_per_batch": "1",  # would truncate the drain
            },
            redis_sink=True,
        )
    handles.query.awaitTermination()

    # the drain consumed everything (the stripped cap did not truncate it)
    assert spark.read.json(handles.ack_dir).count() == 4
    # and the shared watermark file sits at the drained end
    wm_path = tmp_path / "work" / "checkpoint" / "redis_cap" / "cap_watermark.json"
    assert json.loads(wm_path.read_text()) == {"m2.m2.catalog_category_entity": "1-4"}


def test_watch_restart_resumes_from_checkpoint(spark, tmp_path):
    """Restart with the same work dir must NOT reprocess already-checked-
    pointed input: the first run's events are neither re-acked nor re-
    emitted (the checkpoint replaces the reference's refcount ledger,
    WatchStream.java:233-242), while new files picked up after the restart
    flow through normally."""
    events0 = [_envelope_compact(f"100{i}-0", eid) for i, eid in enumerate([1, 2])]
    cfg, handles, out = _run(spark, tmp_path, events0)
    tgt = "target.catalog_product_flat"
    first = [r for r in _target_records(out, tgt) if r != "[]"]
    assert len(first) == 1 and json.loads(first[0]) == [1, 2]

    # drop a new file (id 2 again + new id 3) and restart on the same
    # checkpoint/work dir
    events1 = [_envelope_compact(f"200{i}-0", eid) for i, eid in enumerate([2, 3])]
    (tmp_path / "in" / "batch1.json").write_text("\n".join(json.dumps(e) for e in events1))
    from cdc_dedupe_spark.streaming.pipeline import watch

    handles2 = watch(spark, cfg, str(tmp_path / "in"), str(tmp_path / "work"))
    handles2.query.awaitTermination()
    out2 = spark.read.json(handles2.output_dir)

    batches = [json.loads(r) for r in _target_records(out2, tgt) if r != "[]"]
    # exactly one batch per input file; batch0's [1,2] not re-emitted
    assert sorted(batches) == [[1, 2], [2, 3]], batches
    acks = spark.read.json(handles2.ack_dir).collect()
    offsets = [r.offset for r in acks]
    assert sorted(offsets) == ["1000-0", "1001-0", "2000-0", "2001-0"]  # each exactly once


def _delete_last_commit(work: Path) -> None:
    """Simulate a crash between the sink actions and the checkpoint commit:
    the offsets entry for the last batch survives, its commits entry does
    not — on restart the engine re-runs that batch with the same batchId."""
    commits = sorted(
        (p for p in (work / "checkpoint" / "commits").iterdir() if p.name.isdigit()),
        key=lambda p: int(p.name),
    )
    commits[-1].unlink()
    # Hadoop's checksummed local FS keeps a .N.crc sidecar; a stale one
    # makes the replay's commit rewrite fail as a concurrent modification.
    crc = commits[-1].parent / f".{commits[-1].name}.crc"
    if crc.exists():
        crc.unlink()


def test_watch_sink_replay_after_commit_crash_no_duplicates(spark, tmp_path):
    """VERDICT r7 'What's missing' #3, window 1: crash AFTER the sinks ran,
    BEFORE the checkpoint commit. The engine replays the batch; the
    manifest's done-marker makes the replay a no-op — no duplicate target
    records, no duplicate acks (effectively-once)."""
    events = [_envelope_compact(f"100{i}-0", eid) for i, eid in enumerate([1, 2])]
    cfg, handles, out = _run(spark, tmp_path, events)
    tgt = "target.catalog_product_flat"
    assert [json.loads(r) for r in _target_records(out, tgt) if r != "[]"] == [[1, 2]]

    _delete_last_commit(tmp_path / "work")
    handles2 = watch(spark, cfg, str(tmp_path / "in"), str(tmp_path / "work"))
    handles2.query.awaitTermination()

    out2 = spark.read.json(handles2.output_dir)
    assert [json.loads(r) for r in _target_records(out2, tgt) if r != "[]"] == [[1, 2]]
    offsets = [r.offset for r in spark.read.json(handles2.ack_dir).collect()]
    assert sorted(offsets) == ["1000-0", "1001-0"], "acks must not duplicate on replay"


def test_watch_sink_scrubs_partial_attempt(spark, tmp_path):
    """Window 2: crash DURING the sink writes (started-marker present, done
    absent, some batch files already published). The replay scrubs the
    crashed attempt's b{batchId}-* files before rewriting — partial output
    never double-counts."""
    # plant a crashed batch-0 attempt: started marker + one partial file
    manifest_dir = tmp_path / "work" / "checkpoint" / "sink_manifest"
    manifest_dir.mkdir(parents=True)
    (manifest_dir / "0.started").write_text("")
    tgt = "target.catalog_product_flat"
    tgt_dir = tmp_path / "work" / "targets" / f"target_stream={tgt}"
    tgt_dir.mkdir(parents=True)
    (tgt_dir / "b0-part-00000-crashed.json").write_text('{"ids":"[9]"}\n')

    events = [_envelope_compact(f"100{i}-0", eid) for i, eid in enumerate([1, 2])]
    _, handles, out = _run(spark, tmp_path, events)
    batches = [json.loads(r) for r in _target_records(out, tgt) if r != "[]"]
    assert batches == [[1, 2]], f"crashed attempt's partial output survived: {batches}"


def test_watch_redis_sink_idempotent_replay(spark, tmp_path):
    """Both crash windows for the XADD sink: a done-marked replay skips the
    XADDs entirely; a started-without-done replay scrubs the crashed
    attempt's entries (they carry batch=<batchId>) and rewrites exactly
    one copy."""
    from tests.fake_redis import FakeRedis

    cfg = load_config(_write_config(tmp_path, "simple"))
    redis_dir = tmp_path / "redis"
    fake = FakeRedis(str(redis_dir))
    for i, eid in enumerate([1, 2, 1, 2], start=1):
        env = _envelope_compact(f"1-{i}", eid)
        fake.xadd(env["stream"], env["fields"])
    redis_opts = {"client_factory": "tests.fake_redis:make_client", "fake_dir": str(redis_dir)}
    work = str(tmp_path / "work")

    def run() -> None:
        h = watch(spark, cfg, None, work, redis_options=redis_opts, redis_sink=True)
        h.query.awaitTermination()

    def non_seed(target: str) -> list:
        return [json.loads(f["ids"]) for _, f in fake.xrange(target) if f["ids"] != "[]"]

    tgt = "target.catalog_product_flat"
    run()
    assert non_seed(tgt) == [[1, 2]]

    # window 1: done marker present -> replay skips the XADDs
    _delete_last_commit(Path(work))
    run()
    assert non_seed(tgt) == [[1, 2]], "done-marked replay must not re-XADD"

    # window 2: done marker gone (crash mid-write) -> scrub + rewrite once
    _delete_last_commit(Path(work))
    manifest_dir = Path(work) / "checkpoint" / "sink_manifest"
    done = sorted(manifest_dir.glob("*.done"), key=lambda p: int(p.stem))[-1]
    done.unlink()
    run()
    assert non_seed(tgt) == [[1, 2]], "scrub-replay must leave exactly one copy"


def test_watch_sink_at_least_once_when_idempotence_off(spark, tmp_path):
    """idempotent_sink=False pins the reference's raw contract: the same
    commit-crash replay DOES duplicate the batch (at-least-once) — the
    documented behavior the manifest upgrades away."""
    events = [_envelope_compact(f"100{i}-0", eid) for i, eid in enumerate([1, 2])]
    cfg = load_config(_write_config(tmp_path))
    src = tmp_path / "in"
    src.mkdir()
    (src / "batch0.json").write_text("\n".join(json.dumps(e) for e in events))
    h = watch(spark, cfg, str(src), str(tmp_path / "work"), idempotent_sink=False)
    h.query.awaitTermination()

    _delete_last_commit(tmp_path / "work")
    h2 = watch(spark, cfg, str(src), str(tmp_path / "work"), idempotent_sink=False)
    h2.query.awaitTermination()

    tgt = "target.catalog_product_flat"
    out = spark.read.json(h2.output_dir)
    batches = [json.loads(r) for r in _target_records(out, tgt) if r != "[]"]
    assert batches == [[1, 2], [1, 2]], "raw append sink should have replayed the batch"


def test_unknown_source_format_warns(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(CONFIG_YAML.format(ack="simple").replace("format: compact", "format: protobuf"))
    with pytest.warns(UserWarning, match="source.format"):
        cfg = load_config(p)
    assert cfg.source.format == "protobuf"  # carried through, decode is per-record


def test_declared_format_mismatch_warns_once(spark, tmp_path):
    """format: extended + all-compact records -> one warning on the first
    non-empty batch (detection is per-record, so output is unaffected)."""
    import warnings as _w

    from cdc_dedupe_spark.streaming.pipeline import (
        _format_check_key,
        _format_checked,
        _warn_format_mismatch,
    )

    cfg = load_config(_write_config(tmp_path, "simple"))
    cfg = type(cfg)(
        source=type(cfg.source)(format="extended"),
        buffers=cfg.buffers,
        target=cfg.target,
        mapping=cfg.mapping,
    )
    batch = spark.createDataFrame(
        [_envelope_compact("1-0", 1), _envelope_compact("2-0", 2)],
        "offset string, stream string, fields map<string,string>",
    )
    with pytest.warns(UserWarning, match="decode as the other envelope form"):
        _warn_format_mismatch(batch, cfg)
    with _w.catch_warnings():
        _w.simplefilter("error")  # second call: checked-set short-circuits, no warning
        _warn_format_mismatch(batch, cfg)
    _format_checked.discard(_format_check_key(cfg))


def test_watch_delete_with_foreign_consumer_pel(spark, tmp_path):
    """acknowledge=delete while ANOTHER consumer group holds the same
    entries in its PEL (pending entries list): the reference's tests
    assert the source still empties (WatchTests.java:151-154), and real
    Redis leaves the foreign PEL dangling rather than blocking XDEL. The
    pipeline must neither skip the delete nor touch the foreign group."""
    from tests.fake_redis import FakeRedis

    cfg = load_config(_write_config(tmp_path, "delete"))
    redis_dir = tmp_path / "redis"
    fake = FakeRedis(str(redis_dir))
    src_stream = "m2.m2.catalog_category_entity"
    for i, eid in enumerate([1, 2, 1, 2], start=1):
        env = _envelope_compact(f"1-{i}", eid)
        fake.xadd(env["stream"], env["fields"])

    # A foreign group's consumer reads everything and acks NOTHING, so all
    # 4 entries sit in its PEL when our pipeline XDELs them.
    fake.xgroup_create(src_stream, "other", id="0-0")
    fake.xreadgroup("other", "rival", {src_stream: ">"})
    assert fake.pending(src_stream, "other") == [f"1-{i}" for i in range(1, 5)]

    handles = watch(
        spark,
        cfg,
        source_dir=None,
        work_dir=str(tmp_path / "work"),
        redis_options={
            "client_factory": "tests.fake_redis:make_client",
            "fake_dir": str(redis_dir),
        },
        redis_sink=True,
    )
    handles.query.awaitTermination()

    # Source emptied despite the foreign PEL (the reference's assertion)...
    assert fake.xrange(src_stream) == []
    # ...our group acked all 4 offsets...
    assert sorted(fake.acked(src_stream, "cdc")) == [f"1-{i}" for i in range(1, 5)]
    # ...and the foreign group's PEL is untouched (dangling, like real
    # Redis: XDEL does not clear other groups' pending references).
    assert fake.pending(src_stream, "other") == [f"1-{i}" for i in range(1, 5)]
    # The deduped batch still reached every target.
    for target in ("target.catalog_product_flat", "target.catalog_category_product"):
        ids = [json.loads(f["ids"]) for _, f in fake.xrange(target)]
        assert ids == [[], [1, 2]]


def test_watch_crash_mid_delete_ack_no_output_loss(spark, tmp_path):
    """The round-8 review's data-loss window: a crash AFTER some
    acknowledge=delete XDELs but BEFORE the checkpoint commit. The done
    marker is written BEFORE the destructive ack, so the restart must
    take the committed path — skip the sinks (no scrub, no rewrite from
    the now-partial source) and only finish the remaining acks. Marking
    AFTER the ack (the old order) scrubbed and rewrote the batch from
    whatever entries survived the partial delete — permanent loss."""
    from tests.fake_redis import FakeRedis

    cfg = load_config(_write_config(tmp_path, "delete"))
    redis_dir = tmp_path / "redis"
    fake = FakeRedis(str(redis_dir))
    for i, eid in enumerate([1, 2, 1, 2], start=1):
        env = _envelope_compact(f"1-{i}", eid)
        fake.xadd(env["stream"], env["fields"])

    crash_opts = {
        "client_factory": "tests.fake_redis:make_xdel_crash_client",
        "fake_dir": str(redis_dir),
        "crash_state": str(tmp_path / "crash.flag"),
    }
    with pytest.raises(Exception):
        h = watch(
            spark, cfg, source_dir=None, work_dir=str(tmp_path / "work"),
            redis_options=crash_opts, redis_sink=True,
        )
        h.query.awaitTermination()
    src_stream = "m2.m2.catalog_category_entity"
    assert len(fake.xrange(src_stream)) < 4  # the partial delete really happened

    # restart on the same work dir: same factory, crash flag already fired
    h2 = watch(
        spark, cfg, source_dir=None, work_dir=str(tmp_path / "work"),
        redis_options=crash_opts, redis_sink=True,
    )
    h2.query.awaitTermination()

    for target in ("target.catalog_product_flat", "target.catalog_category_product"):
        ids = [json.loads(f["ids"]) for _, f in fake.xrange(target)]
        assert ids == [[], [1, 2]], f"{target}: {ids}"  # seed + ONE intact batch
    assert fake.xrange(src_stream) == []  # remaining acks finished on replay


def test_watch_redis_source_json_sink_still_acks(spark, tmp_path):
    """acknowledge=delete with a Redis SOURCE but JSON file sinks: the
    S15-S20 ack path is about the source stream, not the sink kind — the
    source must still be XACKed and emptied (round-8 review: the ack
    block was wrongly gated on redis_sink)."""
    from tests.fake_redis import FakeRedis

    cfg = load_config(_write_config(tmp_path, "delete"))
    redis_dir = tmp_path / "redis"
    fake = FakeRedis(str(redis_dir))
    for i, eid in enumerate([1, 2, 1, 2], start=1):
        env = _envelope_compact(f"1-{i}", eid)
        fake.xadd(env["stream"], env["fields"])

    handles = watch(
        spark, cfg, source_dir=None, work_dir=str(tmp_path / "work"),
        redis_options={
            "client_factory": "tests.fake_redis:make_client",
            "fake_dir": str(redis_dir),
        },
        redis_sink=False,
    )
    handles.query.awaitTermination()

    out = spark.read.json(handles.output_dir)
    tgt = "target.catalog_product_flat"
    assert [r for r in _target_records(out, tgt) if r != "[]"] == ["[1,2]"] or [
        json.loads(r) for r in _target_records(out, tgt) if r != "[]"
    ] == [[1, 2]]
    src_stream = "m2.m2.catalog_category_entity"
    assert sorted(fake.acked(src_stream, "cdc")) == [f"1-{i}" for i in range(1, 5)]
    assert fake.xrange(src_stream) == []  # delete mode empties the source


def test_watch_restart_seeds_targets_once(spark, tmp_path):
    """Seeds carry no batch id, so they are outside the idempotent
    machinery: re-seeding on every restart would grow each target by one
    '[]' per process start (round-8 review). The marker inside the
    checkpoint dir bounds it to once per pipeline lifetime."""
    _run(spark, tmp_path, [])
    h2 = watch(spark, load_config(tmp_path / "config.yaml"), str(tmp_path / "in"), str(tmp_path / "work"))
    h2.query.awaitTermination()
    out = spark.read.json(h2.output_dir)
    for target in ("target.catalog_product_flat", "target.catalog_category_product"):
        assert _target_records(out, target) == ["[]"], target


def test_sink_manifest_prunes_old_markers(tmp_path):
    """The manifest must not grow unboundedly (two files per micro-batch
    forever — round-8 review): markers behind the RETAIN horizon are
    pruned on mark()."""
    from cdc_dedupe_spark.streaming.pipeline import SinkManifest

    m = SinkManifest(tmp_path / "m")
    for b in range(SinkManifest.RETAIN + 50):
        m.start(b)
        m.mark(b)
    names = {f.name for f in (tmp_path / "m").iterdir()}
    last = SinkManifest.RETAIN + 49
    assert f"{last}.done" in names
    assert "0.done" not in names and "0.started" not in names
    assert len(names) <= 2 * (SinkManifest.RETAIN + 1)
    # pruning never touches what committed() relies on for recent batches
    assert m.committed(last) and not m.committed(0)


def test_config_hardening(tmp_path):
    """Round-8 review hardening: empty file -> clear error; zero target
    buffer -> rejected (it divides the packing row number); scalar target
    -> one-target list, never char-split; invalid acknowledge -> loud
    conservative fallback; feedback loop detected with EMPTY prefixes."""
    import warnings as w

    empty = tmp_path / "empty.yaml"
    empty.write_text("# nothing here\n")
    with pytest.raises(ValueError, match="empty or not a mapping"):
        load_config(empty)

    zb = tmp_path / "zb.yaml"
    zb.write_text(
        CONFIG_YAML.format(ack="simple").replace(
            "target: {size: 1000, time: 1000}", "target: {size: 0, time: 1000}"
        )
    )
    with pytest.raises(ValueError, match="buffers.target.size"):
        load_config(zb)

    scalar = tmp_path / "scalar.yaml"
    scalar.write_text(
        "mapping:\n  events_tbl:\n    user_id: analytics\n"
    )
    cfg = load_config(scalar)
    assert cfg.mapping["events_tbl"]["user_id"] == ["analytics"]

    badack = tmp_path / "badack.yaml"
    badack.write_text(CONFIG_YAML.format(ack="Delete"))
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        cfg = load_config(badack)
    assert cfg.source.acknowledge == "simple"
    assert any("acknowledge" in str(c.message) for c in caught)

    loop = tmp_path / "loop.yaml"
    loop.write_text("mapping:\n  events_tbl:\n    user_id:\n      - events_tbl\n")
    with pytest.raises(ValueError, match="feed back"):
        load_config(loop)


def test_watch_plan_malformed_offset_routes_to_dead(spark, tmp_path):
    """An unparseable offset must degrade to the dead relation (try_cast),
    never throw under ANSI mode and wedge the stream; and dead carries ONE
    row per malformed source entry, not one per fan-out target (round-8
    review)."""
    from cdc_dedupe_spark.plans.watch_plan import compile_watch_plan
    from cdc_dedupe_spark.streaming.pipeline import ENVELOPE_ROW_SCHEMA, routing_rows

    cfg = load_config(_write_config(tmp_path, "simple"))
    good = _envelope_compact("1-1", 7)
    bad = _envelope_compact("not-an-id", 8)  # ms part unparseable
    batch = spark.createDataFrame(
        [(e["offset"], e["stream"], e["fields"]) for e in (good, bad)],
        ENVELOPE_ROW_SCHEMA,
    )
    packed, acks, dead = compile_watch_plan(batch, routing_rows(spark, cfg), cfg)
    ids = sorted(json.loads(r.ids) for r in packed.collect())
    assert ids == [[7], [7]]  # one batch per target, malformed entry excluded
    dead_rows = dead.collect()
    assert len(dead_rows) == 1  # entity maps to TWO targets; still one row
    assert dead_rows[0].offset == "not-an-id"
    # both offsets still acked: under acknowledge=delete the malformed
    # entry is removed from the source only because dead retains a copy
    assert sorted(r.offset for r in acks.collect()) == ["1-1", "not-an-id"]


def test_watch_plan_malformed_seq_part_routes_to_dead(spark, tmp_path):
    """A PRESENT but unparseable seq part ("123-abc") is malformed and
    must go to dead — silently coercing it to seq 0 would alias a genuine
    "123-0" in the packing order (ADVICE r8). A bare "123" (no '-') stays
    valid: it is the documented Redis shorthand for "123-0"."""
    from cdc_dedupe_spark.plans.watch_plan import compile_watch_plan
    from cdc_dedupe_spark.streaming.pipeline import ENVELOPE_ROW_SCHEMA, routing_rows

    cfg = load_config(_write_config(tmp_path, "simple"))
    bare = _envelope_compact("123", 7)  # valid shorthand -> routed
    bad_seq = _envelope_compact("123-abc", 8)  # malformed seq -> dead
    batch = spark.createDataFrame(
        [(e["offset"], e["stream"], e["fields"]) for e in (bare, bad_seq)],
        ENVELOPE_ROW_SCHEMA,
    )
    packed, acks, dead = compile_watch_plan(batch, routing_rows(spark, cfg), cfg)
    ids = sorted(json.loads(r.ids) for r in packed.collect())
    assert ids == [[7], [7]]  # bare-ms entry routed, bad-seq entry excluded
    dead_rows = dead.collect()
    assert [r.offset for r in dead_rows] == ["123-abc"]
    assert sorted(r.offset for r in acks.collect()) == ["123", "123-abc"]
