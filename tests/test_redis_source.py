"""Tests for the redis_stream Python Data Source (sources/redis_stream.py):
offset planning and range reads unit-tested against the file-backed fake
client, plus an end-to-end readStream -> memory sink run.
"""

from __future__ import annotations

import json

import pytest

from cdc_dedupe_spark.sources.redis_stream import (
    RedisStreamDataSource,
    RedisStreamReader,
    StreamRange,
    ZERO_ID,
    _is_missing_stream,
    _record_id_tuple,
    _split_range,
    ensure_group,
)
from tests.fake_redis import FakeRedis

ENVELOPE = '{"after": {"entity_id": "%d"}}'


def _opts(tmp_path, streams: str) -> dict[str, str]:
    return {
        "streams": streams,
        "client_factory": "tests.fake_redis:make_client",
        "fake_dir": str(tmp_path),
    }


def _fill(tmp_path, stream: str, ids) -> FakeRedis:
    fake = FakeRedis(str(tmp_path))
    for i in ids:
        fake.xadd(stream, {"payload": ENVELOPE % i})
    return fake


def test_initial_and_latest_offsets(tmp_path):
    _fill(tmp_path, "m1.a", [1, 2, 3])
    r = RedisStreamReader(None, _opts(tmp_path, "m1.a,m1.b"))
    assert r.initialOffset() == {"m1.a": ZERO_ID, "m1.b": ZERO_ID}
    latest = r.latestOffset()
    assert latest["m1.a"] == "1-3"
    assert latest["m1.b"] == ZERO_ID  # stream not created yet


def test_partition_planning_skips_drained_streams(tmp_path):
    r = RedisStreamReader(None, _opts(tmp_path, "a,b,c"))
    parts = r.partitions(
        {"a": "1-5", "b": "1-2", "c": ZERO_ID},
        {"a": "1-5", "b": "1-9", "c": ZERO_ID},
    )
    # only b has new entries
    assert [(p.stream, p.start_id, p.end_id) for p in parts] == [("b", "1-2", "1-9")]


def test_partition_planning_empty_batch_yields_noop_partition(tmp_path):
    r = RedisStreamReader(None, _opts(tmp_path, "a"))
    parts = r.partitions({"a": "1-5"}, {"a": "1-5"})
    assert len(parts) == 1
    assert list(r.read(parts[0])) == []


def test_read_respects_exclusive_start_inclusive_end(tmp_path):
    _fill(tmp_path, "s", [10, 20, 30, 40])
    r = RedisStreamReader(None, _opts(tmp_path, "s"))
    rows = list(r.read(StreamRange(stream="s", start_id="1-1", end_id="1-3")))
    assert [rid for rid, _, _ in rows] == ["1-2", "1-3"]
    assert all(stream == "s" for _, stream, _ in rows)
    assert json.loads(rows[0][2]["payload"])["after"]["entity_id"] == "20"


def test_stream_e2e_reads_and_dedupes(spark, tmp_path):
    """readStream.format('redis_stream') end-to-end: envelope rows arrive
    with the watch pipeline's schema and flow through dropDuplicates."""
    streams_dir = tmp_path / "streams"
    _fill(streams_dir, "m1.orders", [7, 8, 7, 9, 8])

    spark.dataSource.register(RedisStreamDataSource)
    reader = spark.readStream.format("redis_stream")
    for k, v in _opts(streams_dir, "m1.orders").items():
        reader = reader.option(k, v)
    df = reader.load()
    assert df.schema.simpleString() == "struct<offset:string,stream:string,fields:map<string,string>>"

    from pyspark.sql import functions as F

    from cdc_dedupe_spark.operators.cdc import envelope_payload, extract_entity_id

    ids = df.select(
        extract_entity_id(envelope_payload("fields"), "entity_id").alias("entity_id")
    ).dropDuplicates(["entity_id"])

    q = (
        ids.writeStream.format("memory")
        .queryName("redis_e2e")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.entity_id for r in spark.table("redis_e2e").collect())
    assert got == [7, 8, 9]


def test_stream_sink_xadds_packed_batches(spark, tmp_path):
    """writeStream.format('redis_stream') sink: packed id batches land as
    stream entries with the reference's {'ids': '[...]'} field shape."""
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    (in_dir / "batch.json").write_text(
        '\n'.join(
            json.dumps({"target_stream": "target.idx", "ids": json.dumps([i, i + 1])})
            for i in range(0, 6, 2)
        )
    )
    spark.dataSource.register(RedisStreamDataSource)
    src = spark.readStream.schema("target_stream string, ids string").json(str(in_dir))
    q = (
        src.writeStream.format("redis_stream")
        .option("client_factory", "tests.fake_redis:make_client")
        .option("fake_dir", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    fake = FakeRedis(str(out_dir))
    entries = fake.xrange("target.idx")
    got = sorted(json.loads(f["ids"])[0] for _, f in entries)
    assert got == [0, 2, 4]


def test_missing_stream_gating_is_type_and_message(tmp_path):
    """ADVICE r2: only a server-side missing-KEY error maps to ZERO_ID.
    A unix-socket connection failure ('No such file or directory') must
    propagate — mapping it to ZERO_ID would commit a regressed offset and
    replay the whole stream."""
    assert _is_missing_stream(KeyError("no such stream 'm1.a'"))
    assert not _is_missing_stream(ConnectionError(
        "Error 2 connecting to /run/redis.sock: No such file or directory"
    ))
    assert not _is_missing_stream(OSError("No such file or directory"))
    assert not _is_missing_stream(Exception("no such key"))  # wrong type
    assert not _is_missing_stream(KeyError("WRONGTYPE key holds a list"))


def test_split_range_partitions_exactly():
    """Sub-ranges must partition (start, end] — disjoint, ordered, union
    equal to the input range — for both the multi-millis and same-millis
    shapes."""
    # same-millis: cut the seq space
    subs = _split_range("1-0", "1-100", 4)
    assert len(subs) == 4
    assert subs[0][0] == "1-0" and subs[-1][1] == "1-100"
    for (_, e1), (s2, _) in zip(subs, subs[1:]):
        assert e1 == s2  # adjacent: end of one is exclusive-start of next
    # multi-millis: cut the millis space
    subs = _split_range("1000-5", "5000-2", 4)
    assert subs[0][0] == "1000-5" and subs[-1][1] == "5000-2"
    for (_, e1), (s2, _) in zip(subs, subs[1:]):
        assert e1 == s2
    # k=1 and degenerate ranges stay whole
    assert _split_range("1-0", "1-2", 1) == [("1-0", "1-2")]
    assert _split_range("1-0", "1-1", 8) == [("1-0", "1-1")]


def test_hot_stream_splits_into_bounded_tasks(tmp_path):
    """max_entries_per_task splits a hot stream into several sub-range
    tasks (the reference's buffers.source.size admission control at task
    granularity); reading every partition yields each entry exactly once."""
    _fill(tmp_path, "hot", range(100))
    opts = _opts(tmp_path, "hot") | {"max_entries_per_task": "25"}
    r = RedisStreamReader(None, opts)
    parts = r.partitions({"hot": "1-0"}, {"hot": "1-100"})
    assert len(parts) == 4
    seen = [rid for p in parts for rid, _, _ in r.read(p)]
    assert len(seen) == len(set(seen)) == 100


def test_ensure_group_is_busygroup_tolerant(tmp_path):
    fake = FakeRedis(str(tmp_path))
    ensure_group(fake, "m1.a", "cdc")
    ensure_group(fake, "m1.a", "cdc")  # second call: BUSYGROUP swallowed
    assert fake.groups("m1.a") == ["cdc"]
    with pytest.raises(Exception, match="boom"):
        ensure_group(_Boom(), "m1.a", "cdc")


class _Boom:
    def xgroup_create(self, *a, **k):
        raise Exception("boom: connection refused")


def test_writer_pipelines_xadds(spark, tmp_path):
    """The XADD sink must batch through pipeline(): landing N rows costs
    O(N / PIPELINE_CHUNK) round trips, not N."""
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    (in_dir / "batch.json").write_text(
        "\n".join(
            json.dumps({"target_stream": "t.x", "ids": json.dumps([i])}) for i in range(40)
        )
    )
    spark.dataSource.register(RedisStreamDataSource)
    src = spark.readStream.schema("target_stream string, ids string").json(str(in_dir))
    q = (
        src.writeStream.format("redis_stream")
        .option("client_factory", "tests.fake_redis:make_client")
        .option("fake_dir", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    fake = FakeRedis(str(out_dir))
    assert len(fake.xrange("t.x")) == 40
    rts = [op for op in fake.round_trips() if op.startswith(("xadd", "pipeline"))]
    # one pipeline flush per task partition, never one trip per row
    assert all(op.startswith("pipeline") for op in rts), rts
    assert len(rts) <= 8, rts


def test_latest_offset_is_stateless_across_reader_instances(tmp_path):
    """Regression pin: with no cap configured, latestOffset MUST give the
    same (monotonic) answer from a fresh instance — the engine may run a
    fresh planner process, and any un-seeded instance-local state would
    produce overlapping batch ranges and duplicate rows."""
    _fill(tmp_path, "s", list(range(10)))
    opts = _opts(tmp_path, "s")
    a, b = RedisStreamReader(None, opts), RedisStreamReader(None, opts)
    a.initialOffset()
    assert a.latestOffset() == {"s": "1-10"}
    # fresh instance, no initialOffset call at all (the planning instance)
    assert b.latestOffset() == {"s": "1-10"}
    # repeated calls never regress
    assert a.latestOffset() == {"s": "1-10"}


# --- micro-batch admission control (buffers.source.size) -----------------


def _drain_capped(reader, committed: dict) -> tuple[list[str], dict]:
    """One engine planning round: latestOffset -> partitions -> read ->
    commit, mirroring MicroBatchExecution's call order. Returns the record
    ids read and the new committed end."""
    end = reader.latestOffset()
    rows = [rid for p in reader.partitions(committed, end) for rid, _, _ in reader.read(p)]
    reader.commit(end)
    return rows, end


def test_cap_drains_backlog_in_bounded_batches(tmp_path):
    """VERDICT r6 'Next round' #3: a 5,000-entry backlog with
    max_entries_per_batch=1,000 drains in >= 5 batches, each admitting at
    most the cap, with every entry seen exactly once."""
    _fill(tmp_path, "s", range(5000))
    opts = _opts(tmp_path, "s") | {
        "max_entries_per_batch": "1000",
        "cap_state_dir": str(tmp_path / "ckpt" / "redis_cap"),
    }
    r = RedisStreamReader(None, opts)
    # The engine's observed call order on a fresh query: latestOffset FIRST,
    # then initialOffset (batch 0's end is that first latestOffset answer).
    first_end = r.latestOffset()
    assert first_end == {"s": "1-1000"}, "first batch must already be capped"
    committed = r.initialOffset()
    # batch 0 consumes that first reported end, like the engine does.
    seen = [rid for p in r.partitions(committed, first_end) for rid, _, _ in r.read(p)]
    assert len(seen) == 1000
    r.commit(first_end)
    committed = first_end
    batches = 1
    while True:
        rows, end = _drain_capped(r, committed)
        if _record_id_tuple(end["s"]) <= _record_id_tuple(committed["s"]):
            break
        assert len(rows) <= 1000, f"batch {batches} admitted {len(rows)} > cap"
        seen += rows
        committed = end
        batches += 1
    assert batches >= 5
    assert len(seen) == len(set(seen)) == 5000


def test_cap_watermark_survives_planner_restart(tmp_path):
    """Mid-drain planner restart: a FRESH reader on the same cap_state_dir
    resumes capped batching from the persisted watermark — offsets stay
    monotonic, no entry is lost or read twice. Without the state dir the
    engine would get one uncapped batch (still monotonic), never a
    regressed offset."""
    _fill(tmp_path, "s", range(300))
    opts = _opts(tmp_path, "s") | {
        "max_entries_per_batch": "100",
        "cap_state_dir": str(tmp_path / "ckpt" / "redis_cap"),
    }
    r1 = RedisStreamReader(None, opts)
    first_end = r1.latestOffset()
    assert first_end == {"s": "1-100"}
    committed = r1.initialOffset()
    rows1 = [rid for p in r1.partitions(committed, first_end) for rid, _, _ in r1.read(p)]
    r1.commit(first_end)
    committed = first_end

    # planner process bounce: fresh instance, same state dir; the engine
    # does NOT call initialOffset on a restart.
    r2 = RedisStreamReader(None, opts)
    end2 = r2.latestOffset()
    assert _record_id_tuple(end2["s"]) >= _record_id_tuple(committed["s"]), "regressed offset"
    assert end2 == {"s": "1-200"}, "restart must resume capped, not uncapped"
    rows2 = [rid for p in r2.partitions(committed, end2) for rid, _, _ in r2.read(p)]
    r2.commit(end2)
    rows3, _ = _drain_capped(r2, end2)
    seen = rows1 + rows2 + rows3
    assert len(seen) == len(set(seen)) == 300


def test_cap_without_state_dir_first_batch_uncapped_but_monotonic(tmp_path):
    """No cap_state_dir -> no safe seed: the first latestOffset reports the
    true stream end (uncapped), later calls cap from the in-memory
    watermark. Never a regressed offset."""
    _fill(tmp_path, "s", range(300))
    opts = _opts(tmp_path, "s") | {"max_entries_per_batch": "100"}
    r = RedisStreamReader(None, opts)
    assert r.latestOffset() == {"s": "1-300"}  # uncapped first answer
    fake = FakeRedis(str(tmp_path))
    for i in range(50):
        fake.xadd("s", {"payload": ENVELOPE % i})
    assert r.latestOffset() == {"s": "1-350"}  # new entries < cap: all admitted
    for i in range(250):
        fake.xadd("s", {"payload": ENVELOPE % i})
    assert r.latestOffset() == {"s": "1-450"}  # capped at +100


def test_cap_e2e_processing_time_batches(spark, tmp_path):
    """End-to-end through the engine: 500 entries, cap 100, processingTime
    trigger -> the offset log records >= 5 strictly increasing batch ends
    and the sink sees all 500 rows exactly once."""
    import json as _json
    import pathlib
    import time

    streams_dir = tmp_path / "streams"
    _fill(streams_dir, "s", range(500))
    ckpt = str(tmp_path / "ckpt")
    spark.dataSource.register(RedisStreamDataSource)
    reader = spark.readStream.format("redis_stream")
    for k, v in (
        _opts(streams_dir, "s")
        | {"max_entries_per_batch": "100", "cap_state_dir": ckpt + "/redis_cap"}
    ).items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName("cap_e2e")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline and spark.table("cap_e2e").count() < 500:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    assert spark.table("cap_e2e").count() == 500
    assert spark.table("cap_e2e").select("offset").distinct().count() == 500
    offs = sorted(int(p.name) for p in pathlib.Path(ckpt, "offsets").iterdir() if p.name.isdigit())
    ends = [
        _json.loads(pathlib.Path(ckpt, "offsets", str(o)).read_text().splitlines()[-1])["s"]
        for o in offs
    ]
    assert len(ends) >= 5
    keys = [tuple(int(x) for x in e.split("-")) for e in ends]
    assert keys == sorted(keys) and len(set(keys)) == len(keys), f"non-monotonic ends: {ends}"


def test_cap_e2e_restart_no_duplicates(spark, tmp_path):
    """Engine-level checkpoint restart WITH the cap: run a few capped
    batches, stop, add more entries, restart on the same checkpoint +
    cap_state_dir. On restart the engine calls latestOffset without
    initialOffset — the persisted watermark must resume capped batching
    with every entry delivered exactly once and offset-log ends strictly
    increasing across both runs."""
    import json as _json
    import pathlib
    import time

    streams_dir = tmp_path / "streams"
    _fill(streams_dir, "s", range(300))
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    spark.dataSource.register(RedisStreamDataSource)
    opts = _opts(streams_dir, "s") | {
        "max_entries_per_batch": "100",
        "cap_state_dir": ckpt + "/redis_cap",
    }

    def n_out() -> int:
        try:
            return spark.read.json(out).count()
        except Exception:
            return 0  # sink dir not created yet

    def run_until(want: int) -> None:
        reader = spark.readStream.format("redis_stream")
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .selectExpr("offset", "stream")
            .writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline and n_out() < want:
            time.sleep(0.5)
        q.stop()
        q.awaitTermination()

    run_until(300)
    assert n_out() == 300

    fake = FakeRedis(str(streams_dir))
    for i in range(250):
        fake.xadd("s", {"payload": ENVELOPE % i})
    run_until(550)

    # the restarted run replays nothing (offsets resume in the checkpoint)
    # and delivers exactly the 250 new entries
    got = [r.offset for r in spark.read.json(out).collect()]
    assert len(got) == len(set(got)) == 550
    new_seqs = sorted(int(o.split("-")[1]) for o in got)[300:]
    assert new_seqs == list(range(301, 551))

    offs = sorted(int(p.name) for p in pathlib.Path(ckpt, "offsets").iterdir() if p.name.isdigit())
    ends = [
        _json.loads(pathlib.Path(ckpt, "offsets", str(o)).read_text().splitlines()[-1])["s"]
        for o in offs
    ]
    keys = [tuple(int(x) for x in e.split("-")) for e in ends]
    assert keys == sorted(set(keys)), f"offset log regressed: {ends}"
    # the second run stayed capped too: >= 3 batches for its 250 entries
    assert len([k for k in keys if k > (1, 300)]) >= 3, ends


def test_uncapped_drain_refreshes_cap_watermark(tmp_path):
    """ADVICE r7 (medium): capped run -> UNCAPPED availableNow drain on the
    same checkpoint/cap dir -> later capped run. The drain must max-merge
    its (uncapped) ends into cap_watermark.json; a later capped run then
    seeds at-or-past the drain's committed offset — never a regressed end,
    never a duplicate."""
    _fill(tmp_path, "s", range(100))
    cap_dir = str(tmp_path / "ckpt" / "redis_cap")
    capped = _opts(tmp_path, "s") | {"max_entries_per_batch": "40", "cap_state_dir": cap_dir}
    uncapped = _opts(tmp_path, "s") | {"cap_state_dir": cap_dir}

    r1 = RedisStreamReader(None, capped)
    end1 = r1.latestOffset()
    assert end1 == {"s": "1-40"}
    committed = r1.initialOffset()
    rows1 = [rid for p in r1.partitions(committed, end1) for rid, _, _ in r1.read(p)]
    r1.commit(end1)

    # availableNow drain (cap unset, cap_state_dir KEPT — the watch
    # pipeline wires exactly this): consumes to the true stream end.
    r2 = RedisStreamReader(None, uncapped)
    end2 = r2.latestOffset()
    assert end2 == {"s": "1-100"}
    rows2 = [rid for p in r2.partitions(end1, end2) for rid, _, _ in r2.read(p)]
    r2.commit(end2)

    # new entries arrive; a later CAPPED run seeds from the cap file
    fake = FakeRedis(str(tmp_path))
    for i in range(60):
        fake.xadd("s", {"payload": ENVELOPE % i})
    r3 = RedisStreamReader(None, capped)
    end3 = r3.latestOffset()
    assert _record_id_tuple(end3["s"]) >= _record_id_tuple(end2["s"]), (
        f"regressed offset: {end3} after committed {end2}"
    )
    assert end3 == {"s": "1-140"}, "must resume capped from the drain's end, not the stale file"
    rows3 = [rid for p in r3.partitions(end2, end3) for rid, _, _ in r3.read(p)]
    r3.commit(end3)
    rows4, _ = _drain_capped(r3, end3)
    seen = rows1 + rows2 + rows3 + rows4
    assert len(seen) == len(set(seen)) == 160


def test_capped_restart_added_stream_seeds_from_configured_start(tmp_path):
    """ADVICE r7 (low): a stream ADDED to the config after
    cap_watermark.json was written seeds from the configured start id, not
    ZERO_ID — its first capped end lands past the configured start."""
    _fill(tmp_path, "a", range(50))
    cap_dir = str(tmp_path / "ckpt" / "redis_cap")
    r1 = RedisStreamReader(
        None, _opts(tmp_path, "a") | {"max_entries_per_batch": "20", "cap_state_dir": cap_dir}
    )
    assert r1.latestOffset() == {"a": "1-20"}  # file now holds only 'a'

    fake = FakeRedis(str(tmp_path))
    for i in range(30):
        fake.xadd("b", {"payload": ENVELOPE % i})
    r2 = RedisStreamReader(
        None,
        _opts(tmp_path, "a,b")
        | {"max_entries_per_batch": "20", "cap_state_dir": cap_dir, "start": "1-5"},
    )
    end = r2.latestOffset()
    assert end["a"] == "1-40"  # resumed capped from the persisted watermark
    assert end["b"] == "1-25", "new stream must cap from the configured start (1-5), not 0-0"


# --- cap watermark property test ------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# An op sequence: add N entries / poll (latestOffset+consume+commit) /
# restart the planner (fresh reader, same state dir).
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("add"), st.integers(min_value=1, max_value=40)),
        st.tuples(st.just("poll"), st.just(0)),
        st.tuples(st.just("restart"), st.just(0)),
    ),
    min_size=3,
    max_size=14,
)


@given(ops=_OPS, cap=st.integers(min_value=1, max_value=15))
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cap_watermark_invariants_under_interleaving(tmp_path_factory, ops, cap):
    """Whatever the interleaving of appends, polls, and planner restarts:
    reported ends never regress, every batch admits <= cap entries (except
    at most the first poll after a restart, which may catch up), and a
    final drain delivers every entry exactly once."""
    tmp_path = tmp_path_factory.mktemp("capprop")
    fake = FakeRedis(str(tmp_path))
    opts = _opts(tmp_path, "s") | {
        "max_entries_per_batch": str(cap),
        "cap_state_dir": str(tmp_path / "ckpt" / "redis_cap"),
    }

    def new_reader(fresh_query: bool) -> RedisStreamReader:
        r = RedisStreamReader(None, opts)
        if fresh_query:
            r.latestOffset()  # engine probes latest BEFORE initialOffset
            r.initialOffset()
        return r

    reader = new_reader(fresh_query=True)
    committed = {"s": ZERO_ID}
    last_reported = ZERO_ID
    seen: list[str] = []
    n_added = 0
    fresh_after_restart = False

    def poll():
        nonlocal committed, last_reported, fresh_after_restart
        end = reader.latestOffset()
        assert _record_id_tuple(end["s"]) >= _record_id_tuple(last_reported), (
            f"regressed end: {end} after {last_reported}"
        )
        rows = [rid for p in reader.partitions(committed, end) for rid, _, _ in reader.read(p)]
        if not fresh_after_restart:
            assert len(rows) <= cap, f"admitted {len(rows)} > cap {cap}"
        reader.commit(end)
        seen.extend(rows)
        committed = end
        last_reported = end["s"]
        fresh_after_restart = False

    for op, n in ops:
        if op == "add":
            for i in range(n):
                fake.xadd("s", {"payload": ENVELOPE % i})
            n_added += n
        elif op == "poll" and n_added:
            poll()
        elif op == "restart":
            reader = new_reader(fresh_query=False)
            fresh_after_restart = True

    # final drain: poll until nothing new arrives
    for _ in range(n_added + 2):
        before = len(seen)
        poll()
        if len(seen) == before and committed["s"] == last_reported:
            end_now = reader.latestOffset()
            if end_now == committed:
                break
    assert len(seen) == len(set(seen)) == n_added, (
        f"delivered {len(seen)} ({len(set(seen))} unique) of {n_added}"
    )


def test_missing_stream_mid_run_reports_watermark_not_zero(tmp_path):
    """A consumed stream that disappears mid-run (DEL / failover) must not
    be reported as 0-0 — that end would be committed to the offset log and
    a recreated stream would replay every already-processed entry through
    the regressed range (round-8 review). The reader reports the highest
    end it ever reported (its watermark) instead; a stream that genuinely
    never existed still reports 0-0."""
    fake = _fill(tmp_path, "m1.a", [1, 2, 3])
    opts = _opts(tmp_path, "m1.a,m1.never")
    opts["cap_state_dir"] = str(tmp_path / "cap")
    r = RedisStreamReader(None, opts)
    first = r.latestOffset()
    assert first["m1.a"] == "1-3"
    assert first["m1.never"] == ZERO_ID  # never existed: genuinely fresh

    # the stream vanishes (file-backed fake: remove its storage)
    fake._path("m1.a").unlink()
    second = r.latestOffset()
    assert second["m1.a"] == "1-3", "must hold the watermark, not regress to 0-0"

    # recreated with new entries: resumes past the held end, no replay range
    fake.xadd("m1.a", {"payload": "x"})  # becomes id 1-1 again (fake ids restart)
    # ids restarted below the watermark -> reader keeps reporting the max
    third = r.latestOffset()
    assert third["m1.a"] == "1-3"
