"""Schema-drift tripwire (VERDICT r5 item 5).

Round 5 was wrecked because the driver regenerated /root/testdata with a
different `events.ts` encoding (parquet TIMESTAMP(NANOS) -> µs TIMESTAMP)
and the loader assumed the old one: 29 queries, 36 tests, and the bench
all broke on one line. These tests convert the next silent data change
into a single obvious failure:

- the loader's view of EVERY table is pinned column-by-column, so any
  generator schema change fails here first with a readable diff;
- `tables.normalize_event_ts` is exercised against BOTH historical ts
  encodings (fixtures written on the fly from the same in-memory rows, so
  they cannot go stale) and must produce identical TIMESTAMP values.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cdc_dedupe_spark.tables import TABLE_NAMES, table

# The loader-facing contract: column name -> Spark simpleString dtype,
# AFTER loader normalization (events.ts is always TIMESTAMP for callers,
# whatever the file encodes). If the generator changes a type, update the
# consuming queries/oracles deliberately — then this table.
EXPECTED = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_loader_view_schema_pinned(spark, sf_dir, name):
    df = table(spark, sf_dir, name)
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    assert got == EXPECTED[name], (
        f"{name}: generator/loader schema drift.\n got: {got}\n want: {EXPECTED[name]}"
    )


# --- both historical events.ts encodings ---------------------------------

_TS_VALUES_US = [1704067207179575, 1704067432824425, 1704067589165275]


def _write_events_fixture(path: str, unit: str) -> None:
    """Tiny events file with `ts` in the given parquet timestamp unit.

    unit="ns" reproduces the pre-r5 generator (TIMESTAMP(NANOS), which
    Spark only reads via nanosAsLong); unit="us" reproduces the current
    one (µs TIMESTAMP, isAdjustedToUTC=false -> TIMESTAMP_NTZ in Spark).
    """
    scale = 1000 if unit == "ns" else 1
    tbl = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array([v * scale for v in _TS_VALUES_US], pa.timestamp(unit)),
            "user_id": pa.array([8, 46, 7], pa.int64()),
            "event_type": pa.array(["error", "click", "view"]),
            "value": pa.array([6.55, 12.31, 1.63], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}']),
        }
    )
    pq.write_table(tbl, path)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_events_loader_handles_both_ts_encodings(spark, tmp_path, unit):
    _write_events_fixture(str(tmp_path / "events.parquet"), unit)
    df = table(spark, str(tmp_path), "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = [r.ts for r in df.select("ts").orderBy("event_id").collect()]
    # Integer arithmetic: float µs-since-epoch has ~0.5 µs ulp at this
    # magnitude, so build the expected wall time from an exact timedelta.
    want = [
        datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=v)
        for v in _TS_VALUES_US
    ]
    # session tz is UTC (session.py), so collect() returns naive UTC wall
    # times; both encodings must land on the identical µs values.
    assert got == want, f"{unit}: {got} != {want}"


def test_events_loader_rejects_unknown_ts_encoding(spark, tmp_path):
    """A THIRD ts encoding (e.g. ISO strings) must fail loudly in
    normalize_event_ts — one obvious ValueError, not mis-scaled values 30
    queries downstream (ADVICE r6 #1)."""
    path = str(tmp_path / "events.parquet")
    tbl = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array(["2024-01-01T00:00:07", "2024-01-01T00:03:52", "2024-01-01T00:06:29"]),
            "user_id": pa.array([8, 46, 7], pa.int64()),
            "event_type": pa.array(["error", "click", "view"]),
            "value": pa.array([6.55, 12.31, 1.63], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}']),
        }
    )
    pq.write_table(tbl, path)
    # the parquet-footer check catches this before normalize_event_ts even
    # sees a DataFrame; either tripwire firing is the contract
    with pytest.raises(ValueError, match="not a timestamp|unhandled type"):
        table(spark, str(tmp_path), "events")


def test_replay_schema_probe_cached(spark, sf_dir):
    """The streaming replay source must probe the events schema at most once
    per sf_dir per process (VERDICT r6 'Next round' #1 — the per-build batch
    probe cost ~26% of replay throughput)."""
    from cdc_dedupe_spark.sources import replay

    replay._SCHEMA_CACHE.clear()
    replay.events_stream(spark, sf_dir)
    assert sf_dir in replay._SCHEMA_CACHE
    cached = replay._SCHEMA_CACHE[sf_dir]
    # Second build must reuse the same StructType object, not re-probe.
    replay._SCHEMA_CACHE[sf_dir] = cached
    replay.events_stream(spark, sf_dir)
    assert replay._SCHEMA_CACHE[sf_dir] is cached


def test_events_loader_rejects_raw_int64_ts(spark, tmp_path):
    """A raw int64 ts (e.g. epoch MILLIS) is indistinguishable from
    TIMESTAMP(NANOS) in the Spark schema under nanosAsLong — the LongType
    branch would silently mis-scale it 1000x. The parquet-footer check
    must reject it before any value is produced (ADVICE r6 #1)."""
    path = str(tmp_path / "events.parquet")
    tbl = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array([v // 1000 for v in _TS_VALUES_US], pa.int64()),  # millis
            "user_id": pa.array([8, 46, 7], pa.int64()),
            "event_type": pa.array(["error", "click", "view"]),
            "value": pa.array([6.55, 12.31, 1.63], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}']),
        }
    )
    pq.write_table(tbl, path)
    with pytest.raises(ValueError, match="not a timestamp"):
        table(spark, str(tmp_path), "events")
