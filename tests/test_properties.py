"""Property-based tests (SURVEY.md §5.2 item 4): dedupe idempotence,
fan-out conservation, batch-pack bounds — over hypothesis-generated event
lists run through the real operators."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cdc_dedupe_spark.operators.cdc import (
    DEFAULT_ROUTING,
    batch_pack,
    dedupe_first,
    fanout,
    routing_df,
)

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # entity id (collision-heavy)
        st.integers(min_value=0, max_value=10_000),  # arrival order key
        st.sampled_from(sorted(DEFAULT_ROUTING)),
    ),
    min_size=0,
    max_size=60,
    unique_by=lambda t: t[1],
)

_SETTINGS = settings(
    max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


def _df(spark, events):
    return spark.createDataFrame(
        events or [(0, 0, "click")], "entity_id int, arrival long, event_type string"
    ).filter(F.lit(bool(events)))


@given(events=EVENTS)
@_SETTINGS
def test_dedupe_idempotent_and_first_wins(spark, events):
    df = _df(spark, events)
    once = dedupe_first(df, ["entity_id"], ["arrival"])
    twice = dedupe_first(once, ["entity_id"], ["arrival"])
    got = {(r.entity_id, r.arrival) for r in once.collect()}
    # dedupe ∘ dedupe = dedupe
    assert {(r.entity_id, r.arrival) for r in twice.collect()} == got
    # first arrival wins per key
    expected = {}
    for eid, arr, _ in sorted(events, key=lambda t: t[1]):
        expected.setdefault(eid, arr)
    assert got == set(expected.items())


@given(events=EVENTS)
@_SETTINGS
def test_fanout_conservation(spark, events):
    """Σ target inputs = Σ source rows × fan-out width of their type."""
    df = _df(spark, events)
    routed = fanout(df, routing_df(df.sparkSession))
    expected = sum(len(DEFAULT_ROUTING[t]) for _, _, t in events)
    assert routed.count() == expected


@given(events=EVENTS, size=st.integers(min_value=1, max_value=7))
@_SETTINGS
def test_batch_pack_bounds_and_conservation(spark, events, size):
    df = _df(spark, events)
    packed = batch_pack(df, "entity_id", ["arrival"], batch_size=size).collect()
    ids = [i for r in packed for i in json.loads(r.ids_json)]
    # conservation: every id appears exactly as often as in the input
    assert sorted(ids) == sorted(e for e, _, _ in events)
    # bound: every bucket <= size; all but the last bucket full
    sizes = {r.bucket: r.n_ids for r in packed}
    assert all(n <= size for n in sizes.values())
    if sizes:
        full = [b for b, n in sizes.items() if n == size]
        assert len(full) >= len(sizes) - 1
