"""Grouped two-pass exact-percentile edge cases (r14): the distributed
selection in relational_ext._grouped_percentiles_2pass must equal the
plain sorted-list interpolation on single-row groups, two-row groups
(pure interpolation), and tie-heavy groups — the shapes where rank
location and the frac arithmetic can go wrong."""

from __future__ import annotations

import math

from cdc_dedupe_spark.queries.relational_ext import _grouped_percentiles_2pass


def _interp(vals, p):
    vals = sorted(vals)
    pos = p * (len(vals) - 1)
    lo = vals[math.floor(pos)]
    hi = vals[min(math.floor(pos) + 1, len(vals) - 1)]
    return round(lo + (pos - math.floor(pos)) * (hi - lo), 4)


def test_grouped_percentiles_2pass_edges(spark):
    rows = (
        [("A", 500)]  # single-row group: both ranks collapse to rank 1
        + [("B", 100), ("B", 200)]  # two rows: pure interpolation
        + [("C", v) for v in (10, 10, 20, 30, 30, 30, 40, 100)]  # ties
    )
    df = spark.createDataFrame(rows, "l_returnflag string, cents long")
    got = {
        r.l_returnflag: (r.p50_exact, r.p95_exact)
        for r in _grouped_percentiles_2pass(df, (0.50, 0.95)).collect()
    }
    want = {
        g: (_interp([c for k, c in rows if k == g], 0.50),
            _interp([c for k, c in rows if k == g], 0.95))
        for g in ("A", "B", "C")
    }
    assert got == want


def test_grouped_percentiles_2pass_negative_values(spark):
    """ADVICE r14 #5: the bucket key must be FLOOR division — truncation
    toward zero folds small negatives into bucket 0 and orders negative
    buckets wrongly, returning wrong percentiles for any frame with
    negative values. Spans several bucket widths on both sides of zero
    plus the truncation-sensitive band just below zero."""
    vals = [-200_000, -65_537, -65_536, -1, 0, 1, 65_535, 65_536, 200_000, -3, 7]
    rows = [("N", v) for v in vals] + [("M", v) for v in (-5, -4, -3)]
    df = spark.createDataFrame(rows, "l_returnflag string, cents long")
    got = {
        r.l_returnflag: (r.p50_exact, r.p95_exact)
        for r in _grouped_percentiles_2pass(df, (0.50, 0.95)).collect()
    }
    want = {
        g: (_interp([c for k, c in rows if k == g], 0.50),
            _interp([c for k, c in rows if k == g], 0.95))
        for g in ("N", "M")
    }
    assert got == want
