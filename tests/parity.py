"""Shared Spark-vs-DuckDB comparison mirroring the driver's check:
row count + schema (column sets) + order-insensitive value equality."""

from __future__ import annotations

import math
import struct

import pandas as pd


def float_bits_equal(a: float, b: float) -> bool:
    """Bit-pattern float equality, the same sensitivity as the driver's
    value hash: -0.0 != +0.0 (they hash differently) while NaN == NaN.
    Plain `==` was blind to the one remaining r3 defect class (signed
    zero out of round()) — see VERDICT r3 'What's wrong' #2."""
    if math.isnan(a) and math.isnan(b):
        return True
    return struct.pack("<d", float(a)) == struct.pack("<d", float(b))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # Decimal objects / nullable ints -> plain floats/objects for equality
        if df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and all(hasattr(v, "as_tuple") for v in sample.head(5)):
                df[c] = df[c].astype(float)
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, kind="mergesort", na_position="last").reset_index(drop=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s = normalize(spark_pdf)
    d = normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            sv = sv.astype(float)
            dv = dv.astype(float)
            bad = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(sv, dv))
                if not float_bits_equal(a, b)
            ]
        else:
            sv = sv.astype(object).where(pd.notna(sv), None)
            dv = dv.astype(object).where(pd.notna(dv), None)
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if a != b]
        assert not bad, f"{name}: column {c!r} first diffs (row, spark, duck): {bad[:5]}"
