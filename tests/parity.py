"""Shared Spark-vs-DuckDB comparison mirroring the driver's check:
row count + schema (column sets) + order-insensitive value equality.

Round 12 hardening (VERDICT r11 "What's wrong" #2): the harness is now
DTYPE-STRICT. The r11 driver failures were three oracles whose output
columns DuckDB widened to HUGEINT (`SUM() OVER`, `list_sum`) — values
byte-equal to Spark's int64, but hashed differently by the driver.
The old harness could never catch that class because (a) duckdb's
`.df()` silently converts HUGEINT to float64/object and (b)
`normalize()` coerced to float before comparing — which additionally
made any integer above 2^53 compare lossily. The strict path:

- fetches the oracle via :func:`duck_strict_df` — `fetchall()`, never
  `.df()` — so integral columns arrive as exact Python ints and the
  declared DuckDB type of every output column is known;
- takes the Spark dtype from the DataFrame SCHEMA (not the pandas
  dtype, which goes float64 when a nullable long column has nulls);
- FAILS when one side is integral and the other floating/decimal,
  even if every value compares numerically equal;
- compares integral columns as exact Python ints (values above 2^53
  carried through a float64 pandas column fail loudly instead of
  comparing through a lossy representation).
"""

from __future__ import annotations

import math
import struct

import pandas as pd

# DuckDB type name (before any '(...)' suffix) -> dtype kind.
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT",
}
_DUCK_FLOAT = {"FLOAT", "DOUBLE", "REAL"}

# These render differently from both Spark int64 and float64 in the
# driver's value hash — an oracle must never emit them for a column the
# Spark side types as plain int/double (tests/test_oracle_types.py pins
# this registry-wide).
HASH_UNSAFE_DUCK_TYPES = {"HUGEINT", "UHUGEINT", "DECIMAL"}

_MAX_EXACT_FLOAT_INT = 2**53  # above this, float64 can't hold every int


def duck_kind(duck_type: str) -> str:
    """Map a DuckDB type name to a kind: 'i' integral, 'f' floating,
    'd' decimal, 'o' other (varchar/bool/json/...)."""
    base = str(duck_type).upper().split("(")[0].strip()
    if base in _DUCK_INT:
        return "i"
    if base in _DUCK_FLOAT:
        return "f"
    if base == "DECIMAL":
        return "d"
    return "o"


def spark_kinds(schema) -> dict[str, str]:
    """Kind map from a Spark DataFrame schema (use the SCHEMA, not the
    toPandas dtype — a nullable long column with nulls lands in pandas
    as float64 and would spuriously read as floating)."""
    out: dict[str, str] = {}
    for f in schema.fields:
        t = f.dataType.typeName()
        if t in ("long", "integer", "short", "byte"):
            out[f.name] = "i"
        elif t in ("double", "float"):
            out[f.name] = "f"
        elif t.startswith("decimal"):
            out[f.name] = "d"
        else:
            out[f.name] = "o"
    return out


def duck_strict_df(con, sql: str):
    """Execute oracle SQL and return ``(pdf, kinds)`` with exact values:
    integral columns are object-dtype Python ints (never float64 — the
    `.df()` path both masked the r11 HUGEINT driver mismatches and is
    lossy above 2^53)."""
    rel = con.sql(sql)
    cols = list(rel.columns)
    kinds = {c: duck_kind(t) for c, t in zip(cols, rel.types)}
    pdf = pd.DataFrame(rel.fetchall(), columns=cols, dtype=object)
    for c in cols:
        if kinds[c] == "f":
            pdf[c] = pdf[c].astype(float)
    return pdf, kinds


def float_bits_equal(a: float, b: float) -> bool:
    """Bit-pattern float equality, the same sensitivity as the driver's
    value hash: -0.0 != +0.0 (they hash differently) while NaN == NaN.
    Plain `==` was blind to the one remaining r3 defect class (signed
    zero out of round()) — see VERDICT r3 'What's wrong' #2."""
    if math.isnan(a) and math.isnan(b):
        return True
    return struct.pack("<d", float(a)) == struct.pack("<d", float(b))


def _exact_int(v, col: str, side: str):
    """Exact Python int from however pandas carried the value; loud
    failure when it arrived through a float64 too big to be exact."""
    if pd.isna(v):
        return None
    if isinstance(v, float):
        if abs(v) >= _MAX_EXACT_FLOAT_INT or v != int(v):
            raise AssertionError(
                f"column {col!r} ({side}): integral value {v!r} carried "
                f"through float64 is not exactly representable — fetch it "
                f"without float coercion"
            )
        return int(v)
    return int(v)


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


def _sort_rows(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # Sort on a float view of numeric-ish columns so both sides order
    # identically regardless of carrier dtype (object-int vs float64);
    # ties resolve through the remaining columns, mergesort is stable.
    keyed = df.copy()
    for c in keyed.columns:
        if keyed[c].dtype == object:
            sample = keyed[c].dropna()
            if len(sample) and all(isinstance(v, (int, float)) for v in sample.head(5)):
                keyed[c] = keyed[c].astype(float)
    order = keyed.sort_values(
        list(keyed.columns), kind="mergesort", na_position="last"
    ).index
    return df.loc[order].reset_index(drop=True)


def assert_frames_match(
    spark_pdf: pd.DataFrame,
    duck_pdf: pd.DataFrame,
    name: str = "",
    spark_kind_map: dict[str, str] | None = None,
    duck_kind_map: dict[str, str] | None = None,
) -> None:
    """Order-insensitive exact comparison. When BOTH kind maps are given
    (the strict path — parity_sweep and test_oracle_parity), dtype-class
    divergence (int vs float/decimal) fails even if values agree, and
    integral columns compare as exact Python ints."""
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    strict = spark_kind_map is not None and duck_kind_map is not None
    if strict:
        for c in sorted(spark_pdf.columns):
            sk = spark_kind_map.get(c, "o")
            dk = duck_kind_map.get(c, "o")
            if sk != dk and ("i" in (sk, dk) or "d" in (sk, dk)) and "o" not in (sk, dk):
                raise AssertionError(
                    f"{name}: column {c!r} dtype-class divergence — spark "
                    f"kind {sk!r} vs oracle kind {dk!r}: the driver's value "
                    f"hash renders these differently even when every value "
                    f"is numerically equal (r11 HUGEINT class). CAST the "
                    f"oracle column to the Spark type."
                )
        s = _sort_rows(spark_pdf)
        d = _sort_rows(duck_pdf)
        for c in s.columns:
            sk = spark_kind_map.get(c, "o")
            sv, dv = s[c], d[c]
            if sk == "i":
                sl = [_exact_int(v, c, "spark") for v in sv]
                dl = [_exact_int(v, c, "duck") for v in dv]
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(sl, dl)) if a != b]
            elif sk == "f":
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
        return
    # Legacy (kind-blind) path for ad-hoc test call sites that compare
    # two already-pandas frames without schema/type provenance.
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
