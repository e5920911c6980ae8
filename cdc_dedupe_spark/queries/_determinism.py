"""Cross-engine determinism helpers (SURVEY.md §2B rules).

Sums/averages over DOUBLE columns are order-dependent in IEEE float math,
and Spark's partial aggregation order differs from DuckDB's. We therefore
aggregate through exact arithmetic — cast each value to DECIMAL(18,4)
(exact for the 2-decimal money columns), sum exactly, and cast the final
result to DOUBLE. The final double is then bit-identical in both engines.

Averages are expressed as exact-sum / count so both engines perform the
same single IEEE division.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, alias: str) -> Column:
    """Exact sum of a money-ish double, final cast to double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,4)")).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact-sum / count average; both engines do one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast("decimal(18,4)")).cast("double") / F.count(F.lit(1))
    ).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS {alias}"


# --- signed zero ----------------------------------------------------------
#
# The driver's value hash is bit-sensitive: round(-1e-9, 4) is -0.0 in
# DuckDB but +0.0 in Spark, equal under == yet different bit patterns (the
# r3 dedup_embed_cosine/lsh hash-fails). IEEE -0.0 + 0.0 = +0.0 under
# round-to-nearest in both engines, and x + 0.0 is bit-identical to x for
# every other value, so every rounded-double OUTPUT column goes through
# these twins.


def round_pos(col: Column, digits: int = 4) -> Column:
    """``round(col, digits)`` with signed zero normalized to +0.0."""
    return F.round(col, digits) + F.lit(0.0)


def sql_round_pos(expr: str, digits: int = 4) -> str:
    """DuckDB twin of :func:`round_pos` (same +0.0 normalization)."""
    return f"(round({expr}, {digits}) + 0.0)"
