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
