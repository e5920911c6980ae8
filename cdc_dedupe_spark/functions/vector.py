"""Vector math over ``array<float|double>`` columns via JVM higher-order
functions — no UDF, no Python worker, map-side only (SCALING.md LLM family:
these scale linearly with input splits and never shuffle by themselves)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i via zip_with + aggregate. Float -> double promotion is
    exact and the fold order is the array order in every engine, so the
    result is deterministic across partitionings."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm sqrt(Σ a_i^2)."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, round_digits: int | None = None) -> Column:
    """Cosine similarity dot(a,b) / (|a| |b|); ``round_digits`` absorbs
    sub-ulp accumulation differences for cross-engine comparison."""
    c = dot(a, b) / (l2_norm(a) * l2_norm(b))
    return F.round(c, round_digits) if round_digits is not None else c
