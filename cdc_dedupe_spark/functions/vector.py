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


# --- integer-scaled exact kernel ------------------------------------------
#
# Double folds accumulate 1-ulp differences between engines, and ROUND(x, 4)
# flips at x.xxxx5 boundaries — with thousands of output rows some always
# land on one (the r2 dedup_embed_cosine hash-fail). Scaling each float32
# component to an integer (×1e7, round-half-away-from-zero — identical in
# Spark and DuckDB) makes every dot/norm/L2 an exact 64-bit integer: for
# unit-ish embeddings of dim ≤ a few hundred the sums stay below 2^53, so
# even the final long→double conversion is exact and the cosine is
# bit-identical across engines. The ×1e7 scale cancels in the ratio.

ISCALE = 10_000_000


def iscale(a: Column) -> Column:
    """array<float> -> array<long>, each component round(x * 1e7)."""
    return F.transform(a, lambda x: F.round(x.cast("double") * ISCALE).cast("long"))


def _isum(pairs: Column) -> Column:
    return F.aggregate(pairs, F.lit(0).cast("long"), lambda acc, x: acc + x)


def idot(sa: Column, sb: Column) -> Column:
    """Exact integer Σ sa_i * sb_i over pre-scaled arrays."""
    return _isum(F.zip_with(sa, sb, lambda x, y: x * y))


def il2(sa: Column, sb: Column) -> Column:
    """Exact integer squared L2 distance Σ (sa_i - sb_i)² over pre-scaled
    arrays."""
    return _isum(F.zip_with(sa, sb, lambda x, y: (x - y) * (x - y)))


def icosine(a: Column, b: Column, round_digits: int = 4) -> Column:
    """Bit-exact cross-engine cosine: integer-scaled dot and norms, one
    double division at the end (IEEE ops on identical inputs are
    deterministic in every engine)."""
    sa, sb = iscale(a), iscale(b)
    c = idot(sa, sb).cast("double") / (
        F.sqrt(idot(sa, sa).cast("double")) * F.sqrt(idot(sb, sb).cast("double"))
    )
    return F.round(c, round_digits)


# DuckDB oracle twins of iscale/idot (format with the array expression).
SQL_ISCALE = "list_transform({a}, x -> CAST(round(x::DOUBLE * 10000000) AS BIGINT))"
SQL_IDOT = (
    "CAST(list_sum(list_transform(generate_series(1, len({sa})), i -> {sa}[i] * {sb}[i])) AS DOUBLE)"
)
SQL_INORM2 = "CAST(list_sum(list_transform({sa}, x -> x * x)) AS DOUBLE)"
SQL_ICOSINE = f"round({SQL_IDOT} / (sqrt({SQL_INORM2.format(sa='{sa}')}) * sqrt({SQL_INORM2.format(sa='{sb}')})), 4)"
