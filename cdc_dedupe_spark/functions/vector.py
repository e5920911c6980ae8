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
    # + 0.0 normalizes a rounded -0.0 to +0.0 (bit-hash parity with DuckDB)
    return F.round(c, round_digits) + F.lit(0.0) if round_digits is not None else c


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
    # + 0.0: a tiny negative cosine rounds to -0.0 in DuckDB but +0.0 in
    # Spark (the r3 driver hash-fail on dedup_embed_cosine/lsh); IEEE
    # -0.0 + 0.0 = +0.0 in both engines, and every other value is untouched.
    return F.round(c, round_digits) + F.lit(0.0)


# --- random-hyperplane LSH (SimHash for embeddings) -----------------------
#
# The scale path for embedding near-dup / ANN candidate generation: each
# vector maps to a small integer bucket = the sign pattern of its dot
# products with P pseudo-random hyperplanes; cosine-similar vectors land in
# the same bucket with high probability, so candidate pairs come from a
# bucket equi-join instead of all pairs. The hyperplanes are ±1 vectors
# derived from a fixed integer mix (plane, dim) -> sign — fully
# deterministic and expressible in both engines, so unlike spark.ml's
# MinHashLSH the whole pipeline gets an EXACT cross-engine oracle.

_PLANE_MIX_P = 2654435761  # Knuth multiplicative constants
_PLANE_MIX_D = 40503


def _plane_sign(p: int, i: Column) -> Column:
    """±1 component i of pseudo-random hyperplane p (bit 16 of an integer
    mix — decorrelated from the low-bit linearity of p, i)."""
    h = F.lit(p * _PLANE_MIX_P) + i.cast("long") * F.lit(_PLANE_MIX_D)
    bit = F.shiftright(h, 16).bitwiseAND(F.lit(1))
    return (F.lit(1) - bit * 2).cast("long")


def lsh_bucket(se: Column, planes: int = 6) -> Column:
    """Bucket id in [0, 2^planes) for a pre-scaled (iscale) vector: bit p
    is [dot(hyperplane_p, se) >= 0]. Map-side only — one pass per plane
    over the array, no shuffle, exact integer arithmetic throughout."""
    idx = F.sequence(F.lit(0), F.size(se) - F.lit(1))

    def mk(p: int):
        # closure (not a default arg): zip_with inspects the lambda arity
        return lambda x, i: x * _plane_sign(p, i)

    bucket = F.lit(0).cast("long")
    for p in range(planes):
        dot_p = F.aggregate(
            F.zip_with(se, idx, mk(p)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket * 2 + F.when(dot_p >= 0, 1).otherwise(0)
    return bucket


def sql_lsh_bucket(se: str, planes: int = 6) -> str:
    """DuckDB twin of lsh_bucket over a pre-scaled list expression."""
    terms = []
    for p in range(planes):
        sign = f"(1 - 2 * ((({p * _PLANE_MIX_P} + (i - 1) * {_PLANE_MIX_D}) >> 16) & 1))"
        dot = (
            f"list_sum(list_transform(generate_series(1, len({se})), i -> {se}[i] * {sign}))"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END) * {1 << (planes - 1 - p)}")
    return "(" + " + ".join(terms) + ")"


# DuckDB oracle twins of iscale/idot (format with the array expression).
SQL_ISCALE = "list_transform({a}, x -> CAST(round(x::DOUBLE * 10000000) AS BIGINT))"
SQL_IDOT = (
    "CAST(list_sum(list_transform(generate_series(1, len({sa})), i -> {sa}[i] * {sb}[i])) AS DOUBLE)"
)
SQL_INORM2 = "CAST(list_sum(list_transform({sa}, x -> x * x)) AS DOUBLE)"
SQL_ICOSINE = f"(round({SQL_IDOT} / (sqrt({SQL_INORM2.format(sa='{sa}')}) * sqrt({SQL_INORM2.format(sa='{sb}')})), 4) + 0.0)"
