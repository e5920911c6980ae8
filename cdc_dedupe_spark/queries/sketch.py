"""Sketch operators with EXACT cross-engine oracles — Count-Min and
HyperLogLog built from the repo's portable integer hash, so every
register and every estimate is bit-reproducible in DuckDB (the
engine-native sketch queries `agg_approx_distinct` /
`agg_approx_percentile` borrow this machinery for their audit columns
since r13). These are the streaming-friendly summaries a 100 TB pipeline
keeps instead of exact tables: a CMS is a few KB per key-domain, an HLL
is 256 bytes, and both build with ONE partial-aggregate shuffle.

Reference parity note: the reference engine has no sketch surface; these
extend the LLM-pipeline family (SURVEY.md §2B "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKEN_HASH_WIDE, char_shingles, token_hash_wide
from ..tables import spread_scan, table
from ._determinism import round_pos
from .registry import register

# --- Count-Min sketch ------------------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 1024  # buckets per row
_CMS_P = 2147483647  # 2^31 - 1 (prime); keeps every product < 2^63
_CMS_A = [1103515245, 69069, 1664525, 22695477]  # classic LCG multipliers
_CMS_B = [12345, 362437, 1013904223, 1]


def _cms_bucket(hp, j: int):
    return ((hp * _CMS_A[j] + _CMS_B[j]) % _CMS_P) % _CMS_W


def _sql_cms_bucket(hp: str, j: str) -> str:
    a = " ".join(f"WHEN {j} = {i} THEN {v}" for i, v in enumerate(_CMS_A))
    b = " ".join(f"WHEN {j} = {i} THEN {v}" for i, v in enumerate(_CMS_B))
    return f"((({hp}) * (CASE {a} END) + (CASE {b} END)) % {_CMS_P}) % {_CMS_W}"


_CMS_SQL_HP = f"(({SQL_TOKEN_HASH_WIDE.format(t='token')}) % {_CMS_P})"

_CMS_ORACLE = f"""
    WITH toks AS (
      SELECT unnest(list_distinct(list_transform(
               generate_series(1, greatest(length(substr(text, 1, 200)) - 4, 1)),
               i -> substr(substr(text, 1, 200), i, 5)))) AS token
      FROM documents
    ), h AS (
      SELECT token, {_CMS_SQL_HP} AS hp FROM toks
    ), cms AS (
      SELECT jj.j, {_sql_cms_bucket('hp', 'jj.j')} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM h, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS j) jj
      GROUP BY 1, 2
    ), top AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n_true
      FROM toks GROUP BY 1 ORDER BY n_true DESC, token LIMIT 20
    ), probe AS (
      SELECT t.token, t.n_true, jj.j,
             {_sql_cms_bucket(f"({SQL_TOKEN_HASH_WIDE.format(t='t.token')}) % {_CMS_P}", 'jj.j')}
               AS bucket
      FROM top t, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS j) jj
    )
    SELECT p.token, p.n_true, MIN(c.cnt) AS cms_est,
           CAST(MIN(c.cnt) - p.n_true AS BIGINT) AS overcount
    FROM probe p JOIN cms c ON c.j = p.j AND c.bucket = p.bucket
    GROUP BY p.token, p.n_true
    """


@register("agg_cms_heavy_hitters", group="sketch", oracle=_CMS_ORACLE)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters: build a {d}x{w} CMS over the corpus
    token stream (depth-{d} pairwise hashes over the portable 61-bit token
    hash, all-integer), then report the CMS estimate next to the exact
    count for the true top-20 tokens — overcount >= 0 always, bounded in
    expectation by (stream length)/w per row. The fixed hash family makes
    the whole sketch bit-reproducible, so the oracle checks every
    estimate exactly — not just 'close'.

    Shape at scale: the sketch IS a partial aggregate — each task folds
    its tokens into d x w counters map-side and the shuffle moves at most
    d*w = {dw} rows regardless of corpus size; probes join against the
    broadcast-sized sketch. This is the bounded-memory path where exact
    token counting (text_tokens_topk) shuffles |vocab| rows."""
    # Spread docs before the ~200x shingle explode (r13): the one-file
    # corpus scans as a single partition and the whole explode+hash+4x
    # depth-explode chain inherited it (parallelism-inheritance; measured
    # 2.5 s -> 0.7 s for the build at sf0.1). One O(|docs|) exchange,
    # REUSED by both the sketch build and the top-20/probe pass.
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id")
    toks = d.select(F.explode(char_shingles(F.col("text"), n=5, prefix_len=200)).alias("token"))
    # hp lands in its OWN projected column before the 4-row explode —
    # referencing the hash expression inside each struct would re-inline
    # (and re-evaluate) it once per depth row (the HOF/when re-inlining
    # pitfall; measured ~2s of the build at sf0.1).
    hashed = toks.select((token_hash_wide(F.col("token")) % _CMS_P).alias("hp"))
    cms = (
        hashed.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"), _cms_bucket(F.col("hp"), j).alias("bucket")
                        )
                        for j in range(_CMS_D)
                    ]
                )
            ).alias("jb")
        )
        .groupBy(F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # No localCheckpoint here: measured SLOWER at sf0.1 and sf1 —
    # Spark's exchange reuse already shares the token-count scan between
    # the top-20 cut and the probe, and checkpointing the 20-row frame
    # forced an extra materialization pass instead of saving one.
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .orderBy(F.col("n_true").desc(), "token")
        .limit(20)
    )
    probe = top.select(
        "token",
        "n_true",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(token_hash_wide(F.col("token")) % _CMS_P, j).alias(
                            "bucket"
                        ),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("jb"),
    ).select("token", "n_true", F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket"))
    return (
        probe.join(F.broadcast(cms), ["j", "bucket"])
        .groupBy("token", "n_true")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "token",
            "n_true",
            "cms_est",
            (F.col("cms_est") - F.col("n_true")).alias("overcount"),
        )
    )


agg_cms_heavy_hitters.__doc__ = agg_cms_heavy_hitters.__doc__.format(
    d=_CMS_D, w=_CMS_W, dw=_CMS_D * _CMS_W
)


# --- HyperLogLog -----------------------------------------------------------

_HLL_M = 256  # 2^8 registers
_HLL_VBITS = 52  # 60-bit md5 prefix minus 8 register bits
# alpha_256 * m^2 * 2^52, precomputed once so BOTH engines parse the same
# decimal literal (the estimate is one double division from exact ints).
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_NUM = repr(_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_VBITS))

# HLL needs a hash whose BIT PATTERN is uniform (rho = leading zeros must
# be geometric) — token_hash_wide is linear with no avalanche and
# overestimated this corpus 6.9x; xor-shift finalizers over it still
# carried a 12-20% bias on structured domains (measured). md5 is
# available and IDENTICAL in both engines, so the HLL hash is the first
# 15 hex chars (60 bits) of md5, exactly as the exact-dedup family keys
# on md5 digests. Validated: -3% at 30k true / +0.9% at 152k true
# (within the 1.04/sqrt(256) = 6.5% theoretical sd).

_HLL_ORACLE = f"""
    WITH toks AS (
      SELECT unnest(list_distinct(list_transform(
               generate_series(1, greatest(length(substr(text, 1, 200)) - 4, 1)),
               i -> substr(substr(text, 1, 200), i, 5)))) AS token
      FROM documents
    ), h AS (
      SELECT CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS hv FROM toks
    ), rho AS (
      SELECT hv % {_HLL_M} AS reg,
             -- rho clamped at {_HLL_VBITS} (see the Spark twin): the scaled-
             -- integer sum cannot represent rho = {_HLL_VBITS + 1}'s 2^-53 term.
             CASE WHEN (hv >> 8) = 0 THEN {_HLL_VBITS}
                  ELSE {_HLL_VBITS + 1} - length(bin(hv >> 8)) END AS r
      FROM h
    ), regs AS (
      SELECT g.reg, COALESCE(MAX(rho.r), 0) AS m
      FROM (SELECT unnest(generate_series(0, {_HLL_M - 1})) AS reg) g
      LEFT JOIN rho ON rho.reg = g.reg GROUP BY g.reg
    ), s AS (
      SELECT CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_VBITS} - m)) AS BIGINT) AS s_scaled,
             CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
      FROM regs
    )
    SELECT CAST({_HLL_M} AS BIGINT) AS m,
           s.n_zero AS n_zero_registers,
           s.s_scaled,
           (round({_HLL_NUM} / s.s_scaled, 1) + 0.0) AS hll_raw_estimate,
           (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) FROM toks) AS true_distinct
    FROM s
    """


def _hll_rho(v):
    """rho(v) = leading-zero count + 1 over the 52 value bits, CLAMPED at
    _HLL_VBITS: the true rho for v == 0 is 53, but the 2^52-scaled integer
    sum cannot represent 2^-53 — and Spark's shiftleft masks a -1 shift
    count mod 64 into 1<<63, silently corrupting the sum, while DuckDB
    treats out-of-range shifts differently, so cross-engine parity would
    break (ADVICE r9). The ~2^-52 per-token event costs at most one rho
    step of estimate error."""
    return F.when(v == 0, F.lit(_HLL_VBITS)).otherwise(
        F.lit(_HLL_VBITS + 1) - F.length(F.bin(v))
    )


@register("agg_hll_registers", group="sketch", oracle=_HLL_ORACLE)
def agg_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count, hand-built and bit-reproducible: the
    60-bit md5-prefix hash (identical in both engines; the linear
    token_hash_wide has no avalanche and skewed rho — see the module
    constant note) splits into 8 register bits + 52 value bits; each
    register keeps max(rho) where rho = leading-zero count + 1, clamped
    at 52 so the scaled-integer sum below stays representable (via
    binary-string length — no float log2); the raw HLL estimate is
    alpha*m^2 / SUM(2^-M_j), computed as one double division of exact
    integers (2^-M terms pre-scaled by 2^52 so the SUM is an exact
    BIGINT, never an order-dependent float fold). Raw estimate only — the
    small-range linear-counting correction needs ln(), which is not
    cross-engine-exact; the registers and zero-count it would use are in
    the output for the reader.

    Shape at scale: registers ARE a partial aggregate — every task folds
    its tokens into <= 256 (register, max-rho) pairs map-side, the
    shuffle moves <= 256 rows per task, and the final fold is max-merge:
    the associative/commutative HLL merge that also unions sketches
    across days or sources. The true count (for the accuracy column)
    pays the exact two-shuffle count-distinct; at 100 TB you keep ONLY
    the sketch."""
    # Spread docs before the shingle explode (r13, the agg_cms_heavy_hitters
    # fix): the md5+conv chain per shingle is the expensive kernel here and
    # it ran SERIAL on the one-file scan's single partition (measured
    # 2.2 s -> 0.12 s for the register+distinct builds at sf0.1 — md5 is
    # ~20x costlier per token than the CMS's LCG hash, so this sighting of
    # the parallelism-inheritance disease was the worst per-row).
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id")
    toks = d.select(F.explode(char_shingles(F.col("text"), n=5, prefix_len=200)).alias("token"))
    # hv/v materialize in their own projections: reg and both branches of
    # the rho CASE reference them, and inline Column exprs re-evaluate
    # the md5+conv chain at every reference (the re-inlining pitfall).
    hashed = toks.select(
        F.conv(F.substring(F.md5(F.col("token").cast("binary")), 1, 15), 16, 10)
        .cast("long")
        .alias("hv")
    ).select("hv", F.shiftright(F.col("hv"), 8).alias("v"))
    rho = hashed.select(
        (F.col("hv") % _HLL_M).alias("reg"),
        _hll_rho(F.col("v")).alias("r"),
    )
    regs = (
        spark.range(_HLL_M)
        .select(F.col("id").alias("reg"))
        .join(rho.groupBy("reg").agg(F.max("r").alias("mx")), "reg", "left")
        .select("reg", F.coalesce("mx", F.lit(0)).alias("m"))
    )
    s = regs.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_VBITS} - m AS INT))")).alias(
            "s_scaled"
        ),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).cast("long").alias("n_zero_registers"),
    )
    distinct = toks.agg(F.count_distinct("token").alias("true_distinct"))
    return (
        s.crossJoin(F.broadcast(distinct))
        .select(
            F.lit(_HLL_M).cast("long").alias("m"),
            "n_zero_registers",
            "s_scaled",
            round_pos(F.lit(float(_HLL_NUM)) / F.col("s_scaled"), 1).alias("hll_raw_estimate"),
            "true_distinct",
        )
    )


# --- HLL set-intersection (inclusion-exclusion over mergeable sketches) ----

# Audience-overlap question a 100 TB event log answers with three tiny
# sketches instead of two count-distincts and a join: on how many
# user-days did BOTH a click and a purchase happen?  Key = user_id|date,
# so the cardinalities are user-activity-days, not users.
_HLLI_KEY_SQL = "CAST(user_id AS VARCHAR) || '|' || strftime(ts, '%Y-%m-%d')"

_HLLI_ORACLE = f"""
    WITH h AS (
      SELECT event_type AS grp,
             CAST(('0x' || substr(md5({_HLLI_KEY_SQL}), 1, 15)) AS BIGINT) AS hv
      FROM events WHERE event_type IN ('click', 'purchase')
    ), rho AS (
      SELECT grp, hv % {_HLL_M} AS reg,
             -- rho clamped at {_HLL_VBITS}, same rationale as agg_hll_registers
             CASE WHEN (hv >> 8) = 0 THEN {_HLL_VBITS}
                  ELSE {_HLL_VBITS + 1} - length(bin(hv >> 8)) END AS r
      FROM h
    ), regs AS (
      SELECT grp, reg, MAX(r) AS m FROM rho GROUP BY 1, 2
    ), sk AS (
      -- absent registers contribute 2^52 each: SUM over present rows plus
      -- (m - n_present) * 2^52 == the 256-register sum, no range join.
      SELECT grp,
             CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_VBITS} - m))
                  + ({_HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << {_HLL_VBITS})
                  AS BIGINT) AS s_scaled
      FROM regs GROUP BY 1
    ), un AS (
      SELECT CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_VBITS} - m))
                  + ({_HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << {_HLL_VBITS})
                  AS BIGINT) AS s_scaled
      FROM (SELECT reg, MAX(m) AS m FROM regs GROUP BY 1)
    ), tru AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS true_intersect FROM (
        SELECT {_HLLI_KEY_SQL} AS k FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT {_HLLI_KEY_SQL} AS k FROM events WHERE event_type = 'purchase'
      )
    )
    SELECT a.s_scaled AS s_scaled_a, b.s_scaled AS s_scaled_b,
           un.s_scaled AS s_scaled_union,
           (round({_HLL_NUM} / a.s_scaled, 1) + 0.0) AS est_a,
           (round({_HLL_NUM} / b.s_scaled, 1) + 0.0) AS est_b,
           (round({_HLL_NUM} / a.s_scaled + {_HLL_NUM} / b.s_scaled
                  - {_HLL_NUM} / un.s_scaled, 1) + 0.0) AS hll_intersect_estimate,
           tru.true_intersect
    FROM (SELECT s_scaled FROM sk WHERE grp = 'click') a,
         (SELECT s_scaled FROM sk WHERE grp = 'purchase') b, un, tru
    """


def _hll_sketch_sum(regs: DataFrame) -> DataFrame:
    """One-row scaled register sum over a (reg, m) frame: SUM 2^(52-m) over
    present registers plus 2^52 per absent one — identical to folding all
    256, without a range join."""
    return regs.agg(
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_VBITS} - m AS INT))"))
            + (F.lit(_HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << _HLL_VBITS).cast("long")
        )
        .cast("long")
        .alias("s_scaled")
    )


@register("agg_hll_intersect", group="sketch", oracle=_HLLI_ORACLE)
def agg_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-intersection cardinality from three HLL sketches (round 10):
    |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B), where the union sketch is the
    register-wise MAX of the two — the merge that makes HLL the right
    structure for cross-slice overlap questions at 100 TB (sketch each
    slice once, combine any pair later; the exact answer would cost two
    count-distincts plus an equi-join of the distinct sets). Key =
    user_id|date ("user-activity-day"), hashed with the same 60-bit md5
    prefix as agg_hll_registers; registers for A, B and A∪B are one
    partial aggregate each over the SAME (grp, reg, max-rho) frame, so
    the shuffle moves ≤ 2·256 rows per task regardless of event count.
    Estimates are one double division per sketch from exact scaled-integer
    sums (see agg_hll_registers for the 2^52 scaling and the rho clamp);
    the true intersection (accuracy column) pays the exact distinct-set
    semi-join you would NOT run at 100 TB. Raw estimates only — the
    small-range correction needs ln(), which is not cross-engine-exact.

    Reference parity: the reference has no sketch surface (WatchStream.java
    processes CDC entries); declared beyond-reference in SURVEY §2B."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "purchase"))
    key = F.concat(
        F.col("user_id").cast("string"), F.lit("|"), F.date_format("ts", "yyyy-MM-dd")
    )
    hashed = ev.select(
        F.col("event_type").alias("grp"),
        F.conv(F.substring(F.md5(key.cast("binary")), 1, 15), 16, 10).cast("long").alias("hv"),
    ).select("grp", "hv", F.shiftright(F.col("hv"), 8).alias("v"))
    regs = (
        hashed.select(
            "grp", (F.col("hv") % _HLL_M).alias("reg"), _hll_rho(F.col("v")).alias("r")
        )
        .groupBy("grp", "reg")
        .agg(F.max("r").alias("m"))
        .localCheckpoint(eager=False)  # shared by both per-set sums and the union merge
    )
    sk_a = _hll_sketch_sum(regs.filter(F.col("grp") == "click"))
    sk_b = _hll_sketch_sum(regs.filter(F.col("grp") == "purchase"))
    sk_u = _hll_sketch_sum(regs.groupBy("reg").agg(F.max("m").alias("m")))
    keys = ev.select(F.col("event_type").alias("grp"), key.alias("k")).distinct()
    tru = (
        keys.filter(F.col("grp") == "click")
        .select("k")
        .join(keys.filter(F.col("grp") == "purchase").select("k"), "k", "semi")
        .agg(F.count(F.lit(1)).cast("long").alias("true_intersect"))
    )
    num = F.lit(float(_HLL_NUM))
    est = lambda c: num / c  # noqa: E731
    return (
        sk_a.select(F.col("s_scaled").alias("s_scaled_a"))
        .crossJoin(F.broadcast(sk_b.select(F.col("s_scaled").alias("s_scaled_b"))))
        .crossJoin(F.broadcast(sk_u.select(F.col("s_scaled").alias("s_scaled_union"))))
        .crossJoin(F.broadcast(tru))
        .select(
            "s_scaled_a",
            "s_scaled_b",
            "s_scaled_union",
            round_pos(est(F.col("s_scaled_a")), 1).alias("est_a"),
            round_pos(est(F.col("s_scaled_b")), 1).alias("est_b"),
            round_pos(
                est(F.col("s_scaled_a")) + est(F.col("s_scaled_b"))
                - est(F.col("s_scaled_union")),
                1,
            ).alias("hll_intersect_estimate"),
            "true_intersect",
        )
    )


# --- KMV (bottom-k) distinct sketch (r15) ----------------------------------

_KMV_K = 64
# (K-1) * 2^60 as one decimal literal BOTH engines parse identically (the
# _HLL_NUM discipline): the estimate is a single double division of it by
# the k-th smallest 60-bit hash.
_KMV_NUM = repr(float((_KMV_K - 1) * (1 << 60)))

_KMV_ORACLE = f"""
    WITH d AS (
      SELECT DISTINCT l_returnflag,
             CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM lineitem
    ), r AS (
      SELECT l_returnflag, hv,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rk
      FROM d
    ), sk AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_sketch,
             MAX(hv) AS kth_hv
      FROM r WHERE rk <= {_KMV_K} GROUP BY l_returnflag
    ), ex AS (
      SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
      FROM lineitem GROUP BY l_returnflag
    ), est AS (
      SELECT sk.l_returnflag, sk.n_sketch, sk.kth_hv, ex.exact_parts,
             CASE WHEN sk.n_sketch < {_KMV_K} THEN CAST(sk.n_sketch AS DOUBLE)
                  ELSE (round({_KMV_NUM} / sk.kth_hv, 1) + 0.0) END AS kmv_estimate
      FROM sk JOIN ex USING (l_returnflag)
    )
    SELECT l_returnflag, n_sketch, kth_hv, kmv_estimate, exact_parts,
           CAST(CASE WHEN abs(kmv_estimate - exact_parts)
                          <= 5.0 * exact_parts / sqrt({_KMV_K} - 2)
                     THEN 1 ELSE 0 END AS BIGINT) AS within_5sd
    FROM est
    """


@register("agg_kmv_distinct", group="sketch", oracle=_KMV_ORACLE)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / bottom-k distinct sketch (r15 — completes the mergeable-
    sketch family next to CMS, HLL, and the bloom prefilter): per
    returnflag, keep the K={k} smallest 60-bit md5 hashes of the
    partkey domain; estimate distinct = (K-1) * 2^60 / kth_smallest —
    one double division of exact integers, bit-identical cross-engine.
    Unlike HLL, a KMV sketch also supports set operations with
    PROVABLE epsilon (intersect = bottom-k of the union's hash sets),
    and the kept hashes double as a uniform sample of the key domain.
    Groups whose domain has fewer than K distinct hashes report the
    exact sketch size (the sketch IS the domain). The within_5sd audit
    column checks the estimate against the exact count at five
    standard deviations (sd ~ n/sqrt(K-2)).

    Shape at scale: the (flag, hv) DISTINCT is one high-cardinality
    partial-agg shuffle; the bottom-K per flag is a rank-K window that
    Spark plans with WindowGroupLimit (plan-pinned) — every map task
    pre-trims to its local K smallest per group BEFORE the shuffle, so
    the window exchange carries at most K rows per group per input
    partition, never the distinct domain. The exact count (audit
    column only) pays the usual two-shuffle count-distinct; at 100 TB
    you keep only the K-row sketch, and sketches from different days
    or sources merge by re-taking the bottom-K of their union."""
    from pyspark.sql import Window

    li = spread_scan(table(spark, sf_dir, "lineitem"), "l_orderkey").select(
        "l_returnflag", "l_partkey"
    )
    dh = li.select(
        "l_returnflag",
        F.conv(
            F.substring(F.md5(F.col("l_partkey").cast("string").cast("binary")), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("hv"),
    ).distinct()
    w = Window.partitionBy("l_returnflag").orderBy("hv")
    sk = (
        dh.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KMV_K)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_sketch"), F.max("hv").alias("kth_hv"))
    )
    ex = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    est = sk.join(ex, "l_returnflag").withColumn(
        "kmv_estimate",
        F.when(F.col("n_sketch") < _KMV_K, F.col("n_sketch").cast("double")).otherwise(
            round_pos(F.lit(float(_KMV_NUM)) / F.col("kth_hv"), 1)
        ),
    )
    return est.select(
        "l_returnflag",
        "n_sketch",
        "kth_hv",
        "kmv_estimate",
        "exact_parts",
        (
            F.abs(F.col("kmv_estimate") - F.col("exact_parts"))
            <= F.lit(5.0) * F.col("exact_parts") / F.lit(float((_KMV_K - 2) ** 0.5))
        )
        .cast("long")
        .alias("within_5sd"),
    )


agg_kmv_distinct.__doc__ = agg_kmv_distinct.__doc__.format(k=_KMV_K)


# ---------------------------------------------------------------------------
# sketch_kmv_setops — set algebra on KMV sketches (round 16)

_KSO_K = 64
_KSO_NUM = repr(float((_KSO_K - 1) * (1 << 60)))

_KSO_HASH_DUCK = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
)

_KSO_ORACLE = f"""
    WITH a AS (
      SELECT DISTINCT {_KSO_HASH_DUCK} AS hv FROM events WHERE event_type = 'click'
    ), b AS (
      SELECT DISTINCT {_KSO_HASH_DUCK} AS hv FROM events WHERE event_type = 'purchase'
    ), ska AS (SELECT hv FROM a ORDER BY hv LIMIT {_KSO_K}),
    skb AS (SELECT hv FROM b ORDER BY hv LIMIT {_KSO_K}),
    sku AS (
      SELECT hv FROM (SELECT hv FROM ska UNION SELECT hv FROM skb)
      ORDER BY hv LIMIT {_KSO_K}
    ), th AS (SELECT MAX(hv) AS theta, CAST(COUNT(*) AS BIGINT) AS ku FROM sku),
    inter AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_inter_sketch
      FROM sku WHERE hv IN (SELECT hv FROM ska) AND hv IN (SELECT hv FROM skb)
    ), ex AS (
      SELECT CAST((SELECT COUNT(*) FROM (SELECT hv FROM a UNION SELECT hv FROM b))
                  AS BIGINT) AS exact_union,
             CAST((SELECT COUNT(*) FROM a WHERE hv IN (SELECT hv FROM b))
                  AS BIGINT) AS exact_inter
    )
    SELECT th.ku AS n_union_sketch, th.theta AS union_kth_hv,
           inter.n_inter_sketch,
           (round({_KSO_NUM} / th.theta, 1) + 0.0) AS union_est,
           (round(inter.n_inter_sketch * ({_KSO_NUM} / th.theta) / th.ku, 1) + 0.0)
             AS inter_est,
           ex.exact_union, ex.exact_inter,
           CAST(CASE WHEN abs({_KSO_NUM} / th.theta - ex.exact_union)
                          <= 5.0 * ex.exact_union / sqrt({_KSO_K} - 2)
                     THEN 1 ELSE 0 END AS BIGINT) AS union_within_5sd
    FROM th, inter, ex
    """


@register("sketch_kmv_setops", group="sketch", oracle=_KSO_ORACLE)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET ALGEBRA on KMV sketches — the operation [[agg_kmv_distinct]]'s
    docstring promises ("intersect = bottom-k of the union's hash sets")
    now exercised end-to-end: sketch the click-user and purchase-user
    domains independently (bottom-K={k} of the fixed 60-bit md5 family,
    bit-reproducible), then compute |A∪B| and |A∩B| estimates FROM THE
    SKETCHES ALONE — union sketch = bottom-K of the two sketches' union
    (the fleet-merge operation itself), θ = its K-th hash, union_est =
    (K−1)·2^60/θ, and the Theta-sketch intersection ρ·union_est where ρ
    counts union-sketch hashes present in BOTH input sketches (sound
    because θ ≤ min(θ_A, θ_B): any union-sketch member belonging to A is
    below A's own K-th hash, hence inside A's sketch — no false
    negatives from truncation). Exact counts ride along as audit
    columns with a 5-sd acceptance flag.

    Shape at scale: each input sketch is a distinct + TakeOrdered(K) —
    fully parallel pre-trim, K rows cross the wire per set; every
    set-op then rides O(K) rows on the driver-free broadcast plan. This
    is how a 1000-source fleet answers "distinct users who did BOTH"
    without ever co-shuffling raw ids."""
    ev = spread_scan(table(spark, sf_dir, "events"), "event_id")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")

    # r20 plan collapse (guide §2.4): the original shape derived SIX
    # distinct subtrees from the events scan (ska/skb/sku sketches,
    # fa/fb exact domains, their union) — 56 Exchanges, the widest plan
    # in the suite, each branch re-scanning + re-hashing + re-distincting
    # the raw events. Every one of those sets is a function of ONE
    # membership table: the distinct hash domain with per-set flags.
    # Build (hv, in_a, in_b) with a single aggregation shuffle, checkpoint
    # it lazily (within-query, the minhash-band discipline), and derive
    # all six from the materialized 3-column frame. Values are untouched:
    # distinct-per-side == flag filter over the distinct union domain.
    base = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .select(
            hv.alias("hv"),
            (F.col("event_type") == "click").alias("ia"),
            (F.col("event_type") == "purchase").alias("ib"),
        )
        .groupBy("hv")
        .agg(F.max("ia").alias("in_a"), F.max("ib").alias("in_b"))
        .localCheckpoint(eager=False)
    )

    def sketch(flag: str) -> DataFrame:
        return base.filter(F.col(flag)).select("hv").orderBy("hv").limit(_KSO_K)

    ska, skb = sketch("in_a"), sketch("in_b")
    sku = ska.unionAll(skb).distinct().orderBy("hv").limit(_KSO_K)
    th = sku.agg(
        F.max("hv").alias("theta"), F.count(F.lit(1)).cast("long").alias("ku")
    )
    inter = (
        sku.join(ska.select(F.col("hv").alias("ha")), F.col("hv") == F.col("ha"), "left_semi")
        .join(skb.select(F.col("hv").alias("hb")), F.col("hv") == F.col("hb"), "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter_sketch"))
    )
    ex = (
        base.agg(F.count(F.lit(1)).cast("long").alias("exact_union"))
        .crossJoin(
            base.filter(F.col("in_a") & F.col("in_b"))
            .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
        )
    )
    est = F.lit(float(_KSO_NUM)) / F.col("theta")
    return (
        th.crossJoin(inter)
        .crossJoin(ex)
        .select(
            F.col("ku").alias("n_union_sketch"),
            F.col("theta").alias("union_kth_hv"),
            "n_inter_sketch",
            round_pos(est, 1).alias("union_est"),
            round_pos(F.col("n_inter_sketch") * est / F.col("ku"), 1).alias(
                "inter_est"
            ),
            "exact_union",
            "exact_inter",
            (
                F.abs(est - F.col("exact_union"))
                <= F.lit(5.0) * F.col("exact_union") / F.lit(float((_KSO_K - 2) ** 0.5))
            )
            .cast("long")
            .alias("union_within_5sd"),
        )
    )
