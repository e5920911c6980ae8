"""MinHash/SimHash/n-gram/exact dedup family (split from llm_ext.py r17)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .._determinism import round_pos
from ...functions.text import (
    SQL_TOKEN_HASH,
    SQL_TOKEN_HASH_WIDE,
    char_shingles,
    marker_count,
    simhash,
    sql_marker_count,
    token_hash,
    token_hash_wide,
)
from ...functions.vector import (
    LSH_MAX_PLANES,
    SQL_ICOSINE,
    SQL_ISCALE,
    icosine,
    idot,
    il2,
    iscale,
    lsh_bucket,
    lsh_shift,
    sql_lsh_bucket,
    sql_lsh_shift,
)
from ...tables import spread_scan, table
from ..registry import register


# ---------------------------------------------------------------------------
# dedup family


@register(
    "dedup_exact_hash",
    group="llm-ext",
    oracle="""
    SELECT md5(text) AS text_hash,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedupe via content-hash groupBy: one row per distinct text,
    keeper = lowest doc_id. At scale: hash computed map-side, shuffle only
    on the 128-bit digest (not the document bytes)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
    )






@register(
    "dedup_simhash",
    group="llm-ext",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '), t -> {SQL_TOKEN_HASH_WIDE.format(t='t')}) AS hs
      FROM documents
    )
    SELECT doc_id,
           list_sum(list_transform(generate_series(0, 15), i ->
             CASE WHEN list_sum(list_transform(hs, h ->
               CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0
             THEN (1::BIGINT << i) ELSE 0 END))::BIGINT AS simhash
    FROM hashed
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document over token hashes: per bit, majority
    vote of token-hash bits. Pure map-side higher-order functions — the
    signature costs one pass over tokens, no shuffle at all on a wide
    scan (spread_scan widens the one-file LOCAL corpus first — the r13
    honest-bench pass exposed this kernel running serial AND unmeasured:
    count()-based timing pruned the simhash column entirely)."""
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id")
    return d.select("doc_id", simhash(F.col("text"), bits=16).alias("simhash"))




@register(
    "dedup_ngram_jaccard",
    group="llm-ext",
    oracle="""
    WITH sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(1, greatest(length(substr(text, 1, 200)) - 4, 1)),
               i -> substr(substr(text, 1, 200), i, 5))) AS shingles
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           (round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))), 4) + 0.0) AS jaccard_r
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 10
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-5-gram Jaccard over a banded (same-lang, id-window ≤10)
    candidate self-join — the exact-arithmetic cousin of MinHash-LSH.
    Intersection/union sizes are integers; only the final ratio is float
    (identical division both engines)."""
    return _ngram_pair_scores(spark, sf_dir)




def _ngram_pair_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded 5-gram Jaccard pair scores (doc_a, doc_b, jaccard_r) — the
    shared candidate machinery behind dedup_ngram_jaccard and
    source_scorecard."""
    band = 10
    # spread_scan: the shingle build + per-pair intersection kernel must
    # not inherit the one-file scan's single partition (r13; no-op on a
    # wide scan).
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id")
    sh = d.select("doc_id", "lang", char_shingles(F.col("text"), n=5, prefix_len=200).alias("shingles"))
    # lang alone is a handful of values — joining on it degenerates to an
    # all-pairs scan within each lang (quadratic + maximal skew at scale).
    # Compose it with an id-band bucket: b in (a, a+10] lives in a's bucket
    # or the next, so the probe side explodes to those two buckets and the
    # join gets a high-cardinality (lang, bucket) equi key.
    bkt = F.floor(F.col("doc_id") / band)
    a = sh.select(
        "doc_id", "lang", "shingles", F.explode(F.array(bkt, bkt + 1)).alias("bkt")
    ).alias("a")
    b = sh.select("doc_id", "lang", "shingles", bkt.alias("bkt")).alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.col("a.shingles")) + F.size(F.col("b.shingles")) - inter
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("b.doc_id") > F.col("a.doc_id"))
            & (F.col("b.doc_id") <= F.col("a.doc_id") + band),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            round_pos(inter.cast("double") / union, 4).alias("jaccard_r"),
        )
    )




@register(
    "dedup_incremental",
    group="llm-ext",
    oracle="""
    WITH existing AS (
      SELECT md5(text) AS h FROM documents WHERE doc_id % 10 < 8
    ), incoming AS (
      SELECT doc_id, lang, md5(text) AS h FROM documents WHERE doc_id % 10 >= 8
    )
    SELECT i.doc_id, i.lang, i.h AS text_hash
    FROM incoming i ANTI JOIN existing e ON i.h = e.h
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedupe: an incoming batch keeps only documents
    whose content digest is NOT already in the existing corpus — the
    left-anti-join-on-hash shape every continuously ingesting pipeline
    runs (here the corpus is split 80/20 by id to stand in for
    snapshot/batch). At scale: both sides reduce to 128-bit digests
    map-side before the anti join shuffles, so the join moves hashes, not
    documents; when the incoming batch is small Catalyst broadcasts it
    and the existing corpus never shuffles at all."""
    d = table(spark, sf_dir, "documents")
    existing = d.filter(F.col("doc_id") % 10 < 8).select(
        F.md5(F.col("text").cast("binary")).alias("h")
    )
    incoming = d.filter(F.col("doc_id") % 10 >= 8).select(
        "doc_id", "lang", F.md5(F.col("text").cast("binary")).alias("h")
    )
    return incoming.join(existing, "h", "left_anti").select(
        "doc_id", "lang", F.col("h").alias("text_hash")
    )




# --- deterministic MinHash LSH (exact-oracle twin of dedup_near_minhash) ----
#
# spark.ml's MinHashLSH seeds its hash family from a JVM RNG, so its entry
# is rows-only by design. This variant builds the SAME sketch from a fixed
# integer hash family ((a*h + b) mod M over the portable token_hash), so
# every stage — shingle set, signature, band keys, candidate pairs,
# similarity estimate — is bit-identical in DuckDB and the whole LSH
# pipeline gets an exact cross-engine oracle.

_MH_M = 1_048_573  # prime ~2^20: products stay < 2^40, exact in int64


_MH_K = 8


_MH_A = tuple(131 + 8_192 * i for i in range(_MH_K))


_MH_B = tuple(97 + 104_729 * i for i in range(_MH_K))


# 2 bands x 4 rows: a candidate pair must agree on 4 consecutive minima.
# 2-row bands admitted ~half of ALL pairs on this templated synthetic
# corpus (shared boilerplate dominates the minima) — an all-pairs blowup
# at scale; 4-row bands keep only genuinely near-duplicate candidates.
_MH_ROWS = 4


_MH_BANDS = _MH_K // _MH_ROWS


# Band key = polynomial fold of the band's rows mod a ~2^31 prime:
# intermediate products stay < 2^48 (exact int64 in both engines).
_MH_FOLD = 99_991


_MH_FOLD_M = 2_147_483_647




def _mh_sig_ctes(src: str = "documents") -> str:
    # wide hash: injective on ASCII 5-grams — the narrow 3-char hash
    # conflated shingles sharing a leading trigram, inflating signature
    # agreement between non-near-duplicate docs (round-8 review).
    # `src` (r14): any prior CTE with (doc_id, text), so compositions like
    # pipeline_dedup_full can run the sketch over a filtered corpus.
    th = SQL_TOKEN_HASH_WIDE.format(t="s")
    mins = ",\n        ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {_MH_M}))"
        for a, b in zip(_MH_A, _MH_B)
    )
    return f"""sh AS (
      SELECT doc_id, list_distinct(list_transform(
               generate_series(1, greatest(length(substr(text, 1, 200)) - 4, 1)),
               i -> substr(substr(text, 1, 200), i, 5))) AS sh
      FROM {src}
    ), hs AS (
      SELECT doc_id, list_transform(sh, s -> ({th}) % {_MH_M}) AS hs FROM sh
    ), sig AS (
      SELECT doc_id, [
        {mins}
      ] AS sig FROM hs
    )"""




def _sql_band_key(j: int) -> str:
    expr = "0"
    for r in range(_MH_ROWS):
        expr = f"(({expr}) * {_MH_FOLD} + sig[{j * _MH_ROWS + r + 1}]) % {_MH_FOLD_M}"
    return expr




def _mh_pair_ctes(src: str = "documents") -> str:
    """sig CTEs + bands/pairs/mh_scored: the full fixed-family MinHash
    pair list as composable CTEs over `src` (doc_id, text)."""
    return f"""{_mh_sig_ctes(src)}, bands AS (
      SELECT doc_id, j,
             CASE {" ".join(f"WHEN j = {j} THEN {_sql_band_key(j)}" for j in range(_MH_BANDS))} END AS key
      FROM sig, (SELECT unnest([{", ".join(str(j) for j in range(_MH_BANDS))}]) AS j) t
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.j = b.j AND a.key = b.key AND b.doc_id > a.doc_id
    ), mh_scored AS (
      SELECT p.doc_a, p.doc_b,
             (round(len(list_filter(generate_series(1, {_MH_K}),
                                    i -> sa.sig[i] = sb.sig[i])) / {_MH_K}.0, 4) + 0.0)
               AS minhash_sim
      FROM pairs p
      JOIN sig sa ON sa.doc_id = p.doc_a
      JOIN sig sb ON sb.doc_id = p.doc_b
    )"""




_MINHASH_ORACLE = f"""
    WITH {_mh_pair_ctes()}
    SELECT doc_a, doc_b, minhash_sim FROM mh_scored
    """




@register("dedup_minhash_exact", group="llm-ext", oracle=_MINHASH_ORACLE)
def dedup_minhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates with a FIXED integer hash family —
    the exact-oracle twin of dedup_near_minhash (which uses spark.ml's
    RNG-seeded MinHashLSH and is therefore rows-only). Signature = 8 mins
    of (a_i*h + b_i) mod M over the portable shingle hash; candidates come
    from a 2-band x 4-row folded-band-key equi self-join; the reported
    similarity is the signature agreement fraction (integer count, one
    IEEE division).

    At 100 TB: signatures are map-side HOF work (zero shuffle), the band
    join shuffles only (doc_id, 2 longs) per band on a content-derived
    high-cardinality key — the same candidate-bounded LSH shape as
    dedup_embed_lsh, never all-pairs.

    Docs are spread BEFORE the signature pipeline (r13, seventh
    parallelism-inheritance sighting): the one-file scan is a single
    partition and the shingle->hash->8-perm-min chain (the dominant cost,
    per the checkpoint note below) ran serial on it — invisible to a
    bare .count() probe, which PRUNES the sig column entirely; only the
    checkpoint materialization shows the true cost (measured 3.2 s ->
    1.1 s at sf0.1 for the band build; the whole minhash family composes
    this function, so the fix propagates to cluster / incremental /
    precision-audit / tuning-curve)."""
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id")
    return minhash_pairs(d)




def _mh_band_key_sql(j: int) -> str:
    """Spark-SQL twin of the band-key fold (1-based element_at, exactly
    the DuckDB _sql_band_key arithmetic)."""
    expr = "CAST(0 AS BIGINT)"
    for r in range(_MH_ROWS):
        expr = (
            f"(({expr}) * {_MH_FOLD}"
            f" + element_at(sig, {j * _MH_ROWS + r + 1})) % {_MH_FOLD_M}"
        )
    return expr


# The shingle->hash->signature pipeline as ONE parsed SQL expression per
# stage (r20, VERDICT r19 #5; guide §4 — the DRIVER-side Python boundary
# counts too): building these trees with F.transform/F.array_min lambdas
# cost ~1.1 s and ~2000 py4j socket roundtrips per consumer query
# (cProfile: py4j send_command dominates minhash_pairs), five consumer
# queries per bench run. F.expr hands the JVM one string to parse. The
# SQL uses only dialect-shared syntax and the SAME arithmetic as both
# the Column version it replaces and the DuckDB oracle twin
# (_mh_sig_ctes); all consumers re-verified hash-exact.
_MH_HS_SQL = (
    "transform(array_distinct(transform("
    "sequence(1, greatest(length(substring(text, 1, 200)) - 4, 1)),"
    " i -> substring(substring(text, 1, 200), i, 5))),"
    f" s -> ({SQL_TOKEN_HASH_WIDE.format(t='s')}) % {_MH_M})"
)

_MH_SIG_SQL = "array(" + ", ".join(
    f"array_min(transform(hs, h -> (h * {a} + {b}) % {_MH_M}))"
    for a, b in zip(_MH_A, _MH_B)
) + ")"


def minhash_pairs(d: DataFrame) -> DataFrame:
    """The fixed-hash-family MinHash LSH pair pipeline over any
    (doc_id, text) frame — factored from dedup_minhash_exact (r14) so
    compositions like [[pipeline_dedup_full]] can run it over a filtered
    corpus (e.g. exact-dedup keepers) instead of the raw table."""
    hs = d.select("doc_id", F.expr(_MH_HS_SQL).alias("hs"))
    sig = hs.select("doc_id", F.expr(_MH_SIG_SQL).alias("sig"))
    bands_struct = "array(" + ", ".join(
        f"named_struct('j', {j}, 'key', {_mh_band_key_sql(j)})"
        for j in range(_MH_BANDS)
    ) + ")"
    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(F.expr(bands_struct)).alias("b"),
    ).select("doc_id", "sig", F.col("b.j").alias("j"), F.col("b.key").alias("key"))
    # Lazy localCheckpoint before the self-join: the two aliases would
    # otherwise each re-run the whole shingle->hash->signature pipeline
    # (exchange reuse does NOT kick in across the join's build/stream
    # sides here) — and that pipeline IS the dominant cost (measured:
    # 6.4 -> 3.6 s at sf0.1, 64 -> 33 s on the local sf1 corpus, same
    # pairs). The materialized table is 2 rows x (id, 8-long sig, j,
    # key) per doc; on a real cluster swap for reliable checkpoint()
    # (operators/graph.py note).
    bands = bands.localCheckpoint(eager=False)
    a, b = bands.alias("a"), bands.alias("b")
    n_eq = F.expr(
        "aggregate(zip_with(a.sig, b.sig,"
        " (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),"
        " 0, (acc, x) -> acc + x)"
    )
    # Score BEFORE the pair-dedup so the dropDuplicates shuffle carries 3
    # scalars per candidate, not two 8-long signature arrays; the score is
    # a pure function of the pair, so dedup-then-score is identical.
    return (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("b.doc_id") > F.col("a.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            round_pos(n_eq.cast("double") / F.lit(float(_MH_K)), 4).alias("minhash_sim"),
        )
        .dropDuplicates(["doc_a", "doc_b"])  # a pair can collide in >1 band
    )




@register(
    "contamination_ngram",
    group="llm-ext",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, lang, (doc_id % 29 = 0) AS is_eval,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(length(substr(text, 1, 200)) - 4, 1)),
               i -> substr(substr(text, 1, 200), i, 5)))) AS s
      FROM documents
    ), h AS (
      SELECT doc_id, lang, is_eval,
             {SQL_TOKEN_HASH_WIDE.format(t='s')} AS hs
      FROM g
    ), tr AS (
      SELECT DISTINCT lang, hs FROM h WHERE NOT is_eval
    ), ev AS (
      SELECT DISTINCT doc_id, lang, hs FROM h WHERE is_eval
    )
    SELECT ev.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN tr.hs IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           (round(CAST(SUM(CASE WHEN tr.hs IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                  / COUNT(*), 4) + 0.0) AS contamination_r
    FROM ev LEFT JOIN tr ON ev.lang = tr.lang AND ev.hs = tr.hs
    GROUP BY ev.doc_id
    """,
)
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check — the benchmark-hygiene op every
    pretraining pipeline needs: which fraction of an eval document's
    character 5-grams also appears anywhere in the training split?

    Split rule: doc_id % 29 == 0 is "eval", the rest "train" (a stand-in
    for a real held-out set). Per eval doc: n_shingles distinct 5-grams
    (200-char prefix, the dedup_ngram_jaccard representation),
    n_contaminated of them present in some same-lang train doc, and the
    contamination ratio.

    Scale shape: shingles are HASHED to 61-bit longs map-side
    (functions.text.token_hash_wide — mixes all 8 leading chars, so it
    is injective on ASCII 5-grams; the narrow 3-char hash conflated ~27%
    of distinct shingles and overcounted contamination. Dialect-portable,
    so the oracle applies the identical formula and parity is exact by
    construction); the
    membership probe shuffles (lang, 8-byte hash) pairs, never shingle
    strings, and both sides are distinct-reduced before the join — a
    hash-join whose build side is the distinct train-shingle set, never
    an all-pairs document comparison.
    """
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "lang", (F.col("doc_id") % 29 == 0).alias("is_eval"), "text"
    )
    g = d.select(
        "doc_id",
        "lang",
        "is_eval",
        F.explode(
            F.transform(char_shingles(F.col("text"), n=5, prefix_len=200), token_hash_wide)
        ).alias("hs"),
    )
    tr = g.filter(~F.col("is_eval")).select("lang", "hs").distinct().withColumn("hit", F.lit(1))
    ev = g.filter(F.col("is_eval")).select("doc_id", "lang", "hs").distinct()
    return (
        ev.join(tr, ["lang", "hs"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_contaminated"),
            round_pos(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double") / F.count(F.lit(1)), 4
            ).alias("contamination_r"),
        )
    )




_NEAR_DUP_JC = 0.2  # banded-Jaccard near-dup threshold for the scorecard




@register(
    "source_scorecard",
    group="llm-ext",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(1, greatest(length(substr(text, 1, 200)) - 4, 1)),
               i -> substr(substr(text, 1, 200), i, 5))) AS shingles
      FROM documents
    ), dup AS (
      SELECT DISTINCT b.doc_id AS doc_b
      FROM sh a JOIN sh b
        ON a.lang = b.lang AND b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 10
      WHERE (round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))), 4) + 0.0)
            >= {_NEAR_DUP_JC}
    ), t AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           (round(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 4) + 0.0)
             AS mean_tokens,
           CAST(SUM(CASE WHEN dup.doc_b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_near_dup,
           (round(CAST(SUM(CASE WHEN dup.doc_b IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                  / COUNT(*), 4) + 0.0) AS near_dup_rate
    FROM t LEFT JOIN dup ON t.doc_id = dup.doc_b
    GROUP BY t.source
    """,
)
def source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation scorecard — the RefinedWeb/CCNet-style "which
    crawl sources are junk" aggregation: document count, mean token count,
    and the banded near-dup rate (docs whose 5-gram Jaccard vs a lower-id
    same-lang doc within the id band is >= {_NEAR_DUP_JC}, i.e. not the
    keeper).

    The near-dup rate is band-SCOPED (the same bounded candidate
    generation as dedup_ngram_jaccard) — a lower bound on the true rate,
    the standard trade at 100 TB where all-pairs is off the table. Shapes:
    one banded equi self-join (shared machinery, _ngram_pair_scores), a
    distinct on (doc_id) duplicates, a broadcast-size LEFT join back, and
    one groupBy(source) with map-side partials."""
    pairs = _ngram_pair_scores(spark, sf_dir)
    dups = (
        pairs.filter(F.col("jaccard_r") >= _NEAR_DUP_JC)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    t = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    return (
        t.join(dups, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            round_pos(F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 4).alias(
                "mean_tokens"
            ),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("long").alias("n_near_dup"),
            round_pos(
                F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("double") / F.count(F.lit(1)),
                4,
            ).alias("near_dup_rate"),
        )
    )




# --- minhash pair list -> transitive clusters (the output-capping path) ----

# Signature-agreement gate; sims are exact eighths so the compare can
# never straddle an engine rounding difference. 0.75 (6 of 8), NOT 0.5:
# a banded candidate already agrees on one full band = 4 of 8 positions
# by construction, so a 0.5 gate admits EVERY candidate pair (verified:
# 58,419 of 58,419 at sf0.1) and the "gate" is vacuous — the cluster
# stage must be stricter than the recall stage that feeds it.
_MHC_MIN_SIM = 0.75



_MINHASH_CLUSTER_ORACLE = f"""
    WITH RECURSIVE mh AS (
      SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE}) p WHERE minhash_sim >= {_MHC_MIN_SIM}
    ), und AS (
      SELECT doc_a AS u, doc_b AS v FROM mh UNION SELECT doc_b, doc_a FROM mh
    ), reach(v, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.v, r.lbl FROM reach r JOIN und e ON e.u = r.v
    )
    SELECT v AS doc_id, MIN(lbl) AS cluster_id,
           CAST(CASE WHEN v = MIN(lbl) THEN 1 ELSE 0 END AS INTEGER) AS is_keeper
    FROM reach GROUP BY v
    """




@register("dedup_minhash_cluster", group="llm-ext", oracle=_MINHASH_CLUSTER_ORACLE)
def dedup_minhash_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup CLUSTERS: the pair list from dedup_minhash_exact
    gated at signature agreement >= {gate}, closed transitively
    (operators/graph.py hook + pointer-jump), one keeper per cluster —
    the text-side sibling of dedup_embed_cluster and the scale dial
    SCALING.md names for pair-mass growth: an exact near-dup PAIR list is
    inherently quadratic in duplicate-group size (sf1 measured 1.18M
    pairs), while this output is exactly |corpus| rows at any scale —
    dup-group size moves work, never output.

    Shape at scale: signature/band work is the shared map-side pipeline;
    only the gated (doc_a, doc_b) edge table (already deduped,
    3-scalar rows) reaches the CC loop, which touches O(|docs|) label
    rows per round for O(log chain) rounds. The gate uses exact-eighth
    agreement fractions, so the >= compare cannot straddle an engine
    rounding difference."""
    pairs = dedup_minhash_exact(spark, sf_dir).filter(F.col("minhash_sim") >= _MHC_MIN_SIM)
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    nodes = table(spark, sf_dir, "documents").select(F.col("doc_id").alias("vec_id"))
    from ...operators.graph import connected_components

    labels = connected_components(nodes, edges)
    return labels.select(
        F.col("vec_id").alias("doc_id"),
        "cluster_id",
        (F.col("vec_id") == F.col("cluster_id")).cast("int").alias("is_keeper"),
    )




dedup_minhash_cluster.__doc__ = dedup_minhash_cluster.__doc__.format(gate=_MHC_MIN_SIM)




_MHI_ORACLE = f"""
    WITH RECURSIVE allp AS (
      SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE}) p WHERE minhash_sim >= {_MHC_MIN_SIM}
    ), exp AS (
      SELECT doc_a, doc_b FROM allp WHERE doc_a % 10 < 8 AND doc_b % 10 < 8
    ), und AS (
      SELECT doc_a AS u, doc_b AS v FROM exp UNION SELECT doc_b, doc_a FROM exp
    ), reach(v, lbl) AS (
      SELECT doc_id, doc_id FROM documents WHERE doc_id % 10 < 8
      UNION
      SELECT e.v, r.lbl FROM reach r JOIN und e ON e.u = r.v
    ), labels AS (
      SELECT v AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY v
    ), cross_m AS (
      SELECT CASE WHEN doc_a % 10 >= 8 THEN doc_a ELSE doc_b END AS doc_id,
             CASE WHEN doc_a % 10 >= 8 THEN doc_b ELSE doc_a END AS ex_id
      FROM allp WHERE (doc_a % 10 >= 8) <> (doc_b % 10 >= 8)
    ), asg AS (
      SELECT c.doc_id, MIN(l.cluster_id) AS mc
      FROM cross_m c JOIN labels l ON l.doc_id = c.ex_id GROUP BY c.doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.mc, d.doc_id) AS cluster_id,
           CAST(CASE WHEN a.mc IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_new_cluster
    FROM documents d LEFT JOIN asg a ON a.doc_id = d.doc_id
    WHERE d.doc_id % 10 >= 8
    """




@register("dedup_minhash_incremental", group="llm-ext", oracle=_MHI_ORACLE)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run incremental near-dup clustering (VERDICT r9 item 8: the
    dedup_incremental x dedup_minhash_cluster composition): the corpus is
    split snapshot/batch by the dedup_incremental 80/20 rule, the
    SNAPSHOT's gated minhash pairs are transitively closed as usual
    (operators/graph.py CC), and each INCOMING doc is then assigned in
    one pass — to the lowest existing cluster id among its gated matches
    into the snapshot, or to itself as a new singleton cluster. This is
    the streaming-ingest approximation every incremental dedupe service
    runs: new->new chains are NOT closed transitively within the batch
    (two new near-dups of each other but of nothing existing stay
    separate singletons); the periodic full dedup_minhash_cluster run is
    the compaction that reconciles them, and the oracle pins exactly
    this contract.

    Shape at scale: the gated pair list is computed ONCE (the shared
    banded minhash pipeline; lazily checkpointed here because both the
    snapshot-edge filter and the cross-match filter consume it), the CC
    loop runs over snapshot edges only, and the incremental step is one
    broadcast-sized groupBy + left join per batch — the whole point:
    ingesting a batch costs O(batch candidates), not a corpus re-cluster."""
    pairs = (
        dedup_minhash_exact(spark, sf_dir)
        .filter(F.col("minhash_sim") >= _MHC_MIN_SIM)
        .localCheckpoint(eager=False)
    )
    is_new_a = F.col("doc_a") % 10 >= 8
    is_new_b = F.col("doc_b") % 10 >= 8
    ex_edges = pairs.filter(~is_new_a & ~is_new_b).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    nodes = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 < 8)
        .select(F.col("doc_id").alias("vec_id"))
    )
    from ...operators.graph import connected_components

    labels = connected_components(nodes, ex_edges)
    cross = pairs.filter(is_new_a != is_new_b).select(
        F.when(is_new_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias("doc_id"),
        F.when(is_new_a, F.col("doc_b")).otherwise(F.col("doc_a")).alias("ex_id"),
    )
    asg = (
        cross.join(labels, cross["ex_id"] == labels["vec_id"])
        .groupBy("doc_id")
        .agg(F.min("cluster_id").alias("mc"))
    )
    incoming = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 >= 8)
        .select("doc_id")
    )
    return incoming.join(asg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("mc"), F.col("doc_id")).alias("cluster_id"),
        F.col("mc").isNull().cast("int").alias("is_new_cluster"),
    )




# --- dedup_minhash_precision_audit — LSH stage quality audit (round 12) -----


_MHP_SH_CTE = """sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(substr(text, 1, 200)) - 4, 1)),
               i -> substr(substr(text, 1, 200), i, 5))) AS shingles
      FROM documents
    )"""



_MHP_ORACLE = f"""
    WITH mh AS (SELECT doc_a, doc_b, minhash_sim FROM ({_MINHASH_ORACLE})),
    {_MHP_SH_CTE},
    j AS (
      SELECT mh.doc_a, mh.doc_b, mh.minhash_sim,
             CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS i,
             CAST(len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS u
      FROM mh JOIN sh a ON a.doc_id = mh.doc_a
              JOIN sh b ON b.doc_id = mh.doc_b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(*) FILTER (WHERE i * 2 >= u) AS BIGINT) AS n_true_half,
           CAST(COALESCE(COUNT(*) FILTER (WHERE i * 2 >= u) * 10000
                // NULLIF(COUNT(*), 0), 0) AS BIGINT) AS precision_bp,
           CAST(COALESCE(SUM(CAST(floor(abs(minhash_sim
                 - CAST(i AS DOUBLE) / u) * 10000) AS BIGINT))
                // NULLIF(COUNT(*), 0), 0) AS BIGINT) AS mean_abs_err_bp
    FROM j
    """




@register("dedup_minhash_precision_audit", group="llm-ext", oracle=_MHP_ORACLE)
def dedup_minhash_precision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-stage quality audit — for every MinHash band-collision
    candidate ([[dedup_minhash_exact]]'s declared pair list), the EXACT
    5-gram Jaccard of the pair, rolled up to the numbers a dedup
    deployment tunes bands/rows against: candidate precision at J >= 0.5
    (exact integer compare, 2·|∩| >= |∪|) and the mean |signature
    agreement − true Jaccard| in bp — the estimator-vs-truth audit that
    [[vec_pq_recall_audit]] is for PQ, closing the loop on the dedup
    estimator family (recall's complement is pinned separately by
    tests/test_minhash_recall.py's property tests).

    Plan: the candidate pairs (band-bounded, never all-pairs) join the
    shingle-array table twice on the doc key; intersection/union sizes
    are integers, one IEEE division + floor per pair, and the audit is
    a single-row rollup. Shingle arrays ride the join — bounded by the
    200-char prefix — and only candidate pairs pay it.

    The pair side is re-spread on an EXPLICIT partition count before the
    joins (r13): the candidate shuffle is byte-light (3 scalars/row) so
    AQE coalesces it to one partition — and the per-pair array-intersect
    kernel, the query's real cost, went serial with it (measured 3.9 ->
    1.1 s at sf0.1). An explicit repartition(par) is exempt from AQE
    coalescing; compute-heavy-but-byte-light stages must size partitions
    by KERNEL cost, which AQE cannot see."""
    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    pairs = (
        dedup_minhash_exact(spark, sf_dir)
        .select("doc_a", "doc_b", "minhash_sim")
        .repartition(par, "doc_a")
    )
    sh = spread_scan(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", char_shingles(F.col("text"), n=5, prefix_len=200).alias("shingles")
    )
    j = (
        pairs.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb")),
            "doc_b",
        )
        .select(
            "minhash_sim",
            F.size(F.array_intersect("sa", "sb")).cast("long").alias("i"),
            (
                F.size("sa") + F.size("sb") - F.size(F.array_intersect("sa", "sb"))
            ).cast("long").alias("u"),
        )
    )
    err = F.floor(
        F.abs(F.col("minhash_sim") - F.col("i").cast("double") / F.col("u")) * 10000
    ).cast("long")
    return (
        j.agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum((F.col("i") * 2 >= F.col("u")).cast("long")).alias("n_true_half"),
            F.sum(err).alias("sum_err"),
        )
        .select(
            "n_pairs",
            "n_true_half",
            F.expr("coalesce(n_true_half * 10000 div nullif(n_pairs, 0), 0)")
            .cast("long")
            .alias("precision_bp"),
            F.expr("coalesce(sum_err div nullif(n_pairs, 0), 0)")
            .cast("long")
            .alias("mean_abs_err_bp"),
        )
    )




# --- dedup_lsh_tuning_curve — measured vs theoretical S-curve (round 12) ----


_LSH_TUNE_ORACLE = f"""
    WITH sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(1, greatest(length(substr(text, 1, 200)) - 4, 1)),
               i -> substr(substr(text, 1, 200), i, 5))) AS shingles
      FROM documents
    ), uni AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             (round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                   / (len(a.shingles) + len(b.shingles)
                      - len(list_intersect(a.shingles, b.shingles))), 4) + 0.0)
               AS jaccard_r
      FROM sh a JOIN sh b
        ON a.lang = b.lang AND b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 10
    ), mh AS (
      SELECT DISTINCT doc_a, doc_b FROM ({_MINHASH_ORACLE})
    ), j AS (
      SELECT CAST(floor(u.jaccard_r * 10) AS BIGINT) AS bucket,
             CASE WHEN mh.doc_a IS NULL THEN 0 ELSE 1 END AS hit
      FROM uni u LEFT JOIN mh ON mh.doc_a = u.doc_a AND mh.doc_b = u.doc_b
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(hit) AS BIGINT) AS n_collided,
           CAST(SUM(hit) * 10000 // COUNT(*) AS BIGINT) AS collide_bp,
           CAST(round((1.0 - pow(1.0 - pow((2.0 * bucket + 1.0) / 20.0, 4), 2))
                * 10000) AS BIGINT) AS theory_bp
    FROM j GROUP BY bucket
    """




@register("dedup_lsh_tuning_curve", group="llm-ext", oracle=_LSH_TUNE_ORACLE)
def dedup_lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured MinHash-LSH S-curve — for the banded candidate universe
    ([[dedup_ngram_jaccard]]'s exact-Jaccard pairs), the fraction that
    the 2-band × 4-row LSH ([[dedup_minhash_exact]]) actually collides,
    bucketed by true Jaccard decile, next to the analytic collision
    probability 1 − (1 − s⁴)² at the bucket midpoint — the curve every
    LSH deployment plots to pick bands × rows (too flat: missed dups;
    too early: candidate explosion). [[dedup_minhash_precision_audit]]
    scores the candidates LSH DID emit; this measures what it emits as
    a function of similarity.

    Plan: the exact-pair universe (banded, never all-pairs) LEFT joins
    the collision pair list on the (doc_a, doc_b) key, then an O(11)-row
    rollup; the theory column is arithmetic on the bucket id. At scale
    both pair lists are the declared queries' own outputs — the audit
    adds one hash join and a tiny aggregate."""
    uni = _ngram_pair_scores(spark, sf_dir).select("doc_a", "doc_b", "jaccard_r")
    mh = (
        dedup_minhash_exact(spark, sf_dir)
        .select("doc_a", "doc_b")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    j = uni.join(mh, ["doc_a", "doc_b"], "left").select(
        F.floor(F.col("jaccard_r") * 10).cast("long").alias("bucket"),
        F.coalesce("hit", F.lit(0)).alias("hit"),
    )
    theory = F.round(
        (
            1.0
            - F.pow(
                1.0 - F.pow((2.0 * F.col("bucket") + 1.0) / 20.0, 4.0), 2.0
            )
        )
        * 10000
    ).cast("long")
    return (
        j.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("hit").cast("long").alias("n_collided"),
        )
        .select(
            "bucket",
            "n_pairs",
            "n_collided",
            F.expr("n_collided * 10000 div n_pairs").cast("long").alias("collide_bp"),
            theory.alias("theory_bp"),
        )
    )




@register(
    "dedup_cluster_histogram",
    group="llm-ext",
    oracle=f"""
    WITH labels AS ({_MINHASH_CLUSTER_ORACLE}),
    sizes AS (
      SELECT cluster_id, COUNT(*) AS cluster_size
      FROM labels GROUP BY cluster_id
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
)
def dedup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size distribution of the MinHash near-dup clustering — the
    power-law audit every dedup run reads before trusting its keeper set
    (a giant component means the banding/gate is too loose — the exact
    failure the r8 2-row-band review caught by hand; this query makes it
    a table). Output is O(distinct sizes) rows at any corpus scale.

    Scale: composes [[dedup_minhash_cluster]]'s label table (banded
    candidates -> gated edges -> distributed CC), then two
    map-side-combined aggregates: labels -> per-cluster size -> size
    histogram. No new shuffle shape beyond the cluster machinery."""
    labels = dedup_minhash_cluster(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).cast("long").alias("n_docs"),
    )
