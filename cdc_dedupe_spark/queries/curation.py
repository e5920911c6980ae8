"""Corpus-curation operators (round 8): the remaining data-engineering
stages of a pretraining pipeline that sit between raw documents and a
training mix — span-level dedup, temperature-scaled source mixing,
leakage-safe dataset splitting, and vocabulary pruning (UNK-ing).

Like the rest of the LLM family these are beyond the reference's own
surface (the reference is a CDC dedupe engine — RedisSource.java /
WatchStream.java deal in stream entries, not corpora) but are declared
first-class registry entries with exact DuckDB oracles.

Scale stances:
 - span dedup shuffles (doc_id, 16-byte md5) pairs, never text; the
   window over the hash key is the per-shingle frequency, bounded state;
 - mixing/splitting decisions are pure functions of row content
   (portable token_hash of md5(text)) — map-side, rerun-stable, and the
   per-source rate table is a broadcast of an O(|sources|) aggregate;
 - vocabulary pruning joins tokens against the kept-vocab table, which
   is Heaps'-law-bounded and broadcastable; reassembly is the standard
   sorted-collect over (pos, token) — one doc_id shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKEN_HASH, SQL_TOKEN_HASH_WIDE, token_hash, token_hash_wide
from ..tables import table
from ._determinism import round_pos
from .registry import register

# ---------------------------------------------------------------------------
# dedup_span_ngram — token-span (8-gram) duplication profile


_SPAN_W = 8


def _span_oracle(src: str = "documents") -> str:
    """The span-profile oracle, parametrized on the source relation so
    pipeline_curation_mix can run it over the boilerplate-stripped
    frame (cdocs) while dedup_span_ngram keeps the raw-documents form."""
    return f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM {src}
    ), s AS (
      SELECT doc_id, md5(array_to_string(toks[i:i+{_SPAN_W - 1}], ' ')) AS h
      FROM t, UNNEST(generate_series(1, len(toks) - {_SPAN_W - 1})) AS u(i)
      WHERE len(toks) >= {_SPAN_W}
    ), p AS (
      SELECT doc_id, h, COUNT(*) AS k FROM s GROUP BY doc_id, h
    ), w AS (
      SELECT doc_id, k, SUM(k) OVER (PARTITION BY h) AS tot FROM p
    )
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_spans,
           CAST(COALESCE(SUM(CASE WHEN tot > 1 THEN k END), 0) AS BIGINT) AS dup_spans,
           CAST((COALESCE(SUM(CASE WHEN tot > 1 THEN k END), 0) * 10000)
                // SUM(k) AS BIGINT) AS dup_frac_bp
    FROM w GROUP BY doc_id
    """


_SPAN_ORACLE = _span_oracle()


@register("dedup_span_ngram", group="curation", oracle=_SPAN_ORACLE)
def dedup_span_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window substring dedup profile (Lee et al. "Deduplicating
    Training Data Makes Language Models Better", at token-8-gram
    granularity): per document, the fraction of its token-span
    occurrences whose span appears >= 2 times corpus-wide (any doc,
    within-doc repeats included). Docs shorter than the window emit no
    spans and are absent by construction.

    Shape at scale: span hashing is map-side (HOF over the token array;
    only (doc_id, md5) pairs leave the scan — never span text), per-doc
    span multiplicities are a (doc_id, h) partial-agg, corpus frequency
    is a window over the 16-byte hash key, and the final per-doc profile
    re-aggregates on doc_id. Three hash-key exchanges, zero joins, no
    quadratic pair expansion anywhere. dup_frac_bp uses truncating
    integer division (Spark `div` == DuckDB `//`), identical both
    engines."""
    return _span_profile(table(spark, sf_dir, "documents"))


def _span_profile(d: DataFrame) -> DataFrame:
    """Shared span-dedup profiler over a documents frame. Used by
    dedup_span_ngram (declared output) and pipeline_curation_mix
    (dedup gate).

    Doc rows are spread to full parallelism BEFORE the ~50x md5-span
    explode: the exchange moves only the raw documents (cheap), and the
    hashing work then scales with cores instead of with the scan's
    file-count partitioning (measured 4.0x wall for 10x docs on a
    one-file corpus, 2.2x after — SCALING.md round 12)."""
    par = int(d.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    spans = (
        d.repartition(par, "doc_id")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= _SPAN_W)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_SPAN_W - 1}),"
                    f" i -> md5(cast(array_join(slice(toks, i, {_SPAN_W}), ' ') as binary)))"
                )
            ).alias("h"),
        )
    )
    pairs = spans.groupBy("doc_id", "h").agg(F.count(F.lit(1)).alias("k"))
    tot = F.sum("k").over(Window.partitionBy("h"))
    dup = F.sum(F.when(F.col("tot") > 1, F.col("k")).otherwise(F.lit(0)))
    return (
        pairs.withColumn("tot", tot)
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_spans"),
            dup.alias("dup_spans"),
        )
        .withColumn("dup_frac_bp", F.expr("dup_spans * 10000 div n_spans"))
    )


# ---------------------------------------------------------------------------
# mix_sources_temperature — temperature-scaled source mixing


@register(
    "mix_sources_temperature",
    group="curation",
    oracle=f"""
    WITH s AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS tok
      FROM documents GROUP BY source
    ), r AS (
      SELECT source,
             CAST(floor(10000.0 * sqrt(CAST(tok AS DOUBLE))
                  / sqrt(CAST((SELECT MAX(tok) FROM s) AS DOUBLE))) AS BIGINT) AS rate_bp
      FROM s
    )
    SELECT doc_id, source, lang, n_chars, rate_bp
    FROM documents JOIN r USING (source)
    WHERE ({SQL_TOKEN_HASH_WIDE.format(t='md5(text)')}) % 10000 < rate_bp
    """,
)
def mix_sources_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-LM sampling
    rule, alpha = 0.5): per-source keep rate proportional to
    sqrt(source token mass), normalized so the largest source keeps
    everything; membership decided by a content-derived hash so the mix
    is a pure function of the row — reruns, retries, and repartitionings
    pick the same subset (the property sample_stratified establishes for
    per-language rates, here driven by corpus statistics instead of a
    config constant).

    Shape at scale: the rate table is an O(|sources|) aggregate
    broadcast back onto the fact table; the filter is map-side. The
    normalizing max is a window over the already-tiny stats table (its
    SinglePartition exchange moves O(|sources|) rows — the
    doc_pack_sequences bucket-table pattern), NOT a second aggregate
    over documents: one fact-scan for stats, one for the filter, total.
    sqrt and one multiply+divide are correctly-rounded IEEE ops, so
    rate_bp is bit-identical cross-engine; the rest is integer
    arithmetic. Membership uses token_hash_wide (8 hex chars of mix
    input): basis-point thresholds need more than token_hash's 4096
    distinct values to deliver the advertised rate resolution."""
    d = table(spark, sf_dir, "documents")
    hb = token_hash_wide(F.md5(F.col("text").cast("binary"))) % 10000
    return (
        d.join(F.broadcast(_temp_rates(d)), "source")
        .filter(hb < F.col("rate_bp"))
        .select("doc_id", "source", "lang", "n_chars", "rate_bp")
    )


def _temp_rates(d: DataFrame) -> DataFrame:
    """Shared temperature-rate table (source, rate_bp) over a documents
    frame: rate ∝ sqrt(source token mass), normalized to the largest
    source via a window over the tiny per-source stats table. Used by
    mix_sources_temperature (declared output) and pipeline_curation_mix
    (post-dedup-gate mixing)."""
    stats = d.groupBy("source").agg(F.sum("n_chars").alias("tok"))
    return stats.withColumn(
        "mx", F.max("tok").over(Window.partitionBy(F.lit(1)))
    ).select(
        "source",
        F.floor(
            F.lit(10000.0)
            * F.sqrt(F.col("tok").cast("double"))
            / F.sqrt(F.col("mx").cast("double"))
        )
        .cast("long")
        .alias("rate_bp"),
    )


# ---------------------------------------------------------------------------
# split_train_holdout — leakage-safe deterministic dataset split


@register(
    "split_train_holdout",
    group="curation",
    oracle=f"""
    SELECT doc_id,
           md5(text) AS text_hash,
           CAST(({SQL_TOKEN_HASH.format(t='md5(text)')}) % 100 AS BIGINT) AS content_bucket,
           CASE WHEN ({SQL_TOKEN_HASH.format(t='md5(text)')}) % 100 < 90 THEN 'train'
                WHEN ({SQL_TOKEN_HASH.format(t='md5(text)')}) % 100 < 95 THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/valid/test split (90/5/5): the bucket is a
    function of md5(text), so byte-identical documents land in the SAME
    split no matter which doc_id, source, or ingestion batch they arrive
    under — the property that makes a holdout set trustworthy after
    (or without) exact dedup. Splitting by doc_id or by random() has no
    such guarantee and silently leaks dup'd eval docs into train.

    Map-side, zero shuffle at any scale; rerun-stable for the same
    reason as sample_stratified / mix_sources_temperature."""
    d = table(spark, sf_dir, "documents")
    bucket = (token_hash(F.md5(F.col("text").cast("binary"))) % 100).cast("long")
    return (
        d.withColumn("text_hash", F.md5(F.col("text").cast("binary")))
        .withColumn("content_bucket", bucket)
        .select(
            "doc_id",
            "text_hash",
            "content_bucket",
            F.when(F.col("content_bucket") < 90, F.lit("train"))
            .when(F.col("content_bucket") < 95, F.lit("valid"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )


# ---------------------------------------------------------------------------
# text_vocab_unk — vocabulary pruning / UNK replacement


@register(
    "text_vocab_unk",
    group="curation",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), tok AS (
      SELECT doc_id, i AS pos, toks[i] AS tk
      FROM t, UNNEST(generate_series(1, len(toks))) AS u(i)
    ), c AS (
      SELECT tk, COUNT(*) AS cnt FROM tok GROUP BY tk
    ), g AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS vocab FROM c
    ), m AS (
      SELECT doc_id, pos,
             CASE WHEN cnt * 2 * vocab < total THEN '<unk>' ELSE tk END AS mt,
             CASE WHEN cnt * 2 * vocab < total THEN 1 ELSE 0 END AS oov
      FROM tok JOIN c USING (tk) CROSS JOIN g
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST((SUM(oov) * 10000) // COUNT(*) AS BIGINT) AS oov_bp,
           string_agg(mt, ' ' ORDER BY pos) AS text_unk
    FROM m GROUP BY doc_id
    """,
)
def text_vocab_unk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary pruning with UNK replacement (tokenizer-prep): a token
    is out-of-vocabulary iff its corpus frequency is under half the mean
    frequency (cnt * 2 * |vocab| < total — integer compare, no division,
    data-derived so the rule scales with the corpus instead of hardcoding
    a count). Per doc: token/OOV counts and the text rewritten with rare
    tokens replaced by '<unk>', original order preserved.

    Shape at scale: corpus counts are one token-key agg; the per-token
    rare flag joins back on the token key — the kept vocabulary is
    Heaps'-law-bounded, so this join broadcasts (AQE picks it up here;
    at 100 TB you'd materialize the vocab table once per corpus
    snapshot). Reassembly is the one inherent doc_id shuffle: sorted
    collect of (pos, token) — the fn_string_agg ordered-agg idiom."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tk")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tk")
    counts = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("cnt"))
    g = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    flags = counts.crossJoin(F.broadcast(g)).select(
        "tk",
        (F.col("cnt") * 2 * F.col("vocab") < F.col("total")).alias("rare"),
    )
    m = tok.join(F.broadcast(flags), "tk").select(
        "doc_id",
        "pos",
        F.when(F.col("rare"), F.lit("<unk>")).otherwise(F.col("tk")).alias("mt"),
        F.when(F.col("rare"), F.lit(1)).otherwise(F.lit(0)).alias("oov"),
    )
    return m.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("oov").alias("n_oov"),
        F.expr("sum(oov) * 10000 div count(1)").alias("oov_bp"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos").alias("pos"), F.col("mt").alias("mt")))
                ),
                lambda x: x["mt"],
            ),
            " ",
        ).alias("text_unk"),
    )


# ---------------------------------------------------------------------------
# pipeline_curation_mix — composed corpus-curation flow


def _curation_ctes() -> str:
    """The full curation-flow CTE chain, ending in `mix` (which carries
    the cleaned text so downstream composers — the write-path read-back
    oracle — can digest it). pipeline_curation_mix's own oracle projects
    the declared columns off the same chain."""
    from .web_dedup import _strip_sql

    return f"""{_strip_sql("documents")}, cdocs AS (
      SELECT s.doc_id, d.source, d.lang, s.text_clean AS text,
             CAST(length(s.text_clean) AS BIGINT) AS n_chars,
             CAST((s.n_tokens - s.n_tokens_kept) * 10000 // s.n_tokens AS BIGINT)
               AS strip_bp
      FROM stripped s JOIN documents d USING (doc_id)
      WHERE s.n_tokens_kept > 0
    ), prof AS (
      SELECT * FROM ({_span_oracle("cdocs")})
    ), g AS (
      SELECT c2.doc_id, c2.text, c2.source, c2.lang, c2.n_chars, c2.strip_bp,
             COALESCE(p.dup_frac_bp, 0) AS dup_bp
      FROM cdocs c2 LEFT JOIN prof p ON p.doc_id = c2.doc_id
      WHERE COALESCE(p.dup_frac_bp, 0) <= 2000
    ), s2 AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS tok FROM g GROUP BY source
    ), r AS (
      SELECT source,
             CAST(floor(10000.0 * sqrt(CAST(tok AS DOUBLE))
                  / sqrt(CAST((SELECT MAX(tok) FROM s2) AS DOUBLE))) AS BIGINT) AS rate_bp
      FROM s2
    ), mix AS (
      SELECT g.doc_id, g.source, g.lang, g.text, g.strip_bp, g.dup_bp, r.rate_bp,
             CASE WHEN ({SQL_TOKEN_HASH.format(t='md5(g.text)')}) % 100 < 90 THEN 'train'
                  WHEN ({SQL_TOKEN_HASH.format(t='md5(g.text)')}) % 100 < 95 THEN 'valid'
                  ELSE 'test' END AS split
      FROM g JOIN r USING (source)
      WHERE ({SQL_TOKEN_HASH_WIDE.format(t='md5(g.text)')}) % 10000 < r.rate_bp
    )"""


_CURATION_ORACLE = f"""
    WITH {_curation_ctes()}
    SELECT doc_id, source, lang, strip_bp, dup_bp, rate_bp, split FROM mix
    """


@register("pipeline_curation_mix", group="curation", oracle=_CURATION_ORACLE)
def pipeline_curation_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus-curation flow — the round-8 counterpart of
    pipeline_pretrain_docs, with the r15 boilerplate gate in front:
    (0) line-level dedup EMISSION (web_dedup.strip_boilerplate): every
    12-token segment occurring >= 3 times corpus-wide is removed and the
    text reassembled; docs stripped to nothing are dropped — ALL later
    stages (span profile, source masses, content-hash mix and split)
    see the CLEANED text, which is the real pipeline ordering (C4 strips
    boilerplate lines before span dedup, else shared footers dominate
    the span statistics); (1) span-dedup gate: drop documents with more
    than 20% duplicated token-8-gram occurrences (the Lee-et-al filter,
    _span_profile over cleaned text; short docs with no spans pass);
    (2) temperature mix at alpha=0.5 with rates recomputed over the
    SURVIVING corpus (_temp_rates — staged recompute: stripping and
    gating both change the source masses the mixer must see); (3)
    leakage-safe split assignment on the CLEANED content hash (two docs
    that become byte-identical after boilerplate removal land in the
    same split).

    Shape at scale: the strip stage's digest-only count/membership
    shuffles + one doc_id reassembly exchange run ONCE — cdocs feeds
    both the span profiler and the gate join, so it is lineage-truncated
    with a lazy localCheckpoint, as is the gated frame g (the r8 plan
    probe found each un-truncated consumer re-running the whole
    upstream: 7 scans -> 1 materialization); rates are an O(|sources|)
    aggregate broadcast back; mix + split decisions are map-side
    expressions."""
    return curated_mix(spark, sf_dir).select(
        "doc_id", "source", "lang", "strip_bp", "dup_bp", "rate_bp", "split"
    )


def curated_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation flow's full output frame INCLUDING the cleaned text
    (doc_id, source, lang, text, strip_bp, dup_bp, rate_bp, split) —
    pipeline_curation_mix projects the declared audit columns off it;
    pipeline_corpus_write_readback digests the text and persists the
    mix (the r15 curated-corpus write path)."""
    from .web_dedup import strip_boilerplate

    d = table(spark, sf_dir, "documents")
    s = strip_boilerplate(d.select("doc_id", "text"))
    cdocs = (
        s.filter(F.col("n_tokens_kept") > 0)
        .join(d.select("doc_id", "source", "lang"), "doc_id")
        .select(
            "doc_id",
            "source",
            "lang",
            F.col("text_clean").alias("text"),
            F.length("text_clean").cast("long").alias("n_chars"),
            F.expr("(n_tokens - n_tokens_kept) * 10000 div n_tokens").alias("strip_bp"),
        )
        .localCheckpoint(eager=False)
    )
    prof = _span_profile(cdocs)
    g = (
        cdocs.join(prof.select("doc_id", "dup_frac_bp"), "doc_id", "left")
        .withColumn("dup_bp", F.coalesce("dup_frac_bp", F.lit(0)))
        .filter(F.col("dup_bp") <= 2000)
        .select("doc_id", "text", "source", "lang", "n_chars", "strip_bp", "dup_bp")
        .localCheckpoint(eager=False)
    )
    hb100 = token_hash(F.md5(F.col("text").cast("binary"))) % 100
    hb10k = token_hash_wide(F.md5(F.col("text").cast("binary"))) % 10000
    return (
        g.join(F.broadcast(_temp_rates(g)), "source")
        .filter(hb10k < F.col("rate_bp"))
        .withColumn("hb100", hb100)
        .select(
            "doc_id",
            "source",
            "lang",
            "text",
            "strip_bp",
            "dup_bp",
            "rate_bp",
            F.when(F.col("hb100") < 90, F.lit("train"))
            .when(F.col("hb100") < 95, F.lit("valid"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )


# ---------------------------------------------------------------------------
# sample_priority_weighted — Duffield-Lund-Thorup priority sampling


_PRIO_K = 20  # sample size per source
_PRIO_SALT = 64  # local-phase fan-out per source

_PRIO_HASH = SQL_TOKEN_HASH_WIDE.format(t="md5(text)")

_PRIO_ORACLE = f"""
    WITH p AS (
      SELECT doc_id, source, n_chars,
             CAST(({_PRIO_HASH}) AS DOUBLE) / n_chars AS inv_priority
      FROM documents WHERE n_chars > 0
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY source
                    ORDER BY inv_priority, doc_id) AS rk
      FROM p
    ), tau AS (
      SELECT source,
             MAX(CASE WHEN rk = {_PRIO_K + 1} THEN inv_priority END) AS tau_inv
      FROM r WHERE rk <= {_PRIO_K + 1} GROUP BY source
    )
    SELECT r.source, r.doc_id, r.n_chars, r.rk,
           (round(CASE WHEN tau.tau_inv IS NULL THEN r.n_chars * 1.0
                       ELSE greatest(r.n_chars * 1.0, 1.0 / tau.tau_inv)
                  END, 4) + 0.0) AS w_hat
    FROM r JOIN tau USING (source)
    WHERE r.rk <= {_PRIO_K}
    """


@register("sample_priority_weighted", group="curation", oracle=_PRIO_ORACLE)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement via priority
    sampling (Duffield, Lund & Thorup, JACM 2007): each document gets
    priority q = w / u with weight w = n_chars and u a content-derived
    uniform (portable token_hash_wide of md5(text)); the k highest
    priorities per source — equivalently the k smallest u/w — are the
    sample. Like sample_stratified the decision is a pure function of
    the row, so reruns and repartitionings pick the SAME sample, but
    here inclusion probability scales with document weight and the
    emitted Horvitz-Thompson-style estimate w_hat = max(w, tau) (tau =
    the (k+1)-th priority) makes Σ w_hat an unbiased estimate of each
    source's total weight — the estimator that lets a 100 TB pipeline
    audit its own sampling.

    Shape at scale: per-group top-k is computed in TWO phases — a local
    row_number within (source, salt) buckets (salt = hash % {_PRIO_SALT},
    so a popular source sorts in {_PRIO_SALT} parallel slices, never one
    reducer) keeps k+1 candidates per slice, then the global window
    ranks only the ≤ {_PRIO_SALT}·(k+1) survivors per source. The final
    per-source tau table is an O(|sources|) broadcast. All arithmetic is
    exact-integer hashes and single IEEE divisions — bit-identical in
    the DuckDB twin, which computes the same sample with one flat
    window."""
    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    h = token_hash_wide(F.md5(F.col("text").cast("binary")))
    base = d.select(
        "doc_id",
        "source",
        "n_chars",
        (h.cast("double") / F.col("n_chars")).alias("inv_priority"),
        (h % _PRIO_SALT).alias("salt"),
    )
    w_loc = Window.partitionBy("source", "salt").orderBy("inv_priority", "doc_id")
    survivors = (
        base.withColumn("lrk", F.row_number().over(w_loc))
        .filter(F.col("lrk") <= _PRIO_K + 1)
        .drop("lrk", "salt")
    )
    w_glob = Window.partitionBy("source").orderBy("inv_priority", "doc_id")
    ranked = survivors.withColumn("rk", F.row_number().over(w_glob)).filter(
        F.col("rk") <= _PRIO_K + 1
    )
    tau = ranked.groupBy("source").agg(
        F.max(F.when(F.col("rk") == _PRIO_K + 1, F.col("inv_priority"))).alias("tau_inv")
    )
    return (
        ranked.filter(F.col("rk") <= _PRIO_K)
        .join(F.broadcast(tau), "source")
        .select(
            "source",
            "doc_id",
            "n_chars",
            "rk",
            round_pos(
                F.when(
                    F.col("tau_inv").isNull(), F.col("n_chars").cast("double")
                ).otherwise(
                    F.greatest(
                        F.col("n_chars").cast("double"), F.lit(1.0) / F.col("tau_inv")
                    )
                ),
                4,
            ).alias("w_hat"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_span_containment — asymmetric sub-document duplication (round 11)


_CONT_FREQ_CAP = 8
_CONT_MIN_SHARED = 4
_CONT_TOP = 50


@register(
    "dedup_span_containment",
    group="curation",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), s AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(toks[i:i+{_SPAN_W - 1}], ' ')) AS h
      FROM t, UNNEST(generate_series(1, len(toks) - {_SPAN_W - 1})) AS u(i)
      WHERE len(toks) >= {_SPAN_W}
    ), sz AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans FROM s GROUP BY doc_id
    ), rare AS (
      SELECT h FROM s GROUP BY h
      HAVING COUNT(*) BETWEEN 2 AND {_CONT_FREQ_CAP}
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS shared
      FROM s a JOIN rare USING (h) JOIN s b USING (h)
      WHERE a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING COUNT(*) >= {_CONT_MIN_SHARED}
    )
    SELECT p.doc_a, p.doc_b, p.shared, za.n_spans AS spans_a,
           (p.shared * 10000) // za.n_spans AS containment_bp
    FROM pairs p JOIN sz za ON za.doc_id = p.doc_a
    ORDER BY containment_bp DESC, doc_a, doc_b LIMIT {_CONT_TOP}
    """,
)
def dedup_span_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection: containment(A→B) =
    |spans(A) ∩ spans(B)| / |spans(A)| — high when document A lives
    INSIDE a larger B (boilerplate wrapping, quote-and-extend, the
    SlimPajama sub-document case), which symmetric Jaccard
    ([[dedup_ngram_jaccard]]) under-scores because B's extra content
    dilutes the union. Candidates block on shared DISTINCT 8-gram span
    hashes with a corpus-frequency cap (2..8): ubiquitous spans
    generate no pairs (the quadratic guard — a span shared by f docs
    costs f² pair rows, so the cap bounds per-span work at 64), pairs
    need >= 4 shared rare spans, and the top-50 lands in
    TakeOrderedAndProject under a total (bp, a, b) order. Only
    (doc_id, 16-byte hash) pairs ever shuffle; containment is exact
    truncating basis points.

    The span table is repartitioned on h BEFORE the shared checkpoint:
    the explode multiplies rows ~50x over the scan's file-sized
    partitions, so without it every downstream pass inherits the scan's
    parallelism (measured 19x wall for 10x docs on a one-file corpus —
    SCALING.md round 12; 2.3x after). Hash-partitioning by h also
    co-partitions the frequency rollup and BOTH self-join sides, so the
    checkpointed spans shuffle once, not three times."""
    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spans = (
        table(spark, sf_dir, "documents")
        # pre-explode spread: the raw doc rows are cheap to exchange and
        # the ~50x md5-explode then runs at full parallelism instead of
        # the scan's file-count partitioning
        .repartition(par, "doc_id")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= _SPAN_W)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, size(toks) - {_SPAN_W - 1}),"
                        f" i -> md5(cast(array_join(slice(toks, i, {_SPAN_W}), ' ') as binary)))"
                    )
                )
            ).alias("h"),
        )
        .repartition(par, "h")
        .localCheckpoint(eager=False)  # both join sides + sizes + freqs share it
    )
    sz = spans.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_spans"))
    rare = (
        spans.groupBy("h")
        .agg(F.count(F.lit(1)).alias("f"))
        .filter((F.col("f") >= 2) & (F.col("f") <= _CONT_FREQ_CAP))
        .select("h")
    )
    a = spans.join(rare, "h").select("h", F.col("doc_id").alias("doc_a"))
    b = spans.join(rare, "h").select("h", F.col("doc_id").alias("doc_b"))
    pairs = (
        a.join(b, "h")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= _CONT_MIN_SHARED)
    )
    return (
        pairs.join(sz.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .select(
            "doc_a",
            "doc_b",
            "shared",
            F.col("n_spans").alias("spans_a"),
            F.expr("shared * 10000 div n_spans").alias("containment_bp"),
        )
        .orderBy(F.desc("containment_bp"), "doc_a", "doc_b")
        .limit(_CONT_TOP)
    )


# ---------------------------------------------------------------------------
# text_ngram_novelty — per-doc novel-content fraction in ingestion order
# (round 12)


@register(
    "text_ngram_novelty",
    group="curation",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), s AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(toks[i:i+{_SPAN_W - 1}], ' ')) AS h
      FROM t, UNNEST(generate_series(1, len(toks) - {_SPAN_W - 1})) AS u(i)
      WHERE len(toks) >= {_SPAN_W}
    ), f AS (
      SELECT h, MIN(doc_id) AS first_doc FROM s GROUP BY h
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS novel_spans,
           CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                * 10000 // COUNT(*) AS BIGINT) AS novelty_bp
    FROM s JOIN f USING (h)
    GROUP BY s.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document NOVELTY in ingestion order (doc_id): the fraction of
    a document's distinct 8-gram spans whose FIRST corpus occurrence is
    this document — the marginal-contribution curve a curation pipeline
    watches to decide when a source is mined out (novelty decays toward
    boilerplate as ingestion proceeds; contrast [[dedup_span_ngram]],
    which scores duplication symmetrically with no order). First
    occurrence is an exact min(doc_id) per span hash — deterministic,
    no sketch — and only (doc_id, 16-byte hash) pairs ever shuffle:
    span hashing is map-side (same pre-explode spread as
    [[dedup_span_containment]]), first-owner is one groupBy(h), and the
    per-doc profile re-aggregates on doc_id. Truncating-bp ratio. At
    100 TB the span table IS the big object; it is touched by exactly
    two hash exchanges (h, then doc_id), never joined to itself."""
    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spans = (
        table(spark, sf_dir, "documents")
        .repartition(par, "doc_id")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= _SPAN_W)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, size(toks) - {_SPAN_W - 1}),"
                        f" i -> md5(cast(array_join(slice(toks, i, {_SPAN_W}), ' ') as binary)))"
                    )
                )
            ).alias("h"),
        )
        .repartition(par, "h")
    )
    # first-owner via a window over the h-partitioned span table: the
    # window's hash requirement matches the repartition, so this is ONE
    # exchange + an in-partition sort — not the groupBy(h) + self-join
    # form, which re-shuffles the span table twice (measured 8.5x wall
    # for 10x docs as a join; 2x as a window — SCALING.md round 12)
    first = F.min("doc_id").over(Window.partitionBy("h"))
    return (
        spans.withColumn("first_doc", first)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "novel_spans"
            ),
        )
        .withColumn("novelty_bp", F.expr("novel_spans * 10000 div n_spans"))
    )


# ---------------------------------------------------------------------------
# sample_systematic — every k-th document in content-hash order (round 12)


_SYS_K = 20  # sampling interval: keep ranks 1, K+1, 2K+1, ...
_SYS_BKT_DIV = 1 << 52  # 60-bit md5 prefix div 2^52 -> <=256 ordered buckets


@register(
    "sample_systematic",
    group="curation",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
      FROM documents
    ), r AS (
      SELECT doc_id, lang,
             CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT) AS rank
      FROM t
    )
    SELECT doc_id, lang, rank
    FROM r WHERE (rank - 1) % {_SYS_K} = 0
    """,
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic sampling — every {_SYS_K}-th document along the md5
    content-hash order (the textbook survey design: one fixed start,
    fixed stride; hash order makes the frame a pure function of content,
    so the sample is rerun/partitioning/engine-stable like
    [[sample_stratified]] and avoids the periodicity artifact that kills
    systematic sampling on naturally-ordered frames). Completes the
    sampling family: uniform ([[sample_reservoir_topk]]), stratified,
    weighted ([[sample_priority_weighted]]), balanced
    ([[sample_class_balance]]), diverse ([[sample_kcenter_diverse]]).

    The global rank over hash order is the two-phase scan
    ([[doc_global_shuffle_shard]]'s machinery with COUNT for SUM): the
    hash's top bits form ~256 ORDERED buckets, phase 1 counts per
    bucket map-side, phase 2 prefix-sums the tiny bucket table, phase 3
    is a within-bucket row_number — no SinglePartition window at any
    corpus size; the stride filter is map-side arithmetic on the rank."""
    t = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    ).withColumn("bkt", F.expr(f"h div {_SYS_BKT_DIV}"))
    bcnt = t.groupBy("bkt").agg(F.count(F.lit(1)).alias("bn"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boffs = bcnt.select(
        "bkt", F.coalesce(F.sum("bn").over(wb), F.lit(0)).alias("boff")
    )
    ww = Window.partitionBy("bkt").orderBy("h", "doc_id")
    ranked = (
        t.join(F.broadcast(boffs), "bkt")
        .select(
            "doc_id",
            "lang",
            (F.col("boff") + F.row_number().over(ww)).cast("long").alias("rank"),
        )
    )
    return ranked.where((F.col("rank") - 1) % _SYS_K == 0).select(
        "doc_id", "lang", "rank"
    )


# ---------------------------------------------------------------------------
# doc_dedup_survivorship — which source wins the keeper (round 12)


@register(
    "doc_dedup_survivorship",
    group="curation",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, md5(text) AS h FROM documents
    ), g AS (
      SELECT h, MIN(doc_id) AS keeper_id FROM t GROUP BY h
    ), j AS (
      SELECT t.source,
             CASE WHEN t.doc_id = g.keeper_id THEN 1 ELSE 0 END AS is_keeper,
             CASE WHEN t.doc_id <> g.keeper_id
                   AND t.source <> k.source THEN 1 ELSE 0 END AS lost_cross
      FROM t JOIN g USING (h)
      JOIN t k ON k.doc_id = g.keeper_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_keeper) AS BIGINT) AS n_keepers,
           CAST(SUM(is_keeper) * 10000 // COUNT(*) AS BIGINT) AS keeper_bp,
           CAST(SUM(lost_cross) AS BIGINT) AS n_lost_cross_source
    FROM j GROUP BY source
    """,
)
def doc_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivorship bias audit — per SOURCE, how many documents
    survive exact dedup as the keeper and how many are dropped in favor
    of ANOTHER source's copy: min-doc-id keeper rules (every dedup here
    uses one) silently bias the surviving mix toward whichever source
    was ingested first, and this is the readout that catches it before
    [[mix_sources_temperature]] re-weights an already-skewed corpus
    ([[source_scorecard]] profiles near-dup rates; this profiles who
    WINS the ties).

    Plan: one digest-key rollup for keepers, a join back on the digest,
    and a second tiny join to fetch the keeper's source (both sides of
    the digest join are (hash, id, source) triples — text never
    shuffles); O(sources) output."""
    t = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5(F.col("text").cast("binary")).alias("h")
    ).localCheckpoint(eager=False)  # both join sides + keeper rollup
    g = t.groupBy("h").agg(F.min("doc_id").alias("keeper_id"))
    ksrc = t.select(F.col("doc_id").alias("keeper_id"), F.col("source").alias("ksource"))
    j = (
        t.join(g, "h")
        .join(ksrc, "keeper_id")
        .select(
            "source",
            (F.col("doc_id") == F.col("keeper_id")).cast("long").alias("is_keeper"),
            (
                (F.col("doc_id") != F.col("keeper_id"))
                & (F.col("source") != F.col("ksource"))
            ).cast("long").alias("lost_cross"),
        )
    )
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("is_keeper").cast("long").alias("n_keepers"),
        F.expr("sum(is_keeper) * 10000 div count(*)").cast("long").alias("keeper_bp"),
        F.sum("lost_cross").cast("long").alias("n_lost_cross_source"),
    )


# ---------------------------------------------------------------------------
# curation_threshold_sweep — the operating curve behind a quality cutoff

_CTS_TAUS = (0, 20, 40, 60, 80, 100, 120)  # stopword permille thresholds


@register(
    "curation_threshold_sweep",
    group="curation",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 x -> x IN ('the', 'a', 'of', 'and'))) * 1000
               // len(string_split(text, ' ')) AS stop_permille
      FROM documents
    ), t AS (
      SELECT s.*, tau
      FROM s, (SELECT unnest([{", ".join(str(t) for t in _CTS_TAUS)}]) AS tau) taus
    )
    SELECT tau,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN stop_permille >= tau THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN stop_permille >= tau THEN n_tokens ELSE 0 END)
                AS BIGINT) AS kept_tokens,
           (round(CAST(SUM(CASE WHEN stop_permille >= tau THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*), 4) + 0.0) AS doc_retention_r
    FROM t GROUP BY tau
    """,
)
def curation_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-cutoff OPERATING CURVE: for each candidate stopword-
    density threshold, how many docs and tokens survive — the table a
    curation run reads to pick its gate (choose τ where the token budget
    meets the quality bar) instead of committing to one blind cutoff.
    The score is integer permille (n_stop*1000 div n_tokens), so the
    >= compare can never flap on an engine rounding difference.

    Scale: ONE scan computes the score; the sweep is a |τ|-way explode
    of scalar rows (never text) into a map-side-combined groupBy(τ) —
    |τ| × O(1) output at any corpus size. The production form folds all
    thresholds in one aggregate exactly like this, not |τ| re-scans."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "and")))
    s = d.select(
        n_tokens.alias("n_tokens"),
        F.expr(
            "size(filter(split(text, ' '), x -> x IN ('the','a','of','and')))"
            " * 1000 div size(split(text, ' '))"
        ).alias("stop_permille"),
    )
    t = s.select(
        "n_tokens",
        "stop_permille",
        F.explode(F.array(*[F.lit(tau) for tau in _CTS_TAUS])).alias("tau"),
    )
    kept = F.sum((F.col("stop_permille") >= F.col("tau")).cast("long"))
    return t.groupBy("tau").agg(
        F.count(F.lit(1)).alias("n_docs"),
        kept.alias("n_kept"),
        F.sum(
            F.when(F.col("stop_permille") >= F.col("tau"), F.col("n_tokens")).otherwise(0)
        ).cast("long").alias("kept_tokens"),
        round_pos(kept.cast("double") / F.count(F.lit(1)), 4).alias("doc_retention_r"),
    )


# ---------------------------------------------------------------------------
# text_pii_scrub — PII detection + redaction (r15)

# The corpus carries no PII (synthetic tech vocab), so PII-ish tokens are
# INJECTED deterministically from doc_id — the web_dedup derived-URL trick:
# both engines derive the identical dirty text, so detection counts and the
# scrubbed emission stay hash-exact, while the scrub kernel does real work.
_PII_TEXT_SQL = """(
      text ||
      CASE WHEN doc_id % 4 = 0
           THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail'
                || CAST(doc_id % 7 AS VARCHAR) || '.com' ELSE '' END ||
      CASE WHEN doc_id % 5 = 0
           THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           ELSE '' END ||
      CASE WHEN doc_id % 6 = 0
           THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
    )"""

# Portable patterns (same semantics in Java regex and RE2; \b, \d, {m,}
# all shared). Scrub order matters and is part of the contract: emails
# first (their domains contain dots+digits an IP pattern must never see),
# then phones, then IPs.
_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_PHONE = r"\b\d{3}-\d{4}\b"
_PII_IP = r"\b\d{1,3}(\.\d{1,3}){3}\b"


def _pii_text_col() -> Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit(" contact user"),
                d.cast("string"),
                F.lit("@mail"),
                (d % 7).cast("string"),
                F.lit(".com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(F.lit(" call 555-"), F.lpad((d % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            d % 6 == 0,
            F.concat(
                F.lit(" from 10."),
                (d % 256).cast("string"),
                F.lit(".0."),
                (d % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )


@register(
    "text_pii_scrub",
    group="curation",
    oracle=f"""
    WITH dirty AS (
      SELECT doc_id, {_PII_TEXT_SQL} AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}'))
                + len(regexp_extract_all(t, '{_PII_PHONE}'))
                + len(regexp_extract_all(t, '{_PII_IP}')) AS BIGINT) AS pii_total,
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
             '{_PII_IP}', '<IP>', 'g') AS text_scrubbed
    FROM dirty
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the scrub pass every published web
    corpus runs before release (RefinedWeb/the Pile redact emails,
    phone numbers, IP addresses): per doc, match counts per category
    and the text EMITTED with every match replaced by a typed mask
    token. Patterns are the standard portable trio (email, NANP-style
    7-digit phone, dotted-quad IP); scrub order is part of the
    contract — emails first, so an IP-ish digit run inside an email
    domain is never double-masked.

    The corpus is synthetic and PII-free, so PII is injected
    deterministically from doc_id (the derived-URL trick) — identical
    in both engines, which keeps the emission hash-exact while the
    kernel does real matching work on every row.

    Scale: pure map-side JVM regex inside one codegen stage — zero
    shuffles, zero joins at any corpus size; output is one row per doc.
    At 100 TB this is the textbook embarrassingly-parallel scan."""
    from ..tables import spread_scan

    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "text"
    )
    t = d.select("doc_id", _pii_text_col().alias("t"))
    ne = F.regexp_count("t", F.lit(_PII_EMAIL))
    np_ = F.regexp_count("t", F.lit(_PII_PHONE))
    ni = F.regexp_count("t", F.lit(_PII_IP))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("t", _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
        ),
        _PII_IP,
        "<IP>",
    )
    return t.select(
        "doc_id",
        ne.cast("long").alias("n_emails"),
        np_.cast("long").alias("n_phones"),
        ni.cast("long").alias("n_ips"),
        (ne + np_ + ni).cast("long").alias("pii_total"),
        scrubbed.alias("text_scrubbed"),
    )
