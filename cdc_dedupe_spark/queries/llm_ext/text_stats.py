"""Text quality / LM / corpus-statistics family (split from llm_ext.py r17)."""

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
# text analysis family




@register(
    "text_langid",
    group="llm-ext",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST({sql_marker_count(' the ')} + {sql_marker_count(' a ')} AS BIGINT) AS score_en,
             CAST({sql_marker_count(' data ')} + {sql_marker_count(' table ')} AS BIGINT) AS score_db
      FROM documents
    )
    SELECT doc_id, lang, score_en, score_db,
           CASE WHEN score_en >= score_db THEN 'en' ELSE 'db' END AS pred
    FROM scored
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-marker language/domain ID heuristic: count marker substrings
    per class, argmax with fixed precedence. (The synthetic corpus shares
    one vocab, so the interesting property is the exact cross-engine
    scoring, not linguistic accuracy.) Map-side only."""
    d = table(spark, sf_dir, "documents")
    score_en = (marker_count(F.col("text"), " the ") + marker_count(F.col("text"), " a ")).cast("long")
    score_db = (
        marker_count(F.col("text"), " data ") + marker_count(F.col("text"), " table ")
    ).cast("long")
    return d.select(
        "doc_id",
        "lang",
        score_en.alias("score_en"),
        score_db.alias("score_db"),
        F.when(score_en >= score_db, "en").otherwise("db").alias("pred"),
    )




@register(
    "text_quality",
    group="llm-ext",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             length(text) AS n_chars_txt,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 x -> x IN ('the', 'a', 'of', 'and'))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars_txt, n_tokens, n_stop,
           CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
           CAST(n_chars_txt AS DOUBLE) / n_tokens AS avg_token_span
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring signals: length, token count, stopword ratio,
    average token span — the filters a pretraining pipeline applies before
    dedupe. All built-in expressions."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_stop = F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "and")))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_txt"),
        F.size(toks).alias("n_tokens"),
        n_stop.alias("n_stop"),
        (n_stop.cast("double") / F.size(toks)).alias("stop_ratio"),
        (F.length("text").cast("double") / F.size(toks)).alias("avg_token_span"),
    )




@register(
    "text_token_count",
    group="llm-ext",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z0-9]+')) AS re_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, regex word tokens, and
    the chars/4 BPE heuristic."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).alias("re_tokens"),
        F.ceil(F.length("text") / 4.0).alias("approx_bpe_tokens"),
    )




@register(
    "text_fingerprint",
    group="llm-ext",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(string_split(text, ' '),
                 t -> (length(t) * 7 + ascii(t))::BIGINT)),
             (a, b) -> (a * 31 + b) % 1000000007) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint over the token stream (mod 1e9+7) —
    order-sensitive content hash for shift-detection, one fold, map-side."""
    d = table(spark, sf_dir, "documents")
    fp = F.aggregate(
        F.split("text", " "),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + (F.length(t) * 7 + F.ascii(t)).cast("long")) % 1000000007,
    )
    return d.select("doc_id", fp.alias("fp"))




def _rep_metrics(toks: Column):
    """Shared repetition metrics (text_repetition + pipeline_pretrain_docs):
    returns (n_tokens, n_distinct, top_count, n_2grams, n_distinct_2grams,
    keep). The keep flag compares scaled integers only."""
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    # Max token multiplicity via ONE aggregate fold over the sorted array
    # (longest equal-run), O(n log n) per doc — the transform(distinct)
    # × filter form is O(n_distinct · n) and turns long documents into
    # per-row quadratic hot spots (round-8 review). A single fold matters:
    # expressions referenced inside other HOF lambdas are re-inlined per
    # element (a position-index formulation re-evaluated array_sort per
    # element and was ~70x slower at sf0.1); aggregate() evaluates its
    # input array exactly once. Same VALUE as the oracle's quadratic
    # formula, so parity holds.
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def _merge(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top_count = F.aggregate(F.array_sort(toks), zero, _merge, lambda acc: acc["best"])
    n_2grams = F.when(n >= 2, n - 1).otherwise(0)
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    nd2 = F.size(F.array_distinct(grams))
    keep = (
        (n_distinct * 100 >= n * 45)
        & (top_count * 100 <= n * 12)
        & ((n_2grams - nd2) * 100 <= n_2grams * 5)
    )
    return n, n_distinct, top_count, n_2grams, nd2, keep




@register(
    "text_repetition",
    group="llm-ext",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct,
             list_max(list_transform(list_distinct(toks),
                 tk -> len(list_filter(toks, x -> x = tk)))) AS top_count,
             CASE WHEN len(toks) >= 2 THEN len(toks) - 1 ELSE 0 END AS n_2grams,
             CASE WHEN len(toks) >= 2 THEN
               len(list_distinct(list_transform(generate_series(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i + 1])))
             ELSE 0 END AS n_distinct_2grams
      FROM t
    )
    SELECT doc_id, n_tokens, n_distinct, top_count,
           (round(CAST(n_distinct AS DOUBLE) / n_tokens, 4) + 0.0) AS type_token_r,
           (round(CAST(top_count AS DOUBLE) / n_tokens, 4) + 0.0) AS top_token_r,
           CASE WHEN n_2grams > 0
                THEN (round(CAST(n_2grams - n_distinct_2grams AS DOUBLE) / n_2grams, 4) + 0.0)
                ELSE CAST(0.0 AS DOUBLE) END AS dup_2gram_r,
           CAST(CASE WHEN n_distinct * 100 >= 45 * n_tokens
                      AND top_count * 100 <= 12 * n_tokens
                      AND (n_2grams - n_distinct_2grams) * 100 <= 5 * n_2grams
                     THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM m
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: type-token ratio, top-token
    fraction, duplicate-2-gram fraction, and the keep/drop decision a
    pretraining pipeline applies before dedupe. All per-document
    higher-order-function work — map-side, zero shuffle at any scale. The
    keep flag compares scaled *integers* (n_distinct*100 >= 45*n_tokens),
    so thresholding never touches a float; the reported ratios are
    integer-ratio doubles rounded per the repo determinism rule.
    spread_scan widens the one-file local corpus before the HOF pass
    (no-op on a wide scan; r13 honest-bench pass)."""
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id")
    toks = F.split("text", " ")
    n, n_distinct, top_count, n_2grams, nd2, keep = _rep_metrics(toks)
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        top_count.alias("top_count"),
        round_pos(n_distinct.cast("double") / n, 4).alias("type_token_r"),
        round_pos(top_count.cast("double") / n, 4).alias("top_token_r"),
        F.when(n_2grams > 0, round_pos((n_2grams - nd2).cast("double") / n_2grams, 4))
        .otherwise(F.lit(0.0))
        .alias("dup_2gram_r"),
        keep.cast("int").alias("keep"),
    )




@register(
    "text_scrub_numeric",
    group="llm-ext",
    oracle="""
    SELECT event_id,
           regexp_replace(props, '[0-9]+', '#', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS INTEGER) AS n_hits
    FROM events
    """,
)
def text_scrub_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction scrubbing: replace every numeric run in the event props
    payload and count the hits — the PII-masking shape of a training-data
    cleaning pass (the pattern is a stand-in; the portable-regex
    discipline is the point: '[0-9]+' means the same thing in Java regex
    and RE2). Pure map-side string work, zero shuffle."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "#").alias("scrubbed"),
        F.regexp_count("props", F.lit("[0-9]+")).cast("int").alias("n_hits"),
    )




@register(
    "text_commonness",
    group="llm-ext",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), cf AS (
      SELECT tok, COUNT(*) AS corpus_n FROM toks GROUP BY tok
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(cf.corpus_n) AS BIGINT) AS sum_corpus_n,
           (round(CAST(SUM(cf.corpus_n) AS DOUBLE) / COUNT(*), 4) + 0.0)
             AS mean_corpus_freq
    FROM toks t JOIN cf USING (tok)
    GROUP BY t.doc_id
    """,
)
def text_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean corpus frequency of its tokens — the inverse
    'surprisal' quality signal (boilerplate scores high, rare-token noise
    scores low) a pretraining pipeline thresholds alongside the Gopher
    filters. Integer sum/count with one rounded division, so the oracle is
    exact.

    Scale shape: corpus term counts come from one partial-aggregated
    shuffle of the token stream (O(vocab) rows out), joined back on the
    high-cardinality token key, then one per-doc aggregate — the same
    two-exchange df-join shape as text_tfidf, no driver collect, nothing
    quadratic."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    cf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("corpus_n"))
    return (
        toks.join(cf, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("corpus_n").alias("sum_corpus_n"),
            round_pos(
                F.sum("corpus_n").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_corpus_freq"),
        )
    )




@register(
    "pipeline_quality_gate",
    group="llm-ext",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 x -> x IN ('the', 'a', 'of', 'and'))) AS n_stop,
             len(list_distinct(string_split(text, ' '))) AS n_types
      FROM documents
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END)
              + (CASE WHEN n_tokens > 2000 THEN 2 ELSE 0 END)
              + (CASE WHEN n_stop * 20 < n_tokens THEN 4 ELSE 0 END)
              + (CASE WHEN n_types * 2 < n_tokens THEN 8 ELSE 0 END)
             AS BIGINT) AS reasons,
           CAST(CASE WHEN n_tokens >= 20 AND n_tokens <= 2000
                      AND n_stop * 20 >= n_tokens AND n_types * 2 >= n_tokens
                     THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM t
    """,
)
def pipeline_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed quality gate with per-rule ATTRIBUTION (the
    classifier-style filter a curation pipeline runs before dedupe, with
    the audit trail reviewers need): four Gopher-flavored rules — too
    short (<20 tokens), too long (>2000), low stopword density
    (<5%, via the integer cross-multiply n_stop*20 < n_tokens — no
    float thresholds anywhere), low type-token ratio (<0.5, repetition
    proxy) — folded into a reasons BITMASK plus the final keep flag, so
    a dropped document says exactly why and rule firing rates are one
    groupBy away.

    Pure map-side single pass (token split computed once per row via the
    shared subtree; zero Exchange, pinned with the text_quality family)
    — at 100 TB this is scan-rate filtering, and the gate composes in
    front of the dedupe/mix stages exactly as pipeline_curation_mix's
    span gate does."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "and"))).alias("n_stop"),
        F.size(F.array_distinct(toks)).alias("n_types"),
    )
    r1 = (F.col("n_tokens") < 20).cast("long")
    r2 = (F.col("n_tokens") > 2000).cast("long") * 2
    r3 = (F.col("n_stop") * 20 < F.col("n_tokens")).cast("long") * 4
    r4 = (F.col("n_types") * 2 < F.col("n_tokens")).cast("long") * 8
    reasons = r1 + r2 + r3 + r4
    return t.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        reasons.alias("reasons"),
        (reasons == 0).cast("int").alias("keep"),
    )




# ---------------------------------------------------------------------------
# text_lm_bigram — corpus bigram-LM fluency score (perplexity proxy)


_LMBG_ORACLE = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), bg AS (
      SELECT doc_id, string_split(bgs, ' ')[1] AS w1, string_split(bgs, ' ')[2] AS w2
      FROM (
        SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i + 1])) AS bgs
        FROM t WHERE len(toks) >= 2
      )
    ), c2 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n2 FROM bg GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, CAST(SUM(n2) AS BIGINT) AS n1 FROM c2 GROUP BY 1
    ), scored AS (
      SELECT bg.doc_id,
             CAST(floor(1000000.0 * c2.n2 / c1.n1) AS BIGINT) AS s
      FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(floor(SUM(s) / count(*)) AS BIGINT) AS lm_score_ppm
    FROM scored GROUP BY doc_id
    """




@register("text_lm_bigram", group="llm-ext", oracle=_LMBG_ORACLE)
def text_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-trained bigram language-model fluency score (round
    10): train P(w2|w1) = c(w1 w2)/c(w1 ·) on the whole corpus's
    whitespace bigrams, then score each document by the mean conditional
    probability of its own bigrams — the classic cheap perplexity proxy
    that flags boilerplate (score near 1e6: every transition is the
    corpus's favorite) and gibberish (score near 0: transitions the
    corpus never makes) without any external model, the same shape as
    CCNet's KenLM filter with the LM replaced by the corpus itself.

    Determinism: probabilities are floor(1e6·n2/n1) per bigram instance
    and floor(Σs/n) per document — exact-integer inputs, one IEEE
    division each, bit-identical in DuckDB.

    Shape at scale: bigram extraction is a map-side explode (O(tokens)
    rows, the text_tfidf shape); the model tables c2/c1 are partial
    aggregates bounded by the whitespace vocabulary (V and V² upper
    bounds, Heaps-law-sublinear in practice) and are BROADCAST back onto
    the instance stream — the scoring join never shuffles the corpus.
    The contract is the standard n-gram-LM one: the model must fit a
    node; web-scale deployments prune the vocabulary first (KenLM's
    min-count pruning) before the broadcast, which caps both tables
    regardless of corpus size."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    pairs = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda p: p["w2"].isNotNull(),
    )
    bg = d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    # r20: c2 feeds its own broadcast AND c1's (broadcast builds re-run
    # their subtree — each re-exploded the corpus). Checkpoint the
    # Heaps'-bounded bigram table once; c1 then folds the materialized
    # RDD instead of re-aggregating the explode.
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n2"))
        .localCheckpoint(eager=False)
    )
    c1 = c2.groupBy("w1").agg(F.sum("n2").cast("long").alias("n1"))
    scored = (
        bg.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .select(
            "doc_id",
            F.floor(F.lit(1000000.0) * F.col("n2") / F.col("n1"))
            .cast("long")
            .alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.floor(F.sum("s") / F.count(F.lit(1))).cast("long").alias("lm_score_ppm"),
    )




# --- text_keyword_rake — RAKE keyword extraction (round 12) ------------------


_RAKE_STOPS = ("the", "a", "of", "and")


_RAKE_TOPK = 20




_RAKE_ORACLE = f"""
    WITH tk AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ), ph AS (
      SELECT doc_id, word, pos,
             CASE WHEN word IN {str(tuple(_RAKE_STOPS))} THEN 1 ELSE 0 END AS stop,
             SUM(CASE WHEN word IN {str(tuple(_RAKE_STOPS))} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id
      FROM tk
    ), nw AS (
      SELECT doc_id, word, phrase_id,
             CAST(COUNT(*) OVER (PARTITION BY doc_id, phrase_id) AS BIGINT) AS phrase_len
      FROM ph WHERE stop = 0 AND word <> ''
    ), sc AS (
      SELECT word,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(phrase_len) AS BIGINT) AS degree
      FROM nw GROUP BY word
    )
    SELECT word, freq, degree,
           CAST(degree * 1000000 // freq AS BIGINT) AS score_ppm
    FROM sc
    ORDER BY score_ppm DESC, word
    LIMIT {_RAKE_TOPK}
    """




@register("text_keyword_rake", group="llm-ext", oracle=_RAKE_ORACLE)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus: phrases
    are maximal stopword-free token runs, each word scores degree/freq
    where degree sums the lengths of every phrase containing it (words
    that live in LONG content phrases beat equally-frequent words that
    appear alone) — the classic unsupervised keyword scorer, next to
    [[text_pmi_bigrams]]' collocation view and [[text_tfidf]]'s per-doc
    weighting. Scores are exact integer ppm (degree·10⁶ div freq), top-20
    by (score, word).

    Plan: tokens posexplode map-side; the phrase segmentation is a
    cumulative stopword count — one window per doc_id partition, then the
    phrase-length count window CO-PARTITIONS on (doc_id, phrase_id)
    under the same exchange; per-word totals are one map-side-combined
    agg on the word key and the top-k is TakeOrderedAndProject. One
    doc_id exchange + one word-key exchange at any corpus size; the
    stopword list is a literal (broadcast config at 100 TB)."""
    wd = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tk = (
        table(spark, sf_dir, "documents")
        # pre-explode spread (the _span_profile discipline, SCALING.md):
        # the doc_id hash exchange moves raw documents (cheap), the ~50x
        # token explode then runs at full parallelism instead of the
        # one-file scan's partitioning, and BOTH doc windows reuse the
        # partitioning — measured 21x wall for 10x docs before, 1.9x after
        .repartition(par, "doc_id")
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .withColumn("stop", F.col("word").isin(*_RAKE_STOPS).cast("long"))
    )
    ph = tk.withColumn("phrase_id", F.sum("stop").over(wd))
    nw = ph.where((F.col("stop") == 0) & (F.col("word") != "")).withColumn(
        "phrase_len",
        F.count(F.lit(1)).over(Window.partitionBy("doc_id", "phrase_id")).cast("long"),
    )
    sc = nw.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("phrase_len").cast("long").alias("degree"),
    )
    return (
        sc.select(
            "word",
            "freq",
            "degree",
            F.expr("degree * 1000000 div freq").cast("long").alias("score_ppm"),
        )
        .orderBy(F.col("score_ppm").desc(), "word")
        .limit(_RAKE_TOPK)
    )




# --- ml_score_lift_deciles — score-vs-gate calibration curve (round 12) -----


# Composed oracle: decile the LM fluency score's value domain, join the
# quality gate's keep flag, report keep rate per decile. Reuses both
# queries' oracles as CTEs (the [[graph_cc_sizes]] composition pattern).
_LIFT_ORACLE = f"""
    WITH lm AS ({_LMBG_ORACLE}),
    gate AS ({{_QG_ORACLE}}),
    j AS (
      SELECT lm.doc_id, lm.lm_score_ppm, gate.keep
      FROM lm JOIN gate USING (doc_id)
    ), v AS (
      SELECT lm_score_ppm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(keep) AS BIGINT) AS n_keep
      FROM j GROUP BY 1
    ), c AS (
      SELECT *,
             CAST(SUM(n) OVER (ORDER BY lm_score_ppm
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(SUM(n) OVER () AS BIGINT) AS total
      FROM v
    )
    SELECT CAST((cum - n) * 10 // total AS BIGINT) AS decile,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(SUM(n_keep) AS BIGINT) AS n_keep,
           CAST(SUM(n_keep) * 10000 // SUM(n) AS BIGINT) AS keep_bp,
           MIN(lm_score_ppm) AS score_min,
           MAX(lm_score_ppm) AS score_max
    FROM c GROUP BY 1
    """




def _lift_oracle() -> str:
    from ..registry import REGISTRY as _R

    return _LIFT_ORACLE.format(_QG_ORACLE=_R["pipeline_quality_gate"].oracle)




@register("ml_score_lift_deciles", group="llm-ext", oracle=_lift_oracle())
def ml_score_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-calibration / lift curve: the corpus sliced into DECILES of
    the bigram-LM fluency score ([[text_lm_bigram]]) with the
    quality-gate pass rate ([[pipeline_quality_gate]]) per slice — the
    reliability diagram every score-based curation pipeline draws before
    trusting a threshold (a monotone keep-rate curve means the cheap LM
    score predicts the expensive gate; a flat one means it's noise).
    Decile boundaries come from the score's VALUE-DOMAIN rollup — a
    cumulative window over O(distinct scores) rows (bounded by the ppm
    scale, the [[stats_ks_two_sample]] discipline), never a global sort
    of documents; ties share a decile deterministically (the first
    occurrence's 0-based rank div n/10).

    Composed from two declared queries (their plans fuse: the corpus
    scans twice — once per signal — then joins on doc_id); exact
    integer keep rates in bp."""
    lm = text_lm_bigram(spark, sf_dir).select("doc_id", "lm_score_ppm")
    gate = pipeline_quality_gate(spark, sf_dir).select("doc_id", "keep")
    j = lm.join(gate, "doc_id")
    v = j.groupBy("lm_score_ppm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("keep").cast("long").alias("n_keep")
    )
    wc = Window.orderBy("lm_score_ppm").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    c = v.select(
        "lm_score_ppm",
        "n",
        "n_keep",
        F.sum("n").over(wc).alias("cum"),
        F.sum("n").over(wt).alias("total"),
    )
    return (
        c.groupBy(F.expr("(cum - n) * 10 div total").cast("long").alias("decile"))
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.sum("n_keep").cast("long").alias("n_keep"),
            F.expr("sum(n_keep) * 10000 div sum(n)").cast("long").alias("keep_bp"),
            F.min("lm_score_ppm").alias("score_min"),
            F.max("lm_score_ppm").alias("score_max"),
        )
    )




def _dec2(c: Column) -> Column:
    """DECIMAL(38,0) cast (the stats_ml._dec twin, local to llm_ext)."""
    return c.cast("decimal(38,0)")




# --- text_js_divergence — per-source drift vs the corpus (round 12) ----------


_JSD_ORACLE = """
    WITH tk AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ), st AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
      FROM tk WHERE tok <> '' GROUP BY 1, 2
    ), stot AS (
      SELECT source, CAST(SUM(c_st) AS BIGINT) AS t_s FROM st GROUP BY 1
    ), ct AS (
      SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1
    ), tot AS (SELECT CAST(SUM(c_st) AS BIGINT) AS t FROM st),
    terms AS (
      SELECT st.source,
             CAST(round((CAST(st.c_st AS DOUBLE) / s.t_s)
               * ln((CAST(st.c_st AS DOUBLE) / s.t_s)
                    / ((CAST(st.c_st AS DOUBLE) / s.t_s
                        + CAST(ct.c_t AS DOUBLE) / tot.t) / 2))
               * 1000000) AS BIGINT) AS kl_p_unat,
             CAST(round((CAST(ct.c_t AS DOUBLE) / tot.t)
               * ln((CAST(ct.c_t AS DOUBLE) / tot.t)
                    / ((CAST(st.c_st AS DOUBLE) / s.t_s
                        + CAST(ct.c_t AS DOUBLE) / tot.t) / 2))
               * 1000000) AS BIGINT) AS kl_q_unat,
             ct.c_t
      FROM st JOIN stot s USING (source) JOIN ct USING (tok), tot
    ), agg AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_vocab,
             CAST(SUM(kl_p_unat) AS BIGINT) AS sum_p,
             CAST(SUM(kl_q_unat) AS BIGINT) AS sum_q,
             CAST(SUM(c_t) AS BIGINT) AS covered
      FROM terms GROUP BY source
    )
    SELECT a.source, s.t_s AS n_tokens, a.n_vocab,
           CAST(GREATEST(0, a.sum_p + a.sum_q
                 + CAST(round(ln(2.0) * 1000000
                     * (CAST(tot.t - a.covered AS DOUBLE) / tot.t)) AS BIGINT))
                // 2 AS BIGINT) AS jsd_unat
    FROM agg a JOIN stot s USING (source), tot
    """




@register("text_js_divergence", group="llm-ext", oracle=_JSD_ORACLE)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence of each SOURCE's unigram distribution
    from the whole corpus — the source-drift monitor a curation pipeline
    runs per ingest (a source whose JSD jumps changed its content mix;
    JSD is symmetric and bounded by ln 2, unlike raw KL). Each
    p·ln(p/m) term is snapped ONCE to an exact BIGINT micro-nat (the
    [[ml_nb_classify]] discipline) so per-source sums are exact integer
    arithmetic; the corpus-side mass of tokens ABSENT from the source
    folds to the closed form ln 2·(1 − Σq_present) — one double chain —
    instead of exploding |vocab| rows per source.

    Shuffles: one (source, token) rollup, a token-key join against the
    Heaps'-bounded corpus counts (broadcastable), one source rollup.
    Never raw text after the first scan."""
    tk = table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    st = tk.groupBy("source", "tok").agg(F.count(F.lit(1)).cast("long").alias("c_st"))
    st = st.localCheckpoint(eager=False)  # source totals + corpus counts + terms
    stot = st.groupBy("source").agg(F.sum("c_st").alias("t_s"))
    ct = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    tot = st.agg(F.sum("c_st").alias("t"))
    j = (
        st.join(F.broadcast(stot), "source")
        .join(ct, "tok")
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("c_st").cast("double") / F.col("t_s")
    q = F.col("c_t").cast("double") / F.col("t")
    m = (p + q) / 2
    terms = j.select(
        "source",
        F.round(p * F.log(p / m) * 1000000).cast("long").alias("kl_p_unat"),
        F.round(q * F.log(q / m) * 1000000).cast("long").alias("kl_q_unat"),
        "c_t",
    )
    agg = terms.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
        F.sum("kl_p_unat").alias("sum_p"),
        F.sum("kl_q_unat").alias("sum_q"),
        F.sum("c_t").alias("covered"),
    )
    import math

    return (
        agg.join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("t_s").cast("long").alias("n_tokens"),
            "n_vocab",
            # greatest(0, ...) on both sides (ADVICE r12): true JSD >= 0, but
            # each term is independently rounded to micro-nats, so a source
            # nearly identical to the corpus could sum to a small negative —
            # where Spark's truncating `div 2` and DuckDB's flooring `// 2`
            # disagree (-1 div 2 = 0 vs -1 // 2 = -1). Clamping removes the
            # divergent domain entirely.
            F.expr(
                f"CAST(GREATEST(0, sum_p + sum_q + CAST(round({math.log(2.0)!r}"
                " * 1000000 * (CAST(t - covered AS DOUBLE) / t)) AS BIGINT))"
                " div 2 AS BIGINT)"
            ).alias("jsd_unat"),
        )
    )




# --- text_burstiness — token overdispersion profile (round 12) ---------------


_BURST_MIN_DOCS = 10


_BURST_TOPK = 20




_BURST_ORACLE = f"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), dt AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM tk WHERE tok <> '' GROUP BY 1, 2
    ), nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dt),
    m AS (
      SELECT tok,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(c) AS BIGINT) AS s1,
             CAST(SUM(c * c) AS BIGINT) AS s2
      FROM dt GROUP BY tok
    )
    SELECT tok, df, s1 AS total_count,
           (round((CAST(nd.n_docs AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                  / (CAST(nd.n_docs AS DOUBLE) * s1), 6) + 0.0) AS burstiness
    FROM m, nd
    WHERE df >= {_BURST_MIN_DOCS}
    ORDER BY burstiness DESC, tok
    LIMIT {_BURST_TOPK}
    """




@register("text_burstiness", group="llm-ext", oracle=_BURST_ORACLE)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness — the variance-to-mean ratio (index of
    dispersion) of per-document counts, zeros included: content words
    BURST (appear many times in few docs — VMR >> 1), function words
    spread Poisson-like (VMR ≈ 1). The corpus-linguistics signal behind
    keyword weighting that raw frequency misses ([[text_keyword_rake]]
    scores within-phrase roles; this scores cross-document clumping).
    Top-{k} bursty tokens with document frequency >= {mind}.

    Zeros never materialize: with D docs, Σc and Σc² over PRESENT
    (doc, token) rows give VMR = (D·Σc² − (Σc)²)/(D·Σc) exactly — the
    moments fold zeros in algebraically. One (doc, token) rollup, one
    token rollup, exact BIGINT moments, one double chain per token,
    TakeOrderedAndProject."""
    dt = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)  # doc total + token moments share it
    )
    nd = dt.agg(F.countDistinct("doc_id").alias("n_docs"))
    m = dt.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    return (
        m.where(F.col("df") >= _BURST_MIN_DOCS)
        .crossJoin(F.broadcast(nd))
        .select(
            "tok",
            "df",
            F.col("s1").cast("long").alias("total_count"),
            round_pos(
                (
                    F.col("n_docs").cast("double") * F.col("s2")
                    - F.col("s1").cast("double") * F.col("s1")
                )
                / (F.col("n_docs").cast("double") * F.col("s1")),
                6,
            ).alias("burstiness"),
        )
        .orderBy(F.col("burstiness").desc(), "tok")
        .limit(_BURST_TOPK)
    )




text_burstiness.__doc__ = text_burstiness.__doc__.format(
    k=_BURST_TOPK, mind=_BURST_MIN_DOCS
)




# --- ml_score_auc — ROC AUC of the fluency score vs the gate (round 12) -----


_AUC_ORACLE = f"""
    WITH lm AS ({_LMBG_ORACLE}),
    gate AS ({{_QG_ORACLE}}),
    j AS (
      SELECT lm.lm_score_ppm AS v, gate.keep FROM lm JOIN gate USING (doc_id)
    ), g AS (
      SELECT v, CAST(SUM(keep) AS BIGINT) AS a,
             CAST(SUM(1 - keep) AS BIGINT) AS b
      FROM j GROUP BY v
    ), w AS (
      SELECT v, a, b,
             CAST(COALESCE(SUM(a + b) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS below
      FROM g
    ), m AS (
      SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n0,
             CAST(SUM(a * (2 * below + a + b + 1)) AS BIGINT) AS r1_x2
      FROM w
    )
    SELECT n1 AS n_pos, n0 AS n_neg,
           CASE WHEN n1 > 0 AND n0 > 0 THEN
             (round(CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE)
                    / (2.0 * CAST(n1 AS DOUBLE) * n0), 6) + 0.0)
           END AS auc
    FROM m
    """




def _auc_oracle() -> str:
    from ..registry import REGISTRY as _R

    return _AUC_ORACLE.format(_QG_ORACLE=_R["pipeline_quality_gate"].oracle)




@register("ml_score_auc", group="llm-ext", oracle=_auc_oracle())
def ml_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the bigram-LM fluency score predicting the quality
    gate — the threshold-free ranking-quality number behind
    [[ml_score_lift_deciles]]' curve (AUC 0.5 = the cheap score is
    noise; the lift curve shows WHERE it separates, AUC says WHETHER).
    Computed as the Mann–Whitney statistic over the score VALUE-DOMAIN
    rollup with exact DOUBLED midranks for ties (2·midrank = 2·below +
    (a+b) + 1 — the [[stats_mann_whitney]] machinery): AUC = (2R₁ −
    n₁(n₁+1)) / (2n₁n₀), exact BIGINTs until ONE final division. The
    probabilistic identity AUC = P(score⁺ > score⁻) + ½P(tie) comes
    free from the midrank treatment — no pair enumeration, ever.

    Value-domain cumulative over O(distinct scores) rows; one output
    row at any corpus size."""
    lm = text_lm_bigram(spark, sf_dir).select("doc_id", F.col("lm_score_ppm").alias("v"))
    gate = pipeline_quality_gate(spark, sf_dir).select("doc_id", "keep")
    g = (
        lm.join(gate, "doc_id")
        .groupBy("v")
        .agg(
            F.sum("keep").cast("long").alias("a"),
            F.sum(1 - F.col("keep")).cast("long").alias("b"),
        )
    )
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    w = g.select(
        "a",
        "b",
        F.coalesce(F.sum(F.col("a") + F.col("b")).over(wb), F.lit(0)).alias("below"),
    )
    m = w.agg(
        F.sum("a").alias("n1"),
        F.sum("b").alias("n0"),
        F.sum(
            F.col("a") * (2 * F.col("below") + F.col("a") + F.col("b") + 1)
        ).alias("r1_x2"),
    )
    # Degenerate-class guard (ADVICE r12): if the gate keeps all docs or
    # drops all docs, n1·n0 = 0 and the engines disagree on x/0 (NULL vs
    # NaN) — AUC is undefined there, so both sides return NULL, matching
    # the stats_runs_test / stats_power_mde denominator discipline.
    return m.select(
        F.col("n1").cast("long").alias("n_pos"),
        F.col("n0").cast("long").alias("n_neg"),
        F.when(
            (F.col("n1") > 0) & (F.col("n0") > 0),
            round_pos(
                (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)).cast("double")
                / (2.0 * F.col("n1").cast("double") * F.col("n0")),
                6,
            ),
        ).alias("auc"),
    )




# --- text_heaps_law_curve — vocabulary growth audit (round 12) ---------------


_HEAPS_BUCKETS = 10




_HEAPS_ORACLE = f"""
    WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), t AS (
      SELECT doc_id, tok FROM tk WHERE tok <> ''
    ), firsts AS (
      SELECT tok, MIN(doc_id) AS first_doc FROM t GROUP BY tok
    ), vb AS (
      SELECT CAST(f.first_doc * {_HEAPS_BUCKETS} // nd.n_docs AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS new_vocab
      FROM firsts f, nd GROUP BY 1
    ), tb AS (
      SELECT CAST(t.doc_id * {_HEAPS_BUCKETS} // nd.n_docs AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM t, nd GROUP BY 1
    )
    SELECT tb.bucket,
           CAST(SUM(tb.n_tokens) OVER w AS BIGINT) AS tokens_cum,
           CAST(SUM(COALESCE(vb.new_vocab, 0)) OVER w AS BIGINT) AS vocab_cum,
           CAST(COALESCE(vb.new_vocab, 0) * 1000000
                // tb.n_tokens AS BIGINT) AS new_vocab_ppm
    FROM tb LEFT JOIN vb USING (bucket)
    WINDOW w AS (ORDER BY tb.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """




@register("text_heaps_law_curve", group="llm-ext", oracle=_HEAPS_ORACLE)
def text_heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve — cumulative distinct vocabulary
    vs cumulative tokens at ten corpus checkpoints, plus the per-decile
    NEW-vocab rate (ppm of that decile's tokens): the empirical check
    behind every "Heaps'-bounded, therefore broadcastable" claim this
    repo's vocab joins make ([[text_vocab_unk]], [[ml_nb_classify]],
    [[text_pmi_bigrams]]...). A flattening new-vocab rate certifies the
    bound; a flat-line rate (vocab ∝ tokens) would mean those broadcasts
    grow linearly and the plans need rethinking — measure, don't assume.

    Cumulative DISTINCT without a quadratic re-scan: each token
    attributes to its FIRST document's checkpoint bucket (min(doc_id)
    per token — the [[text_ngram_novelty]] first-owner trick), so the
    running vocabulary is a cumulative sum over ten bucket rows. One
    token-key rollup + one tiny windowed table."""
    nd_row = table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    t = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .localCheckpoint(eager=False)  # firsts + token buckets share it
    )
    firsts = t.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    vb = (
        firsts.crossJoin(F.broadcast(nd_row))
        .groupBy(
            F.expr(f"first_doc * {_HEAPS_BUCKETS} div n_docs").cast("long").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("new_vocab"))
    )
    tb = (
        t.crossJoin(F.broadcast(nd_row))
        .groupBy(
            F.expr(f"doc_id * {_HEAPS_BUCKETS} div n_docs").cast("long").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    )
    wc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    j = tb.join(vb, "bucket", "left").select(
        "bucket",
        "n_tokens",
        F.coalesce("new_vocab", F.lit(0).cast("long")).alias("new_vocab"),
    )
    return j.select(
        "bucket",
        F.sum("n_tokens").over(wc).cast("long").alias("tokens_cum"),
        F.sum("new_vocab").over(wc).cast("long").alias("vocab_cum"),
        F.expr("new_vocab * 1000000 div n_tokens").cast("long").alias("new_vocab_ppm"),
    )




# ---------------------------------------------------------------------------
# text_perplexity_buckets — CCNet-style head/middle/tail corpus split


_PPLB_ORACLE = f"""
    WITH sc AS ({_LMBG_ORACLE}),
    s AS (
      SELECT sc.doc_id, d.lang, sc.lm_score_ppm
      FROM sc JOIN documents d USING (doc_id)
    ), h AS (
      SELECT lang, lm_score_ppm, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM s GROUP BY 1, 2
    ), c AS (
      SELECT lang, lm_score_ppm,
             CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY lm_score_ppm)
                  AS BIGINT) AS cum
      FROM h
    ), nl AS (
      SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n FROM h GROUP BY 1
    ), t AS (
      SELECT c.lang,
             MIN(CASE WHEN cum >= (n + 2) // 3 THEN lm_score_ppm END) AS t1,
             MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN lm_score_ppm END) AS t2
      FROM c JOIN nl USING (lang) GROUP BY c.lang
    )
    SELECT s.doc_id, s.lang, s.lm_score_ppm,
           CASE WHEN s.lm_score_ppm <= t.t1 THEN 'tail'
                WHEN s.lm_score_ppm <= t.t2 THEN 'middle'
                ELSE 'head' END AS ppl_bucket
    FROM s JOIN t USING (lang)
    """




@register("text_perplexity_buckets", group="llm-ext", oracle=_PPLB_ORACLE)
def text_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail corpus split (Wenzek et al. 2020) on the
    self-trained bigram LM: every document is scored by
    [[text_lm_bigram]]'s mean conditional-probability fluency score (the
    KenLM-perplexity stand-in; HIGH score = fluent), then assigned to
    the per-LANGUAGE fluency tercile — 'head' (most fluent third,
    pretraining-grade), 'middle', 'tail' (gibberish/boilerplate
    candidates). Buckets are threshold-based, not rank-based: t1/t2 are
    the ceil(n/3)-th and ceil(2n/3)-th smallest scores per language,
    and ties at a threshold all fall LOW (a run of equal scores never
    straddles a bucket boundary) — integer comparisons, exact oracle.

    Scale shape — the reason this is not `ntile(3) OVER (PARTITION BY
    lang ORDER BY score)`: a per-language ranking window totally ORDERS
    each language's documents, and web corpora are language-skewed
    (~half English), so one partition sorts half the corpus. Instead
    the score domain is bounded integer ppm (0..1e6), so the terciles
    come from a (lang, score) HISTOGRAM: one partial-agg shuffle of at
    most |langs|x1e6 tiny rows, a cumulative window over that bounded
    table, and two MIN(CASE) threshold picks; documents themselves are
    bucketed map-side against the broadcast 2-row-per-lang threshold
    table. No per-document sort at any corpus size. The LM model join
    inherits text_lm_bigram's broadcast contract."""
    sc = text_lm_bigram(spark, sf_dir).select("doc_id", "lm_score_ppm")
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    # r20 (guide §2.4/§5): the scored frame feeds BOTH the threshold
    # build (a broadcast, whose build re-executes its whole subtree) and
    # the final bucket join — without lineage truncation the entire
    # text_lm_bigram scoring pipeline ran twice per query. One lazy
    # localCheckpoint of the 3-scalar-per-doc frame halves the LM work
    # (within-query materialization, the minhash-band discipline).
    s = sc.join(d, "doc_id").localCheckpoint(eager=False)
    h = s.groupBy("lang", "lm_score_ppm").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wc = (
        Window.partitionBy("lang")
        .orderBy("lm_score_ppm")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = h.select("lang", "lm_score_ppm", F.sum("cnt").over(wc).alias("cum"))
    nl = h.groupBy("lang").agg(F.sum("cnt").alias("n"))
    t = (
        c.join(F.broadcast(nl), "lang")
        .groupBy("lang")
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(n + 2) div 3"), F.col("lm_score_ppm")
                )
            ).alias("t1"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(2 * n + 2) div 3"),
                    F.col("lm_score_ppm"),
                )
            ).alias("t2"),
        )
    )
    return s.join(F.broadcast(t), "lang").select(
        "doc_id",
        "lang",
        "lm_score_ppm",
        F.when(F.col("lm_score_ppm") <= F.col("t1"), F.lit("tail"))
        .when(F.col("lm_score_ppm") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("ppl_bucket"),
    )
