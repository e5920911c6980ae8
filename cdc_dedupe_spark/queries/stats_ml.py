"""Distributed statistics / classical-ML training operators (round 11).

The thinnest part of the declared surface so far was the model-fitting
family (`ml_kmeans_train`, `stats_two_sample`). This module rounds it out
with the sufficient-statistics pattern that makes classical estimation
viable at 100 TB: every estimator here reduces the corpus to a tiny set
of EXACT integer moments with one partial-agg shuffle, and the estimate
itself is a constant-size driver-free epilogue (a broadcast or a one-row
select). Like the curation/llm families these are beyond the reference's
own surface (the reference is a CDC dedupe engine — WatchStream.java
deals in stream entries, not estimators) but are declared first-class
registry entries with exact DuckDB oracles.

Determinism (SURVEY.md §2B rules): moments are exact BIGINT sums of
integer-valued features (cents / dollars / percent discipline); the
normal-equation numerators, which can exceed 2^63 at large SF, are
formed in DECIMAL(38,0) on the Spark side and HUGEINT (int128) on the
DuckDB side — both exact — and only the final scalar division /
sqrt / ln happens in IEEE doubles through an identical op chain, then
`round_pos`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import spread_scan, table
from ._determinism import round_pos
from .registry import register


def _dec(c: Column) -> Column:
    """Exact wide-integer arithmetic for normal-equation numerators:
    DECIMAL(38,0) holds the n·Σxy-style products that overflow BIGINT
    past ~sf1 (n·Σy² ≈ 10²² at sf1 for cents-scaled money columns).
    The DuckDB twin uses HUGEINT (int128) — both exact, and the final
    cast-to-double of the same exact integer is bit-identical."""
    return c.cast("decimal(38,0)")


# ---------------------------------------------------------------------------
# ml_linreg_normal — OLS by normal equations over exact moments


@register(
    "ml_linreg_normal",
    group="stats-ml",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
             CAST(SUM(CAST(round(l_quantity) AS BIGINT)
                      * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sxx,
             CAST(SUM(CAST(round(l_quantity) AS BIGINT)
                      * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy,
             CAST(SUM(CAST(round(l_extendedprice) AS BIGINT)
                      * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy
      FROM lineitem GROUP BY l_returnflag
    ), e AS (
      SELECT l_returnflag, n,
             CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS num,
             CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS den,
             CAST(CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy AS DOUBLE) AS numi,
             CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS deny
      FROM m
    )
    SELECT l_returnflag, n,
           (round(num / den, 6) + 0.0) AS slope,
           (round(numi / den, 6) + 0.0) AS intercept,
           (round((num * num) / (den * deny), 6) + 0.0) AS r2
    FROM e
    """,
)
def ml_linreg_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS fit of extended price (whole dollars) on
    quantity by the normal equations — distributed linear regression as
    a moments problem. The corpus collapses to six exact BIGINT sums
    per group (n, Σx, Σy, Σx², Σxy, Σy²) in ONE partial-agg shuffle;
    slope (nΣxy−ΣxΣy)/(nΣxx−Σx²), intercept (ΣyΣxx−ΣxΣxy)/(nΣxx−Σx²)
    and R² = num²/(den·(nΣyy−Σy²)) are then single-row arithmetic. The
    cross products are formed in DECIMAL(38,0) / HUGEINT (see `_dec`) —
    exact past the BIGINT ceiling — and only the final divisions are
    IEEE doubles, the identical op chain both engines.

    Shape at scale: this is how regression is actually run on 100 TB —
    the shuffle carries |groups| × 6 scalars, the fit is free. The same
    moment matrix generalizes to k features as a k² Gram accumulation
    (one row per partition, map-side combined)."""
    x = F.round("l_quantity").cast("long")
    y = F.round("l_extendedprice").cast("long")
    m = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_returnflag"), x.alias("x"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    num = (_dec(F.col("n")) * F.col("sxy") - _dec(F.col("sx")) * F.col("sy")).cast("double")
    den = (_dec(F.col("n")) * F.col("sxx") - _dec(F.col("sx")) * F.col("sx")).cast("double")
    numi = (_dec(F.col("sy")) * F.col("sxx") - _dec(F.col("sx")) * F.col("sxy")).cast("double")
    deny = (_dec(F.col("n")) * F.col("syy") - _dec(F.col("sy")) * F.col("sy")).cast("double")
    return m.select(
        "l_returnflag",
        "n",
        round_pos(num / den, 6).alias("slope"),
        round_pos(numi / den, 6).alias("intercept"),
        round_pos((num * num) / (den * deny), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# stats_corr_matrix — pairwise Pearson correlations in one pass


_CORR_VARS = [
    ("qty", "CAST(round(l_quantity) AS BIGINT)"),
    ("price", "CAST(round(l_extendedprice) AS BIGINT)"),
    ("disc", "CAST(round(l_discount * 100) AS BIGINT)"),
    ("tax", "CAST(round(l_tax * 100) AS BIGINT)"),
]


def _corr_oracle() -> str:
    feats = ", ".join(f"{expr} AS {name}" for name, expr in _CORR_VARS)
    sums = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for i, (a, _) in enumerate(_CORR_VARS):
        sums.append(f"CAST(SUM({a}) AS BIGINT) AS s_{a}")
        for b, _ in _CORR_VARS[i:]:
            sums.append(f"CAST(SUM({a} * {b}) AS BIGINT) AS s_{a}_{b}")
    rows = []
    for i, (a, _) in enumerate(_CORR_VARS):
        for b, _ in _CORR_VARS[i + 1 :]:
            cov = f"CAST(CAST(n AS HUGEINT) * s_{a}_{b} - CAST(s_{a} AS HUGEINT) * s_{b} AS DOUBLE)"
            va = f"CAST(CAST(n AS HUGEINT) * s_{a}_{a} - CAST(s_{a} AS HUGEINT) * s_{a} AS DOUBLE)"
            vb = f"CAST(CAST(n AS HUGEINT) * s_{b}_{b} - CAST(s_{b} AS HUGEINT) * s_{b} AS DOUBLE)"
            rows.append(
                f"SELECT '{a}' AS var_x, '{b}' AS var_y, n, "
                f"(round({cov} / sqrt({va} * {vb}), 6) + 0.0) AS corr FROM m"
            )
    sums_sql = ", ".join(sums)
    body = " UNION ALL ".join(rows)
    return f"WITH b AS (SELECT {feats} FROM lineitem), m AS (SELECT {sums_sql} FROM b) {body}"


@register("stats_corr_matrix", group="stats-ml", oracle=_corr_oracle())
def stats_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of the four numeric lineitem
    measures (quantity, whole-dollar price, discount %, tax %) — the
    EDA primitive — computed from ONE corpus pass: a single aggregate
    emits the full upper-triangular moment set (n, Σxᵢ, Σxᵢxⱼ = 15
    BIGINT scalars), and the 6 correlations melt out of that one row
    map-side (explode over a literal struct array; no second scan, no
    per-pair jobs — contrast with calling df.stat.corr() 6 times).
    Numerators go through HUGEINT/DECIMAL(38,0) exactly as in
    [[ml_linreg_normal]]; the divide-by-sqrt is one identical double
    chain per pair.

    Shape at scale: k features → k²/2 sums in the same single shuffle
    of one row per partition; 100 TB costs exactly one map-side-combined
    pass regardless of k."""
    base = table(spark, sf_dir, "lineitem").select(
        F.round("l_quantity").cast("long").alias("qty"),
        F.round("l_extendedprice").cast("long").alias("price"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax"),
    )
    names = [name for name, _ in _CORR_VARS]
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, a in enumerate(names):
        aggs.append(F.sum(a).alias(f"s_{a}"))
        for b in names[i:]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"s_{a}_{b}"))
    m = base.agg(*aggs)

    def corr_row(a: str, b: str) -> Column:
        cov = (_dec(F.col("n")) * F.col(f"s_{a}_{b}") - _dec(F.col(f"s_{a}")) * F.col(f"s_{b}")).cast("double")
        va = (_dec(F.col("n")) * F.col(f"s_{a}_{a}") - _dec(F.col(f"s_{a}")) * F.col(f"s_{a}")).cast("double")
        vb = (_dec(F.col("n")) * F.col(f"s_{b}_{b}") - _dec(F.col(f"s_{b}")) * F.col(f"s_{b}")).cast("double")
        return F.struct(
            F.lit(a).alias("var_x"),
            F.lit(b).alias("var_y"),
            F.col("n").alias("n"),
            round_pos(cov / F.sqrt(va * vb), 6).alias("corr"),
        )

    pairs = [corr_row(a, b) for i, a in enumerate(names) for b in names[i + 1 :]]
    return m.select(F.explode(F.array(*pairs)).alias("p")).select("p.*")


# ---------------------------------------------------------------------------
# sample_reservoir_topk — uniform k-sample as top-k over a hash permutation


_RESERVOIR_K = 200


@register(
    "sample_reservoir_topk",
    group="stats-ml",
    oracle=f"""
    SELECT md5(CAST(l_orderkey AS VARCHAR) || '#' || CAST(l_linenumber AS VARCHAR)) AS rk,
           l_orderkey, l_linenumber,
           CAST(round(l_quantity) AS BIGINT) AS qty
    FROM lineitem
    ORDER BY rk, l_orderkey, l_linenumber
    LIMIT {_RESERVOIR_K}
    """,
)
def sample_reservoir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k=200 sample without replacement, rerun-stable:
    classic reservoir sampling is a SEQUENTIAL fold, but "keep the k
    smallest values of a uniform hash of the primary key" draws the
    identical distribution and is embarrassingly parallel — each
    partition keeps its local top-k and the driver merges k-sized heaps
    (Spark's TakeOrderedAndProject; no global sort, no sequential
    state). The md5 permutation also makes the sample deterministic
    across runs/engines — the seeded-RNG problem that keeps
    `dedup_near_minhash` rows-only does not arise.

    Shape at scale: O(parts · k) driver merge, zero shuffles. This is
    the standard "uniform eval slice of a 100 TB corpus" primitive next
    to the weighted variant [[sample_priority_weighted]]."""
    li = table(spark, sf_dir, "lineitem")
    rk = F.md5(F.concat_ws("#", F.col("l_orderkey"), F.col("l_linenumber")))
    return (
        li.select(
            rk.alias("rk"),
            "l_orderkey",
            "l_linenumber",
            F.round("l_quantity").cast("long").alias("qty"),
        )
        .orderBy("rk", "l_orderkey", "l_linenumber")
        .limit(_RESERVOIR_K)
    )


# ---------------------------------------------------------------------------
# text_bpe_merge_pairs — BPE tokenizer training, iteration zero


_BPE_TOP = 32


@register(
    "text_bpe_merge_pairs",
    group="stats-ml",
    oracle=f"""
    WITH w AS (
      SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      WHERE length(t) >= 2 GROUP BY t
    ), p AS (
      SELECT substr(word, i, 2) AS pair, cnt
      FROM w, UNNEST(generate_series(1, length(word) - 1)) AS u(i)
    )
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {_BPE_TOP}
    """,
)
def text_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge iteration (Sennrich et al. 2016): the most
    frequent adjacent symbol pairs corpus-wide, weighted by word
    frequency. The tokenizer-training trick that makes this scale is
    the WORD-COUNT COMPRESSION: the corpus is first collapsed to its
    vocabulary (Heaps'-law-bounded, one token shuffle), and the
    quadratic-ish character-pair explosion runs over the tiny vocab
    with counts as weights — never over raw text. Pair generation is a
    map-side HOF (`transform(sequence(...))`), the pair rollup is an
    O(|alphabet|²)-key aggregate, and top-32 is
    TakeOrderedAndProject with a total (n DESC, pair) order.

    Subsequent BPE iterations re-run the same shape over the re-split
    vocab — each iteration costs one vocab-sized job, not a corpus
    scan."""
    docs = table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = vocab.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(_BPE_TOP)
    )


# ---------------------------------------------------------------------------
# text_bpe_train_k / text_bpe_tokenize — K-iteration BPE train + apply (r15)

_BPE_K = 8  # merge-table size: K unrolled train iterations

# Canonical greedy BPE merge, made DECLARATIVE by excluding self-pairs
# (a = b) from candidacy: for a <> b two matches can never overlap (a
# match at i and i+1 would force a = b), so every match merges
# independently — no sequential scan state. The per-position CASE emits
# the merged symbol at each match start, NULL at each consumed match
# tail, and the symbol itself elsewhere; list_filter drops the NULLs.
# (Self-merges like 'a'+'a' exist in real BPE vocabs but are rare and
# need the order-dependent non-overlap rule — the documented tradeoff
# for a twin that is exact in both engines.)
_BPE_MERGE_EXPR = """
    CASE WHEN pa IS NULL THEN s ELSE
      filter(transform(sequence(1, size(s)), i ->
        CASE WHEN i < size(s) AND element_at(s, i) = pa
                  AND element_at(s, i + 1) = pb THEN concat(pa, pb)
             WHEN i > 1 AND element_at(s, i - 1) = pa
                  AND element_at(s, i) = pb THEN CAST(NULL AS STRING)
             ELSE element_at(s, i) END),
      x -> x IS NOT NULL) END"""

_BPE_PAIRS_EXPR = """
    CASE WHEN size(s) < 2 THEN array()
         ELSE transform(sequence(1, size(s) - 1), i ->
                struct(element_at(s, i) AS a, element_at(s, i + 1) AS b)) END"""


def _bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-count-compressed corpus: (word, cnt, s = char symbols). The
    whole train loop runs over THIS Heaps'-law-bounded frame — raw text
    is scanned once, here."""
    docs = spread_scan(table(spark, sf_dir, "documents"), "doc_id")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "s",
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
        )
    )


def _bpe_stages(vocab: DataFrame) -> tuple[DataFrame, list[DataFrame]]:
    """Unroll the K train iterations: each stage ranks adjacent symbol
    pairs (a <> b) over the current vocab weighted by word count, takes
    the top-1 (n DESC, a, b — total order, cross-engine identical on
    binary collation), and merges it everywhere via the declarative
    non-overlap rule. The best row joins back as a BROADCAST 1-row
    nested-loop probe (the repo's established one-row BNLJ pattern), so
    there is NO driver collect; a LEFT join keeps the stage a no-op
    when fewer than K distinct pairs exist (tiny fixtures). Each
    stage's frames are lazily localCheckpoint'd — without lineage
    truncation the unrolled plan re-expands the upstream subtree per
    reference, 2^K growth.

    r20 note: r19 ran this loop interpreted (scoped codegen-off, the
    connected_components treatment) on the strength of a local paired
    A/B, but the driver's ground-truth bench regressed the whole family
    0.68-0.77x (VERDICT r19 #1) — the compile-vs-kernel trade is
    host-dependent and loses on the reference box, so the scope was
    REVERTED to the r18 codegen-on shape."""
    return _bpe_stages_inner(vocab)


def _bpe_stages_inner(vocab: DataFrame) -> tuple[DataFrame, list[DataFrame]]:
    v = vocab.localCheckpoint(eager=False)
    merges = []
    for it in range(1, _BPE_K + 1):
        pairs = (
            v.select("cnt", F.explode(F.expr(_BPE_PAIRS_EXPR)).alias("p"))
            .select("cnt", "p.a", "p.b")
            .filter(F.col("a") != F.col("b"))
        )
        best = (
            pairs.groupBy("a", "b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .select(F.col("a").alias("pa"), F.col("b").alias("pb"), "n")
            .localCheckpoint(eager=False)
        )
        merges.append(
            best.select(
                F.lit(it).cast("long").alias("rank"),
                F.col("pa").alias("pair_a"),
                F.col("pb").alias("pair_b"),
                F.concat("pa", "pb").alias("merged"),
                "n",
            )
        )
        v = (
            v.join(F.broadcast(best), F.lit(True), "left")
            .select("word", "cnt", F.expr(_BPE_MERGE_EXPR).alias("s"))
            .localCheckpoint(eager=False)
        )
    return v, merges


def _bpe_stage_ctes() -> str:
    """The oracle twin of _bpe_stages: K unrolled CTE stages (p{i} ->
    b{i} -> v{i+1}) over the same vocab frame, generated mechanically so
    both engines execute the identical rule at every stage."""
    sql = """v0 AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
             list_transform(generate_series(1, length(word)),
                            i -> substr(word, i, 1)) AS s
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word
    )"""
    for i in range(_BPE_K):
        sql += f""", p{i} AS (
      SELECT s[i] AS a, s[i + 1] AS b, cnt
      FROM v{i}, UNNEST(generate_series(1, len(s) - 1)) AS u(i)
      WHERE s[i] <> s[i + 1]
    ), b{i} AS (
      SELECT a AS pa, b AS pb, CAST(SUM(cnt) AS BIGINT) AS n
      FROM p{i} GROUP BY a, b
      ORDER BY n DESC, a, b LIMIT 1
    ), v{i + 1} AS (
      SELECT word, cnt,
             CASE WHEN pa IS NULL THEN s ELSE
               list_filter(list_transform(generate_series(1, len(s)), j ->
                 CASE WHEN j < len(s) AND s[j] = pa AND s[j + 1] = pb
                        THEN pa || pb
                      WHEN j > 1 AND s[j - 1] = pa AND s[j] = pb THEN NULL
                      ELSE s[j] END),
               x -> x IS NOT NULL) END AS s
      FROM v{i} LEFT JOIN b{i} ON TRUE
    )"""
    return sql


_BPE_TRAIN_ORACLE = f"""
    WITH {_bpe_stage_ctes()}
    {" UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS rank, pa AS pair_a, pb AS pair_b,"
        f" pa || pb AS merged, n FROM b{i}"
        for i in range(_BPE_K)
    )}
    """


@register("text_bpe_train_k", group="stats-ml", oracle=_BPE_TRAIN_ORACLE)
def text_bpe_train_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranked BPE merge table, trained for K={k} full iterations
    (VERDICT r14 #3 — text_bpe_merge_pairs computed iteration zero
    only): per rank, the winning symbol pair, the merged symbol, and
    its weighted count at selection time. Each iteration re-ranks over
    the vocab AS RE-WRITTEN by all earlier merges, so later ranks can
    select multi-character symbols earlier ranks created — real BPE
    training, not a one-shot pair count.

    Shape at scale: raw text is scanned once into the word-count-
    compressed vocab (Heaps'-bounded); every one of the K iterations is
    a vocab-sized job (pair explode -> O(symbol-alphabet²) aggregate ->
    top-1 -> map-side merge rewrite) stitched by 1-row broadcast
    probes, with per-stage lineage truncation. No driver loop state
    beyond the unrolled plan itself."""
    v, merges = _bpe_stages(_bpe_vocab(spark, sf_dir))
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out


text_bpe_train_k.__doc__ = text_bpe_train_k.__doc__.format(k=_BPE_K)


_BPE_APPLY_ORACLE = f"""
    WITH {_bpe_stage_ctes()}, wl AS (
      SELECT word, CAST(len(s) AS BIGINT) AS bpe_len FROM v{_BPE_K}
    ), tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens_ws,
           CAST(SUM(bpe_len) AS BIGINT) AS n_tokens_bpe,
           CAST(SUM(bpe_len) * 10000 // COUNT(*) AS BIGINT) AS bpe_per_ws_bp,
           CAST(ceil(CAST(COUNT(*) AS DOUBLE) / 16) AS BIGINT) AS n_chunks_ws,
           CAST(ceil(CAST(SUM(bpe_len) AS DOUBLE) / 16) AS BIGINT) AS n_chunks_bpe
    FROM tok JOIN wl USING (word)
    GROUP BY doc_id
    """


@register("text_bpe_tokenize", group="stats-ml", oracle=_BPE_APPLY_ORACLE)
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-APPLY (VERDICT r14 #3): tokenize the corpus with the K={k}
    trained merges and join tokenized lengths back to documents —
    per doc, whitespace vs BPE token counts, the BPE-per-word ratio in
    basis points, and the context-window budget (doc_chunk_tokens'
    16-token chunks) re-expressed in BOTH units: n_chunks_bpe is the
    chunk count a tokenizer-accurate packing pipeline would actually
    provision.

    Plan pin (tests/test_bpe.py): the K merge folds run over the VOCAB
    ONLY — raw text appears exactly twice (the vocab build scan and the
    word explode), and tokenized lengths come back via a BROADCAST join
    on the word key (Heaps'-bounded right side), so no stage ever
    rewrites document text."""
    v, _ = _bpe_stages(_bpe_vocab(spark, sf_dir))
    wl = v.select("word", F.size("s").cast("long").alias("bpe_len"))
    docs = spread_scan(table(spark, sf_dir, "documents"), "doc_id")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    return (
        tok.join(F.broadcast(wl), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens_ws"),
            F.sum("bpe_len").alias("n_tokens_bpe"),
            F.expr("sum(bpe_len) * 10000 div count(1)").alias("bpe_per_ws_bp"),
            F.ceil(F.count(F.lit(1)).cast("double") / 16).alias("n_chunks_ws"),
            F.ceil(F.sum("bpe_len").cast("double") / 16).alias("n_chunks_bpe"),
        )
    )


text_bpe_tokenize.__doc__ = text_bpe_tokenize.__doc__.format(k=_BPE_K)


# ---------------------------------------------------------------------------
# ts_holt_linear — Holt's double exponential smoothing (level + trend)


@register(
    "ts_holt_linear",
    group="stats-ml",
    oracle="""
    WITH RECURSIVE c AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS bucket_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type,
             list_transform(list(n_events ORDER BY bucket_us), x -> x::DOUBLE) AS xs
      FROM c GROUP BY event_type
    ), r AS (
      SELECT event_type, xs, 2 AS i, xs[1] AS l, xs[2] - xs[1] AS t
      FROM s WHERE len(xs) >= 2
      UNION ALL
      SELECT event_type, xs, i + 1,
             (xs[i + 1] + l + t) / 2,
             (((xs[i + 1] + l + t) / 2) - l + t) / 2
      FROM r WHERE i < len(xs)
    )
    SELECT event_type,
           CAST(len(xs) AS BIGINT) AS n_buckets,
           (round(l, 6) + 0.0) AS level,
           (round(t, 6) + 0.0) AS trend,
           (round(l + t, 6) + 0.0) AS forecast
    FROM r WHERE i = len(xs)
    """,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's double-exponential smoothing (level + linear trend,
    alpha = beta = 1/2) of the hourly event rate per type, extending
    [[ts_ewma_hourly]] from an IIR level to a (level, trend) state pair:
      l' = (x + (l + t)) / 2,   t' = ((l' - l) + t) / 2
    seeded l = x1, t = x2 - x1, plus the one-step forecast l + t. The
    fold is inherently ORDER-DEPENDENT, so the scalable shape is the
    same as the EWMA's: raw events pay only the (type, hour) rollup
    shuffle, and the sequential recurrence runs over the tiny O(buckets)
    rollup per key — Spark folds the sorted-collect with `aggregate()`
    carrying a two-field struct, DuckDB recurses over the same list with
    a recursive CTE. Both engines execute the IDENTICAL IEEE op chain in
    the identical bucket order (the alpha = 1/2 halvings are the same
    dyadic ops), so level/trend/forecast are bit-identical — even once
    53-bit mantissas start rounding, they round the same way. Types with
    a single bucket have no defined trend and are excluded by the
    len >= 2 guard in both engines."""
    c = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000 * 3600000000").alias("bucket_us"),
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    xs = F.transform(
        F.array_sort(F.collect_list(F.struct("bucket_us", "n_events"))),
        lambda s: s["n_events"].cast("double"),
    )
    s = c.groupBy("event_type").agg(xs.alias("xs")).filter(F.size("xs") >= 2)
    x1 = F.element_at(F.col("xs"), 1)
    x2 = F.element_at(F.col("xs"), 2)
    init = F.struct(x1.alias("l"), (x2 - x1).alias("t"))
    fold = F.aggregate(
        F.slice(F.col("xs"), 3, F.greatest(F.size("xs") - 2, F.lit(0))),
        init,
        lambda acc, x: F.struct(
            ((x + acc["l"] + acc["t"]) / 2).alias("l"),
            ((((x + acc["l"] + acc["t"]) / 2) - acc["l"] + acc["t"]) / 2).alias("t"),
        ),
    )
    return s.select(
        "event_type",
        F.size("xs").cast("long").alias("n_buckets"),
        round_pos(fold["l"], 6).alias("level"),
        round_pos(fold["t"], 6).alias("trend"),
        round_pos(fold["l"] + fold["t"], 6).alias("forecast"),
    )


# ---------------------------------------------------------------------------
# ml_nb_classify — multinomial Naive Bayes: train + confusion matrix


@register(
    "ml_nb_classify",
    group="stats-ml",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, t AS token
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t FROM documents)
      WHERE length(t) > 0
    ), dt AS (
      SELECT doc_id, lang AS lang_true, token, CAST(COUNT(*) AS BIGINT) AS k
      FROM tok GROUP BY 1, 2, 3
    ), ct AS (
      SELECT lang AS lang_c, token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok GROUP BY 1, 2
    ), v AS (
      SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS vocab FROM tok
    ), nd AS (
      SELECT lang AS lang_c, CAST(COUNT(*) AS BIGINT) AS nd_c FROM documents GROUP BY 1
    ), ndall AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents
    ), cls AS (
      SELECT nd.lang_c, tots.tot,
             CAST(round(ln(1.0 / CAST(tots.tot + v.vocab AS DOUBLE)) * 1000000) AS BIGINT)
               AS dflt_micro,
             CAST(round(ln(CAST(nd.nd_c AS DOUBLE) / CAST(ndall.nd AS DOUBLE)) * 1000000)
                  AS BIGINT) AS prior_micro
      FROM nd, ndall, v,
           (SELECT lang_c, CAST(SUM(cnt) AS BIGINT) AS tot FROM ct GROUP BY 1) tots
      WHERE tots.lang_c = nd.lang_c
    ), lp AS (
      SELECT ct.lang_c, ct.token,
             CAST(round(ln(CAST(ct.cnt + 1 AS DOUBLE) / CAST(cls.tot + v.vocab AS DOUBLE))
                        * 1000000) AS BIGINT) AS logp_micro
      FROM ct, cls, v WHERE ct.lang_c = cls.lang_c
    ), sc AS (
      SELECT dt.doc_id, dt.lang_true, cls.lang_c,
             cls.prior_micro
               + SUM(dt.k * COALESCE(lp.logp_micro, cls.dflt_micro)) AS score
      FROM dt
      CROSS JOIN cls
      LEFT JOIN lp ON lp.token = dt.token AND lp.lang_c = cls.lang_c
      GROUP BY dt.doc_id, dt.lang_true, cls.lang_c, cls.prior_micro
    ), pred AS (
      SELECT doc_id, lang_true, lang_c AS lang_pred,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang_c) AS rn
      FROM sc
    )
    SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred WHERE rn = 1 GROUP BY 1, 2
    """,
)
def ml_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes, trained AND applied in one plan: fit
    per-language token log-probabilities (Laplace-smoothed) on the
    corpus, classify every document by argmax posterior, and emit the
    language confusion matrix — the distributed shape of every
    "fastText-style quality/language classifier" gate in a pretraining
    pipeline. The model is tiny by construction (|langs| × |vocab|
    Heaps'-bounded rows) and BROADCASTS to the scoring join; documents
    are scored from their (doc, token, count) rollup — |langs| rows per
    doc-token, one (doc) aggregation, never a per-row UDF.

    Determinism: log-probs are snapped to exact BIGINT micro-nats
    (round(ln(p)·10⁶)) at the per-(class, token) grain — the same
    accepted per-cell rounding as text_tfidf's — so the score SUM and
    the argmax (min over (−score, lang) with the lang tie-break) are
    exact integer ops, order-free across partitions and engines. Priors
    and unseen-token defaults get the same micro-nat treatment."""
    docs = table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
    )
    # Lazy localCheckpoint of the (doc, lang, token, count) rollup: the
    # class-conditional counts, the vocab size AND the scoring join all
    # derive from this one projection — without the checkpoint each
    # branch re-scans and re-explodes the text column (the llm_ext
    # shared-projection discipline; on a real cluster swap for reliable
    # checkpoint()). Oracle SQL is unchanged — checkpointing is
    # execution-only.
    dt = (
        tok.groupBy("doc_id", F.col("lang").alias("lang_true"), "token")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=False)
    )
    # r20 plan collapse (guide §2.4, and the r19 approx_percentile lesson:
    # broadcast builds do NOT share exchanges — each broadcast re-executes
    # its whole subtree). cls was broadcast twice (lp build + scoring) and
    # crossJoined v twice, so the vocab count-distinct and the ct rollup
    # each ran twice. Checkpoint ct (|langs|x|vocab| Heaps'-bounded rows)
    # and a cls that CARRIES vocab (so lp needs no second v crossJoin),
    # both lazily; every downstream branch then reads materialized RDDs.
    ct = (
        dt.groupBy(F.col("lang_true").alias("lang_c"), "token")
        .agg(F.sum("k").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    v = dt.agg(F.countDistinct("token").alias("vocab"))
    nd = docs.groupBy(F.col("lang").alias("lang_c")).agg(F.count(F.lit(1)).alias("nd_c"))
    ndall = docs.agg(F.count(F.lit(1)).alias("nd"))
    tots = ct.groupBy("lang_c").agg(F.sum("cnt").alias("tot"))

    def micro(x: Column) -> Column:
        return F.round(F.log(x) * 1000000).cast("long")

    cls = (
        nd.join(tots, "lang_c")
        .crossJoin(F.broadcast(ndall))
        .crossJoin(F.broadcast(v))
        .select(
            "lang_c",
            "tot",
            "vocab",
            micro(F.lit(1.0) / (F.col("tot") + F.col("vocab")).cast("double")).alias(
                "dflt_micro"
            ),
            micro(F.col("nd_c").cast("double") / F.col("nd").cast("double")).alias(
                "prior_micro"
            ),
        )
        .localCheckpoint(eager=False)
    )
    lp = (
        ct.join(F.broadcast(cls), "lang_c")
        .select(
            "lang_c",
            "token",
            micro(
                (F.col("cnt") + 1).cast("double")
                / (F.col("tot") + F.col("vocab")).cast("double")
            ).alias("logp_micro"),
        )
    )
    sc = (
        dt.crossJoin(F.broadcast(cls.select("lang_c", "dflt_micro", "prior_micro")))
        .join(F.broadcast(lp), ["token", "lang_c"], "left")
        .groupBy("doc_id", "lang_true", "lang_c", "prior_micro")
        .agg(
            F.sum(
                F.col("k") * F.coalesce(F.col("logp_micro"), F.col("dflt_micro"))
            ).alias("s")
        )
        .select(
            "doc_id",
            "lang_true",
            "lang_c",
            (F.col("prior_micro") + F.col("s")).alias("score"),
        )
    )
    pred = sc.groupBy("doc_id", "lang_true").agg(
        F.min(F.struct((-F.col("score")).alias("neg"), F.col("lang_c").alias("c"))).alias("m")
    )
    return (
        pred.select("lang_true", F.col("m.c").alias("lang_pred"))
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# text_zipf_slope — Zipf's-law fit of the token frequency spectrum


_ZIPF_TOP = 1000


@register(
    "text_zipf_slope",
    group="stats-ml",
    oracle=f"""
    WITH w AS (
      SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      WHERE length(t) > 0 GROUP BY t
    ), r AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rank FROM w
      QUALIFY rank <= {_ZIPF_TOP}
    ), f AS (
      SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT) AS x,
             CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT) AS y
      FROM r
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM f
    ), e AS (
      SELECT n,
             CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS num,
             CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS den,
             CAST(CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy AS DOUBLE) AS numi,
             CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS deny
      FROM m
    )
    SELECT n AS n_ranks,
           (round(num / den, 6) + 0.0) AS slope,
           (round(numi / den / 1000000, 6) + 0.0) AS intercept_ln,
           (round((num * num) / (den * deny), 6) + 0.0) AS r2
    FROM e
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token spectrum: OLS slope of
    ln(freq) on ln(rank) over the top-1000 ranks — the corpus-health
    statistic (natural text ≈ −1; a slope collapsing toward 0 flags
    boilerplate/duplication). Composition of this round's machinery:
    the corpus collapses to its Heaps'-bounded vocab; Catalyst pushes
    the rank <= 1000 filter into a TakeOrderedAndProject over that
    rollup (plan-pinned: ONE exchange in the whole query — raw tokens
    are never globally sorted, and the 1000-row window + moment
    aggregate ride its single-partition output), and
    the fit is [[ml_linreg_normal]]'s normal equations over moments of
    log micro-nats: each ln is snapped to an exact BIGINT ONCE per
    vocab row (the accepted per-cell text_tfidf rounding), so the sums
    and the slope arithmetic are exact/HUGEINT — no float-summation
    order anywhere."""
    docs = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rank = F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("word")))
    r = freq.withColumn("rank", rank).filter(F.col("rank") <= _ZIPF_TOP)
    f = r.select(
        F.round(F.log(F.col("rank").cast("double")) * 1000000).cast("long").alias("x"),
        F.round(F.log(F.col("cnt").cast("double")) * 1000000).cast("long").alias("y"),
    )
    m = f.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (_dec(F.col("n")) * F.col("sxy") - _dec(F.col("sx")) * F.col("sy")).cast("double")
    den = (_dec(F.col("n")) * F.col("sxx") - _dec(F.col("sx")) * F.col("sx")).cast("double")
    numi = (_dec(F.col("sy")) * F.col("sxx") - _dec(F.col("sx")) * F.col("sxy")).cast("double")
    deny = (_dec(F.col("n")) * F.col("syy") - _dec(F.col("sy")) * F.col("sy")).cast("double")
    return m.select(
        F.col("n").alias("n_ranks"),
        round_pos(num / den, 6).alias("slope"),
        round_pos(numi / den / 1000000, 6).alias("intercept_ln"),
        round_pos((num * num) / (den * deny), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# events_cusum_changepoint — exact-integer CUSUM over the hourly rate


@register(
    "events_cusum_changepoint",
    group="stats-ml",
    oracle="""
    WITH RECURSIVE c AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS bucket_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type,
             list(struct_pack(bu := bucket_us, ct := n_events) ORDER BY bucket_us) AS xs,
             CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(SUM(n_events) AS BIGINT) AS tot
      FROM c GROUP BY event_type
    ), r AS (
      SELECT event_type, xs, nb, tot, 0 AS i,
             CAST(0 AS BIGINT) AS s, CAST(-1 AS BIGINT) AS smax, CAST(0 AS BIGINT) AS at
      FROM s
      UNION ALL
      SELECT event_type, xs, nb, tot, i + 1,
             greatest(CAST(0 AS BIGINT), s + (nb * xs[i + 1].ct - tot)),
             CASE WHEN greatest(CAST(0 AS BIGINT), s + (nb * xs[i + 1].ct - tot)) > smax
                  THEN greatest(CAST(0 AS BIGINT), s + (nb * xs[i + 1].ct - tot))
                  ELSE smax END,
             CASE WHEN greatest(CAST(0 AS BIGINT), s + (nb * xs[i + 1].ct - tot)) > smax
                  THEN xs[i + 1].bu ELSE at END
      FROM r WHERE i < nb
    )
    SELECT event_type, nb AS n_buckets, smax AS cusum_peak, at AS peak_bucket_us,
           (round(CAST(smax AS DOUBLE) / nb, 6) + 0.0) AS peak_norm
    FROM r WHERE i = nb
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint scan of the hourly event rate per
    type: S_i = max(0, S_{i-1} + (x_i − mean)), reporting the peak
    excursion and the EARLIEST bucket achieving it — the classic
    "when did the rate shift upward" detector next to the pointwise
    [[events_anomaly_mad]]. The whole fold is EXACT integers: deviations
    are pre-scaled by the bucket count (T_i = nb·x_i − Σx, integral by
    construction), so peak and argmax carry no float at all — the
    normalized peak divides once at the end. No rounding lottery
    anywhere, unlike the ln-based scores.

    Shape at scale: identical to [[ts_holt_linear]] — raw events pay the
    (type, hour) rollup shuffle once; the order-dependent scan folds the
    O(buckets) list per type with a 3-field struct accumulator (Spark
    aggregate() / DuckDB recursive CTE), never touching raw rows."""
    c = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000 * 3600000000").alias("bucket_us"),
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    s = c.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct(F.col("bucket_us").alias("bu"), F.col("n_events").alias("ct")))).alias("xs"),
        F.count(F.lit(1)).alias("nb"),
        F.sum("n_events").alias("tot"),
    )
    zero = F.lit(0).cast("long")
    init = F.struct(zero.alias("s"), F.lit(-1).cast("long").alias("smax"), zero.alias("at"))

    def step(acc, x):
        snew = F.greatest(zero, acc["s"] + (F.col("nb") * x["ct"] - F.col("tot")))
        bump = snew > acc["smax"]
        return F.struct(
            snew.alias("s"),
            F.when(bump, snew).otherwise(acc["smax"]).alias("smax"),
            F.when(bump, x["bu"]).otherwise(acc["at"]).alias("at"),
        )

    fold = F.aggregate(F.col("xs"), init, step)
    return s.select(
        "event_type",
        F.col("nb").alias("n_buckets"),
        fold["smax"].alias("cusum_peak"),
        fold["at"].alias("peak_bucket_us"),
        round_pos(fold["smax"].cast("double") / F.col("nb"), 6).alias("peak_norm"),
    )


# ---------------------------------------------------------------------------
# agg_quantile_2pass — exact order statistics without a global sort


_Q2P_W = 65536  # bucket width in cents -> ~160 buckets over the price range
_Q2P_PCTS = (50, 90, 99)


@register(
    "agg_quantile_2pass",
    group="stats-ml",
    oracle=f"""
    WITH c AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM c
    ), k AS (
      SELECT qpct, (qpct * nn + 99) // 100 AS rank_k
      FROM n, (VALUES {", ".join(f"({p})" for p in _Q2P_PCTS)}) q(qpct)
    ), ranked AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM c
    )
    SELECT k.qpct, k.rank_k, r.v AS value_cents
    FROM k JOIN ranked r ON r.rn = k.rank_k
    """,
)
def agg_quantile_2pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 order statistics of the price column with NO
    global sort — the two-pass distributed selection that completes the
    quantile spectrum next to `agg_percentile` (exact, pays a per-group
    sort) and `agg_approx_percentile` (Greenwald-Khanna, approximate): pass 1
    histograms the cents into ~160 fixed-width buckets (one partial-agg
    shuffle of O(buckets) rows) and locates each target rank's bucket
    from the tiny cumulative table; pass 2 re-scans ONLY the ~3 matched
    buckets (≈ 2 % of rows at this width) and picks the residual-offset
    row with a per-quantile window. Everything is BIGINT (ranks from
    exact ceil division, values in cents) — bit-exact against the
    oracle's brute-force global ROW_NUMBER.

    At 100 TB this is how you take an exact median: two scans beat one
    global sort by orders of magnitude, the histogram state is O(range/
    width) regardless of row count, and the width knob trades pass-2
    selectivity against histogram size. The oracle deliberately does the
    O(n log n) sort — the point is both roads give the same integers."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    c = li.select(F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"))
    n = c.agg(F.count(F.lit(1)).alias("nn"))
    ks = n.select(
        F.explode(F.array(*[F.lit(p) for p in _Q2P_PCTS])).alias("qpct"), "nn"
    ).select(
        "qpct",
        F.expr("(qpct * nn + 99) div 100").alias("rank_k"),
    )
    # pass 1: bucket histogram + cumulative ranks (O(buckets) rows)
    bc = (
        c.groupBy((F.col("v") / _Q2P_W).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = bc.select("bucket", F.sum("cnt").over(w).alias("cum"), (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"))
    # locate each rank's bucket: the FIRST bucket whose cum reaches k
    t = (
        ks.join(F.broadcast(cum), F.col("cum") >= F.col("rank_k"))
        .groupBy("qpct", "rank_k")
        .agg(F.min(F.struct("bucket", "cum_prev")).alias("m"))
        .select(
            "qpct",
            "rank_k",
            F.col("m.bucket").alias("bucket"),
            (F.col("rank_k") - F.col("m.cum_prev")).alias("off"),
        )
    )
    # pass 2: re-scan only the matched buckets, select the off-th smallest
    hit = c.withColumn("bucket", (F.col("v") / _Q2P_W).cast("long")).join(
        F.broadcast(t), "bucket"
    )
    rn = F.row_number().over(Window.partitionBy("qpct").orderBy("v"))
    return (
        hit.withColumn("rn", rn)
        .filter(F.col("rn") == F.col("off"))
        .select("qpct", "rank_k", F.col("v").alias("value_cents"))
    )


# ---------------------------------------------------------------------------
# stats_chi2_independence — chi-square test of independence


@register(
    "stats_chi2_independence",
    group="stats-ml",
    oracle="""
    WITH o AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hod,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM events GROUP BY 1, 2
    ), r AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS rt FROM o GROUP BY 1),
    c AS (SELECT hod, CAST(SUM(obs) AS BIGINT) AS ct FROM o GROUP BY 1),
    t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nr,
                 CAST(COUNT(DISTINCT hod) AS BIGINT) AS nc
          FROM o),
    terms AS (
      SELECT t.n, t.nr, t.nc,
             CAST(round(
               (CAST(CAST(t.n AS HUGEINT) * o.obs - CAST(r.rt AS HUGEINT) * c.ct AS DOUBLE)
                * CAST(CAST(t.n AS HUGEINT) * o.obs - CAST(r.rt AS HUGEINT) * c.ct AS DOUBLE))
               / (CAST(t.n AS DOUBLE) * CAST(r.rt AS DOUBLE) * CAST(c.ct AS DOUBLE))
               * 1000000) AS BIGINT) AS term_micro
      FROM o JOIN r USING (event_type) JOIN c USING (hod), t
    )
    SELECT MAX(n) AS n,
           CAST(MAX((nr - 1) * (nc - 1)) AS BIGINT) AS dof,
           (round(CAST(SUM(term_micro) AS DOUBLE) / 1000000, 6) + 0.0) AS chi2,
           (round(sqrt(CAST(SUM(term_micro) AS DOUBLE) / 1000000
                       / (CAST(MAX(n) AS DOUBLE) * (LEAST(MAX(nr), MAX(nc)) - 1))), 6) + 0.0)
             AS cramers_v
    FROM terms
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and
    hour-of-day — "does traffic mix shift across the day", the
    categorical counterpart of [[stats_two_sample]]. The contingency
    table (|types| × 24 cells) is ONE partial-agg shuffle; marginals
    and the total are rollups of that tiny table, and each cell's
    (O−E)²/E is computed as ((nO − rc)² / nrc) with the nO − rc
    numerator formed in HUGEINT/DECIMAL(38,0). Per-cell terms are
    snapped to exact micro units (the text_tfidf per-cell rounding) so
    the chi² SUM is order-free integer arithmetic; Cramér's V
    normalizes it to [0,1] for effect size. Hour comes from epoch
    micros arithmetic — no timezone surface anywhere.

    At 100 TB: the corpus pays one pass; everything after is
    |cells|-row algebra."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        (F.expr("unix_micros(ts) div 3600000000") % 24).alias("hod"),
    )
    # Lazy localCheckpoint: marginals, the total AND the term join all
    # derive from the contingency table — without it each branch re-scans
    # the events corpus (the llm_ext shared-projection discipline).
    o = (
        ev.groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).alias("obs"))
        .localCheckpoint(eager=False)
    )
    r = o.groupBy("event_type").agg(F.sum("obs").alias("rt"))
    c = o.groupBy("hod").agg(F.sum("obs").alias("ct"))
    t = o.agg(
        F.sum("obs").alias("n"),
        F.countDistinct("event_type").alias("nr"),
        F.countDistinct("hod").alias("nc"),
    )
    num = (_dec(F.col("n")) * F.col("obs") - _dec(F.col("rt")) * F.col("ct")).cast("double")
    term = (
        (num * num)
        / (F.col("n").cast("double") * F.col("rt").cast("double") * F.col("ct").cast("double"))
        * 1000000
    )
    terms = (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "hod")
        .crossJoin(F.broadcast(t))
        .select("n", "nr", "nc", F.round(term).cast("long").alias("term_micro"))
    )
    chi2 = F.sum("term_micro").cast("double") / 1000000
    return terms.agg(
        F.max("n").alias("n"),
        F.max((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"),
        round_pos(chi2, 6).alias("chi2"),
        round_pos(
            F.sqrt(chi2 / (F.max("n").cast("double") * (F.least(F.max("nr"), F.max("nc")) - 1))),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# stats_ks_two_sample — Kolmogorov–Smirnov distance, exact integers


@register(
    "stats_ks_two_sample",
    group="stats-ml",
    oracle="""
    WITH b AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
      FROM events WHERE event_type IN ('click', 'purchase')
    ), g AS (
      SELECT v, CAST(SUM(is_a) AS BIGINT) AS a, CAST(SUM(1 - is_a) AS BIGINT) AS b
      FROM b GROUP BY v
    ), cum AS (
      SELECT v,
             SUM(a) OVER (ORDER BY v) AS ca,
             SUM(b) OVER (ORDER BY v) AS cb
      FROM g
    ), t AS (
      SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2 FROM g
    ), d AS (
      SELECT t.n1, t.n2, abs(t.n2 * cum.ca - t.n1 * cum.cb) AS num, cum.v
      FROM cum, t
    )
    SELECT MAX(n1) AS n1, MAX(n2) AS n2,
           CAST(MAX(num) AS BIGINT) AS d_num,
           MIN(CASE WHEN num = (SELECT MAX(num) FROM d) THEN v END) AS at_cents,
           (round(CAST(MAX(num) AS DOUBLE) / (MAX(n1) * MAX(n2)), 6) + 0.0) AS d_stat
    FROM d
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the click and
    purchase value distributions — the distribution-shift detector next
    to the mean-shift [[stats_two_sample]]: D = max over thresholds of
    |F₁ − F₂|, computed EXACTLY in integers by cross-multiplication
    (|n₂·c₁ − n₁·c₂|, one division at the very end) — no float ECDFs,
    no rounding lottery, plus the earliest cents value attaining the
    max. Raw events collapse to per-distinct-value counts (one
    shuffle); the ECDF cumulative runs over that value table, which is
    bounded by the VALUE DOMAIN (≤ 49k distinct cents here), not the
    row count — for continuous 100 TB data you pre-bin to the precision
    you report. The argmax ties break to the smallest value via an
    integer min-struct."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    b = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("v"),
        (F.col("event_type") == "click").cast("long").alias("is_a"),
    )
    # Checkpointed: both the ECDF window and the totals row read this
    # value-domain rollup — one corpus scan, not two.
    g = (
        b.groupBy("v")
        .agg(F.sum("is_a").alias("a"), F.sum(1 - F.col("is_a")).alias("b"))
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select("v", F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb"))
    t = g.agg(F.sum("a").alias("n1"), F.sum("b").alias("n2"))
    d = cum.crossJoin(F.broadcast(t)).select(
        "n1",
        "n2",
        F.abs(F.col("n2") * F.col("ca") - F.col("n1") * F.col("cb")).alias("num"),
        "v",
    )
    m = d.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.min(F.struct((-F.col("num")).alias("neg"), F.col("v").alias("v"))).alias("m"),
    )
    return m.select(
        "n1",
        "n2",
        (-F.col("m.neg")).alias("d_num"),
        F.col("m.v").alias("at_cents"),
        round_pos((-F.col("m.neg")).cast("double") / (F.col("n1") * F.col("n2")), 6).alias(
            "d_stat"
        ),
    )


# ---------------------------------------------------------------------------
# ml_pca_power — top principal direction by exact-integer power iteration


_PCA_DIM = 64
_PCA_MILLI = 1000


def _pca_oracle() -> str:
    return f"""
    WITH sc AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(x::DOUBLE * 10000000) AS BIGINT)) AS se
      FROM embeddings
    ), s1 AS (
      SELECT vec_id, se, CAST({_PCA_MILLI} AS HUGEINT) * list_sum(se) AS s FROM sc
    ), t1 AS (
      SELECT i.i AS dim, SUM(s1.s * s1.se[i.i]) AS t
      FROM s1, generate_series(1, {_PCA_DIM}) i(i) GROUP BY i.i
    ), m1 AS (SELECT MAX(abs(t)) AS vmax FROM t1),
    v1 AS (
      SELECT dim,
             CAST(CASE WHEN t < 0 THEN -((-t * {_PCA_MILLI}) // vmax)
                       ELSE (t * {_PCA_MILLI}) // vmax END AS BIGINT) AS v
      FROM t1, m1
    ), v1l AS (
      SELECT list(v ORDER BY dim) AS vl FROM v1
    ), s2 AS (
      SELECT sc.vec_id, sc.se,
             CAST(list_sum(list_transform(generate_series(1, {_PCA_DIM}),
                     i -> sc.se[i] * v1l.vl[i])) AS HUGEINT) AS s
      FROM sc, v1l
    ), t2 AS (
      SELECT i.i AS dim, SUM(s2.s * s2.se[i.i]) AS t
      FROM s2, generate_series(1, {_PCA_DIM}) i(i) GROUP BY i.i
    ), m2 AS (SELECT MAX(abs(t)) AS vmax FROM t2)
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(CASE WHEN t < 0 THEN -((-t * {_PCA_MILLI}) // vmax)
                     ELSE (t * {_PCA_MILLI}) // vmax END AS BIGINT) AS v_milli
    FROM t2, m2
    """


@register("ml_pca_power", group="stats-ml", oracle=_pca_oracle())
def ml_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by TWO unrolled
    power iterations, v' ∝ Xᵀ(Xv) — distributed PCA without ever
    materializing the 64×64 Gram matrix (the Gram route costs a dim²
    row blow-up or dim² aggregate columns; the matrix-free route is two
    corpus passes per iteration with the current direction as a ONE-ROW
    broadcast). EVERYTHING is exact integers: embeddings pre-scaled to
    1e7 ints, v carried in milli units, per-row projections s = x·v are
    exact BIGINT HOFs, and the 64 per-dimension sums Σ s·xⱼ run in
    DECIMAL(38,0)/HUGEINT (they reach ~10²¹). Renormalization divides
    by max|t| with sign-split truncating division — floor (DuckDB //)
    equals trunc (Spark div) only for non-negative operands, so both
    engines divide |t| and re-apply the sign. Start vector = all-ones
    milli (deterministic; not orthogonal to the top component for this
    corpus, unit-pinned via the Rayleigh ratio improving).

    At 100 TB: per iteration, one scan + a 64-value aggregate; the
    direction never exceeds one broadcast row. The ml_kmeans_train
    unrolled-iteration discipline applied to spectral structure."""
    from ..functions.vector import iscale

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sc_ = e.select("vec_id", iscale(F.col("embedding")).alias("se"))

    def dims_sums(df):
        # posexplode, NOT 64 element_at aggregates: the optimizer inlines
        # the per-row projection s into every aggregate expression (the
        # re-inlining pitfall), re-evaluating the zip-fold 64x per row
        # and blowing the codegen budget (measured 10s -> 2s at sf0.1).
        # Generate evaluates s ONCE per row and replicates the value;
        # the (dim, t) rollup partial-aggregates to 64 rows per task.
        return (
            df.select(F.posexplode("se").alias("dim", "x"), "s")
            .groupBy("dim")
            .agg(F.sum(_dec(F.col("s")) * F.col("x")).alias("t"))
        )

    def renorm(t):
        # sign-split truncating milli renormalization over the 64-row
        # (dim, t) frame; the max rides back as a one-row broadcast
        m = t.agg(F.max(F.abs(F.col("t"))).alias("vmax"))
        return t.crossJoin(F.broadcast(m)).select(
            "dim",
            F.when(
                F.col("t") < 0, -F.expr(f"(-t * {_PCA_MILLI}) div vmax")
            )
            .otherwise(F.expr(f"(t * {_PCA_MILLI}) div vmax"))
            .cast("long")
            .alias("v"),
        )

    def as_row(v):
        vl = F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "v"))), lambda s: s["v"]
        )
        return F.broadcast(v.agg(vl.alias("vl")))

    # iteration 1: v0 = all-ones milli -> s = 1000 * Σ se_i
    s1 = sc_.withColumn(
        "s", F.lit(_PCA_MILLI) * F.aggregate("se", F.lit(0).cast("long"), lambda a, x: a + x)
    )
    v1 = renorm(dims_sums(s1))
    # iteration 2: s = se · v1 (exact BIGINT zip_with against the broadcast row)
    s2 = sc_.crossJoin(as_row(v1)).withColumn(
        "s",
        F.aggregate(
            F.zip_with("se", "vl", lambda x, v: x * v),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
    v2 = renorm(dims_sums(s2))
    return v2.select((F.col("dim") + 1).cast("long").alias("dim"), F.col("v").alias("v_milli"))


# ---------------------------------------------------------------------------
# stats_bootstrap_ci — Poisson bootstrap confidence interval


_BOOT_B = 32
# Poisson(1) inverse-CDF thresholds over the 32-bit hash space:
# floor(P(X <= k) * 2^32) for k = 0..7 (tail mass beyond 7 -> weight 8).
_BOOT_T = (1580030168, 3160060337, 3950075421, 4213413783,
           4279248373, 4292415291, 4294609777, 4294923276)
_BOOT_LO_RANK = 2   # ~2.5th percentile of B=32 replica means
_BOOT_HI_RANK = 31  # ~97.5th


def _boot_w_sql(h: str) -> str:
    branches = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_BOOT_T)
    )
    return f"CASE {branches} ELSE 8 END"


@register(
    "stats_bootstrap_ci",
    group="stats-ml",
    oracle=f"""
    WITH x AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase'
    ), w AS (
      SELECT b.b, x.c,
             {_boot_w_sql("CAST(('0x' || substr(md5(CAST(x.event_id AS VARCHAR) || ':' || CAST(b.b AS VARCHAR)), 1, 8)) AS BIGINT)")} AS w
      FROM x, generate_series(1, {_BOOT_B}) b(b)
    ), rep AS (
      SELECT b, CAST(SUM(w * c) AS BIGINT) AS s, CAST(SUM(w) AS BIGINT) AS nb
      FROM w GROUP BY b
    ), means AS (
      SELECT b, (round(CAST(s AS DOUBLE) / nb, 6) + 0.0) AS m,
             ROW_NUMBER() OVER (ORDER BY CAST(s AS DOUBLE) / nb, b) AS rk
      FROM rep
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             (round(CAST(SUM(c) AS DOUBLE) / COUNT(*), 6) + 0.0) AS mean_cents
      FROM x
    )
    SELECT tot.n, CAST({_BOOT_B} AS BIGINT) AS n_replicas, tot.mean_cents,
           MAX(CASE WHEN rk = {_BOOT_LO_RANK} THEN m END) AS ci_lo,
           MAX(CASE WHEN rk = {_BOOT_HI_RANK} THEN m END) AS ci_hi
    FROM means, tot GROUP BY tot.n, tot.mean_cents
    """,
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% confidence interval for the mean purchase
    value — THE scalable bootstrap: classic resampling needs B
    sequential passes over a materialized sample, but for large n the
    multinomial replica weights converge to independent Poisson(1), so
    every row draws its 32 replica weights DIRECTLY from a hash
    (md5(event_id:replica) against fixed inverse-CDF integer
    thresholds — deterministic, rerun-stable, engine-identical) and all
    replicas accumulate in ONE pass: explode ×B map-side, weighted
    integer sums partial-aggregate, shuffle carries B rows. Replica
    means are ranked with a (mean, replica) tie-break and the CI is the
    2nd / 31st order statistic. B is the CPU-vs-precision knob; the
    scan count never changes.

    All sums are exact integer cents; the only doubles are the B final
    divisions — identical IEEE ops both engines."""
    # spread_scan (r14, probe sighting #17, SKEW_LOCAL.json): the
    # explode×B + md5 replica-weight kernel inherited the serial events
    # scan. Spread AFTER the purchase filter so only surviving rows move.
    x = spread_scan(
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", F.round(F.col("value") * 100).cast("long").alias("c"))
    )
    b = F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("event_id"), F.col("b")).cast("binary")), 1, 8
        ),
        16,
        10,
    ).cast("long")
    w = F.lit(8)
    for k in range(len(_BOOT_T) - 1, -1, -1):
        w = F.when(h < _BOOT_T[k], k).otherwise(w)
    rep = (
        x.select("event_id", "c", b)
        .select("c", "b", w.alias("w"))
        .groupBy("b")
        .agg(F.sum(F.col("w") * F.col("c")).alias("s"), F.sum("w").alias("nb"))
    )
    from pyspark.sql import Window

    mean_b = F.col("s").cast("double") / F.col("nb")
    means = rep.select(
        "b", round_pos(mean_b, 6).alias("m"), F.row_number().over(Window.orderBy(mean_b, "b")).alias("rk")
    )
    full = x.agg(
        F.count(F.lit(1)).alias("n"),
        round_pos(F.sum("c").cast("double") / F.count(F.lit(1)), 6).alias("mean_cents"),
    )
    return (
        means.crossJoin(F.broadcast(full))
        .groupBy("n", "mean_cents")
        .agg(
            F.max(F.when(F.col("rk") == _BOOT_LO_RANK, F.col("m"))).alias("ci_lo"),
            F.max(F.when(F.col("rk") == _BOOT_HI_RANK, F.col("m"))).alias("ci_hi"),
        )
        .select(
            "n",
            F.lit(_BOOT_B).cast("long").alias("n_replicas"),
            "mean_cents",
            "ci_lo",
            "ci_hi",
        )
    )


# ---------------------------------------------------------------------------
# events_forecast_backtest — Holt forecast vs held-out last bucket


@register(
    "events_forecast_backtest",
    group="stats-ml",
    oracle="""
    WITH RECURSIVE c AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS bucket_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type,
             list_transform(list(n_events ORDER BY bucket_us), x -> x::DOUBLE) AS xs
      FROM c GROUP BY event_type
    ), r AS (
      SELECT event_type, xs, 2 AS i, xs[1] AS l, xs[2] - xs[1] AS t
      FROM s WHERE len(xs) >= 3
      UNION ALL
      SELECT event_type, xs, i + 1,
             (xs[i + 1] + l + t) / 2,
             (((xs[i + 1] + l + t) / 2) - l + t) / 2
      FROM r WHERE i < len(xs) - 1
    )
    SELECT event_type,
           CAST(len(xs) AS BIGINT) AS n_buckets,
           (round(l + t, 6) + 0.0) AS forecast,
           CAST(xs[len(xs)] AS BIGINT) AS actual,
           (round(abs((l + t) - xs[len(xs)]), 6) + 0.0) AS abs_err
    FROM r WHERE i = len(xs) - 1
    """,
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step forecast backtest — the MLOps loop around
    [[ts_holt_linear]]: fit Holt level+trend on every hourly bucket
    EXCEPT the last, forecast one step, and score it against the
    held-out final bucket. Same dyadic fold, same bit-exact contract
    (the held-out comparison adds one subtraction); same scale shape
    (the fold consumes the tiny per-type rollup, raw events pay only
    the (type, hour) shuffle). Types need >= 3 buckets (2 to seed, 1 to
    hold out) and are excluded otherwise in both engines.

    This is the honest-evaluation primitive: a pipeline that ships
    forecasts should continuously re-run exactly this query with the
    window advanced."""
    c = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000 * 3600000000").alias("bucket_us"),
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    xs = F.transform(
        F.array_sort(F.collect_list(F.struct("bucket_us", "n_events"))),
        lambda s: s["n_events"].cast("double"),
    )
    s = c.groupBy("event_type").agg(xs.alias("xs")).filter(F.size("xs") >= 3)
    x1 = F.element_at(F.col("xs"), 1)
    x2 = F.element_at(F.col("xs"), 2)
    init = F.struct(x1.alias("l"), (x2 - x1).alias("t"))
    fold = F.aggregate(
        F.slice(F.col("xs"), 3, F.greatest(F.size("xs") - 3, F.lit(0))),
        init,
        lambda acc, x: F.struct(
            ((x + acc["l"] + acc["t"]) / 2).alias("l"),
            ((((x + acc["l"] + acc["t"]) / 2) - acc["l"] + acc["t"]) / 2).alias("t"),
        ),
    )
    forecast = fold["l"] + fold["t"]
    actual = F.element_at(F.col("xs"), F.size("xs"))
    return s.select(
        "event_type",
        F.size("xs").cast("long").alias("n_buckets"),
        round_pos(forecast, 6).alias("forecast"),
        actual.cast("long").alias("actual"),
        round_pos(F.abs(forecast - actual), 6).alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# events_attribution_credit — last-click revenue attribution


@register(
    "events_attribution_credit",
    group="stats-ml",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    c AS (SELECT * FROM events WHERE event_type = 'click'),
    j AS (
      SELECT p.event_id, CAST(round(p.value * 100) AS BIGINT) AS cents,
             c.event_id AS click_id, c.ts AS click_ts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT COALESCE((epoch_us(CAST(click_ts AS TIMESTAMP)) // 3600000000) % 24, -1)
             AS click_hod,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN click_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_attributed,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM j GROUP BY 1
    """,
)
def events_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-click revenue attribution — the marketing-analytics rollup on
    top of the as-of machinery: every purchase credits its user's most
    recent prior click, and revenue aggregates by the CLICK's hour of
    day (bucket −1 collects organic purchases with no prior click). The
    attribution itself is [[join_asof]]'s single-shuffle merge carry (no
    range join, cost independent of click density); the report is one
    |24+1|-group aggregate over its output with exact integer cents.
    Hour from epoch-micros arithmetic — no timezone surface."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("tag"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("cents"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("click_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    from pyspark.sql import Window

    merged = clicks.unionByName(purchases).withColumn("ts_us", F.unix_micros("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("click_id").isNotNull(), F.col("ts_us"))
    carried = merged.select(
        "tag",
        "cents",
        F.last("click_id", ignorenulls=True).over(w).alias("bid"),
        F.last(click_ts, ignorenulls=True).over(w).alias("bus"),
    ).filter(F.col("tag") == 1)
    hod = F.when(
        F.col("bid").isNotNull(), (F.col("bus") / 3600000000).cast("long") % 24
    ).otherwise(F.lit(-1))
    return (
        carried.select(hod.alias("click_hod"), "cents", "bid")
        .groupBy("click_hod")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum((F.col("bid").isNotNull()).cast("long")).alias("n_attributed"),
            F.sum("cents").alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# events_user_features — the feature-store snapshot


@register(
    "events_user_features",
    group="stats-ml",
    oracle="""
    WITH f AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS n_purchases,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS spend_cents,
             MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_seen_us
      FROM events GROUP BY user_id
    ), t AS (SELECT MAX(last_seen_us) AS now_us FROM f)
    SELECT f.user_id, f.n_events, f.n_purchases, f.n_types, f.spend_cents,
           (t.now_us - f.last_seen_us) // 3600000000 AS recency_hours
    FROM f, t
    """,
)
def events_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user feature-store snapshot — the feature-engineering
    aggregation that feeds every downstream model (churn, LTV, the NB
    quality gate): activity counts, purchase count and exact-cents
    spend, behavioral breadth (distinct types) and recency in hours
    against the corpus watermark, all from ONE user_id shuffle with
    conditional aggregates (no per-feature scans — the agg_filtered
    discipline applied to feature assembly). The corpus watermark rides
    back as a one-row broadcast. Streaming-ready: the same aggregate
    shapes run incrementally as stream_upsert_latest-style state."""
    f = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.unix_micros("ts").alias("ts_us"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias("n_purchases"),
            F.countDistinct("event_type").alias("n_types"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("cents")).otherwise(0)
            ).alias("spend_cents"),
            F.max("ts_us").alias("last_seen_us"),
        )
        # checkpointed: the watermark row and the output both read this
        # per-user rollup — one corpus scan, not two
        .localCheckpoint(eager=False)
    )
    t = f.agg(F.max("last_seen_us").alias("now_us"))
    return f.crossJoin(F.broadcast(t)).select(
        "user_id",
        "n_events",
        "n_purchases",
        "n_types",
        "spend_cents",
        F.expr("(now_us - last_seen_us) div 3600000000").alias("recency_hours"),
    )


# ---------------------------------------------------------------------------
# events_active_users — DAU / WAU / MAU rolling distinct actives


@register(
    "events_active_users",
    group="stats-ml",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      FROM events
    ), days AS (SELECT DISTINCT day FROM ud),
    wau AS (
      SELECT d.day, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
      FROM days d JOIN ud ON ud.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day
    ), mau AS (
      SELECT d.day, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS mau
      FROM days d JOIN ud ON ud.day BETWEEN d.day - 27 AND d.day
      GROUP BY d.day
    ), dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    )
    SELECT dau.day * 86400000000 AS day_us, dau.dau, wau.wau, mau.mau,
           (dau.dau * 10000) // mau.mau AS stickiness_bp
    FROM dau JOIN wau ON wau.day = dau.day JOIN mau ON mau.day = dau.day
    """,
)
def events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU and the DAU/MAU stickiness ratio — the product-
    analytics staple. Scalable shape: the corpus first collapses to the
    DISTINCT (user, day) incidence table (one shuffle; at 100 TB this
    is the only pass over raw events), and each trailing window is that
    table exploded to the ≤7 / ≤28 report-days it covers followed by a
    distinct count per day — cover-list replication on the SMALL
    incidence table, never a per-day re-scan and never a range join of
    raw events. Exact counts; the sketch alternative at extreme
    cardinality is [[stream_hll_distinct]]'s register merge per day,
    where trailing windows become register-wise max over ≤28 daily
    sketches. Stickiness is truncating-integer basis points."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day")
    )
    # the (user, day) incidence table: the one pass over raw events
    ud = ev.distinct().localCheckpoint(eager=False)
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))

    def trailing(width: int, name: str) -> DataFrame:
        cover = ud.select(
            "user_id",
            F.explode(F.sequence(F.col("day"), F.col("day") + (width - 1))).alias("day"),
        )
        return (
            cover.join(days, "day")
            .distinct()
            .groupBy("day")
            .agg(F.count(F.lit(1)).alias(name))
        )

    out = (
        dau.join(trailing(7, "wau"), "day")
        .join(trailing(28, "mau"), "day")
    )
    return out.select(
        (F.col("day") * 86400000000).alias("day_us"),
        "dau",
        "wau",
        "mau",
        F.expr("dau * 10000 div mau").alias("stickiness_bp"),
    )


# ---------------------------------------------------------------------------
# ml_eval_metrics — precision / recall / F1 from the NB confusion matrix


def _eval_oracle() -> str:
    from .registry import REGISTRY as _R

    nb = _R["ml_nb_classify"].oracle
    return f"""
    WITH conf AS ({nb}),
    trues AS (
      SELECT lang_true AS lang, CAST(SUM(n_docs) AS BIGINT) AS true_total
      FROM conf GROUP BY 1
    ), preds AS (
      SELECT lang_pred AS lang, CAST(SUM(n_docs) AS BIGINT) AS pred_total
      FROM conf GROUP BY 1
    ), tps AS (
      SELECT lang_true AS lang, CAST(SUM(n_docs) AS BIGINT) AS tp
      FROM conf WHERE lang_true = lang_pred GROUP BY 1
    )
    SELECT t.lang,
           COALESCE(tp.tp, 0) AS tp,
           COALESCE(p.pred_total, 0) - COALESCE(tp.tp, 0) AS fp,
           t.true_total - COALESCE(tp.tp, 0) AS fn,
           CASE WHEN COALESCE(p.pred_total, 0) > 0
                THEN (COALESCE(tp.tp, 0) * 10000) // p.pred_total END AS precision_bp,
           (COALESCE(tp.tp, 0) * 10000) // t.true_total AS recall_bp,
           (COALESCE(tp.tp, 0) * 20000)
             // (t.true_total + COALESCE(p.pred_total, 0)) AS f1_bp
    FROM trues t
    LEFT JOIN preds p ON p.lang = t.lang
    LEFT JOIN tps tp ON tp.lang = t.lang
    """


@register("ml_eval_metrics", group="stats-ml", oracle=_eval_oracle())
def ml_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 over [[ml_nb_classify]]'s
    language confusion matrix — the evaluation readout every classifier
    gate ships with. Works entirely on the |langs|²-row confusion
    table: marginals give pred/true totals, the diagonal gives TP, and
    the metrics are truncating-integer basis points from exact counts
    (F1 = 2TP/(true+pred) — the harmonic mean without a float in
    sight; precision is NULL for a class the model never predicts,
    identically both engines). At 100 TB the cost IS the classifier's;
    this adds |classes| rows of algebra."""
    conf = ml_nb_classify(spark, sf_dir).localCheckpoint(eager=False)
    trues = conf.groupBy(F.col("lang_true").alias("lang")).agg(
        F.sum("n_docs").alias("true_total")
    )
    preds = conf.groupBy(F.col("lang_pred").alias("lang")).agg(
        F.sum("n_docs").alias("pred_total")
    )
    tps = (
        conf.filter(F.col("lang_true") == F.col("lang_pred"))
        .groupBy(F.col("lang_true").alias("lang"))
        .agg(F.sum("n_docs").alias("tp"))
    )
    j = (
        trues.join(preds, "lang", "left")
        .join(tps, "lang", "left")
        .select(
            "lang",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            (F.coalesce("pred_total", F.lit(0)) - F.coalesce("tp", F.lit(0))).alias("fp"),
            (F.col("true_total") - F.coalesce("tp", F.lit(0))).alias("fn"),
            F.coalesce("pred_total", F.lit(0)).alias("pt"),
            "true_total",
        )
    )
    return j.select(
        "lang",
        "tp",
        "fp",
        "fn",
        F.when(F.col("pt") > 0, F.expr("tp * 10000 div pt")).alias("precision_bp"),
        F.expr("tp * 10000 div true_total").alias("recall_bp"),
        F.expr("tp * 20000 div (true_total + pt)").alias("f1_bp"),
    )


# ---------------------------------------------------------------------------
# sample_class_balance — exact downsampling to the minority class


@register(
    "sample_class_balance",
    group="stats-ml",
    oracle="""
    WITH n AS (
      SELECT CAST(MIN(c) AS BIGINT) AS n_min
      FROM (SELECT COUNT(*) AS c FROM documents GROUP BY lang)
    ), r AS (
      SELECT doc_id, lang,
             md5(CAST(doc_id AS VARCHAR) || '#' || lang) AS rk,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '#' || lang), doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS class_rank
    FROM r, n WHERE rn <= n.n_min
    """,
)
def sample_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact class balancing: downsample every language to the MINORITY
    class's count by md5-rank — the class-imbalance fix applied before
    training a classifier (contrast [[sample_stratified]]: that keeps a
    RATE per stratum, this keeps an exact COUNT; both are pure
    functions of row content, so reruns and repartitioning pick the
    same rows). One window shuffle partitioned by class ranks the hash
    permutation; the minority count rides as a one-row broadcast. At
    100 TB per-class rank is the only shuffle, and the window is
    WindowGroupLimit-prunable when the limit is a literal — with the
    data-derived n_min the full rank runs, the price of exactness."""
    d = table(spark, sf_dir, "documents")
    n = d.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).agg(
        F.min("c").alias("n_min")
    )
    rk = F.md5(F.concat_ws("#", F.col("doc_id"), F.col("lang")).cast("binary"))
    from pyspark.sql import Window

    rn = F.row_number().over(Window.partitionBy("lang").orderBy(rk, F.col("doc_id")))
    r = d.select("doc_id", "lang").withColumn("rn", rn)
    return (
        r.crossJoin(F.broadcast(n))
        .filter(F.col("rn") <= F.col("n_min"))
        .select("doc_id", "lang", F.col("rn").cast("long").alias("class_rank"))
    )


# ---------------------------------------------------------------------------
# ts_autocorr — lag-k autocorrelation of the hourly rate


_ACF_LAGS = (1, 2, 3)


@register(
    "ts_autocorr",
    group="stats-ml",
    oracle=f"""
    WITH c AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS bucket_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type, list(n_events ORDER BY bucket_us) AS xs
      FROM c GROUP BY event_type
    ), lagged AS (
      -- list-function form: generate_series/list_transform lambdas may
      -- reference the FROM row (xs, l.lag); the table-function form may
      -- not take lateral parameters in a scalar subquery
      SELECT event_type, l.lag AS lag, len(xs) - l.lag AS n,
             list_sum(xs[1 : len(xs) - l.lag]) AS sx,
             list_sum(xs[l.lag + 1 : len(xs)]) AS sy,
             list_sum(list_transform(xs[1 : len(xs) - l.lag], x -> x * x)) AS sxx,
             list_sum(list_transform(xs[l.lag + 1 : len(xs)], x -> x * x)) AS syy,
             list_sum(list_transform(generate_series(1, len(xs) - l.lag),
                                     i -> xs[i] * xs[i + l.lag])) AS sxy
      FROM s, (VALUES {", ".join(f"({k})" for k in _ACF_LAGS)}) l(lag)
      WHERE len(xs) > l.lag + 1
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
           (round(
             CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                    * CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)),
             6) + 0.0) AS acf
    FROM lagged
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1/2/3 autocorrelation of the hourly event rate per type — the
    serial-dependence statistic behind every forecasting decision
    ([[ts_holt_linear]] assumes it; this measures it). The Pearson
    machinery of [[stats_corr_matrix]] applied to (x_t, x_{t+k}) pairs:
    per type and lag, the five moments are exact BIGINT HOF sums over
    the collected bucket list (zip of the list with its own k-shifted
    slice — no self-join of the rollup, no second shuffle), numerators
    in DECIMAL(38,0)/HUGEINT, one double chain per output row. Types
    shorter than lag+2 buckets are excluded in both engines.

    Shape at scale: identical to the fold family — raw events pay the
    (type, hour) rollup shuffle once; the O(lags · buckets) moment work
    rides the tiny per-type list."""
    c = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000 * 3600000000").alias("bucket_us"),
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    xs = F.transform(
        F.array_sort(F.collect_list(F.struct("bucket_us", "n_events"))),
        lambda s: s["n_events"],
    )
    s = c.groupBy("event_type").agg(xs.alias("xs"))
    lags = s.select(
        "event_type",
        "xs",
        F.explode(F.array(*[F.lit(k) for k in _ACF_LAGS])).alias("lag"),
    ).filter(F.size("xs") > F.col("lag") + 1)
    head = F.expr("slice(xs, 1, size(xs) - lag)")
    tail_ = F.expr("slice(xs, lag + 1, size(xs) - lag)")
    zipped = lags.select(
        "event_type",
        "lag",
        (F.size("xs") - F.col("lag")).alias("n"),
        F.aggregate(head, F.lit(0).cast("long"), lambda a, x: a + x).alias("sx"),
        F.aggregate(tail_, F.lit(0).cast("long"), lambda a, x: a + x).alias("sy"),
        F.aggregate(head, F.lit(0).cast("long"), lambda a, x: a + x * x).alias("sxx"),
        F.aggregate(tail_, F.lit(0).cast("long"), lambda a, x: a + x * x).alias("syy"),
        F.aggregate(
            F.zip_with(head, tail_, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sxy"),
    )
    cov = (_dec(F.col("n")) * F.col("sxy") - _dec(F.col("sx")) * F.col("sy")).cast("double")
    vx = (_dec(F.col("n")) * F.col("sxx") - _dec(F.col("sx")) * F.col("sx")).cast("double")
    vy = (_dec(F.col("n")) * F.col("syy") - _dec(F.col("sy")) * F.col("sy")).cast("double")
    return zipped.select(
        "event_type",
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        round_pos(cov / F.sqrt(vx * vy), 6).alias("acf"),
    )


# ---------------------------------------------------------------------------
# ts_seasonality_profile — hour-of-day seasonal indices


@register(
    "ts_seasonality_profile",
    group="stats-ml",
    oracle="""
    WITH e AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hod,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      FROM events
    ), cell AS (
      SELECT event_type, hod,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
      FROM e GROUP BY 1, 2
    ), t AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS n_hods
      FROM cell GROUP BY 1
    )
    SELECT cell.event_type, cell.hod, cell.n,
           (cell.n * 10000 * t.n_hods) // t.tot AS seasonal_index_bp
    FROM cell JOIN t ON t.event_type = cell.event_type
    """,
)
def ts_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal index per event type — the diurnal profile
    (index 10000 bp = that hour carries exactly its uniform share;
    20000 = double): the multiplicative-decomposition seasonal factor
    computed as exact truncating-integer basis points, n·10000·H / Σn.
    One (type, hod) rollup shuffle, per-type totals rolled from the
    ≤ |types|·24-cell table and joined back — the contingency shape of
    [[stats_chi2_independence]] (which tests whether THIS profile is
    flat) emitting the profile itself. Hours from epoch-micros
    arithmetic; no timezone surface."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        (F.expr("unix_micros(ts) div 3600000000") % 24).alias("hod"),
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    )
    cell = (
        e.groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("day").alias("n_days"))
        .localCheckpoint(eager=False)
    )
    t = cell.groupBy("event_type").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("n_hods")
    )
    return cell.join(F.broadcast(t), "event_type").select(
        "event_type",
        "hod",
        "n",
        F.expr("n * 10000 * n_hods div tot").alias("seasonal_index_bp"),
    )


# ---------------------------------------------------------------------------
# stats_mann_whitney — rank-sum test over the value-domain rollup (round 12)


@register(
    "stats_mann_whitney",
    group="stats-ml",
    oracle="""
    WITH b AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
      FROM events WHERE event_type IN ('click', 'purchase')
    ), g AS (
      SELECT v, CAST(SUM(is_a) AS BIGINT) AS a, CAST(SUM(1 - is_a) AS BIGINT) AS b
      FROM b GROUP BY v
    ), cum AS (
      SELECT v, a, a + b AS t,
             CAST(SUM(a + b) OVER (ORDER BY v) AS BIGINT) - (a + b) AS before
      FROM g
    ), s AS (
      SELECT CAST(SUM(a) AS BIGINT) AS n1,
             CAST(SUM(t - a) AS BIGINT) AS n2,
             CAST(SUM(a * (2 * before + t + 1)) AS BIGINT) AS r1_x2,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tie_cubes
      FROM cum
    )
    SELECT n1, n2,
           r1_x2 - n1 * (n1 + 1) AS u1_x2,
           2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)) AS u2_x2,
           tie_cubes,
           (round(
             (CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE) - CAST(n1 * n2 AS DOUBLE)) / 2.0
             / sqrt(
                 CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                 * (CAST(n1 + n2 + 1 AS DOUBLE)
                    - CAST(tie_cubes AS DOUBLE)
                      / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))
               ),
             6) + 0.0) AS z_score,
           (round(
             CAST((r1_x2 - n1 * (n1 + 1)) - (2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)))
                  AS DOUBLE)
             / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)),
             6) + 0.0) AS rank_biserial
    FROM s
    """,
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between the click and
    purchase value distributions — the nonparametric median-shift
    companion to [[stats_two_sample]]'s mean test and
    [[stats_ks_two_sample]]'s full-distribution distance. EXACT until
    the final scalars: raw events collapse once to the per-distinct-
    value rollup (the value-domain shape — bounded by distinct cents,
    not row count), tie MIDRANKS are kept as exact DOUBLED integers
    (2·midrank = 2·|values below| + t + 1, always integral), so the
    rank sum R1, both U statistics (doubled) and the tie-correction
    term sum(t^3 - t) are exact BIGINTs under one partial-agg shuffle.
    The normal-approximation z (tie-corrected variance) and the
    rank-biserial effect size are each one identical IEEE op chain per
    engine, then round(6). At 100 TB: same contract as the KS twin —
    pre-bin continuous values to reporting precision; the cumulative
    runs over the tiny domain table."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    b = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("v"),
        (F.col("event_type") == "click").cast("long").alias("is_a"),
    )
    g = b.groupBy("v").agg(
        F.sum("is_a").alias("a"), F.sum(1 - F.col("is_a")).alias("bb")
    )
    from pyspark.sql import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    t = F.col("a") + F.col("bb")
    cum = g.select(
        "v",
        "a",
        t.alias("t"),
        (F.sum(t).over(w) - t).alias("before"),
    )
    s = cum.agg(
        F.sum("a").alias("n1"),
        F.sum(F.col("t") - F.col("a")).alias("n2"),
        F.sum(F.col("a") * (2 * F.col("before") + F.col("t") + 1)).alias("r1_x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_cubes"),
    )
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    u2_x2 = 2 * F.col("n1") * F.col("n2") - u1_x2
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    z = (
        (u1_x2.cast("double") - (F.col("n1") * F.col("n2")).cast("double"))
        / F.lit(2.0)
        / F.sqrt(
            n1d * n2d / F.lit(12.0)
            * (
                (F.col("n1") + F.col("n2") + 1).cast("double")
                - F.col("tie_cubes").cast("double")
                / (
                    (F.col("n1") + F.col("n2")).cast("double")
                    * (F.col("n1") + F.col("n2") - 1).cast("double")
                )
            )
        )
    )
    return s.select(
        "n1",
        "n2",
        u1_x2.alias("u1_x2"),
        u2_x2.alias("u2_x2"),
        "tie_cubes",
        round_pos(z, 6).alias("z_score"),
        round_pos(
            (u1_x2 - u2_x2).cast("double") / (F.lit(2.0) * n1d * n2d), 6
        ).alias("rank_biserial"),
    )


# ---------------------------------------------------------------------------
# sample_ab_assign — deterministic experiment assignment + SRM gate (round 12)


_AB_VARIANTS = (("A", 50), ("B", 25), ("C", 25))  # name, percent


def _ab_oracle() -> str:
    from ..functions.text import SQL_TOKEN_HASH_WIDE

    h = SQL_TOKEN_HASH_WIDE.format(t="md5(CAST(c_custkey AS VARCHAR))")
    cases = " ".join(
        f"WHEN bucket < {sum(p for _, p in _AB_VARIANTS[: i + 1])} THEN '{name}'"
        for i, (name, _) in enumerate(_AB_VARIANTS)
    )
    weights = " ".join(
        f"WHEN variant = '{name}' THEN {pct}" for name, pct in _AB_VARIANTS
    )
    return f"""
    WITH u AS (
      SELECT c_custkey, ({h}) % 100 AS bucket FROM customer
    ), v AS (
      SELECT c_custkey, CASE {cases} END AS variant FROM u
    ), cnt AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(CASE {weights} END AS BIGINT) AS pct
      FROM v GROUP BY variant
    ), tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS total FROM cnt)
    SELECT c.variant, c.n_users,
           c.pct * 100 AS expected_bp,
           CAST(t.total * c.pct AS BIGINT) AS expected_x100,
           CAST((100 * c.n_users - t.total * c.pct)
                * (100 * c.n_users - t.total * c.pct)
                * (100 / c.pct) AS BIGINT) AS chi2_num_scaled,
           (round(CAST((100 * c.n_users - t.total * c.pct)
                * (100 * c.n_users - t.total * c.pct)
                * (100 / c.pct) AS DOUBLE) / (10000.0 * t.total), 6) + 0.0)
             AS chi2_contrib
    FROM cnt c, tot t
    """


@register("sample_ab_assign", group="stats-ml", oracle=_ab_oracle())
def sample_ab_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B/C experiment assignment with the sample-ratio-
    mismatch (SRM) chi-square gate — the experimentation primitive every
    event pipeline needs: variant = pure function of the unit id
    (portable token_hash_wide of md5(custkey) mod 100 against cumulative
    percent thresholds 50/25/25), so reruns, repartitionings and both
    engines assign identically; exposure logging is a projection, never
    a random() call. The SRM check is EXACT integer arithmetic end to
    end: with weights w of 50/25/25, sum((100n - N*w)^2 * (100/w)) is an
    integral chi-square numerator (scale LCM 100), and each variant's
    contribution is that integer over 10^4*N — one IEEE division, then
    round(6). Flag the experiment when the total over the 3 rows
    exceeds the chi2(2) critical value. One scan, one 3-group partial
    agg, a one-row broadcast total — flat at any N."""
    from ..functions.text import token_hash_wide

    c = table(spark, sf_dir, "customer")
    bucket = (
        token_hash_wide(F.md5(F.col("c_custkey").cast("string").cast("binary"))) % 100
    )
    variant = F.lit(None).cast("string")
    acc = 0
    expr = None
    for name, pct in _AB_VARIANTS:
        acc += pct
        cond = F.col("bucket") < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    pct_expr = None
    for name, pct in _AB_VARIANTS:
        pct_expr = (
            F.when(F.col("variant") == name, pct)
            if pct_expr is None
            else pct_expr.when(F.col("variant") == name, pct)
        )
    cnt = (
        c.select(bucket.alias("bucket"))
        .select(expr.alias("variant"))
        .groupBy("variant")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .withColumn("pct", pct_expr.cast("long"))
    )
    tot = cnt.agg(F.sum("n_users").alias("total"))
    dev = 100 * F.col("n_users") - F.col("total") * F.col("pct")
    num = (dev * dev * (100 / F.col("pct")).cast("long")).alias("chi2_num_scaled")
    return cnt.crossJoin(F.broadcast(tot)).select(
        "variant",
        "n_users",
        (F.col("pct") * 100).alias("expected_bp"),
        (F.col("total") * F.col("pct")).alias("expected_x100"),
        num,
        round_pos(
            (dev * dev * (100 / F.col("pct")).cast("long")).cast("double")
            / (F.lit(10000.0) * F.col("total")),
            6,
        ).alias("chi2_contrib"),
    )


# ---------------------------------------------------------------------------
# stats_ab_cuped — variance-reduced experiment readout (round 12)


def _cuped_oracle() -> str:
    from ..functions.text import SQL_TOKEN_HASH_WIDE

    h = SQL_TOKEN_HASH_WIDE.format(t="md5(CAST(user_id AS VARCHAR))")
    cases = " ".join(
        f"WHEN bucket < {sum(p for _, p in _AB_VARIANTS[: i + 1])} THEN '{name}'"
        for i, (name, _) in enumerate(_AB_VARIANTS)
    )
    theta = (
        "(CAST(CAST(m.n AS HUGEINT) * m.sxy - CAST(m.sx AS HUGEINT) * m.sy AS DOUBLE)"
        " / CAST(CAST(m.n AS HUGEINT) * m.sxx - CAST(m.sx AS HUGEINT) * m.sx AS DOUBLE))"
    )
    num = "CAST(CAST(m.n AS HUGEINT) * m.sxy - CAST(m.sx AS HUGEINT) * m.sy AS DOUBLE)"
    denx = "CAST(CAST(m.n AS HUGEINT) * m.sxx - CAST(m.sx AS HUGEINT) * m.sx AS DOUBLE)"
    deny = "CAST(CAST(m.n AS HUGEINT) * m.syy - CAST(m.sy AS HUGEINT) * m.sy AS DOUBLE)"
    return f"""
    WITH d AS (
      SELECT user_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT) AS day,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END AS cents
      FROM events
    ), b AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM d),
    u AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN day < b.mid THEN cents ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN day >= b.mid THEN cents ELSE 0 END) AS BIGINT) AS y
      FROM d, b GROUP BY user_id
    ), v AS (
      SELECT x, y, CASE {cases} END AS variant
      FROM (SELECT x, y, ({h}) % 100 AS bucket FROM u)
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM v
    ), g AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x) AS BIGINT) AS sxv, CAST(SUM(y) AS BIGINT) AS syv
      FROM v GROUP BY variant
    )
    SELECT g.variant, g.n_users, g.syv AS post_cents,
           (round(CAST(g.syv AS DOUBLE) / g.n_users, 6) + 0.0) AS mean_post,
           (round(CAST(g.syv AS DOUBLE) / g.n_users
                  - {theta} * (CAST(g.sxv AS DOUBLE) / g.n_users
                               - CAST(m.sx AS DOUBLE) / m.n), 6) + 0.0) AS mean_adj,
           (round({theta}, 6) + 0.0) AS theta,
           (round(({num} * {num}) / ({denx} * {deny}), 6) + 0.0) AS rho2
    FROM g, m
    """


@register("stats_ab_cuped", group="stats-ml", oracle=_cuped_oracle())
def stats_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM'13)
    — the analysis half of [[sample_ab_assign]]: per-user PRE-period
    spend (days before the corpus midpoint) is the covariate, POST-
    period spend the metric; theta = cov(x,y)/var(x) is fit POOLED from
    six exact BIGINT moments (the [[ml_linreg_normal]] moment pattern —
    cross products through DECIMAL(38,0)/HUGEINT, one partial-agg
    shuffle over per-user rows), and each variant's adjusted mean
    y_v - theta*(x_v - x_pooled) removes the pre-period variance
    component, shrinking the experiment's CI by a factor of 1 - rho^2
    (rho^2 emitted from the same moments). Variant assignment is the
    sample_ab_assign hash — a pure function of user_id, identical both
    engines. Shape at scale: one user_id shuffle builds per-user (x, y),
    everything after runs over |variants| + 1 tiny rows; the day
    midpoint is a one-row broadcast, never a second corpus pass."""
    from ..functions.text import token_hash_wide

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("cents"),
    )
    b = ev.agg(
        ((F.min("day") + F.max("day") + 1).cast("long") / 2)
        .cast("long")
        .alias("mid")
    )
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("day") < F.col("mid"), F.col("cents")).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("day") >= F.col("mid"), F.col("cents")).otherwise(0)).alias("y"),
        )
    )
    bucket = (
        token_hash_wide(F.md5(F.col("user_id").cast("string").cast("binary"))) % 100
    )
    expr = None
    acc = 0
    for name, pct in _AB_VARIANTS:
        acc += pct
        cond = F.col("bucket") < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    v = u.select(
        "x", "y", bucket.alias("bucket")
    ).select("x", "y", expr.alias("variant")).localCheckpoint(eager=False)
    m = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    g = v.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("sxv"),
        F.sum("y").alias("syv"),
    )
    num = (_dec(F.col("n")) * F.col("sxy") - _dec(F.col("sx")) * F.col("sy")).cast("double")
    denx = (_dec(F.col("n")) * F.col("sxx") - _dec(F.col("sx")) * F.col("sx")).cast("double")
    deny = (_dec(F.col("n")) * F.col("syy") - _dec(F.col("sy")) * F.col("sy")).cast("double")
    theta = num / denx
    return g.crossJoin(F.broadcast(m)).select(
        "variant",
        "n_users",
        F.col("syv").alias("post_cents"),
        round_pos(F.col("syv").cast("double") / F.col("n_users"), 6).alias("mean_post"),
        round_pos(
            F.col("syv").cast("double") / F.col("n_users")
            - theta
            * (
                F.col("sxv").cast("double") / F.col("n_users")
                - F.col("sx").cast("double") / F.col("n")
            ),
            6,
        ).alias("mean_adj"),
        round_pos(theta, 6).alias("theta"),
        round_pos((num * num) / (denx * deny), 6).alias("rho2"),
    )


# ---------------------------------------------------------------------------
# stats_anova_oneway — one-way ANOVA F test across event types


@register(
    "stats_anova_oneway",
    group="stats-ml",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxx
      FROM events GROUP BY event_type
    ), g AS (
      SELECT event_type, n, sx, sxx,
             CAST(CAST(sx AS HUGEINT) * sx AS DOUBLE) / CAST(n AS DOUBLE) AS t
      FROM m
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS n_total,
             CAST(SUM(sx) AS BIGINT) AS gx,
             CAST(SUM(sxx) AS BIGINT) AS gxx,
             list_reduce(
               list_prepend(0.0, list(t ORDER BY event_type)),
               (a, b) -> a + b
             ) AS tsum
      FROM g
    ), e AS (
      SELECT k, n_total,
             tsum - CAST(CAST(gx AS HUGEINT) * gx AS DOUBLE) / CAST(n_total AS DOUBLE)
               AS ssb,
             CAST(gxx AS DOUBLE) - tsum AS ssw
      FROM tot
    )
    SELECT k, n_total,
           (round(ssb, 4) + 0.0) AS ss_between,
           (round(ssw, 4) + 0.0) AS ss_within,
           (round((ssb / (k - 1)) / (ssw / (n_total - k)), 6) + 0.0) AS f_stat,
           (round(ssb / (ssb + ssw), 6) + 0.0) AS eta_sq
    FROM e
    """,
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F test of the cents value across the five event
    types — does ANY group mean differ — completing the hypothesis-test
    family next to the two-group mean shift ([[stats_two_sample]]), the
    distribution shift ([[stats_ks_two_sample]]) and the rank shift
    ([[stats_mann_whitney]]). The corpus collapses to three exact BIGINT
    moments per group (n, Σx, Σx²) in ONE partial-agg shuffle; each
    group's Σx²ᵍ/nᵍ term is one HUGEINT/DECIMAL(38,0)-exact product cast
    to double and ONE division, and the cross-group sum — the only
    order-sensitive float reduction — folds in sorted event_type order
    via sorted-collect + aggregate() (the [[ts_ewma_hourly]] discipline),
    so SSB, SSW, F and eta² are the identical IEEE op chain both engines.

    At 100 TB this is |groups| × 3 scalars over one exchange — the
    variance decomposition is free; the fold is O(k) on one row."""
    cents = F.round(F.col("value") * 100).cast("long")
    m = (
        table(spark, sf_dir, "events")
        .select("event_type", cents.alias("x"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    t = (_dec(F.col("sx")) * F.col("sx")).cast("double") / F.col("n").cast("double")
    g = m.withColumn("t", t)
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_total"),
        F.sum("sx").alias("gx"),
        F.sum("sxx").alias("gxx"),
        F.array_sort(F.collect_list(F.struct("event_type", "t"))).alias("terms"),
    )
    tsum = F.aggregate(
        F.transform(F.col("terms"), lambda s: s["t"]),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    e = tot.select(
        "k",
        "n_total",
        (
            tsum
            - (_dec(F.col("gx")) * F.col("gx")).cast("double")
            / F.col("n_total").cast("double")
        ).alias("ssb"),
        (F.col("gxx").cast("double") - tsum).alias("ssw"),
    )
    return e.select(
        "k",
        "n_total",
        round_pos(F.col("ssb"), 4).alias("ss_between"),
        round_pos(F.col("ssw"), 4).alias("ss_within"),
        round_pos(
            (F.col("ssb") / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n_total") - F.col("k"))),
            6,
        ).alias("f_stat"),
        round_pos(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# ml_decision_stump — exact best-split decision stump (the GBDT primitive)


@register(
    "ml_decision_stump",
    group="stats-ml",
    oracle="""
    WITH e AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS BIGINT) AS y
      FROM events
    ), r AS (
      SELECT cents, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
      FROM e GROUP BY cents
    ), c AS (
      SELECT cents,
             CAST(SUM(n) OVER w AS BIGINT) AS n_left,
             CAST(SUM(pos) OVER w AS BIGINT) AS pos_left
      FROM r
      WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_all, CAST(SUM(pos) AS BIGINT) AS pos_all FROM r
    ), cand AS (
      SELECT c.cents, c.n_left, c.pos_left,
             tot.n_all - c.n_left AS n_right,
             tot.pos_all - c.pos_left AS pos_right,
             tot.n_all AS n_all, tot.pos_all AS pos_all
      FROM c, tot
      WHERE c.n_left < tot.n_all
    ), s AS (
      SELECT *,
             CAST(CAST(pos_left AS HUGEINT) * (n_left - pos_left) AS DOUBLE)
               / CAST(n_left AS DOUBLE)
             + CAST(CAST(pos_right AS HUGEINT) * (n_right - pos_right) AS DOUBLE)
               / CAST(n_right AS DOUBLE) AS wimp
      FROM cand
    )
    SELECT cents AS split_cents, n_left, pos_left, n_right, pos_right,
           (round(2.0 * wimp / CAST(n_all AS DOUBLE), 6) + 0.0) AS gini_children,
           (round(2.0 * (CAST(CAST(pos_all AS HUGEINT) * (n_all - pos_all) AS DOUBLE)
                         / CAST(n_all AS DOUBLE)) / CAST(n_all AS DOUBLE), 6) + 0.0)
             AS gini_parent,
           (round(2.0 * (CAST(CAST(pos_all AS HUGEINT) * (n_all - pos_all) AS DOUBLE)
                         / CAST(n_all AS DOUBLE)) / CAST(n_all AS DOUBLE)
                  - 2.0 * wimp / CAST(n_all AS DOUBLE), 6) + 0.0) AS gini_gain
    FROM s
    ORDER BY wimp, cents
    LIMIT 1
    """,
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact best-split decision stump on the cents value predicting the
    purchase label — the base learner of every gradient-boosted tree and
    the histogram-split kernel inside LightGBM/XGBoost, run as a pure
    DataFrame plan: candidate thresholds are the DISTINCT value rollup
    (the [[stats_ks_two_sample]] value-domain discipline — cumulative
    class counts run over ≤|domain| rollup rows, never raw rows), the
    weighted Gini impurity of each split folds to 2·(pLqL/nL + pRqR/nR)/n
    with EXACT HUGEINT/DECIMAL(38,0) count products and one division per
    side (identical IEEE chain both engines), and the argmin is a single
    min(struct(wimp, cents)) — deterministic ties to the smallest
    threshold.

    Shape at scale: one map-side-combined rollup shuffle on the value
    key; the cumulative window runs over the bounded value domain (a
    fixed-width histogram at 100 TB — exactly what the GBDT engines do);
    totals ride as a one-row broadcast. Output is ONE row at any n."""
    ev = table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )
    r = ev.groupBy("cents").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    wc = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    c = r.select(
        "cents",
        F.sum("n").over(wc).alias("n_left"),
        F.sum("pos").over(wc).alias("pos_left"),
    )
    tot = r.agg(
        F.sum("n").alias("n_all"), F.sum("pos").alias("pos_all")
    )
    cand = (
        c.join(F.broadcast(tot))
        .where(F.col("n_left") < F.col("n_all"))
        .select(
            "cents",
            "n_left",
            "pos_left",
            (F.col("n_all") - F.col("n_left")).alias("n_right"),
            (F.col("pos_all") - F.col("pos_left")).alias("pos_right"),
            "n_all",
            "pos_all",
        )
    )
    wimp = (
        (_dec(F.col("pos_left")) * (F.col("n_left") - F.col("pos_left"))).cast("double")
        / F.col("n_left").cast("double")
        + (_dec(F.col("pos_right")) * (F.col("n_right") - F.col("pos_right"))).cast("double")
        / F.col("n_right").cast("double")
    )
    s = cand.withColumn("wimp", wimp)
    best = s.agg(
        F.min(
            F.struct(
                "wimp", "cents", "n_left", "pos_left", "n_right", "pos_right",
                "n_all", "pos_all",
            )
        ).alias("b")
    ).select("b.*")
    gini_parent = (
        2.0
        * (
            (_dec(F.col("pos_all")) * (F.col("n_all") - F.col("pos_all"))).cast("double")
            / F.col("n_all").cast("double")
        )
        / F.col("n_all").cast("double")
    )
    gini_children = 2.0 * F.col("wimp") / F.col("n_all").cast("double")
    return best.select(
        F.col("cents").alias("split_cents"),
        "n_left",
        "pos_left",
        "n_right",
        "pos_right",
        round_pos(gini_children, 6).alias("gini_children"),
        round_pos(gini_parent, 6).alias("gini_parent"),
        round_pos(gini_parent - gini_children, 6).alias("gini_gain"),
    )


# ---------------------------------------------------------------------------
# events_retention_churn — weekly growth accounting (round 12)


_WEEK_US = 604_800_000_000


@register(
    "events_retention_churn",
    group="stats-ml",
    oracle=f"""
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // {_WEEK_US} AS BIGINT) AS week
      FROM events
    ), lagd AS (
      SELECT user_id, week,
             MIN(week) OVER (PARTITION BY user_id) AS first_week,
             LAG(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
             LEAD(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week
      FROM wk
    ), gmax AS (SELECT MAX(week) AS max_week FROM wk),
    act AS (
      SELECT week,
             CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(COUNT(*) FILTER (WHERE week = first_week) AS BIGINT) AS n_new,
             CAST(COUNT(*) FILTER (WHERE prev_week = week - 1) AS BIGINT) AS n_retained,
             CAST(COUNT(*) FILTER (WHERE week > first_week
                                     AND (prev_week IS NULL OR prev_week < week - 1))
                  AS BIGINT) AS n_resurrected
      FROM lagd GROUP BY week
    ), ch AS (
      SELECT week + 1 AS week, CAST(COUNT(*) AS BIGINT) AS n_churned
      FROM lagd, gmax
      WHERE week < gmax.max_week
        AND (next_week IS NULL OR next_week > week + 1)
      GROUP BY week + 1
    )
    SELECT COALESCE(act.week, ch.week) AS week,
           COALESCE(act.n_active, 0) AS n_active,
           COALESCE(act.n_new, 0) AS n_new,
           COALESCE(act.n_retained, 0) AS n_retained,
           COALESCE(act.n_resurrected, 0) AS n_resurrected,
           COALESCE(ch.n_churned, 0) AS n_churned
    FROM act FULL OUTER JOIN ch ON ch.week = act.week
    """,
)
def events_retention_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting — the new/retained/resurrected/churned
    decomposition every growth team reports (n_new + n_retained +
    n_resurrected = n_active by construction; churn for week w counts
    users active in w−1 but not w, right-censored at the corpus edge so
    the final week never reports phantom churn). The classification is a
    pure function of each user's distinct-week timeline: raw events
    collapse ONCE to the (user, week) incidence table (the
    [[events_active_users]] discipline), three window functions share
    the user_id partitioning (min / lag / lead — one exchange), and the
    two rollups are week-keyed partial aggs over the tiny incidence
    table joined week-on-week.

    At 100 TB: the only raw-data exchange is the DISTINCT incidence
    collapse; everything after runs over O(users·weeks-active) rows and
    the final join is over O(weeks) rows."""
    wk = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(f"unix_micros(ts) div {_WEEK_US}").alias("week"),
        )
        .distinct()
    )
    wu = Window.partitionBy("user_id")
    wo = wu.orderBy("week")
    lagd = wk.select(
        "user_id",
        "week",
        F.min("week").over(wu).alias("first_week"),
        F.lag("week").over(wo).alias("prev_week"),
        F.lead("week").over(wo).alias("next_week"),
    ).localCheckpoint(eager=False)  # act + churn + gmax share the build
    gmax = lagd.agg(F.max("week").alias("max_week"))
    act = lagd.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum((F.col("week") == F.col("first_week")).cast("long")).alias("n_new"),
        # when() not bare cast: a week whose rows ALL have NULL prev_week
        # (the first week) must sum to 0, not NULL
        F.sum(
            F.when(F.col("prev_week") == F.col("week") - 1, F.lit(1)).otherwise(0)
        ).cast("long").alias("n_retained"),
        F.sum(
            (
                (F.col("week") > F.col("first_week"))
                & (F.col("prev_week").isNull() | (F.col("prev_week") < F.col("week") - 1))
            ).cast("long")
        ).alias("n_resurrected"),
    )
    ch = (
        lagd.crossJoin(F.broadcast(gmax))
        .where(
            (F.col("week") < F.col("max_week"))
            & (F.col("next_week").isNull() | (F.col("next_week") > F.col("week") + 1))
        )
        .groupBy((F.col("week") + 1).alias("week"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    # FULL outer, not left (ADVICE r12): churn attributed to a gap week —
    # users active in w, nobody at all active in w+1 — has no act row to
    # join to, and a left join would silently drop it, breaking the
    # growth identity active(w-1) = retained(w) + churned(w).
    zero = F.lit(0).cast("long")
    return (
        act.join(ch, "week", "full")
        .select(
            "week",
            F.coalesce("n_active", zero).alias("n_active"),
            F.coalesce("n_new", zero).alias("n_new"),
            F.coalesce("n_retained", zero).alias("n_retained"),
            F.coalesce("n_resurrected", zero).alias("n_resurrected"),
            F.coalesce("n_churned", zero).alias("n_churned"),
        )
    )


# ---------------------------------------------------------------------------
# ts_stl_trend — centered moving-average trend + residual (round 12)


_STL_HALF_US = 12 * 3_600_000_000  # ±12 hours around each bucket


@register(
    "ts_stl_trend",
    group="stats-ml",
    oracle=f"""
    WITH c AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 * 3600000000 AS bucket_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), t AS (
      SELECT event_type, bucket_us, n_events,
             CAST(SUM(n_events) OVER w AS BIGINT) AS tsum,
             CAST(COUNT(*) OVER w AS BIGINT) AS tcnt
      FROM c
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us
                   RANGE BETWEEN {_STL_HALF_US} PRECEDING AND {_STL_HALF_US} FOLLOWING)
    )
    SELECT event_type, bucket_us, n_events,
           CAST(tsum * 1000 // tcnt AS BIGINT) AS trend_milli,
           CAST(n_events * 1000 - tsum * 1000 // tcnt AS BIGINT) AS resid_milli
    FROM t
    """,
)
def ts_stl_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style trend extraction, step 1: the centered ±12-hour moving
    average of the hourly event rate per type (a RANGE frame over the
    bucket TIMELINE, so calendar gaps shrink the window rather than
    leaking neighbors in — the time-accurate form ROWS frames get wrong
    on sparse series), plus the detrended residual — the input
    [[ts_seasonality_profile]]'s hour-of-day indices explain and
    [[events_anomaly_mad]] flags. Trend is exact truncating milli-units
    (Σ·1000 div count), so every row hashes bit-identically cross-engine
    — no float averaging anywhere.

    One raw-events shuffle (the shared (type, hour) rollup), then the
    RANGE window runs per type over O(buckets) rollup rows. At 100 TB
    the rollup is ~9k rows/type/year — the window never touches raw
    events."""
    c = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000 * 3600000000").alias("bucket_us"),
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rangeBetween(-_STL_HALF_US, _STL_HALF_US)
    )
    t = c.select(
        "event_type",
        "bucket_us",
        "n_events",
        F.sum("n_events").over(w).alias("tsum"),
        F.count(F.lit(1)).over(w).alias("tcnt"),
    )
    return t.select(
        "event_type",
        "bucket_us",
        "n_events",
        F.expr("tsum * 1000 div tcnt").cast("long").alias("trend_milli"),
        F.expr("n_events * 1000 - tsum * 1000 div tcnt").cast("long").alias(
            "resid_milli"
        ),
    )


# ---------------------------------------------------------------------------
# events_anomaly_seasonal — seasonally-adjusted robust anomaly flags (round 12)


@register(
    "events_anomaly_seasonal",
    group="stats-ml",
    oracle="""
    WITH c AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS bucket_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), h AS (
      SELECT *, (bucket_us // 3600000000) % 24 AS hod FROM c
    ), hm AS (
      SELECT event_type, hod,
             CAST(SUM(n_events) * 1000 // COUNT(*) AS BIGINT) AS expected_milli
      FROM h GROUP BY 1, 2
    ), r AS (
      SELECT h.event_type, h.bucket_us, h.n_events, hm.expected_milli,
             h.n_events * 1000 - hm.expected_milli AS resid_milli
      FROM h JOIN hm USING (event_type, hod)
    ), med AS (
      SELECT event_type, median(resid_milli) AS med FROM r GROUP BY 1
    ), mad AS (
      SELECT r.event_type, median(abs(r.resid_milli - m.med)) AS mad
      FROM r JOIN med m USING (event_type) GROUP BY 1
    )
    SELECT r.event_type, r.bucket_us, r.n_events, r.expected_milli,
           CAST(r.resid_milli AS BIGINT) AS resid_milli,
           (m.med + 0.0) AS med, (d.mad + 0.0) AS mad,
           CAST(CASE WHEN d.mad > 0 AND abs(r.resid_milli - m.med) > 3 * d.mad
                     THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
    FROM r JOIN med m USING (event_type) JOIN mad d ON d.event_type = r.event_type
    """,
)
def events_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted robust anomaly flags — [[events_anomaly_mad]]
    after removing the diurnal cycle: each hourly bucket is scored
    against its OWN hour-of-day mean (exact truncating milli-units, the
    [[ts_seasonality_profile]] decomposition), and the median/MAD gate
    runs on the RESIDUALS — so a quiet 3 a.m. hour that would look
    anomalously low against the all-day median, and a busy 2 p.m. hour
    that would mask a real dip, are both judged against the right
    baseline. The practical form: raw-level MAD flags fire on the
    seasonality itself; residual MAD fires on genuine deviations.

    Exactness: residuals are exact integers; median interpolation is
    (a+b)/2 of integers (dyadic — bit-identical cross-engine), MAD the
    same on |int − dyadic|. ONE raw-events shuffle (the shared hourly
    rollup, checkpointed); hod means, medians and MADs are all rollup-
    sized aggregates broadcast back. At 100 TB nothing after the rollup
    touches raw rows."""
    c = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000 * 3600000000").alias("bucket_us"),
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .withColumn("hod", F.expr("bucket_us div 3600000000 % 24"))
        .localCheckpoint(eager=False)  # hod means + medians + output share it
    )
    hm = c.groupBy("event_type", "hod").agg(
        F.expr("sum(n_events) * 1000 div count(*)").cast("long").alias("expected_milli")
    )
    r = c.join(F.broadcast(hm), ["event_type", "hod"]).select(
        "event_type",
        "bucket_us",
        "n_events",
        "expected_milli",
        (F.col("n_events") * 1000 - F.col("expected_milli")).alias("resid_milli"),
    ).localCheckpoint(eager=False)
    med = r.groupBy("event_type").agg(F.median("resid_milli").alias("med"))
    dev = r.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("resid_milli") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("event_type").agg(F.median("dev").alias("mad"))
    return (
        r.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "bucket_us",
            "n_events",
            "expected_milli",
            F.col("resid_milli").cast("long").alias("resid_milli"),
            (F.col("med") + F.lit(0.0)).alias("med"),
            (F.col("mad") + F.lit(0.0)).alias("mad"),
            (
                (F.col("mad") > 0)
                & (F.abs(F.col("resid_milli") - F.col("med")) > 3 * F.col("mad"))
            )
            .cast("int")
            .alias("is_anomaly"),
        )
    )


# ---------------------------------------------------------------------------
# stats_theilsen_slope — robust trend slope over the bucket rollup (round 12)


@register(
    "stats_theilsen_slope",
    group="stats-ml",
    oracle="""
    WITH c AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), p AS (
      SELECT a.event_type,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      FROM c a JOIN c b ON a.event_type = b.event_type AND a.x < b.x
    ), s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             median(slope) AS sen
      FROM p GROUP BY 1
    ), i AS (
      SELECT c.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_buckets,
             median(CAST(c.y AS DOUBLE) - s.sen * CAST(c.x AS DOUBLE)) AS icpt
      FROM c JOIN s USING (event_type) GROUP BY 1
    )
    SELECT s.event_type, i.n_buckets, s.n_pairs,
           (round(s.sen, 6) + 0.0) AS sen_slope_per_hour,
           (round(i.icpt, 4) + 0.0) AS sen_intercept
    FROM s JOIN i USING (event_type)
    """,
)
def stats_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimator of the hourly event rate per type
    — the median of all pairwise slopes (and the median-residual
    intercept), immune to the outlier buckets that drag OLS
    ([[ml_linreg_normal]]) around; the robust-regression companion of
    [[events_anomaly_mad]]'s median/MAD scoring. Each pairwise slope is
    ONE double division of exact integers (identical multiset both
    engines), and median interpolation of doubles is (a+b)/2 —
    bit-identical.

    Scale stance: the pair join is O(buckets²) PER TYPE over the O(B)
    hourly rollup — quadratic in the TIME DOMAIN (a year of hours =
    ~38M pairs, tractable), NEVER in the data; raw events pay one
    rollup shuffle. For decade-scale series the standard move is the
    repeated-median or sampled-pairs variant — the rollup input and the
    median machinery are unchanged."""
    c = (
        table(spark, sf_dir, "events")
        .select("event_type", F.expr("unix_micros(ts) div 3600000000").alias("x"))
        .groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
        .localCheckpoint(eager=False)  # pair join (both sides) + intercept reuse
    )
    a, b = c.alias("a"), c.alias("b")
    p = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type")) & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
    )
    s = p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.median("slope").alias("sen"),
    )
    i = (
        c.join(F.broadcast(s), "event_type")
        .select(
            "event_type",
            (F.col("y").cast("double") - F.col("sen") * F.col("x").cast("double")).alias(
                "res"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.median("res").alias("icpt"),
        )
    )
    return s.join(i, "event_type").select(
        "event_type",
        "n_buckets",
        "n_pairs",
        round_pos(F.col("sen"), 6).alias("sen_slope_per_hour"),
        round_pos(F.col("icpt"), 4).alias("sen_intercept"),
    )


# ---------------------------------------------------------------------------
# stats_power_mde — experiment power / minimum detectable effect (round 12)


_Z_ALPHA = 1.959963984540054  # two-sided alpha = 0.05
_Z_BETA = 0.8416212335729143  # power = 0.80


@register(
    "stats_power_mde",
    group="stats-ml",
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s2
      FROM events WHERE event_type IN ('click', 'purchase') GROUP BY event_type
    ), v AS (
      SELECT event_type, n, s1,
             (n * s2 - s1 * s1)::DOUBLE / (n::DOUBLE * (n - 1)) AS var_c
      FROM m
    ), w AS (
      SELECT a.n AS n1, b.n AS n2,
             a.s1::DOUBLE / a.n AS m1, b.s1::DOUBLE / b.n AS m2,
             a.var_c AS v1, b.var_c AS v2
      FROM (SELECT * FROM v WHERE event_type = 'click') a,
           (SELECT * FROM v WHERE event_type = 'purchase') b
    )
    SELECT n1, n2,
           (round(m1 - m2, 4) + 0.0) AS mean_diff_cents,
           (round(({_Z_ALPHA} + {_Z_BETA}) * sqrt(v1 / n1 + v2 / n2), 4) + 0.0)
             AS mde_cents,
           CAST(CASE WHEN m1 <> m2 THEN ceil(
                 ({_Z_ALPHA} + {_Z_BETA}) * ({_Z_ALPHA} + {_Z_BETA}) * (v1 + v2)
                 / ((m1 - m2) * (m1 - m2)))
           END AS BIGINT) AS n_per_arm_for_observed
    FROM w
    """,
)
def stats_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power planning from observed moments — the minimum
    detectable effect at the CURRENT sample sizes ((z_α/2 + z_β)·SE,
    two-sided α = 0.05, power 0.80) and the per-arm n required to detect
    the OBSERVED mean difference — the readout every A/B platform pairs
    with its t-test ([[stats_two_sample]] reports whether the difference
    is significant; this reports what the experiment COULD detect). All
    inputs are the same exact BIGINT moments (n, Σx, Σx² in cents) in
    one partial-agg shuffle; z constants are fixed literals; the MDE /
    n-required chains are single deterministic IEEE pipelines both
    engines. NULL n-required for a zero observed difference rather than
    a division blow-up.

    At 100 TB: six scalars cross one exchange; the plan is moment
    collection, the statistics are free."""
    cents = F.round(F.col("value") * 100).cast("long")
    m = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select("event_type", cents.alias("x"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s1"),
            F.sum(F.col("x") * F.col("x")).alias("s2"),
        )
        .withColumn(
            "var_c",
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
            / (F.col("n").cast("double") * (F.col("n") - 1)),
        )
    )
    a = m.where(F.col("event_type") == "click").select(
        F.col("n").alias("n1"),
        (F.col("s1").cast("double") / F.col("n")).alias("m1"),
        F.col("var_c").alias("v1"),
    )
    b = m.where(F.col("event_type") == "purchase").select(
        F.col("n").alias("n2"),
        (F.col("s1").cast("double") / F.col("n")).alias("m2"),
        F.col("var_c").alias("v2"),
    )
    zsum = F.lit(_Z_ALPHA + _Z_BETA)
    w = a.crossJoin(F.broadcast(b))
    return w.select(
        "n1",
        "n2",
        round_pos(F.col("m1") - F.col("m2"), 4).alias("mean_diff_cents"),
        round_pos(
            zsum * F.sqrt(F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")), 4
        ).alias("mde_cents"),
        F.when(
            F.col("m1") != F.col("m2"),
            F.ceil(
                zsum * zsum * (F.col("v1") + F.col("v2"))
                / ((F.col("m1") - F.col("m2")) * (F.col("m1") - F.col("m2")))
            ),
        ).cast("long").alias("n_per_arm_for_observed"),
    )


# ---------------------------------------------------------------------------
# events_markov_stationary — power-iterated stationary distribution (round 12)


_MKV_SCALE = 1_000_000


@register(
    "events_markov_stationary",
    group="stats-ml",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id
      FROM events
    ), t AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS to_type
      FROM e
    ), n AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_ij
      FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2
    ), tot AS (
      SELECT from_type, CAST(SUM(n_ij) AS BIGINT) AS tot FROM n GROUP BY 1
    ), k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM tot),
    pi0 AS (
      SELECT from_type AS state, CAST({_MKV_SCALE} // k.k AS BIGINT) AS pi
      FROM tot, k
    ), pi1 AS (
      SELECT n.to_type AS state,
             CAST(SUM(p.pi * n.n_ij // t.tot) AS BIGINT) AS pi
      FROM n JOIN pi0 p ON p.state = n.from_type
             JOIN tot t ON t.from_type = n.from_type
      GROUP BY 1
    ), pi2 AS (
      SELECT n.to_type AS state,
             CAST(SUM(p.pi * n.n_ij // t.tot) AS BIGINT) AS pi
      FROM n JOIN pi1 p ON p.state = n.from_type
             JOIN tot t ON t.from_type = n.from_type
      GROUP BY 1
    )
    SELECT p0.state, p0.pi AS pi0_ppm, p1.pi AS pi1_ppm, p2.pi AS pi2_ppm
    FROM pi0 p0 JOIN pi1 p1 USING (state) JOIN pi2 p2 USING (state)
    """,
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-journey Markov chain — two
    unrolled power iterations π ← πP from uniform over the
    [[events_path_transitions]] transition table, all in exact scaled
    integers (term = πᵢ·nᵢⱼ div totᵢ, truncating per term then exact
    BIGINT sums — the [[graph_pagerank]] integer-iteration discipline):
    where user attention CONVERGES, the long-run state occupancy that
    funnel snapshots miss. Emits π after 0/1/2 iterations so the
    convergence rate itself is visible.

    Plan: ONE raw shuffle (the user_id lead window), then every
    iteration is a |types|²-row join against the O(types) π broadcast —
    at 100 TB the chain solve costs literally nothing beyond the
    transition rollup; more iterations are more tiny joins, never new
    scans."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    t = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
        )
        .select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ij"))
        .localCheckpoint(eager=False)  # both iterations + totals reuse it
    )
    tot = t.groupBy("from_type").agg(F.sum("n_ij").alias("tot"))
    k = tot.agg(F.count(F.lit(1)).alias("k"))
    pi0 = tot.crossJoin(F.broadcast(k)).select(
        F.col("from_type").alias("state"),
        F.expr(f"{_MKV_SCALE} div k").cast("long").alias("pi"),
    )

    def step(pi: DataFrame) -> DataFrame:
        return (
            t.join(F.broadcast(pi), t.from_type == pi.state)
            .join(F.broadcast(tot), "from_type")
            .select(
                F.col("to_type").alias("state"),
                F.expr("pi * n_ij div tot").alias("term"),
            )
            .groupBy("state")
            .agg(F.sum("term").cast("long").alias("pi"))
        )

    pi1 = step(pi0)
    pi2 = step(pi1)
    return (
        pi0.select("state", F.col("pi").alias("pi0_ppm"))
        .join(pi1.select("state", F.col("pi").alias("pi1_ppm")), "state")
        .join(pi2.select("state", F.col("pi").alias("pi2_ppm")), "state")
    )


# ---------------------------------------------------------------------------
# ts_rolling_median — trailing robust baseline over the bucket rollup


_RMED_WIN_US = 24 * 3_600_000_000  # trailing 24 hours (inclusive of current)


@register(
    "ts_rolling_median",
    group="stats-ml",
    oracle=f"""
    WITH c AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 * 3600000000 AS bucket_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, bucket_us, n_events,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
           (median(n_events) OVER w + 0.0) AS roll_med
    FROM c
    WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us
                 RANGE BETWEEN {_RMED_WIN_US} PRECEDING AND CURRENT ROW)
    """,
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 24-hour rolling MEDIAN of the hourly event rate per type
    — the robust baseline a live anomaly monitor subtracts (the rolling
    twin of [[events_anomaly_mad]]'s global median and the outlier-proof
    alternative to [[ts_ewma_hourly]]'s IIR mean, which one burst
    poisons for hours). The RANGE frame runs over the bucket TIMELINE
    (calendar gaps shrink the window — the [[ts_stl_trend]] frame
    discipline); median interpolation is (a+b)/2 of integer counts,
    dyadic and bit-identical cross-engine.

    One raw shuffle (the shared hourly rollup); the windowed median is
    O(window log window) per rollup row (Spark rejects median() with a
    frame, so the frame's values sort in an array — the window is <= 25
    buckets by construction) and the rollup is O(types · hours) at any
    corpus size."""
    c = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000 * 3600000000").alias("bucket_us"),
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rangeBetween(-_RMED_WIN_US, 0)
    )
    xs = F.sort_array(F.collect_list("n_events").over(w))
    m = F.size(xs)
    h = (m / 2).cast("int")  # floor(m/2); odd middle is h + 1 (1-indexed)
    med = F.when(
        m % 2 == 1, F.element_at(xs, h + 1).cast("double")
    ).otherwise(
        (F.element_at(xs, h) + F.element_at(xs, h + 1)).cast("double") / 2
    )
    return c.select(
        "event_type",
        "bucket_us",
        "n_events",
        m.cast("long").alias("n_window"),
        (med + F.lit(0.0)).alias("roll_med"),
    )


# ---------------------------------------------------------------------------
# events_entropy_profile — behavioral diversity per user (round 12)


@register(
    "events_entropy_profile",
    group="stats-ml",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_t
      FROM events GROUP BY 1, 2
    ), u AS (
      SELECT user_id, CAST(SUM(n_t) AS BIGINT) AS n FROM c GROUP BY 1
    ), t AS (
      SELECT c.user_id, u.n,
             CAST(round(
               (CAST(c.n_t AS DOUBLE) / u.n)
               * ln(CAST(c.n_t AS DOUBLE) / u.n) * 1000000) AS BIGINT) AS term_unat
      FROM c JOIN u USING (user_id)
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(-SUM(term_unat) AS BIGINT) AS entropy_unat
    FROM t GROUP BY user_id
    """,
)
def events_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the behavioral-
    diversity feature (0 = single-action bots, ln 5 ≈ 1.609 = uniform
    explorers) that feeds bot detection and engagement models next to
    [[events_user_features]]' count features. Each −p·ln p term is
    snapped ONCE to an exact BIGINT micro-nat (the [[ml_nb_classify]]
    log discipline), so the per-user sum is exact integer arithmetic —
    order-free, no float-reduction caveat at any group size.

    One user_id-keyed rollup shuffle (|users|·|types| rows), the
    per-user totals reuse its partitioning, terms are map-side. O(users)
    output."""
    c = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_t"))
    )
    wu = Window.partitionBy("user_id")
    t = c.select(
        "user_id",
        F.sum("n_t").over(wu).alias("n"),
        "n_t",
    ).select(
        "user_id",
        "n",
        F.round(
            (F.col("n_t").cast("double") / F.col("n"))
            * F.log(F.col("n_t").cast("double") / F.col("n"))
            * 1000000
        )
        .cast("long")
        .alias("term_unat"),
    )
    return t.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        (-F.sum("term_unat")).cast("long").alias("entropy_unat"),
    )


# ---------------------------------------------------------------------------
# stats_gini_spend — revenue concentration (round 12)


@register(
    "stats_gini_spend",
    group="stats-ml",
    oracle="""
    WITH s AS (
      SELECT user_id,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS spend
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), v AS (
      SELECT spend, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY spend
    ), w AS (
      SELECT spend, c,
             CAST(COALESCE(SUM(c) OVER (ORDER BY spend
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
      FROM v
    ), m AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(spend * c) AS BIGINT) AS total,
             CAST(SUM(spend * (2 * c * cum + c * (c + 1))) AS BIGINT) AS two_s
      FROM w
    )
    SELECT n AS n_users, total AS total_cents,
           (round(CAST(two_s AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))
                  - CAST(n + 1 AS DOUBLE) / n, 6) + 0.0) AS gini
    FROM m
    """,
)
def stats_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of purchase spend across users — the revenue-
    concentration number behind "whales vs long tail" decisions (0 =
    perfectly even, →1 = one user is the business). Computed WITHOUT a
    global sort: ranks come from the spend VALUE-DOMAIN rollup (the
    [[stats_ks_two_sample]] discipline) — for a distinct value with
    count c after cum cheaper users, Σranks = c·cum + c(c+1)/2, so
    G = 2·Σᵢ rankᵢ·xᵢ/(n·Σx) − (n+1)/n folds to exact BIGINT sums over
    the tiny rollup, one double chain at the end.

    Two rollup shuffles (user spend, then value domain), a cumulative
    window over O(distinct spends) rows, one output row at any scale."""
    s = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("spend"))
    )
    v = s.groupBy("spend").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wc = Window.orderBy("spend").rowsBetween(Window.unboundedPreceding, -1)
    w = v.select(
        "spend", "c", F.coalesce(F.sum("c").over(wc), F.lit(0)).alias("cum")
    )
    m = w.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("spend") * F.col("c")).alias("total"),
        F.sum(
            F.col("spend")
            * (2 * F.col("c") * F.col("cum") + F.col("c") * (F.col("c") + 1))
        ).alias("two_s"),
    )
    return m.select(
        F.col("n").alias("n_users"),
        F.col("total").alias("total_cents"),
        round_pos(
            F.col("two_s").cast("double")
            / (F.col("n").cast("double") * F.col("total").cast("double"))
            - (F.col("n") + 1).cast("double") / F.col("n"),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# events_survival_km — Kaplan–Meier time-to-second-event (round 12)


_KM_DAY_US = 86_400_000_000


@register(
    "events_survival_km",
    group="stats-ml",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id
      FROM events
    ), f AS (
      SELECT user_id,
             MIN(ts_us) AS t1,
             CAST(COUNT(*) AS BIGINT) AS n_ev
      FROM e GROUP BY user_id
    ), s AS (
      SELECT e.user_id, MIN(e.ts_us) AS t2
      FROM e JOIN f ON f.user_id = e.user_id AND e.ts_us > f.t1
      GROUP BY e.user_id
    ), horizon AS (SELECT MAX(ts_us) AS t_end FROM e),
    obs AS (
      SELECT f.user_id,
             CASE WHEN s.t2 IS NOT NULL
                  THEN (s.t2 - f.t1) // {_KM_DAY_US}
                  ELSE (h.t_end - f.t1) // {_KM_DAY_US} END AS t_days,
             CASE WHEN s.t2 IS NOT NULL THEN 1 ELSE 0 END AS is_event
      FROM f LEFT JOIN s ON s.user_id = f.user_id, horizon h
    ), agg AS (
      SELECT t_days,
             CAST(SUM(is_event) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM obs GROUP BY t_days
    ), risk AS (
      SELECT t_days, d, leaving,
             CAST((SELECT COUNT(*) FROM obs) AS BIGINT)
               - CAST(COALESCE(SUM(leaving) OVER (ORDER BY t_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS n_risk
      FROM agg
    ), km AS (
      SELECT t_days, d, n_risk,
             CAST(SUM(CASE WHEN d > 0 AND d < n_risk THEN
               CAST(round(ln(CAST(n_risk - d AS DOUBLE) / n_risk) * 1000000) AS BIGINT)
               ELSE 0 END) OVER (ORDER BY t_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS log_s_unat,
             MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hit_zero
      FROM risk
    )
    SELECT t_days, d AS n_events, n_risk,
           CASE WHEN hit_zero = 1 THEN NULL ELSE log_s_unat END AS log_s_unat,
           CASE WHEN hit_zero = 1 THEN 0.0
                ELSE (round(exp(CAST(log_s_unat AS DOUBLE) / 1000000), 6) + 0.0)
           END AS survival_r
    FROM km WHERE d > 0
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-SECOND-event (days) — the
    churn-analysis estimator: users whose second event never arrives are
    RIGHT-CENSORED at the corpus horizon instead of dropped (dropping
    them is the classic retention-inflation bug; KM is the fix). Each
    hazard factor ln(1 − d/n) snaps ONCE to an exact BIGINT micro-nat
    (the [[ml_nb_classify]] log discipline), so the cumulative
    log-survival is an exact integer window sum — the product of
    survival fractions without an order-sensitive float product; the
    displayed S(t) is one exp per row.

    Plan: two user_id-key aggregates (first/second event) + the horizon
    as a one-row broadcast; the risk-set arithmetic runs entirely over
    the O(distinct gap days) rollup (value-domain discipline). At 100 TB
    the curve costs two exchanges of O(users) rows."""
    e = table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    f = e.groupBy("user_id").agg(F.min("ts_us").alias("t1"))
    s = (
        e.join(f, "user_id")
        .where(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    horizon = e.agg(F.max("ts_us").alias("t_end"))
    obs = (
        f.join(s, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("t2").isNotNull(),
                F.expr(f"(t2 - t1) div {_KM_DAY_US}"),
            )
            .otherwise(F.expr(f"(t_end - t1) div {_KM_DAY_US}"))
            .alias("t_days"),
            F.col("t2").isNotNull().cast("long").alias("is_event"),
        )
        .localCheckpoint(eager=False)  # total + rollup share it
    )
    agg = obs.groupBy("t_days").agg(
        F.sum("is_event").alias("d"), F.count(F.lit(1)).alias("leaving")
    )
    total = obs.agg(F.count(F.lit(1)).alias("n_total"))
    wb = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, 0)
    risk = agg.crossJoin(F.broadcast(total)).select(
        "t_days",
        "d",
        (
            F.col("n_total") - F.coalesce(F.sum("leaving").over(wb), F.lit(0))
        ).alias("n_risk"),
    )
    # d == n_risk means the curve hits exactly zero (everyone still at
    # risk is an event): ln(0) is out of domain, so the zero crossing is
    # carried as a flag — NULL log-survival, S = 0.0 from there on.
    term = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.round(
            F.log((F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk"))
            * 1000000
        ).cast("long"),
    ).otherwise(F.lit(0))
    hit_zero = F.max((F.col("d") == F.col("n_risk")).cast("int")).over(wc)
    km = risk.select(
        "t_days",
        "d",
        "n_risk",
        F.sum(term).over(wc).cast("long").alias("raw_log_s"),
        hit_zero.alias("hit_zero"),
    )
    return km.where(F.col("d") > 0).select(
        "t_days",
        F.col("d").cast("long").alias("n_events"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.when(F.col("hit_zero") == 1, F.lit(None).cast("long"))
        .otherwise(F.col("raw_log_s"))
        .alias("log_s_unat"),
        F.when(F.col("hit_zero") == 1, F.lit(0.0))
        .otherwise(round_pos(F.exp(F.col("raw_log_s").cast("double") / 1000000), 6))
        .alias("survival_r"),
    )


# ---------------------------------------------------------------------------
# stats_benford_test — first-digit law fraud screen (round 12)


@register(
    "stats_benford_test",
    group="stats-ml",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ), c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
    ), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT c.digit, c.n,
           CAST(c.n * 10000 // t.total AS BIGINT) AS observed_bp,
           CAST(round(ln(1.0 + 1.0 / c.digit) / ln(10.0) * 10000) AS BIGINT)
             AS benford_bp,
           (round(pow(CAST(c.n AS DOUBLE) / t.total
                      - ln(1.0 + 1.0 / c.digit) / ln(10.0), 2)
                  / (ln(1.0 + 1.0 / c.digit) / ln(10.0)) * t.total, 6) + 0.0)
             AS chi2_term
    FROM c, t
    """,
)
def stats_benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen on order totals — the classic
    forensic-accounting / synthetic-data smell test (organic financial
    amounts follow P(d) = log₁₀(1 + 1/d); fabricated ones usually
    don't): per leading digit of the cents amount, observed share vs
    the Benford expectation and the per-digit chi-square contribution
    (sum them for the 8-df test statistic — emitted per digit so the
    deviating digit is visible, not just the aggregate). Counts are
    exact integers; expectations and chi² terms are one identical
    double chain per digit.

    Map-side digit extraction + a 9-row aggregate with a one-row total
    broadcast: the cheapest fraud screen any 100 TB ledger can run."""
    d = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    benford = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.expr("n * 10000 div total").cast("long").alias("observed_bp"),
        F.round(benford * 10000).cast("long").alias("benford_bp"),
        round_pos(
            F.pow(F.col("n").cast("double") / F.col("total") - benford, F.lit(2.0))
            / benford
            * F.col("total"),
            6,
        ).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# events_lorenz_curve — spend share by population decile (round 12)


@register(
    "events_lorenz_curve",
    group="stats-ml",
    oracle="""
    WITH s AS (
      SELECT user_id,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS spend
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), v AS (
      SELECT spend, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(spend) AS BIGINT) AS mass
      FROM s GROUP BY spend
    ), w AS (
      SELECT spend, c, mass,
             CAST(COALESCE(SUM(c) OVER o, 0) AS BIGINT) AS cum_before,
             CAST(SUM(c) OVER () AS BIGINT) AS n,
             CAST(SUM(mass) OVER () AS BIGINT) AS total
      FROM v WINDOW o AS (ORDER BY spend ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CAST(cum_before * 10 // n AS BIGINT) AS decile,
           CAST(SUM(c) AS BIGINT) AS n_users,
           CAST(SUM(mass) AS BIGINT) AS spend_cents,
           CAST(SUM(mass) * 10000 // MAX(total) AS BIGINT) AS share_bp
    FROM w GROUP BY 1
    """,
)
def events_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of purchase spend — spend share per population
    decile ordered poorest→richest, the distribution [[stats_gini_spend]]
    summarizes to one number, emitted as the curve itself (the
    "bottom 50% hold X%, top 10% hold Y%" readout). Deciles come from
    the spend VALUE-DOMAIN rollup's cumulative count (the tie-stable
    first-occurrence rank, never a global user sort); shares are exact
    integer bp.

    Two rollup shuffles + a cumulative window over O(distinct spends)
    rows; ≤10 output rows at any scale."""
    s = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("spend"))
    )
    v = s.groupBy("spend").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("spend").alias("mass"),
    )
    wb = Window.orderBy("spend").rowsBetween(Window.unboundedPreceding, -1)
    wt = Window.partitionBy()
    w = v.select(
        "spend",
        "c",
        "mass",
        F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("cum_before"),
        F.sum("c").over(wt).alias("n"),
        F.sum("mass").over(wt).alias("total"),
    )
    return (
        w.groupBy(F.expr("cum_before * 10 div n").cast("long").alias("decile"))
        .agg(
            F.sum("c").cast("long").alias("n_users"),
            F.sum("mass").cast("long").alias("spend_cents"),
            F.expr("sum(mass) * 10000 div max(total)").cast("long").alias("share_bp"),
        )
    )


# ---------------------------------------------------------------------------
# agg_skew_kurtosis — higher-moment distribution shape (round 12)


@register(
    "agg_skew_kurtosis",
    group="stats-ml",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS s1,
             CAST(SUM(CAST(round(value * 100) AS HUGEINT)
                      * CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS s2,
             CAST(SUM(CAST(round(value * 100) AS HUGEINT)
                      * CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS s3,
             CAST(SUM(CAST(round(value * 100) AS HUGEINT)
                      * CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS s4
      FROM events GROUP BY event_type
    ), c AS (
      -- central moments via the exact-integer binomial expansions:
      -- n^2*M2 = n*s2 - s1^2 ; n^3*M3 = n^2*s3 - 3n*s1*s2 + 2*s1^3
      -- n^4*M4 = n^3*s4 - 4n^2*s1*s3 + 6n*s1^2*s2 - 3*s1^4
      SELECT event_type, n,
             CAST(n * s2 - s1 * s1 AS DOUBLE) AS m2n2,
             CAST(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS DOUBLE) AS m3n3,
             CAST(n * n * n * s4 - 4 * n * n * s1 * s3
                  + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS DOUBLE) AS m4n4
      FROM m
    )
    -- with A = n*SUM(x-mu)^2, B = n^2*SUM(x-mu)^3, C = n^3*SUM(x-mu)^4 the
    -- n powers cancel exactly: skew = B/A^1.5, kurtosis = C/A^2
    SELECT event_type, n,
           (round(m3n3 / pow(m2n2, 1.5), 6) + 0.0) AS skewness,
           (round(m4n4 / (m2n2 * m2n2) - 3.0, 6) + 0.0) AS excess_kurtosis
    FROM c
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis of the cents value per event type —
    the higher-moment shape diagnostics (heavy tails break the normality
    assumptions behind [[stats_two_sample]] and [[stats_power_mde]]; this
    is the check you run first). All four raw power sums are EXACT
    integers (Σx⁴ ≈ 10²¹ at sf1 — HUGEINT/DECIMAL(38,0) from the first
    multiply), central moments come from the exact binomial expansions
    (n²M₂ = nΣx²−(Σx)² etc.), and only the final normalized ratios are
    one IEEE chain per group. Spark's own skewness()/kurtosis() stream
    FLOAT central moments whose partial-merge order is
    nondeterministic — the moments form is both exact and
    partial-agg-shuffled like every other sketch here.

    One exchange of |types| × 5 scalars. Width ceiling: the n³Σx⁴ and
    (Σx)⁴ terms stay inside 38 digits up to n ≈ 10⁹ rows/group at cents
    scale; past that (true 100 TB groups) the exact form is the same
    TWO-PASS trick as [[agg_quantile_2pass]] — pass 1 the integer mean,
    pass 2 exact centered power sums, whose magnitudes shrink by the
    mean⁴ factor. Both engines overflow LOUDLY (checked arithmetic),
    never silently."""
    x = F.round(F.col("value") * 100).cast("long")
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = (
        table(spark, sf_dir, "events")
        .select("event_type", x.alias("x"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(d38(F.col("x"))).alias("s1"),
            F.sum(d38(F.col("x")) * F.col("x")).alias("s2"),
            F.sum(d38(F.col("x")) * F.col("x") * F.col("x")).alias("s3"),
            F.sum(d38(F.col("x")) * F.col("x") * F.col("x") * F.col("x")).alias("s4"),
        )
    )
    n = F.col("n")
    s1, s2, s3, s4 = F.col("s1"), F.col("s2"), F.col("s3"), F.col("s4")
    m2n2 = (d38(n) * s2 - s1 * s1).cast("double")
    m3n3 = (d38(n) * n * s3 - 3 * d38(n) * s1 * s2 + 2 * s1 * s1 * s1).cast("double")
    m4n4 = (
        d38(n) * n * n * s4
        - 4 * d38(n) * n * s1 * s3
        + 6 * d38(n) * s1 * s1 * s2
        - 3 * s1 * s1 * s1 * s1
    ).cast("double")
    # n powers cancel: skew = m3n3/m2n2^1.5, kurt = m4n4/m2n2^2 - 3
    return m.select(
        "event_type",
        "n",
        round_pos(m3n3 / F.pow(m2n2, F.lit(1.5)), 6).alias("skewness"),
        round_pos(m4n4 / (m2n2 * m2n2) - 3.0, 6).alias("excess_kurtosis"),
    )


# ---------------------------------------------------------------------------
# stats_mutual_information — type × hour dependence in nats (round 12)


@register(
    "stats_mutual_information",
    group="stats-ml",
    oracle="""
    WITH cell AS (
      SELECT event_type, (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hod,
             CAST(COUNT(*) AS BIGINT) AS n_ij
      FROM events GROUP BY 1, 2
    ), r AS (SELECT event_type, CAST(SUM(n_ij) AS BIGINT) AS n_i FROM cell GROUP BY 1),
    c AS (SELECT hod, CAST(SUM(n_ij) AS BIGINT) AS n_j FROM cell GROUP BY 1),
    t AS (SELECT CAST(SUM(n_ij) AS BIGINT) AS n FROM cell),
    terms AS (
      SELECT CAST(round(
               (CAST(cell.n_ij AS DOUBLE) / t.n)
               * ln(CAST(cell.n_ij AS DOUBLE) * t.n
                    / (CAST(r.n_i AS DOUBLE) * c.n_j))
               * 1000000) AS BIGINT) AS term_unat,
             CAST(round(-(CAST(cell.n_ij AS DOUBLE) / t.n)
               * ln(CAST(cell.n_ij AS DOUBLE) / t.n) * 1000000) AS BIGINT) AS h_unat
      FROM cell JOIN r USING (event_type) JOIN c USING (hod), t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(term_unat) AS BIGINT) AS mi_unat,
           CAST(SUM(h_unat) AS BIGINT) AS h_joint_unat
    FROM terms
    """,
)
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and hour-of-day — the
    information-theoretic strength of the dependence
    [[stats_chi2_independence]] tests for significance (chi² says "not
    independent"; MI says HOW MANY nats of hour knowledge a type label
    buys — the feature-selection ranking number). Emitted with the joint
    entropy so normalized MI is one division away. Every p·ln term
    snaps ONCE to exact BIGINT micro-nats (the [[ml_nb_classify]]
    discipline) ⇒ exact integer sums, no reduction-order caveat.

    One contingency rollup shuffle; marginals, total and terms all run
    over the |types|×24 cell table with O(1)-row broadcasts."""
    cell = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000 % 24").alias("hod"),
        )
        .groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ij"))
        .localCheckpoint(eager=False)  # marginals + total + terms share it
    )
    r = cell.groupBy("event_type").agg(F.sum("n_ij").alias("n_i"))
    c = cell.groupBy("hod").agg(F.sum("n_ij").alias("n_j"))
    t = cell.agg(F.sum("n_ij").alias("n"))
    j = (
        cell.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "hod")
        .crossJoin(F.broadcast(t))
    )
    p = F.col("n_ij").cast("double") / F.col("n")
    mi_term = F.round(
        p
        * F.log(
            F.col("n_ij").cast("double")
            * F.col("n")
            / (F.col("n_i").cast("double") * F.col("n_j"))
        )
        * 1000000
    ).cast("long")
    h_term = F.round(-p * F.log(p) * 1000000).cast("long")
    return j.select(mi_term.alias("term_unat"), h_term.alias("h_unat")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("term_unat").cast("long").alias("mi_unat"),
        F.sum("h_unat").cast("long").alias("h_joint_unat"),
    )


# ---------------------------------------------------------------------------
# stats_runs_test — Wald–Wolfowitz randomness check (round 12)


@register(
    "stats_runs_test",
    group="stats-ml",
    oracle="""
    WITH c AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), med AS (
      SELECT event_type, median(n_events) AS med FROM c GROUP BY 1
    ), s AS (
      -- strict above/below; exact-median rows are dropped (the standard
      -- runs-test convention) BEFORE run counting
      SELECT c.event_type, c.bucket,
             CASE WHEN c.n_events > m.med THEN 1 ELSE 0 END AS up
      FROM c JOIN med m USING (event_type)
      WHERE c.n_events <> m.med
    ), l AS (
      SELECT event_type, up,
             LAG(up) OVER (PARTITION BY event_type ORDER BY bucket) AS prev
      FROM s
    ), m2 AS (
      SELECT event_type,
             CAST(SUM(up) AS BIGINT) AS n1,
             CAST(SUM(1 - up) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN prev IS NULL OR up <> prev THEN 1 ELSE 0 END)
                  AS BIGINT) AS runs
      FROM l GROUP BY event_type
    )
    -- degenerate guard: a one-sided sequence (n1 = 0 or n2 = 0) or a
    -- zero-variance one (2*n1*n2 <= n1 + n2) has no defined z — NULL,
    -- identically both engines, instead of a divide-by-zero
    SELECT event_type, n1, n2, runs,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN (round(1.0 + 2.0 * n1 * n2 / (n1 + n2), 4) + 0.0) END
             AS expected_runs,
           CASE WHEN n1 > 0 AND n2 > 0 AND 2 * n1 * n2 > n1 + n2
                THEN (round((runs - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
                  / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                         / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 6) + 0.0)
           END AS z_runs
    FROM m2
    """,
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the hourly rate per type — is the
    above/below-median sequence RANDOM, or does it clump (positive
    serial dependence: too few runs, z << 0 — the regime
    [[ts_autocorr]] measures parametrically) or oscillate (too many,
    z >> 0)? The nonparametric randomness gate you run before trusting
    i.i.d.-assuming statistics downstream. Exact-median rows drop first
    (the standard convention — median interpolation is dyadic so the
    comparison is bit-identical cross-engine); run boundaries are one
    lag over the ordered rollup; expected runs and variance are the
    closed forms in one IEEE chain.

    One raw shuffle (the shared hourly rollup); everything after runs
    over O(buckets) rows per type."""
    c = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .localCheckpoint(eager=False)  # median + runs share it
    )
    med = c.groupBy("event_type").agg(F.median("n_events").alias("med"))
    s = (
        c.join(F.broadcast(med), "event_type")
        .where(F.col("n_events") != F.col("med"))
        .select(
            "event_type",
            "bucket",
            (F.col("n_events") > F.col("med")).cast("long").alias("up"),
        )
    )
    wl = Window.partitionBy("event_type").orderBy("bucket")
    l = s.select("event_type", "up", F.lag("up").over(wl).alias("prev"))
    m2 = l.groupBy("event_type").agg(
        F.sum("up").cast("long").alias("n1"),
        F.sum(1 - F.col("up")).cast("long").alias("n2"),
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("up") != F.col("prev")), 1).otherwise(0)
        ).cast("long").alias("runs"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    exp_r = 1.0 + 2.0 * n1d * n2d / (n1d + n2d)
    var_r = (
        2.0 * n1d * n2d * (2.0 * n1d * n2d - n1d - n2d)
        / ((n1d + n2d) * (n1d + n2d) * (n1d + n2d - 1.0))
    )
    ok_e = (F.col("n1") > 0) & (F.col("n2") > 0)
    ok_z = ok_e & (2 * F.col("n1") * F.col("n2") > F.col("n1") + F.col("n2"))
    return m2.select(
        "event_type",
        "n1",
        "n2",
        "runs",
        F.when(ok_e, round_pos(exp_r, 4)).alias("expected_runs"),
        F.when(ok_z, round_pos((F.col("runs") - exp_r) / F.sqrt(var_r), 6)).alias(
            "z_runs"
        ),
    )


# ---------------------------------------------------------------------------
# ml_logreg_irls — logistic-family GLM by IRLS/Newton over exact sufficient
# statistics (round 15)

_IRLS_ITERS = 3

# Planted, hash-deterministic binary label (the text_pii_scrub "derived
# from the key" trick): P(y=1 | qty) = (100 + 16*qty)/1000 by construction,
# with the noise drawn from a multiplicative hash of l_orderkey — so the
# fit has a KNOWN recoverable signal (b1 > 0) and a known null control
# (b2, discount). l_orderkey is reduced mod 1000003 BEFORE the multiply so
# the product stays far below 2^63 at any corpus scale.
_IRLS_BASE_COLS = (
    "CASE WHEN ((l_orderkey % 1000003) * 2654435761) % 1000"
    " < 100 + 16 * CAST(round(l_quantity) AS BIGINT) THEN 1 ELSE 0 END AS y",
    "CAST(round(l_quantity) AS BIGINT) AS x1",
    "CAST(round(l_discount * 100) AS BIGINT) AS x2",
)

# Per-row link: the "fast sigmoid" z -> 0.5 + z/(2(1+|z|)) — a rational
# sigmoidal CDF, chosen over exp() because +,*,/,abs are IEEE
# correctly-rounded, so BOTH engines produce bit-identical probabilities
# from the same expression string (exp() differs in the last ulp across
# libm implementations; determinism rule, queries/registry.py).
_IRLS_Z = "(b0 + b1 * x1 + b2 * x2)"
_IRLS_P = "0.5 + 0.5 * z / (1.0 + abs(z))"

# Quantized per-row sufficient statistics: floor(1e6 * term) is an exact
# BIGINT, so the corpus SUM is order-independent (the ml_linreg_normal
# moment discipline applied to a WEIGHTED Gram matrix).
_IRLS_TERMS = {
    "g00": "(p * (1.0 - p))",
    "g01": "(p * (1.0 - p)) * x1",
    "g02": "(p * (1.0 - p)) * x2",
    "g11": "(p * (1.0 - p)) * x1 * x1",
    "g12": "(p * (1.0 - p)) * x1 * x2",
    "g22": "(p * (1.0 - p)) * x2 * x2",
    "r0": "(y - p)",
    "r1": "(y - p) * x1",
    "r2": "(y - p) * x2",
}

# Cramer solve of the symmetric 3x3 Newton system G * delta = r, written
# once and evaluated from the SAME string by both engines.
_IRLS_DET = (
    "g00 * (g11 * g22 - g12 * g12) - g01 * (g01 * g22 - g12 * g02)"
    " + g02 * (g01 * g12 - g11 * g02)"
)
_IRLS_D = (
    "r0 * (g11 * g22 - g12 * g12) - g01 * (r1 * g22 - g12 * r2)"
    " + g02 * (r1 * g12 - g11 * r2)",
    "g00 * (r1 * g22 - g12 * r2) - r0 * (g01 * g22 - g12 * g02)"
    " + g02 * (g01 * r2 - r1 * g02)",
    "g00 * (g11 * r2 - g12 * r1) - g01 * (g01 * r2 - r1 * g02)"
    " + r0 * (g01 * g12 - g11 * g02)",
)


def _irls_ctes() -> str:
    """The shared IRLS CTE chain (base, w0, a1..aK, w1..wK) — composed by
    both the trajectory oracle and the calibration oracle so the model
    they score with is the SAME generated SQL."""
    base = "SELECT " + ", ".join(_IRLS_BASE_COLS) + " FROM lineitem"
    ctes = [
        f"base AS ({base})",
        "w0 AS (SELECT CAST(0 AS DOUBLE) AS b0, CAST(0 AS DOUBLE) AS b1,"
        " CAST(0 AS DOUBLE) AS b2)",
    ]
    sums = ", ".join(
        f"CAST(SUM(CAST(floor(1000000 * {e}) AS BIGINT)) AS DOUBLE)"
        f" / 1000000.0 AS {k}"
        for k, e in _IRLS_TERMS.items()
    )
    for k in range(1, _IRLS_ITERS + 1):
        ctes.append(
            f"""a{k} AS (
      SELECT {sums}, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(1000000 * abs(y - p)) AS BIGINT)) AS BIGINT) AS sae
      FROM (SELECT y, x1, x2, {_IRLS_P} AS p
            FROM (SELECT y, x1, x2, {_IRLS_Z} AS z
                  FROM base CROSS JOIN w{k - 1})))"""
        )
        upd = ", ".join(
            f"(round(b{j} + ({_IRLS_D[j]}) / ({_IRLS_DET}), 6) + 0.0) AS b{j}"
            for j in range(3)
        )
        ctes.append(
            f"w{k} AS (SELECT {upd}, a{k}.n AS n, a{k}.sae // a{k}.n AS mae_ppm"
            f" FROM a{k} CROSS JOIN w{k - 1})"
        )
    return ",\n".join(ctes)


def _irls_oracle() -> str:
    union = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS iter, n, b0, b1, b2,"
        f" CAST(mae_ppm AS BIGINT) AS mae_ppm FROM w{k}"
        for k in range(1, _IRLS_ITERS + 1)
    )
    return "WITH " + _irls_ctes() + "\n" + union


def _irls_fit(spark: SparkSession, sf_dir: str):
    """Run the K IRLS passes; returns (base, [w1..wK]) where each wK is the
    lineage-truncated 1-row frame (b0, b1, b2, n, mae_ppm). Shared by the
    trajectory query and the calibration audit so both score the SAME
    model."""
    base = table(spark, sf_dir, "lineitem").selectExpr(*_IRLS_BASE_COLS)
    w = spark.range(1).selectExpr(
        "cast(0 as double) AS b0", "cast(0 as double) AS b1", "cast(0 as double) AS b2"
    )
    sums = [
        F.expr(f"sum(cast(floor(1000000 * {e}) as bigint))").alias(f"s_{k}")
        for k, e in _IRLS_TERMS.items()
    ] + [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("sum(cast(floor(1000000 * abs(y - p)) as bigint))").cast("long").alias("sae"),
    ]
    gram = [
        F.expr(f"cast(s_{k} as double) / 1000000.0").alias(k) for k in _IRLS_TERMS
    ] + [F.col("n"), F.col("sae")]
    ws = []
    for k in range(1, _IRLS_ITERS + 1):
        rows = (
            base.crossJoin(F.broadcast(w.select("b0", "b1", "b2")))
            .selectExpr("y", "x1", "x2", f"{_IRLS_Z} AS z")
            .selectExpr("y", "x1", "x2", f"{_IRLS_P} AS p")
        )
        a = rows.agg(*sums).select(*gram)
        w = (
            a.crossJoin(F.broadcast(w.select("b0", "b1", "b2")))
            .selectExpr(
                *[
                    f"(round(b{j} + ({_IRLS_D[j]}) / ({_IRLS_DET}), 6) + 0.0) AS b{j}"
                    for j in range(3)
                ],
                "n",
                "sae div n AS mae_ppm",
            )
            .localCheckpoint(eager=False)
        )
        ws.append(w)
    return base, ws


@register("ml_logreg_irls", group="stats-ml", oracle=_irls_oracle())
def ml_logreg_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed LOGISTIC-family regression by IRLS/Newton — the
    iterative-optimization counterpart of [[ml_linreg_normal]]'s one-shot
    normal equations, and the missing convex-fit member of the ML family
    (k-means: alternating; PCA: power iteration; this: Newton). Each of
    the 3 unrolled iterations collapses the corpus to TEN exact-integer
    sufficient statistics (the weighted Gram matrix X'WX, the score
    vector X'(y-p), n, and a training-MAE diagnostic), solves the 3x3
    Newton system by Cramer's rule on the driver-free 1-row frame, and
    re-broadcasts the updated coefficients. Output: the coefficient
    TRAJECTORY (iter, n, b0, b1, b2, mae_ppm) — mae_ppm is measured
    under the PREVIOUS iterate during the same pass, so iter-1 is always
    500000 (the w=0 model predicts p=1/2 everywhere).

    Exactness across engines (no rows-only cop-out for an "iterative"
    algorithm): the link is the rational fast sigmoid 0.5+z/(2(1+|z|))
    — correctly-rounded IEEE ops only, unlike exp() — per-row Gram
    terms are floor(1e6·t) BIGINTs so sums are order-independent, the
    solve is one shared expression string, and coefficients are rounded
    to 6dp before re-entering the next pass. The label is planted:
    P(y=1|qty) = (100+16·qty)/1000 via an orderkey-hash draw, so the
    test suite can pin that the fit RECOVERS b1 > 0 against the b2 = 0
    discount control.

    Shape at scale: per iteration ONE map-side-combined aggregate whose
    output is 11 scalars — no shuffle wider than the partial-agg tree,
    no .collect() (the 1-row coefficient frame stays a broadcast
    DataFrame, lineage-truncated per step). k features cost a k² Gram
    row, the ml_linreg_normal generalization note made executable."""
    _, ws = _irls_fit(spark, sf_dir)
    out = [
        w.selectExpr(
            f"cast({k} as bigint) AS iter",
            "n",
            "b0",
            "b1",
            "b2",
            "cast(mae_ppm as bigint) AS mae_ppm",
        )
        for k, w in enumerate(ws, 1)
    ]
    res = out[0]
    for df in out[1:]:
        res = res.unionAll(df)
    return res


# ---------------------------------------------------------------------------
# text_tokenizer_fertility — per-language BPE fertility / compression audit


_FERT_ORACLE = f"""
    WITH b AS ({_BPE_APPLY_ORACLE})
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(b.n_tokens_ws) AS BIGINT) AS tokens_ws,
           CAST(SUM(b.n_tokens_bpe) AS BIGINT) AS tokens_bpe,
           CAST(SUM(b.n_tokens_bpe) * 10000 // SUM(b.n_tokens_ws) AS BIGINT)
             AS fertility_bp,
           CAST(SUM(d.n_chars) * 1000 // SUM(b.n_tokens_bpe) AS BIGINT)
             AS chars_per_bpe_milli
    FROM b JOIN documents d USING (doc_id)
    GROUP BY d.lang
    """


@register("text_tokenizer_fertility", group="stats-ml", oracle=_FERT_ORACLE)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LANGUAGE tokenizer fertility — the multilingual health metric
    every production tokenizer review reads first (how many subword
    tokens the tokenizer spends per whitespace word, by language): a
    language whose fertility is far above the corpus norm is
    under-served by the merge table (its text costs more context budget
    per word), the standard argument for rebalancing BPE training data.
    Composes [[text_bpe_tokenize]]'s per-doc counts with the documents
    language column; also emits chars-per-BPE-token (milli-chars, the
    compression-rate view of the same health check).

    Shape at scale: the per-doc token counts already reduce to one row
    per doc in text_bpe_tokenize's broadcast-join aggregate; this adds
    a |langs|-group rollup of that table joined to the (doc_id, lang,
    n_chars) projection — integer `div` ratios, exact oracle."""
    b = text_bpe_tokenize(spark, sf_dir)
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return (
        b.join(d, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens_ws").cast("long").alias("tokens_ws"),
            F.sum("n_tokens_bpe").cast("long").alias("tokens_bpe"),
            F.expr("sum(n_tokens_bpe) * 10000 div sum(n_tokens_ws)")
            .cast("long")
            .alias("fertility_bp"),
            F.expr("sum(n_chars) * 1000 div sum(n_tokens_bpe)")
            .cast("long")
            .alias("chars_per_bpe_milli"),
        )
    )


# ---------------------------------------------------------------------------
# stats_ljung_box — portmanteau white-noise test on the hourly rate


_LB_H = 3  # lags pooled into Q
_LB_CRIT_95 = 7.814728  # chi-square(3) upper 5% point

# rho_k as ONE double division of exact integers: multiply the mean-centered
# numerator and denominator through by n^2 —
#   N_k = n^2*Sxy_k - n*Sx*(Sh_k + St_k) + (n - k)*Sx^2
#   D   = n^2*Sxx   - n*Sx^2
# (classic sample ACF: full-series mean and denominator, n - k cross terms).
_LB_RHO = (
    "cast((nd * nd * sxy{k} - nd * sx * (sh{k} + st{k}) + (nd - {k}) * sx * sx)"
    " as double) / cast((nd * nd * sxx - nd * sx * sx) as double)"
)
_LB_Q = (
    "cast(n as double) * (cast(n as double) + 2.0)"
    " * (rho1 * rho1 / (cast(n as double) - 1.0)"
    "  + rho2 * rho2 / (cast(n as double) - 2.0)"
    "  + rho3 * rho3 / (cast(n as double) - 3.0))"
)

_LB_ORACLE = f"""
    WITH c AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS bucket_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type, list(n_events ORDER BY bucket_us) AS xs
      FROM c GROUP BY event_type
    ), m AS (
      SELECT event_type, CAST(len(xs) AS BIGINT) AS n,
             CAST(len(xs) AS HUGEINT) AS nd,
             CAST(list_sum(xs) AS HUGEINT) AS sx,
             CAST(list_sum(list_transform(xs, x -> x * x)) AS HUGEINT) AS sxx,
             {", ".join(
               f"CAST(list_sum(list_transform(generate_series(1, len(xs) - {k}),"
               f" i -> xs[i] * xs[i + {k}])) AS HUGEINT) AS sxy{k},"
               f" CAST(list_sum(xs[1 : len(xs) - {k}]) AS HUGEINT) AS sh{k},"
               f" CAST(list_sum(xs[{k} + 1 : len(xs)]) AS HUGEINT) AS st{k}"
               for k in range(1, _LB_H + 1)
             )}
      FROM s WHERE len(xs) > {_LB_H + 1}
    ), r AS (
      SELECT event_type, n,
             {", ".join(_LB_RHO.format(k=k) + f" AS rho{k}" for k in range(1, _LB_H + 1))}
      FROM m
    )
    SELECT event_type, n,
           {", ".join(f"(round(rho{k}, 6) + 0.0) AS rho{k}" for k in range(1, _LB_H + 1))},
           (round({_LB_Q}, 6) + 0.0) AS q_lb,
           CAST(CASE WHEN {_LB_Q} > {_LB_CRIT_95} THEN 1 ELSE 0 END AS BIGINT)
             AS white_noise_rejected
    FROM r
    """


@register("stats_ljung_box", group="stats-ml", oracle=_LB_ORACLE)
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau white-noise test on the hourly event rate
    per type — the DECISION layer over [[ts_autocorr]]'s descriptive
    ACF: Q = n(n+2)·Σ_{{k≤{h}}} ρ̂_k²/(n−k) against the χ²({h}) 95%
    point ({crit}), the standard pre-forecasting gate ("is there any
    serial structure for [[ts_holt_linear]] / [[events_forecast_backtest]]
    to exploit, or is this type pure noise?"). Uses the textbook sample
    ACF (full-series mean, full-series denominator, n−k cross products)
    — NOT ts_autocorr's Pearson-pairs variant; the docstrings
    cross-reference the difference deliberately.

    Exactness: each ρ̂_k is ONE double division of exact integer
    moments — the centered numerator and denominator are multiplied
    through by n² so x̄ never appears as a rounded intermediate
    (DECIMAL(38,0)/HUGEINT products of BIGINT HOF sums, the
    ts_autocorr fold family); Q is the identical double chain in both
    engines. Shape at scale: raw events pay the (type, hour) rollup
    shuffle once; everything after rides the tiny per-type bucket
    list."""
    c = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000 * 3600000000").alias("bucket_us"),
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    xs = F.transform(
        F.array_sort(F.collect_list(F.struct("bucket_us", "n_events"))),
        lambda s: s["n_events"],
    )
    s = c.groupBy("event_type").agg(xs.alias("xs")).filter(
        F.size("xs") > _LB_H + 1
    )
    zero = F.lit(0).cast("long")
    moments = [
        F.size("xs").cast("long").alias("n"),
        F.size("xs").cast("decimal(38,0)").alias("nd"),
        F.aggregate(F.col("xs"), zero, lambda a, x: a + x)
        .cast("decimal(38,0)")
        .alias("sx"),
        F.aggregate(F.col("xs"), zero, lambda a, x: a + x * x)
        .cast("decimal(38,0)")
        .alias("sxx"),
    ]
    for k in range(1, _LB_H + 1):
        head = F.expr(f"slice(xs, 1, size(xs) - {k})")
        tail_ = F.expr(f"slice(xs, {k} + 1, size(xs) - {k})")
        moments += [
            F.aggregate(
                F.zip_with(head, tail_, lambda x, y: x * y), zero, lambda a, x: a + x
            )
            .cast("decimal(38,0)")
            .alias(f"sxy{k}"),
            F.aggregate(head, zero, lambda a, x: a + x)
            .cast("decimal(38,0)")
            .alias(f"sh{k}"),
            F.aggregate(tail_, zero, lambda a, x: a + x)
            .cast("decimal(38,0)")
            .alias(f"st{k}"),
        ]
    m = s.select("event_type", *moments)
    r = m.selectExpr(
        "event_type",
        "n",
        *[_LB_RHO.format(k=k) + f" AS rho{k}" for k in range(1, _LB_H + 1)],
    )
    return r.selectExpr(
        "event_type",
        "n",
        *[f"(round(rho{k}, 6) + 0.0) AS rho{k}" for k in range(1, _LB_H + 1)],
        f"(round({_LB_Q}, 6) + 0.0) AS q_lb",
        f"cast(case when {_LB_Q} > {_LB_CRIT_95} then 1 else 0 end as bigint)"
        " AS white_noise_rejected",
    )


stats_ljung_box.__doc__ = stats_ljung_box.__doc__.format(h=_LB_H, crit=_LB_CRIT_95)


# ---------------------------------------------------------------------------
# events_did_estimator — difference-in-differences readout (round 15)

_DID_LIFT_CENTS = 8000  # planted treated-post lift per purchase event (sized to dominate the ~14-dollar cell SE even at the sf0.001 fixture)

# Deterministic 50/50 treatment assignment from the user key (the
# ml_logreg_irls planting trick; mod-reduce first so the product never
# nears 2^63 at any user-pool size).
_DID_TREAT = "((user_id % 1000003) * 2654435761) % 1000 < 500"

_DID_VAR = (
    "cast(nd_{c} * sq_{c} - s_{c} * s_{c} as double)"
    " / cast(nd_{c} * (nd_{c} - 1) as double)"
)
_DID_MEAN = "cast(s_{c} as double) / cast(n_{c} as double)"
_DID_EST = (
    f"(({_DID_MEAN.format(c='tp')}) - ({_DID_MEAN.format(c='tr')}))"
    f" - (({_DID_MEAN.format(c='cp')}) - ({_DID_MEAN.format(c='cr')}))"
)
_DID_SE = (
    "sqrt("
    + " + ".join(
        f"({_DID_VAR.format(c=c)}) / cast(n_{c} as double)"
        for c in ("tp", "tr", "cp", "cr")
    )
    + ")"
)


def _did_oracle() -> str:
    cells = {
        "tp": "treat = 1 AND post = 1",
        "tr": "treat = 1 AND post = 0",
        "cp": "treat = 0 AND post = 1",
        "cr": "treat = 0 AND post = 0",
    }
    sums = ", ".join(
        f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS n_{c},"
        f" CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS HUGEINT) AS nd_{c},"
        f" CAST(SUM(CASE WHEN {cond} THEN cents ELSE 0 END) AS HUGEINT) AS s_{c},"
        f" CAST(SUM(CASE WHEN {cond} THEN cents * cents ELSE 0 END) AS HUGEINT)"
        f" AS sq_{c}"
        for c, cond in cells.items()
    )
    means = ", ".join(
        f"(round({_DID_MEAN.format(c=c)}, 6) + 0.0) AS mean_{c}" for c in cells
    )
    return f"""
    WITH d AS (
      SELECT user_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT) AS day,
             CAST(round(value * 100) AS BIGINT) AS base_cents
      FROM events WHERE event_type = 'purchase'
    ), b AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM d),
    v AS (
      SELECT CASE WHEN {_DID_TREAT} THEN 1 ELSE 0 END AS treat,
             CASE WHEN day >= b.mid THEN 1 ELSE 0 END AS post,
             base_cents + CASE WHEN ({_DID_TREAT}) AND day >= b.mid
                               THEN {_DID_LIFT_CENTS} ELSE 0 END AS cents
      FROM d, b
    ), m AS (SELECT {sums} FROM v)
    SELECT n_tp, n_tr, n_cp, n_cr, {means},
           (round({_DID_EST}, 6) + 0.0) AS did_estimate,
           (round({_DID_SE}, 6) + 0.0) AS se,
           (round(({_DID_EST}) / ({_DID_SE}), 6) + 0.0) AS t_stat,
           CAST(CASE WHEN abs(({_DID_EST}) / ({_DID_SE})) > 1.96
                THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM m
    """


@register("events_did_estimator", group="stats-ml", oracle=_did_oracle())
def events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the panel-data causal design next to
    [[stats_ab_cuped]]'s covariate adjustment: purchase spend per event
    in four (treat x pre/post) cells, effect = (treated post−pre) −
    (control post−pre), cancelling both the level difference between
    groups and the common time trend. Treatment is a deterministic
    user-key hash split and a {lift}-cent lift is PLANTED on
    treated-post purchases (the [[ml_logreg_irls]] recoverable-signal
    trick), so the estimate has a known truth the tests pin — on this
    otherwise-random corpus the estimator must read back ~{lift}
    cents with a significant t.

    Exactness: cell moments are exact BIGINT/DECIMAL sums of integer
    cents; means, Welch-style pooled SE, and t are one shared double
    chain. Shape at scale: ONE corpus pass collapses to 16 scalars in a
    single map-side-combined aggregate (no per-user shuffle — the cell
    assignment is a pure row function); the day midpoint rides a 1-row
    broadcast, the same discipline as stats_ab_cuped."""
    d = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            F.expr("cast(round(value * 100) as bigint)").alias("base_cents"),
        )
    )
    b = d.agg(F.expr("(min(day) + max(day) + 1) div 2").alias("mid"))
    v = d.crossJoin(F.broadcast(b)).selectExpr(
        f"case when {_DID_TREAT} then 1 else 0 end AS treat",
        "case when day >= mid then 1 else 0 end AS post",
        f"base_cents + case when ({_DID_TREAT}) and day >= mid"
        f" then {_DID_LIFT_CENTS} else 0 end AS cents",
    )
    cells = {
        "tp": "treat = 1 AND post = 1",
        "tr": "treat = 1 AND post = 0",
        "cp": "treat = 0 AND post = 1",
        "cr": "treat = 0 AND post = 0",
    }
    sums = []
    for c, cond in cells.items():
        sums += [
            F.expr(f"cast(sum(case when {cond} then 1 else 0 end) as bigint)").alias(f"n_{c}"),
            F.expr(f"cast(sum(case when {cond} then 1 else 0 end) as decimal(38,0))").alias(f"nd_{c}"),
            F.expr(
                f"sum(cast(case when {cond} then cents else 0 end as decimal(38,0)))"
            ).alias(f"s_{c}"),
            # Per-row decimal cast BEFORE the SUM (ADVICE r15): Spark's
            # SUM(BIGINT) stays BIGINT, so cents*cents (~3.2e8 each) would
            # silently wrap past ~2.8e10 purchase rows; DuckDB's SUM widens
            # to HUGEINT natively, so the oracle needs no change.
            F.expr(
                f"sum(cast(case when {cond} then cents * cents else 0 end"
                " as decimal(38,0)))"
            ).alias(f"sq_{c}"),
        ]
    m = v.agg(*sums)
    return m.selectExpr(
        "n_tp", "n_tr", "n_cp", "n_cr",
        *[f"(round({_DID_MEAN.format(c=c)}, 6) + 0.0) AS mean_{c}" for c in cells],
        f"(round({_DID_EST}, 6) + 0.0) AS did_estimate",
        f"(round({_DID_SE}, 6) + 0.0) AS se",
        f"(round(({_DID_EST}) / ({_DID_SE}), 6) + 0.0) AS t_stat",
        f"cast(case when abs(({_DID_EST}) / ({_DID_SE})) > 1.96"
        " then 1 else 0 end as bigint) AS significant",
    )


events_did_estimator.__doc__ = events_did_estimator.__doc__.format(
    lift=_DID_LIFT_CENTS
)


# ---------------------------------------------------------------------------
# ml_gbdt_stumps — histogram-based gradient boosting with stump learners

_GB_NU = 0.5  # shrinkage
_GB_ROUNDS = 3


def _gb_resid(m: int) -> str:
    """Residual under the m-stump model — the shared per-row string both
    engines evaluate (model columns b0, f{j}/t{j}/vl{j}/vr{j} ride the
    1-row broadcast frame)."""
    e = "CAST(y AS DOUBLE) - b0"
    for j in range(1, m + 1):
        e += (
            f" - (CASE WHEN (f{j} = 'x1' AND x1 <= t{j})"
            f" OR (f{j} = 'x2' AND x2 <= t{j})"
            f" THEN vl{j} ELSE vr{j} END)"
        )
    return f"({e})"


# SSE-reduction score of a split candidate, over quantized-residual sums
# (exact ints -> identical doubles): S_l^2/n_l + S_r^2/n_r - S^2/n.
_GB_GAIN = (
    "CAST(s_l AS DOUBLE) * CAST(s_l AS DOUBLE) / CAST(n_l AS DOUBLE)"
    " + CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE)"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
)
_GB_MEAN_L = "CAST(s_l AS DOUBLE) / CAST(n_l AS DOUBLE) / 1000000.0"
_GB_MEAN_R = "CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE) / 1000000.0"


def _gbdt_oracle() -> str:
    base = "SELECT " + ", ".join(_IRLS_BASE_COLS) + " FROM lineitem"
    sql = f"""WITH base AS ({base}),
    w0 AS (SELECT (round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) + 0.0) AS b0 FROM base)"""
    for k in range(1, _GB_ROUNDS + 1):
        r = _gb_resid(k - 1)
        sql += f""", rows{k} AS (
      SELECT x1, x2, CAST(floor(1000000 * {r}) AS BIGINT) AS q,
             CAST(floor(1000000 * ({r}) * ({r})) AS BIGINT) AS q2
      FROM base CROSS JOIN w{k - 1}
    ), tot{k} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(q) AS HUGEINT) AS s,
             CAST(SUM(q2) AS HUGEINT) AS sq2 FROM rows{k}
    ), hist{k} AS (
      SELECT feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(q) AS HUGEINT) AS sv
      FROM (SELECT 'x1' AS feat, x1 AS val, q FROM rows{k}
            UNION ALL SELECT 'x2' AS feat, x2 AS val, q FROM rows{k})
      GROUP BY feat, val
    ), cum{k} AS (
      SELECT feat, val,
             CAST(SUM(cnt) OVER (PARTITION BY feat ORDER BY val) AS BIGINT) AS n_l,
             CAST(SUM(sv) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) AS s_l
      FROM hist{k}
    ), cand{k} AS (
      SELECT feat, val, n_l, s_l, t.n - n_l AS n_r, t.s - s_l AS s_r, t.n AS n, t.s AS s
      FROM cum{k} CROSS JOIN tot{k} t WHERE t.n - n_l > 0
    ), best{k} AS (
      SELECT feat, val, ({_GB_GAIN}) AS gain_q,
             ({_GB_MEAN_L}) AS mean_l, ({_GB_MEAN_R}) AS mean_r
      FROM cand{k} ORDER BY gain_q DESC, feat, val LIMIT 1
    ), w{k} AS (
      SELECT w.*,
             b.feat AS f{k}, b.val AS t{k},
             (round({_GB_NU} * b.mean_l, 6) + 0.0) AS vl{k},
             (round({_GB_NU} * b.mean_r, 6) + 0.0) AS vr{k},
             (round(b.gain_q / 1e12, 6) + 0.0) AS gain{k},
             t.sq2 // t.n AS mse_ppm{k}
      FROM w{k - 1} w CROSS JOIN best{k} b CROSS JOIN tot{k} t
    )"""
    union = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS round, f{k} AS feat,"
        f" CAST(t{k} AS BIGINT) AS threshold, gain{k} AS gain,"
        f" vl{k} AS v_left, vr{k} AS v_right,"
        f" CAST(mse_ppm{k} AS BIGINT) AS mse_ppm FROM w{_GB_ROUNDS}"
        for k in range(1, _GB_ROUNDS + 1)
    )
    return sql + "\n" + union


@register("ml_gbdt_stumps", group="stats-ml", oracle=_gbdt_oracle())
def ml_gbdt_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HISTOGRAM-based gradient boosting ({rounds} rounds of depth-1
    trees, L2 loss, shrinkage {nu}) — the LightGBM split-finding shape
    on DataFrames, completing the iterative-ML trio next to
    [[ml_logreg_irls]] (Newton) and [[ml_pca_power]] (power iteration),
    over the same planted label (P(y=1|qty) known, discount the null
    control — boosting must select x1 every round, pinned). Per round:
    residuals under the current additive model (model columns ride a
    1-row broadcast), a (feature, value) HISTOGRAM of quantized
    residual sums — candidate split stats come from a cumulative window
    over that tiny table, NEVER a per-candidate scan of the corpus (the
    histogram trick that makes GBDT distributed) — argmax split by SSE
    reduction, leaf values shrunk and folded into the model frame.

    Exactness: per-row residuals are identical doubles from one shared
    expression string; histogram sums quantize floor(1e6·r) to BIGINT
    (order-independent); gains/means are one shared double chain;
    leaf values round to 6dp before re-entering the next pass — an
    iterative ensemble trainer with an exact cross-engine oracle.
    Output: the boosting TRAJECTORY (round, feat, threshold, gain,
    v_left, v_right, mse_ppm) — mse_ppm is the pre-update training MSE,
    so round 1 shows the variance of y around its mean.

    Shape at scale: each round is one corpus map (residual + quantize)
    into TWO partial-agg shuffles (the global moment row and the
    O(|features|·|distinct values|) histogram); split search and the
    model update ride the histogram. Continuous features bin to fixed
    histograms first (the LightGBM discipline), keeping the shuffle
    O(features · bins) at any corpus size."""
    base = table(spark, sf_dir, "lineitem").selectExpr(*_IRLS_BASE_COLS)
    w = base.agg(
        F.expr("(round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) + 0.0)").alias("b0")
    ).localCheckpoint(eager=False)
    out = []
    for k in range(1, _GB_ROUNDS + 1):
        r = _gb_resid(k - 1)
        rows = base.crossJoin(F.broadcast(w)).selectExpr(
            "x1",
            "x2",
            f"CAST(floor(1000000 * {r}) AS BIGINT) AS q",
            f"CAST(floor(1000000 * ({r}) * ({r})) AS BIGINT) AS q2",
        )
        tot = rows.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("q").cast("decimal(38,0)").alias("s"),
            F.sum("q2").cast("decimal(38,0)").alias("sq2"),
        )
        hist = (
            rows.select(
                F.explode(
                    F.array(
                        F.struct(F.lit("x1").alias("feat"), F.col("x1").alias("val")),
                        F.struct(F.lit("x2").alias("feat"), F.col("x2").alias("val")),
                    )
                ).alias("fv"),
                "q",
            )
            .groupBy(F.col("fv.feat").alias("feat"), F.col("fv.val").alias("val"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("cnt"),
                F.sum("q").cast("decimal(38,0)").alias("sv"),
            )
        )
        wc = (
            Window.partitionBy("feat")
            .orderBy("val")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = hist.select(
            "feat",
            "val",
            F.sum("cnt").over(wc).cast("long").alias("n_l"),
            F.sum("sv").over(wc).cast("decimal(38,0)").alias("s_l"),
        )
        cand = (
            cum.crossJoin(F.broadcast(tot))
            .selectExpr(
                "feat", "val", "n_l", "s_l",
                "n - n_l AS n_r", "s - s_l AS s_r", "n", "s", "sq2",
            )
            .filter(F.col("n_r") > 0)
        )
        best = (
            cand.selectExpr(
                "feat", "val", "sq2", "n",
                f"({_GB_GAIN}) AS gain_q",
                f"({_GB_MEAN_L}) AS mean_l",
                f"({_GB_MEAN_R}) AS mean_r",
            )
            .orderBy(F.col("gain_q").desc(), "feat", "val")
            .limit(1)
        )
        w = (
            w.crossJoin(F.broadcast(best))
            .selectExpr(
                *w.columns,
                f"feat AS f{k}",
                f"val AS t{k}",
                f"(round({_GB_NU} * mean_l, 6) + 0.0) AS vl{k}",
                f"(round({_GB_NU} * mean_r, 6) + 0.0) AS vr{k}",
                f"(round(gain_q / 1e12, 6) + 0.0) AS gain{k}",
                f"sq2 div n AS mse_ppm{k}",
            )
            .localCheckpoint(eager=False)
        )
    for k in range(1, _GB_ROUNDS + 1):
        out.append(
            w.selectExpr(
                f"CAST({k} AS BIGINT) AS round",
                f"f{k} AS feat",
                f"CAST(t{k} AS BIGINT) AS threshold",
                f"gain{k} AS gain",
                f"vl{k} AS v_left",
                f"vr{k} AS v_right",
                f"CAST(mse_ppm{k} AS BIGINT) AS mse_ppm",
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionAll(df)
    return res


ml_gbdt_stumps.__doc__ = ml_gbdt_stumps.__doc__.format(
    rounds=_GB_ROUNDS, nu=_GB_NU
)


# ---------------------------------------------------------------------------
# stats_cramers_v_matrix — pairwise categorical association (round 15)

# band expressions are {fdiv}-parameterized (Spark `div` / DuckDB `//`),
# the pipeline_zorder_layout convention; bands stay BIGINT keys
_CV_VARS = (
    ("retflag", "l_returnflag"),
    ("linestatus", "l_linestatus"),
    ("qty_band", "CAST(round(l_quantity) AS BIGINT) {fdiv} 10"),
    ("disc_band", "CAST(round(l_discount * 100) AS BIGINT) {fdiv} 3"),
)

# chi2 = n * (sum_cells o^2/(r_i*c_j) - 1); the cell term is quantized to
# floor(1e9 * o^2 / (r*c)) so the cross-cell SUM is order-independent
# (declared precision: |error| < cells/1e9 — invisible at round 6 for
# these card-<=20 contingency tables).
_CV_CELL = "floor(1000000000.0 * CAST(o AS DOUBLE) * CAST(o AS DOUBLE) / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))"
_CV_CHI2 = "CAST(n AS DOUBLE) * (CAST(sq AS DOUBLE) / 1000000000.0 - 1.0)"
_CV_V = "sqrt(({chi2}) / (CAST(n AS DOUBLE) * (CAST(dof_min AS DOUBLE) - 1.0)))"


def _cramers_oracle() -> str:
    feats = ", ".join(f"{expr.format(fdiv='//')} AS {name}" for name, expr in _CV_VARS)
    pair_sqls = []
    for i, (a, _) in enumerate(_CV_VARS):
        for b, _ in [v for v in _CV_VARS[i + 1 :]]:
            b = b[0] if isinstance(b, tuple) else b
            pair_sqls.append(f"""
    SELECT '{a}' AS var_x, '{b}' AS var_y, n, rc, cc,
           (round({_CV_CHI2}, 6) + 0.0) AS chi2,
           (round({_CV_V.format(chi2=_CV_CHI2)}, 6) + 0.0) AS cramers_v
    FROM (
      SELECT CAST(SUM({_CV_CELL}) AS BIGINT) AS sq,
             MIN(n) AS n,
             MIN(rc) AS rc, MIN(cc) AS cc,
             LEAST(MIN(rc), MIN(cc)) AS dof_min
      FROM (
        SELECT o.o, r.r, c.c, t.n, rcc.rc, ccc.cc
        FROM (SELECT {a} AS x, {b} AS y, CAST(COUNT(*) AS BIGINT) AS o
              FROM base GROUP BY 1, 2) o
        JOIN (SELECT {a} AS x, CAST(COUNT(*) AS BIGINT) AS r FROM base GROUP BY 1) r
          USING (x)
        JOIN (SELECT {b} AS y, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1) c
          USING (y)
        CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base) t
        CROSS JOIN (SELECT CAST(COUNT(DISTINCT {a}) AS BIGINT) AS rc FROM base) rcc
        CROSS JOIN (SELECT CAST(COUNT(DISTINCT {b}) AS BIGINT) AS cc FROM base) ccc
      )
    )""")
    body = " UNION ALL ".join(pair_sqls)
    return f"WITH base AS (SELECT {feats} FROM lineitem) {body}"


@register("stats_cramers_v_matrix", group="stats-ml", oracle=_cramers_oracle())
def stats_cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Cramér's V over the four lineitem CATEGORICALS (return
    flag, line status, quantity band, discount band) — the categorical
    twin of [[stats_corr_matrix]]'s Pearson matrix and the matrix form
    of [[stats_chi2_independence]]'s single pair: V =
    sqrt(chi2 / (n·(min(r,c)−1))) in [0,1], the EDA table that says
    which discrete columns carry shared structure before anyone builds
    features from them. chi2 uses the contingency identity
    n·(Σ o²/(rᵢ·cⱼ) − 1) so only COUNTS are aggregated from the corpus;
    each cell's double term is floor-quantized to 1e-9 before the
    cross-cell sum, making the sum order-independent (declared
    precision far below the 6dp rounding).

    Shape at scale: ONE corpus pass (VERDICT r15 #2 — the r15 version
    re-scanned lineitem six times). Each row explodes into its 6
    (pair, x, y) cell keys map-side and a single partial-agg shuffle
    builds ALL pairwise contingency tables at once — ≤ 6·|cells| keys,
    the [[stats_corr_matrix]] one-scan discipline applied to counts.
    Marginals r/c, totals n, and cardinalities rc/cc are then derived
    FROM the tiny rollup (window sums + distinct counts over ≤ a few
    hundred rows), never from the corpus; the V arithmetic rides that
    frame. Cell values are cast to string inside the explode structs so
    the four mixed-type categoricals share one cell schema — counting
    is injective under the cast, and no value leaves the rollup.
    Cardinalities here are ≤20; high-card categoricals get hashed into
    bands first, exactly as the qty/disc bands demonstrate."""
    feats = [F.expr(expr.format(fdiv="div")).alias(name) for name, expr in _CV_VARS]
    # spread_scan: the fused one-scan design concentrates the whole 6-way
    # explode + partial agg on the corpus scan tasks, which the local
    # single-row-group layout serializes (r16 skew flag); identity on any
    # multi-file corpus
    base = spread_scan(table(spark, sf_dir, "lineitem").select(*feats))
    names = [n for n, _ in _CV_VARS]
    cell_structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("var_x"),
                F.lit(b).alias("var_y"),
                F.col(a).cast("string").alias("x"),
                F.col(b).cast("string").alias("y"),
            )
            for i, a in enumerate(names)
            for b in names[i + 1 :]
        ]
    )
    o = (
        base.select(F.explode(cell_structs).alias("e"))
        .select("e.var_x", "e.var_y", "e.x", "e.y")
        .groupBy("var_x", "var_y", "x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    cells = o.select(
        "var_x",
        "var_y",
        "x",
        "y",
        "o",
        F.sum("o").over(Window.partitionBy("var_x", "var_y", "x")).alias("r"),
        F.sum("o").over(Window.partitionBy("var_x", "var_y", "y")).alias("c"),
        F.sum("o").over(Window.partitionBy("var_x", "var_y")).alias("n"),
    )
    agg = cells.groupBy("var_x", "var_y").agg(
        F.expr(f"CAST(SUM({_CV_CELL}) AS BIGINT)").alias("sq"),
        F.min("n").alias("n"),
        F.countDistinct("x").cast("long").alias("rc"),
        F.countDistinct("y").cast("long").alias("cc"),
    )
    return (
        agg.withColumn("dof_min", F.expr("LEAST(rc, cc)"))
        .selectExpr(
            "var_x",
            "var_y",
            "n",
            "rc",
            "cc",
            f"(round({_CV_CHI2}, 6) + 0.0) AS chi2",
            f"(round({_CV_V.format(chi2=_CV_CHI2)}, 6) + 0.0) AS cramers_v",
        )
    )


# ---------------------------------------------------------------------------
# ml_calibration_reliability — reliability diagram of the IRLS model


def _calib_oracle() -> str:
    last = f"w{_IRLS_ITERS}"
    return f"""
    WITH {_irls_ctes()},
    scored AS (
      SELECT y,
             LEAST(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
             CAST(floor(1000000 * p) AS BIGINT) AS pq,
             CAST(floor(1000000 * (y - p) * (y - p)) AS BIGINT) AS bq
      FROM (SELECT y, {_IRLS_P} AS p
            FROM (SELECT y, x1, x2, {_IRLS_Z} AS z
                  FROM base CROSS JOIN {last}))
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(pq) // COUNT(*) AS BIGINT) AS pred_ppm,
           CAST(1000000 * SUM(y) // COUNT(*) AS BIGINT) AS obs_ppm,
           CAST(abs(SUM(pq) // COUNT(*) - 1000000 * SUM(y) // COUNT(*)) AS BIGINT)
             AS gap_ppm,
           CAST(SUM(bq) // COUNT(*) AS BIGINT) AS brier_ppm
    FROM scored GROUP BY bin
    """


@register("ml_calibration_reliability", group="stats-ml", oracle=_calib_oracle())
def ml_calibration_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELIABILITY diagram of the trained IRLS model ([[ml_logreg_irls]],
    the same fit via the shared `_irls_fit`/`_irls_ctes` machinery — both
    engines score the identical generated model): predicted probability
    deciles vs observed positive rate, per-bin Brier contribution — the
    calibration audit that belongs next to discrimination metrics
    ([[ml_score_auc]], [[ml_eval_metrics]]): a model can rank perfectly
    and still lie about its probabilities, and calibration is what
    decides whether a 0.7 means 70%. Because the label is planted with
    P(y=1|qty) linear in qty, the fitted link is only approximately
    right — the per-bin gaps emitted here are the honest measure of that
    approximation, and the tests pin its size: weighted ECE under 6pp,
    every >=5%-mass decile within 12pp (the low deciles really are ~6pp
    over-confident under the rational link — the operator's job is to
    say so).

    Exactness: scoring reuses the IRLS per-row expression strings;
    per-row quantities are floor-quantized (pq = floor(1e6·p), the
    Brier term likewise) so the per-bin sums are order-independent and
    the ratios are integer `div` — exact oracle. Shape at scale: one
    corpus pass after the (already aggregate-only) fit, collapsing to
    <=10 rows in a single map-side-combined groupBy."""
    base, ws = _irls_fit(spark, sf_dir)
    w = ws[-1].select("b0", "b1", "b2")
    scored = (
        base.crossJoin(F.broadcast(w))
        .selectExpr("y", f"{_IRLS_Z} AS z")
        .selectExpr("y", f"{_IRLS_P} AS p")
        .selectExpr(
            "y",
            "LEAST(CAST(floor(p * 10) AS BIGINT), 9L) AS bin",
            "CAST(floor(1000000 * p) AS BIGINT) AS pq",
            "CAST(floor(1000000 * (y - p) * (y - p)) AS BIGINT) AS bq",
        )
    )
    return scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("sum(pq) div count(1)").cast("long").alias("pred_ppm"),
        F.expr("1000000 * sum(y) div count(1)").cast("long").alias("obs_ppm"),
        F.expr(
            "abs(sum(pq) div count(1) - 1000000 * sum(y) div count(1))"
        ).cast("long").alias("gap_ppm"),
        F.expr("sum(bq) div count(1)").cast("long").alias("brier_ppm"),
    )
