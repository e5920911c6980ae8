"""Group 5 — LLM-data-pipeline extensions (SURVEY.md §2B + BASELINE.json
north_star): text analysis, embedding similarity, near-dup detection,
multimodal columns. All hot paths are built-in higher-order functions /
DataFrame ops (JVM-side); MinHash-LSH uses spark.ml.

Scale stance: token/shingle explosion is map-side (no shuffle until the
aggregate); cosine top-k broadcasts the probe (O(1) rows) so the 100 TB
embedding table never shuffles; centroids aggregate exactly
(integer-scaled) with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._determinism import round_pos
from ..functions.vector import SQL_ICOSINE, SQL_ISCALE, icosine
from ..tables import spread_scan, table
from .registry import register


@register(
    "text_tokens_topk",
    group="llm",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def text_tokens_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus terms by frequency (tie-broken by term)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@register(
    "text_tfidf",
    group="llm",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             (round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 4) + 0.0) AS tfidf_r,
             row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, tf.term) AS rn
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf_r FROM scored WHERE rn <= 3
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf, top-3 terms per doc. Ranking uses integer (tf, term) order —
    float weights are reported (rounded) but never ordered on, so 1-ulp ln
    differences can't flip rows. The df side is a term-level aggregate
    broadcast back onto the tf side."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df from tf, not from toks: tf's rows ARE the distinct (doc, term)
    # pairs, so a plain count per term replaces countDistinct's two-shuffle
    # expand — one exchange fewer, same result.
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # n_docs as a broadcast 1-row aggregate, not a driver-side d.count():
    # the count stays inside the one submitted job (no extra scan, no
    # eager action during plan build).
    n = F.broadcast(d.agg(F.count(F.lit(1)).cast("double").alias("n_docs")))
    w = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), "term")
    return (
        tf.join(df, "term")
        .crossJoin(n)
        .withColumn(
            "tfidf_r",
            round_pos(F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 4),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf_r")
    )


@register(
    "text_lang_stats",
    group="llm",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           (round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) + 0.0) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats. avg_chars is ROUND(...,4) on both sides
    (repo determinism rule, SURVEY §2B) and the oracle's SUM is cast to
    BIGINT — DuckDB sums integers into HUGEINT, Spark into LONG (the r2
    hash-fail was both)."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        round_pos(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4).alias("avg_chars"),
    )




_COS_ORACLE_PAIR = f"""
    WITH a AS (SELECT {SQL_ISCALE.format(a='embedding')} AS sa FROM embeddings WHERE vec_id = 1),
         b AS (SELECT {SQL_ISCALE.format(a='embedding')} AS sb FROM embeddings WHERE vec_id = 2)
    SELECT 1 AS vec_a, 2 AS vec_b, {SQL_ICOSINE.format(sa='sa', sb='sb')} AS cos_r
    FROM a, b
"""


@register("sim_cosine_pair", group="llm", oracle=_COS_ORACLE_PAIR)
def sim_cosine_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine similarity between embeddings 1 and 2 — integer-scaled exact
    kernel (functions/vector.icosine), bit-identical across engines."""
    e = table(spark, sf_dir, "embeddings")
    a = e.filter(F.col("vec_id") == 1).select(F.col("embedding").alias("ea"))
    b = e.filter(F.col("vec_id") == 2).select(F.col("embedding").alias("eb"))
    return a.crossJoin(b).select(
        F.lit(1).alias("vec_a"),
        F.lit(2).alias("vec_b"),
        icosine(F.col("ea"), F.col("eb")).alias("cos_r"),
    )


@register(
    "sim_cosine_topk",
    group="llm",
    oracle=f"""
    WITH probe AS (
      SELECT {SQL_ISCALE.format(a='embedding')} AS pse FROM embeddings WHERE vec_id = 0
    ), scored AS (
      SELECT e.vec_id, {SQL_ICOSINE.format(sa=SQL_ISCALE.format(a='e.embedding'), sb='p.pse')} AS cos_r
      FROM embeddings e, probe p
      WHERE e.vec_id <> 0
    )
    SELECT vec_id, cos_r FROM scored ORDER BY cos_r DESC, vec_id LIMIT 5
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors of probe vec_id=0. The probe is a
    broadcast single row: the big side streams through map-side compute and
    TakeOrderedAndProject keeps only k rows per partition — no shuffle of
    the embedding table at any scale. Exact integer kernel; ordering on
    (exact cos, vec_id) is tie-stable across engines."""
    from ..functions.vector import idot, iscale
    from ._determinism import round_pos

    e = table(spark, sf_dir, "embeddings")
    # The broadcast row carries the probe already scaled WITH its norm, so
    # the per-candidate work is one iscale + one dot + one norm fold — not
    # re-scaling the probe and re-folding its norm n times. Bit-identical:
    # same sqrt on the same integer-valued double, wherever evaluated.
    probe = F.broadcast(
        e.filter(F.col("vec_id") == 0)
        .select(iscale(F.col("embedding")).alias("pse"))
        .withColumn("pnrm", F.sqrt(idot(F.col("pse"), F.col("pse")).cast("double")))
    )
    cand = (
        e.filter(F.col("vec_id") != 0)
        .select("vec_id", iscale(F.col("embedding")).alias("se"))
        .withColumn("nrm", F.sqrt(idot(F.col("se"), F.col("se")).cast("double")))
    )
    return (
        cand.crossJoin(probe)
        .select(
            "vec_id",
            round_pos(
                idot(F.col("se"), F.col("pse")).cast("double")
                / (F.col("nrm") * F.col("pnrm")),
                4,
            ).alias("cos_r"),
        )
        .orderBy(F.col("cos_r").desc(), "vec_id")
        .limit(5)
    )


@register(
    "sim_centroid",
    group="llm",
    oracle="""
    WITH flat AS (
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS pos,
             unnest(embedding) AS val
      FROM embeddings
    )
    SELECT label, CAST(pos AS INTEGER) AS pos,
           CAST(SUM(CAST(round(val::DOUBLE * 10000000) AS BIGINT)) AS DOUBLE)
             / 10000000.0 / COUNT(*) AS centroid
    FROM flat GROUP BY label, pos
    """,
)
def sim_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, per dimension. Values are integer-scaled (1e7)
    before summing so the aggregation is exact and order-independent —
    the float sum would differ between engines/partitionings."""
    e = table(spark, sf_dir, "embeddings")
    flat = e.select("label", F.posexplode("embedding").alias("pos", "val"))
    return flat.groupBy("label", "pos").agg(
        (
            F.sum(F.round(F.col("val").cast("double") * 10000000).cast("long")).cast("double")
            / 10000000.0
            / F.count(F.lit(1))
        ).alias("centroid")
    )


@register("dedup_near_minhash", group="llm", oracle=None)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection via MinHash-LSH, production shape:
    tokens → binary term vectors (HashingTF) → MinHash signatures
    (spark.ml, seeded) → one bucket per (band, signature) → keep-first per
    bucket. A doc is a near-dup if ANY band puts it in a bucket whose
    keeper has a lower doc_id.

    Deliberately NOT approxSimilarityJoin: on a near-dup-heavy corpus the
    true pair set is O(n²) (this synthetic corpus shares one vocab, so
    almost every pair is similar) — but dedupe only needs the per-doc
    keeper, which is a linear groupBy per band. Hash values are
    Spark-hash-family specific => rows-only; the exact-oracle similarity
    twin is dedup_ngram_jaccard."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer
    from pyspark.ml.functions import vector_to_array

    # spread_scan (r14, probe sighting #15): Tokenizer/HashingTF/MinHash
    # UDFs inherited the one-partition documents scan and ran serial.
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id").select("doc_id", "text")
    toks = Tokenizer(inputCol="text", outputCol="tokens").transform(d)
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 14, binary=True)
    feats = tf.transform(toks).filter(F.expr("size(tokens) > 0"))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=5, seed=42)
    sigs = lsh.fit(feats).transform(feats)
    banded = sigs.select(
        "doc_id", F.posexplode("hashes").alias("band", "sig")
    ).select("doc_id", "band", vector_to_array("sig").getItem(0).cast("long").alias("bucket"))
    w = Window.partitionBy("band", "bucket")
    per_band = banded.withColumn("keeper", F.min("doc_id").over(w))
    return per_band.groupBy("doc_id").agg(
        F.min("keeper").alias("rep_doc_id"),
    ).withColumn("is_dup", F.col("rep_doc_id") < F.col("doc_id"))


@register(
    "multimodal_cols",
    group="llm",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           lang AS meta_lang,
           n_chars AS meta_chars
    FROM documents
    """,
)
def multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed struct metadata round-trip — the
    multimodal column pattern (image/audio bytes with sidecar metadata).
    The binary column is real (utf-8 bytes of text here); metadata travels
    as a struct and is projected back out."""
    d = table(spark, sf_dir, "documents")
    packed = d.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(F.col("lang"), F.col("n_chars")).alias("meta"),
    )
    return packed.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.n_chars").alias("meta_chars"),
    )


_BM25_TERMS = ("spark", "table", "data")
_BM25_ORACLE_BODY = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), pd AS (
      SELECT doc_id, len(toks) AS dl,
             {tf_cols}
      FROM t
    ), st AS (
      SELECT COUNT(*) AS n, SUM(dl) AS sdl,
             {df_cols}
      FROM pd
    )
    SELECT doc_id,
           (round({score}, 4) + 0.0) AS bm25_r
    FROM pd CROSS JOIN st
    ORDER BY {score} DESC, doc_id LIMIT {limit}
    """


def _bm25_oracle(limit: int = 10) -> str:
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}" for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n             ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}" for i in range(len(_BM25_TERMS))
    )
    terms = []
    for i in range(len(_BM25_TERMS)):
        idf = f"((CAST(n AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5) / (CAST(df{i} AS DOUBLE) + 0.5))"
        num = f"(CAST(tf{i} AS DOUBLE) * 2.2)"
        den = f"(CAST(tf{i} AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))"
        terms.append(f"({idf} * ({num} / {den}))")
    score = "(" + " + ".join(terms) + ")"
    return _BM25_ORACLE_BODY.format(tf_cols=tf_cols, df_cols=df_cols, score=score, limit=limit)


@register("text_bm25_topk", group="llm", oracle=_bm25_oracle())
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval for the fixed query terms `_BM25_TERMS`
    ("spark", "table", "data") with the *rational* idf variant:
    idf = (N - df + 0.5)/(df + 0.5) instead of its logarithm — a per-term
    monotone transform chosen because ln() is not required to be correctly
    rounded (libm vs JVM may differ by 1 ulp), while +,*,/ are IEEE-exact,
    so this score is bit-identical across engines with NO rounding
    lottery. k1=1.2, b=0.75.

    Scale shape: tf/dl are per-doc HOF work; (N, Σdl, df_t) come from ONE
    corpus aggregate broadcast as a single row (no driver collect, the
    text_tfidf pattern); scoring is map-side; top-10 compiles to
    TakeOrderedAndProject. The big side is scanned once and never
    shuffled."""
    j, score = _bm25_scored(spark, sf_dir)
    return (
        j.select("doc_id", round_pos(score, 4).alias("bm25_r"), score.alias("_s"))
        .orderBy(F.col("_s").desc(), "doc_id")
        .limit(10)
        .select("doc_id", "bm25_r")
    )


def _bm25_scored(spark: SparkSession, sf_dir: str):
    """Shared BM25 scorer: (docs ⨯ broadcast corpus-stats frame, exact
    score column). Used by text_bm25_topk (declared output) and
    retrieval_hybrid_rerank (candidate generation)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def tf_of(t: str):
        # closure, not a default arg: F.filter inspects lambda arity and a
        # second parameter would be bound as the element *index*
        return F.size(F.filter(toks, lambda x: x == t))

    pd_df = d.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[tf_of(t).alias(f"tf{i}") for i, t in enumerate(_BM25_TERMS)],
    )
    st = pd_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    j = pd_df.crossJoin(F.broadcast(st))
    score = None
    for i in range(len(_BM25_TERMS)):
        idf = (F.col("n").cast("double") - F.col(f"df{i}").cast("double") + F.lit(0.5)) / (
            F.col(f"df{i}").cast("double") + F.lit(0.5)
        )
        num = F.col(f"tf{i}").cast("double") * F.lit(2.2)
        den = F.col(f"tf{i}").cast("double") + F.lit(1.2) * (
            F.lit(0.25)
            + F.lit(0.75) * (F.col("dl").cast("double") / (F.col("sdl").cast("double") / F.col("n").cast("double")))
        )
        term = idf * (num / den)
        score = term if score is None else score + term
    return j, score


def _hybrid_oracle() -> str:
    from ..functions.vector import SQL_IDOT, SQL_INORM2

    cos_e = (
        SQL_IDOT.format(sa="se", sb="pse")
        + f" / (sqrt({SQL_INORM2.format(sa='se')}) * sqrt({SQL_INORM2.format(sa='pse')}))"
    )
    return f"""
    WITH cand AS (
      SELECT * FROM ({_bm25_oracle(limit=20)})
    ), je AS (
      SELECT c.doc_id, c.bm25_r, {SQL_ISCALE.format(a='e.embedding')} AS se
      FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id
    ), pr AS (
      SELECT {SQL_ISCALE.format(a='embedding')} AS pse FROM embeddings WHERE vec_id = 0
    ), sc AS (
      SELECT doc_id, bm25_r, {cos_e} AS cos_e
      FROM je CROSS JOIN pr
    )
    SELECT doc_id, bm25_r, (round(cos_e, 4) + 0.0) AS cos_r,
           CAST(row_number() OVER (ORDER BY cos_e DESC, doc_id) AS INTEGER) AS final_rank
    FROM sc
    """


@register("retrieval_hybrid_rerank", group="llm", oracle=_hybrid_oracle())
def retrieval_hybrid_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval (the RAG-prep shape): lexical BM25 candidate
    generation (top-20, shared scorer with text_bm25_topk) followed by
    dense rerank — candidates joined to their embeddings (vec_id ==
    doc_id in the synthetic corpus) and re-ordered by exact integer
    cosine against the probe vector (vec_id=0, the sim_cosine_topk
    convention). Output carries both scores and the final dense rank.

    Scale shape: stage 1 is the bm25 map-side score + TakeOrdered (the
    corpus is scanned once, never shuffled); stage 2 touches only the
    k=20 candidate rows — the embeddings side is joined AFTER the
    top-k cut, so the dense kernel runs 20 times, not |corpus| times,
    and the final window orders 20 rows (bounded by construction).
    Exact doubles order the rank identically in both engines."""
    from ..functions.vector import idot, iscale

    j, score = _bm25_scored(spark, sf_dir)
    cand = (
        j.select("doc_id", round_pos(score, 4).alias("bm25_r"), score.alias("_s"))
        .orderBy(F.col("_s").desc(), "doc_id")
        .limit(20)
        .select("doc_id", "bm25_r")
    )
    e = table(spark, sf_dir, "embeddings")
    probe = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(iscale(F.col("embedding")).alias("pse"))
    )
    je = cand.join(e, cand["doc_id"] == e["vec_id"]).select(
        "doc_id", "bm25_r", iscale(F.col("embedding")).alias("se")
    )
    cos_e = idot(F.col("se"), F.col("pse")).cast("double") / (
        F.sqrt(idot(F.col("se"), F.col("se")).cast("double"))
        * F.sqrt(idot(F.col("pse"), F.col("pse")).cast("double"))
    )
    w = Window.orderBy(F.col("cos_e").desc(), "doc_id")
    return (
        je.crossJoin(probe)
        .select("doc_id", "bm25_r", cos_e.alias("cos_e"))
        .withColumn("final_rank", F.row_number().over(w))
        .select(
            "doc_id",
            "bm25_r",
            round_pos(F.col("cos_e"), 4).alias("cos_r"),
            "final_rank",
        )
    )


_CHUNK_HEX = 128  # 64 payload bytes = 128 hex chars


@register(
    "multimodal_payload_chunks",
    group="llm",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, hex(encode(text)) AS hx FROM documents
    ), s AS (
      SELECT doc_id, md5(substr(hx, (i - 1) * {_CHUNK_HEX} + 1, {_CHUNK_HEX})) AS h
      FROM t, UNNEST(generate_series(1, (length(hx) + {_CHUNK_HEX - 1}) // {_CHUNK_HEX}))
           AS u(i)
    ), p AS (
      SELECT doc_id, h, COUNT(*) AS k FROM s GROUP BY doc_id, h
    ), w AS (
      SELECT doc_id, k, SUM(k) OVER (PARTITION BY h) AS tot FROM p
    )
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_chunks,
           CAST(COALESCE(SUM(CASE WHEN tot > 1 THEN k END), 0) AS BIGINT) AS dup_chunks,
           CAST((COALESCE(SUM(CASE WHEN tot > 1 THEN k END), 0) * 10000)
                // SUM(k) AS BIGINT) AS dup_frac_bp
    FROM w GROUP BY doc_id
    """,
)
def multimodal_payload_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size (64-byte) chunk-level dedup profile over the OPAQUE
    binary payload — the storage/transfer dedup shape for media blobs
    (backup systems, CAS stores): per document, how much of its byte
    content recurs anywhere in the corpus, WITHOUT decoding the
    modality (contrast the token-level [[dedup_span_ngram]]: this works
    on any bytes, not just text). Chunk hashing is map-side (payload →
    hex → fixed-stride substrings → md5; only (doc_id, 16-byte hash)
    pairs leave the scan), corpus frequency is a window over the hash
    key, and the per-doc profile re-aggregates — the span-profile plan
    shape on the binary column. Production CDC chunking would replace
    the fixed stride with a rolling-hash boundary (content-defined
    chunks survive insertions); the fixed stride keeps the oracle exact
    and the plan identical."""
    d = table(spark, sf_dir, "documents")
    chunks = d.select(
        "doc_id", F.hex(F.col("text").cast("binary")).alias("hx")
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, (length(hx) + {_CHUNK_HEX - 1}) div {_CHUNK_HEX}),"
                f" i -> md5(cast(substring(hx, (i - 1) * {_CHUNK_HEX} + 1, {_CHUNK_HEX}) as binary)))"
            )
        ).alias("h"),
    )
    p = chunks.groupBy("doc_id", "h").agg(F.count(F.lit(1)).alias("k"))
    tot = F.sum("k").over(Window.partitionBy("h"))
    dup = F.sum(F.when(F.col("tot") > 1, F.col("k")).otherwise(F.lit(0)))
    return (
        p.withColumn("tot", tot)
        .groupBy("doc_id")
        .agg(F.sum("k").alias("n_chunks"), dup.alias("dup_chunks"))
        .withColumn("dup_frac_bp", F.expr("dup_chunks * 10000 div n_chunks"))
    )


# --- content-defined chunking (r15) ------------------------------------------

_CDC_W = 8  # rolling window (chars)
_CDC_B = 257  # polynomial base
_CDC_M = 1_000_003  # prime modulus; Horner keeps every term < M*B ~ 2.6e8
_CDC_D = 64  # boundary divisor -> expected chunk ~64 chars


def _cdc_horner() -> str:
    """Unrolled Horner window hash at position i over column t — pure
    function of the {w} chars starting at i, so 'rolling' needs NO
    sequential state and the whole boundary decision is one map-side
    expression. ascii/substr/% behave identically in Spark SQL and
    DuckDB, so BOTH engines evaluate this same generated string."""
    e = f"ascii(substr(t, i, 1)) % {_CDC_M}"
    for j in range(1, _CDC_W):
        e = f"(({e}) * {_CDC_B} + ascii(substr(t, i + {j}, 1))) % {_CDC_M}"
    return e


_cdc_horner.__doc__ = _cdc_horner.__doc__.format(w=_CDC_W)

# Cut points: window end i+W-1 wherever the window hash % D == 0, plus the
# doc end; chunks are the spans between consecutive cuts, hashed IN the
# transform so only (doc_id, md5) pairs ever leave the scan.
_CDC_CUTS_SPARK = f"""
    array_sort(array_distinct(concat(
      filter(transform(sequence(1, greatest(length(t) - {_CDC_W - 1}, 1)),
        i -> CASE WHEN i <= length(t) - {_CDC_W - 1}
                   AND ({_cdc_horner()}) % {_CDC_D} = 0
              THEN i + {_CDC_W - 1} END),
        x -> x IS NOT NULL),
      array(length(t)))))"""

_CDC_CHUNKS_SPARK = f"""
    transform(sequence(1, size(cuts)), k ->
      md5(cast(substr(t,
        CASE WHEN k = 1 THEN 1 ELSE element_at(cuts, k - 1) + 1 END,
        element_at(cuts, k)
          - CASE WHEN k = 1 THEN 0 ELSE element_at(cuts, k - 1) END) as binary)))"""

_CDC_ORACLE = f"""
    WITH t0 AS (
      SELECT doc_id, text AS t FROM documents
    ), c AS (
      SELECT doc_id, t,
             list_sort(list_distinct(list_concat(
               list_filter(list_transform(
                 generate_series(1, greatest(length(t) - {_CDC_W - 1}, 1)),
                 i -> CASE WHEN i <= length(t) - {_CDC_W - 1}
                            AND ({_cdc_horner()}) % {_CDC_D} = 0
                       THEN i + {_CDC_W - 1} END),
                 x -> x IS NOT NULL),
               [length(t)]))) AS cuts
      FROM t0
    ), s AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(cuts)), k ->
               md5(substr(t,
                 CASE WHEN k = 1 THEN 1 ELSE cuts[k - 1] + 1 END,
                 cuts[k] - CASE WHEN k = 1 THEN 0 ELSE cuts[k - 1] END)))) AS h
      FROM c
    ), p AS (
      SELECT doc_id, h, COUNT(*) AS k FROM s GROUP BY doc_id, h
    ), w AS (
      SELECT doc_id, k, SUM(k) OVER (PARTITION BY h) AS tot FROM p
    )
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_chunks,
           CAST(COALESCE(SUM(CASE WHEN tot > 1 THEN k END), 0) AS BIGINT) AS dup_chunks,
           CAST((COALESCE(SUM(CASE WHEN tot > 1 THEN k END), 0) * 10000)
                // SUM(k) AS BIGINT) AS dup_frac_bp
    FROM w GROUP BY doc_id
    """


@register("dedup_cdc_chunks", group="llm", oracle=_CDC_ORACLE)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED chunk dedup profile (r15) — the rolling-hash
    upgrade [[multimodal_payload_chunks]]'s docstring defers: chunk
    boundaries fall where the {w}-char polynomial window hash is
    divisible by {d} (plus the doc end), so an insertion near the head
    shifts only the chunks it touches and boundaries RESYNC {w} chars
    later — fixed-stride chunking loses every boundary after the edit
    (the rsync/LBFS property, unit-pinned against the fixed-stride op
    on an insertion fixture). Expected chunk length ~{d} chars.

    The trick that keeps this declarative AND oracle-exact: the window
    hash at position i is a pure function of the {w} chars starting at
    i (an unrolled Horner mod-{m} expression both engines evaluate from
    the SAME generated string), so "rolling" needs no sequential scan —
    boundary detection is one map-side transform, chunk md5s are
    computed inside the same projection, and only (doc_id, 16-byte
    hash) pairs leave the scan. The rollup is the span-profile shape:
    (doc_id, h) partial agg, corpus frequency as a window over the hash
    key, per-doc re-aggregate. Zero joins, no pair expansion; O(n·{w})
    map work per doc."""
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id")
    chunks = (
        d.select("doc_id", F.col("text").alias("t"))
        .withColumn("cuts", F.expr(_CDC_CUTS_SPARK))
        .select("doc_id", F.explode(F.expr(_CDC_CHUNKS_SPARK)).alias("h"))
    )
    p = chunks.groupBy("doc_id", "h").agg(F.count(F.lit(1)).alias("k"))
    tot = F.sum("k").over(Window.partitionBy("h"))
    dup = F.sum(F.when(F.col("tot") > 1, F.col("k")).otherwise(F.lit(0)))
    return (
        p.withColumn("tot", tot)
        .groupBy("doc_id")
        .agg(F.sum("k").alias("n_chunks"), dup.alias("dup_chunks"))
        .withColumn("dup_frac_bp", F.expr("dup_chunks * 10000 div n_chunks"))
    )


dedup_cdc_chunks.__doc__ = dedup_cdc_chunks.__doc__.format(
    w=_CDC_W, d=_CDC_D, m=_CDC_M
)


# --- cross-document copy detection over CDC chunks (r15) ----------------------

_XDOC_T = 16  # chunk hashes in more docs than this are boilerplate, not copies
_XDOC_MIN_BP = 2500  # emit pairs sharing >= 25% of the smaller doc's chunks

# The distinct (doc_id, chunk-md5) set — the same cut/chunk expressions
# dedup_cdc_chunks evaluates, deduped per doc so a chunk repeated WITHIN a
# doc can't inflate a cross-doc containment score.
_XDOC_CHUNKSET_SQL = f"""
    WITH t0 AS (SELECT doc_id, text AS t FROM documents),
    c AS (
      SELECT doc_id, t,
             list_sort(list_distinct(list_concat(
               list_filter(list_transform(
                 generate_series(1, greatest(length(t) - {_CDC_W - 1}, 1)),
                 i -> CASE WHEN i <= length(t) - {_CDC_W - 1}
                            AND ({_cdc_horner()}) % {_CDC_D} = 0
                       THEN i + {_CDC_W - 1} END),
                 x -> x IS NOT NULL),
               [length(t)]))) AS cuts
      FROM t0
    ), s AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(cuts)), k ->
               md5(substr(t,
                 CASE WHEN k = 1 THEN 1 ELSE cuts[k - 1] + 1 END,
                 cuts[k] - CASE WHEN k = 1 THEN 0 ELSE cuts[k - 1] END)))) AS h
      FROM c
    )
    SELECT DISTINCT doc_id, h FROM s
    """

_XDOC_ORACLE = f"""
    WITH ch AS ({_XDOC_CHUNKSET_SQL}),
    nc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM ch GROUP BY 1),
    hf AS (SELECT h, COUNT(*) AS cnt FROM ch GROUP BY 1),
    sh AS (SELECT h FROM hf WHERE cnt BETWEEN 2 AND {_XDOC_T}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS shared_chunks
      FROM ch a JOIN sh USING (h) JOIN ch b USING (h)
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, shared_chunks,
           na.n AS n_chunks_a, nb.n AS n_chunks_b,
           CAST(shared_chunks * 10000 // LEAST(na.n, nb.n) AS BIGINT)
             AS containment_bp
    FROM pairs
    JOIN nc na ON na.doc_id = doc_a
    JOIN nc nb ON nb.doc_id = doc_b
    WHERE shared_chunks * 10000 // LEAST(na.n, nb.n) >= {_XDOC_MIN_BP}
    """


@register("dedup_cdc_cross_doc", group="llm", oracle=_XDOC_ORACLE)
def dedup_cdc_cross_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-DOCUMENT copy detection over content-defined chunks (r15) —
    the pair-level consumer [[dedup_cdc_chunks]]'s per-doc profile sets
    up: two documents sharing >= {bp}bp of the smaller one's distinct
    chunk set are a copy/containment pair (one quotes, mirrors, or
    extends the other), even when the shared text sits at DIFFERENT
    offsets — the insertion-robust boundary resync is exactly what makes
    offset-independent chunk equality meaningful (a fixed-stride grid
    would miss every shifted copy). The char-level, order-free
    complement of [[dedup_line_cross_doc]]'s token-segment boilerplate
    profile and [[dedup_span_containment]]'s ordered-shingle spans.

    Pair-explosion bound (the line-dedup discipline): a chunk hash in
    more than {t} documents is corpus BOILERPLATE, not a copy signal —
    it is excluded from pair generation, so the equi self-join on the
    chunk key emits at most {t}^2/2 pairs per hash, never quadratic in
    corpus size. The chunk set is computed once and lineage-truncated
    (localCheckpoint) so profile counts and both join sides read one
    materialization; only (doc_id, 16-byte md5) rows ever shuffle.
    Emitted pairs are >= {bp}bp containment = shared*10000 div
    min(|chunks_a|, |chunks_b|) — exact integer arithmetic, exact
    oracle."""
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id")
    ch = (
        d.select("doc_id", F.col("text").alias("t"))
        .withColumn("cuts", F.expr(_CDC_CUTS_SPARK))
        .select("doc_id", F.explode(F.expr(_CDC_CHUNKS_SPARK)).alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nc = ch.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    sh = (
        ch.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter((F.col("cnt") >= 2) & (F.col("cnt") <= _XDOC_T))
        .select("h")
    )
    a = ch.join(sh, "h").select(F.col("doc_id").alias("doc_a"), "h")
    b = ch.select(F.col("doc_id").alias("doc_b"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_chunks"))
    )
    cont = F.expr("shared_chunks * 10000 div least(n_chunks_a, n_chunks_b)")
    return (
        pairs.join(nc.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_chunks_a")), "doc_a")
        .join(nc.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_chunks_b")), "doc_b")
        .withColumn("containment_bp", cont.cast("long"))
        .filter(F.col("containment_bp") >= _XDOC_MIN_BP)
        .select(
            "doc_a", "doc_b", "shared_chunks", "n_chunks_a", "n_chunks_b",
            "containment_bp",
        )
    )


dedup_cdc_cross_doc.__doc__ = dedup_cdc_cross_doc.__doc__.format(
    t=_XDOC_T, bp=_XDOC_MIN_BP
)


@register(
    "multimodal_dedup_exact",
    group="llm",
    oracle="""
    WITH t AS (
      -- DuckDB md5 takes VARCHAR (hashes its UTF-8 bytes) = Spark's
      -- md5(cast(text as binary)); octet_length gives the byte count
      SELECT doc_id, source, md5(text) AS h,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ), g AS (
      SELECT h,
             MIN(doc_id) AS keeper_id,
             CAST(COUNT(*) AS BIGINT) AS n_copies,
             MIN(n_bytes) AS n_bytes,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      FROM t GROUP BY h
    )
    SELECT keeper_id, n_copies, n_bytes, n_sources,
           CAST((n_copies - 1) * n_bytes AS BIGINT) AS reclaimable_bytes
    FROM g
    """,
)
def multimodal_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content-addressed dedup over the OPAQUE binary payload —
    the CAS-store ingest shape (object storage, backup, media lake):
    md5 the raw bytes map-side, keep the lowest doc_id per digest, and
    report copy count, per-copy size, how many SOURCES the same bytes
    arrived from (cross-source exact dup = mirror/repost detection),
    and the bytes a dedupe store reclaims. The byte-level exact
    complement of [[multimodal_payload_chunks]]' chunk-level profile
    and [[dedup_exact_hash]]'s text twin — works on any modality, no
    decode.

    ONE partial-agg shuffle of (16-byte digest) keys — payloads never
    leave the scan; at 100 TB this is exactly how a blob-ingest dedupe
    tier runs (hash at the edge, shuffle digests, keep winners)."""
    t = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(F.col("text").cast("binary")).alias("h"),
        F.length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
    )
    g = t.groupBy("h").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
        F.min("n_bytes").alias("n_bytes"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    return g.select(
        "keeper_id",
        "n_copies",
        "n_bytes",
        "n_sources",
        ((F.col("n_copies") - 1) * F.col("n_bytes")).cast("long").alias(
            "reclaimable_bytes"
        ),
    )


# --- perceptual-hash near-dup over the opaque payload (r15) -------------------

_AH_BITS = 55  # byte-block brightness bits (55 = 5 bands x 11 bits)
_AH_BANDS = 5
_AH_BAND_BITS = 11
_AH_MAXHAM = 4  # <= bands - 1, so pigeonhole guarantees a clean band
_AH_VARIANT_OFFSET = 10_000_000
_AH_VARIANT_MOD = 17  # doc_id % 17 == 3 gets a corrupted re-encode variant


def _ah_assets_sql(fdiv: str) -> str:
    """Asset stream: every payload plus, for a deterministic doc subset,
    a single-byte-corrupted variant (the 're-encode artifact' fixture —
    same trick as text_pii_scrub's derived PII: planted, so the pair
    output is non-degenerate and recall is testable)."""
    mid = f"(length(text) {fdiv} 2)"
    # src_doc/is_var ride the union EXPLICITLY (ADVICE r15): inferring
    # "planted" from asset_b = asset_a + offset would mislabel any real doc
    # pair whose ids happen to differ by exactly the offset, and a corpus
    # with doc_id >= offset would collide ids. The offset now only
    # manufactures a unique asset_id for the fixture rows.
    return f"""
      SELECT doc_id AS asset_id, doc_id AS src_doc, 0 AS is_var, text AS t
      FROM documents WHERE length(text) >= {_AH_BITS}
      UNION ALL
      SELECT doc_id + {_AH_VARIANT_OFFSET} AS asset_id,
             doc_id AS src_doc, 1 AS is_var,
             concat(substr(text, 1, {mid}), '~',
                    substr(text, {mid} + 2, length(text))) AS t
      FROM documents
      WHERE length(text) >= {_AH_BITS} AND doc_id % {_AH_VARIANT_MOD} = 3"""


def _ah_hash_spark() -> str:
    # Block sums slice a precomputed per-char code ARRAY (`ints`), never
    # substr(t, i, 1) per position: UTF8String.substring is O(i), which
    # turns a per-char scan into O(n^2) per document — 120 s at sf0.1
    # before this; O(n) slices take it to ~2 s.
    lo = "cast((j - 1) * n div {b} as int)"
    hi = "cast(j * n div {b} as int)"
    bsum = f"aggregate(slice(ints, {lo} + 1, {hi} - {lo}), 0L, (a, x) -> a + x)"
    return (
        "aggregate(sequence(1, {b}), 0L, (acc, j) -> acc + "
        f"CASE WHEN ({bsum}) * n > s * ({hi} - {lo})"
        " THEN shiftleft(1L, j - 1) ELSE 0L END)"
    ).format(b=_AH_BITS)


def _ah_hash_duck() -> str:
    lo = "(j - 1) * n // {b}"
    hi = "j * n // {b}"
    bsum = f"list_sum(list_transform(generate_series({lo} + 1, {hi}), i -> ascii(substr(t, i, 1))))"
    return (
        "list_sum(list_transform(generate_series(1, {b}), j -> "
        f"CASE WHEN ({bsum}) * n > s * ({hi} - {lo})"
        " THEN CAST(1 AS BIGINT) << (j - 1) ELSE CAST(0 AS BIGINT) END))"
    ).format(b=_AH_BITS)


_AH_ORACLE = f"""
    WITH assets AS ({_ah_assets_sql("//")}),
    m AS (
      SELECT asset_id, src_doc, is_var, t, length(t) AS n,
             list_sum(list_transform(generate_series(1, length(t)),
                                     i -> ascii(substr(t, i, 1)))) AS s
      FROM assets
    ), h AS (
      SELECT asset_id, src_doc, is_var,
             CAST({_ah_hash_duck()} AS BIGINT) AS ahash FROM m
    ), bands AS (
      SELECT asset_id, src_doc, is_var, ahash, b.band,
             (ahash // (CAST(1 AS BIGINT) << (b.band * {_AH_BAND_BITS})))
               % {1 << _AH_BAND_BITS} AS bandval
      FROM h, (SELECT unnest(generate_series(0, {_AH_BANDS - 1})) AS band) b
    ), cand AS (
      SELECT DISTINCT a.asset_id AS asset_a, a.ahash AS ha,
                      a.src_doc AS sa, a.is_var AS va,
                      c.asset_id AS asset_b, c.ahash AS hb,
                      c.src_doc AS sb, c.is_var AS vb
      FROM bands a JOIN bands c USING (band, bandval)
      WHERE a.asset_id < c.asset_id
    )
    SELECT asset_a, asset_b,
           CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming,
           CAST(CASE WHEN sa = sb AND va <> vb
                THEN 1 ELSE 0 END AS BIGINT) AS is_planted_variant
    FROM cand WHERE bit_count(xor(ha, hb)) <= {_AH_MAXHAM}
    """


@register("multimodal_ahash_neardup", group="llm", oracle=_AH_ORACLE)
def multimodal_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL-hash near-dup over the opaque binary payload — the
    aHash family (average-hash: {b} byte-block "brightness" bits, bit k
    = block-k mean above the whole-payload mean) applied to the
    multimodal asset column: catches re-encodes and single-sample
    corruptions that break [[multimodal_dedup_exact]]'s byte-exact CAS
    digest, with NO decode (block statistics over raw bytes — works on
    any modality, the deliberately decode-free complement of the
    env-gated [[multimodal_decode_stub]] kernel). The brightness bit is
    a cross-multiplied integer compare (bsum·n > s·blen — no division),
    so the whole signature is exact in both engines.

    Candidate generation is banded LSH over the signature: {bands}
    bands x {bb} bits; by pigeonhole any pair within the declared
    hamming radius {mh} shares at least one clean band, so recall at
    the threshold is EXACT (the [[dedup_simhash]] discipline on bytes
    instead of tokens), and verification is one bit_count(xor) per
    candidate. A deterministic subset of assets gets a planted
    single-byte-corrupted variant (the derived-fixture trick), so the
    pair output is non-degenerate and the tests pin 100% recall of the
    planted re-encodes. At larger corpora the band width grows with
    log n (the [[dedup_lsh_tuning_curve]] trade), keeping per-bucket
    candidates bounded; signatures are map-side HOF work and only
    (asset_id, 8-byte hash) rows shuffle."""
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "text"
    )
    # Explicit provenance columns (ADVICE r15): src_doc + is_var label the
    # planted fixture rows; the +offset only manufactures a unique asset_id.
    orig = d.filter(F.length("text") >= _AH_BITS).selectExpr(
        "doc_id AS asset_id", "doc_id AS src_doc", "0 AS is_var", "text AS t"
    )
    mid = "(length(text) div 2)"
    var = (
        d.filter(
            (F.length("text") >= _AH_BITS)
            & (F.col("doc_id") % _AH_VARIANT_MOD == 3)
        ).selectExpr(
            f"doc_id + {_AH_VARIANT_OFFSET} AS asset_id",
            "doc_id AS src_doc",
            "1 AS is_var",
            f"concat(substr(text, 1, {mid}), '~',"
            f" substr(text, {mid} + 2, length(text))) AS t",
        )
    )
    m = (
        orig.unionAll(var)
        .selectExpr(
            "asset_id",
            "src_doc",
            "is_var",
            "length(t) AS n",
            "transform(split(t, ''), c -> cast(ascii(c) as bigint)) AS ints",
        )
        .selectExpr(
            "asset_id",
            "src_doc",
            "is_var",
            "n",
            "ints",
            "aggregate(ints, 0L, (a, x) -> a + x) AS s",
        )
    )
    # the signature table is (asset_id, int64) — materialize it ONCE so the
    # band self-join's two sides don't each recompute the per-char scan
    h = m.selectExpr(
        "asset_id", "src_doc", "is_var",
        f"CAST({_ah_hash_spark()} AS BIGINT) AS ahash",
    ).localCheckpoint(eager=False)
    bands = h.select(
        "asset_id",
        "src_doc",
        "is_var",
        "ahash",
        F.explode(F.array(*[F.lit(b) for b in range(_AH_BANDS)])).alias("band"),
    ).selectExpr(
        "asset_id",
        "src_doc",
        "is_var",
        "ahash",
        "band",
        f"(ahash div shiftleft(1L, band * {_AH_BAND_BITS}))"
        f" % {1 << _AH_BAND_BITS} AS bandval",
    )
    a = bands.select(
        F.col("band"), F.col("bandval"),
        F.col("asset_id").alias("asset_a"), F.col("ahash").alias("ha"),
        F.col("src_doc").alias("sa"), F.col("is_var").alias("va"),
    )
    c = bands.select(
        F.col("band"), F.col("bandval"),
        F.col("asset_id").alias("asset_b"), F.col("ahash").alias("hb"),
        F.col("src_doc").alias("sb"), F.col("is_var").alias("vb"),
    )
    cand = (
        a.join(c, ["band", "bandval"])
        .filter(F.col("asset_a") < F.col("asset_b"))
        .select("asset_a", "ha", "sa", "va", "asset_b", "hb", "sb", "vb")
        .distinct()
    )
    return cand.selectExpr(
        "asset_a",
        "asset_b",
        "CAST(bit_count(ha ^ hb) AS BIGINT) AS hamming",
        "CAST(CASE WHEN sa = sb AND va <> vb"
        " THEN 1 ELSE 0 END AS BIGINT) AS is_planted_variant",
    ).filter(F.col("hamming") <= _AH_MAXHAM)


multimodal_ahash_neardup.__doc__ = multimodal_ahash_neardup.__doc__.format(
    b=_AH_BITS, bands=_AH_BANDS, bb=_AH_BAND_BITS, mh=_AH_MAXHAM
)
