"""Multimodal decode plumbing + chunking/packing/sampling (split from llm_ext.py r17)."""

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
from .ann_vec import _SQL_IL2
from .text_stats import _rep_metrics




# Per-stratum sampling rates (percent kept): downsample the dominant
# language, keep more of the tail — the usual pretraining-mix move.
_SAMPLE_RATES = {"en": 20, "de": 60, "es": 60, "fr": 60, "zh": 60}


_SAMPLE_DEFAULT = 40




@register(
    "sample_stratified",
    group="llm-ext",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang, source, n_chars,
             ({SQL_TOKEN_HASH.format(t='md5(text)')}) % 100 AS hb,
             CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 60 WHEN 'es' THEN 60
                       WHEN 'fr' THEN 60 WHEN 'zh' THEN 60 ELSE 40 END AS rate
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars, CAST(hb AS BIGINT) AS hash_bucket
    FROM h WHERE hb < rate
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by language: keep a document iff
    a content-derived hash bucket (portable token_hash of md5(text), mod
    100) falls under its stratum's rate. Unlike df.sampleBy, the decision
    is a pure function of the row — reruns, retries, and different
    partitionings all pick the SAME sample (what a reproducible
    training-data pipeline needs), and the twin SQL proves it
    cross-engine. Map-side filter, zero shuffle at any scale."""
    d = table(spark, sf_dir, "documents")
    hb = token_hash(F.md5(F.col("text").cast("binary"))) % 100
    rate = F.lit(_SAMPLE_DEFAULT)
    for lang, r in _SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, r).otherwise(rate)
    return (
        d.select("doc_id", "lang", "source", "n_chars", hb.alias("hash_bucket"))
        .filter(F.col("hash_bucket") < rate)
    )




_PIPE_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, text, lang, source, n_chars, string_split(text, ' ') AS toks
      FROM documents
    ), q AS (
      SELECT doc_id, text, lang, source, n_chars FROM t
      WHERE len(list_distinct(toks)) * 100 >= 45 * len(toks)
        AND list_max(list_transform(list_distinct(toks),
              tk -> len(list_filter(toks, x -> x = tk)))) * 100 <= 12 * len(toks)
        AND (len(toks) < 2 OR
             (len(toks) - 1 - len(list_distinct(list_transform(
                generate_series(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i + 1])))) * 100 <= 5 * (len(toks) - 1))
    ), d AS (
      SELECT doc_id, text, lang, source, n_chars,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM q
    )
    SELECT doc_id, lang, source, n_chars FROM d
    WHERE rn = 1
      AND ({SQL_TOKEN_HASH.format(t='md5(text)')}) % 100 <
          CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 60 WHEN 'es' THEN 60
                    WHEN 'fr' THEN 60 WHEN 'zh' THEN 60 ELSE 40 END
    """




@register("pipeline_pretrain_docs", group="llm-ext", oracle=_PIPE_ORACLE)
def pipeline_pretrain_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining-data pipeline: repetition-quality filter →
    exact-dedup keeper → deterministic stratified sample, in one plan —
    the end-to-end flow the individual operators (text_repetition,
    dedup_exact_hash, sample_stratified) exist for.

    Stage order is the scale order: the map-side quality filter runs
    before the only shuffle (row_number over md5(text) — dedupe keeper
    selection on the 128-bit digest, never the document bytes), and the
    sample is another map-side filter, so rejected documents never pay
    shuffle I/O. One Exchange total, end to end."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    *_, keep = _rep_metrics(toks)
    q = d.filter(keep)
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    dd = q.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    hb = token_hash(F.md5(F.col("text").cast("binary"))) % 100
    rate = F.lit(_SAMPLE_DEFAULT)
    for lang, r in _SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, r).otherwise(rate)
    return dd.filter(hb < rate).select("doc_id", "lang", "source", "n_chars")




# ---------------------------------------------------------------------------
# multimodal decode plumbing


_DECODE_SCHEMA = "doc_id long, n_bytes int, width int, height int, n_frames int"




def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for image/video decode (the real decoder —
    PIL/av — is not in this container; see decode_real below). Operates on
    Arrow record batches exactly as a real decoder would: bytes in,
    numeric features out."""
    for pdf in batches:
        n = pdf["payload"].map(len).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n,
                "width": (n % 640).astype("int32"),
                "height": ((n * 7) % 480).astype("int32"),
                "n_frames": (n % 30 + 1).astype("int32"),
            }
        )




def decode_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
    """Real decode path: swap for _fake_decode when PIL/av are installed."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image/video decode libraries are not available in this environment; "
            "use the deterministic _fake_decode stub (same Spark plumbing)"
        ) from e
    raise NotImplementedError("wire PIL decode here")




@register(
    "multimodal_decode_stub",
    group="llm-ext",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
           CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
           CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS n_frames
    FROM documents
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode / feature-extract plumbing via mapInPandas: Arrow
    batches of (doc_id, payload bytes) → decoded metadata. The decode body
    is a deterministic fake (real libs absent here — decode_real raises
    NotImplementedError); the Spark side — binary column, Arrow batch
    shape, schema, partition-parallel map — is real and oracle-checked."""
    # spread_scan (r14, probe sighting #16): the Arrow decode batches
    # inherited the one-partition scan — the exact shape a real image
    # decoder would serialize on.
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id")
    packed = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    decoded = packed.mapInPandas(_fake_decode, schema=_DECODE_SCHEMA)
    return decoded.select(
        "doc_id",
        F.col("n_bytes").cast("int").alias("n_bytes"),
        "width",
        "height",
        "n_frames",
    )




_FRAME_SCHEMA = "doc_id long, frame_idx int, frame_feature int"




def _fake_frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for video frame sampling: n_frames derives
    from the payload length (same convention as _fake_decode), stride
    picks <=4 evenly spaced frames, and the per-frame feature is the
    payload byte at (idx*7 mod n). 1 input row -> N output rows — the
    row-expanding Arrow shape a real frame sampler has."""
    for pdf in batches:
        doc_ids: list[int] = []
        idxs: list[int] = []
        feats: list[int] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            if n == 0:  # empty payload: no frames (and no `% n` div-by-zero)
                continue
            # The SQL twin indexes CHARACTERS (substr/ascii) while this
            # indexes BYTES; they agree only on ASCII payloads. Make that
            # contract explicit instead of depending silently on corpus
            # content (ADVICE r3).
            if max(payload) > 0x7F:
                raise ValueError(
                    f"doc {doc_id}: non-ASCII payload; byte-indexed fake "
                    "sampler would diverge from the char-indexed SQL twin"
                )
            nf = n % 30 + 1
            stride = max(1, nf // 4)
            for k in range(4):
                idx = k * stride
                if idx < nf:
                    doc_ids.append(doc_id)
                    idxs.append(idx)
                    feats.append(payload[(idx * 7) % n])
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_feature": pd.Series(feats, dtype="int32"),
            }
        )




@register(
    "multimodal_frame_sample",
    group="llm-ext",
    oracle="""
    WITH b AS (
      SELECT doc_id, text,
             octet_length(encode(text)) AS n,
             octet_length(encode(text)) % 30 + 1 AS nf
      FROM documents
    ), f AS (
      SELECT doc_id, text, n, nf, greatest(1, nf // 4) AS stride FROM b
    )
    SELECT doc_id,
           CAST(k * stride AS INTEGER) AS frame_idx,
           CAST(ascii(substr(text, ((k * stride * 7) % n) + 1, 1)) AS INTEGER) AS frame_feature
    FROM f, (SELECT unnest([0, 1, 2, 3]) AS k) ks
    WHERE k * stride < nf AND n > 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary video-ish payloads via mapInPandas —
    the 1->N row-EXPANDING Arrow shape (multimodal_decode_stub is 1->1):
    each payload yields <=4 evenly strided frame rows with a byte-derived
    feature. The sampler body is a deterministic fake (real av/PIL absent
    here) but the plumbing — binary column in, Arrow batches, exploded
    schema out, partition-parallel — is real, and because the fake is
    pure arithmetic on (ASCII) payload bytes the whole thing still gets
    an EXACT SQL oracle. At scale: map-side only, output rows bounded at
    4x input, no shuffle."""
    d = table(spark, sf_dir, "documents")
    packed = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return packed.mapInPandas(_fake_frame_sample, schema=_FRAME_SCHEMA)




_TS_WIN = 8




_TS_SUBSEQ_ORACLE = f"""
    WITH s AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), w AS (
      SELECT user_id, ts_us,
             list(cents) OVER (PARTITION BY user_id ORDER BY ts_us
                               ROWS BETWEEN CURRENT ROW AND {_TS_WIN - 1} FOLLOWING) AS win
      FROM s
    ), full_w AS (
      SELECT user_id, ts_us, win FROM w WHERE len(win) = {_TS_WIN}
    ), probe AS (
      SELECT win AS pwin, ts_us AS pts FROM full_w WHERE user_id = 0
      ORDER BY ts_us LIMIT 1
    )
    SELECT f.user_id, f.ts_us AS start_us,
           CAST({_SQL_IL2.format(sa='f.win', sb='p.pwin')} AS BIGINT) AS d2
    FROM full_w f CROSS JOIN probe p
    WHERE NOT (f.user_id = 0 AND f.ts_us = p.pts)
    ORDER BY d2 ASC, f.user_id ASC, f.ts_us ASC LIMIT 5
    """




@register("ts_subseq_search", group="llm-ext", oracle=_TS_SUBSEQ_ORACLE)
def ts_subseq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series subsequence similarity search (the streaming-similarity
    family of PAPERS.md's EDBT 2019 entry, batch twin): every length-8
    window of every user's chronological `value` series, scored by exact
    integer L2² against a probe window (user 0's earliest), top-5.

    Scale shape: windows materialize map-side from ONE shuffle (the same
    user_id/ts sort a sessionization needs) via collect_list over a
    ROWS-frame — no self-join, no row explosion beyond the window width;
    the probe is a broadcast single row; scoring + top-5 is map-side into
    TakeOrderedAndProject. (user_id, ts) is unique in this corpus, so
    frame order — and therefore every window array — is deterministic in
    both engines; values go through integer cents."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(Window.currentRow, _TS_WIN - 1)
    )
    wins = ev.select(
        "user_id", "ts_us", F.collect_list("cents").over(w).alias("win")
    ).filter(F.size("win") == _TS_WIN)
    probe = F.broadcast(
        wins.filter(F.col("user_id") == 0)
        .orderBy("ts_us")
        .limit(1)
        .select(F.col("win").alias("pwin"), F.col("ts_us").alias("pts"))
    )
    scored = wins.crossJoin(probe).filter(
        ~((F.col("user_id") == 0) & (F.col("ts_us") == F.col("pts")))
    )
    return (
        scored.select(
            "user_id",
            F.col("ts_us").alias("start_us"),
            il2(F.col("win"), F.col("pwin")).alias("d2"),
        )
        .orderBy("d2", "user_id", "start_us")
        .limit(5)
    )




@register(
    "agg_mode_group",
    group="llm-ext",
    oracle="""
    WITH counts AS (
      SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source
    ), ranked AS (
      SELECT lang, source, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, source ASC) AS rn
      FROM counts
    )
    SELECT lang, source AS mode_source, n AS n_docs FROM ranked WHERE rn = 1
    """,
)
def agg_mode_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a deterministic tie-break: the most frequent
    source per language (ties -> lexicographically smallest source). Two
    partial-aggregating shuffles — (lang, source) counts then a min(struct)
    argmax per lang; no window over the full data, no sort."""
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    best = (
        counts.groupBy("lang")
        .agg(F.min(F.struct((-F.col("n")).alias("neg_n"), F.col("source").alias("src"))).alias("m"))
    )
    return best.select(
        "lang", F.col("m.src").alias("mode_source"), (-F.col("m.neg_n")).alias("n_docs")
    )




# --- context-window chunking ------------------------------------------------

_CHUNK = 16  # tokens per training chunk




@register(
    "doc_chunk_tokens",
    group="llm-ext",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    )
    SELECT doc_id,
           k AS chunk_idx,
           k * {_CHUNK} + 1 AS tok_start,
           least({_CHUNK}, n - k * {_CHUNK}) AS n_chunk_tokens,
           array_to_string(toks[k * {_CHUNK} + 1 : least(n, (k + 1) * {_CHUNK})], ' ')
             AS chunk_text
    FROM t, (SELECT unnest(generate_series(0, 15)) AS k) ks
    WHERE k * {_CHUNK} < n
    """,
)
def doc_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split every document into fixed-budget
    token chunks (the 1->N preprocessing step before embedding or training
    on bounded sequence lengths). Pure map-side row expansion — explode of
    a per-row sequence, slice + join per chunk — output bounded at
    ceil(n_tokens/chunk) rows per doc, zero shuffle at any scale. All
    string/integer arithmetic, so the SQL twin is exact. (The oracle's
    unnest list covers 16 chunks = 256 tokens; corpus max is 100 — a
    production variant sizes the sequence from n itself, as this side
    does.)"""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    k = F.explode(F.sequence(F.lit(0), F.ceil(F.col("n") / _CHUNK).cast("int") - 1))
    return t.select("doc_id", "toks", "n", k.alias("k")).select(
        "doc_id",
        F.col("k").alias("chunk_idx"),
        (F.col("k") * _CHUNK + 1).alias("tok_start"),
        F.least(F.lit(_CHUNK), F.col("n") - F.col("k") * _CHUNK).alias("n_chunk_tokens"),
        F.array_join(F.slice("toks", F.col("k") * _CHUNK + 1, F.lit(_CHUNK)), " ").alias(
            "chunk_text"
        ),
    )




# ---------------------------------------------------------------------------
# sequence packing & contamination (round 7 additions)

_SEQ_LEN = 256  # tokens per packed training sequence


_PACK_BUCKET = 1000  # docs per prefix-sum bucket




@register(
    "doc_pack_sequences",
    group="llm-ext",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS tok_start
      FROM t
    )
    SELECT doc_id, n_tokens, tok_start,
           CAST(tok_start // {_SEQ_LEN} AS BIGINT) AS seq_first,
           CAST((tok_start + n_tokens - 1) // {_SEQ_LEN} AS BIGINT) AS seq_last,
           (tok_start // {_SEQ_LEN}) <> ((tok_start + n_tokens - 1) // {_SEQ_LEN})
             AS straddles
    FROM c
    """,
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate every document's tokens in
    doc_id order and cut the stream into fixed {_SEQ_LEN}-token training
    sequences; report each doc's global token offset, the sequences its
    tokens land in, and whether it straddles a cut.

    The interesting part is the DISTRIBUTED PREFIX SUM. The naive plan —
    `SUM(n_tokens) OVER (ORDER BY doc_id)` — is a single-partition window
    over the whole corpus (exactly the global-sort shape the oracle uses,
    fine for DuckDB, fatal at 100 TB). Instead, the classic two-phase scan:

      1. per-bucket token sums (one map-side-combined groupBy over
         doc_id div {_PACK_BUCKET});
      2. exclusive cumsum of the bucket sums — a window over the *bucket
         table* only (|buckets| = |docs|/{_PACK_BUCKET} rows: thousands at
         100 TB, safe to order globally);
      3. broadcast the bucket offsets back and add a within-bucket
         exclusive cumsum (window PARTITIONED by bucket — parallel).

    All integer arithmetic -> bit-exact vs the oracle's global window.
    """
    t = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        # integer div, not a double round-trip: doc ids at 100 TB exceed
        # double's 2^53 exact-integer range
        F.expr(f"doc_id div {_PACK_BUCKET}").alias("bkt"),
    )
    bsums = t.groupBy("bkt").agg(F.sum("n_tokens").alias("bsum"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boffs = bsums.select(
        "bkt", F.coalesce(F.sum("bsum").over(wb), F.lit(0)).alias("boff")
    )
    ww = Window.partitionBy("bkt").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    tok_start = (F.col("boff") + F.coalesce(F.sum("n_tokens").over(ww), F.lit(0))).alias(
        "tok_start"
    )
    packed = (
        t.join(F.broadcast(boffs), "bkt")
        .select("doc_id", "n_tokens", tok_start)
        .select(
            "doc_id",
            "n_tokens",
            "tok_start",
            F.expr(f"tok_start div {_SEQ_LEN}").alias("seq_first"),
            F.expr(f"(tok_start + n_tokens - 1) div {_SEQ_LEN}").alias("seq_last"),
        )
        .withColumn("straddles", F.col("seq_first") != F.col("seq_last"))
    )
    return packed




# --- doc_chunk_overlap — sliding-window chunking with overlap (round 12) ----


_OVL_W = 32  # chunk window (tokens)


_OVL_S = 24  # stride (tokens) -> 8-token overlap




@register(
    "doc_chunk_overlap",
    group="llm-ext",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    )
    SELECT doc_id,
           k AS chunk_idx,
           CAST(k * {_OVL_S} + 1 AS BIGINT) AS tok_start,
           CAST(least({_OVL_W}, n - k * {_OVL_S}) AS BIGINT) AS n_chunk_tokens,
           CAST(CASE WHEN k = 0 THEN 0
                ELSE least({_OVL_W - _OVL_S}, n - k * {_OVL_S}) END AS BIGINT)
             AS n_overlap_tokens,
           array_to_string(toks[k * {_OVL_S} + 1 : least(n, k * {_OVL_S} + {_OVL_W})], ' ')
             AS chunk_text
    FROM t, (SELECT unnest(generate_series(0, 63)) AS k) ks
    WHERE k * {_OVL_S} < n
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking WITH OVERLAP — the RAG-ingest standard
    ([[doc_chunk_tokens]] cuts disjoint context-window chunks for
    training; retrieval chunking overlaps so an answer spanning a cut
    is whole in at least one chunk): {w}-token windows at a {s}-token
    stride (8-token overlap), emitting each chunk's text, its token
    span, and how many of its leading tokens repeat the previous chunk
    (the dedup-accounting column — overlapping chunkers inflate token
    counts and [[doc_global_shuffle_shard]]-style budget planners must
    subtract it).

    Map-side 1→N row expansion, zero shuffle (pinned with the other
    map-only text ops): at 100 TB this runs at scan speed; the
    generate_series cap bounds per-doc expansion the same way the
    fixed-budget chunker's does."""
    toks = F.split("text", " ")
    d = table(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n")
    )
    ks = F.sequence(F.lit(0), F.lit(63))
    e = d.select(
        "doc_id", "toks", "n", F.explode(ks).alias("k")
    ).where(F.col("k") * _OVL_S < F.col("n"))
    start = F.col("k") * _OVL_S + 1
    return e.select(
        "doc_id",
        F.col("k").alias("chunk_idx"),
        start.cast("long").alias("tok_start"),
        F.least(F.lit(_OVL_W), F.col("n") - F.col("k") * _OVL_S)
        .cast("long")
        .alias("n_chunk_tokens"),
        F.when(F.col("k") == 0, F.lit(0))
        .otherwise(F.least(F.lit(_OVL_W - _OVL_S), F.col("n") - F.col("k") * _OVL_S))
        .cast("long")
        .alias("n_overlap_tokens"),
        F.array_join(
            F.slice(
                "toks",
                start,
                F.least(F.col("n") - F.col("k") * _OVL_S, F.lit(_OVL_W)),
            ),
            " ",
        ).alias("chunk_text"),
    )




doc_chunk_overlap.__doc__ = doc_chunk_overlap.__doc__.format(w=_OVL_W, s=_OVL_S)
