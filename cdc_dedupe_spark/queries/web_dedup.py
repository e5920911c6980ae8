"""Round-14 web-corpus dedup pre-stages (VERDICT r13 next-step #7): the
CCNet/RefinedWeb-style keying that runs BEFORE content dedup on a crawl
corpus — URL canonicalization + URL-key dedup, host-level duplication
profiling — plus the end-to-end `pipeline_dedup_full` composition (exact
digest dedup -> MinHash-LSH clustering over the survivors -> keeper
selection -> per-source survivorship audit) in ONE declarative plan.

The documents corpus carries no URL column, so the crawl URL is DERIVED
deterministically from (doc_id, source, lang) — messy on purpose (scheme
variants, www., stray case, utm_* tracking params, fragments, trailing
slashes) so the canonicalization kernel has real work to do. Both engines
derive the identical string, so every stage stays hash-exact. The
canonicalizer itself is the real operator: at 100 TB it is pure map-side
regex work (JVM regexp_replace, zero shuffle) feeding a groupBy on the
canonical key — the standard first dedup pass of a web pipeline, removing
re-crawls of the same page before any content hashing runs.

Reference scope note: the reference engine (WatchStream.java) dedupes
stream entries by payload id; these operators are the corpus-scale
generalization the LLM-pipeline brief asks for, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ._determinism import round_pos
from ..tables import spread_scan, table
from .registry import register

# --- deterministic messy-URL derivation (identical in both engines) --------

_URL_SQL = """(
      CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END ||
      CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END ||
      CASE WHEN doc_id % 7 = 0 THEN upper(source) ELSE source END ||
      '.example.com/' || lang || '/doc-' || CAST(doc_id % 13 AS VARCHAR) ||
      CASE WHEN doc_id % 9 = 0 THEN '/' ELSE '' END ||
      CASE WHEN doc_id % 5 = 0
           THEN '?utm_source=feed&utm_medium=rss&page=' || CAST(doc_id % 3 AS VARCHAR)
           WHEN doc_id % 5 = 1 THEN '?page=' || CAST(doc_id % 3 AS VARCHAR)
           ELSE '' END ||
      CASE WHEN doc_id % 11 = 0 THEN '#section-2' ELSE '' END
    )"""

# Canonicalization pipeline (each step a portable regex — same semantics in
# Java regex and RE2; only the backreference escape differs, '$1' vs '\1').
# Steps, in order: lowercase; drop fragment; strip ALL leading scheme/www.
# repetitions in ONE alternation pass (r14's one-at-a-time anchors left
# 'https://www.https://x' unstable); remove utm_* params ANCHORED at a
# [?&] separator (the r14 unanchored pattern could splice a new 'utm_'
# token across the removal seam: '?a=1&ututm_c=2&m_d=3'); promote the
# first '&' to '?' when the utm removal consumed the original '?' (keeps
# the '?page=k' and '&page=k' variants on one canonical key); collapse
# ALL slashes before a query string ('/+\?', not '/\?' — one-slash
# consumption was r14's '//?0' non-idempotence); strip dangling tail
# separators in one character-class pass.
#
# The chain is IDEMPOTENT: every later step's output is a fixed point of
# every earlier step (the argument is spelled out step-by-step in
# tests/test_properties.py::test_url_canonicalizer_is_idempotent, which
# pins every historical counterexample — '??', 'a?/', '//?0',
# 'https://www.www.x', '?a=1&ututm_c=2&m_d=3' — over a full-strength
# alphabet that CAN generate the stripped tokens).
_CANON_SQL = f"""
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(lower({{url}}), '#.*$', ''),
              '^((https?://)|(www\\.))+', ''),
            '[?&]utm_[a-z]+=[^&]*', '', 'g'),
          '^([^?&]*)&', '\\1?'),
        '/+\\?', '?', 'g'),
      '[?&/]+$', '')"""


def _url_col() -> Column:
    d = F.col("doc_id")
    return F.concat(
        F.when(d % 2 == 0, F.lit("https://")).otherwise(F.lit("http://")),
        F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        (d % 13).cast("string"),
        F.when(d % 9 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.concat(F.lit("?utm_source=feed&utm_medium=rss&page="), (d % 3).cast("string")))
        .when(d % 5 == 1, F.concat(F.lit("?page="), (d % 3).cast("string")))
        .otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )


def _canon_col(url: Column) -> Column:
    u = F.lower(url)
    u = F.regexp_replace(u, "#.*$", "")
    u = F.regexp_replace(u, "^((https?://)|(www\\.))+", "")
    u = F.regexp_replace(u, "[?&]utm_[a-z]+=[^&]*", "")
    u = F.regexp_replace(u, "^([^?&]*)&", "$1?")
    u = F.regexp_replace(u, "/+\\?", "?")
    return F.regexp_replace(u, "[?&/]+$", "")


@register(
    "dedup_url_canonical",
    group="web-dedup",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {_CANON_SQL.format(url=_URL_SQL)} AS canonical_url
      FROM documents
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS keeper_doc_id
    FROM u GROUP BY canonical_url
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-key dedup, the crawl pipeline's first pass: canonicalize the
    (derived) crawl URL — strip fragment/scheme/www., lowercase, remove
    utm_* tracking params, normalize dangling separators and trailing
    slashes — then first-wins (min doc_id) per canonical URL. Re-crawls
    of one page under cosmetic URL variants collapse BEFORE any content
    hashing runs (CCNet §2.2's URL dedup stage).

    Scale: the canonicalizer is map-side JVM regexp chains inside one
    codegen stage; the only shuffle is the groupBy on the canonical key —
    high-cardinality, content-derived, skew-free. Output is O(|distinct
    pages|)."""
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "source", "lang"
    )
    u = d.select("doc_id", _canon_col(_url_col()).alias("canonical_url"))
    return u.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


@register(
    "dedup_url_host_stats",
    group="web-dedup",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, lang, {_CANON_SQL.format(url=_URL_SQL)} AS cu
      FROM documents
    ), h AS (
      SELECT doc_id, lang, cu, regexp_extract(cu, '^[^/]+') AS host FROM u
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT cu) AS BIGINT) AS n_pages,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           (round(1.0 - CAST(COUNT(DISTINCT cu) AS DOUBLE) / COUNT(*), 4) + 0.0)
             AS url_dup_rate
    FROM h GROUP BY host
    """,
)
def dedup_url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level duplication profile — the keying stage that decides
    which hosts get aggressive dedup or outright drops (RefinedWeb runs
    this before content dedup; boilerplate-heavy hosts show high
    url_dup_rate). Host = canonical URL up to the first slash.

    Scale: one groupBy(host). Host keys are Zipf-skewed on a real crawl
    — the distinct-count aggregates are the partial-aggregating kind
    (map-side sets per host shard), and a production variant swaps
    COUNT(DISTINCT) for approx_count_distinct when hosts grow hot; here
    counts stay exact so the oracle can be exact."""
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "source", "lang"
    )
    u = d.select("doc_id", "lang", _canon_col(_url_col()).alias("cu"))
    h = u.select("doc_id", "lang", "cu", F.regexp_extract("cu", "^[^/]+", 0).alias("host"))
    return h.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cu").cast("long").alias("n_pages"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        round_pos(
            F.lit(1.0) - F.countDistinct("cu").cast("double") / F.count(F.lit(1)), 4
        ).alias("url_dup_rate"),
    )


# --- the end-to-end dedup pipeline composition ------------------------------

# Exact stage keys on the md5 of the 200-char prefix — the same content
# fingerprint the minhash stage shingles (prefix_len=200), and non-vacuous
# on this corpus (the generator emits no full-text duplicates but does
# emit shared prefixes). A production pipeline keys the full-text digest
# first and the fingerprint second; the composition shape is identical.


def _pipeline_dedup_oracle() -> str:
    from .llm_ext import _MHC_MIN_SIM, _mh_pair_ctes

    return f"""
    WITH RECURSIVE exact AS (
      SELECT doc_id, source, text,
             MIN(doc_id) OVER (PARTITION BY md5(substr(text, 1, 200))) AS keeper0
      FROM documents
    ), keepers AS (
      SELECT doc_id, text FROM exact WHERE doc_id = keeper0
    ), {_mh_pair_ctes("keepers")}, mh AS (
      SELECT doc_a, doc_b FROM mh_scored WHERE minhash_sim >= {_MHC_MIN_SIM}
    ), und AS (
      SELECT doc_a AS u, doc_b AS v FROM mh UNION SELECT doc_b, doc_a FROM mh
    ), reach(v, lbl) AS (
      SELECT doc_id, doc_id FROM keepers
      UNION
      SELECT e.v, r.lbl FROM reach r JOIN und e ON e.u = r.v
    ), labels AS (
      SELECT v AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY v
    ), status AS (
      SELECT e.source,
             CASE WHEN e.doc_id <> e.keeper0 THEN 'exact'
                  WHEN l.cluster_id <> e.doc_id THEN 'near'
                  ELSE 'kept' END AS stage
      FROM exact e LEFT JOIN labels l ON l.doc_id = e.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN stage = 'exact' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_removed,
           CAST(SUM(CASE WHEN stage = 'near' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_near_removed,
           CAST(SUM(CASE WHEN stage = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           (round(CAST(SUM(CASE WHEN stage = 'kept' THEN 1 ELSE 0 END) AS DOUBLE)
                  / COUNT(*), 4) + 0.0) AS retention_r
    FROM status GROUP BY source
    """


def _register_pipeline_dedup_full() -> None:
    """Deferred registration: the oracle composes llm_ext's minhash CTEs,
    and importing llm_ext at web_dedup import time is safe (queries/
    __init__ imports llm_ext first; this indirection keeps the import
    edge one-way and explicit)."""

    @register("pipeline_dedup_full", group="web-dedup", oracle=_pipeline_dedup_oracle())
    def pipeline_dedup_full(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The WHOLE dedup pipeline as ONE declarative plan — the
        composition a training-data build actually runs (VERDICT r13
        next-step #7): exact fingerprint dedup (md5 of the 200-char
        prefix, first-wins) -> fixed-family MinHash-LSH clustering over
        the exact survivors (llm_ext.minhash_pairs gated at signature
        agreement >= 0.75, transitively closed by the distributed
        hook+jump CC) -> keeper selection -> per-source survivorship
        audit (docs in, removed per stage, kept, retention).

        Scale shape, stage by stage: the exact stage shuffles
        (16-byte digest, doc_id) pairs only — never text — with a
        map-side-combined MIN per digest, then one equi-join back on
        digest; the near stage inherits the banded-LSH bound (candidates,
        never all-pairs) and the CC touches O(|keepers|) label rows per
        round; the audit is a 20-group aggregate. Composing the stages in
        one plan lets Catalyst reuse the scan and pipeline the digest
        join into the shingle stage — no intermediate materialization a
        human operator would otherwise write to disk between stages."""
        from ..operators.graph import connected_components
        from .llm_ext import _MHC_MIN_SIM, minhash_pairs

        d = spread_scan(table(spark, sf_dir, "documents"), "doc_id").select(
            "doc_id", "source", "text"
        )
        ex = d.withColumn("digest", F.md5(F.substring("text", 1, 200)))
        keep0 = ex.groupBy("digest").agg(F.min("doc_id").alias("keeper0"))
        # Lazy localCheckpoint (r19, guide §2.4): THREE subtrees consume the
        # exact-dedup stage — the minhash band pipeline (via keepers), the
        # CC node set, and the survivorship status join — and exchange
        # reuse does not unify them, so the scan+md5+digest-join used to
        # run three times per query. Materialize it once; ~|docs| rows of
        # (id, source, text, keeper0). On a real cluster swap for reliable
        # checkpoint() (operators/graph.py note).
        ex2 = (
            ex.join(keep0, "digest")
            .select("doc_id", "source", "text", "keeper0")
            .localCheckpoint(eager=False)
        )
        keepers = ex2.filter(F.col("doc_id") == F.col("keeper0")).select("doc_id", "text")

        pairs = minhash_pairs(keepers).filter(F.col("minhash_sim") >= _MHC_MIN_SIM)
        edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        nodes = keepers.select(F.col("doc_id").alias("vec_id"))
        labels = connected_components(nodes, edges).select(
            F.col("vec_id").alias("l_doc_id"), "cluster_id"
        )

        status = ex2.join(labels, ex2.doc_id == labels.l_doc_id, "left").select(
            "source",
            F.when(F.col("doc_id") != F.col("keeper0"), F.lit("exact"))
            .when(F.col("cluster_id") != F.col("doc_id"), F.lit("near"))
            .otherwise(F.lit("kept"))
            .alias("stage"),
        )
        return status.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("stage") == "exact").cast("long")).alias("n_exact_removed"),
            F.sum((F.col("stage") == "near").cast("long")).alias("n_near_removed"),
            F.sum((F.col("stage") == "kept").cast("long")).alias("n_kept"),
            round_pos(
                F.sum((F.col("stage") == "kept").cast("long")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("retention_r"),
        )


_register_pipeline_dedup_full()


# --- C4-style cross-doc segment (line-level) dedup ---------------------------

_SEG = 12  # tokens per segment ("line" stand-in: the corpus has no newlines)
_SEG_MIN_OCC = 3  # C4 removes any line occurring >= 3 times corpus-wide


def _seg_ctes(src: str) -> str:
    """Shared segment CTE chain over a documents-shaped relation {src}:
    t (tokenized) -> ks (segment indices) -> seg (segment text + length)
    -> c (corpus-wide segment counts, keyed by md5). Composed by the
    dedup_line_cross_doc audit, the text_strip_boilerplate emitter, and
    pipeline_curation_mix's first gate so all three twins share ONE
    segment definition."""
    return f"""t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM {src}
    ), ks AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(0, CAST((n - 1) // {_SEG} AS BIGINT))) AS k
      FROM t
    ), seg AS (
      SELECT doc_id, k, n,
             array_to_string(toks[k * {_SEG} + 1 : least(n, (k + 1) * {_SEG})], ' ')
               AS seg_text,
             least(n, (k + 1) * {_SEG}) - k * {_SEG} AS seg_len
      FROM ks
    ), c AS (
      SELECT md5(seg_text) AS seg_key, COUNT(*) AS cnt FROM seg GROUP BY seg_key
    )"""


@register(
    "dedup_line_cross_doc",
    group="web-dedup",
    oracle=f"""
    WITH {_seg_ctes("documents")}
    SELECT seg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN c.cnt >= {_SEG_MIN_OCC} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           (round(CAST(COUNT(*) - SUM(CASE WHEN c.cnt >= {_SEG_MIN_OCC} THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*), 4) + 0.0) AS retention_r
    FROM seg JOIN c ON md5(seg.seg_text) = c.seg_key
    GROUP BY seg.doc_id
    """,
)
def dedup_line_cross_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style LINE-level cross-document dedup audit (C4 §2.2 removes
    any three-sentence span occurring more than once; RefinedWeb's line
    dedup is the same shape): the corpus text has no newlines, so the
    "line" is a fixed {seg}-token segment; any segment occurring >=
    {occ} times corpus-wide is boilerplate and removed from every doc.
    Output: per-doc segment counts and retention after removal — the
    audit a curation run reads before committing the pass.

    Scale shape: segments are hashed to md5 MAP-SIDE, so the corpus-wide
    count shuffles (doc_id, 16-byte key) pairs, never text; the count is
    a map-side-combined groupBy, the membership join is hash-on-digest
    (the same digest-keyed layout the bucketed-write demo persists), and
    the per-doc rollup re-shuffles doc_id only. Never all-pairs, no text
    movement after the first projection."""
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id").select("doc_id", "text")
    t = d.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n"),
    )
    seg = t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), ((F.col("n") - 1) / _SEG).cast("long")),
                lambda k: F.md5(F.array_join(F.slice("toks", k * _SEG + 1, _SEG), " ")),
            )
        ).alias("seg_key"),
    )
    c = seg.groupBy("seg_key").agg(F.count(F.lit(1)).alias("cnt"))
    joined = seg.join(c, "seg_key")
    shared = F.sum((F.col("cnt") >= _SEG_MIN_OCC).cast("long"))
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        shared.alias("n_shared"),
        round_pos(
            (F.count(F.lit(1)) - shared).cast("double") / F.count(F.lit(1)), 4
        ).alias("retention_r"),
    )


dedup_line_cross_doc.__doc__ = dedup_line_cross_doc.__doc__.format(
    seg=_SEG, occ=_SEG_MIN_OCC
)


# --- boilerplate-stripped corpus EMISSION ------------------------------------

# The oracle twin of strip_boilerplate(), parametrized on the source
# relation so pipeline_curation_mix can compose it over `documents` and a
# hypothetical re-run could compose it over any documents-shaped view.
def _strip_sql(src: str) -> str:
    return f"""{_seg_ctes(src)}, m AS (
      SELECT seg.doc_id, seg.k, seg.n, seg.seg_text, seg.seg_len,
             (c.cnt >= {_SEG_MIN_OCC}) AS removed
      FROM seg JOIN c ON md5(seg.seg_text) = c.seg_key
    ), stripped AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_segments,
             CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
             CAST(MAX(n) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN removed THEN 0 ELSE seg_len END) AS BIGINT)
               AS n_tokens_kept,
             COALESCE(string_agg(CASE WHEN NOT removed THEN seg_text END,
                                 ' ' ORDER BY k), '') AS text_clean
      FROM m GROUP BY doc_id
    )"""


def strip_boilerplate(d: DataFrame) -> DataFrame:
    """The line-level dedup EMITTER over a (doc_id, text) frame: remove
    every {seg}-token segment whose corpus-wide frequency is >=
    {occ} (the C4 boilerplate rule dedup_line_cross_doc audits) and
    reassemble the surviving segments order-preserving. Returns one row
    per doc: doc_id, n_segments, n_removed, n_tokens, n_tokens_kept,
    text_clean.

    Shape at scale (the audit's digest-only discipline, extended to an
    emitter): segment hashing is map-side; the corpus count shuffles
    16-byte keys only; the membership test joins against ONLY the
    boilerplate key set (cnt >= {occ}) — the set of segments repeated
    corpus-wide, Heaps'-bounded like the text_vocab_unk kept-vocab and
    vastly smaller than the distinct-segment universe, so it is
    BROADCAST and the doc-side rows never reshuffle: the per-doc rollup
    (which collects kept SEGMENT INDICES, ints) and the final
    reassembly join both reuse the up-front doc_id partitioning, and
    the token arrays cross exactly that one exchange. A miss in the
    broadcast left join means "kept"."""
    par = int(d.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    t = (
        d.repartition(par, "doc_id")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .withColumn("n", F.size("toks").cast("long"))
    )
    segkeys = t.select(
        "doc_id",
        "n",
        F.explode(F.sequence(F.lit(0).cast("long"), ((F.col("n") - 1) / _SEG).cast("long"))).alias("k"),
        "toks",
    ).select(
        "doc_id",
        "n",
        "k",
        F.md5(F.array_join(F.slice("toks", (F.col("k") * _SEG + 1).cast("int"), F.lit(_SEG)), " ")).alias("seg_key"),
        F.least(F.col("n") - F.col("k") * _SEG, F.lit(_SEG).cast("long")).alias("seg_len"),
    )
    boiler = (
        segkeys.groupBy("seg_key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= _SEG_MIN_OCC)
        .select("seg_key", F.lit(True).alias("bflag"))
    )
    flags = segkeys.join(F.broadcast(boiler), "seg_key", "left").select(
        "doc_id", "k", "n", "seg_len", F.coalesce("bflag", F.lit(False)).alias("removed")
    )
    perdoc = flags.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("removed").cast("long")).alias("n_removed"),
        F.max("n").alias("n_tokens"),
        F.sum(F.when(F.col("removed"), F.lit(0)).otherwise(F.col("seg_len"))).alias(
            "n_tokens_kept"
        ),
        F.array_sort(F.collect_list(F.when(~F.col("removed"), F.col("k")))).alias(
            "kept_ks"
        ),
    )
    return perdoc.join(t.select("doc_id", "toks"), "doc_id").select(
        "doc_id",
        "n_segments",
        "n_removed",
        "n_tokens",
        "n_tokens_kept",
        F.array_join(
            F.flatten(
                F.transform(
                    "kept_ks",
                    lambda kk: F.slice("toks", (kk * _SEG + 1).cast("int"), F.lit(_SEG)),
                )
            ),
            " ",
        ).alias("text_clean"),
    )


strip_boilerplate.__doc__ = strip_boilerplate.__doc__.format(seg=_SEG, occ=_SEG_MIN_OCC)


@register(
    "text_strip_boilerplate",
    group="web-dedup",
    oracle=f"""
    WITH {_strip_sql("documents")}
    SELECT doc_id, n_segments, n_removed, n_tokens, n_tokens_kept, text_clean
    FROM stripped
    """,
)
def text_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaned-corpus EMISSION for line-level dedup (VERDICT r14 #2):
    where dedup_line_cross_doc only PROFILES boilerplate, this operator
    performs the actual C4 §2.2 transform a pipeline ships — every
    {seg}-token segment occurring >= {occ} times corpus-wide is removed
    from every document and the remaining text is reassembled
    order-preserving, with per-doc kept/removed token accounting.
    Reference-need analogue: the reference EMITS its deduped stream
    (WatchStream.java:284-293); an audit alone doesn't ship data.

    Plan shape: see strip_boilerplate — digest-only count + membership
    shuffles, kept segments carried as indices, and the token arrays
    cross exactly one doc_id-keyed exchange for reassembly."""
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id").select("doc_id", "text")
    return strip_boilerplate(d)


text_strip_boilerplate.__doc__ = text_strip_boilerplate.__doc__.format(
    seg=_SEG, occ=_SEG_MIN_OCC
)


# --- the two-stage web funnel: host gate -> URL dedup ------------------------

_HOST_GATE = 0.12  # drop hosts whose canonical-URL dup rate >= this


@register(
    "pipeline_web_funnel",
    group="web-dedup",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, source, {_CANON_SQL.format(url=_URL_SQL)} AS cu
      FROM documents
    ), h AS (
      SELECT doc_id, source, cu, regexp_extract(cu, '^[^/]+') AS host FROM u
    ), hr AS (
      SELECT host, 1.0 - CAST(COUNT(DISTINCT cu) AS DOUBLE) / COUNT(*) AS dup_rate
      FROM h GROUP BY host
    ), gated AS (
      SELECT h.*, hr.dup_rate >= {_HOST_GATE} AS host_gated FROM h
      JOIN hr ON h.host = hr.host
    ), keep0 AS (
      SELECT cu, MIN(doc_id) AS keeper FROM gated WHERE NOT host_gated GROUP BY cu
    ), status AS (
      SELECT g.source,
             CASE WHEN g.host_gated THEN 'host'
                  WHEN g.doc_id <> k.keeper THEN 'url'
                  ELSE 'kept' END AS stage
      FROM gated g LEFT JOIN keep0 k ON g.cu = k.cu
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN stage = 'host' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_host_gated,
           CAST(SUM(CASE WHEN stage = 'url' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_url_dups,
           CAST(SUM(CASE WHEN stage = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           (round(CAST(SUM(CASE WHEN stage = 'kept' THEN 1 ELSE 0 END) AS DOUBLE)
                  / COUNT(*), 4) + 0.0) AS retention_r
    FROM status GROUP BY source
    """,
)
def pipeline_web_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-stage WEB funnel that runs before any content dedup
    (CCNet/RefinedWeb order): (1) HOST gate — profile each host's
    canonical-URL duplication rate and drop every doc from hosts at or
    above {gate} (boilerplate mills); (2) URL dedup — first-wins per
    canonical URL among the surviving docs; then the per-source funnel
    audit (docs in, dropped per stage, kept, retention).

    Scale shape: the host profile is a tiny rollup (O(hosts) rows)
    joined back BROADCAST; the URL keeper is one groupBy on the
    canonical key; the audit is a 20-group aggregate. Stage decisions
    compose in one plan, so Catalyst shares the scan and the
    canonicalization projection between the profile and the funnel."""
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "source", "lang"
    )
    h = d.select(
        "doc_id", "source", _canon_col(_url_col()).alias("cu")
    ).withColumn("host", F.regexp_extract("cu", "^[^/]+", 0))
    hr = h.groupBy("host").agg(
        (
            F.lit(1.0)
            - F.countDistinct("cu").cast("double") / F.count(F.lit(1))
        ).alias("dup_rate")
    )
    gated = h.join(F.broadcast(hr), "host").withColumn(
        "host_gated", F.col("dup_rate") >= _HOST_GATE
    )
    keep0 = (
        gated.filter(~F.col("host_gated"))
        .groupBy("cu")
        .agg(F.min("doc_id").alias("keeper"))
    )
    status = gated.join(keep0, "cu", "left").select(
        "source",
        F.when(F.col("host_gated"), F.lit("host"))
        .when(F.col("doc_id") != F.col("keeper"), F.lit("url"))
        .otherwise(F.lit("kept"))
        .alias("stage"),
    )
    kept = F.sum((F.col("stage") == "kept").cast("long"))
    return status.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("stage") == "host").cast("long")).alias("n_host_gated"),
        F.sum((F.col("stage") == "url").cast("long")).alias("n_url_dups"),
        kept.alias("n_kept"),
        round_pos(kept.cast("double") / F.count(F.lit(1)), 4).alias("retention_r"),
    )


pipeline_web_funnel.__doc__ = pipeline_web_funnel.__doc__.format(gate=_HOST_GATE)


# --- per-host cap sampling ----------------------------------------------------

_HOST_CAP = 15  # max docs kept per host


@register(
    "sample_host_capped",
    group="web-dedup",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, regexp_extract({_CANON_SQL.format(url=_URL_SQL)}, '^[^/]+')
               AS host
      FROM documents
    ), r AS (
      SELECT host, doc_id,
             row_number() OVER (
               PARTITION BY host
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS samp_rank
      FROM u
    )
    SELECT host, doc_id, CAST(samp_rank AS BIGINT) AS samp_rank
    FROM r WHERE samp_rank <= {_HOST_CAP}
    """,
)
def sample_host_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host cap sampling — the domain-capping stage every pretraining
    mix runs so no single host dominates the corpus (Gopher/MassiveText
    cap documents per domain): keep at most {cap} docs per host, chosen
    by content-hash order (md5 of the doc id) so the sample is
    deterministic, uniform-ish within host, and rerun-stable on any
    cluster layout — never "first K by arrival".

    Scale shape: one hash shuffle on host + a rank-k window, which Spark
    plans with WindowGroupLimit (map-side top-k per host BEFORE the
    shuffle — pinned in tests/test_plans.py for the window-dedupe twin),
    so the shuffle carries at most {cap} rows per host per input
    partition, not the host's whole doc set."""
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "source", "lang"
    )
    u = d.select(
        "doc_id", F.regexp_extract(_canon_col(_url_col()), "^[^/]+", 0).alias("host")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        u.withColumn("samp_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("samp_rank") <= _HOST_CAP)
        .select("host", "doc_id", "samp_rank")
    )


sample_host_capped.__doc__ = sample_host_capped.__doc__.format(cap=_HOST_CAP)


# --- domain-suffix blocklist filter (round 17) ------------------------------

# External input in a real pipeline (a curated blocklist file); a FIXED
# literal here so both engines see the identical list. Entries are DNS
# suffixes: an entry blocks the exact host and every subdomain of it.
# The last entry matches nothing on this corpus — the no-op lane that
# proves matching is driven by the list, not by the corpus.
_BLOCKLIST = (
    "src3.example.com",
    "src7.example.com",
    "src11.example.com",
    "malware.example.net",
)


@register(
    "curation_domain_blocklist",
    group="web-dedup",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source,
             regexp_extract({_CANON_SQL.format(url=_URL_SQL)}, '^[^/]+')
               AS host
      FROM documents
    ), b AS (
      SELECT unnest(ARRAY{list(_BLOCKLIST)!r}) AS d
    ), m AS (
      SELECT h.*, EXISTS (SELECT 1 FROM b
                          WHERE h.host = b.d OR h.host LIKE '%.' || b.d)
               AS blocked
      FROM h
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocked,
           CAST(SUM(CASE WHEN blocked THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
           (round(CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS DOUBLE)
                  / COUNT(*), 4) + 0.0) AS block_rate
    FROM m GROUP BY source
    """,
)
def curation_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-suffix blocklist filter — the crawl pipeline's policy gate
    (CCNet/RefinedWeb both run a URL/domain blocklist before any content
    work): an entry blocks its exact host and every subdomain. Reported
    as a per-source (n_docs, n_blocked, n_kept, block_rate) audit — the
    row a curation run logs before dropping anything.

    Scale shape: the SCALABLE suffix-match form, not a LIKE chain — each
    host explodes into its O(#labels) DNS suffixes map-side
    (src3.example.com -> [src3.example.com, example.com, com]) and
    equi-joins the BROADCAST blocklist, so a 100k-entry production
    blocklist costs one broadcast hash probe per label, independent of
    list length; the oracle states the same semantics as an EXISTS
    suffix predicate. Matches collapse through the boolean max inside
    the per-source partial agg — a doc matching several entries counts
    once. No shuffle carries more than the per-source rollup."""
    d = spread_scan(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "source", "lang"  # lang feeds the derived-URL path segment
    )
    h = d.select(
        "doc_id",
        "source",
        F.regexp_extract(_canon_col(_url_col()), "^[^/]+", 0).alias("host"),
    )
    labels = F.split(F.col("host"), "\\.")
    sufs = F.transform(
        F.sequence(F.lit(0), F.size(labels) - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, F.size(labels)), "."),
    )
    bl = F.broadcast(
        spark.createDataFrame([(x,) for x in _BLOCKLIST], "d string")
    )
    hit = (
        h.select("doc_id", F.explode(sufs).alias("suf"))
        .join(bl, F.col("suf") == F.col("d"))
        .select("doc_id")
        .distinct()
        .withColumn("blocked", F.lit(True))
    )
    m = h.join(hit, "doc_id", "left").select(
        "source", F.coalesce("blocked", F.lit(False)).alias("blocked")
    )
    n_blocked = F.sum(F.when(F.col("blocked"), 1).otherwise(0)).cast("long")
    return m.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        n_blocked.alias("n_blocked"),
        F.sum(F.when(F.col("blocked"), 0).otherwise(1)).cast("long").alias("n_kept"),
        round_pos(
            F.sum(F.when(F.col("blocked"), 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("block_rate"),
    )
