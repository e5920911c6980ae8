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
      '.example.com/' || lang || '/doc-' || CAST(doc_id % 61 AS VARCHAR) ||
      CASE WHEN doc_id % 13 = 0 THEN '/' ELSE '' END ||
      CASE WHEN doc_id % 5 = 0
           THEN '?utm_source=feed&utm_medium=rss&page=' || CAST(doc_id % 3 AS VARCHAR)
           WHEN doc_id % 5 = 1 THEN '?page=' || CAST(doc_id % 3 AS VARCHAR)
           ELSE '' END ||
      CASE WHEN doc_id % 11 = 0 THEN '#section-2' ELSE '' END
    )"""

# Canonicalization pipeline (each step a portable regex — same semantics in
# Java regex and RE2): drop fragment, drop scheme, drop leading www.,
# lowercase, drop utm_* tracking params, clean dangling separators, drop
# the trailing path slash (also when a query string follows it).
_CANON_SQL = f"""
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            lower(regexp_replace(regexp_replace(regexp_replace(
              {{url}}, '#.*$', ''), '^https?://', ''), '^www\\.', '')),
            'utm_[a-z]+=[^&]*(&|$)', '', 'g'),
          '[?&]$', ''),
        '/\\?', '?'),
      '/$', '')"""


def _url_col() -> Column:
    d = F.col("doc_id")
    return F.concat(
        F.when(d % 2 == 0, F.lit("https://")).otherwise(F.lit("http://")),
        F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        (d % 61).cast("string"),
        F.when(d % 13 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.concat(F.lit("?utm_source=feed&utm_medium=rss&page="), (d % 3).cast("string")))
        .when(d % 5 == 1, F.concat(F.lit("?page="), (d % 3).cast("string")))
        .otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )


def _canon_col(url: Column) -> Column:
    u = F.regexp_replace(url, "#.*$", "")
    u = F.regexp_replace(u, "^https?://", "")
    u = F.regexp_replace(u, "^www\\.", "")
    u = F.lower(u)
    u = F.regexp_replace(u, "utm_[a-z]+=[^&]*(&|$)", "")
    u = F.regexp_replace(u, "[?&]$", "")
    u = F.regexp_replace(u, "/\\?", "?")
    return F.regexp_replace(u, "/$", "")


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
        ex2 = ex.join(keep0, "digest").select("doc_id", "source", "text", "keeper0")
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
