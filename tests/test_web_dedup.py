"""web_dedup canonicalizer unit contracts (r14): the oracle-parity sweep
pins cross-engine agreement; these pin the SEMANTICS — cosmetic URL
variants of one page must collapse to one canonical key, and distinct
pages must not."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_dedupe_spark.queries.web_dedup import _canon_col


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(_canon_col(F.col("url")).alias("c")).collect()]


def test_canonicalizer_collapses_cosmetic_variants(spark):
    variants = [
        "https://www.src3.example.com/en/doc-7?utm_source=feed&page=1",
        "http://src3.example.com/en/doc-7?page=1#section-2",
        "https://SRC3.example.com/en/doc-7/?page=1",
        "http://www.src3.example.com/en/doc-7?utm_medium=rss&page=1&utm_source=x",
    ]
    got = set(_canon(spark, variants))
    assert got == {"src3.example.com/en/doc-7?page=1"}, got


def test_canonicalizer_preserves_distinct_pages(spark):
    distinct = [
        "https://src3.example.com/en/doc-7?page=1",
        "https://src3.example.com/en/doc-7?page=2",  # different real param
        "https://src3.example.com/en/doc-8?page=1",  # different path
        "https://src4.example.com/en/doc-7?page=1",  # different host
        "https://src3.example.com/de/doc-7?page=1",  # different lang path
    ]
    got = _canon(spark, distinct)
    assert len(set(got)) == len(distinct), got


def test_canonicalizer_handles_bare_and_utm_only_urls(spark):
    cases = {
        # utm-only query: separator must not dangle
        "https://a.example.com/x?utm_source=feed": "a.example.com/x",
        # trailing slash with no query
        "http://www.a.example.com/x/": "a.example.com/x",
        # fragment only
        "https://a.example.com/x#top": "a.example.com/x",
        # nothing to strip
        "a.example.com/x": "a.example.com/x",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values()), dict(zip(cases, got))


def test_line_dedup_segments_partition_tokens(spark, sf_dir):
    """dedup_line_cross_doc's fixed-width segmentation must PARTITION each
    doc's token stream — segments jointly cover every token exactly once
    (ceil(n/w) segments per doc), or retention rates are silently wrong."""
    from cdc_dedupe_spark.queries.registry import REGISTRY
    from cdc_dedupe_spark.tables import table

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    out = REGISTRY["dedup_line_cross_doc"].spark(spark, sf_dir)
    j = d.join(out, "doc_id")
    bad = j.filter(
        F.col("n_segments") != F.ceil(F.col("n_tokens") / F.lit(12.0)).cast("long")
    ).count()
    assert bad == 0
    # every doc appears exactly once
    assert out.count() == d.count()


def test_host_cap_bounds_and_rerun_stability(spark, sf_dir):
    """sample_host_capped: at most 15 docs per host, rank contiguous from
    1, and the kept SET is identical across reruns (content-hash order,
    no arrival dependence)."""
    from cdc_dedupe_spark.queries.registry import REGISTRY

    q = REGISTRY["sample_host_capped"].spark
    a = q(spark, sf_dir)
    per_host = a.groupBy("host").agg(
        F.count(F.lit(1)).alias("n"), F.max("samp_rank").alias("mx")
    )
    assert per_host.filter((F.col("n") > 15) | (F.col("mx") != F.col("n"))).count() == 0
    first = set(map(tuple, a.collect()))
    second = set(map(tuple, q(spark, sf_dir).collect()))
    assert first == second
