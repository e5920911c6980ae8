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


# ---------------------------------------------------------------------------
# text_strip_boilerplate — the cleaned-corpus emitter (r15)


def _write_docs(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


_BOILER = " ".join(f"b{i}" for i in range(12))  # one full 12-token segment


def test_strip_boilerplate_hand_computed(spark, tmp_path):
    """The C4 transform, end to end on a fixture where the boilerplate
    segment appears in >= 3 docs: it must vanish from EVERY doc
    (including one where it sits mid-doc at a different segment index —
    removal is keyed on content, not position), unique text must
    survive byte-identical and order-preserving, and a doc that is pure
    boilerplate must strip to the empty string with exact token
    accounting."""
    from cdc_dedupe_spark.queries.registry import REGISTRY

    x = " ".join(f"x{i}" for i in range(12))
    y = " ".join(f"y{i}" for i in range(12))
    rows = [
        (0, _BOILER + " u0 u1", "en", "s1"),      # boiler at k=0, tail kept
        (1, _BOILER, "en", "s1"),                  # pure boilerplate -> ''
        (2, x + " " + _BOILER + " " + y, "en", "s1"),  # boiler mid-doc (k=1)
        (3, " ".join(f"z{i}" for i in range(6)), "en", "s2"),  # untouched
    ]
    sf = _write_docs(tmp_path, rows)
    out = {r.doc_id: r for r in REGISTRY["text_strip_boilerplate"].spark(spark, sf).collect()}

    assert out[0].text_clean == "u0 u1"
    assert (out[0].n_segments, out[0].n_removed) == (2, 1)
    assert (out[0].n_tokens, out[0].n_tokens_kept) == (14, 2)

    assert out[1].text_clean == ""
    assert (out[1].n_tokens, out[1].n_tokens_kept) == (12, 0)

    assert out[2].text_clean == x + " " + y  # order preserved around the hole
    assert (out[2].n_segments, out[2].n_removed) == (3, 1)

    assert out[3].text_clean == rows[3][1]  # below threshold: untouched
    assert out[3].n_removed == 0
    assert len(out) == 4


def test_strip_boilerplate_below_threshold_keeps_everything(spark, tmp_path):
    """A segment shared by only TWO docs is below the >=3 rule and must
    survive — the emitter must not over-strip merely-repeated content
    (that is the span-dedup gate's job, at a different granularity)."""
    from cdc_dedupe_spark.queries.registry import REGISTRY

    rows = [
        (0, _BOILER + " a0", "en", "s1"),
        (1, _BOILER + " a1", "en", "s1"),
    ]
    sf = _write_docs(tmp_path, rows)
    out = {r.doc_id: r for r in REGISTRY["text_strip_boilerplate"].spark(spark, sf).collect()}
    assert out[0].text_clean == rows[0][1]
    assert out[1].text_clean == rows[1][1]
    assert out[0].n_removed == 0 and out[1].n_removed == 0


def test_curation_mix_strip_gate_changes_outcome(spark, tmp_path):
    """Stage interaction (VERDICT r15 composition ask): three docs whose
    ONLY span duplication lives inside a shared boilerplate segment.
    Without the strip-first gate their 8-gram dup fraction exceeds the
    20% span gate and all three are dropped; with the strip gate the
    boilerplate vanishes first, the survivors are 4 unique tokens each
    (no spans at all), and all three must flow through to the mix with
    dup_bp = 0 and strip_bp = 7500."""
    from cdc_dedupe_spark.queries.registry import REGISTRY

    rows = [
        (0, _BOILER + " a1 a2 a3 a4", "en", "s1"),
        (1, _BOILER + " b1 b2 b3 b4", "en", "s1"),
        (2, _BOILER + " c1 c2 c3 c4", "en", "s1"),
    ]
    sf = _write_docs(tmp_path, rows)
    out = {r.doc_id: r for r in REGISTRY["pipeline_curation_mix"].spark(spark, sf).collect()}
    # single source -> rate_bp = 10000 -> mix keeps everything that passes
    assert set(out) == {0, 1, 2}
    for r in out.values():
        assert r.dup_bp == 0  # span dup gone WITH the strip gate
        assert r.strip_bp == 7500  # 12 of 16 tokens removed
        assert r.rate_bp == 10000
