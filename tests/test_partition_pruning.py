"""Partition pruning over a hive-partitioned layout — the other half of
the SCALING.md scan story (PushedFilters is pinned in test_plans; this
pins PartitionFilters): a filter on the partition column must prune
directories at planning time, not scan-and-discard."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def test_partition_filter_prunes_directories(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_by_lang")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)

    pruned = spark.read.parquet(out).filter(F.col("lang") == "en")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    # the partition predicate must appear as a PartitionFilter (pruned at
    # planning), NOT as a data Filter over a full scan. (inputFiles() can't
    # witness this — it reflects the unpruned file index.)
    import re

    assert re.search(r"PartitionFilters: \[[^\]]*lang#\d+ = en", plan), plan
    # and values survive the round-trip
    expect = docs.filter(F.col("lang") == "en").count()
    assert pruned.count() == expect


def test_curated_corpus_readback_prunes_lang_partition(spark, sf_dir):
    """The r15 write-path contract, pruning half: after
    pipeline_corpus_write_readback persists the mix partitionBy(lang),
    the read-back's lang filter must land in PartitionFilters (pruned at
    planning) and the files actually read must be only the lang=en
    directory."""
    import re

    from cdc_dedupe_spark.queries.pipeline_ops import _CURATED_TABLE
    from cdc_dedupe_spark.queries.registry import REGISTRY

    # running the query performs the write and returns the read-back
    REGISTRY["pipeline_corpus_write_readback"].spark(spark, sf_dir).collect()

    rb = spark.table(_CURATED_TABLE).filter(F.col("lang") == "en")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rb.explain("formatted")
    plan = buf.getvalue()
    assert re.search(r"PartitionFilters: \[[^\]]*lang#\d+ = en", plan), plan
    # executed-plan file index: every file read is under lang=en/
    files = rb.inputFiles()
    assert files and all("lang=en" in f for f in files), files[:5]
