"""Bucketed (pre-partitioned) co-located joins — the storage-side answer
to repeated big-x-big joins on the same key (SCALING.md relational family).
Writing both sides bucketed on the join key lets every subsequent join
sort-merge WITHOUT an Exchange: at 100 TB that turns the recurring
orders⋈customer shuffle into a metadata no-op paid once at write time."""

from __future__ import annotations

import contextlib
import io
import uuid

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_cust = f"b_orders_{suffix}", f"b_cust_{suffix}"
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable(t_orders)
    )
    (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable(t_cust)
    )
    yield t_orders, t_cust
    spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
    spark.sql(f"DROP TABLE IF EXISTS {t_cust}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    t_orders, t_cust = bucketed_pair
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        j = spark.table(t_orders).join(
            spark.table(t_cust), F.col("o_custkey") == F.col("c_custkey")
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and the result is still the plain join
        assert j.count() == (
            spark.table(t_orders)
            .join(
                F.broadcast(spark.table(t_cust)),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_bucketed_digest_dedup_layout(spark, sf_dir):
    """The 100 TB dedup-layout story (VERDICT r13 next-step #7): persist
    the corpus AND each incoming batch bucketed on the content digest,
    and the two dedup passes that dominate an ingest pipeline run with
    ZERO exchanges — the bucketed scans already report
    hashpartitioning(digest):

    - keeper selection (groupBy digest -> min doc_id): aggregates in
      place over the buckets;
    - incremental dedup (batch ANTI JOIN corpus on digest): sort-merge
      joins bucket-to-bucket, and sortBy(digest) at write time even
      removes the Sort.

    The digest shuffle is paid ONCE at write time and amortized over
    every later pass (incremental dedup, contamination probes, CAS
    audits all key on the same digest).

    Note the defeated variant: joining keepers back with the filter
    doc_id == keeper0 lets Catalyst pull the equality INTO the join keys
    (digest, doc_id), and single-column buckets no longer co-partition
    the two-key join (spark.sql.requireAllClusterKeysForCoPartition
    defaults true) — an Exchange reappears. Keying every pass on digest
    ALONE is part of the layout contract, not a style choice."""
    suffix = uuid.uuid4().hex[:8]
    t_corpus, t_batch = f"b_corpus_{suffix}", f"b_batch_{suffix}"
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "digest", F.md5(F.substring("text", 1, 200))
    )
    for t, pred in ((t_corpus, F.col("doc_id") % 5 != 0), (t_batch, F.col("doc_id") % 5 == 0)):
        (
            d.filter(pred)
            .write.bucketBy(8, "digest")
            .sortBy("digest")
            .mode("overwrite")
            .saveAsTable(t)
        )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        corpus, batch = spark.table(t_corpus), spark.table(t_batch)

        keep = corpus.groupBy("digest").agg(F.min("doc_id").alias("keeper"))
        fresh = batch.join(corpus.select("digest"), "digest", "left_anti")

        for df in (keep, fresh):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            assert "Exchange" not in plan, plan
            assert "Bucketed: true" in plan, plan

        # layout changes nothing semantically
        assert keep.count() == corpus.select("digest").distinct().count()
        want_fresh = (
            batch.join(
                F.broadcast(corpus.select("digest").distinct()), "digest", "left_anti"
            ).count()
        )
        assert fresh.count() == want_fresh
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql(f"DROP TABLE IF EXISTS {t_corpus}")
        spark.sql(f"DROP TABLE IF EXISTS {t_batch}")


def test_curated_corpus_readback_keeper_has_no_exchange(spark, sf_dir):
    """The r15 write-path contract, bucketing half: after
    pipeline_corpus_write_readback persists the mix bucketBy(8, digest),
    the read-back keeper rollup (groupBy digest) must aggregate IN PLACE
    over the bucketed scan — no Exchange anywhere in its plan — and an
    incremental anti-join keyed on digest alone must likewise need no
    shuffle on the corpus side."""
    from cdc_dedupe_spark.queries.pipeline_ops import _CURATED_TABLE
    from cdc_dedupe_spark.queries.registry import REGISTRY

    REGISTRY["pipeline_corpus_write_readback"].spark(spark, sf_dir).collect()

    rb = spark.table(_CURATED_TABLE).filter(F.col("lang") == "en")
    keep = rb.groupBy("digest").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc_id")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        keep.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan
