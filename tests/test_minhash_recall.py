"""Recall cross-check between the two MinHash near-dup variants
(VERDICT r6 'Next round' #7).

``dedup_near_minhash`` (queries/llm.py) uses spark.ml's RNG-seeded
MinHashLSH, so its buckets are Spark-hash-family specific and the query is
declared rows-only — no engine-independent oracle exists. This test bounds
it empirically instead: the docs that ``dedup_minhash_exact`` (the
fixed-hash-family, oracle-exact twin, queries/llm_ext.py) identifies as
near-certain duplicates (signature agreement >= 0.99 with a lower-id
partner) must be flagged ``is_dup`` by the spark.ml variant with recall
>= 0.9 at sf0.01 — converting the weakest rows-only entry into one with a
measured quality floor.
"""

from __future__ import annotations

import pytest

from cdc_dedupe_spark.queries import REGISTRY

SF001 = "/root/testdata/sf0.01"


@pytest.mark.slow
def test_near_minhash_recall_vs_exact_twin(spark):
    exact = REGISTRY["dedup_minhash_exact"].spark(spark, SF001)
    # Near-certain duplicates: >= 0.99 signature agreement (all 8 mins
    # equal) with a lower-id partner -> the doc is not the keeper.
    dup_docs = {
        r.doc_b
        for r in exact.filter("minhash_sim >= 0.99").select("doc_b").distinct().collect()
    }
    assert len(dup_docs) >= 20, (
        f"degenerate check: only {len(dup_docs)} near-certain dups at sf0.01; "
        "the synthetic corpus should contain many"
    )

    near = REGISTRY["dedup_near_minhash"].spark(spark, SF001)
    flagged = {r.doc_id for r in near.filter("is_dup").select("doc_id").collect()}

    hit = len(dup_docs & flagged)
    recall = hit / len(dup_docs)
    assert recall >= 0.9, (
        f"spark.ml MinHashLSH recall {recall:.3f} ({hit}/{len(dup_docs)}) "
        "against the exact twin's near-certain duplicates"
    )
