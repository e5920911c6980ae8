"""Hand-computed unit tests for the round-7 operators
(doc_pack_sequences, contamination_ngram, source_scorecard).

The oracle harness proves Spark == DuckDB; these prove both equal the
INTENDED semantics on inputs small enough to verify by hand — the guard
against a query and its oracle drifting together.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from cdc_dedupe_spark.queries import REGISTRY


def _write_documents(tmp_path, rows):
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


def test_pack_sequences_hand_computed(spark, tmp_path):
    """3 docs of 200/100/60 tokens; SEQ=256. Doc 0 spans [0,200) -> seq 0
    only; doc 1 spans [200,300) -> seqs 0-1 (straddles the 256 cut);
    doc 2 spans [300,360) -> seq 1 only."""
    rows = [
        (0, " ".join(["a"] * 200), "en", "s1"),
        (1, " ".join(["b"] * 100), "en", "s1"),
        (2, " ".join(["c"] * 60), "en", "s2"),
    ]
    sf = _write_documents(tmp_path, rows)
    got = {
        r.doc_id: (r.n_tokens, r.tok_start, r.seq_first, r.seq_last, r.straddles)
        for r in REGISTRY["doc_pack_sequences"].spark(spark, sf).collect()
    }
    assert got == {
        0: (200, 0, 0, 0, False),
        1: (100, 200, 0, 1, True),
        2: (60, 300, 1, 1, False),
    }


def test_pack_sequences_crosses_bucket_boundary(spark, tmp_path):
    """Docs on both sides of the 1000-id prefix-sum bucket boundary: the
    two-phase cumsum must be seamless — doc 1500's offset includes every
    earlier bucket's tokens."""
    rows = [
        (5, " ".join(["a"] * 10), "en", "s1"),
        (999, " ".join(["b"] * 20), "en", "s1"),
        (1500, " ".join(["c"] * 30), "en", "s1"),
        (2200, " ".join(["d"] * 40), "en", "s1"),
    ]
    sf = _write_documents(tmp_path, rows)
    got = {
        r.doc_id: r.tok_start
        for r in REGISTRY["doc_pack_sequences"].spark(spark, sf).collect()
    }
    assert got == {5: 0, 999: 10, 1500: 30, 2200: 60}


def test_contamination_hand_computed(spark, tmp_path):
    """doc 0 (eval: 0 % 29 == 0) has text identical to train doc 1 ->
    contamination 1.0; doc 29 (eval) shares no 5-gram with any train doc
    -> 0.0. Same-lang scoping: doc 58 (eval, lang de) matches a train doc
    only in lang en -> 0.0."""
    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (0, shared, "en", "s1"),            # eval, fully contained in doc 1
        (1, shared + " again", "en", "s1"),  # train superset
        (29, "zzzzz yyyyy xxxxx wwwww", "en", "s1"),  # eval, no overlap
        (58, shared, "de", "s1"),           # eval, but no de train docs
        (2, "unrelated filler words here", "en", "s1"),
    ]
    sf = _write_documents(tmp_path, rows)
    got = {
        r.doc_id: (r.n_contaminated == r.n_shingles, r.contamination_r)
        for r in REGISTRY["contamination_ngram"].spark(spark, sf).collect()
    }
    assert set(got) == {0, 29, 58}
    assert got[0] == (True, 1.0)
    assert got[29][1] == 0.0
    assert got[58][1] == 0.0


def test_source_scorecard_hand_computed(spark, tmp_path):
    """Two sources: s_dup holds docs 1/2 with identical text (doc 2 is the
    near-dup: Jaccard 1.0 vs lower-id doc 1 within the band) and doc 3
    distinct; s_clean holds one unrelated doc. Rates: s_dup 1/3, s_clean 0."""
    dup_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, dup_text, "en", "s_dup"),
        (2, dup_text, "en", "s_dup"),
        (3, "totally different words in this document body", "en", "s_dup"),
        (4, "pristine unique content nothing shared at all", "en", "s_clean"),
    ]
    sf = _write_documents(tmp_path, rows)
    got = {
        r.source: (r.n_docs, r.n_near_dup, r.near_dup_rate)
        for r in REGISTRY["source_scorecard"].spark(spark, sf).collect()
    }
    assert got["s_dup"][0] == 3 and got["s_dup"][1] >= 1
    assert got["s_clean"] == (1, 0, 0.0)
    # doc 2 (exact copy of doc 1) must be counted; docs 3/4 must not both
    # be flagged unless genuinely banded-similar (they are not)
    assert got["s_dup"][1] == 1 and got["s_dup"][2] == round(1 / 3, 4)
