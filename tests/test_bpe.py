"""text_bpe_train_k / text_bpe_tokenize contracts (r15): the parity sweep
pins cross-engine agreement; these pin the SEMANTICS against an
independent pure-Python reference implementation of the same rule, the
reassembly invariant, and the vocab-only plan shape."""

from __future__ import annotations

import collections

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cdc_dedupe_spark.queries.registry import REGISTRY
from cdc_dedupe_spark.queries.stats_ml import _BPE_K


# --- independent reference: same declared rule, plain Python ---------------


def _ref_merge(syms, a, b):
    """Non-overlap merge of pair (a, b), a != b: matches are provably
    disjoint, so merge every (a, b) adjacency left to right."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(words, k):
    """words: list of raw words (with repetition). Returns (merge table
    rows, final word->symbols map)."""
    counts = collections.Counter(words)
    vocab = {w: [c for c in w] for w in counts}
    merges = []
    for rank in range(1, k + 1):
        pair_n = collections.Counter()
        for w, syms in vocab.items():
            for x, y in zip(syms, syms[1:]):
                if x != y:
                    pair_n[(x, y)] += counts[w]
        if not pair_n:
            break
        (a, b), n = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, n))
        vocab = {w: _ref_merge(s, a, b) for w, s in vocab.items()}
    return merges, vocab


def _write_docs(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s1"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_bpe_train_matches_reference(spark, tmp_path):
    """The Sennrich classroom corpus: K ranked merges must equal an
    independent Python implementation of the declared rule — including
    the (n DESC, a, b) tie-break and the re-ranking over REWRITTEN
    symbols (later ranks select multi-char symbols earlier ranks made,
    which a one-shot pair count can never produce)."""
    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "widest widest widest",
    ]
    sf = _write_docs(tmp_path, texts)
    got = [
        (r.rank, r.pair_a, r.pair_b, r.merged, r.n)
        for r in REGISTRY["text_bpe_train_k"].spark(spark, sf).orderBy("rank").collect()
    ]
    want, _ = _ref_train(" ".join(texts).split(" "), _BPE_K)
    assert got == want
    # the rule really iterated: some later merge uses a merged symbol
    assert any(len(a) > 1 or len(b) > 1 for _, a, b, _, _ in want[1:])


def test_bpe_tokenize_matches_reference_counts(spark, tmp_path):
    texts = ["low lower lowest", "newest new low low", "wide widest wider"]
    sf = _write_docs(tmp_path, texts)
    _, vocab = _ref_train(" ".join(texts).split(" "), _BPE_K)
    out = {r.doc_id: r for r in REGISTRY["text_bpe_tokenize"].spark(spark, sf).collect()}
    for doc_id, text in enumerate(texts):
        words = text.split(" ")
        want_bpe = sum(len(vocab[w]) for w in words)
        r = out[doc_id]
        assert (r.n_tokens_ws, r.n_tokens_bpe) == (len(words), want_bpe)
        assert r.bpe_per_ws_bp == want_bpe * 10000 // len(words)
        assert r.n_chunks_bpe == -(-want_bpe // 16)


def test_bpe_merges_reassemble_to_words(spark, sf_dir):
    """Invariant on the real corpus: concatenating a word's symbols
    after K merges must restore the word byte-identically — merges
    re-segment, never rewrite."""
    from cdc_dedupe_spark.queries.stats_ml import _bpe_stages, _bpe_vocab

    v, _ = _bpe_stages(_bpe_vocab(spark, sf_dir))
    bad = v.filter(F.array_join("s", "") != F.col("word")).count()
    assert bad == 0
    # and at least one real merge happened at corpus scale
    assert v.filter(F.size("s") < F.length("word")).count() > 0


def test_bpe_tokenize_plan_is_vocab_only(spark, sf_dir):
    """Plan pin (VERDICT r14 #3): the apply join must BROADCAST the
    Heaps'-bounded word->length table onto the token explode — document
    text is never rewritten, and the doc-side rows never reshuffle for
    the join."""
    df = REGISTRY["text_bpe_tokenize"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin [word" in plan or "BroadcastHashJoin [coalesce(word" in plan, plan[:2000]


def test_bpe_stages_scope_restores_codegen_conf(spark, sf_dir):
    """Conf hygiene: building the train loop must leave the session's
    whole-stage-codegen setting untouched (r20 reverted the r19 scoped
    codegen-off — driver bench regressed the family, VERDICT r19 #1 —
    so this now also pins that no stray scope reappears)."""
    from cdc_dedupe_spark.queries.stats_ml import _bpe_stages, _bpe_vocab

    conf = "spark.sql.codegen.wholeStage"
    prev = spark.conf.get(conf, None)
    v, merges = _bpe_stages(_bpe_vocab(spark, sf_dir))
    assert spark.conf.get(conf, None) == prev
    # and the loop's frames still evaluate (the scope only covered planning)
    assert v.count() > 0
