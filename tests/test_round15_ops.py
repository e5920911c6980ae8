"""Round-15 operator tests: CCNet perplexity buckets, cross-doc CDC copy
detection, IRLS logistic regression, HITS hubs/authorities.

Each test is an INDEPENDENT pure-python twin (the test_round10_ops
discipline): recompute the contract with Counter/loops and require exact
equality, plus at least one semantic property the operator exists to
provide."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from cdc_dedupe_spark.queries.registry import REGISTRY


def _lm_scores(sf_dir):
    """Python twin of text_lm_bigram (already pinned by
    test_lm_bigram_independent_counter); returns doc_id -> score_ppm."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    c2: Counter = Counter()
    per_doc = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = text.split(" ")
        bgs = list(zip(toks, toks[1:]))
        if bgs:
            per_doc[doc_id] = bgs
            c2.update(bgs)
    c1: Counter = Counter()
    for (w1, _), n in c2.items():
        c1[w1] += n
    return (
        {
            d: math.floor(
                sum(math.floor(1e6 * c2[b] / c1[b[0]]) for b in bgs) / len(bgs)
            )
            for d, bgs in per_doc.items()
        },
        dict(zip(docs.doc_id, docs.lang)),
    )


def test_perplexity_buckets_independent_python(spark, sf_dir):
    """Threshold twin: t1/t2 are the ceil(n/3)/ceil(2n/3)-th smallest
    scores per language; buckets by <=t1 / <=t2 / else. Must equal the
    Spark output row-for-row."""
    scores, lang_of = _lm_scores(sf_dir)
    by_lang = defaultdict(list)
    for d, s in scores.items():
        by_lang[lang_of[d]].append(s)
    thresholds = {}
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
        thresholds[lang] = (vals[k1 - 1], vals[k2 - 1])

    def bucket(lang, s):
        t1, t2 = thresholds[lang]
        return "tail" if s <= t1 else ("middle" if s <= t2 else "head")

    expected = {
        d: (lang_of[d], s, bucket(lang_of[d], s)) for d, s in scores.items()
    }
    got = REGISTRY["text_perplexity_buckets"].spark(spark, sf_dir).collect()
    assert {r.doc_id: (r.lang, r.lm_score_ppm, r.ppl_bucket) for r in got} == expected


def test_perplexity_buckets_are_ordered_and_roughly_terciles(spark, sf_dir):
    """Semantic properties: within a language every head score strictly
    exceeds every middle score which strictly exceeds every tail score;
    the tail holds at least ceil(n/3) docs (ties fall low by contract);
    all three buckets are non-empty for any language with >= 3 distinct
    scores."""
    rows = REGISTRY["text_perplexity_buckets"].spark(spark, sf_dir).collect()
    by_lang = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_lang[r.lang][r.ppl_bucket].append(r.lm_score_ppm)
    for lang, bk in by_lang.items():
        n = sum(len(v) for v in bk.values())
        assert len(bk["tail"]) >= (n + 2) // 3
        if bk["middle"]:
            assert max(bk["tail"]) < min(bk["middle"])
        if bk["head"]:
            lower = bk["middle"] or bk["tail"]
            assert max(lower) < min(bk["head"])
        if len({r for v in bk.values() for r in v}) >= 3:
            assert bk["tail"] and bk["middle"] and bk["head"]


# ---------------------------------------------------------------------------
# dedup_cdc_cross_doc (r15)


def test_cdc_cross_doc_matches_python_reference(spark, sf_dir):
    """Pair-level twin: distinct chunk sets per doc (reusing the pinned
    pure-python CDC rule), boilerplate cap 16, containment >= 2500bp of
    the smaller set. Must equal the Spark output pair-for-pair."""
    import hashlib

    from tests.test_round11_stats_ml import _py_cdc_chunks

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sets = {
        r.doc_id: {
            hashlib.md5(c.encode()).hexdigest() for c in _py_cdc_chunks(r.text)
        }
        for r in docs.itertuples()
    }
    freq: Counter = Counter(h for hs in sets.values() for h in hs)
    pairable = {h for h, c in freq.items() if 2 <= c <= 16}
    owners = defaultdict(list)
    for d, hs in sets.items():
        for h in hs & pairable:
            owners[h].append(d)
    shared: Counter = Counter()
    for ds in owners.values():
        ds.sort()
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                shared[(a, b)] += 1
    expected = {}
    for (a, b), s in shared.items():
        na, nb = len(sets[a]), len(sets[b])
        bp = s * 10000 // min(na, nb)
        if bp >= 2500:
            expected[(a, b)] = (s, na, nb, bp)

    got = REGISTRY["dedup_cdc_cross_doc"].spark(spark, sf_dir).collect()
    assert {
        (r.doc_a, r.doc_b): (
            r.shared_chunks,
            r.n_chunks_a,
            r.n_chunks_b,
            r.containment_bp,
        )
        for r in got
    } == expected
    assert expected, "degenerate fixture: no copy pairs at this sf"
    for r in got:
        assert r.doc_a < r.doc_b
        assert 2500 <= r.containment_bp <= 10000
        assert r.shared_chunks <= min(r.n_chunks_a, r.n_chunks_b)
