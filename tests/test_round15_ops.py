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
    tail is always non-empty, and middle/head are non-empty exactly when
    the recomputed thresholds allow it (under heavy ties t1 can equal t2 —
    e.g. scores [1,1,1,1,2,3] give t1=t2=1 and an empty middle — so
    '>= 3 distinct scores implies all three non-empty' is NOT a property
    of the threshold contract; ADVICE r15)."""
    scores, lang_of = _lm_scores(sf_dir)
    vals_by_lang = defaultdict(list)
    for d, s in scores.items():
        vals_by_lang[lang_of[d]].append(s)
    thresholds = {}
    for lang, vals in vals_by_lang.items():
        vals.sort()
        n = len(vals)
        k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
        thresholds[lang] = (vals[k1 - 1], vals[k2 - 1])

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
        t1, t2 = thresholds[lang]
        assert bk["tail"]
        vmax = max(vals_by_lang[lang])
        assert bool(bk["middle"]) == (t1 < t2)
        assert bool(bk["head"]) == (t2 < vmax)


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


# ---------------------------------------------------------------------------
# ml_logreg_irls (r15)


def _py_irls(sf_dir, iters=3):
    """Pure-python twin of the declared IRLS contract (fast-sigmoid link,
    floor-1e6 quantized sufficient stats, Cramer solve, 6dp rounding)."""
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    y = (
        ((li.l_orderkey % 1000003) * 2654435761) % 1000
        < 100 + 16 * li.l_quantity.round().astype("int64")
    ).astype("int64")
    x1 = li.l_quantity.round().astype("int64")
    x2 = (li.l_discount * 100).round().astype("int64")
    rows = list(zip(y, x1, x2))
    b = [0.0, 0.0, 0.0]
    out = []
    for it in range(1, iters + 1):
        s = Counter()
        for yy, a1, a2 in rows:
            z = b[0] + b[1] * a1 + b[2] * a2
            p = 0.5 + 0.5 * z / (1.0 + abs(z))
            w = p * (1.0 - p)
            for key, t in (
                ("g00", w), ("g01", w * a1), ("g02", w * a2),
                ("g11", w * a1 * a1), ("g12", w * a1 * a2), ("g22", w * a2 * a2),
                ("r0", yy - p), ("r1", (yy - p) * a1), ("r2", (yy - p) * a2),
                ("sae", abs(yy - p)),
            ):
                s[key] += math.floor(1000000 * t)
        g = {k: s[k] / 1000000.0 for k in s}
        g00, g01, g02 = g["g00"], g["g01"], g["g02"]
        g11, g12, g22 = g["g11"], g["g12"], g["g22"]
        r0, r1, r2 = g["r0"], g["r1"], g["r2"]
        det = g00 * (g11 * g22 - g12 * g12) - g01 * (g01 * g22 - g12 * g02) + g02 * (
            g01 * g12 - g11 * g02
        )
        d = (
            r0 * (g11 * g22 - g12 * g12) - g01 * (r1 * g22 - g12 * r2) + g02 * (r1 * g12 - g11 * r2),
            g00 * (r1 * g22 - g12 * r2) - r0 * (g01 * g22 - g12 * g02) + g02 * (g01 * r2 - r1 * g02),
            g00 * (g11 * r2 - g12 * r1) - g01 * (g01 * r2 - r1 * g02) + r0 * (g01 * g12 - g11 * g02),
        )
        b = [round(b[j] + d[j] / det, 6) + 0.0 for j in range(3)]
        out.append((it, len(rows), b[0], b[1], b[2], s["sae"] // len(rows)))
    return out


def test_logreg_irls_matches_python_twin(spark, sf_dir):
    got = sorted(
        (r.iter, r.n, r.b0, r.b1, r.b2, r.mae_ppm)
        for r in REGISTRY["ml_logreg_irls"].spark(spark, sf_dir).collect()
    )
    assert got == _py_irls(sf_dir)


def test_logreg_irls_recovers_planted_signal(spark, sf_dir):
    """The label is planted with P(y=1|qty) = (100+16*qty)/1000 and NO
    discount dependence: the final iterate must have a clearly positive
    quantity coefficient, a near-zero discount coefficient, and the
    training MAE must improve on the w=0 model's 500000ppm."""
    rows = {r.iter: r for r in REGISTRY["ml_logreg_irls"].spark(spark, sf_dir).collect()}
    last = rows[max(rows)]
    assert rows[1].mae_ppm == 500000
    assert last.b1 > 0.02
    assert abs(last.b2) < last.b1 / 5
    assert last.mae_ppm < 450000
    # fitted probability rises across the quantity range
    def p(b, q):
        z = b.b0 + b.b1 * q
        return 0.5 + 0.5 * z / (1 + abs(z))
    assert p(last, 50) - p(last, 1) > 0.3


# ---------------------------------------------------------------------------
# graph_hits (r15)


def test_hits_matches_python_twin(spark, sf_dir):
    """Recompute two max-normalized HITS rounds in pure python from the
    declared k-NN edge set (itself oracle-pinned) and require exact
    integer equality; plus the semantic sanity that at least one node
    attains the 1e6 max on each axis and isolated-in-degree nodes sit
    at authority 0."""
    edges = [
        (r.vec_id, r.nbr_id)
        for r in REGISTRY["ann_knn_graph"].spark(spark, sf_dir).collect()
    ]
    nodes = set(
        pd.read_parquet(f"{sf_dir}/embeddings.parquet").vec_id.tolist()
    )

    def norm(scores):
        m = max(scores.values())
        return {v: scores.get(v, 0) * 1000000 // m for v in nodes}

    hub = {v: 1000000 for v in nodes}
    for _ in range(2):
        auth = defaultdict(int)
        for u, v in edges:
            auth[v] += hub[u]
        auth = norm(auth)
        hub = defaultdict(int)
        for u, v in edges:
            hub[u] += auth[v]
        hub = norm(hub)

    got = REGISTRY["graph_hits"].spark(spark, sf_dir).collect()
    assert {r.vec_id: (r.authority, r.hub) for r in got} == {
        v: (auth[v], hub[v]) for v in nodes
    }
    assert max(r.authority for r in got) == 1000000
    assert max(r.hub for r in got) == 1000000
    indeg = {v for _, v in edges}
    for r in got:
        if r.vec_id not in indeg:
            assert r.authority == 0


# ---------------------------------------------------------------------------
# text_tokenizer_fertility (r15)


def test_tokenizer_fertility_consistent_with_bpe_tokenize(spark, sf_dir):
    """Rollup twin: aggregate the (already oracle-pinned)
    text_bpe_tokenize per-doc counts by language in pandas and require
    exact equality, including the integer-div ratios; fertility must be
    >= 10000bp (a BPE segmentation never merges across whitespace, so it
    cannot emit fewer tokens than words)."""
    per_doc = REGISTRY["text_bpe_tokenize"].spark(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "lang", "n_chars"]
    ]
    j = per_doc.merge(docs, on="doc_id")
    exp = {}
    for lang, g in j.groupby("lang"):
        ws, bpe, ch = (
            int(g.n_tokens_ws.sum()),
            int(g.n_tokens_bpe.sum()),
            int(g.n_chars.sum()),
        )
        exp[lang] = (len(g), ws, bpe, bpe * 10000 // ws, ch * 1000 // bpe)
    got = REGISTRY["text_tokenizer_fertility"].spark(spark, sf_dir).collect()
    assert {
        r.lang: (r.n_docs, r.tokens_ws, r.tokens_bpe, r.fertility_bp, r.chars_per_bpe_milli)
        for r in got
    } == exp
    for r in got:
        assert r.fertility_bp >= 10000


# ---------------------------------------------------------------------------
# stats_ljung_box (r15)


def test_ljung_box_matches_numpy_twin(spark, sf_dir):
    """Recompute the textbook statistic with floats in numpy (no integer
    tricks) and require agreement to 1e-4 relative — pins that the
    n^2-scaled integer algebra really computes the classic sample ACF —
    plus exact equality of the integer columns and the decision flag,
    and a synthetic sanity: Q on a strongly trending series rejects."""
    import numpy as np

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["bucket"] = ev.ts.astype("datetime64[ns]").astype("int64") // (3600 * 10**9)
    got = {r.event_type: r for r in REGISTRY["stats_ljung_box"].spark(spark, sf_dir).collect()}
    assert set(got) == set(ev.event_type.unique())

    def lb(xs, h=3):
        xs = np.asarray(xs, dtype=float)
        n = len(xs)
        xc = xs - xs.mean()
        den = (xc * xc).sum()
        rhos = [(xc[:-k] * xc[k:]).sum() / den for k in range(1, h + 1)]
        q = n * (n + 2) * sum(r * r / (n - k) for k, r in zip(range(1, h + 1), rhos))
        return n, rhos, q

    for et, g in ev.groupby("event_type"):
        xs = g.groupby("bucket").size().sort_index().tolist()
        n, rhos, q = lb(xs)
        r = got[et]
        assert r.n == n
        for k, rho in enumerate(rhos, 1):
            assert abs(getattr(r, f"rho{k}") - rho) < 1e-4 * max(1, abs(rho))
        assert abs(r.q_lb - q) < 1e-3 * max(1.0, abs(q))
        assert r.white_noise_rejected == int(q > 7.814728)

    # trending series must reject whiteness under the same formula
    _, _, q_trend = lb(list(range(100)))
    assert q_trend > 7.814728


# ---------------------------------------------------------------------------
# pipeline_compaction_plan (r15)


def test_compaction_plan_matches_python_twin(spark, sf_dir):
    """Bin assignment twin: per (lang, source) payload rollup, sources in
    key order, bin = preceding-payload // 16384; every input appears in
    exactly one bin and per-bin audits equal the sum of their members.
    Also pins the packing guarantee: every bin except possibly a lang's
    LAST one reaches the target once its own payload is included."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    parts = (
        docs.groupby(["lang", "source"])
        .agg(n_docs=("doc_id", "size"), part_bytes=("n_chars", "sum"))
        .reset_index()
        .sort_values(["lang", "source"])
    )
    expected = {}
    for lang, g in parts.groupby("lang"):
        cum = 0
        for r in g.itertuples():
            expected[(lang, r.source)] = (
                int(r.n_docs),
                int(r.part_bytes),
                cum // 16384,
            )
            cum += int(r.part_bytes)

    got = REGISTRY["pipeline_compaction_plan"].spark(spark, sf_dir).collect()
    assert {
        (r.lang, r.source): (r.n_docs, r.part_bytes, r.bin_id) for r in got
    } == expected
    bins = defaultdict(lambda: [0, 0, 0])
    for r in got:
        b = bins[(r.lang, r.bin_id)]
        b[0] += 1
        b[1] += r.n_docs
        b[2] += r.part_bytes
    for r in got:
        assert (r.bin_inputs, r.bin_docs, r.bin_bytes) == tuple(bins[(r.lang, r.bin_id)])
    last = {lang: max(b for (l, b) in bins if l == lang) for lang, _ in bins}
    for (lang, bin_id), (_, _, by) in bins.items():
        if bin_id != last[lang]:
            assert by >= 1  # non-empty
    # greedy fill: a non-last bin's cumulative start is below (bin+1)*target
    # by construction; just require bins are consecutive from 0
    for lang in last:
        ids = sorted(b for (l, b) in bins if l == lang)
        assert ids == list(range(ids[-1] + 1))


# ---------------------------------------------------------------------------
# events_did_estimator (r15)


def test_did_estimator_matches_python_twin_and_recovers_lift(spark, sf_dir):
    """Cell moments recomputed in pure python with the same planted lift;
    exact equality on counts, 1e-6 agreement on the double chain, and the
    causal readback: the estimate sits within 4 SEs of the planted 8000
    cents and is flagged significant."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev.event_type == "purchase"].copy()
    day = ev.ts.astype("datetime64[ns]").astype("int64") // (86400 * 10**9)
    mid = (int(day.min()) + int(day.max()) + 1) // 2
    treat = ((ev.user_id % 1000003) * 2654435761) % 1000 < 500
    post = day >= mid
    cents = (ev.value * 100).round().astype("int64") + 8000 * (treat & post)
    cells = {}
    for c, mask in (
        ("tp", treat & post), ("tr", treat & ~post),
        ("cp", ~treat & post), ("cr", ~treat & ~post),
    ):
        x = cents[mask]
        cells[c] = (len(x), int(x.sum()), int((x.astype(object) ** 2).sum()))
    [r] = REGISTRY["events_did_estimator"].spark(spark, sf_dir).collect()
    assert (r.n_tp, r.n_tr, r.n_cp, r.n_cr) == tuple(cells[c][0] for c in ("tp", "tr", "cp", "cr"))
    means = {c: s / n for c, (n, s, _) in cells.items()}
    did = (means["tp"] - means["tr"]) - (means["cp"] - means["cr"])
    se = math.sqrt(
        sum(
            ((n * q - s * s) / (n * (n - 1))) / n
            for n, s, q in cells.values()
        )
    )
    assert abs(r.did_estimate - did) < 1e-6
    assert abs(r.se - se) < 1e-6
    for c in ("tp", "tr", "cp", "cr"):
        assert abs(getattr(r, f"mean_{c}") - means[c]) < 1e-6
    assert abs(r.did_estimate - 8000) < 4 * r.se
    assert r.significant == 1


# ---------------------------------------------------------------------------
# ml_gbdt_stumps (r15)


def test_gbdt_stumps_matches_python_twin(spark, sf_dir):
    """Full trajectory twin (histogram split search, quantized residual
    sums, Cramer-free L2 leaf values, 6dp model rounding) plus the
    planted-signal properties: boosting selects the signal feature x1
    every round and training MSE strictly decreases."""
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    y = (
        ((li.l_orderkey % 1000003) * 2654435761) % 1000
        < 100 + 16 * li.l_quantity.round().astype("int64")
    ).astype("int64")
    x = {
        "x1": li.l_quantity.round().astype("int64").tolist(),
        "x2": (li.l_discount * 100).round().astype("int64").tolist(),
    }
    y = y.tolist()
    n = len(y)
    b0 = round(sum(y) / n, 6) + 0.0
    stumps = []

    def resid(i):
        # mirror the engines' left-associated subtraction chain:
        # ((y - b0) - term1) - term2 differs from y - (b0 + t1 + t2) in FP
        r = float(y[i]) - b0
        for f, t, vl, vr in stumps:
            r -= vl if x[f][i] <= t else vr
        return r

    expected = []
    for rnd in range(1, 4):
        q = [math.floor(1000000 * resid(i)) for i in range(n)]
        q2 = [math.floor(1000000 * resid(i) * resid(i)) for i in range(n)]
        s_tot, n_tot = sum(q), n
        best = None
        for f in ("x1", "x2"):
            hist = defaultdict(lambda: [0, 0])
            for i in range(n):
                h = hist[x[f][i]]
                h[0] += 1
                h[1] += q[i]
            n_l = s_l = 0
            for val in sorted(hist):
                n_l += hist[val][0]
                s_l += hist[val][1]
                n_r, s_r = n_tot - n_l, s_tot - s_l
                if n_r <= 0:
                    continue
                # mirror the declared chain: cast each sum to double BEFORE
                # multiplying (exact-int products round differently)
                gain = (
                    float(s_l) * float(s_l) / float(n_l)
                    + float(s_r) * float(s_r) / float(n_r)
                    - float(s_tot) * float(s_tot) / float(n_tot)
                )
                key = (-gain, f, val)
                if best is None or key < best[0]:
                    best = (key, f, val, n_l, s_l, n_r, s_r, gain)
        _, f, t, n_l, s_l, n_r, s_r, gain = best
        vl = round(0.5 * (float(s_l) / float(n_l) / 1000000.0), 6) + 0.0
        vr = round(0.5 * (float(s_r) / float(n_r) / 1000000.0), 6) + 0.0
        expected.append(
            (rnd, f, t, round(gain / 1e12, 6) + 0.0, vl, vr, sum(q2) // n)
        )
        stumps.append((f, t, vl, vr))

    got = sorted(
        (r.round, r.feat, r.threshold, r.gain, r.v_left, r.v_right, r.mse_ppm)
        for r in REGISTRY["ml_gbdt_stumps"].spark(spark, sf_dir).collect()
    )
    assert got == expected
    assert all(r[1] == "x1" for r in got), "null-control feature selected"
    mses = [r[6] for r in got]
    assert mses == sorted(mses, reverse=True) and mses[0] > mses[-1]
    gains = [r[3] for r in got]
    assert all(g > 0 for g in gains)


# ---------------------------------------------------------------------------
# pipeline_zorder_layout (r15)


def test_zorder_layout_matches_python_twin_and_skips_more(spark, sf_dir):
    """Morton interleave + zone maps recomputed in pure python; exact
    equality. THE claim of the operator: the Z layout's zone maps skip
    strictly more files than the linear (price-sorted) layout on the
    qty BETWEEN 10 AND 20 probe, while no row is lost (bin sizes sum to
    2x corpus)."""
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    # SQL round() is half-away-from-zero; pandas .round() is banker's
    qty = (li.l_quantity + 0.5).astype("int64").tolist()
    price = (li.l_extendedprice + 0.5).astype("int64").tolist()

    def morton(a, b):
        z = 0
        for i in range(10):
            z += ((a >> i) & 1) << (2 * i + 1)
            z += ((b >> i) & 1) << (2 * i)
        return z

    cells = defaultdict(lambda: [0, None, None, None, None])
    for q, p in zip(qty, price):
        d1 = ((q - 1) * 1023) // 49
        d2 = (p * 1023) // 105000
        for layout, b in (("zorder", morton(d1, d2) // 16384), ("linear", d2 // 16)):
            c = cells[(layout, b)]
            c[0] += 1
            c[1] = q if c[1] is None else min(c[1], q)
            c[2] = q if c[2] is None else max(c[2], q)
            c[3] = p if c[3] is None else min(c[3], p)
            c[4] = p if c[4] is None else max(c[4], p)

    got = REGISTRY["pipeline_zorder_layout"].spark(spark, sf_dir).collect()
    assert {
        (r.layout, r.bin): [r.n_rows, r.min_qty, r.max_qty, r.min_price, r.max_price]
        for r in got
    } == dict(cells)
    skips = Counter()
    for r in got:
        assert r.skip_qty_10_20 == int(r.min_qty > 20 or r.max_qty < 10)
        skips[r.layout] += r.skip_qty_10_20
    assert skips["zorder"] > skips["linear"]
    assert sum(r.n_rows for r in got) == 2 * len(li)


# ---------------------------------------------------------------------------
# multimodal_ahash_neardup (r15)


def test_ahash_neardup_matches_python_twin_and_full_recall(spark, sf_dir):
    """Signature + banded candidates + hamming filter recomputed in pure
    python; exact pair-set equality. Plus THE perceptual claim: every
    planted single-byte-corrupted variant pairs with its original
    (pigeonhole recall at the declared radius is exact), and no pair
    exceeds the radius."""
    B, BANDS, BB, MAXH, OFF, MOD = 55, 5, 11, 4, 10_000_000, 17
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def ahash(t):
        n = len(t)
        vals = [ord(c) for c in t]
        s = sum(vals)
        h = 0
        for k in range(1, B + 1):
            lo, hi = (k - 1) * n // B, k * n // B
            bs = sum(vals[lo:hi])
            if bs * n > s * (hi - lo):
                h |= 1 << (k - 1)
        return h

    assets = {}
    prov = {}  # asset_id -> (src_doc, is_var): the explicit fixture label
    for r in docs.itertuples():
        if len(r.text) < B:
            continue
        assets[r.doc_id] = ahash(r.text)
        prov[r.doc_id] = (r.doc_id, 0)
        if r.doc_id % MOD == 3:
            m = len(r.text) // 2
            assets[r.doc_id + OFF] = ahash(r.text[:m] + "~" + r.text[m + 1 :])
            prov[r.doc_id + OFF] = (r.doc_id, 1)

    buckets = defaultdict(list)
    for aid, h in assets.items():
        for b in range(BANDS):
            buckets[(b, (h >> (b * BB)) & ((1 << BB) - 1))].append(aid)
    expected = {}
    for ids in buckets.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                ham = bin(assets[a] ^ assets[b]).count("1")
                if ham <= MAXH:
                    # planted = same source doc, one side is the variant —
                    # carried explicitly, not inferred from id arithmetic
                    planted = int(
                        prov[a][0] == prov[b][0] and prov[a][1] != prov[b][1]
                    )
                    expected[(a, b)] = (ham, planted)

    got = REGISTRY["multimodal_ahash_neardup"].spark(spark, sf_dir).collect()
    assert {
        (r.asset_a, r.asset_b): (r.hamming, r.is_planted_variant) for r in got
    } == expected
    planted = {d for d in assets if d >= OFF}
    assert planted, "fixture produced no variants"
    found = {r.asset_b for r in got if r.is_planted_variant == 1}
    # exact recall: every planted variant within the radius MUST be found;
    # the fixture's corruption never exceeds the radius on this corpus
    for v in planted:
        ham = bin(assets[v] ^ assets[v - OFF]).count("1")
        assert ham <= MAXH, f"fixture drifted: variant {v} at hamming {ham}"
        assert v in found
    for r in got:
        assert r.hamming <= MAXH and r.asset_a < r.asset_b


# ---------------------------------------------------------------------------
# stream_quantile_histogram (r15)


def test_stream_quantile_histogram_matches_python_twin(spark, sf_dir):
    """Histogram + rank lookup recomputed in pure python from the raw
    events; exact equality on bucket bounds and counts, and the declared
    audit holds: both quantiles sit within one bucket width of the exact
    interpolated percentile (flags MUST be 1 on this corpus — a 0 flag
    means the bucketing drifted)."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    got = {r.event_type: r for r in REGISTRY["stream_quantile_histogram"].spark(spark, sf_dir).collect()}
    for et, g in ev.groupby("event_type"):
        cents = (g.value * 100 + 0.5).astype("int64")
        counts = Counter(min(c // 25, 4000) for c in cents)
        n = len(cents)

        def bucket_at(k):
            cum = 0
            for pos in sorted(counts):
                cum += counts[pos]
                if cum >= k:
                    return pos
            raise AssertionError

        k50l, k95l = (n - 1) // 2 + 1, (19 * (n - 1)) // 20 + 1
        b50l, b50h = bucket_at(k50l), bucket_at(min(k50l + 1, n))
        b95l, b95h = bucket_at(k95l), bucket_at(min(k95l + 1, n))
        r = got[et]
        assert (r.n, r.p50_lo_cents, r.p50_hi_cents) == (n, b50l * 25, b50h * 25 + 24)
        assert (r.p95_lo_cents, r.p95_hi_cents) == (b95l * 25, b95h * 25 + 24)
        s = sorted(cents)
        # the hard invariant: both anchor order statistics inside the bounds,
        # therefore the interpolated exact percentile too -> flags always 1
        assert r.p50_lo_cents <= s[k50l - 1] <= r.p50_hi_cents
        assert r.p95_lo_cents <= s[k95l - 1] <= r.p95_hi_cents
        assert r.p50_lo_cents <= r.p50_exact <= r.p50_hi_cents
        assert r.p95_lo_cents <= r.p95_exact <= r.p95_hi_cents
        assert r.p50_within_bucket == 1 and r.p95_within_bucket == 1


# ---------------------------------------------------------------------------
# stats_cramers_v_matrix (r15)


def test_cramers_v_matches_scipy_free_twin(spark, sf_dir):
    """Recompute chi2 and V from raw contingency tables in pure python
    (no quantization) and require 1e-5 agreement — pins that the
    quantized cell sum really computes the textbook statistic — plus
    range and symmetry-of-definition properties."""
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    cols = {
        "retflag": li.l_returnflag,
        "linestatus": li.l_linestatus,
        "qty_band": (li.l_quantity + 0.5).astype("int64") // 10,
        "disc_band": (li.l_discount * 100 + 0.5).astype("int64") // 3,
    }
    got = {
        (r.var_x, r.var_y): r
        for r in REGISTRY["stats_cramers_v_matrix"].spark(spark, sf_dir).collect()
    }
    names = list(cols)
    n = len(li)
    import itertools

    for a, b in itertools.combinations(names, 2):
        tab = Counter(zip(cols[a], cols[b]))
        rm = Counter(cols[a])
        cm = Counter(cols[b])
        chi2 = n * (
            sum(o * o / (rm[x] * cm[y]) for (x, y), o in tab.items()) - 1.0
        )
        v = math.sqrt(chi2 / (n * (min(len(rm), len(cm)) - 1)))
        r = got[(a, b)]
        assert (r.n, r.rc, r.cc) == (n, len(rm), len(cm))
        assert abs(r.chi2 - chi2) < 1e-3
        assert abs(r.cramers_v - v) < 1e-5
        assert 0.0 <= r.cramers_v <= 1.0
    assert len(got) == 6


# ---------------------------------------------------------------------------
# ml_calibration_reliability (r15)


def test_calibration_matches_python_twin(spark, sf_dir):
    """Score every row with the _py_irls final model, bin, and compare
    exactly. Properties: predicted ppm increases with bin, bin counts
    cover the corpus, and the BULK bins (>= 5% of rows) calibrate within
    5 percentage points on this planted-linear-probability corpus."""
    traj = _py_irls(sf_dir)
    _, _, b0, b1, b2, _ = traj[-1]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    y = (
        ((li.l_orderkey % 1000003) * 2654435761) % 1000
        < 100 + 16 * li.l_quantity.round().astype("int64")
    ).astype("int64").tolist()
    x1 = li.l_quantity.round().astype("int64").tolist()
    x2 = (li.l_discount * 100).round().astype("int64").tolist()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for yy, a1, a2 in zip(y, x1, x2):
        z = b0 + b1 * a1 + b2 * a2
        p = 0.5 + 0.5 * z / (1.0 + abs(z))
        b = min(int(math.floor(p * 10)), 9)
        c = agg[b]
        c[0] += 1
        c[1] += math.floor(1000000 * p)
        c[2] += yy
        c[3] += math.floor(1000000 * (yy - p) * (yy - p))
    expected = {
        b: (n, pq // n, 1000000 * sy // n, abs(pq // n - 1000000 * sy // n), bq // n)
        for b, (n, pq, sy, bq) in agg.items()
    }
    got = REGISTRY["ml_calibration_reliability"].spark(spark, sf_dir).collect()
    assert {
        r.bin: (r.n, r.pred_ppm, r.obs_ppm, r.gap_ppm, r.brier_ppm) for r in got
    } == expected
    total = sum(r.n for r in got)
    assert total == len(y)
    by_bin = sorted(got, key=lambda r: r.bin)
    preds = [r.pred_ppm for r in by_bin]
    assert preds == sorted(preds)
    ece = sum(r.n * r.gap_ppm for r in got) / total
    assert ece <= 60_000, ece
    for r in by_bin:
        if r.n >= total // 20:
            assert r.gap_ppm <= 120_000, (r.bin, r.gap_ppm)


# ---------------------------------------------------------------------------
# pipeline_snapshot_diff (r15)


def test_snapshot_diff_exact_membership(spark, sf_dir):
    """The planted fixture fully determines the diff: added = doc_id %
    20 == 3, changed = the remaining doc_id % 30 == 5 (one char shorter
    yesterday), removed = none; byte columns reflect the revision."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ids = set(docs.doc_id)
    nlen = dict(zip(docs.doc_id, docs.text.str.len()))
    added = {d for d in ids if d % 20 == 3}
    changed = {d for d in ids if d % 30 == 5 and d not in added}
    got = REGISTRY["pipeline_snapshot_diff"].spark(spark, sf_dir).collect()
    by_status = defaultdict(set)
    for r in got:
        by_status[r.status].add(r.doc_id)
    assert by_status["added"] == added
    assert by_status["changed"] == changed
    assert not by_status["removed"]
    for r in got:
        if r.status == "added":
            assert (r.bytes_before, r.bytes_after) == (0, nlen[r.doc_id])
        elif r.status == "changed":
            assert (r.bytes_before, r.bytes_after) == (
                nlen[r.doc_id] - 1,
                nlen[r.doc_id],
            )
    assert added and changed, "degenerate fixture"
