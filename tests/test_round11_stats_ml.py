"""Round-11 stats/ML operator units: independent pure-Python reference
implementations for the six stats_ml queries, run against the sf0.001
corpus. The DuckDB oracle twins are pinned by the sweep /
test_oracle_parity; these recompute the SAME answers from first
principles (hashlib md5, collections.Counter folds, math.log) so a
shared misconception between the two SQL twins cannot hide.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd
import pyarrow.parquet as pq
import pytest

from cdc_dedupe_spark.queries import REGISTRY


def _lineitem(sf_dir):
    return pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()


def _docs(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()


def _events(sf_dir):
    df = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[ns]").astype("int64") // 1000
    return df


def _pyround(x):
    """Python's round() is banker's; the engines round half away from
    zero. Only relevant for exact .5 doubles (quantity/price are .00/.5x
    money values so it matters)."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_ml_linreg_normal_matches_moment_fit(spark, sf_dir):
    li = _lineitem(sf_dir)
    got = {r.l_returnflag: r for r in REGISTRY["ml_linreg_normal"].spark(spark, sf_dir).toPandas().itertuples()}
    for flag, g in li.groupby("l_returnflag"):
        x = [_pyround(v) for v in g["l_quantity"]]
        y = [_pyround(v) for v in g["l_extendedprice"]]
        n = len(x)
        sx, sy = sum(x), sum(y)
        sxx = sum(a * a for a in x)
        sxy = sum(a * b for a, b in zip(x, y))
        syy = sum(b * b for b in y)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        deny = n * syy - sy * sy
        r = got[flag]
        assert r.n == n
        assert r.slope == pytest.approx(num / den, abs=2e-6)
        assert r.intercept == pytest.approx((sy * sxx - sx * sxy) / den, abs=2e-6)
        assert r.r2 == pytest.approx((num * num) / (den * deny), abs=2e-6)
        # this corpus draws price independently of quantity, so the fit
        # is honest-but-weak: r2 is tiny but must stay a valid ratio
        assert 0.0 <= r.r2 <= 1.0


def test_stats_corr_matrix_matches_numpy(spark, sf_dir):
    import numpy as np

    li = _lineitem(sf_dir)
    feats = {
        "qty": [_pyround(v) for v in li["l_quantity"]],
        "price": [_pyround(v) for v in li["l_extendedprice"]],
        "disc": [_pyround(v * 100) for v in li["l_discount"]],
        "tax": [_pyround(v * 100) for v in li["l_tax"]],
    }
    got = REGISTRY["stats_corr_matrix"].spark(spark, sf_dir).toPandas()
    assert len(got) == 6  # upper triangle of a 4x4, diagonal excluded
    for r in got.itertuples():
        expect = np.corrcoef(feats[r.var_x], feats[r.var_y])[0, 1]
        assert r.corr == pytest.approx(expect, abs=2e-6), (r.var_x, r.var_y)
        assert r.n == len(li)
    # all measures are drawn independently in this corpus: correlations
    # are small but must be valid (and exactly the numpy values above)
    assert all(-1.0 <= r.corr <= 1.0 for r in got.itertuples())


def test_sample_reservoir_topk_is_min_hash_order(spark, sf_dir):
    li = _lineitem(sf_dir)
    ranked = sorted(
        (
            hashlib.md5(f"{r.l_orderkey}#{r.l_linenumber}".encode()).hexdigest(),
            r.l_orderkey,
            r.l_linenumber,
        )
        for r in li.itertuples()
    )
    expect = ranked[:200]
    got = REGISTRY["sample_reservoir_topk"].spark(spark, sf_dir).toPandas()
    assert len(got) == 200
    assert [(r.rk, r.l_orderkey, r.l_linenumber) for r in got.itertuples()] == expect


def test_text_bpe_merge_pairs_matches_counter(spark, sf_dir):
    docs = _docs(sf_dir)
    words = Counter()
    for t in docs["text"]:
        words.update(w for w in t.split(" ") if len(w) >= 2)
    pairs = Counter()
    for w, c in words.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += c
    expect = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:32]
    got = REGISTRY["text_bpe_merge_pairs"].spark(spark, sf_dir).toPandas()
    assert [(r.pair, r.n) for r in got.itertuples()] == expect


def test_ts_holt_linear_matches_sequential_fold(spark, sf_dir):
    ev = _events(sf_dir)
    ev["bucket"] = ev["ts_us"] // 3_600_000_000 * 3_600_000_000
    got = {r.event_type: r for r in REGISTRY["ts_holt_linear"].spark(spark, sf_dir).toPandas().itertuples()}
    for etype, g in ev.groupby("event_type"):
        xs = [float(c) for _, c in sorted(Counter(g["bucket"]).items())]
        if len(xs) < 2:
            assert etype not in got
            continue
        l, t = xs[0], xs[1] - xs[0]
        for x in xs[2:]:
            l_new = (x + l + t) / 2
            t_new = ((l_new - l) + t) / 2
            l, t = l_new, t_new
        r = got[etype]
        assert r.n_buckets == len(xs)
        assert r.level == pytest.approx(l, abs=2e-6)
        assert r.trend == pytest.approx(t, abs=2e-6)
        assert r.forecast == pytest.approx(l + t, abs=2e-6)


def test_ml_nb_classify_matches_pure_python(spark, sf_dir):
    docs = _docs(sf_dir)
    tokens = {
        r.doc_id: [w for w in r.text.split(" ") if w]
        for r in docs.itertuples()
    }
    lang_of = dict(zip(docs["doc_id"], docs["lang"]))
    ct: Counter = Counter()
    for d, toks in tokens.items():
        for w in toks:
            ct[(lang_of[d], w)] += 1
    vocab = len({w for _, w in ct})
    tot = Counter()
    for (c, _), k in ct.items():
        tot[c] += k
    nd = Counter(docs["lang"])
    n_all = len(docs)
    langs = sorted(nd)

    def micro(x: float) -> int:
        return _pyround(math.log(x) * 1_000_000)

    prior = {c: micro(nd[c] / n_all) for c in langs}
    dflt = {c: micro(1.0 / (tot[c] + vocab)) for c in langs}
    lp = {(c, w): micro((k + 1) / (tot[c] + vocab)) for (c, w), k in ct.items()}
    confusion: Counter = Counter()
    for d, toks in tokens.items():
        counts = Counter(toks)
        best = min(
            (
                -(prior[c] + sum(k * lp.get((c, w), dflt[c]) for w, k in counts.items())),
                c,
            )
            for c in langs
        )
        confusion[(lang_of[d], best[1])] += 1
    got = REGISTRY["ml_nb_classify"].spark(spark, sf_dir).toPandas()
    assert {(r.lang_true, r.lang_pred): r.n_docs for r in got.itertuples()} == dict(confusion)
    # the word soup is language-agnostic at sf0.001 scale, but every doc
    # must be classified exactly once
    assert sum(confusion.values()) == n_all


def test_text_zipf_slope_matches_pure_python(spark, sf_dir):
    docs = _docs(sf_dir)
    words = Counter()
    for t in docs["text"]:
        words.update(w for w in t.split(" ") if w)
    ranked = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    xs = [_pyround(math.log(i + 1) * 1_000_000) for i in range(len(ranked))]
    ys = [_pyround(math.log(c) * 1_000_000) for _, c in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(a * a for a in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    syy = sum(b * b for b in ys)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    got = REGISTRY["text_zipf_slope"].spark(spark, sf_dir).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r.n_ranks == n
    assert r.slope == pytest.approx(num / den, abs=2e-6)
    assert r.intercept_ln == pytest.approx((sy * sxx - sx * sxy) / den / 1e6, abs=2e-6)
    assert r.r2 == pytest.approx(num * num / (den * (n * syy - sy * sy)), abs=2e-6)
    assert r.slope < 0  # frequency decreases with rank, by construction


def test_events_cusum_changepoint_matches_sequential_scan(spark, sf_dir):
    ev = _events(sf_dir)
    ev["bucket"] = ev["ts_us"] // 3_600_000_000 * 3_600_000_000
    got = {r.event_type: r for r in REGISTRY["events_cusum_changepoint"].spark(spark, sf_dir).toPandas().itertuples()}
    for etype, g in ev.groupby("event_type"):
        buckets = sorted(Counter(g["bucket"]).items())
        nb = len(buckets)
        tot = sum(c for _, c in buckets)
        s, smax, at = 0, -1, 0
        for bu, c in buckets:
            s = max(0, s + (nb * c - tot))
            if s > smax:
                smax, at = s, bu
        r = got[etype]
        assert r.n_buckets == nb
        assert r.cusum_peak == smax
        assert r.peak_bucket_us == at
        assert r.peak_norm == pytest.approx(smax / nb, abs=2e-6)


def test_graph_cc_sizes_is_a_partition_of_the_nodes(spark, sf_dir):
    """Census invariants vs the cluster labels it rolls up: sizes
    partition the node set exactly, singleton keepers dominate, and the
    census totals equal the label-table totals."""
    labels = REGISTRY["dedup_embed_cluster"].spark(spark, sf_dir).toPandas()
    census = REGISTRY["graph_cc_sizes"].spark(spark, sf_dir).toPandas()
    by_size = labels.groupby("cluster_id").size().value_counts().sort_index()
    assert {int(r.size): int(r.n_components) for r in census.itertuples()} == {
        int(s): int(c) for s, c in by_size.items()
    }
    assert census["n_nodes"].sum() == len(labels)
    assert (census["n_nodes"] == census["size"] * census["n_components"]).all()


def test_agg_quantile_2pass_matches_sorted_selection(spark, sf_dir):
    li = _lineitem(sf_dir)
    vs = sorted(_pyround(v * 100) for v in li["l_extendedprice"])
    n = len(vs)
    got = {r.qpct: r for r in REGISTRY["agg_quantile_2pass"].spark(spark, sf_dir).toPandas().itertuples()}
    assert set(got) == {50, 90, 99}
    for qpct, r in got.items():
        k = -((-qpct * n) // 100)  # ceil(q*n)
        assert r.rank_k == k
        assert r.value_cents == vs[k - 1]
    assert got[50].value_cents <= got[90].value_cents <= got[99].value_cents


def test_stream_cusum_alert_matches_naive_sequential_fold(spark, sf_dir):
    """The streaming stateful CUSUM (vectorized prefix identity +
    cross-batch state) must equal the naive one-row-at-a-time fold."""
    from cdc_dedupe_spark.queries.streaming import _CUSUM_H, _CUSUM_TARGET

    ev = _events(sf_dir).sort_values(["ts_us", "event_id"])
    got = {r.event_type: r for r in REGISTRY["stream_cusum_alert"].spark(spark, sf_dir).toPandas().itertuples()}
    for etype, g in ev.groupby("event_type"):
        s = smax = alerts = 0
        first_us = 0
        for r in g.itertuples():
            s = max(0, s + (_pyround(r.value * 100) - _CUSUM_TARGET))
            smax = max(smax, s)
            if s >= _CUSUM_H:
                alerts += 1
                if first_us == 0:
                    first_us = int(r.ts_us)
        o = got[etype]
        assert (o.n_events, o.cusum_final, o.cusum_peak, o.alerts, o.first_alert_us) == (
            len(g), s, smax, alerts, first_us
        ), etype


def test_stats_chi2_independence_matches_scipy_free_python(spark, sf_dir):
    ev = _events(sf_dir)
    ev["hod"] = ev["ts_us"] // 3_600_000_000 % 24
    obs = Counter(zip(ev["event_type"], ev["hod"]))
    rt = Counter(ev["event_type"])
    ct = Counter(ev["hod"])
    n = len(ev)
    micro = 0
    for (e, h), o in obs.items():
        num = n * o - rt[e] * ct[h]
        micro += _pyround((num * num) / (n * rt[e] * ct[h]) * 1_000_000)
    chi2 = micro / 1e6
    got = REGISTRY["stats_chi2_independence"].spark(spark, sf_dir).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r.n == n
    assert r.dof == (len(rt) - 1) * (len(ct) - 1)
    assert r.chi2 == pytest.approx(chi2, abs=2e-6)
    assert r.cramers_v == pytest.approx(
        math.sqrt(chi2 / (n * (min(len(rt), len(ct)) - 1))), abs=2e-6
    )
    assert 0.0 <= r.cramers_v <= 1.0


def test_stats_ks_two_sample_matches_bruteforce_ecdf(spark, sf_dir):
    ev = _events(sf_dir)
    a = sorted(_pyround(v * 100) for v in ev[ev.event_type == "click"]["value"])
    b = sorted(_pyround(v * 100) for v in ev[ev.event_type == "purchase"]["value"])
    n1, n2 = len(a), len(b)
    import bisect

    best, at = -1, None
    for v in sorted(set(a) | set(b)):
        num = abs(n2 * bisect.bisect_right(a, v) - n1 * bisect.bisect_right(b, v))
        if num > best:
            best, at = num, v
    got = REGISTRY["stats_ks_two_sample"].spark(spark, sf_dir).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.n1, r.n2, r.d_num, r.at_cents) == (n1, n2, best, at)
    assert r.d_stat == pytest.approx(best / (n1 * n2), abs=2e-6)


def test_vec_ivf_cell_stats_partitions_the_corpus(spark, sf_dir):
    cells = REGISTRY["vec_ivf_cell_stats"].spark(spark, sf_dir).toPandas()
    import pyarrow.parquet as _pq

    n = len(_pq.read_table(f"{sf_dir}/embeddings.parquet"))
    assert cells["n_vecs"].sum() == n
    assert set(cells["cid"]) <= set(range(8))
    assert (cells["share_bp"] == cells["n_vecs"] * 10000 // n).all()
    assert (cells["mean_d2"] >= 0).all()
    # seed centroids quantize their own cell: every cell's mean error is
    # finite and the assignment is total (no NULL cid)
    assert cells["cid"].notna().all()


def test_join_asof_nearest_matches_bruteforce(spark, sf_dir):
    ev = _events(sf_dir)
    clicks: dict = {}
    for r in ev[ev.event_type == "click"].itertuples():
        clicks.setdefault(r.user_id, []).append((int(r.ts_us), int(r.event_id)))
    got = {r.purchase_id: r for r in REGISTRY["join_asof_nearest"].spark(spark, sf_dir).toPandas().itertuples()}
    purchases = ev[ev.event_type == "purchase"]
    assert len(got) == len(purchases)
    for p in purchases.itertuples():
        cand = clicks.get(p.user_id, [])
        r = got[p.event_id]
        assert r.purchase_us == p.ts_us
        if not cand:
            assert r.click_id is None or pd.isna(r.click_id)
            continue
        # nearest by |dt|; ties -> the earlier (backward) click
        best = min(cand, key=lambda c: (abs(c[0] - p.ts_us), c[0] > p.ts_us, c[1]))
        assert (r.click_id, r.click_us) == (best[1], best[0]), p.event_id
        assert r.dt_us == abs(best[0] - p.ts_us)


def test_sample_kcenter_diverse_matches_greedy(spark, sf_dir):
    import numpy as np
    import pyarrow.parquet as _pq

    t = _pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy()
    se = np.array(
        [[round(float(x) * 10_000_000) for x in v] for v in t["embedding"]],
        dtype="int64",
    )
    centers = [0]
    dmin = ((se - se[ids == 0][0]) ** 2).sum(axis=1)
    expect = [(0, 0, 0)]
    for rank in range(1, 4):
        order = np.lexsort((ids, -dmin))  # max d, ties -> lowest vec_id
        pick = order[0]
        expect.append((rank, int(ids[pick]), int(dmin[pick])))
        dmin = np.minimum(dmin, ((se - se[pick]) ** 2).sum(axis=1))
    got = REGISTRY["sample_kcenter_diverse"].spark(spark, sf_dir).toPandas()
    assert [(r.center_rank, r.vec_id, r.sel_d2) for r in got.itertuples()] == expect
    # diversity: selection radii are non-increasing (greedy invariant)
    d2s = [d for _, _, d in expect[1:]]
    assert d2s == sorted(d2s, reverse=True)


def test_ml_pca_power_matches_integer_replay_and_converges(spark, sf_dir):
    import numpy as np
    import pyarrow.parquet as _pq

    t = _pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    se = np.array(
        [[round(float(x) * 10_000_000) for x in v] for v in t["embedding"]],
        dtype=object,  # exact python ints, no int64 overflow
    )

    def iterate(v):
        s = se @ v
        tj = (se * s[:, None]).sum(axis=0)
        vmax = max(abs(int(x)) for x in tj)
        return np.array(
            [-((-int(x) * 1000) // vmax) if int(x) < 0 else (int(x) * 1000) // vmax for x in tj],
            dtype=object,
        )

    v1 = iterate(np.array([1000] * 64, dtype=object))
    v2 = iterate(v1)
    got = REGISTRY["ml_pca_power"].spark(spark, sf_dir).toPandas().sort_values("dim")
    assert [int(x) for x in got["v_milli"]] == [int(x) for x in v2]
    # convergence: the Rayleigh quotient of v2 is no worse than v1's
    sef = np.array(se.tolist(), dtype=float)
    G = sef.T @ sef

    def rq(v):
        vf = np.array([float(x) for x in v])
        return (vf @ G @ vf) / (vf @ vf)

    assert rq(v2) >= rq(v1) * 0.999
    # strict progress from the all-ones start; full alignment with the
    # true top eigenvector is NOT asserted — random unit vectors give a
    # near-flat spectrum, where power iteration needs O(1/log(l1/l2))
    # rounds, far more than the two unrolled here (the algorithm, not
    # its convergence on isotropic noise, is the contract)
    v0 = np.array([1000.0] * 64)
    assert rq(v2) >= rq(v0)
    # the Rayleigh quotient must sit within the spectrum bounds
    w = np.linalg.eigvalsh(G)
    assert w[0] - 1e-6 <= rq(v2) <= w[-1] + abs(w[-1]) * 1e-9


def test_graph_link_predict_matches_pure_python(spark, sf_dir):
    edges = REGISTRY["ann_knn_graph"].spark(spark, sf_dir).toPandas()
    und = {tuple(sorted((int(r.vec_id), int(r.nbr_id)))) for r in edges.itertuples()}
    adj: dict = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    scored = []
    for w, nbrs in adj.items():
        for u in nbrs:
            for v in nbrs:
                if u < v and (u, v) not in und:
                    scored.append((u, v))
    rows = []
    for u, v in set(scored):
        common = len(adj[u] & adj[v])
        ppm = common * 1_000_000 // (len(adj[u]) + len(adj[v]) - common)
        rows.append((ppm, u, v, common))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    expect = [(u, v, c, ppm) for ppm, u, v, c in rows[:20]]
    got = REGISTRY["graph_link_predict"].spark(spark, sf_dir).toPandas()
    assert [(r.u, r.v, r.common, r.jaccard_ppm) for r in got.itertuples()] == expect
    # predictions are strictly non-edges with at least one shared neighbor
    assert all((r.u, r.v) not in und and r.common >= 1 for r in got.itertuples())


def test_stats_bootstrap_ci_matches_hash_replay(spark, sf_dir):
    from cdc_dedupe_spark.queries.stats_ml import (
        _BOOT_B, _BOOT_HI_RANK, _BOOT_LO_RANK, _BOOT_T,
    )

    ev = _events(sf_dir)
    p = ev[ev.event_type == "purchase"]
    cents = {int(r.event_id): _pyround(r.value * 100) for r in p.itertuples()}

    def weight(eid, b):
        h = int(hashlib.md5(f"{eid}:{b}".encode()).hexdigest()[:8], 16)
        for k, t in enumerate(_BOOT_T):
            if h < t:
                return k
        return 8

    means = []
    for b in range(1, _BOOT_B + 1):
        s = nb = 0
        for eid, c in cents.items():
            w = weight(eid, b)
            s += w * c
            nb += w
        means.append((s / nb, b))
    means.sort()
    lo = round(means[_BOOT_LO_RANK - 1][0], 6)
    hi = round(means[_BOOT_HI_RANK - 1][0], 6)
    got = REGISTRY["stats_bootstrap_ci"].spark(spark, sf_dir).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r.n == len(cents) and r.n_replicas == _BOOT_B
    assert r.ci_lo == pytest.approx(lo, abs=2e-6)
    assert r.ci_hi == pytest.approx(hi, abs=2e-6)
    # the interval brackets the full-sample mean
    assert r.ci_lo <= r.mean_cents <= r.ci_hi


def test_stream_hll_distinct_matches_register_replay(spark, sf_dir):
    from cdc_dedupe_spark.queries.streaming import _SH_M, _SH_NUM, _SH_VBITS

    ev = _events(sf_dir)
    got = {r.event_type: r for r in REGISTRY["stream_hll_distinct"].spark(spark, sf_dir).toPandas().itertuples()}
    for etype, g in ev.groupby("event_type"):
        regs = [0] * _SH_M
        for uid in g["user_id"]:
            hv = int(hashlib.md5(str(int(uid)).encode()).hexdigest()[:15], 16)
            v = hv >> 8
            rho = _SH_VBITS if v == 0 else (_SH_VBITS + 1) - v.bit_length()
            regs[hv % _SH_M] = max(regs[hv % _SH_M], rho)
        s_scaled = sum(1 << (_SH_VBITS - m) for m in regs)
        r = got[etype]
        assert r.n_events == len(g)
        assert r.s_scaled == s_scaled
        assert r.n_zero_registers == sum(1 for m in regs if m == 0)
        assert r.hll_raw_estimate == pytest.approx(_SH_NUM / s_scaled, abs=0.2)
        # sf0.001 sits deep in HLL's small-range regime where the RAW
        # estimate overshoots by design (the declared output documents
        # this; the ln()-based linear-counting correction is not
        # cross-engine-exact so the query doesn't ship it) — but the
        # registers must carry the information: the test-side linear
        # counting estimate m*ln(m/V) recovers the truth within 20%
        true = g["user_id"].nunique()
        if r.n_zero_registers > 0:
            lc = _SH_M * math.log(_SH_M / r.n_zero_registers)
            assert abs(lc - true) / true < 0.2, (etype, lc, true)


def test_events_forecast_backtest_matches_heldout_fold(spark, sf_dir):
    ev = _events(sf_dir)
    ev["bucket"] = ev["ts_us"] // 3_600_000_000 * 3_600_000_000
    got = {r.event_type: r for r in REGISTRY["events_forecast_backtest"].spark(spark, sf_dir).toPandas().itertuples()}
    for etype, g in ev.groupby("event_type"):
        xs = [float(c) for _, c in sorted(Counter(g["bucket"]).items())]
        if len(xs) < 3:
            assert etype not in got
            continue
        train, actual = xs[:-1], xs[-1]
        l, t = train[0], train[1] - train[0]
        for x in train[2:]:
            l_new = (x + l + t) / 2
            t_new = ((l_new - l) + t) / 2
            l, t = l_new, t_new
        r = got[etype]
        assert r.n_buckets == len(xs)
        assert r.forecast == pytest.approx(l + t, abs=2e-6)
        assert r.actual == actual
        assert r.abs_err == pytest.approx(abs((l + t) - actual), abs=2e-6)


def test_multimodal_payload_chunks_matches_byte_chunker(spark, sf_dir):
    docs = _docs(sf_dir)
    per_doc: dict = {}
    freq: Counter = Counter()
    for r in docs.itertuples():
        raw = r.text.encode()
        hs = [
            hashlib.md5(raw[i : i + 64].hex().upper().encode()).hexdigest()
            for i in range(0, len(raw), 64)
        ]
        per_doc[r.doc_id] = hs
        freq.update(hs)
    got = {r.doc_id: r for r in REGISTRY["multimodal_payload_chunks"].spark(spark, sf_dir).toPandas().itertuples()}
    assert set(got) == set(per_doc)
    for doc_id, hs in per_doc.items():
        dup = sum(1 for h in hs if freq[h] > 1)
        r = got[doc_id]
        assert (r.n_chunks, r.dup_chunks) == (len(hs), dup), doc_id
        assert r.dup_frac_bp == dup * 10000 // len(hs)


def test_events_attribution_credit_matches_bruteforce(spark, sf_dir):
    ev = _events(sf_dir)
    clicks: dict = {}
    for r in ev[ev.event_type == "click"].itertuples():
        clicks.setdefault(r.user_id, []).append((int(r.ts_us), int(r.event_id)))
    for v in clicks.values():
        v.sort()
    agg: dict = {}
    for p in ev[ev.event_type == "purchase"].itertuples():
        cand = [c for c in clicks.get(p.user_id, []) if c[0] <= p.ts_us]
        hod = cand[-1][0] // 3_600_000_000 % 24 if cand else -1
        n, a, rev = agg.get(hod, (0, 0, 0))
        agg[hod] = (n + 1, a + (1 if cand else 0), rev + _pyround(p.value * 100))
    got = REGISTRY["events_attribution_credit"].spark(spark, sf_dir).toPandas()
    assert {r.click_hod: (r.n_purchases, r.n_attributed, r.revenue_cents) for r in got.itertuples()} == agg


def test_events_user_features_matches_pandas(spark, sf_dir):
    ev = _events(sf_dir)
    now_us = ev["ts_us"].max()
    got = {r.user_id: r for r in REGISTRY["events_user_features"].spark(spark, sf_dir).toPandas().itertuples()}
    assert set(got) == set(ev["user_id"].unique())
    for uid, g in ev.groupby("user_id"):
        purch = g[g.event_type == "purchase"]
        r = got[uid]
        assert r.n_events == len(g)
        assert r.n_purchases == len(purch)
        assert r.n_types == g["event_type"].nunique()
        assert r.spend_cents == sum(_pyround(v * 100) for v in purch["value"])
        assert r.recency_hours == (now_us - g["ts_us"].max()) // 3_600_000_000


def test_events_active_users_matches_bruteforce_windows(spark, sf_dir):
    ev = _events(sf_dir)
    ev["day"] = ev["ts_us"] // 86_400_000_000
    ud = {(int(r.user_id), int(r.day)) for r in ev.itertuples()}
    days = sorted({d for _, d in ud})
    got = {r.day_us: r for r in REGISTRY["events_active_users"].spark(spark, sf_dir).toPandas().itertuples()}
    assert set(got) == {d * 86_400_000_000 for d in days}
    for d in days:
        dau = len({u for u, dd in ud if dd == d})
        wau = len({u for u, dd in ud if d - 6 <= dd <= d})
        mau = len({u for u, dd in ud if d - 27 <= dd <= d})
        r = got[d * 86_400_000_000]
        assert (r.dau, r.wau, r.mau) == (dau, wau, mau), d
        assert r.stickiness_bp == dau * 10000 // mau
        assert dau <= wau <= mau


def test_ml_eval_metrics_matches_confusion_algebra(spark, sf_dir):
    conf = REGISTRY["ml_nb_classify"].spark(spark, sf_dir).toPandas()
    got = {r.lang: r for r in REGISTRY["ml_eval_metrics"].spark(spark, sf_dir).toPandas().itertuples()}
    trues = conf.groupby("lang_true")["n_docs"].sum()
    preds = conf.groupby("lang_pred")["n_docs"].sum()
    assert set(got) == set(trues.index)
    for lang in trues.index:
        tp = int(conf[(conf.lang_true == lang) & (conf.lang_pred == lang)]["n_docs"].sum())
        pt = int(preds.get(lang, 0))
        tt = int(trues[lang])
        r = got[lang]
        assert (r.tp, r.fp, r.fn) == (tp, pt - tp, tt - tp)
        if pt > 0:
            assert r.precision_bp == tp * 10000 // pt
        else:
            assert pd.isna(r.precision_bp)
        assert r.recall_bp == tp * 10000 // tt
        assert r.f1_bp == tp * 20000 // (tt + pt)


def test_sample_class_balance_exact_counts(spark, sf_dir):
    docs = _docs(sf_dir)
    n_min = docs.groupby("lang").size().min()
    expect = set()
    for lang, g in docs.groupby("lang"):
        ranked = sorted(
            (hashlib.md5(f"{r.doc_id}#{lang}".encode()).hexdigest(), r.doc_id)
            for r in g.itertuples()
        )
        expect |= {(d, lang) for _, d in ranked[:n_min]}
    got = REGISTRY["sample_class_balance"].spark(spark, sf_dir).toPandas()
    assert {(r.doc_id, r.lang) for r in got.itertuples()} == expect
    sizes = got.groupby("lang").size()
    assert (sizes == n_min).all()


def test_window_running_distinct_matches_set_replay(spark, sf_dir):
    ev = _events(sf_dir).sort_values(["ts_us", "event_id"])
    got = {(r.user_id, r.event_id): r.distinct_types_so_far
           for r in REGISTRY["window_running_distinct"].spark(spark, sf_dir).toPandas().itertuples()}
    seen: dict = {}
    for r in ev.itertuples():
        s = seen.setdefault(r.user_id, set())
        s.add(r.event_type)
        assert got[(r.user_id, r.event_id)] == len(s), r.event_id
    assert len(got) == len(ev)


def test_fn_bitwise_matches_python_ints(spark, sf_dir):
    li = _lineitem(sf_dir)
    sub = li[li.l_orderkey < 64]
    # (orderkey, linenumber) is NOT unique in this synthetic corpus, so
    # compare as sorted multisets of full tuples
    got = sorted(
        (r.l_orderkey, r.l_linenumber, r.lo_byte, r.with_flag, r.mixed,
         r.shifted_down, r.shifted_up, r.popcount)
        for r in REGISTRY["fn_bitwise"].spark(spark, sf_dir).toPandas().itertuples()
    )
    expect = sorted(
        (int(r.l_orderkey), int(r.l_linenumber),
         int(r.l_orderkey) & 255, int(r.l_orderkey) | 4096,
         int(r.l_orderkey) ^ int(r.l_linenumber), int(r.l_orderkey) >> 4,
         int(r.l_linenumber) << 8, bin(int(r.l_orderkey)).count("1"))
        for r in sub.itertuples()
    )
    assert got == expect


def test_ts_autocorr_matches_numpy(spark, sf_dir):
    import numpy as np

    ev = _events(sf_dir)
    ev["bucket"] = ev["ts_us"] // 3_600_000_000 * 3_600_000_000
    got = {(r.event_type, r.lag): r for r in REGISTRY["ts_autocorr"].spark(spark, sf_dir).toPandas().itertuples()}
    n_expected = 0
    for etype, g in ev.groupby("event_type"):
        xs = [c for _, c in sorted(Counter(g["bucket"]).items())]
        for k in (1, 2, 3):
            if len(xs) <= k + 1:
                assert (etype, k) not in got
                continue
            n_expected += 1
            a, b = np.array(xs[:-k], dtype=float), np.array(xs[k:], dtype=float)
            expect = np.corrcoef(a, b)[0, 1]
            r = got[(etype, k)]
            assert r.n_pairs == len(a)
            assert r.acf == pytest.approx(expect, abs=2e-6), (etype, k)
    assert len(got) == n_expected


def test_ts_seasonality_profile_sums_to_uniform(spark, sf_dir):
    ev = _events(sf_dir)
    ev["hod"] = ev["ts_us"] // 3_600_000_000 % 24
    got = REGISTRY["ts_seasonality_profile"].spark(spark, sf_dir).toPandas()
    for etype, g in ev.groupby("event_type"):
        cells = got[got.event_type == etype]
        counts = Counter(g["hod"])
        assert {int(r.hod): int(r.n) for r in cells.itertuples()} == dict(counts)
        tot, hods = len(g), len(counts)
        for r in cells.itertuples():
            assert r.seasonal_index_bp == r.n * 10000 * hods // tot
        # indices average to ~10000 bp by construction (truncation under)
        assert 9000 <= cells["seasonal_index_bp"].mean() <= 10000


def test_dedup_span_containment_matches_pure_python(spark, sf_dir):
    from collections import defaultdict

    docs = _docs(sf_dir)
    spans: dict = {}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        if len(toks) < 8:
            continue
        spans[r.doc_id] = {
            hashlib.md5(" ".join(toks[i : i + 8]).encode()).hexdigest()
            for i in range(len(toks) - 7)
        }
    freq: Counter = Counter()
    for hs in spans.values():
        freq.update(hs)
    rare = {h for h, f in freq.items() if 2 <= f <= 8}
    shared: dict = defaultdict(int)
    by_span: dict = defaultdict(list)
    for d, hs in spans.items():
        for h in hs & rare:
            by_span[h].append(d)
    for h, ds in by_span.items():
        for x in ds:
            for y in ds:
                if x != y:
                    shared[(x, y)] += 1
    rows = [
        (c * 10000 // len(spans[a]), a, b, c, len(spans[a]))
        for (a, b), c in shared.items()
        if c >= 4
    ]
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    expect = [(a, b, c, n, bp) for bp, a, b, c, n in rows[:50]]
    got = REGISTRY["dedup_span_containment"].spark(spark, sf_dir).toPandas()
    assert [
        (r.doc_a, r.doc_b, r.shared, r.spans_a, r.containment_bp)
        for r in got.itertuples()
    ] == expect


# ---------------------------------------------------------------------------
# dedup_cdc_chunks (r15)


def _py_cdc_chunks(text, w=8, b=257, m=1_000_003, d=64):
    """Independent pure-Python reference of the declared CDC rule."""
    n = len(text)
    cuts = []
    for i in range(1, n - w + 2):  # 1-based window starts
        h = 0
        for j in range(w):
            h = (h * b + ord(text[i - 1 + j])) % m
        if h % d == 0:
            cuts.append(i + w - 1)
    cuts = sorted(set(cuts + [n]))
    out, prev = [], 0
    for c in cuts:
        out.append(text[prev:c])
        prev = c
    return out


def test_cdc_chunks_match_python_reference(spark, sf_dir):
    """Chunk counts + corpus dup stats must equal an independent Python
    implementation of the rolling-hash rule on the real corpus."""
    docs = _docs(sf_dir)
    per_doc: dict = {}
    freq: Counter = Counter()
    for r in docs.itertuples():
        hs = [hashlib.md5(c.encode()).hexdigest() for c in _py_cdc_chunks(r.text)]
        per_doc[r.doc_id] = hs
        freq.update(hs)
    got = {
        r.doc_id: r
        for r in REGISTRY["dedup_cdc_chunks"].spark(spark, sf_dir).toPandas().itertuples()
    }
    assert set(got) == set(per_doc)
    for doc_id, hs in per_doc.items():
        dup = sum(1 for h in hs if freq[h] > 1)
        r = got[doc_id]
        assert (r.n_chunks, r.dup_chunks) == (len(hs), dup), doc_id
        assert r.dup_frac_bp == dup * 10000 // len(hs)


def test_cdc_chunks_survive_insertion_fixed_stride_does_not():
    """THE content-defined property (why this operator exists): after a
    3-char insertion at the head, CDC boundaries resync and most chunk
    hashes are shared with the original; fixed-stride chunking shifts
    every boundary and shares (next to) nothing."""
    base = " ".join(f"tok{i:03d}" for i in range(60))  # ~420 chars
    edited = "zz " + base

    a, b = _py_cdc_chunks(base), _py_cdc_chunks(edited)
    shared_cdc = len(Counter(a) & Counter(b))
    assert len(a) >= 4, "fixture must produce several chunks"
    # everything after the first resynced boundary is identical
    assert shared_cdc >= len(a) - 2, (len(a), shared_cdc, a[:2], b[:2])

    fa = [base[i : i + 64] for i in range(0, len(base), 64)]
    fb = [edited[i : i + 64] for i in range(0, len(edited), 64)]
    shared_fixed = len(Counter(fa) & Counter(fb))
    assert shared_fixed == 0
    assert shared_cdc > shared_fixed


# ---------------------------------------------------------------------------
# agg_kmv_distinct (r15)


def test_kmv_estimate_matches_python_and_is_bounded(spark, sf_dir):
    """KMV vs an independent Python sketch on the real corpus: identical
    kth hash + estimate, and the within_5sd audit flag must be 1 for
    every full sketch."""
    li = _lineitem(sf_dir)
    per: dict = {}
    for r in li.itertuples():
        hv = int(hashlib.md5(str(int(r.l_partkey)).encode()).hexdigest()[:15], 16)
        per.setdefault(r.l_returnflag, set()).add(hv)
    got = {r.l_returnflag: r for r in REGISTRY["agg_kmv_distinct"].spark(spark, sf_dir).toPandas().itertuples()}
    assert set(got) == set(per)
    for flag, hset in per.items():
        bottom = sorted(hset)[:64]
        r = got[flag]
        assert r.n_sketch == len(bottom)
        assert r.kth_hv == bottom[-1]
        if len(bottom) == 64:
            want = round((63 * (1 << 60)) / bottom[-1], 1)
            assert r.kmv_estimate == pytest.approx(want, abs=0.2)
            assert r.within_5sd == 1


def test_kmv_window_plans_group_limit(spark, sf_dir):
    """Plan pin: the bottom-K window must plan WindowGroupLimit (map-side
    per-group pre-trim BEFORE the shuffle) — without it the exchange
    carries the whole distinct domain and the sketch isn't a sketch."""
    df = REGISTRY["agg_kmv_distinct"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:3000]
