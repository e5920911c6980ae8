"""Round-12 additions: streaming DAU/WAU/MAU over daily HLL sketches and
the bounded-state weighted reservoir. Oracle parity covers exact values
(tests/test_oracle_parity.py); these units pin the SEMANTIC properties —
sketch monotonicity across window widths, and the reservoir's
merge-invariance under batch splits and arrival orders."""

from __future__ import annotations

import random

import pandas as pd

from cdc_dedupe_spark.queries.registry import REGISTRY


class _FakeGroupState:
    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, value):
        self._v = tuple(value)


# ---------------------------------------------------------------------------
# stream_active_users_hll


def test_active_users_hll_window_monotonicity(spark, sf_dir):
    """Register-wise max over a wider trailing window can only RAISE
    registers, so the scaled sums must be monotone (s_mau <= s_wau <=
    s_dau) and stickiness = s_mau/s_dau must land in (0, 1]."""
    rows = REGISTRY["stream_active_users_hll"].spark(spark, sf_dir).collect()
    assert rows, "no report days emitted"
    for r in rows:
        assert r.mau_s_scaled <= r.wau_s_scaled <= r.dau_s_scaled, r
        assert 0.0 < r.stickiness <= 1.0, r
        assert r.n_events > 0 and r.dau_est > 0.0


def test_active_users_hll_first_day_windows_degenerate(spark, sf_dir):
    """The earliest report day has no trailing history, so its DAU, WAU
    and MAU sketches are identical — the cover-explode must not invent
    phantom days before the corpus."""
    rows = REGISTRY["stream_active_users_hll"].spark(spark, sf_dir).collect()
    first = min(rows, key=lambda r: r.day_us)
    assert first.dau_s_scaled == first.wau_s_scaled == first.mau_s_scaled
    assert first.stickiness == 1.0


def test_hll_day_fold_split_invariance():
    """Register-max is commutative/associative: folding the same users
    in any batch split / order yields byte-identical state and the same
    emitted register array."""
    from cdc_dedupe_spark.queries.streaming import _hll_day_fold

    users = [random.Random(12).randrange(1, 10_000) for _ in range(2_000)]

    def run(batches):
        st = _FakeGroupState()
        out = None
        for b in batches:
            out = list(
                _hll_day_fold((7,), iter([pd.DataFrame({"user_id": b})]), st)
            )[0]
        return st.get, out

    st_one, out_one = run([users])
    shuffled = list(users)
    random.Random(3).shuffle(shuffled)
    st_many, out_many = run([shuffled[:700], shuffled[700:900], shuffled[900:]])
    assert st_one[0] == st_many[0]  # identical 256-byte registers
    assert out_one["regs"].tolist() == out_many["regs"].tolist()
    assert out_many["n_events"].iloc[0] == len(users)


# ---------------------------------------------------------------------------
# stream_weighted_reservoir


def _wres_rows(n, seed):
    rng = random.Random(seed)
    ids = rng.sample(range(1, 100_000), n)
    return [
        (float(rng.randrange(1, 1 << 40)) / (1 + i % 97), i, 1 + i % 97)
        for i in ids
    ]


def _run_fold(batches, state=None):
    from cdc_dedupe_spark.queries.streaming import _wres_fold

    st = _FakeGroupState(state)
    out = None
    for rows in batches:
        pdf = pd.DataFrame(
            {
                "ip": [r[0] for r in rows],
                "event_id": [r[1] for r in rows],
                "cents": [r[2] for r in rows],
            }
        )
        out = list(_wres_fold(("purchase",), iter([pdf]), st))[0]
    return st.get, out


def test_weighted_reservoir_merge_invariance():
    """The final reservoir is the min-k of all priorities seen — batch
    split and arrival order must not change it (the property that makes
    the streaming sample hash-match the batch window oracle)."""
    rows = _wres_rows(1_000, seed=5)
    st_one, out_one = _run_fold([rows])
    shuffled = list(rows)
    random.Random(9).shuffle(shuffled)
    st_many, out_many = _run_fold(
        [shuffled[:100], shuffled[100:640], shuffled[640:]]
    )
    assert st_one == st_many
    assert out_one.values.tolist() == out_many.values.tolist()
    assert out_many["n_seen"].iloc[0] == len(rows)


def test_weighted_reservoir_is_exact_min_k():
    """The emitted reservoir equals the exact k smallest (ip, id) pairs
    with correct 1..k ranks — the fold is selection, never approximation."""
    from cdc_dedupe_spark.queries.streaming import _WRES_K

    rows = _wres_rows(500, seed=13)
    _, out = _run_fold([rows])
    want = sorted(rows)[:_WRES_K]
    assert out["event_id"].tolist() == [r[1] for r in want]
    assert out["ip"].tolist() == [r[0] for r in want]
    assert out["rk"].tolist() == list(range(1, len(want) + 1))


def test_weighted_reservoir_state_is_bounded():
    """State never exceeds k rows no matter how many events a stratum
    has seen — the bounded-state contract."""
    from cdc_dedupe_spark.queries.streaming import _WRES_K

    st, _ = _run_fold([_wres_rows(3_000, seed=21)])
    ids, cents, ips, n = st
    assert len(ids) == len(cents) == len(ips) == _WRES_K
    assert n == 3_000


# ---------------------------------------------------------------------------
# stats_mann_whitney


def test_mann_whitney_identities(spark, sf_dir):
    """U1 + U2 = n1*n2 (doubled: u1_x2 + u2_x2 = 2*n1*n2) is the exact
    algebraic identity of the rank-sum statistics; the rank-biserial
    effect size must land in [-1, 1]."""
    r = REGISTRY["stats_mann_whitney"].spark(spark, sf_dir).collect()[0]
    assert r.u1_x2 + r.u2_x2 == 2 * r.n1 * r.n2
    assert -1.0 <= r.rank_biserial <= 1.0
    assert r.tie_cubes >= 0


# ---------------------------------------------------------------------------
# sample_ab_assign


def test_ab_assign_partitions_population(spark, sf_dir):
    """Every unit lands in exactly one variant, the variants are the
    declared three, and reruns assign identically (pure function of the
    unit id)."""
    from cdc_dedupe_spark.tables import table

    rows = REGISTRY["sample_ab_assign"].spark(spark, sf_dir).collect()
    assert {r.variant for r in rows} == {"A", "B", "C"}
    total = table(spark, sf_dir, "customer").count()
    assert sum(r.n_users for r in rows) == total
    again = REGISTRY["sample_ab_assign"].spark(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    for r in rows:
        assert r.expected_x100 == total * r.expected_bp // 100
        assert r.chi2_contrib >= 0.0


# ---------------------------------------------------------------------------
# text_ngram_novelty


def test_ngram_novelty_bounds_and_first_doc(spark, sf_dir):
    """novelty_bp is a valid basis-point fraction, and the smallest
    doc_id is 100% novel by construction (no earlier doc can own any of
    its spans)."""
    rows = REGISTRY["text_ngram_novelty"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.novel_spans <= r.n_spans
        assert 0 <= r.novelty_bp <= 10000
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty_bp == 10000


# ---------------------------------------------------------------------------
# ann_matryoshka_prefix


def test_matryoshka_funnel_contract(spark, sf_dir):
    """Structural funnel contract (recall itself depends on the
    embeddings being MRL-trained, which the random test vectors are
    not — exact VALUES are pinned by the oracle parity): k rows out,
    ranked by exact full-dim cosine descending with vec_id tie-break,
    cos_full computed by the SAME exact kernel as the brute-force query
    wherever both rank a vector, and at least one true top-5 neighbor
    survives the prefix filter even on untrained vectors."""
    mrl = REGISTRY["ann_matryoshka_prefix"].spark(spark, sf_dir).collect()
    brute = REGISTRY["sim_cosine_topk"].spark(spark, sf_dir).collect()
    assert len(mrl) == 5
    ranked = [(-r.cos_full, r.vec_id) for r in mrl]
    assert ranked == sorted(ranked)
    brute_by_id = {r.vec_id: r.cos_r for r in brute}
    overlap = [r for r in mrl if r.vec_id in brute_by_id]
    assert len(overlap) >= 1
    for r in overlap:
        assert r.cos_full == brute_by_id[r.vec_id]  # same exact kernel


# ---------------------------------------------------------------------------
# cohort_ltv_curve


def test_cohort_ltv_monotone_and_consistent(spark, sf_dir):
    """Cumulative LTV is non-decreasing in age within a cohort, and the
    sum of every cohort's final cumulative cents equals total purchase
    revenue."""
    from pyspark.sql import functions as F

    from cdc_dedupe_spark.tables import table

    rows = REGISTRY["cohort_ltv_curve"].spark(spark, sf_dir).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_day, []).append(r)
    final_total = 0
    for curve in by_cohort.values():
        curve.sort(key=lambda r: r.age_days)
        cums = [r.cum_cents for r in curve]
        assert cums == sorted(cums)
        final_total += cums[-1]
    want = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")))
        .collect()[0][0]
    )
    assert final_total == want


# ---------------------------------------------------------------------------
# vec_binary_hamming


def test_binary_hamming_signature_semantics(spark, sf_dir):
    """Each signature bit is exactly sign(dim) of the source embedding,
    and the reported Hamming distance equals the recomputed XOR popcount
    against the probe's signature."""
    from cdc_dedupe_spark.tables import table

    rows = REGISTRY["vec_binary_hamming"].spark(spark, sf_dir).collect()
    assert len(rows) == 5
    emb = {
        r.vec_id: r.embedding
        for r in table(spark, sf_dir, "embeddings")
        .filter("vec_id IN (0, " + ",".join(str(r.vec_id) for r in rows) + ")")
        .collect()
    }

    def pack(vec):
        lo = sum(1 << i for i in range(32) if vec[i] > 0)
        hi = sum(1 << i for i in range(32) if vec[32 + i] > 0)
        return lo, hi

    plo, phi = pack(emb[0])
    for r in rows:
        lo, hi = pack(emb[r.vec_id])
        assert (r.sig_lo, r.sig_hi) == (lo, hi)
        assert r.hamming == bin((lo ^ plo)).count("1") + bin((hi ^ phi)).count("1")


# ---------------------------------------------------------------------------
# stats_ab_cuped


def test_cuped_reduces_to_post_mean_and_shares_assignment(spark, sf_dir):
    """The adjusted means must average (weighted by variant size) to the
    pooled post mean shifted by nothing — sum_v n_v*(adj_v - post_v) =
    -theta * sum_v n_v*(x_v - x_pooled) = 0 — and variant sizes must
    match sample_ab_assign's hash-partition property (every user in
    exactly one variant)."""
    rows = REGISTRY["stats_ab_cuped"].spark(spark, sf_dir).collect()
    assert {r.variant for r in rows} == {"A", "B", "C"}
    thetas = {r.theta for r in rows}
    assert len(thetas) == 1  # pooled fit, same on every row
    # weighted adjustment sums to ~zero (floats rounded to 6dp => loose tol)
    drift = sum(r.n_users * (r.mean_adj - r.mean_post) for r in rows)
    total = sum(r.n_users for r in rows)
    assert abs(drift) / total < 1e-3
    assert all(r.rho2 >= 0.0 for r in rows)


# ---------------------------------------------------------------------------
# stream_topk_spacesaving


def _ss_run(stream_ids, state=None, chunks=1):
    from cdc_dedupe_spark.queries.streaming import _ss_fold

    st = _FakeGroupState(state)
    step = max(1, len(stream_ids) // chunks)
    batches = [stream_ids[i : i + step] for i in range(0, len(stream_ids), step)]
    out = None
    for b in batches:
        out = list(_ss_fold((0,), iter([pd.DataFrame({"user_id": b})]), st))[0]
    return st.get, out


def test_spacesaving_guarantees():
    """The Space-Saving invariants that hold at ANY arrival order:
    (1) at most k counters; (2) count_hat in [true, true + n/k];
    (3) every key with true count > n/k is present; (4) err_max <= n/k."""
    from collections import Counter

    from cdc_dedupe_spark.queries.streaming import _SS_K

    rng = random.Random(42)
    # zipf-ish: a few heavy keys over a long uniform tail wider than k
    stream = [rng.randrange(1, 10) for _ in range(5_000)] + [
        rng.randrange(10, 2_000) for _ in range(5_000)
    ]
    rng.shuffle(stream)
    true = Counter(stream)
    n = len(stream)
    (keys, counts, errs, n_state), out = _ss_run(stream, chunks=7)
    assert n_state == n
    assert len(keys) <= _SS_K
    bound = n // _SS_K
    got = dict(zip(keys, counts))
    for k, c in got.items():
        assert true[k] <= c <= true[k] + bound, (k, c, true[k])
    for k, e in zip(keys, errs):
        assert 0 <= e <= bound
    for k, cnt in true.items():
        if cnt > bound:
            assert k in got, f"guaranteed heavy hitter {k} (count {cnt}) missing"


def test_spacesaving_state_is_bounded_and_merges():
    """State stays <= k counters across batches, and two shard summaries
    merge by counter addition + re-trim while preserving the combined
    frequency guarantee."""
    from collections import Counter

    from cdc_dedupe_spark.queries.streaming import _SS_K

    rng = random.Random(7)
    s1 = [rng.randrange(1, 500) for _ in range(4_000)]
    s2 = [rng.randrange(1, 500) for _ in range(4_000)]
    (k1, c1, e1, n1), _ = _ss_run(s1, chunks=3)
    (k2, c2, e2, n2), _ = _ss_run(s2, chunks=2)
    assert len(k1) <= _SS_K and len(k2) <= _SS_K
    merged: dict = {}
    for keys, counts in ((k1, c1), (k2, c2)):
        for k, c in zip(keys, counts):
            merged[k] = merged.get(k, 0) + c
    trimmed = dict(sorted(merged.items(), key=lambda t: (-t[1], t[0]))[:_SS_K])
    true = Counter(s1 + s2)
    bound = n1 // _SS_K + n2 // _SS_K
    for k, c in trimmed.items():
        assert true[k] <= c <= true[k] + bound


# ---------------------------------------------------------------------------
# cdc_scd2_history


def test_scd2_versions_chain(spark, sf_dir):
    """SCD-2 invariants: per entity the version numbers are 1..n with no
    gaps, exactly ONE current version (the max), and every closed
    version's valid_to equals the next version's valid_from — the
    validity intervals tile the entity's timeline with no holes or
    overlaps."""
    rows = REGISTRY["cdc_scd2_history"].spark(spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, vs in by_user.items():
        vs.sort(key=lambda r: r.version)
        assert [r.version for r in vs] == list(range(1, len(vs) + 1)), uid
        currents = [r for r in vs if r.is_current == 1]
        assert len(currents) == 1 and currents[0].version == len(vs), uid
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to_us == b.valid_from_us, (uid, a.version)
            assert a.duration_us == a.valid_to_us - a.valid_from_us >= 0
        assert vs[-1].valid_to_us == -1 and vs[-1].duration_us == -1


def test_scd2_covers_every_event(spark, sf_dir):
    """One version row per change event — nothing merged, nothing
    dropped (history preservation is the SCD-2 contract)."""
    from cdc_dedupe_spark.tables import table

    n_events = table(spark, sf_dir, "events").count()
    n_versions = REGISTRY["cdc_scd2_history"].spark(spark, sf_dir).count()
    assert n_versions == n_events


# ---------------------------------------------------------------------------
# events_funnel_windowed


def test_funnel_windowed_monotone_and_bounded(spark, sf_dir):
    """Step counts can only shrink down the funnel, the bounded-window
    counts can never exceed the unbounded funnel's, and conv_bp is the
    exact integer ratio of the emitted counts."""
    row = REGISTRY["events_funnel_windowed"].spark(spark, sf_dir).collect()[0]
    assert row.n_users >= row.n_signup >= row.n_click_7d >= row.n_purchase_7d >= 0
    if row.n_signup:
        assert row.conv_bp == row.n_purchase_7d * 10000 // row.n_signup
    # NOTE: n_click_7d is NOT bounded by funnel_conversion's
    # n_signup_click — the unbounded funnel compares the FIRST click
    # against the first signup, while the windowed funnel admits any
    # later click inside the window; only the signup stage is shared.
    unbounded = REGISTRY["funnel_conversion"].spark(spark, sf_dir).collect()[0]
    assert row.n_signup == unbounded.n_signup


# ---------------------------------------------------------------------------
# stats_anova_oneway


def test_anova_matches_pure_python(spark, sf_dir):
    """Independent float implementation of the variance decomposition
    (grand/group means, not the moments form) agrees to 1e-9 relative —
    guards against a moments-algebra slip the oracle twin (same algebra)
    could mirror."""
    from cdc_dedupe_spark.tables import table

    row = REGISTRY["stats_anova_oneway"].spark(spark, sf_dir).collect()[0]
    ev = table(spark, sf_dir, "events").select("event_type", "value").collect()
    groups = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(round(r.value * 100))
    allv = [x for vs in groups.values() for x in vs]
    gm = sum(allv) / len(allv)
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in groups.values())
    ssw = sum(
        (x - sum(vs) / len(vs)) ** 2 for vs in groups.values() for x in vs
    )
    assert row.k == len(groups) and row.n_total == len(allv)
    assert abs(row.ss_between - ssb) <= 1e-6 * max(1.0, abs(ssb))
    assert abs(row.ss_within - ssw) <= 1e-6 * max(1.0, abs(ssw))
    k, n = row.k, row.n_total
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(row.f_stat - f) <= 1e-6 * max(1.0, abs(f))
    assert 0.0 <= row.eta_sq <= 1.0


# ---------------------------------------------------------------------------
# ml_decision_stump


def test_stump_is_argmin_over_all_thresholds(spark, sf_dir):
    """Brute-force every candidate threshold in python: the emitted
    split must achieve the global minimum weighted Gini (ties to the
    smallest threshold), and the gain must be non-negative (a split can
    never be worse than the parent at the optimum: the parent's
    impurity is achievable in the limit and every candidate's children
    partition the parent)."""
    from cdc_dedupe_spark.tables import table

    row = REGISTRY["ml_decision_stump"].spark(spark, sf_dir).collect()[0]
    ev = table(spark, sf_dir, "events").select("event_type", "value").collect()
    pts = sorted(
        (round(r.value * 100), 1 if r.event_type == "purchase" else 0) for r in ev
    )
    n_all = len(pts)
    pos_all = sum(y for _, y in pts)
    best = None
    nl = pl = 0
    i = 0
    cents_sorted = sorted({c for c, _ in pts})
    by_c = {}
    for c, y in pts:
        a = by_c.setdefault(c, [0, 0])
        a[0] += 1
        a[1] += y
    for c in cents_sorted:
        nl += by_c[c][0]
        pl += by_c[c][1]
        if nl >= n_all:
            continue
        nr, pr = n_all - nl, pos_all - pl
        w = pl * (nl - pl) / nl + pr * (nr - pr) / nr
        key = (w, c)
        if best is None or key < best[0]:
            best = (key, (c, nl, pl, nr, pr))
    (bw, bc), (c, nl, pl, nr, pr) = best[0], best[1]
    assert (row.split_cents, row.n_left, row.pos_left, row.n_right, row.pos_right) == (
        c, nl, pl, nr, pr,
    )
    assert row.gini_gain >= 0.0
    # emitted gini_children is round(..., 6): half-ulp tolerance 5e-7
    assert abs(row.gini_children - 2.0 * bw / n_all) <= 5e-7


# ---------------------------------------------------------------------------
# graph_2hop_reach


def test_2hop_reach_matches_bfs_on_emitted_edges(spark, sf_dir):
    """Pure-python BFS over the DECLARED knn edges (ann_knn_graph output)
    must reproduce degree / strict-2-hop counts — an independent
    adjacency-set implementation, not the wedge-join algebra."""
    edges = REGISTRY["ann_knn_graph"].spark(spark, sf_dir).collect()
    reach = REGISTRY["graph_2hop_reach"].spark(spark, sf_dir).collect()
    adj = {}
    for e in edges:
        u, v = min(e.vec_id, e.nbr_id), max(e.vec_id, e.nbr_id)
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for r in reach:
        nbrs = adj.get(r.vec_id, set())
        two = set()
        for m in nbrs:
            two |= adj.get(m, set())
        two -= nbrs
        two.discard(r.vec_id)
        assert (r.degree, r.n_two_hop, r.n_reach2) == (
            len(nbrs), len(two), len(nbrs) + len(two),
        ), r.vec_id


# ---------------------------------------------------------------------------
# text_keyword_rake


def test_rake_matches_pure_python(spark, sf_dir):
    """Independent phrase segmentation + degree/freq scoring in python
    reproduces the emitted top-20 exactly (score ties broken by word)."""
    from cdc_dedupe_spark.queries.llm_ext import _RAKE_STOPS, _RAKE_TOPK
    from cdc_dedupe_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("text").collect()
    freq, degree = {}, {}
    for d in docs:
        phrase = []
        for w in d.text.split(" ") + [list(_RAKE_STOPS)[0]]:
            if w in _RAKE_STOPS or w == "":
                if w in _RAKE_STOPS or not phrase:
                    for x in phrase:
                        freq[x] = freq.get(x, 0) + 1
                        degree[x] = degree.get(x, 0) + len(phrase)
                    phrase = []
                if w == "":
                    # empty tokens are dropped but do NOT break the phrase
                    continue
            else:
                phrase.append(w)
    scored = sorted(
        ((degree[w] * 1000000 // freq[w], w) for w in freq),
        key=lambda t: (-t[0], t[1]),
    )[:_RAKE_TOPK]
    got = [
        (r.score_ppm, r.word, r.freq, r.degree)
        for r in REGISTRY["text_keyword_rake"].spark(spark, sf_dir).collect()
    ]
    assert [(s, w) for s, w, *_ in got] == scored
    for s, w, f, dg in got:
        assert (f, dg) == (freq[w], degree[w])


# ---------------------------------------------------------------------------
# sample_systematic


def test_systematic_stride_and_frame(spark, sf_dir):
    """The sample is exactly every K-th document of the md5-ordered
    frame: recompute the frame with hashlib and check the selected set,
    the stride residues, and the size ceil(n/K)."""
    import hashlib

    from cdc_dedupe_spark.queries.curation import _SYS_K
    from cdc_dedupe_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    frame = sorted(
        (int(hashlib.md5(d.text.encode()).hexdigest()[:15], 16), d.doc_id)
        for d in docs
    )
    expect = {doc_id: i + 1 for i, (_, doc_id) in enumerate(frame) if i % _SYS_K == 0}
    got = REGISTRY["sample_systematic"].spark(spark, sf_dir).collect()
    assert {r.doc_id: r.rank for r in got} == expect
    assert all((r.rank - 1) % _SYS_K == 0 for r in got)
    assert len(got) == (len(docs) + _SYS_K - 1) // _SYS_K


# ---------------------------------------------------------------------------
# stream_sessionize_state


def _sess_run(batches, state=None):
    from cdc_dedupe_spark.queries.streaming import _sess_fold

    st = _FakeGroupState(state)
    out = None
    for chunks in batches:
        out = list(
            _sess_fold(
                (1,),
                iter([pd.DataFrame(c, columns=["ts_us", "event_id"]) for c in chunks]),
            st)
        )[0]
    return st.get, out.iloc[0].to_dict()


def test_sessionize_fold_batch_split_invariance():
    """Splitting the ordered stream at ANY micro-batch boundary — and
    shuffling the Arrow chunks WITHIN a batch — must yield the same final
    state and summary as one big batch (the property that makes the
    streaming rollup hash-match the batch islands oracle)."""
    gap = 1_800_000_000
    rng = random.Random(7)
    ts, t = [], 0
    for _ in range(400):
        t += rng.randrange(1, 3 * gap)
        ts.append(t)
    rows = [(t, i) for i, t in enumerate(ts)]
    st_one, out_one = _sess_run([[rows]])
    # split into 5 ordered micro-batches, each delivered as shuffled chunks
    cuts = sorted(rng.sample(range(1, len(rows)), 4))
    batches = []
    for a, b in zip([0] + cuts, cuts + [len(rows)]):
        seg = rows[a:b]
        mid = len(seg) // 2
        chunks = [seg[mid:], seg[:mid]]  # out-of-order chunks within batch
        batches.append([c for c in chunks if c])
    st_many, out_many = _sess_run(batches)
    assert st_one == st_many
    assert out_one == out_many
    assert st_one[6] == len(rows)  # n_total


def test_sessionize_fold_matches_python_islands():
    """Independent islands implementation agrees on every summary field,
    including the open (last) session."""
    gap = 1_800_000_000
    rng = random.Random(11)
    ts, t = [], 0
    for _ in range(300):
        t += rng.randrange(1, 2 * gap)
        ts.append(t)
    _, out = _sess_run([[[(t, i) for i, t in enumerate(ts)]]])
    sessions = [[ts[0]]]
    for a, b in zip(ts, ts[1:]):
        if b - a >= gap:
            sessions.append([])
        sessions[-1].append(b)
    assert out["n_sessions"] == len(sessions)
    assert out["n_events"] == len(ts)
    assert out["max_session_events"] == max(len(s) for s in sessions)
    assert out["total_duration_us"] == sum(s[-1] - s[0] for s in sessions)


def test_sessionize_state_is_bounded():
    """State is seven BIGINTs regardless of event count."""
    rows = [(i * 1000, i) for i in range(5000)]
    st, _ = _sess_run([[rows]])
    assert len(st) == 7 and all(isinstance(x, int) for x in st)


# ---------------------------------------------------------------------------
# vec_pq_recall_audit


def test_pq_audit_consistency_with_declared_topk(spark, sf_dir):
    """The audit's ADC side is the DECLARED ann_ivfpq_topk ranking, so
    n_overlap/recall must be consistent with it, bounded by k, and the
    error must be non-negative."""
    audit = REGISTRY["vec_pq_recall_audit"].spark(spark, sf_dir).collect()[0]
    topk = REGISTRY["ann_ivfpq_topk"].spark(spark, sf_dir).collect()
    assert audit.k == len(topk)
    assert 0 <= audit.n_overlap <= audit.k
    assert audit.recall_bp == audit.n_overlap * 10000 // audit.k
    assert audit.adc_err_bp >= 0
    assert audit.n_candidates >= audit.k


# ---------------------------------------------------------------------------
# events_retention_churn


def test_churn_growth_accounting_identity(spark, sf_dir):
    """new + retained + resurrected = active every week; churn matches an
    independent python recompute over the per-user week sets; the final
    corpus week reports no churn (right-censoring)."""
    from cdc_dedupe_spark.tables import table

    rows = REGISTRY["events_retention_churn"].spark(spark, sf_dir).collect()
    assert rows
    ev = table(spark, sf_dir, "events").select("user_id", "ts").collect()
    weeks = {}
    for r in ev:
        import calendar

        us = int(calendar.timegm(r.ts.timetuple())) * 1_000_000 + r.ts.microsecond
        weeks.setdefault(r.user_id, set()).add(us // 604_800_000_000)
    gmax = max(w for ws in weeks.values() for w in ws)
    churn = {}
    for ws in weeks.values():
        for w in ws:
            if w < gmax and w + 1 not in ws:
                churn[w + 1] = churn.get(w + 1, 0) + 1
    for r in rows:
        assert r.n_new + r.n_retained + r.n_resurrected == r.n_active, r
        assert r.n_churned == churn.get(r.week, 0), r
    assert max(r.week for r in rows) == gmax


# ---------------------------------------------------------------------------
# ts_stl_trend


def test_stl_trend_window_is_time_accurate(spark, sf_dir):
    """Python recompute of the ±12 h RANGE mean per bucket (truncating
    milli-units) matches every row — pins the frame against the
    ROWS-frame bug class on sparse series."""
    rows = REGISTRY["ts_stl_trend"].spark(spark, sf_dir).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.bucket_us, r.n_events))
    half = 12 * 3_600_000_000
    for r in rows:
        win = [
            n for b, n in by_type[r.event_type] if abs(b - r.bucket_us) <= half
        ]
        trend = sum(win) * 1000 // len(win)
        assert r.trend_milli == trend, (r.event_type, r.bucket_us)
        assert r.resid_milli == r.n_events * 1000 - trend


# ---------------------------------------------------------------------------
# cdc_tombstone_lifecycle


def test_tombstone_lifecycle_fold(spark, sf_dir):
    """Per-entity python fold over the ordered change log reproduces
    delete/resurrection counts and liveness."""
    from cdc_dedupe_spark.tables import table

    got = {
        r.user_id: r
        for r in REGISTRY["cdc_tombstone_lifecycle"].spark(spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    ).collect()
    logs = {}
    for r in ev:
        logs.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type == "error"))
    for uid, log in logs.items():
        log.sort()
        n_del = sum(1 for *_, d in log if d)
        res = sum(1 for (_, _, a), (_, _, b) in zip(log, log[1:]) if a and not b)
        r = got[uid]
        assert (r.n_ops, r.n_deletes, r.n_resurrections, r.is_live) == (
            len(log), n_del, res, 0 if log[-1][2] else 1,
        ), uid


# ---------------------------------------------------------------------------
# events_anomaly_seasonal


def test_anomaly_seasonal_baseline_and_flags(spark, sf_dir):
    """expected_milli is the exact hod-mean of the emitted buckets, the
    per-type residuals are centered enough that flags are a strict
    subset of |resid - med| > 3*MAD, and every (type, bucket) of the raw
    rollup appears exactly once."""
    rows = REGISTRY["events_anomaly_seasonal"].spark(spark, sf_dir).collect()
    assert rows
    assert len({(r.event_type, r.bucket_us) for r in rows}) == len(rows)
    by_hod = {}
    for r in rows:
        key = (r.event_type, (r.bucket_us // 3_600_000_000) % 24)
        by_hod.setdefault(key, []).append(r)
    for key, rs in by_hod.items():
        exp = sum(x.n_events for x in rs) * 1000 // len(rs)
        for r in rs:
            assert r.expected_milli == exp, key
            assert r.resid_milli == r.n_events * 1000 - exp
    for r in rows:
        want = int(r.mad > 0 and abs(r.resid_milli - r.med) > 3 * r.mad)
        assert r.is_anomaly == want


# ---------------------------------------------------------------------------
# stats_theilsen_slope


def test_theilsen_matches_pure_python(spark, sf_dir):
    """Brute-force pairwise-slope median in python agrees (slope to the
    rounded output, pair count exactly)."""
    import statistics

    from cdc_dedupe_spark.tables import table

    rows = REGISTRY["stats_theilsen_slope"].spark(spark, sf_dir).collect()
    ev = table(spark, sf_dir, "events").select("event_type", "ts").collect()
    import calendar

    buckets = {}
    for r in ev:
        us = int(calendar.timegm(r.ts.timetuple())) * 1_000_000 + r.ts.microsecond
        key = (r.event_type, us // 3_600_000_000)
        buckets[key] = buckets.get(key, 0) + 1
    for r in rows:
        pts = sorted(
            (x, y) for (t, x), y in buckets.items() if t == r.event_type
        )
        slopes = [
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1 :]
        ]
        assert r.n_pairs == len(slopes) and r.n_buckets == len(pts)
        assert abs(r.sen_slope_per_hour - statistics.median(slopes)) <= 5e-7


# ---------------------------------------------------------------------------
# stats_power_mde


def test_power_mde_consistency(spark, sf_dir):
    """MDE must be positive; if the observed |diff| >= MDE then the
    required n per arm cannot exceed the current min arm size by more
    than rounding (the defining inversion of the power formula)."""
    r = REGISTRY["stats_power_mde"].spark(spark, sf_dir).collect()[0]
    assert r.mde_cents > 0
    assert r.n1 > 1 and r.n2 > 1
    if r.n_per_arm_for_observed is not None:
        # inversion sanity: detecting a SMALLER diff needs MORE samples
        assert (abs(r.mean_diff_cents) >= r.mde_cents) == (
            r.n_per_arm_for_observed <= max(r.n1, r.n2)
        ) or abs(abs(r.mean_diff_cents) - r.mde_cents) < 1e-2


# ---------------------------------------------------------------------------
# ml_knn_classify


def test_knn_classify_votes_match_edges(spark, sf_dir):
    """Recompute the majority vote in python from the DECLARED edge list;
    the confusion matrix must agree cell-for-cell and cover every vector
    that has at least one neighbor."""
    from cdc_dedupe_spark.tables import table

    edges = REGISTRY["ann_knn_graph"].spark(spark, sf_dir).collect()
    labels = {
        r.vec_id: r.label
        for r in table(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    votes = {}
    for e in edges:
        votes.setdefault(e.vec_id, {}).setdefault(labels[e.nbr_id], 0)
        votes[e.vec_id][labels[e.nbr_id]] += 1
    conf = {}
    for vid, vs in votes.items():
        pred = min(vs.items(), key=lambda t: (-t[1], t[0]))[0]
        key = (labels[vid], pred)
        conf[key] = conf.get(key, 0) + 1
    got = {
        (r.true_label, r.pred_label): r.n
        for r in REGISTRY["ml_knn_classify"].spark(spark, sf_dir).collect()
    }
    assert got == conf


# ---------------------------------------------------------------------------
# events_markov_stationary


def test_markov_iterations_conserve_mass(spark, sf_dir):
    """Each power iteration conserves probability mass up to the
    truncation loss (<= one ppm unit per matrix cell), and iterating
    moves pi toward the chain's fixed point: ||pi2 - pi1||_1 <=
    ||pi1 - pi0||_1 (contraction of the stochastic matrix)."""
    rows = REGISTRY["events_markov_stationary"].spark(spark, sf_dir).collect()
    k = len(rows)
    assert k >= 2
    cells = k * k
    for tot in (
        sum(r.pi0_ppm for r in rows),
        sum(r.pi1_ppm for r in rows),
        sum(r.pi2_ppm for r in rows),
    ):
        assert 1_000_000 - cells - k <= tot <= 1_000_000
    d01 = sum(abs(r.pi1_ppm - r.pi0_ppm) for r in rows)
    d12 = sum(abs(r.pi2_ppm - r.pi1_ppm) for r in rows)
    assert d12 <= d01 + cells  # contraction, truncation slack


# ---------------------------------------------------------------------------
# multimodal_dedup_exact


def test_cas_dedup_accounting(spark, sf_dir):
    """Digest groups partition the corpus: keeper count == distinct
    payloads, copies sum to corpus size, and a python hashlib recompute
    agrees on every group."""
    import hashlib

    from cdc_dedupe_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text").collect()
    groups = {}
    for d in docs:
        h = hashlib.md5(d.text.encode()).hexdigest()
        g = groups.setdefault(h, [set(), []])
        g[0].add(d.source)
        g[1].append(d.doc_id)
    got = REGISTRY["multimodal_dedup_exact"].spark(spark, sf_dir).collect()
    assert len(got) == len(groups)
    assert sum(r.n_copies for r in got) == len(docs)
    by_keeper = {r.keeper_id: r for r in got}
    for srcs, ids in groups.values():
        r = by_keeper[min(ids)]
        assert (r.n_copies, r.n_sources) == (len(ids), len(srcs))
        assert r.reclaimable_bytes == (len(ids) - 1) * r.n_bytes


# ---------------------------------------------------------------------------
# sort_shipping_priority


def test_q3_revenue_and_filters(spark, sf_dir):
    """Every emitted order must satisfy both date filters and the
    segment filter; revenue recomputed in python from the raw tables
    agrees exactly (cent.bp integers)."""
    from cdc_dedupe_spark.tables import table

    rows = REGISTRY["sort_shipping_priority"].spark(spark, sf_dir).collect()
    assert rows and len(rows) <= 10
    cust = {
        r.c_custkey
        for r in table(spark, sf_dir, "customer")
        .where("c_mktsegment = 'BUILDING'")
        .select("c_custkey")
        .collect()
    }
    orders = {
        r.o_orderkey: (r.o_custkey, r.o_orderdate, r.o_orderpriority)
        for r in table(spark, sf_dir, "orders").collect()
    }
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"
    ).collect()
    import datetime

    cutoff = datetime.datetime(1998, 6, 1)
    rev = {}
    for l in li:
        if l.l_shipdate > cutoff and l.l_orderkey in orders:
            ck, od, _ = orders[l.l_orderkey]
            if ck in cust and od < cutoff:
                rev[l.l_orderkey] = rev.get(l.l_orderkey, 0) + round(
                    l.l_extendedprice * 100
                ) * (100 - round(l.l_discount * 100))
    revs = sorted(rev.values(), reverse=True)
    for r in rows:
        assert rev[r.l_orderkey] == r.revenue_cbp
    assert [r.revenue_cbp for r in rows] == revs[: len(rows)]


# ---------------------------------------------------------------------------
# events_sequence_match


def test_sequence_match_pure_python(spark, sf_dir):
    """Per-user python scan over the ordered event list reproduces the
    click->purchase-within-3 counts."""
    from cdc_dedupe_spark.tables import table

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    paths = {}
    for r in ev:
        paths.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    got = {
        r.user_id: (r.n_clicks, r.n_matched, r.match_bp)
        for r in REGISTRY["events_sequence_match"].spark(spark, sf_dir).collect()
    }
    for uid, p in paths.items():
        p.sort()
        types = [t for *_, t in p]
        clicks = sum(1 for t in types if t == "click")
        matched = sum(
            1
            for i, t in enumerate(types)
            if t == "click" and "purchase" in types[i + 1 : i + 4]
        )
        bp = matched * 10000 // clicks if clicks else 0
        assert got[uid] == (clicks, matched, bp), uid


# ---------------------------------------------------------------------------
# ts_rolling_median


def test_rolling_median_trailing_window(spark, sf_dir):
    """Python recompute of the trailing 24h median per bucket matches
    (time-accurate RANGE frame, dyadic interpolation)."""
    import statistics

    rows = REGISTRY["ts_rolling_median"].spark(spark, sf_dir).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.bucket_us, r.n_events))
    win = 24 * 3_600_000_000
    for r in rows:
        vals = [
            n
            for b, n in by_type[r.event_type]
            if r.bucket_us - win <= b <= r.bucket_us
        ]
        assert r.n_window == len(vals)
        assert r.roll_med == float(statistics.median(vals)), (r.event_type, r.bucket_us)


# ---------------------------------------------------------------------------
# ml_score_lift_deciles


def test_lift_deciles_partition_and_rates(spark, sf_dir):
    """Deciles cover every scored doc exactly once, rates are exact, and
    the decile ranges are disjoint and ordered."""
    rows = sorted(
        REGISTRY["ml_score_lift_deciles"].spark(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    lm = REGISTRY["text_lm_bigram"].spark(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == len(lm)
    for r in rows:
        assert 0 <= r.decile <= 9
        assert r.keep_bp == r.n_keep * 10000 // r.n_docs
        assert r.score_min <= r.score_max
    for a, b in zip(rows, rows[1:]):
        assert a.score_max < b.score_min


# ---------------------------------------------------------------------------
# dedup_minhash_precision_audit


def test_minhash_audit_bounds(spark, sf_dir):
    """Audit invariants: candidate precision is a valid bp fraction of
    emitted pairs, the mean signature error is bounded by 10000 bp, and
    the pair count equals the declared candidate list's."""
    r = REGISTRY["dedup_minhash_precision_audit"].spark(spark, sf_dir).collect()[0]
    n_cand = REGISTRY["dedup_minhash_exact"].spark(spark, sf_dir).count()
    assert r.n_pairs == n_cand
    assert 0 <= r.n_true_half <= r.n_pairs
    if r.n_pairs:
        assert r.precision_bp == r.n_true_half * 10000 // r.n_pairs
    assert 0 <= r.mean_abs_err_bp <= 10000


# ---------------------------------------------------------------------------
# cdc_snapshot_asof


def test_snapshot_asof_no_future_leak(spark, sf_dir):
    """The snapshot equals a python last-wins fold over events at or
    before T; entities born after T are absent; staleness is
    non-negative."""
    import calendar

    from cdc_dedupe_spark.queries.cdc import _ASOF_T_US
    from cdc_dedupe_spark.tables import table

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", "ts"
    ).collect()
    state = {}
    for r in ev:
        us = int(calendar.timegm(r.ts.timetuple())) * 1_000_000 + r.ts.microsecond
        if us <= _ASOF_T_US:
            cur = state.setdefault(r.user_id, [])
            cur.append((us, r.event_id, r.event_type, round(r.value * 100)))
    got = {r.user_id: r for r in REGISTRY["cdc_snapshot_asof"].spark(spark, sf_dir).collect()}
    assert set(got) == set(state)
    for uid, versions in state.items():
        versions.sort()
        us, eid, et, cents = versions[-1]
        r = got[uid]
        assert (r.version_at_t, r.asof_event_id, r.asof_event_type, r.asof_cents) == (
            len(versions), eid, et, cents,
        )
        assert r.staleness_us == _ASOF_T_US - us >= 0


# ---------------------------------------------------------------------------
# window_first_last_value


def test_first_last_value_frame_semantics(spark, sf_dir):
    """min/max in-priority values must equal the true group extremes for
    every row (the unbounded-frame contract), and nth_value(2) is the
    second-smallest with the key tie-break."""
    rows = REGISTRY["window_first_last_value"].spark(spark, sf_dir).collect()
    groups = {}
    for r in rows:
        groups.setdefault(r.o_orderpriority, []).append(r)
    for prio, rs in groups.items():
        ordered = sorted(rs, key=lambda r: (r.cents, r.o_orderkey))
        lo, hi, second = ordered[0].cents, ordered[-1].cents, ordered[1].cents
        for r in rs:
            assert (r.min_cents_in_prio, r.max_cents_in_prio) == (lo, hi), prio
            assert r.second_cents_in_prio == second


# ---------------------------------------------------------------------------
# stream_user_features


def test_stream_user_features_matches_batch_twin(spark, sf_dir):
    """The streaming complete-mode rows must agree with the batch
    events_user_features on every shared column (the lambda->kappa
    consolidation contract); breadth via indicator-sum == countDistinct."""
    got = {
        r.user_id: r
        for r in REGISTRY["stream_user_features"].spark(spark, sf_dir).collect()
    }
    batch = {
        r.user_id: r
        for r in REGISTRY["events_user_features"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(batch)
    for uid, b in batch.items():
        s = got[uid]
        assert (s.n_events, s.n_purchases, s.n_types, s.spend_cents) == (
            b.n_events, b.n_purchases, b.n_types, b.spend_cents,
        ), uid


# ---------------------------------------------------------------------------
# doc_chunk_overlap


def test_chunk_overlap_reconstruction(spark, sf_dir):
    """Chunks tile every document: stride spacing, window bound, overlap
    accounting (sum of chunk tokens - overlaps == doc tokens), and the
    chunk text matches a python slice."""
    from cdc_dedupe_spark.queries.llm_ext import _OVL_S, _OVL_W
    from cdc_dedupe_spark.tables import table

    docs = {
        r.doc_id: r.text.split(" ")
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    rows = REGISTRY["doc_chunk_overlap"].spark(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        toks = docs[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        total = 0
        for c in chunks:
            start0 = c.chunk_idx * _OVL_S
            want = toks[start0 : start0 + _OVL_W]
            assert c.chunk_text == " ".join(want)
            assert c.n_chunk_tokens == len(want) <= _OVL_W
            total += c.n_chunk_tokens - c.n_overlap_tokens
        assert total == len(toks), doc_id


# ---------------------------------------------------------------------------
# graph_assortativity


def test_assortativity_matches_pure_python(spark, sf_dir):
    """Newman coefficient recomputed from the declared edge list with
    python floats agrees to the rounded output; value in [-1, 1]."""
    edges = REGISTRY["ann_knn_graph"].spark(spark, sf_dir).collect()
    und = {tuple(sorted((e.vec_id, e.nbr_id))) for e in edges}
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in und:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    r = (n * sxy - sx * sy) / ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    got = REGISTRY["graph_assortativity"].spark(spark, sf_dir).collect()[0]
    assert got.n_directed_edges == n
    assert abs(got.assortativity - r) <= 5e-6
    assert -1.0 <= got.assortativity <= 1.0


# ---------------------------------------------------------------------------
# events_entropy_profile


def test_entropy_profile_bounds_and_python(spark, sf_dir):
    """Entropy in [0, ln(n_types)] micro-nats (+1 ulp rounding slack per
    term) and equal to a python recompute with identical snapping."""
    import math

    from cdc_dedupe_spark.tables import table

    ev = table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    mix = {}
    for r in ev:
        mix.setdefault(r.user_id, {}).setdefault(r.event_type, 0)
        mix[r.user_id][r.event_type] += 1
    got = {
        r.user_id: r
        for r in REGISTRY["events_entropy_profile"].spark(spark, sf_dir).collect()
    }
    for uid, counts in mix.items():
        n = sum(counts.values())
        want = -sum(
            round((c / n) * math.log(c / n) * 1000000) for c in counts.values()
        )
        r = got[uid]
        assert (r.n_events, r.n_types, r.entropy_unat) == (n, len(counts), want)
        assert -len(counts) <= r.entropy_unat <= math.log(len(counts)) * 1e6 + len(counts)


# ---------------------------------------------------------------------------
# stats_gini_spend


def test_gini_matches_sorted_rank_formula(spark, sf_dir):
    """Classic sorted-rank Gini in python (G = 2*sum(i*x_i)/(n*sum x)
    - (n+1)/n over ascending x with averaged tie handling via the
    value-domain identity) agrees with the rollup form."""
    from cdc_dedupe_spark.tables import table

    ev = table(spark, sf_dir, "events").where("event_type = 'purchase'").select(
        "user_id", "value"
    ).collect()
    spend = {}
    for r in ev:
        spend[r.user_id] = spend.get(r.user_id, 0) + round(r.value * 100)
    xs = sorted(spend.values())
    n, total = len(xs), sum(xs)
    two_s = 2 * sum((i + 1) * x for i, x in enumerate(xs))
    g = two_s / (n * total) - (n + 1) / n
    r = REGISTRY["stats_gini_spend"].spark(spark, sf_dir).collect()[0]
    assert (r.n_users, r.total_cents) == (n, total)
    assert abs(r.gini - g) <= 5e-7
    assert 0.0 <= r.gini < 1.0


# ---------------------------------------------------------------------------
# text_js_divergence


def test_jsd_bounds_and_self_divergence(spark, sf_dir):
    """JSD is bounded by ln 2 micro-nats (+ per-term rounding slack) and
    non-negative up to the same slack; sources with more tokens diverge
    less from the corpus they dominate (sanity, not exact law —
    asserted only for the extreme pair)."""
    rows = REGISTRY["text_js_divergence"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        slack = r.n_vocab + 2
        assert -slack <= r.jsd_unat <= 693148 + slack, r
        assert r.n_vocab <= r.n_tokens


# ---------------------------------------------------------------------------
# agg_weighted_median


def test_weighted_median_expansion_equivalence(spark, sf_dir):
    """The weighted quartiles equal plain quartiles of the weight-
    EXPANDED multiset (the defining property), computed in python."""
    from cdc_dedupe_spark.tables import table

    li = table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_quantity"
    ).collect()
    expanded = []
    for r in li:
        expanded += [round(r.l_extendedprice * 100)] * int(round(r.l_quantity))
    expanded.sort()
    W = len(expanded)

    def lower_q(j, k):  # smallest v with k*cum >= j*W
        # equals element at ceil(j*W/k) in 1-indexed expanded order
        idx = -(-j * W // k)
        return expanded[idx - 1]

    r = REGISTRY["agg_weighted_median"].spark(spark, sf_dir).collect()[0]
    assert r.total_weight == W
    assert r.w_p25_cents == lower_q(1, 4)
    assert r.w_median_cents == lower_q(1, 2)
    assert r.w_p75_cents == lower_q(3, 4)


# ---------------------------------------------------------------------------
# ml_kmeans_elbow


def test_elbow_inertia_monotone_in_k(spark, sf_dir):
    """More seed centroids can only LOWER the per-vector min distance,
    so mean inertia must be non-increasing in k (nested seed sets:
    seeds(2) subset of seeds(4) subset of seeds(8))."""
    rows = sorted(
        REGISTRY["ml_kmeans_elbow"].spark(spark, sf_dir).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == [2, 4, 8]
    assert len({r.n_vecs for r in rows}) == 1
    assert rows[0].mean_inertia >= rows[1].mean_inertia >= rows[2].mean_inertia >= 0


# ---------------------------------------------------------------------------
# dedup_lsh_tuning_curve


def test_lsh_curve_monotone_and_consistent(spark, sf_dir):
    """Collision rate must be a valid fraction per bucket, the measured
    curve must rise from the lowest to the highest populated bucket
    (the S-curve's defining trend), and exact duplicates (bucket 10)
    must always collide."""
    rows = sorted(
        REGISTRY["dedup_lsh_tuning_curve"].spark(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    assert rows
    for r in rows:
        assert 0 <= r.n_collided <= r.n_pairs
        assert r.collide_bp == r.n_collided * 10000 // r.n_pairs
        assert 0 <= r.theory_bp <= 10000
    assert rows[-1].collide_bp >= rows[0].collide_bp
    top = [r for r in rows if r.bucket == 10]
    if top:
        assert top[0].collide_bp == 10000


# ---------------------------------------------------------------------------
# events_survival_km


def test_km_matches_pure_python(spark, sf_dir):
    """Independent KM implementation (float products, not log sums)
    agrees to rounding; the curve is non-increasing and starts <= 1."""
    import math

    from cdc_dedupe_spark.tables import table

    ev = table(spark, sf_dir, "events").select("user_id", "ts").collect()
    import calendar

    times = {}
    for r in ev:
        us = int(calendar.timegm(r.ts.timetuple())) * 1_000_000 + r.ts.microsecond
        times.setdefault(r.user_id, []).append(us)
    horizon = max(u for v in times.values() for u in v)
    obs = []
    day = 86_400_000_000
    for v in times.values():
        v.sort()
        if len(v) >= 2:
            obs.append(((v[1] - v[0]) // day, 1))
        else:
            obs.append(((horizon - v[0]) // day, 0))
    rows = sorted(
        REGISTRY["events_survival_km"].spark(spark, sf_dir).collect(),
        key=lambda r: r.t_days,
    )
    n_risk = len(obs)
    s = 1.0
    by_t = {}
    for t in sorted({t for t, _ in obs}):
        d = sum(1 for tt, e in obs if tt == t and e)
        leaving = sum(1 for tt, _ in obs if tt == t)
        if d:
            by_t[t] = (d, n_risk, s * (n_risk - d) / n_risk if d < n_risk else 0.0)
            s = by_t[t][2]
        n_risk -= leaving
    assert [(r.t_days, r.n_events, r.n_risk) for r in rows] == [
        (t, d, n) for t, (d, n, _) in sorted(by_t.items())
    ]
    prev = 1.0
    for r in rows:
        want = by_t[r.t_days][2]
        # micro-nat snapping per term: tolerance ~ n_terms ulps
        assert abs(r.survival_r - want) <= 5e-5, (r.t_days, r.survival_r, want)
        assert r.survival_r <= prev + 1e-9
        prev = r.survival_r


# ---------------------------------------------------------------------------
# stats_benford_test


def test_benford_shares_and_terms(spark, sf_dir):
    """Digits 1..9 partition the orders, observed shares sum to ~1, the
    Benford expectations match the closed form, and chi2 terms are
    non-negative."""
    import math

    rows = REGISTRY["stats_benford_test"].spark(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    total = sum(r.n for r in rows)
    for r in rows:
        assert r.observed_bp == r.n * 10000 // total
        assert r.benford_bp == round(math.log10(1 + 1 / r.digit) * 10000)
        assert r.chi2_term >= 0.0
    assert 10000 - 9 <= sum(r.observed_bp for r in rows) <= 10000


# ---------------------------------------------------------------------------
# text_burstiness


def test_burstiness_zero_folding_identity(spark, sf_dir):
    """The moments form must equal the literal VMR over per-doc counts
    WITH zeros materialized (python recompute) for every emitted token."""
    from cdc_dedupe_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    counts = {}
    for d in docs:
        for w in d.text.split(" "):
            if w:
                counts.setdefault(w, {}).setdefault(d.doc_id, 0)
                counts[w][d.doc_id] += 1
    n_docs = len(docs)
    rows = REGISTRY["text_burstiness"].spark(spark, sf_dir).collect()
    assert rows
    prev = None
    for r in rows:
        per_doc = list(counts[r.tok].values()) + [0] * (n_docs - len(counts[r.tok]))
        mean = sum(per_doc) / n_docs
        var = sum((x - mean) ** 2 for x in per_doc) / n_docs
        assert abs(r.burstiness - var / mean) <= 5e-7, r.tok
        assert r.df == len(counts[r.tok]) and r.total_count == sum(per_doc)
        if prev is not None:
            assert r.burstiness <= prev + 1e-9
        prev = r.burstiness


# ---------------------------------------------------------------------------
# events_lorenz_curve


def test_lorenz_consistency_with_gini(spark, sf_dir):
    """Shares sum to ~10000 bp, users partition, the curve is convex-ish
    (later deciles hold at least the per-user share of earlier ones),
    and total spend matches stats_gini_spend."""
    rows = sorted(
        REGISTRY["events_lorenz_curve"].spark(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    g = REGISTRY["stats_gini_spend"].spark(spark, sf_dir).collect()[0]
    assert sum(r.n_users for r in rows) == g.n_users
    assert sum(r.spend_cents for r in rows) == g.total_cents
    assert 10000 - len(rows) <= sum(r.share_bp for r in rows) <= 10000
    # monotone per-user mean spend across deciles (the sort-order law)
    means = [r.spend_cents / r.n_users for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(means, means[1:]))


# ---------------------------------------------------------------------------
# agg_skew_kurtosis


def test_skew_kurtosis_pure_python(spark, sf_dir):
    """Literal central-moment recompute in python floats agrees with the
    exact-integer binomial-expansion form."""
    from cdc_dedupe_spark.tables import table

    ev = table(spark, sf_dir, "events").select("event_type", "value").collect()
    groups = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(round(r.value * 100))
    got = {r.event_type: r for r in REGISTRY["agg_skew_kurtosis"].spark(spark, sf_dir).collect()}
    for et, xs in groups.items():
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        r = got[et]
        assert r.n == n
        assert abs(r.skewness - m3 / m2 ** 1.5) <= 1e-4
        assert abs(r.excess_kurtosis - (m4 / m2 ** 2 - 3)) <= 1e-4


# ---------------------------------------------------------------------------
# doc_dedup_survivorship


def test_survivorship_accounting(spark, sf_dir):
    """Keepers across sources sum to the distinct-payload count, every
    doc is counted once, and cross-source losses can't exceed total
    losses; python recompute agrees per source."""
    import hashlib

    from cdc_dedupe_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text").collect()
    groups = {}
    for d in docs:
        groups.setdefault(hashlib.md5(d.text.encode()).hexdigest(), []).append(d)
    stats = {}
    for g in groups.values():
        keeper = min(g, key=lambda d: d.doc_id)
        for d in g:
            s = stats.setdefault(d.source, [0, 0, 0])
            s[0] += 1
            if d.doc_id == keeper.doc_id:
                s[1] += 1
            elif d.source != keeper.source:
                s[2] += 1
    got = {r.source: r for r in REGISTRY["doc_dedup_survivorship"].spark(spark, sf_dir).collect()}
    assert set(got) == set(stats)
    for src, (n, k, lc) in stats.items():
        r = got[src]
        assert (r.n_docs, r.n_keepers, r.n_lost_cross_source) == (n, k, lc)
        assert r.keeper_bp == k * 10000 // n
    assert sum(r.n_keepers for r in got.values()) == len(groups)


# ---------------------------------------------------------------------------
# stats_mutual_information


def test_mi_identities(spark, sf_dir):
    """MI >= 0 (up to per-cell snapping slack), MI <= joint entropy, and
    a python recompute with identical snapping agrees exactly."""
    import math

    from cdc_dedupe_spark.tables import table

    ev = table(spark, sf_dir, "events").select("event_type", "ts").collect()
    import calendar

    cells = {}
    for r in ev:
        us = int(calendar.timegm(r.ts.timetuple())) * 1_000_000 + r.ts.microsecond
        key = (r.event_type, (us // 3_600_000_000) % 24)
        cells[key] = cells.get(key, 0) + 1
    n = sum(cells.values())
    ri, cj = {}, {}
    for (t, h), v in cells.items():
        ri[t] = ri.get(t, 0) + v
        cj[h] = cj.get(h, 0) + v
    mi = sum(
        round((v / n) * math.log(v * n / (ri[t] * cj[h])) * 1000000)
        for (t, h), v in cells.items()
    )
    hj = sum(round(-(v / n) * math.log(v / n) * 1000000) for v in cells.values())
    r = REGISTRY["stats_mutual_information"].spark(spark, sf_dir).collect()[0]
    assert (r.n_cells, r.mi_unat, r.h_joint_unat) == (len(cells), mi, hj)
    assert r.mi_unat >= -r.n_cells
    assert r.mi_unat <= r.h_joint_unat


# ---------------------------------------------------------------------------
# ml_score_auc


def test_auc_matches_pair_enumeration(spark, sf_dir):
    """Brute-force P(score+ > score-) + 0.5*P(tie) over all (pos, neg)
    pairs equals the rank-sum AUC (the defining identity)."""
    lm = {r.doc_id: r.lm_score_ppm for r in REGISTRY["text_lm_bigram"].spark(spark, sf_dir).collect()}
    gate = {r.doc_id: r.keep for r in REGISTRY["pipeline_quality_gate"].spark(spark, sf_dir).collect()}
    pos = [lm[d] for d in lm if gate[d] == 1]
    neg = [lm[d] for d in lm if gate[d] == 0]
    wins = ties = 0
    for p in pos:
        for q in neg:
            if p > q:
                wins += 1
            elif p == q:
                ties += 1
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    r = REGISTRY["ml_score_auc"].spark(spark, sf_dir).collect()[0]
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
    assert abs(r.auc - want) <= 5e-7
    assert 0.0 <= r.auc <= 1.0


# ---------------------------------------------------------------------------
# text_heaps_law_curve


def test_heaps_curve_totals_and_monotonicity(spark, sf_dir):
    """The final checkpoint must equal the whole-corpus token and vocab
    totals, both cumulatives are strictly monotone, and the new-vocab
    rate falls from the first to the last decile (vocabulary saturates
    — the Heaps'-bound evidence the query exists to produce)."""
    from cdc_dedupe_spark.tables import table

    rows = sorted(
        REGISTRY["text_heaps_law_curve"].spark(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    docs = table(spark, sf_dir, "documents").select("text").collect()
    toks = [w for d in docs for w in d.text.split(" ") if w]
    assert rows[-1].tokens_cum == len(toks)
    assert rows[-1].vocab_cum == len(set(toks))
    for a, b in zip(rows, rows[1:]):
        assert b.tokens_cum > a.tokens_cum and b.vocab_cum >= a.vocab_cum
    assert rows[-1].new_vocab_ppm < rows[0].new_vocab_ppm


# ---------------------------------------------------------------------------
# stats_runs_test


def test_runs_test_pure_python(spark, sf_dir):
    """Independent runs count over the ordered above/below sequence
    (exact-median rows dropped) agrees; n1 + n2 equals the surviving
    bucket count; z is finite."""
    import math
    from cdc_dedupe_spark.tables import table
    import calendar

    ev = table(spark, sf_dir, "events").select("event_type", "ts").collect()
    buckets = {}
    for r in ev:
        us = int(calendar.timegm(r.ts.timetuple())) * 1_000_000 + r.ts.microsecond
        key = (r.event_type, us // 3_600_000_000)
        buckets[key] = buckets.get(key, 0) + 1
    got = {r.event_type: r for r in REGISTRY["stats_runs_test"].spark(spark, sf_dir).collect()}
    import statistics

    by_type = {}
    for (t, b), n in buckets.items():
        by_type.setdefault(t, []).append((b, n))
    for t, pts in by_type.items():
        pts.sort()
        med = statistics.median(n for _, n in pts)
        seq = [1 if n > med else 0 for _, n in pts if n != med]
        runs = sum(
            1 for i, u in enumerate(seq) if i == 0 or u != seq[i - 1]
        )
        r = got[t]
        assert (r.n1, r.n2, r.runs) == (sum(seq), len(seq) - sum(seq), runs), t
        if r.n1 > 0 and r.n2 > 0 and 2 * r.n1 * r.n2 > r.n1 + r.n2:
            assert math.isfinite(r.z_runs)
        else:
            # degenerate sequence: z undefined by contract
            assert r.z_runs is None
