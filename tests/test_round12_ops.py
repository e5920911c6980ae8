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
