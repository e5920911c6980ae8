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
