"""Driver-window rotation hygiene (VERDICT r9 "Next round" #1 and #6).

The driver checks the first 50 entries of ``__spark_entry__.queries()``
per round. ``driver_order()`` must therefore (a) surface the stalest
verification debt first and (b) structurally bound how long any entry can
go without a driver CORRECTNESS row. These tests pin both against the
GENERATED history module so the r6-style staleness (window_* untouched
for three rounds) cannot silently recur.
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

from cdc_dedupe_spark.queries import REGISTRY, driver_order
from cdc_dedupe_spark.queries.driver_history import DRIVER_LAST_VERIFIED

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50


def test_driver_order_is_registry_permutation():
    order = driver_order()
    assert sorted(order) == sorted(REGISTRY)
    assert len(set(order)) == len(order)


def test_window_is_exactly_the_stalest_entries():
    """The first 50 names are the 50 smallest (last_verified, name) keys —
    i.e. the window always retires the oldest debt first."""
    order = driver_order()
    keyed = sorted(REGISTRY, key=lambda n: (DRIVER_LAST_VERIFIED.get(n, 0), n))
    assert order == keyed
    window_keys = {DRIVER_LAST_VERIFIED.get(n, 0) for n in order[:WINDOW]}
    rest_keys = {DRIVER_LAST_VERIFIED.get(n, 0) for n in order[WINDOW:]}
    assert max(window_keys) <= min(rest_keys)


def test_staleness_bound_is_structural():
    """No entry may be more than ceil(N / 50) rounds stale relative to the
    freshest history round: with LRU ordering, each round retires the 50
    stalest entries, so the spread between the newest and oldest verified
    rounds in the registry can never exceed the number of window-sweeps
    needed to cover the surface (+1 for the round in flight)."""
    rounds = [DRIVER_LAST_VERIFIED.get(n, 0) for n in REGISTRY]
    verified = [r for r in rounds if r > 0]
    assert verified, "history module is empty — run scripts/update_rotation.py"
    newest = max(verified)
    sweeps = -(-len(REGISTRY) // WINDOW)  # ceil
    # Entries with no history must fill the window FIRST. When fewer than
    # 50 exist they must all be inside; when a round adds more than 50 new
    # queries (round 12 added 40 on top of 13 carried), the correct
    # structural claim is saturation — the window contains ONLY
    # never-verified entries, and the leftovers are next round's front
    # (LRU order keys them at round 0, ahead of everything verified).
    never = [n for n in REGISTRY if DRIVER_LAST_VERIFIED.get(n, 0) == 0]
    window = driver_order()[:WINDOW]
    if len(never) <= WINDOW:
        assert all(n in window for n in never), (
            f"never-driver-verified entries outside the window: "
            f"{[n for n in never if n not in window]}"
        )
    else:
        assert all(DRIVER_LAST_VERIFIED.get(n, 0) == 0 for n in window), (
            "window not saturated with never-verified entries while "
            f"{len(never)} > {WINDOW} exist"
        )
    # Verified entries: oldest allowed round is newest - sweeps.
    stale = {
        n: DRIVER_LAST_VERIFIED[n]
        for n in REGISTRY
        if 0 < DRIVER_LAST_VERIFIED.get(n, 0) < newest - sweeps
        and n not in window
    }
    assert not stale, f"entries stale beyond the structural bound and not in window: {stale}"


def test_history_module_matches_committed_artifacts():
    """driver_history.py is generated — verify it agrees with the
    CORRECTNESS_r*.json files actually in the repo, so a forgotten
    regeneration fails loudly instead of skewing the window."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "update_rotation", REPO / "scripts" / "update_rotation.py"
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)

    tracked = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    latest: dict[str, int] = {}
    for p in sorted(REPO / f for f in tracked):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        for name, row in json.loads(p.read_text()).items():
            if not isinstance(row, dict):
                continue
            # Same pass + contract-reset policy as the generator (imported,
            # not duplicated, so the policies cannot drift apart).
            if rnd < gen.CONTRACT_RESETS.get(name, 0):
                continue
            if gen.row_passes(row):
                latest[name] = max(latest.get(name, 0), rnd)
    assert latest == DRIVER_LAST_VERIFIED, (
        "driver_history.py is out of date — run scripts/update_rotation.py"
    )


def test_r9_verification_debt_stayed_retired():
    """VERDICT r9 item 1 is DONE: the 9 never-driver-verified r9 additions
    plus the 6 r6-stale window_* entries all earned green rows in the r10
    window. Pin that the history reflects it — if any of them ever reads as
    pre-r10 again, the generated module (or an artifact) regressed."""
    targets = [
        "agg_cms_heavy_hitters", "join_bloom_prefilter", "join_fuzzy_band",
        "pipeline_quality_gate", "stats_two_sample", "stream_bloom_dedupe",
        "ts_ewma_hourly", "vec_pq_encode", "window_cume_dist",
        "window_lag_lead", "window_ntile", "window_percent_rank",
        "window_range_frame", "window_rank", "window_running_sum",
    ]
    regressed = {
        t: DRIVER_LAST_VERIFIED.get(t, 0)
        for t in targets
        if DRIVER_LAST_VERIFIED.get(t, 0) < 10
    }
    assert not regressed, f"r9 debt entries lost their r10+ driver rows: {regressed}"
