"""Round-18 operator tests: the cost-based-optimization (CBO) join-reorder
pin — completing the engine-native optimizer family after r16's DPP and
r17's AQE skew-split / runtime bloom pins — plus the ADVICE r17 guard for
pipeline_incremental_ingest's empty-increment round.

Same discipline as test_round15/16/17_ops: every scale claim gets an
executable plan pin and every result gets an independent twin."""

from __future__ import annotations

import pandas as pd

from cdc_dedupe_spark.queries.registry import REGISTRY


# ---------------------------------------------------------------------------
# pipeline_incremental_ingest: empty-increment round (ADVICE r17)


def test_incremental_ingest_empty_round(spark, tmp_path):
    """An events corpus spanning a SINGLE day makes ingest round 1 empty
    (mid == the only day, so `day < mid` matches nothing): the partitioned
    write emits no files for that generation and the query must degrade to
    zero round-1 rows — matching the oracle's day-split — instead of
    raising on an empty read path list (ADVICE r17)."""
    ev = pd.DataFrame(
        {
            "event_id": range(20),
            "ts": pd.to_datetime("2026-01-02 12:00:00")
            + pd.to_timedelta(range(20), unit="m"),
            "user_id": [i % 5 for i in range(20)],
            "event_type": ["view" if i % 2 else "click" for i in range(20)],
            "value": [float(i) for i in range(20)],
            "props": ["{}"] * 20,
        }
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev.to_parquet(tmp_path / "events.parquet", index=False)

    rows = (
        REGISTRY["pipeline_incremental_ingest"].spark(spark, str(tmp_path)).collect()
    )
    assert all(r.ingest_round == 2 for r in rows), rows
    got = {r.event_type: r.n_rows_ingested for r in rows}
    assert got == {"view": 10, "click": 10}
    assert all(r.n_rows_total_after == 20 for r in rows)
