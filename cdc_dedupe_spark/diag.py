"""Parallelism-defect detector (VERDICT r13 next-step #5a).

Eleven hand-found sightings across rounds 12-13 established a recurring
defect class: a stage whose work lands on ONE task (narrow-scan
inheritance, AQE coalescing byte-light-but-compute-heavy shuffles) runs a
per-row kernel serially while 31 cores idle. This module institutionalizes
the hunt: parse Spark's event log after a run and flag every stage where
one task processed (almost) everything — so sighting #12 is caught by the
bench harness automatically instead of by a human reading stage timelines.

Usage: enable the event log (get_spark honors SPARK_GRAFT_EVENTLOG_DIR),
tag each query with ``sc.setJobGroup(name, ...)``, then after the session
stops run ``skew_flags(log_dir)``. bench.py does exactly this and writes
SKEW_LOCAL.json; the flag count rides the printed bench line.

The event log is public Spark infrastructure (SparkListenerEvent JSON,
one object per line — the same stream the History Server renders), so the
probe adds zero instrumentation to query plans and nothing to the timed
region beyond Spark's own logging writer.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Iterable, Iterator


@dataclass
class StageStat:
    stage_id: int
    group: str  # spark.jobGroup.id of the job that submitted the stage
    n_tasks: int = 0
    total_records: int = 0  # input records + shuffle records read, all tasks
    max_task_records: int = 0
    max_task_ms: int = 0  # slowest task's executor run time
    total_ms: int = 0  # sum of task run times (the serialized work)
    _recs: list[int] = field(default_factory=list, repr=False)

    @property
    def max_record_frac(self) -> float:
        return self.max_task_records / self.total_records if self.total_records else 0.0


def _iter_log_lines(path: str) -> Iterator[str]:
    """Yield event-log JSON lines from a single-app log file, or from every
    plain log file under a directory (the bench points at its own private
    eventLog dir, so every file there belongs to the run being audited).
    Compressed/rolling logs are not handled — the session that writes the
    log sets compress=false, rolling=false (session.py)."""
    if os.path.isdir(path):
        for entry in sorted(os.listdir(path)):
            sub = os.path.join(path, entry)
            if os.path.isfile(sub) and not entry.startswith("."):
                yield from open(sub, encoding="utf-8")
    else:
        yield from open(path, encoding="utf-8")


def stage_stats(log_path: str) -> list[StageStat]:
    """Aggregate per-stage task distributions from an event log.

    Records-per-task = Input Metrics "Records Read" + Shuffle Read Metrics
    "Total Records Read" — the rows the task actually consumed, which is
    the quantity the defect class concentrates on one task. Stages from
    jobs without an explicit job group keep the raw group id (streaming
    micro-batch jobs set their own), falling back to "ungrouped"."""
    stage_group: dict[int, str] = {}
    stats: dict[int, StageStat] = {}
    for line in _iter_log_lines(log_path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:  # truncated tail of an in-progress log
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            grp = (e.get("Properties") or {}).get("spark.jobGroup.id") or "ungrouped"
            for si in e.get("Stage Infos", []):
                stage_group[si["Stage ID"]] = grp
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            tm = e.get("Task Metrics") or {}
            rec = (tm.get("Input Metrics") or {}).get("Records Read", 0) or 0
            rec += (tm.get("Shuffle Read Metrics") or {}).get("Total Records Read", 0) or 0
            ms = tm.get("Executor Run Time", 0) or 0
            st = stats.get(sid)
            if st is None:
                st = stats[sid] = StageStat(sid, stage_group.get(sid, "ungrouped"))
            st.n_tasks += 1
            st.total_records += rec
            st.max_task_records = max(st.max_task_records, rec)
            st.max_task_ms = max(st.max_task_ms, ms)
            st.total_ms += ms
            st._recs.append(rec)
    return [stats[k] for k in sorted(stats)]


def skew_flags(
    log_path: str,
    min_task_sec: float = 1.0,
    record_frac: float = 0.8,
    min_records: int = 1000,
) -> list[dict]:
    """Flag stages exhibiting the single-task-does-everything defect.

    Two kinds:
    - ``serial-stage``: the stage ran as ONE task that took >= min_task_sec
      — the narrow-scan-inheritance shape (SCALING.md sightings 4-11).
    - ``task-skew``: multiple tasks, but one consumed >= record_frac of the
      stage's records AND took >= min_task_sec — the skewed-key / AQE-
      overcoalesce shape (sightings 1-3, 12+).

    min_task_sec filters the legitimate tiny single-task stages (one-row
    broadcast probes, availableNow bookkeeping, final single-partition
    folds); min_records filters driver-ish stages that genuinely have no
    distributable work. Thresholds are diagnostics, not proofs — a flag
    means "read this plan", not "this is wrong" (the r13 precision-audit
    fix started as exactly such a flag, found by hand)."""
    ms = min_task_sec * 1000.0
    flags: list[dict] = []
    for st in stage_stats(log_path):
        kind = None
        if st.max_task_ms >= ms and st.total_records >= min_records:
            if st.n_tasks == 1:
                kind = "serial-stage"
            elif st.max_record_frac >= record_frac:
                kind = "task-skew"
        if kind:
            flags.append(
                {
                    "query": st.group,
                    "stage_id": st.stage_id,
                    "kind": kind,
                    "n_tasks": st.n_tasks,
                    "max_task_sec": round(st.max_task_ms / 1000.0, 3),
                    "stage_task_sec": round(st.total_ms / 1000.0, 3),
                    "max_record_frac": round(st.max_record_frac, 4),
                    "total_records": st.total_records,
                }
            )
    return flags
