"""Parallelism-defect detector tests (VERDICT r13 next-step #5a): the
event-log parser must flag single-task and skewed stages, and a real
Spark run with a deliberately serial kernel must be caught end-to-end."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

from cdc_dedupe_spark.diag import skew_flags, stage_stats

REPO = Path(__file__).resolve().parents[1]


def _job_start(job_id, stage_ids, group):
    return {
        "Event": "SparkListenerJobStart",
        "Job ID": job_id,
        "Stage Infos": [{"Stage ID": s} for s in stage_ids],
        "Properties": {"spark.jobGroup.id": group},
    }


def _task_end(stage_id, records, ms, shuffle_records=0):
    return {
        "Event": "SparkListenerTaskEnd",
        "Stage ID": stage_id,
        "Task Metrics": {
            "Executor Run Time": ms,
            "Input Metrics": {"Records Read": records},
            "Shuffle Read Metrics": {"Total Records Read": shuffle_records},
        },
    }


def _write_log(tmp_path, events):
    p = tmp_path / "app-123"
    p.write_text("\n".join(json.dumps(e) for e in events) + "\n")
    return str(p)


def test_skew_flags_serial_and_skewed_stages(tmp_path):
    events = [
        _job_start(0, [0], "serial_q"),
        # stage 0: ONE task, 2 s, 50k rows -> serial-stage
        _task_end(0, 50_000, 2_000),
        _job_start(1, [1], "skewed_q"),
        # stage 1: 4 tasks, one reads 95% of shuffle rows for 3 s -> task-skew
        _task_end(1, 0, 3_000, shuffle_records=95_000),
        _task_end(1, 0, 40, shuffle_records=2_000),
        _task_end(1, 0, 35, shuffle_records=2_000),
        _task_end(1, 0, 30, shuffle_records=1_000),
        _job_start(2, [2, 3], "healthy_q"),
        # stage 2: balanced wide stage -> no flag
        *[_task_end(2, 25_000, 900) for _ in range(8)],
        # stage 3: single task but FAST (one-row broadcast probe) -> no flag
        _task_end(3, 5_000, 120),
    ]
    log = _write_log(tmp_path, events)

    stats = {s.stage_id: s for s in stage_stats(log)}
    assert stats[0].group == "serial_q" and stats[0].n_tasks == 1
    assert stats[1].max_record_frac > 0.9
    assert stats[2].n_tasks == 8

    flags = {f["stage_id"]: f for f in skew_flags(log)}
    assert set(flags) == {0, 1}
    assert flags[0]["kind"] == "serial-stage" and flags[0]["query"] == "serial_q"
    assert flags[1]["kind"] == "task-skew" and flags[1]["query"] == "skewed_q"


def test_skew_flags_ignores_tiny_and_driverish_stages(tmp_path):
    events = [
        _job_start(0, [0, 1], "small_q"),
        # slow single task but under the record floor (driver-ish stage)
        _task_end(0, 10, 5_000),
        # enough records but fast
        _task_end(1, 100_000, 200),
    ]
    assert skew_flags(_write_log(tmp_path, events)) == []


_E2E_SCRIPT = """
import os, sys
os.environ["SPARK_GRAFT_EVENTLOG_DIR"] = sys.argv[1]
os.environ["SPARK_GRAFT_CPUS"] = "8"
sys.path.insert(0, sys.argv[2])
from cdc_dedupe_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("diag-e2e")
sc = spark.sparkContext
heavy = F.avg(F.xxhash64(F.sha2(F.concat_ws("-", F.col("id").cast("string"),
    F.lit("pad" * 10)), 256)))

sc.setJobGroup("serial_kernel", "serial_kernel")
# ONE partition carrying a compute-heavy kernel: the defect shape.
# 2M rows keeps the serial stage comfortably above the probe floor even
# on a warm JVM (600k measured 494 ms once, under the 500 ms test
# threshold — the one in-suite flake of r14).
spark.range(0, 2_000_000).coalesce(1).agg(heavy.alias("h")).collect()

sc.setJobGroup("wide_kernel", "wide_kernel")
spark.range(0, 2_000_000).repartition(8).agg(heavy.alias("h")).collect()
spark.stop()
"""


def test_skew_probe_catches_serial_kernel_end_to_end(tmp_path):
    """Sighting #12 must be caught automatically: a subprocess session
    (the session fixture has no event log) runs the same kernel serial
    then wide; the probe must flag exactly the serial run."""
    evdir = str(tmp_path / "evlog")
    subprocess.run(
        [sys.executable, "-c", _E2E_SCRIPT, evdir, str(REPO)],
        check=True,
        capture_output=True,
        timeout=300,
    )
    from cdc_dedupe_spark.diag import stage_stats

    stats = stage_stats(evdir)
    assert stats, f"no stages parsed from the event log dir: {evdir}"
    flags = skew_flags(evdir, min_task_sec=0.4)
    by_query = {f["query"] for f in flags}
    dump = [(s.stage_id, s.group, s.n_tasks, s.total_records, s.max_task_ms) for s in stats]
    assert "serial_kernel" in by_query, dump
    serial = [f for f in flags if f["query"] == "serial_kernel"]
    assert any(f["kind"] == "serial-stage" for f in serial)
    assert "wide_kernel" not in by_query, dump
