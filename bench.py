#!/usr/bin/env python
"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

  {"metric": "declared_query_suite_wall", "value": <total sec>,
   "unit": "sec", "queries": {"q": sec, ...}, "sf": 0.1}

Per-query time = plan build + FULL plan execution (a one-row hash-fold of
every output column — count() would let Catalyst prune computed columns
and silently skip map-only kernels; driver transfer stays O(1) so the
measurement is engine time, not driver materialization). BASELINE.md
targets: <= 30 s/query, <= 15 min suite at sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf")) if Path(sf_dir).name.startswith("sf") else -1.0

    # Parallelism-defect probe (diag.py, VERDICT r13 #5a): run under an
    # event log so single-task stages are flagged post-run. ALWAYS a
    # fresh per-run subdirectory — even when the user exports
    # SPARK_GRAFT_EVENTLOG_DIR (then used as the parent), so skew_flags
    # never parses a previous run's logs into this run's SKEW_LOCAL.json
    # (ADVICE r14 #3). Every log file in evlog_dir belongs to this bench.
    import tempfile

    _ev_base = os.environ.get("SPARK_GRAFT_EVENTLOG_DIR")
    if _ev_base:
        os.makedirs(_ev_base, exist_ok=True)
    evlog_dir = tempfile.mkdtemp(prefix="bench-evlog-", dir=_ev_base)
    os.environ["SPARK_GRAFT_EVENTLOG_DIR"] = evlog_dir

    from cdc_dedupe_spark.queries import REGISTRY
    from cdc_dedupe_spark.session import get_spark

    spark = get_spark("cdc-dedupe-spark-bench")

    from pyspark.sql import functions as F
    from pyspark.sql.types import MapType

    def _has_map(dt) -> bool:
        if dt is None:
            return False
        if isinstance(dt, MapType):
            return True
        if any(_has_map(f.dataType) for f in getattr(dt, "fields", [])):
            return True
        return _has_map(getattr(dt, "elementType", None))

    def force_full_plan(df) -> str:
        """Evaluate the WHOLE plan, driver transfer O(1); return the eval
        mode used.

        ``count()`` lets Catalyst PRUNE every computed column a plain
        projection emits — a map-only query measured by count() costs
        only its scan, hiding the actual kernel (r13: this masked a
        serial minhash signature pipeline for four rounds). A murmur3
        hash of every output column folded into one SUM forces full
        evaluation while collecting a single row.

        The count() fallback is chosen EXPLICITLY from the schema — only
        map-typed outputs, which hash() cannot take (those queries are
        aggregates whose plans count() cannot prune meaningfully). Real
        execution errors propagate to the per-query failure handler
        instead of being silently re-run under count() with a doubled,
        mislabeled time (ADVICE r13 #1)."""
        if any(_has_map(f.dataType) for f in df.schema.fields):
            df.count()
            return "count"
        df.agg(F.sum(F.hash(*[F.col(c) for c in df.columns]))).collect()
        return "hash"

    # Warm the JVM/Python-worker paths once so per-query numbers measure the
    # engine, not first-call startup (BASELINE.md: warm JVM, cached session).
    # Guarded: a broken single table must never zero the whole bench (r5).
    # cdc_dedupe_first warms the batch path; cdc_dedupe_stream warms the
    # streaming engine (state store, micro-batch planner, replay schema
    # cache) so the first measured streaming query isn't charged one-time
    # init — BASELINE.md's replay floor is a warm-engine number.
    # graph_cc_sizes + dedup_minhash_exact (VERDICT r13 #6): the iterative
    # join/CC machinery and the codegen'd hash/sort/agg spine JIT-compile
    # on first heavy use (~5 s, C2 tier), which used to land on whichever
    # queries sorted first alphabetically (agg_approx_distinct measured
    # 3.2 s in-suite vs 0.6 s solo-warm in r13) — pay it here, untimed.
    for warm in ("cdc_dedupe_first", "cdc_dedupe_stream", "graph_cc_sizes", "dedup_minhash_exact"):
        try:
            spark.sparkContext.setJobGroup("warmup", f"warmup:{warm}")
            force_full_plan(REGISTRY[warm].spark(spark, sf_dir))
        except Exception as e:
            print(f"bench warm-up {warm} failed (continuing): {type(e).__name__}: {e}", file=sys.stderr)

    # Fixed Structured-Streaming harness cost, measured ONCE on a warm
    # engine: a no-op availableNow query (stream the events file into a
    # single global count) costs ~1 s regardless of dataflow —
    # StreamExecution thread spawn, offset/commit WAL writes, file
    # listing, and 32 state-store instances. Every stream_* per-query
    # number below carries this constant, so the suite wall overstates
    # the streaming DATAFLOW cost by ~n_stream × overhead; the summary
    # fields let the reader (and BASELINE comparisons) separate the two
    # (VERDICT r8 "Next round" #6). Raw per-query numbers stay untouched
    # for round-over-round comparability.
    stream_overhead = None
    try:
        from cdc_dedupe_spark.sources.replay import events_stream
        from cdc_dedupe_spark.streaming.run import run_to_memory

        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_to_memory(
                events_stream(spark, sf_dir).groupBy().count(),
                "bench_noop_stream",
                output_mode="complete",
            ).count()
            samples.append(time.perf_counter() - t0)
        stream_overhead = round(sorted(samples)[1], 3)  # median of 3
    except Exception as e:
        print(f"stream overhead probe failed (continuing): {e}", file=sys.stderr)

    per_query: dict[str, float] = {}
    failures: dict[str, str] = {}
    count_eval: list[str] = []
    total = 0.0
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        # Tag the query's jobs so diag.skew_flags can attribute flagged
        # stages (streaming micro-batch jobs set their own group; those
        # flags carry the stream's run id instead — still readable).
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.perf_counter()
        try:
            mode = force_full_plan(q.spark(spark, sf_dir))
            dt = time.perf_counter() - t0
            per_query[name] = round(dt, 3)
            total += dt
            if mode == "count":
                count_eval.append(name)
        except Exception as e:  # record and continue; a failed query must not hide the rest
            failures[name] = f"{type(e).__name__}: {e}"[:200]

    result = {
        "metric": "declared_query_suite_wall",
        "value": round(total, 3),
        "unit": "sec",
        # r13+: per-query time forces FULL plan evaluation (hash-fold of
        # every output column), where earlier rounds used count() and
        # under-measured pruned map-only kernels. Cross-round per-query
        # comparisons straddle that boundary.
        "eval": "full-plan-hash",
        "queries": per_query,
        "sf": sf,
    }
    if count_eval:
        # Per-query eval-mode record (ADVICE r13 #1): these map-typed
        # outputs were evaluated via count(), not the hash fold.
        result["count_eval"] = sorted(count_eval)
    stream_names = [n for n in per_query if n.startswith("stream_") or n == "cdc_dedupe_stream"]
    if stream_overhead is not None and stream_names:
        fam_wall = sum(per_query[n] for n in stream_names)
        result["stream_harness_overhead_sec"] = stream_overhead
        result["stream_family"] = {
            "n_queries": len(stream_names),
            "wall_sec": round(fam_wall, 3),
            "dataflow_sec": round(max(0.0, fam_wall - stream_overhead * len(stream_names)), 3),
        }
    # BASELINE.md floor: streaming dedupe replay >= 5,000 events/s.
    if "cdc_dedupe_stream" in per_query and per_query["cdc_dedupe_stream"] > 0:
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        result["stream_events_per_s"] = round(n_events / per_query["cdc_dedupe_stream"], 1)
    if failures:
        result["failures"] = failures

    # Parallelism-defect sweep (diag.py): the event log is complete once
    # the session stops; parse it and persist per-stage flags. The
    # printed line carries only the count — SKEW_LOCAL.json has details.
    spark.stop()
    try:
        from cdc_dedupe_spark.diag import skew_flags

        flags = [f for f in skew_flags(evlog_dir, min_task_sec=1.0) if f["query"] != "warmup"]
        Path(_REPO, "SKEW_LOCAL.json").write_text(
            json.dumps({"sf": sf, "min_task_sec": 1.0, "flags": flags}, indent=1) + "\n"
        )
        result["skew_flags"] = len(flags)
        if flags:
            worst = max(flags, key=lambda f: f["max_task_sec"])
            print(f"skew flags: {len(flags)} (worst: {worst})", file=sys.stderr)
    except Exception as e:
        print(f"skew sweep failed (continuing): {type(e).__name__}: {e}", file=sys.stderr)

    # Persist the full result (the r3/r4 driver tail-capture truncated the
    # printed line), then print last so no JVM shutdown logs land after
    # the JSON and push it out of a tail window.
    Path(_REPO, "BENCH_LOCAL.json").write_text(json.dumps(result) + "\n")
    # The driver captures only the LAST 2000 bytes of output (measured:
    # BENCH_r04 tail == 2000 chars while the full line was 2629 -> parsed
    # null). Budget the printed line: keep the slowest queries (the ones
    # graded against the 30 s/query ceiling) until the line fits, and say
    # how many fast ones were dropped. The full per-query map is always in
    # BENCH_LOCAL.json above.
    budget = int(os.environ.get("SPARK_GRAFT_BENCH_LINE_BUDGET", "1900"))
    line = json.dumps(result, separators=(",", ":"))
    if len(line) > budget:
        slowest_first = sorted(per_query.items(), key=lambda kv: (-kv[1], kv[0]))
        result["queries"] = {}
        result["queries_omitted"] = len(slowest_first)
        result["full_queries_in"] = "BENCH_LOCAL.json"
        for name, secs in slowest_first:
            result["queries"][name] = secs
            result["queries_omitted"] -= 1
            trial = json.dumps(result, separators=(",", ":"))
            if len(trial) > budget:
                del result["queries"][name]
                result["queries_omitted"] += 1
                break
        line = json.dumps(result, separators=(",", ":"))
    sys.stdout.flush()
    sys.stderr.flush()
    print(line, flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
