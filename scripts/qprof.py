#!/usr/bin/env python
"""Per-query optimization loop profiler (round 19).

Times individual registry queries exactly the way bench.py does (same
re-chunked corpus, same session confs, same full-plan hash-fold action)
but for a NAMED SUBSET, warm, N repetitions — the fast iterate-measure
loop the optimization guide §1 prescribes, without paying the full
284-query suite per iteration.

  python scripts/qprof.py dedup_minhash_cluster stream_sessionize_state_tws --n 3
  python scripts/qprof.py --explain dedup_minhash_cluster   # dump formatted plan
  python scripts/qprof.py --jobs dedup_minhash_cluster      # per-job wall breakdown

Never writes committed artifacts; BENCH_LOCAL.json stays owned by bench.py.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true", help="profile the whole registry once (build/action split CSV)")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--explain", action="store_true", help="print explain('formatted') instead of timing")
    ap.add_argument("--explain-out", default=None, help="write each query's plan to DIR/<name>.txt")
    ap.add_argument("--jobs", action="store_true", help="print per-job wall times from a status listener")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    import bench  # repo-root bench.py: reuse its corpus + eval methodology

    sf_dir, rechunked = bench._maybe_rechunk(args.sf_dir)
    from cdc_dedupe_spark.queries import REGISTRY
    from cdc_dedupe_spark.session import get_spark

    spark = get_spark("qprof")
    if rechunked:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))
        spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024))

    # Shared with bench.py (ADVICE r19 #5): one implementation of the
    # map-type detection + full-plan hash-fold, so the "exactly the way
    # bench.py does" guarantee cannot drift.
    force_full_plan = bench.force_full_plan

    if args.explain or args.explain_out:
        out_dir = Path(args.explain_out) if args.explain_out else None
        if out_dir:
            out_dir.mkdir(parents=True, exist_ok=True)
        for name in args.names:
            df = REGISTRY[name].spark(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            if out_dir:
                (out_dir / f"{name}.txt").write_text(txt)
                print(f"wrote {out_dir / (name + '.txt')}")
            else:
                print(f"===== {name} =====\n{txt}")
        return 0

    if not args.no_warm:
        for warm in ("cdc_dedupe_first", "cdc_dedupe_stream", "graph_cc_sizes", "dedup_minhash_exact"):
            try:
                spark.sparkContext.setJobGroup("warmup", f"warmup:{warm}")
                force_full_plan(REGISTRY[warm].spark(spark, sf_dir))
            except Exception as e:
                print(f"warm-up {warm} failed: {e}", file=sys.stderr)

    if args.all:
        # One warm pass over the whole registry, build (query construction,
        # incl. any eager jobs) vs action (the hash-fold execution) — the
        # guide-§1 "where does the second go" census.
        rows = []
        for name in sorted(REGISTRY):
            q = REGISTRY[name]
            spark.sparkContext.setJobGroup(name, name)
            t0 = time.perf_counter()
            try:
                df = q.spark(spark, sf_dir)
                t_build = time.perf_counter() - t0
                force_full_plan(df)
                t_total = time.perf_counter() - t0
                rows.append((name, t_build, t_total - t_build, t_total))
                print(f"{name},{t_build:.3f},{t_total - t_build:.3f},{t_total:.3f}", flush=True)
            except Exception as e:
                print(f"{name},ERROR,{type(e).__name__}: {e}", flush=True)
        tot_b = sum(r[1] for r in rows)
        tot_a = sum(r[2] for r in rows)
        print(f"# totals build={tot_b:.1f}s action={tot_a:.1f}s n={len(rows)}", flush=True)
        spark.stop()
        return 0

    for name in args.names:
        q = REGISTRY[name]
        times = []
        for i in range(args.n):
            spark.sparkContext.setJobGroup(name, f"{name}#{i}")
            if args.jobs:
                jobs_before = set(spark.sparkContext.statusTracker().getJobIdsForGroup(name))
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            t_build = time.perf_counter() - t0
            force_full_plan(df)
            dt = time.perf_counter() - t0
            times.append(dt)
            if i == args.n - 1:
                print(f"  build(+any eager jobs)={t_build:6.3f}s action={dt - t_build:6.3f}s")
            if args.jobs and i == args.n - 1:
                st = spark.sparkContext.statusTracker()
                jids = sorted(set(st.getJobIdsForGroup(name)) - jobs_before)
                print(f"  jobs in last rep: {len(jids)}")
                for jid in jids:
                    ji = st.getJobInfo(jid)
                    if ji is None:
                        continue
                    stages = []
                    for sid in ji.stageIds:
                        si = st.getStageInfo(sid)
                        if si:
                            stages.append(f"s{sid}:{si.numTasks}t")
                    print(f"    job {jid}: stages [{', '.join(stages)}]")
        med = sorted(times)[len(times) // 2]
        print(f"{name:40s} n={args.n} median={med:7.3f}s  runs={[round(t,3) for t in times]}")

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
