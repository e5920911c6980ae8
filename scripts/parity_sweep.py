#!/usr/bin/env python
"""Full-surface correctness sweep: run EVERY registered query against its
DuckDB oracle at sf0.01 (the driver's correctness scale) and write
PARITY_LOCAL.json at the repo root.

Why this exists: the round driver's correctness harness checks the first
50 registry entries, and the registry is larger than that. The local twin
(tests/test_oracle_parity.py) already covers the full surface at sf0.001
per pytest run; this script is the sf0.01 equivalent with a committed,
per-round artifact, so the whole surface has recorded evidence every
round — not just the driver's window.

Run from the repo root: `python scripts/parity_sweep.py` (takes a few
minutes; run it alone — concurrent Spark JVMs skew nothing here but slow
everything down).

Targeted mode: `python scripts/parity_sweep.py name1 name2 ...` sweeps
only those queries and does NOT write PARITY_LOCAL.json (the committed
artifact must always be a full-surface run) — the fast path for
verifying a new or edited query before the full sweep.

Changed mode (VERDICT r17 ask #7): `python scripts/parity_sweep.py
--changed [BASE]` sweeps the queries whose DEFINING MODULE differs from
BASE (default: the git head recorded in the last committed
PARITY_LOCAL.json, i.e. everything touched since the last full-surface
evidence) plus the driver's current 50-query rotation window — the
mid-round iteration loop at ~1/4 the full sweep's cost. Infra edits
(session/tables/operators/functions) print a warning: only the full
sweep proves those. Never writes the artifact.

Golden mode (VERDICT r17 ask #5, SCALING.md trade-off #3 made real):
`python scripts/parity_sweep.py --golden write|check` runs the
GOLDEN_QUERIES sample (every group represented) at the local sf1 corpus
(.localdata/sf1 or $SPARK_GRAFT_GOLDEN_SF_DIR) and stores/validates
per-query row counts + schema + a canonical value hash in
GOLDEN_SF1.json — the oracle substitute at scales where DuckDB
side-by-side is impractical. `write` is only valid from a clean tree
(the golden file is committed evidence); `check` compares and exits 1
on any drift.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

# Override for off-scale sweeps (e.g. sf0.1 stress parity); the committed
# PARITY_LOCAL.json artifact is only written at the default driver scale.
SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")


# The sf1 golden sample: every group represented, plus the five
# dedup/graph heavies (the suite's most complex composed pipelines —
# exactly where silent drift at scale would hide; their timings live in
# the SCALING.md wave, their VALUES are pinned here).
GOLDEN_QUERIES = [
    # the heavy family (banded-LSH + connected-components compositions)
    "pipeline_dedup_full", "dedup_minhash_cluster", "dedup_minhash_incremental",
    "dedup_cluster_histogram", "graph_cc_sizes",
    # cdc
    "cdc_dedupe_first", "cdc_merge_apply",
    # curation
    "text_pii_scrub", "split_train_holdout",
    # llm
    "sim_cosine_topk", "text_tfidf",
    # llm-ext
    "dedup_exact_hash", "dedup_minhash_exact", "ann_ivf_topk", "graph_pagerank",
    # pipeline-ops
    "pipeline_dq_checks", "text_pmi_bigrams",
    # relational
    "agg_groupby", "join_multiway", "window_rank",
    # relational-ext
    "join_cbo_reorder", "agg_percentile", "sessionize_events",
    # scalar
    "fn_json", "udf_pandas_vectorized",
    # r19 additions: VARIANT + SQL-defined functions, compaction
    # execution, arbitrary-state-v2 sessionizer, statestore reconcile
    "fn_json_variant", "fn_sql_udf_scalar", "fn_sql_udtf_table",
    "pipeline_compaction_apply", "stream_sessionize_state_tws",
    "stream_state_reconcile", "stream_user_features_bootstrap",
    "stream_recent_events_liststate", "stream_user_counts_mapstate",
    "stream_state_reshard",
    # sketch
    "agg_kmv_distinct",
    # stats-ml
    "agg_quantile_2pass", "stats_corr_matrix", "ml_logreg_irls",
    # streaming
    "stream_watermark_dedupe", "stream_tumbling_counts",
    # web-dedup
    "dedup_url_canonical", "pipeline_web_funnel",
]

GOLDEN_FILE = _REPO / "GOLDEN_SF1.json"


def _canon_value(v) -> str:
    """Canonical, dtype-independent serialization of one cell — the same
    value must hash identically whether pandas materialized it as a numpy
    scalar, a Python scalar, or an object column; repr() on the unwrapped
    Python value keeps -0.0 vs 0.0 and int vs float distinct (the driver
    hash's bit-sensitivity)."""
    import math

    import numpy as np

    if isinstance(v, np.generic):
        v = v.item()
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\\N"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{_canon_value(k)}:{_canon_value(v[k])}" for k in sorted(v)
        ) + "}"
    return repr(v)


def _golden_row(sdf_spark) -> dict:
    """rows + schema + canonical value hash for one query result."""
    import hashlib

    pdf = sdf_spark.toPandas()
    cols = sorted(pdf.columns)
    lines = sorted(
        "\x1f".join(_canon_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    schema = ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in sorted(sdf_spark.schema.fields, key=lambda f: f.name))
    h = hashlib.sha256()
    h.update(schema.encode())
    for ln in lines:
        h.update(b"\n")
        h.update(ln.encode())
    return {"rows": len(pdf), "schema": schema, "value_sha256": h.hexdigest()}


def golden_mode(action: str) -> int:
    """Run GOLDEN_QUERIES at the sf1 corpus; write or check GOLDEN_SF1.json."""
    from cdc_dedupe_spark.queries import REGISTRY
    from cdc_dedupe_spark.session import get_spark

    sf_dir = os.environ.get(
        "SPARK_GRAFT_GOLDEN_SF_DIR", str(_REPO / ".localdata" / "sf1")
    )
    if not os.path.isdir(sf_dir):
        print(
            f"golden corpus missing: {sf_dir} — generate with "
            "scripts/gen_scale_corpus.py first",
            file=sys.stderr,
        )
        return 2
    if action == "write":
        dirty = subprocess.run(
            ["git", "status", "--porcelain"], cwd=_REPO, capture_output=True, text=True
        ).stdout.strip()
        dirty = "\n".join(
            l for l in dirty.splitlines() if not l.endswith("GOLDEN_SF1.json")
        )
        if dirty:
            print(
                "refusing --golden write from a dirty tree (the golden file is "
                "committed evidence; commit first):\n" + dirty,
                file=sys.stderr,
            )
            return 2

    spark = get_spark("cdc-dedupe-golden")
    t0 = time.time()
    rows: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in GOLDEN_QUERIES:
        try:
            rows[name] = _golden_row(REGISTRY[name].spark(spark, sf_dir))
        except Exception as ex:
            errors[name] = f"{type(ex).__name__}: {ex}"[:200]
    head = subprocess.run(
        ["git", "describe", "--always", "--dirty"], cwd=_REPO, capture_output=True, text=True
    ).stdout.strip()

    if action == "write":
        if errors:
            print(f"golden write aborted — errors: {errors}", file=sys.stderr)
            return 1
        GOLDEN_FILE.write_text(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "git_head": head,
                    "written_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
                    "wall_sec": round(time.time() - t0, 1),
                    "queries": rows,
                },
                indent=1,
            )
            + "\n"
        )
        print(f"wrote {GOLDEN_FILE.name}: {len(rows)} queries, {round(time.time()-t0,1)} s")
        return 0

    # check
    if not GOLDEN_FILE.exists():
        print("no GOLDEN_SF1.json — run --golden write first", file=sys.stderr)
        return 2
    want = json.loads(GOLDEN_FILE.read_text())["queries"]
    drift = sorted(
        n for n in rows
        if n in want and rows[n] != want[n]
    )
    missing = sorted(set(GOLDEN_QUERIES) - set(want))
    for n in drift:
        print(f"GOLDEN DRIFT {n}: want {want[n]} got {rows[n]}", file=sys.stderr)
    print(
        f"golden check: {len(rows) - len(drift)}/{len(want)} match, "
        f"drift={drift} error={sorted(errors)} new_unbaselined={missing} "
        f"({round(time.time()-t0,1)} s)"
    )
    if drift or errors:
        return 1
    if missing:
        # Queries newly added to GOLDEN_QUERIES but absent from the
        # committed baseline: exiting 0 here would let golden coverage
        # silently shrink relative to the declared sample (ADVICE r18
        # #2) — distinct exit so round checklists must re-write.
        print(
            f"golden check: {len(missing)} declared queries unbaselined — "
            "run --golden write to extend GOLDEN_SF1.json",
            file=sys.stderr,
        )
        return 3
    return 0


def changed_queries(base: str | None) -> tuple[list[str], list[str]]:
    """Queries whose defining module differs from ``base`` (default: the
    git head of the last committed full sweep), plus any infra files
    changed (returned separately as a warning list)."""
    from cdc_dedupe_spark.queries import REGISTRY

    if base is None:
        try:
            base = json.loads((_REPO / "PARITY_LOCAL.json").read_text())[
                "git_head"
            ].removesuffix("-dirty")
        except Exception:
            base = "HEAD"
    # NUL-delimited plumbing throughout (ADVICE r18 #3): split() broke
    # paths with spaces, '?? dir/' hid new modules inside untracked
    # directories (-uall lists the files), and rename records dropped
    # the target (--no-renames lists a rename as delete+add, so the new
    # path is always present).
    diff = subprocess.run(
        ["git", "diff", "--name-only", "--no-renames", "-z", base],
        cwd=_REPO, capture_output=True, text=True,
    )
    if diff.returncode != 0 and base != "HEAD":
        # recorded head unreachable (rebase/GC) — widen to everything
        # uncommitted rather than failing the fast loop
        print(f"--changed: base {base!r} unresolvable, falling back to HEAD",
              file=sys.stderr)
        diff = subprocess.run(
            ["git", "diff", "--name-only", "--no-renames", "-z", "HEAD"],
            cwd=_REPO, capture_output=True, text=True, check=True,
        )
    files = {f for f in diff.stdout.split("\0") if f}
    status = [
        e
        for e in subprocess.run(
            ["git", "status", "--porcelain", "-z", "-uall"],
            cwd=_REPO, capture_output=True, text=True,
        ).stdout.split("\0")
        if e
    ]
    i = 0
    while i < len(status):
        entry = status[i]
        xy, path = entry[:2], entry[3:]
        if xy and xy[0] in "RC":
            # rename/copy record: this entry is the NEW path, the next
            # NUL field is the old path — keep the target, skip the old
            files.add(path)
            i += 2
            continue
        if xy == "??":
            if path.endswith(".py"):
                files.add(path)
        i += 1
    mods = {
        f.removesuffix(".py").removesuffix("/__init__").replace("/", ".")
        for f in files
        if f.startswith("cdc_dedupe_spark/") and f.endswith(".py")
    }
    hit = sorted(n for n, q in REGISTRY.items() if q.module in mods)
    infra = sorted(
        f
        for f in files
        if f.startswith(("cdc_dedupe_spark/", "tests/parity.py"))
        and f.endswith(".py")
        and not f.startswith("cdc_dedupe_spark/queries/")
    )
    return hit, infra


def main() -> int:
    import duckdb

    from tests.parity import assert_frames_match, duck_strict_df, spark_kinds

    from cdc_dedupe_spark.queries import REGISTRY, driver_order
    from cdc_dedupe_spark.session import get_spark
    from cdc_dedupe_spark.tables import TABLE_NAMES

    only = sys.argv[1:]
    if only and only[0] == "--golden":
        if len(only) != 2 or only[1] not in ("write", "check"):
            print("usage: parity_sweep.py --golden write|check", file=sys.stderr)
            return 2
        return golden_mode(only[1])
    if only and only[0] == "--changed":
        base = only[1] if len(only) > 1 else None
        hit, infra = changed_queries(base)
        window = driver_order()[:50]
        if infra:
            print(
                f"NOTE: infra files changed ({infra}) — --changed only proves "
                "the query modules + driver window; run the full sweep before "
                "committing the artifact.",
                file=sys.stderr,
            )
        only = sorted(set(hit) | set(window))
        print(
            f"--changed: {len(hit)} changed-module queries + 50-query driver "
            f"window -> {len(only)} to sweep"
        )
    unknown = [n for n in only if n not in REGISTRY]
    if unknown:
        print(f"unknown query names: {unknown}; have {sorted(REGISTRY)}", file=sys.stderr)
        return 2

    # A FULL sweep is round evidence: refuse to stamp the artifact from a
    # dirty tree (VERDICT r9 "What's wrong" #2 — the r9 artifact said
    # `-dirty` and the judge had to hand-audit the diff). Targeted and
    # off-scale runs are working-loop tools and stay usable mid-edit.
    writes_artifact = not only and SF_DIR == "/root/testdata/sf0.01"
    status = subprocess.run(
        ["git", "status", "--porcelain"], cwd=_REPO, capture_output=True, text=True
    ).stdout.splitlines()
    # Driver-written round outputs (untracked until the end-of-round commit)
    # are artifacts of the round, not unverified code — don't let them block
    # the sweep (ADVICE r10). Anything ELSE untracked or modified still does.
    _artifact = re.compile(r"^\?\? (CORRECTNESS_r\d+\.json|BENCH_r\d+\.json|VERDICT\.md|ADVICE\.md)$")
    dirty = "\n".join(l for l in status if l.strip() and not _artifact.match(l))
    if writes_artifact and dirty:
        print(
            "refusing full-surface sweep from a dirty tree — commit first so "
            "PARITY_LOCAL.json's git_head names the exact verified snapshot:\n"
            + dirty,
            file=sys.stderr,
        )
        return 2

    spark = get_spark("cdc-dedupe-parity-sweep")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        # Off-scale corpora (.localdata/sf1) carry only the tables their
        # measured families read; a query touching an absent table then
        # fails loudly at its own row instead of blocking the whole sweep.
        if os.path.exists(f"{SF_DIR}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    results: dict[str, dict] = {}
    t0 = time.time()
    for name in sorted(only or REGISTRY):
        q = REGISTRY[name]
        try:
            sdf_spark = q.spark(spark, SF_DIR)
            sdf = sdf_spark.toPandas()
        except Exception as ex:  # record, keep sweeping
            results[name] = {"status": "error", "err": f"{type(ex).__name__}: {ex}"[:200]}
            continue
        if q.oracle is None:
            results[name] = {"status": "rows_only", "spark_rows": len(sdf)}
            continue
        # Strict fetch (fetchall + declared types, never .df()): integral
        # oracle columns arrive as exact Python ints, and an oracle that
        # widens to HUGEINT/DECIMAL where Spark is int64 now MISMATCHES
        # locally exactly like the driver's hash (r11 failure class).
        odf, dkinds = duck_strict_df(con, q.oracle)
        # Bit-sensitive compare (tests/parity) — the driver's value hash
        # distinguishes -0.0 from +0.0; plain == does not (the r3 blind spot).
        try:
            assert_frames_match(
                sdf, odf, name,
                spark_kind_map=spark_kinds(sdf_spark.schema), duck_kind_map=dkinds,
            )
            ok, detail = True, None
        except AssertionError as ex:
            ok, detail = False, str(ex)[:300]
        results[name] = {
            "status": "match" if ok else "MISMATCH",
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
            **({"detail": detail} if detail else {}),
        }

    # Self-contained provenance: `--dirty` + a wall-clock stamp describe
    # the exact TREE the sweep verified, not just the last commit — a
    # sweep run with fixes still uncommitted says so in the artifact
    # (VERDICT r8 "What's wrong" #4).
    head = subprocess.run(
        ["git", "describe", "--always", "--dirty"], cwd=_REPO, capture_output=True, text=True
    ).stdout.strip()
    summary = {
        "sf_dir": SF_DIR,
        "git_head": head,
        "run_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "total": len(results),
        "match": sum(1 for r in results.values() if r["status"] == "match"),
        "rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
        "mismatch": sorted(n for n, r in results.items() if r["status"] == "MISMATCH"),
        "error": sorted(n for n, r in results.items() if r["status"] == "error"),
        "wall_sec": round(time.time() - t0, 1),
        "queries": results,
    }
    if writes_artifact:
        # targeted or off-scale runs never overwrite the full-surface artifact
        (_REPO / "PARITY_LOCAL.json").write_text(json.dumps(summary, indent=1) + "\n")
    print(
        f"total={summary['total']} match={summary['match']} "
        f"rows_only={summary['rows_only']} mismatch={summary['mismatch']} error={summary['error']}"
    )
    return 1 if summary["mismatch"] or summary["error"] else 0


if __name__ == "__main__":
    sys.exit(main())
