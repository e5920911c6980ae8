"""Thin CLI — the reference's two Spring Shell commands (`watch`,
`generate`; Application.java, WatchStream.java:61-63,
DebeziumConfiguration.java:19-25) as argparse subcommands, plus the
analytic query surface (`list`, `run`).

    python -m cdc_dedupe_spark.cli generate --config config.yaml
    python -m cdc_dedupe_spark.cli watch --config config.yaml \
        --source-dir ./in --work-dir ./work [--continuous SECONDS]
    python -m cdc_dedupe_spark.cli list
    python -m cdc_dedupe_spark.cli run agg_groupby --sf-dir /root/testdata/sf0.01
    python -m cdc_dedupe_spark.cli explain agg_groupby --mode formatted
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="cdc-dedupe-spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    gen = sub.add_parser("generate", help="generate debezium config")
    gen.add_argument("--config", "-c", default="./config.json")

    w = sub.add_parser("watch", help="run the CDC dedupe pipeline")
    w.add_argument("--config", "-c", default="./config.yaml")
    w.add_argument("--source-dir", default=None, help="directory of envelope JSON files")
    w.add_argument("--work-dir", required=True, help="output/ack/checkpoint root")
    w.add_argument(
        "--redis-option",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="read from Redis streams instead of --source-dir; repeatable "
        "(host=..., port=..., db=..., or client_factory=module:function)",
    )
    w.add_argument(
        "--redis-sink",
        action="store_true",
        help="XADD packed batches to the target Redis streams (with --redis-option)",
    )
    w.add_argument(
        "--continuous",
        type=int,
        default=None,
        metavar="SECONDS",
        help="run continuously with this trigger interval (default: drain available input and exit)",
    )

    sub.add_parser("list", help="list every declared query (name, group, oracle kind)")

    exp = sub.add_parser("explain", help="print a declared query's physical plan")
    exp.add_argument("query", help="query name from `list`")
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    exp.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "codegen", "cost", "formatted"],
        help="explain mode (default: formatted)",
    )

    runp = sub.add_parser("run", help="run a declared query and show its result")
    runp.add_argument("query", help="query name from `list`")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    runp.add_argument("--limit", type=int, default=20, help="rows to show (0 = count only)")

    args = parser.parse_args(argv)

    if args.cmd == "list":
        from .queries import REGISTRY

        for name in sorted(REGISTRY):
            q = REGISTRY[name]
            kind = "exact-oracle" if q.oracle else "rows-only"
            print(f"{name:28s} {q.group:14s} {kind}")
        return 0

    if args.cmd == "run":
        from .queries import REGISTRY
        from .session import get_spark

        if args.query not in REGISTRY:
            parser.error(f"unknown query {args.query!r}; see `list`")
        spark = get_spark(f"cdc-dedupe-spark-run-{args.query}")
        df = REGISTRY[args.query].spark(spark, args.sf_dir)
        if args.limit:
            df.show(args.limit, truncate=False)
        print(f"rows: {df.count()}")
        return 0

    if args.cmd == "explain":
        from .queries import REGISTRY
        from .session import get_spark

        if args.query not in REGISTRY:
            parser.error(f"unknown query {args.query!r}; see `list`")
        spark = get_spark("cdc-dedupe-spark-explain")
        REGISTRY[args.query].spark(spark, args.sf_dir).explain(args.mode)
        return 0

    from .config import load_config

    cfg = load_config(args.config)

    if args.cmd == "generate":
        from .debezium import generate

        print(generate(cfg))
        return 0

    from .session import get_spark
    from .streaming.pipeline import watch

    redis_options = dict(kv.split("=", 1) for kv in args.redis_option) or None
    if args.source_dir is None and redis_options is None:
        parser.error("watch requires --source-dir or --redis-option")

    spark = get_spark("cdc-dedupe-spark-watch")
    handles = watch(
        spark,
        cfg,
        source_dir=args.source_dir,
        work_dir=args.work_dir,
        available_now=args.continuous is None,
        trigger_seconds=args.continuous,
        redis_options=redis_options,
        redis_sink=args.redis_sink,
    )
    handles.query.awaitTermination()
    print(f"targets written under {handles.output_dir}; acks under {handles.ack_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
