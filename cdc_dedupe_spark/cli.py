"""Thin CLI — the reference's two Spring Shell commands (`watch`,
`generate`; Application.java, WatchStream.java:61-63,
DebeziumConfiguration.java:19-25) as argparse subcommands.

    python -m cdc_dedupe_spark.cli generate --config config.yaml
    python -m cdc_dedupe_spark.cli watch --config config.yaml \
        --source-dir ./in --work-dir ./work [--continuous SECONDS]
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

    args = parser.parse_args(argv)

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
