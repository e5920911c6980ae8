"""Query registry: the single source of truth for the declared operator
surface (SURVEY.md §2B). Each entry binds a Spark callable and (when
SQL-expressible) its DuckDB oracle twin; ``__spark_entry__.py`` exposes the
registry verbatim to the driver.

Determinism rules (SURVEY.md §2B) enforced by convention here:
 - aggregates over doubles go through exact integer/DECIMAL arithmetic and
   are cast to DOUBLE only at the end (identical bits both engines);
 - every computed column is aliased identically in Spark and SQL;
 - window/top-k ties are broken by a unique key;
 - no raw timestamp columns in outputs — epoch micros (BIGINT) instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    group: str
    spark: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    doc: str = ""
    module: str = ""  # defining module — parity_sweep --changed maps git diffs to queries


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, group: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver hands us its own (untuned) session: apply the
            # runtime-settable parity/perf confs (UTC tz, AQE, sane local
            # shuffle width) before building the plan.
            from ..session import tune_session

            tune_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QueryDef(name=name, group=group, spark=wrapped, oracle=oracle, doc=doc or (fn.__doc__ or ""), module=fn.__module__)
        return fn

    return deco
