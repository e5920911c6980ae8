"""Reusable column-expression library — the engine's scalar/HOF surface.

Everything here is a pure ``Column -> Column`` builder over built-in
`pyspark.sql.functions` (JVM-side, whole-stage-codegen'd): usable on any
DataFrame, not just the declared query set. The declared queries in
``cdc_dedupe_spark.queries`` are thin compositions of these.
"""

from .text import (
    SQL_TOKEN_HASH,
    char_shingles,
    marker_count,
    simhash,
    sql_marker_count,
    token_hash,
    tokens,
)
from .vector import cosine, dot, l2_norm

__all__ = [
    "SQL_TOKEN_HASH",
    "char_shingles",
    "cosine",
    "dot",
    "l2_norm",
    "marker_count",
    "simhash",
    "sql_marker_count",
    "token_hash",
    "tokens",
]
