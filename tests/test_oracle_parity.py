"""The local twin of the driver's correctness gate: run every registered
query on Spark and, where an oracle exists, the DuckDB SQL side-by-side;
compare row count + columns + exact values (order-insensitive)."""

from __future__ import annotations

import pytest

from cdc_dedupe_spark.queries import REGISTRY

from .parity import assert_frames_match, duck_strict_df, spark_kinds


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_parity(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    sdf = q.spark(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only: must run and produce a frame
        return
    # Strict path: dtype-class divergence (oracle HUGEINT/DECIMAL vs
    # Spark int64) fails here even when the values agree — the r11
    # driver-mismatch class (VERDICT r11 "What's wrong" #1/#2).
    duck_pdf, dkinds = duck_strict_df(duck, q.oracle)
    assert_frames_match(
        spark_pdf, duck_pdf, name=name,
        spark_kind_map=spark_kinds(sdf.schema), duck_kind_map=dkinds,
    )
