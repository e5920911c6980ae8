"""Bucketed (pre-partitioned) co-located joins — the storage-side answer
to repeated big-x-big joins on the same key (SCALING.md relational family).
Writing both sides bucketed on the join key lets every subsequent join
sort-merge WITHOUT an Exchange: at 100 TB that turns the recurring
orders⋈customer shuffle into a metadata no-op paid once at write time."""

from __future__ import annotations

import contextlib
import io
import uuid

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_cust = f"b_orders_{suffix}", f"b_cust_{suffix}"
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable(t_orders)
    )
    (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable(t_cust)
    )
    yield t_orders, t_cust
    spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
    spark.sql(f"DROP TABLE IF EXISTS {t_cust}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    t_orders, t_cust = bucketed_pair
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        j = spark.table(t_orders).join(
            spark.table(t_cust), F.col("o_custkey") == F.col("c_custkey")
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and the result is still the plain join
        assert j.count() == (
            spark.table(t_orders)
            .join(
                F.broadcast(spark.table(t_cust)),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
