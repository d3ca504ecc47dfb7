"""Bucketed co-located joins (the 100 TB fact-fact join strategy):
pre-bucketing both fact tables on the join key removes the shuffle
entirely — the join plans with zero Exchange nodes."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture()
def warehouse(spark):
    yield
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, warehouse):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    # At this fixture size Spark would (rightly) broadcast; disable it
    # to expose the strategy that matters at fact-fact scale — the
    # bucket-co-located SortMergeJoin with no shuffle on either side.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the join subtree must contain no Exchange: bucketed scans
        # already satisfy distribution and ordering
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_part, plan
        got = {r.o_orderpriority: r.n for r in joined.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # values still correct vs the unbucketed computation
    expect = {
        r.o_orderpriority: r.n
        for r in li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect
