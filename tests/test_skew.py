"""Salting utilities: results identical to unsalted operators on a
deliberately skewed key distribution (90% one key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from matano_spark.operators.skew import salted_collect_set, salted_join


def _skewed(spark):
    return spark.range(0, 10000).select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("HOT", "hot-dim"), ("k3", "k3-dim"), ("k7", "k7-dim")], ["k", "dim"]
    )
    plain = big.join(small, "k").groupBy("k", "dim").count()
    salted = salted_join(big, small, "k", salt_factor=8).groupBy("k", "dim").count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed(spark).limit(100)
    small = spark.createDataFrame([("HOT", "d")], ["k", "dim"])
    out = salted_join(big, small, "k", salt_factor=4, how="left")
    plain = big.join(small, "k", "left")
    assert out.count() == plain.count()
    assert out.filter(F.col("dim").isNull()).count() == plain.filter(
        F.col("dim").isNull()
    ).count()


def test_salted_collect_set_equals_direct(spark):
    df = _skewed(spark).withColumn("val", (F.col("v") % 50).cast("string"))
    direct = {
        r.k: sorted(r.vals)
        for r in df.groupBy("k").agg(F.collect_set("val").alias("vals")).collect()
    }
    salted = {
        r.k: list(r.values)
        for r in salted_collect_set(df, "k", "val", salt_factor=8).collect()
    }
    assert salted == direct
