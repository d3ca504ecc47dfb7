"""As-of join and bucketed range join — edge semantics and plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from matano_spark.operators.temporal import asof_join, range_join_bucketed


def ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 5, 1, 12, minute, 0)


def test_asof_backward_inclusive_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, ts(10)), (1, ts(30)), (2, ts(5)), (3, ts(20))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(10), "a"), (1, ts(25), "b"), (2, ts(6), "c")],
        "k long, ts timestamp, payload string",
    )
    out = {
        (r.k, r.ts): r
        for r in asof_join(left, right, key="k").collect()
    }
    # equal timestamps match (inclusive)
    assert out[(1, ts(10))].asof_payload == "a"
    # most recent prior, not first
    assert out[(1, ts(30))].asof_payload == "b"
    # right row later than left row -> no match
    assert out[(2, ts(5))].asof_payload is None
    assert out[(2, ts(5))].asof_ts is None
    # key with no right rows at all
    assert out[(3, ts(20))].asof_payload is None


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame([(1, ts(40))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts(10), "old")], "k long, ts timestamp, payload string"
    )
    fresh = asof_join(left, right, key="k", tolerance_seconds=3600).collect()[0]
    assert fresh.asof_payload == "old"  # 30 min old, within 1h
    stale = asof_join(left, right, key="k", tolerance_seconds=600).collect()[0]
    assert stale.asof_payload is None and stale.asof_ts is None


def test_asof_join_is_single_shuffle(spark):
    left = spark.createDataFrame([(1, ts(1))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts(0), 1.0)], "k long, ts timestamp, v double"
    )
    plan = (
        asof_join(left, right, key="k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the union+window form must not plan any join at all
    assert "Join" not in plan


def test_range_join_boundaries_and_multibucket(spark):
    events = spark.createDataFrame(
        [(1, ts(0)), (1, ts(15)), (1, ts(30)), (1, ts(31)), (2, ts(15))],
        "k long, ts timestamp",
    )
    # one 30-min window [12:00, 12:30] for key 1 — crosses a 900s
    # bucket boundary, so the bucketed join must still see all rows
    intervals = spark.createDataFrame(
        [(1, ts(0), ts(30))], "k long, s timestamp, e timestamp"
    )
    rows = range_join_bucketed(
        events, intervals, key="k", event_ts="ts",
        start_col="s", end_col="e", bucket_seconds=900,
    ).collect()
    matched = sorted(r.ts for r in rows)
    # both boundaries inclusive; 12:31 out; key 2 never matches
    assert matched == [ts(0), ts(15), ts(30)]
    assert all(r.k == 1 and r.k_interval == 1 for r in rows)


def test_range_join_fanout_bounded(spark):
    events = spark.createDataFrame([(1, ts(10))], "k long, ts timestamp")
    intervals = spark.createDataFrame(
        [(1, ts(0), ts(29))], "k long, s timestamp, e timestamp"
    )
    df = range_join_bucketed(
        events, intervals, key="k", event_ts="ts",
        start_col="s", end_col="e", bucket_seconds=1800,
    )
    # bucket width == max interval width -> interval explodes to <= 2 rows
    iv_exploded = intervals.withColumn(
        "__bs",
        F.sequence(
            F.floor(F.col("s").cast("long") / 1800),
            F.floor(F.col("e").cast("long") / 1800),
        ),
    ).select(F.size("__bs").alias("n"))
    assert iv_exploded.collect()[0].n <= 2
    assert df.count() == 1
