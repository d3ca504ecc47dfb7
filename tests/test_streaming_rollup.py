"""Continuous aggregate: streamed hourly level == batch recompute,
coarser levels derive exactly from the maintained level."""

from __future__ import annotations

import datetime as dt
import json
import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from matano_spark.operators.rollup import SCALE
from matano_spark.streaming.rollup import (
    coarsen,
    read_level,
    streaming_hourly_level,
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

T0 = dt.datetime(2024, 5, 1, 0, 0, 0)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="matano_spark_rollup_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _write(path: Path, rows):
    with open(path, "w") as f:
        for minutes, etype, value in rows:
            f.write(
                json.dumps(
                    {
                        "ts": (T0 + dt.timedelta(minutes=minutes)).isoformat(),
                        "event_type": etype,
                        "value": value,
                    }
                )
                + "\n"
            )


def _run(spark, src: Path, tmpdir: Path):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = streaming_hourly_level(
        stream,
        str(tmpdir / "level"),
        str(tmpdir / "ckpt"),
        key_cols=["event_type"],
    )
    q.awaitTermination()


def test_streamed_level_equals_batch_recompute(spark, tmpdir):
    src = tmpdir / "src"
    src.mkdir()
    # batch 1 and 2 overlap in the 00:xx hour — the merge must fold
    # partial sums, not overwrite them
    _write(src / "b1.json", [
        (5, "click", 1.25), (20, "click", 2.5), (30, "view", 0.75),
        (70, "click", 3.0),
    ])
    _write(src / "b2.json", [
        (40, "click", 4.25), (90, "view", 1.0),
        (26 * 60, "click", 2.0),  # next day
    ])
    _run(spark, src, tmpdir)

    level = read_level(spark, str(tmpdir / "level"), ["event_type"])
    got = {
        (r.bucket, r.event_type): (r.n_events, r.total_value)
        for r in level.collect()
    }

    all_rows = spark.read.schema(SCHEMA).json(str(src))
    scaled = F.round(F.col("value") * F.lit(SCALE), 0).cast("bigint")
    expect = {
        (r.bucket, r.event_type): (r.n, r.tv)
        for r in all_rows.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(scaled).cast("double") / F.lit(SCALE)).alias("tv"),
        )
        .collect()
    }
    assert got == expect
    # the overlapping hour really did accumulate across batches
    assert got[(T0, "click")][0] == 3


def test_coarsen_derives_day_exactly(spark, tmpdir):
    src = tmpdir / "src"
    src.mkdir()
    _write(src / "b1.json", [
        (5, "click", 1.25), (70, "click", 2.5), (26 * 60, "click", 4.0),
    ])
    _run(spark, src, tmpdir)

    level = read_level(spark, str(tmpdir / "level"), ["event_type"])
    day = {
        (r.bucket, r.event_type): (r.n_events, r.total_value)
        for r in coarsen(level, "day", ["event_type"]).collect()
    }
    assert day[(T0, "click")] == (2, 3.75)
    assert day[(T0 + dt.timedelta(days=1), "click")] == (1, 4.0)


def test_replayed_epoch_is_skipped(spark, tmpdir):
    """The additive merge must be idempotent under foreachBatch's
    at-least-once replay: re-running the stream from a wiped checkpoint
    re-delivers epoch 0, which the marker guard must skip."""
    src = tmpdir / "src"
    src.mkdir()
    _write(src / "b1.json", [(5, "click", 1.0), (6, "click", 2.0)])
    _run(spark, src, tmpdir)
    level1 = {
        (r.bucket, r.event_type): (r.n_events, r.total_value)
        for r in read_level(spark, str(tmpdir / "level"), ["event_type"]).collect()
    }
    # simulate a replay of the same epoch: wipe the checkpoint only
    shutil.rmtree(tmpdir / "ckpt")
    _run(spark, src, tmpdir)
    level2 = {
        (r.bucket, r.event_type): (r.n_events, r.total_value)
        for r in read_level(spark, str(tmpdir / "level"), ["event_type"]).collect()
    }
    assert level1 == level2  # not double-counted
    assert level1[(T0, "click")] == (2, 3.0)
