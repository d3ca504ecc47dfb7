"""Streaming window semantics (SURVEY §2.6): watermark + tumbling
window aggregation with late-data handling (W4) and session windows
(the gap-based W2 streaming form)."""

from __future__ import annotations

import datetime as dt
import json
import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

T0 = dt.datetime(2024, 5, 1, 12, 0, 0)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="matano_spark_sw_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


_SEQ = [0]


def _write(path: Path, rows):
    with open(path, "w") as f:
        for minute, user, v in rows:
            f.write(
                json.dumps(
                    {
                        "ts": (T0 + dt.timedelta(minutes=minute)).isoformat(),
                        "user": user,
                        "v": v,
                    }
                )
                + "\n"
            )
    # FileStreamSource orders batches by MODIFICATION TIME; same-second
    # mtimes can reorder files and break watermark assumptions — pin
    # strictly increasing mtimes.
    import os

    _SEQ[0] += 10
    base = 1_700_000_000 + _SEQ[0]
    os.utime(path, (base, base))


def test_watermarked_tumbling_window_drops_too_late(spark, tmpdir):
    """W4: with a 10-minute watermark, an event arriving after the
    watermark passed its window is dropped; in-watermark late events
    still aggregate (append mode emits only finalized windows)."""
    src = tmpdir / "src"
    src.mkdir()
    # Watermark visibility lags batches (the value used by batch N is
    # derived from batches <= N-2 under availableNow), so the timeline
    # interleaves data batches with watermark-advancing batches:
    _write(src / "b1.json", [(0, "u1", 1.0), (5, "u1", 2.0), (25, "u2", 1.0)])
    _write(src / "b2.json", [(30, "adv", 0.0)])
    # batch 3 (wm=15 from b1): minute 3 is LATE (window [0,5) closed) →
    # dropped; minute 22 lands in the still-open [20,25) → kept
    _write(src / "b3.json", [(3, "u1", 100.0), (22, "u2", 5.0)])
    # advance far so every data window finalizes
    _write(src / "b4.json", [(60, "adv", 0.0)])
    _write(src / "b5.json", [(70, "adv", 0.0)])

    stream = (
        spark.readStream.format("json")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "user")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .option("checkpointLocation", str(tmpdir / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r.w.start.minute, r.user): (r.n, r.total)
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert rows[(0, "u1")] == (1, 1.0)  # minute-3 late row DROPPED (else 2, 101.0)
    assert rows[(5, "u1")] == (1, 2.0)
    assert rows[(25, "u2")] == (1, 1.0)
    assert rows[(20, "u2")] == (1, 5.0)  # in-watermark late row kept


def test_session_window_streaming(spark, tmpdir):
    """Gap-based session windows in streaming (session_window) — the
    streaming form of w2_gap_sessions."""
    src = tmpdir / "src"
    src.mkdir()
    _write(
        src / "a_data.json",
        [(0, "u1", 1.0), (2, "u1", 1.0), (40, "u1", 1.0), (1, "u2", 1.0)],
    )
    # second batch advances the watermark past every session so append
    # mode finalizes them
    _write(src / "b_advance.json", [(300, "uz", 0.0)])
    stream = (
        spark.readStream.format("json")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("s"), "user")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmpdir / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = sorted(
        (r.user, r.s.start.minute, r.n)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    )
    # u1: two sessions (0-2 with 2 events; 40 alone); u2: one session
    assert rows == [("u1", 0, 2), ("u1", 40, 1), ("u2", 1, 1)]
