"""Distributed RemoteCache (A6): counters/string-sets as streaming
state keyed by (namespace, key), TTL via event-time timeout — the
brute-force detection pattern across micro-batches (ref
detection/cache.py + example/detections/login_brute_force_by_ip)."""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from matano_spark.streaming.cache import streaming_remote_cache

T0 = dt.datetime(2024, 5, 1, 12, 0, 0)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("namespace", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="matano_spark_cache_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


_SEQ = [0]


def _write(path: Path, rows):
    with open(path, "w") as f:
        for minute, ns, key, op, value in rows:
            f.write(
                json.dumps(
                    {
                        "ts": (T0 + dt.timedelta(minutes=minute)).isoformat(),
                        "namespace": ns,
                        "key": key,
                        "op": op,
                        "value": value,
                    }
                )
                + "\n"
            )
    _SEQ[0] += 10
    base = 1_700_000_000 + _SEQ[0]
    os.utime(path, (base, base))


def _run_cache(spark, tmpdir, ttl_seconds):
    src = tmpdir / "src"
    src.mkdir(exist_ok=True)
    ops = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = streaming_remote_cache(ops, ttl_seconds=ttl_seconds,
                                 watermark_delay="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("cache_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmpdir / "ckpt"))
        .start()
    )
    return src, q


def test_bruteforce_counter_across_microbatches_with_ttl(spark, tmpdir):
    src, q = _run_cache(spark, tmpdir, ttl_seconds=900)  # 15 min TTL
    try:
        # batch 1: three failed logins from one IP + one from another
        _write(src / "b1.json", [
            (0, "brute", "203.0.113.9", "incr", "1"),
            (1, "brute", "203.0.113.9", "incr", "1"),
            (2, "brute", "203.0.113.9", "incr", "1"),
            (2, "brute", "198.51.100.7", "incr", "1"),
        ])
        q.processAllAvailable()
        # batch 2: two more — the counter continues ACROSS batches
        _write(src / "b2.json", [
            (3, "brute", "203.0.113.9", "incr", "1"),
            (4, "brute", "203.0.113.9", "incr", "1"),
        ])
        q.processAllAvailable()
        rows = {
            (r.namespace, r.key): r
            for r in spark.sql(
                "SELECT * FROM cache_out WHERE last_ts = "
                "(SELECT max(last_ts) FROM cache_out c2 WHERE c2.key = cache_out.key)"
            ).collect()
        }
        assert rows[("brute", "203.0.113.9")].counter == 5
        assert rows[("brute", "198.51.100.7")].counter == 1

        # the brute-force detection fires where counter >= threshold
        hot = [k for (ns, k), r in rows.items() if r.counter >= 5]
        assert hot == ["203.0.113.9"]

        # batch 3: 40 minutes later — far past the 15-min TTL. The
        # watermark advance expires the key; its counter restarts at 1.
        _write(src / "b3.json", [
            (44, "brute", "203.0.113.9", "incr", "1"),
        ])
        q.processAllAvailable()
        _write(src / "b4.json", [
            (45, "brute", "203.0.113.9", "incr", "1"),
        ])
        q.processAllAvailable()

        def read_latest():
            return (
                spark.sql(
                    "SELECT counter FROM cache_out WHERE key = '203.0.113.9' "
                    "ORDER BY last_ts DESC LIMIT 1"
                ).collect()[0].counter
            )

        latest = read_latest()
        if latest != 2:  # forgive a memory-sink visibility race, not state loss
            q.processAllAvailable()
            latest = read_latest()
        assert latest == 2  # 1+1 after expiry, NOT 7
    finally:
        q.stop()


def test_string_set_dedups_across_batches(spark, tmpdir):
    src, q = _run_cache(spark, tmpdir, ttl_seconds=3600)
    try:
        _write(src / "b1.json", [
            (0, "seen_users", "host-1", "add", "alice"),
            (1, "seen_users", "host-1", "add", "bob"),
        ])
        q.processAllAvailable()
        _write(src / "b2.json", [
            (2, "seen_users", "host-1", "add", "alice"),  # duplicate
            (3, "seen_users", "host-1", "add", "carol"),
        ])
        q.processAllAvailable()
        latest = (
            spark.sql(
                "SELECT members FROM cache_out WHERE key = 'host-1' "
                "ORDER BY last_ts DESC LIMIT 1"
            ).collect()[0].members
        )
        assert latest == ["alice", "bob", "carol"]
    finally:
        q.stop()
