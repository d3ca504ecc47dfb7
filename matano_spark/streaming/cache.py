"""Distributed RemoteCache (A6): detection-visible counters and string
sets as STREAMING STATE, keyed by (namespace, key) with TTL expiry.

The reference backs `remotecache(namespace, ttl)` with DynamoDB —
cross-invocation KV with counters/sets and per-item TTL
(detection/cache.py:8-130; brute-force counting usage
example/detections/login_brute_force_by_ip). The in-process
`LocalRemoteCache` (detections.cache) covers batch/tests; this module
is the cluster form: the cache IS the Spark state store.

Mechanics:
- cache mutations flow as a stream of op rows
  (namespace, key, ts, op, value): op "incr" adds int(value) to the
  counter, op "add" inserts value into the string set.
- `applyInPandasWithState` keyed by (namespace, key) folds ops into
  (counter, members, last_ts); output mode `update` emits the state
  after each batch — the detection side reads the emitted stream (or
  the compacted state table) instead of calling get().
- TTL is an EVENT-TIME timeout: when the watermark passes
  last_update + ttl the state is dropped, so a replayed stream expires
  identically (same policy as streaming.alerting's dedup-window
  eviction). The reference's wall-clock DynamoDB TTL is approximated
  by event time — deterministic, replay-safe, and the only meaningful
  clock on a backfill.

SCALE: state is hash-partitioned by (namespace, key) across executors
— no driver-side state, no global lock; a hot key is one group (skew
bounded by per-key op volume, the same bound DynamoDB has).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("namespace", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("counter", T.LongType()),
        T.StructField("members", T.ArrayType(T.StringType())),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("counter", T.LongType()),
        T.StructField("members", T.ArrayType(T.StringType())),
        T.StructField("last_us", T.LongType()),
    ]
)


def make_cache_fold(ttl_seconds: int):
    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        namespace, k = key
        if state.hasTimedOut:
            # TTL expiry: drop counters/sets exactly like the
            # reference's DynamoDB item TTL (cache.py TTL semantics)
            state.remove()
            return
        counter, members, last_us = (
            state.get if state.exists else (0, [], 0)
        )
        members = set(members or [])
        ttl_us = ttl_seconds * 1_000_000
        for pdf in pdfs:
            pdf = pdf.sort_values("ts", kind="mergesort")
            for _, row in pdf.iterrows():
                t_us = int(pd.Timestamp(row["ts"]).value // 1000)
                # in-fold expiry: an op arriving >= TTL of EVENT time
                # after the last update sees a fresh item (the state
                # timeout alone can't fire for a key that also receives
                # data in the expiring batch)
                if last_us and t_us - last_us >= ttl_us:
                    counter, members = 0, set()
                last_us = max(last_us, t_us)
                if row["op"] == "incr":
                    counter += int(row["value"])
                elif row["op"] == "add":
                    members.add(str(row["value"]))
        state.update((counter, sorted(members), last_us))
        state.setTimeoutTimestamp(last_us // 1000 + ttl_seconds * 1000)
        yield pd.DataFrame(
            [
                {
                    "namespace": namespace,
                    "key": k,
                    "counter": counter,
                    "members": sorted(members),
                    "last_ts": pd.Timestamp(last_us, unit="us"),
                }
            ]
        )

    return fold


def streaming_remote_cache(
    ops: DataFrame,
    ttl_seconds: int = 3600,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Op stream (namespace, key, ts, op, value) → cache-state stream
    (namespace, key, counter, members, last_ts). Output mode `update`.

    A key silent for `ttl_seconds` of EVENT time is expired: its next
    op starts from zero, exactly the reference's expired-item read
    (`get` returns default after TTL)."""
    return (
        ops.withWatermark("ts", watermark_delay)
        .groupBy("namespace", "key")
        .applyInPandasWithState(
            make_cache_fold(ttl_seconds),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
