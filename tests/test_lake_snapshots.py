"""Snapshot log on the parquet fallback: time travel, compaction,
expiry — the Iceberg contract without a catalog."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from matano_spark.lake_snapshots import SnapshotLakeTable


def _rows(spark, ids, hour):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 5, 1, hour, 0, 0)) for i in ids],
        "id long, ts timestamp",
    )


def test_append_time_travel_and_read(spark, tmp_path):
    t = SnapshotLakeTable(spark, "snap_t", str(tmp_path / "t"))
    s0 = t.append(_rows(spark, [1, 2], 10))
    s1 = t.append(_rows(spark, [3], 11))
    assert (s0, s1) == (0, 1)
    assert {r["id"] for r in t.read().collect()} == {1, 2, 3}
    assert {r["id"] for r in t.read(at_snapshot=0).collect()} == {1, 2}
    # hour partition column landed
    assert t.read().select("ts_hour").distinct().count() == 2


def test_overwrite_keeps_history_until_expiry(spark, tmp_path):
    t = SnapshotLakeTable(spark, "snap_t", str(tmp_path / "t"))
    t.append(_rows(spark, [1, 2], 10))
    t.overwrite(_rows(spark, [9], 12))
    assert {r["id"] for r in t.read().collect()} == {9}
    # history still readable
    assert {r["id"] for r in t.read(at_snapshot=0).collect()} == {1, 2}

    res = t.expire_snapshots(keep_last=1)
    assert res["expired_snapshots"] == [0]
    assert len(res["removed_dirs"]) == 1  # orphaned by the overwrite
    # current read unaffected; time travel to 0 now refuses
    assert {r["id"] for r in t.read().collect()} == {9}
    with pytest.raises(KeyError):
        t.read(at_snapshot=0)


def test_compact_rewrites_to_one_dir_same_rows(spark, tmp_path):
    t = SnapshotLakeTable(spark, "snap_t", str(tmp_path / "t"))
    for batch in ([1], [2], [3]):
        t.append(_rows(spark, batch, 10))
    before = {r["id"] for r in t.read().collect()}
    sid = t.compact()
    snaps = {m["id"]: m for m in t.snapshots()}
    assert snaps[sid]["op"] == "compact"
    assert len(snaps[sid]["dirs"]) == 1
    assert {r["id"] for r in t.read().collect()} == before == {1, 2, 3}
    # expiry after compaction frees the three small append dirs
    res = t.expire_snapshots(keep_last=1)
    assert len(res["removed_dirs"]) == 3  # the three small append dirs
    assert {r["id"] for r in t.read().collect()} == before


def test_merge_by_key_upserts_with_history(spark, tmp_path):
    t = SnapshotLakeTable(spark, "snap_t", str(tmp_path / "t"))
    base = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 5, 1, 10)), (2, "b", dt.datetime(2024, 5, 1, 10))],
        "id long, v string, ts timestamp",
    )
    t.append(base)
    upd = spark.createDataFrame(
        [(2, "B2", dt.datetime(2024, 5, 1, 11)), (3, "c", dt.datetime(2024, 5, 1, 11))],
        "id long, v string, ts timestamp",
    )
    sid = t.merge_by_key(upd, ["id"])
    now = {r["id"]: r["v"] for r in t.read().collect()}
    assert now == {1: "a", 2: "B2", 3: "c"}
    # the pre-merge state is still a snapshot away
    before = {r["id"]: r["v"] for r in t.read(at_snapshot=sid - 1).collect()}
    assert before == {1: "a", 2: "b"}


def test_snapshot_ingest_epoch_commits_and_replay(spark, tmp_path):
    """One snapshot per micro-batch; a checkpoint replay of an epoch
    rewrites the same directory + manifest instead of duplicating."""
    import json as _json

    from pyspark.sql import types as T

    from matano_spark.streaming.ingest import run_ingest_snapshots

    src = tmp_path / "src"
    src.mkdir()
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("ts", T.TimestampType())]
    )

    def deliver(name, ids):
        with open(src / name, "w") as f:
            for i in ids:
                f.write(
                    _json.dumps({"id": i, "ts": "2024-05-01T10:00:00Z"}) + "\n"
                )

    deliver("b0.jsonl", [1, 2])
    q = run_ingest_snapshots(
        spark, str(src), schema, lambda df: df,
        str(tmp_path / "lake"), str(tmp_path / "ckpt"), str(tmp_path / "q"),
    )
    q.awaitTermination(120)
    deliver("b1.jsonl", [3])
    q = run_ingest_snapshots(
        spark, str(src), schema, lambda df: df,
        str(tmp_path / "lake"), str(tmp_path / "ckpt"), str(tmp_path / "q"),
    )
    q.awaitTermination(120)

    t = SnapshotLakeTable(spark, "default", str(tmp_path / "lake"))
    assert [m["id"] for m in t.snapshots()] == [0, 1]
    assert {r["id"] for r in t.read().collect()} == {1, 2, 3}
    assert {r["id"] for r in t.read(at_snapshot=0).collect()} == {1, 2}


def test_compact_between_epochs_survives_next_commit(spark, tmp_path):
    """r4 ADVICE regression: a compact() between micro-batches used to
    allocate the id the next epoch would reuse, so the next epoch's
    commit silently dropped the compacted data. Epoch dirs + the
    shared monotonic manifest counter keep both."""
    t = SnapshotLakeTable(spark, "snap_t", str(tmp_path / "t"))
    t.commit_epoch(_rows(spark, [1, 2], 10), epoch_id=0)
    t.commit_epoch(_rows(spark, [3], 10), epoch_id=1)
    cid = t.compact()
    t.commit_epoch(_rows(spark, [4], 11), epoch_id=2)
    # all rows — including the compacted ones — are in the latest view
    assert {r["id"] for r in t.read().collect()} == {1, 2, 3, 4}
    snaps = t.snapshots()
    assert [m["id"] for m in snaps] == [0, 1, 2, 3]
    assert snaps[2]["op"] == "compact" and snaps[2]["id"] == cid
    # epoch replay is still idempotent: re-commit of epoch 2 adds no
    # manifest and no rows
    t.commit_epoch(_rows(spark, [4], 11), epoch_id=2)
    assert [m["id"] for m in t.snapshots()] == [0, 1, 2, 3]
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 3, 4]
    # expiry sweeps orphaned EPOCH dirs too once compaction supersedes
    t.compact()
    res = t.expire_snapshots(keep_last=1)
    assert "e0" in res["removed_dirs"] and "e1" in res["removed_dirs"]
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 3, 4]


def test_merge_by_key_deterministic_on_duplicate_incoming(spark, tmp_path):
    """ADVICE regression: duplicate keys WITHIN one incoming batch must
    resolve to the same keeper on every run (stable-hash tiebreaker)."""
    t = SnapshotLakeTable(spark, "snap_t", str(tmp_path / "t"), ts_col="nope")
    base = spark.createDataFrame([(1, "x")], "id long, v string")
    t.overwrite(base)
    dup = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "id long, v string"
    )
    picks = set()
    for _ in range(3):
        t2 = SnapshotLakeTable(spark, "snap_t", str(tmp_path / "t"), ts_col="nope")
        t2.merge_by_key(dup.repartition(7), ["id"])
        picks.add(tuple(sorted((r["id"], r["v"]) for r in t2.read().collect())))
    assert len(picks) == 1
    assert dict(next(iter(picks)))[2] == "c"


def test_cas_commit_refuses_taken_id(spark, tmp_path):
    """The CAS primitive: a manifest id can be published exactly once."""
    t = SnapshotLakeTable(spark, "snap_t", str(tmp_path / "t"))
    t.append(_rows(spark, [1], 10))
    stale = {"id": 0, "parent": None, "dirs": ["dffffffffff"], "op": "append"}
    assert t._try_commit(stale) is False
    # and the real manifest is untouched
    assert {r["id"] for r in t.read().collect()} == {1}


def test_concurrent_appenders_no_lost_update(spark, tmp_path):
    """Two writers interleaving appends on the same table: every row
    lands, the snapshot chain is linear, and no commit is overwritten
    (verdict r4 task: multi-writer safety net without a catalog)."""
    import threading

    path = str(tmp_path / "t")
    errs: list[Exception] = []

    def writer(offset):
        try:
            w = SnapshotLakeTable(spark, "snap_t", path)
            for i in range(4):
                w.append(_rows(spark, [offset + i], 10))
        except Exception as e:  # surface in the main thread
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(100,))
    t2 = threading.Thread(target=writer, args=(200,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    t = SnapshotLakeTable(spark, "snap_t", path)
    snaps = t.snapshots()
    # linear chain: ids 0..7, each parent = predecessor
    assert [m["id"] for m in snaps] == list(range(8))
    assert [m["parent"] for m in snaps] == [None] + list(range(7))
    # union of both writers' rows — nothing lost
    got = sorted(r["id"] for r in t.read().collect())
    assert got == [100, 101, 102, 103, 200, 201, 202, 203]


def test_merge_lost_update_protection(spark, tmp_path):
    """A merge computed against a stale basis must not publish: simulate
    by committing an append between the merge's basis read and its CAS
    (the retry recomputes and keeps the interleaved row)."""
    path = str(tmp_path / "t")
    t = SnapshotLakeTable(spark, "snap_t", path, ts_col="nope")
    t.overwrite(spark.createDataFrame([(1, "x")], "id long, v string"))

    racer = SnapshotLakeTable(spark, "snap_t", path, ts_col="nope")
    orig_try = t._try_commit
    fired = {}

    def interleave(manifest):
        if not fired:
            fired["yes"] = True
            racer.append(spark.createDataFrame([(7, "z")], "id long, v string"))
        return orig_try(manifest)

    t._try_commit = interleave  # type: ignore[method-assign]
    t.merge_by_key(
        spark.createDataFrame([(1, "y")], "id long, v string"), ["id"]
    )
    rows = {r["id"]: r["v"] for r in t.read().collect()}
    assert rows == {1: "y", 7: "z"}  # merged AND the racer's row kept
