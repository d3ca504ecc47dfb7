"""LakeTable abstraction: append/overwrite/merge + partition-pruned
reads on the parquet backend (Iceberg path is catalog-gated)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from matano_spark.lake import LakeTable

T0 = dt.datetime(2024, 5, 1, 10, 0, 0)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="matano_spark_lake_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, T0 + dt.timedelta(hours=h), v) for k, h, v in rows],
        "id string, ts timestamp, v long",
    )


def test_append_partitions_and_pruned_read(spark, tmpdir):
    t = LakeTable(spark, "ev", str(tmpdir / "ev"), use_iceberg=False)
    t.append(_df(spark, [("a", 0, 1), ("b", 1, 2), ("c", 3, 3)]))
    t.append(_df(spark, [("d", 1, 4)]))
    assert t.read().count() == 4
    pruned = t.read_hours("2024-05-01-10", "2024-05-01-11")
    assert sorted(r.id for r in pruned.collect()) == ["a", "b", "d"]
    # partition pruning must reach the scan (PartitionFilters, not a
    # post-scan filter)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(ts_hour" in plan


def test_merge_by_key_upsert(spark, tmpdir):
    t = LakeTable(spark, "st", str(tmpdir / "st"), use_iceberg=False)
    t.append(_df(spark, [("a", 0, 1), ("b", 0, 2)]))
    t.merge_by_key(_df(spark, [("b", 0, 20), ("c", 0, 30)]), ["id"])
    got = {r.id: r.v for r in t.read().collect()}
    assert got == {"a": 1, "b": 20, "c": 30}
