"""run_log_source: one call from a shipped pack + raw objects to
queryable hour-partitioned lake tables."""

from __future__ import annotations

import datetime as dt
import gzip
import json
import shutil
import tempfile
from pathlib import Path

import pytest

from matano_spark.pipeline import run_log_source

ROOT = Path(__file__).resolve().parents[1] / "data" / "log_sources"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="matano_spark_pipe_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def test_run_cloudtrail_pack_to_lake(spark, tmpdir):
    raw = tmpdir / "raw"
    raw.mkdir()
    records = [
        {
            "eventVersion": "1.08",
            "eventTime": f"2024-05-01T{hh:02d}:10:00Z",
            "eventSource": "s3.amazonaws.com",
            "eventName": name,
            "awsRegion": "us-east-1",
            "sourceIPAddress": ip,
            "userAgent": "aws-cli/2.0",
            "requestID": f"r-{hh}",
            "eventID": f"e-{hh}",
            "eventType": "AwsApiCall",
            "readOnly": True,
            "userIdentity": {
                "type": "IAMUser",
                "principalId": "AIDAX",
                "userName": "alice",
                "accountId": "123456789012",
                "arn": "arn:x",
            },
        }
        for hh, name, ip in [
            (10, "GetObject", "10.0.0.1"),
            (10, "PutObject", "10.0.0.2"),
            (11, "GetObject", "bogus-address"),
        ]
    ]
    with gzip.open(raw / "trail.json.gz", "wt") as f:
        f.write(json.dumps({"Records": records}))
    with gzip.open(raw / "trail-Digest.json.gz", "wt") as f:
        f.write(json.dumps({"noise": 1}))

    tables = run_log_source(
        spark,
        str(ROOT / "aws_cloudtrail"),
        str(raw / "*.gz"),
        str(tmpdir / "lake"),
        quarantine_root=str(tmpdir / "quarantine"),
    )
    res = tables["default"]
    assert res.rows_in == res.rows_out + res.rows_sidelined == 3
    assert res.as_log()["rows_sidelined"] == 0
    lake = tables["default"].read()
    lake.createOrReplaceTempView("ct")
    rows = spark.sql(
        "SELECT event.action AS a, count(*) AS n, min(source.ip) AS ip "
        "FROM ct GROUP BY event.action ORDER BY a"
    ).collect()
    assert [(r.a, r.n) for r in rows] == [("GetObject", 2), ("PutObject", 1)]
    # hour partitioning
    parts = {r.ts_hour for r in lake.select("ts_hour").collect()}
    assert parts == {"2024-05-01-10", "2024-05-01-11"}
    # non-IP address row landed with null source.ip (is_ipv4 gate)
    bogus = spark.sql(
        "SELECT source.ip AS ip, source.address AS addr FROM ct "
        "WHERE event.id = 'e-11'"
    ).collect()[0]
    assert bogus.ip is None and bogus.addr == "bogus-address"
    assert lake.select("ts").first().ts == dt.datetime(2024, 5, 1, 10, 10)


def test_landed_schema_is_full_resolved_schema(spark, tmpdir):
    """Declared fields the transform never assigned must still land as
    typed nulls — the at-rest schema is the resolved schema, not
    whatever this batch's transform happened to touch."""
    from matano_spark.schema.config import load_log_source

    raw = tmpdir / "raw"
    raw.mkdir()
    rec = {
        "eventVersion": "1.08",
        "eventTime": "2024-05-01T10:10:00Z",
        "eventSource": "s3.amazonaws.com",
        "eventName": "GetObject",
        "eventID": "e-1",
        "eventType": "AwsApiCall",
    }
    with gzip.open(raw / "trail.json.gz", "wt") as f:
        f.write(json.dumps({"Records": [rec]}))
    tables = run_log_source(
        spark,
        str(ROOT / "aws_cloudtrail"),
        str(raw / "*.gz"),
        str(tmpdir / "lake"),
    )
    td = load_log_source(str(ROOT / "aws_cloudtrail"))[0]
    landed = tables["default"].read()
    declared = [f.name for f in td.schema.fields]
    assert [c for c in landed.columns if c != "ts_hour"] == declared
