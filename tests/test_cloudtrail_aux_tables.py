"""End-to-end fixtures for the CloudTrail auxiliary tables (digest,
insights — ref aws_cloudtrail/tables/{digest,insights}.yml) and the
matano_alerts loopback pack (ref matano_alerts/log_source.yml):
raw JSON objects routed by key → table transform → typed lake rows."""

from __future__ import annotations

import datetime as dt
import json
import shutil
import tempfile
from pathlib import Path

import pytest

from matano_spark.pipeline import run_log_source

ROOT = Path(__file__).resolve().parents[1] / "data" / "log_sources"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="matano_spark_ctaux_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, tmpdir, source, filename, text, table):
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    with open(raw / filename, "w") as f:
        f.write(text)
    tables = run_log_source(
        spark, str(ROOT / source), str(raw / "*"),
        str(tmpdir / "lake"), quarantine_root=str(tmpdir / "q"),
    )
    res = tables[table]
    assert res.rows_sidelined == 0, table
    return res


def test_cloudtrail_digest(spark, tmpdir):
    rec = {
        "awsAccountId": "123456789012",
        "digestStartTime": "2024-05-01T09:00:00Z",
        "digestEndTime": "2024-05-01T10:00:00Z",
        "digestS3Bucket": "my-trail-bucket",
        "digestS3Object": "AWSLogs/123456789012/CloudTrail-Digest/d.json.gz",
        "newestEventTime": "2024-05-01T09:59:10Z",
        "oldestEventTime": "2024-05-01T09:01:40Z",
        "previousDigestS3Bucket": "my-trail-bucket",
        "previousDigestSignature": "5d0f0b9b2a...sig",
        "previousDigestHashAlgorithm": "SHA-256",
        "publicKeyFingerprint": "af6d6c1f51a8",
        "digestSignatureAlgorithm": "SHA256withRSA",
        "logFiles": ["AWSLogs/t1.json.gz", "AWSLogs/t2.json.gz"],
    }
    res = _run(spark, tmpdir, "aws_cloudtrail",
               "trail-Digest_20240501.json", json.dumps(rec) + "\n", "digest")
    assert res.rows_out == 1
    r = res.read().selectExpr(
        "ts", "cloud.account.id AS acct", "file.path AS fpath",
        "file.hash.sha256 AS sig", "related.hash AS rhash",
        "aws.cloudtrail.digest.start_time AS t0",
        "aws.cloudtrail.digest.s3_bucket AS bucket",
        "aws.cloudtrail.digest.log_files AS lf",
        "aws.cloudtrail.digest.signature_algorithm AS alg",
        "aws.cloudtrail.flattened.digest AS flat",
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 5, 1, 10, 0)
    assert r.acct == "123456789012"
    assert r.fpath.endswith("d.json.gz")
    assert r.sig == "5d0f0b9b2a...sig" and r.rhash == [r.sig]
    assert r.t0 == dt.datetime(2024, 5, 1, 9, 0)
    assert r.bucket == "my-trail-bucket"
    assert r.lf == ["AWSLogs/t1.json.gz", "AWSLogs/t2.json.gz"]
    assert r.alg == "SHA256withRSA"
    assert json.loads(r.flat)["s3_bucket"] == "my-trail-bucket"


def test_cloudtrail_insights(spark, tmpdir):
    rec = {
        "eventVersion": "1.08",
        "eventTime": "2024-05-01T11:00:00Z",
        "eventSource": "ec2.amazonaws.com",
        "eventName": "RunInstances",
        "awsRegion": "eu-west-1",
        "eventID": "ins-1",
        "eventType": "AwsCloudTrailInsight",
        "eventCategory": "Insight",
        "recipientAccountId": "123456789012",
        "sharedEventID": "shared-1",
        "insightDetails": {
            "state": "Start",
            "eventSource": "ec2.amazonaws.com",
            "insightType": "ApiCallRateInsight",
            "insightContext": {"statistics": {"baseline": {"average": 0.2}}},
        },
    }
    payload = json.dumps({"Records": [rec]})
    res = _run(spark, tmpdir, "aws_cloudtrail",
               "trail-Insights_20240501.json", payload + "\n", "insights")
    assert res.rows_out == 1
    r = res.read().selectExpr(
        "ts", "event.provider AS prov", "event.action AS act",
        "event.id AS eid", "cloud.region AS region",
        "cloud.account.id AS acct",
        "aws.cloudtrail.event_type AS etype",
        "aws.cloudtrail.shared_event_id AS shared",
        "aws.cloudtrail.flattened.insight_details AS details",
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 5, 1, 11, 0)
    assert r.prov == "ec2.amazonaws.com" and r.act == "RunInstances"
    assert r.eid == "ins-1" and r.region == "eu-west-1"
    assert r.acct == "123456789012"
    assert r.etype == "AwsCloudTrailInsight" and r.shared == "shared-1"
    details = json.loads(r.details)
    assert details["insightType"] == "ApiCallRateInsight"
    assert details["insightContext"]["statistics"]["baseline"]["average"] == 0.2


def test_cloudtrail_insights_routed_away_from_default(spark, tmpdir):
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    rec = {"eventTime": "2024-05-01T11:00:00Z", "eventSource": "x",
           "eventName": "Y", "eventID": "e1"}
    with open(raw / "trail-Insights.json", "w") as f:
        f.write(json.dumps({"Records": [rec]}) + "\n")
    tables = run_log_source(
        spark, str(ROOT / "aws_cloudtrail"), str(raw / "*"),
        str(tmpdir / "lake"), quarantine_root=str(tmpdir / "q"),
    )
    assert tables["default"].rows_in == 0
    assert tables["insights"].rows_out == 1


def test_matano_alerts_loopback(spark, tmpdir):
    row = {
        "ts": "2024-05-01T10:00:00.000Z",
        "message": "5 failed logins from 1.2.3.4",
        "matano": {
            "table": "okta_system",
            "alert": {
                "id": "a-1",
                "created": "2024-05-01T10:00:00.000Z",
                "first_matched_at": "2024-05-01T09:48:00.000Z",
                "dedupe": "1.2.3.4",
                "activated": True,
                "title": "login_brute_force_by_ip",
                "severity": "high",
                "original_event": json.dumps({"outcome": "failure", "n": 5}),
                "rule": {"name": "login_brute_force_by_ip",
                         "severity": "high", "threshold": 5,
                         "match": {"id": "m-1"}},
            },
        },
        "source": {"ip": "1.2.3.4"},
        "related": {"ip": ["1.2.3.4"]},
    }
    res = _run(spark, tmpdir, "matano_alerts", "alerts.json",
               json.dumps(row) + "\n", "default")
    assert res.rows_out == 1
    r = res.read().selectExpr(
        "ts", "matano.table AS tbl", "matano.alert.id AS aid",
        "matano.alert.first_matched_at AS fm",
        "matano.alert.activated AS act",
        "matano.alert.rule.threshold AS thr",
        "matano.alert.original_event AS oe",
        "source.ip AS sip", "related.ip AS rip",
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 5, 1, 10, 0)
    assert r.tbl == "okta_system" and r.aid == "a-1"
    # nested timestamp revived by from_json-over-resolved-schema (the
    # Spark form of ref matano_alerts/log_source.yml:110-451)
    assert r.fm == dt.datetime(2024, 5, 1, 9, 48)
    assert r.act is True and r.thr == 5
    assert json.loads(r.oe) == {"outcome": "failure", "n": 5}
    assert r.sip == "1.2.3.4" and r.rip == ["1.2.3.4"]
