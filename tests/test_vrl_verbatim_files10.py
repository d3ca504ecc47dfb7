"""Verbatim goldens batch 10: the last two non-zeek reference
transforms without execution-level semantic checks — aws_cloudtrail
insights (source program + table del, ref
aws_cloudtrail/tables/insights.yml) and duo summary (now()-stamped
counters table, ref duo/tables/summary.yml). Both load the FULL
concatenated source+table program from the reference tree via
load_log_source, exactly as the reference deploys them."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

REF_MANAGED = "/root/reference/data/managed/log_sources"

# Full-reference verbatim compiles take 30-90s EACH; tiered out of the
# default selection (pytest.ini deselects -m slow) so the suite fits
# the driver's window. Run them with: pytest -m slow tests/
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(REF_MANAGED), reason="reference tree not present"
)]


def _ref_table(pack: str, table: str):
    from matano_spark.schema.config import load_log_source

    for td in load_log_source(os.path.join(REF_MANAGED, pack), strict=False):
        if td.name == table:
            return td
    raise AssertionError(f"{pack}/{table} not found")


def test_cloudtrail_insights_verbatim(spark):
    """insights = the full cloudtrail source program (eventTime ts,
    userIdentity spread, readOnly→event.type) + the table's one del of
    aws.cloudtrail.insight_details."""
    td = _ref_table("aws_cloudtrail", "insights")
    event = {
        "eventTime": "2021-02-04T17:51:55Z",
        "eventVersion": "1.08",
        "eventName": "ConsoleLogin",
        "eventSource": "signin.amazonaws.com",
        "eventID": "ins-1",
        "eventType": "AwsCloudTrailInsight",
        "eventCategory": "Insight",
        "awsRegion": "us-east-1",
        "recipientAccountId": "111122223333",
        "insightDetails": {
            "state": "Start",
            "eventSource": "signin.amazonaws.com",
            "eventName": "ConsoleLogin",
            "insightType": "ApiCallRateInsight",
        },
    }
    raw = spark.createDataFrame([(json.dumps(event),)], "raw string").select(
        F.parse_json("raw").alias("json")
    )
    out = td.pipeline(raw)
    d = out.collect()[0].asDict(recursive=True)
    assert d.get("ts") is not None
    assert str(d["ts"]).startswith("2021-02-04")
    cloud = (d.get("cloud") or {})
    assert str(cloud.get("region")).strip('"') == "us-east-1"
    aws_ct = (d.get("aws") or {}).get("cloudtrail") or {}
    # the table program's single statement: insight_details is DELETED
    assert aws_ct.get("insight_details") is None, aws_ct


def test_duo_summary_verbatim(spark):
    td = _ref_table("duo", "summary")
    event = {
        "admin_count": 3,
        "integration_count": 7,
        "telephony_credits_remaining": 960,
        "user_count": 84,
    }
    raw = spark.createDataFrame([(json.dumps(event),)], "raw string").select(
        F.parse_json("raw").alias("json")
    )
    out = td.pipeline(raw)
    d = out.collect()[0].asDict(recursive=True)
    assert d.get("ts") is not None  # now()-stamped
    summ = ((d.get("duo") or {}).get("summary")) or {}

    def _i(v):
        return int(str(v).strip('"'))

    assert _i(summ.get("admin_count")) == 3
    assert _i(summ.get("integration_count")) == 7
    assert _i(summ.get("telephony_credits_remaining")) == 960
    assert _i(summ.get("user_count")) == 84
    # event.original captures the ORIGINAL json text
    orig = (d.get("event") or {}).get("original")
    assert orig and json.loads(str(orig)) == event
    # the payload itself is deleted afterwards
    assert d.get("json") is None or d.get("json") == {}
