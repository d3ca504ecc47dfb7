"""Round-8 verbatim full-file executions, batch 5: cloudflare/dns,
matano_alerts (the alert-loopback normalizer: root replacement + the
long timestamp-cast ladder), and crowdstrike/fdr — the single largest
managed transform (3.7k lines: the event_simpleName dispatch table,
nullish normalization over the whole object, hash gating, command-line
arg splitting).

Reference programs: /root/reference/data/managed/log_sources/..."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from matano_spark.transform.parser import compile_vrl

REF_MANAGED = "/root/reference/data/managed/log_sources"

# Full-reference verbatim compiles take 30-90s EACH; tiered out of the
# default selection (pytest.ini deselects -m slow) so the suite fits
# the driver's window. Run them with: pytest -m slow tests/
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(REF_MANAGED), reason="reference tree not present"
)]


def _load_transform(rel_yml: str) -> str:
    from tools.vrl_parse_survey import iter_programs

    path = os.path.join(REF_MANAGED, rel_yml)
    for p, kind, prog in iter_programs(os.path.dirname(path)):
        if p == path and kind == "transform":
            return prog
    raise AssertionError(f"no transform block in {rel_yml}")


def _run(spark, rel_yml: str, event: dict) -> dict:
    prog = _load_transform(rel_yml)
    inferred = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(event)], 1)
    )
    df = spark.createDataFrame([(json.dumps(event),)], "message string").crossJoin(
        inferred.select(
            F.struct(*[F.col(f"`{c}`") for c in inferred.columns]).alias("json")
        ).limit(1)
    )
    out = compile_vrl(prog)(df)
    rows = out.collect()
    assert rows, f"{rel_yml}: event fell into an abort branch"
    return _norm(rows[0].asDict(recursive=True))


def _norm(v):
    from pyspark.sql.types import VariantVal

    if isinstance(v, VariantVal):
        return _norm(json.loads(v.toJson()))
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    return v


def _ts_utc(v):
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            return v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v
    return v


def _s(v):
    return str(v).strip('"')


def test_cloudflare_dns_full_transform_verbatim(spark):
    event = {
        "Timestamp": 1717200000,
        "SourceIP": "203.0.113.5",
        "QueryName": "www.example.com",
        "QueryType": 28,
        "ColoCode": "DUB",
        "EDNSSubnet": "198.51.100.0",
        "EDNSSubnetLength": 24,
        "ResponseCached": True,
        "ResponseCode": 0,
    }
    d = _run(spark, "cloudflare/tables/dns.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717200000)
    cd = d["cloudflare"]["dns"]
    assert _s(cd["source"]["ip"]) == "203.0.113.5"
    assert _s(d["source"]["ip"]) == "203.0.113.5"
    assert _s(cd["query"]["name"]) == "www.example.com"
    assert _s(d["dns"]["question"]["name"]) == "www.example.com"
    assert cd["query"]["type"] == 28
    assert cd["response"]["code"] == 0
    assert cd["response"]["cached"] is True
    assert cd["edns"]["subnet_length"] == 24
    ips = [_s(i) for i in d["related"]["ip"]]
    assert set(ips) == {"203.0.113.5", "198.51.100.0"}


def test_matano_alerts_full_transform_verbatim(spark):
    """matano_alerts/log_source.yml: `. = del(.json)` root replacement
    followed by the timestamp-cast ladder over ECS date fields."""
    event = {
        "ts": "2024-06-01T10:00:00Z",
        "matano": {
            "alert": {
                "id": "a-1",
                "rule_name": "brute_force",
                "original_timestamp": "2024-06-01T09:59:00Z",
            }
        },
        "event": {
            "created": "2024-06-01T09:59:30Z",
            "start": "2024-06-01T09:58:00Z",
            "end": "2024-06-01T09:59:50Z",
            "ingested": "2024-06-01T10:00:05Z",
        },
        "file": {"created": "2024-05-01T00:00:00Z", "mtime": "2024-05-02T00:00:00Z"},
        "user": {"name": "alice"},
        "source": {"ip": "10.0.0.1"},
    }
    d = _run(spark, "matano_alerts/log_source.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime(2024, 6, 1, 10, 0, 0)
    al = d["matano"]["alert"]
    assert _s(al["id"]) == "a-1"
    assert _s(al["rule_name"]) == "brute_force"
    assert _ts_utc(al["original_timestamp"]) == dt.datetime(2024, 6, 1, 9, 59, 0)
    assert _ts_utc(d["event"]["created"]) == dt.datetime(2024, 6, 1, 9, 59, 30)
    assert _ts_utc(d["event"]["end"]) == dt.datetime(2024, 6, 1, 9, 59, 50)
    assert _ts_utc(d["file"]["mtime"]) == dt.datetime(2024, 5, 2, 0, 0, 0)
    # untouched fields survive the root replacement
    assert _s(d["user"]["name"]) == "alice"
    assert _s(d["source"]["ip"]) == "10.0.0.1"


def test_crowdstrike_fdr_processrollup2_verbatim(spark):
    """crowdstrike/tables/fdr.yml on a ProcessRollup2 event: the
    event_simpleName→event-info dispatch, ContextTimeStamp seconds
    float → ts, nullish normalization ('-' → null), zero-hash gating,
    platform mapping, command-line arg split with quote stripping, and
    executable basename extraction (backslash path)."""
    event = {
        "event_simpleName": "ProcessRollup2",
        "id": "evt-1",
        "aid": "agent-1",
        "aip": "198.51.100.9",
        "UTCTimestamp": 1717200000000,
        "ContextTimeStamp": "1717200000.123",
        "AgentVersion": "7.0.1",
        "ComputerName": "WIN-HOST",
        "MachineDomain": "corp.example.com",
        "event_platform": "Win",
        "CommandLine": "\"C:\\Windows\\System32\\cmd.exe\" /c whoami",
        "ImageFileName": "\\Device\\HarddiskVolume1\\Windows\\System32\\cmd.exe",
        "MD5HashData": "9e107d9d372bb6826bd81d3542a419d6",
        "SHA256HashData": "0000000000000000000000000000000000000000000000000000000000000000",
        "TargetProcessId": "1234",
        "ParentBaseFileName": "explorer.exe",
        "City": "Dublin",
        "Country": "Ireland",
    }
    d = _run(spark, "crowdstrike/tables/fdr.yml", event)
    # ts prefers ContextTimeStamp (seconds float)
    ts = _ts_utc(d["ts"])
    assert ts is not None and ts.replace(microsecond=0) == dt.datetime(
        2024, 6, 1, 0, 0, 0
    )
    assert _ts_utc(d["event"]["created"]) == dt.datetime(2024, 6, 1, 0, 0, 0)
    assert d["event"]["kind"] == "event"
    assert d["event"]["outcome"] == "success"
    assert "process" in d["event"]["category"]
    assert "start" in d["event"]["type"]
    assert _s(d["event"]["action"]) == "ProcessRollup2"
    assert _s(d["event"]["id"]) == "evt-1"
    assert _s(d["observer"]["serial_number"]) == "agent-1"
    assert [_s(i) for i in d["observer"]["ip"]] == ["198.51.100.9"]
    assert _s(d["host"]["name"]) == "WIN-HOST"
    assert _s(d["host"]["geo"]["city_name"]) == "Dublin"
    assert _s(d["os"]["type"]) == "windows"
    # only the non-zero hash lands
    assert [_s(h) for h in d["related"]["hash"]] == [
        "9e107d9d372bb6826bd81d3542a419d6"
    ]
    assert _s(d["process"]["name"]) == "cmd.exe"
    args = [_s(a) for a in d["process"]["args"]]
    assert args == ["C:\\Windows\\System32\\cmd.exe", "/c", "whoami"]
    assert d["process"]["args_count"] == 3
    assert "WIN-HOST" in [_s(h) for h in d["related"]["hosts"]]
