"""Round-8 verbatim full-file executions, batch 4: the next tier of
managed transforms with no execution-level semantic check — okta
system (the pack behind the okta gate row, here from the REFERENCE
text), aws_vpcflow (v2 space-framed + root-spread merge), aws_s3access
(the S3 server-access grok), aws_s3inventory, aws_config_history,
cloudflare/firewall_event, msft/aad_auditlogs, zeek/dns.

Reference programs: /root/reference/data/managed/log_sources/
<pack>/(log_source.yml | tables/<table>.yml)."""

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


def _run(spark, rel_yml: str, event: dict | None, message: str | None = None) -> dict:
    prog = _load_transform(rel_yml)
    raw = spark.createDataFrame(
        [(message if message is not None else json.dumps(event),)],
        "message string",
    )
    if event:
        inferred = spark.read.json(
            spark.sparkContext.parallelize([json.dumps(event)], 1)
        )
        df = raw.crossJoin(
            inferred.select(
                F.struct(
                    *[F.col(f"`{c}`") for c in inferred.columns]
                ).alias("json")
            ).limit(1)
        )
    else:
        df = raw.select(
            "message", F.parse_json(F.lit("{}")).alias("json")
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
    """Variant-tolerant string compare helper."""
    return str(v).strip('"')


# ---------------------------------------------------------------- okta


def test_okta_system_full_transform_verbatim(spark):
    """okta/tables/system.yml: the manual risk KV parser, behaviors
    brace-strip + parse_key_value, ip_chain map_values restructuring,
    target routing into user/group, outcome normalization, and the
    parse_user_agent tail."""
    event = {
        "published": "2024-06-01T09:30:00.000Z",
        "eventType": "user.session.start",
        "displayMessage": "User login to Okta",
        "uuid": "uuid-1234",
        "severity": "INFO",
        "actor": {
            "alternateId": "alice@example.com",
            "displayName": "Alice Example",
            "id": "00u1",
            "type": "User",
        },
        "client": {
            "device": "Computer",
            "id": None,
            "ipAddress": "203.0.113.7",
            "zone": "null",
            "geographicalContext": {
                "city": "Dublin",
                "state": "Dublin",
                "country": "Ireland",
                "geolocation": {"lat": 53.34, "lon": -6.26},
            },
            "userAgent": {
                "browser": "CHROME",
                "os": "Mac OS X",
                "rawUserAgent": (
                    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
                    "AppleWebKit/537.36 (KHTML, like Gecko) "
                    "Chrome/125.0.0.0 Safari/537.36"
                ),
            },
        },
        "outcome": {"result": "SUCCESS", "reason": None},
        "transaction": {"id": "tx-9", "type": "WEB"},
        "debugContext": {
            "debugData": {
                "requestId": "req-1",
                "requestUri": "/api/v1/authn",
                "url": "/api/v1/authn?x=1",
                "threatSuspected": "false",
                "deviceFingerprint": "fp-1",
                "risk": "{reasons=Anomalous Device, level=MEDIUM}",
                "behaviors": "{New Geo-Location=NEGATIVE, New Device=POSITIVE}",
                "logOnlySecurityData": json.dumps(
                    {"risk": {"level": "LOW"}, "behaviors": {"New City": "POSITIVE"}}
                ),
            }
        },
        "authenticationContext": {
            "authenticationStep": 0,
            "externalSessionId": "sess-1",
        },
        "securityContext": {
            "asNumber": 64496,
            "asOrg": "example isp",
            "domain": "example.com",
            "isProxy": False,
            "isp": "example isp",
        },
        "request": {
            "ipChain": [
                {
                    "ip": "203.0.113.7",
                    "version": "V4",
                    "geographicalContext": {
                        "city": "Dublin",
                        "state": "Dublin",
                        "country": "Ireland",
                        "postalCode": "D01",
                        "geolocation": {"lat": 53.34, "lon": -6.26},
                    },
                }
            ]
        },
        "target": [
            {
                "alternateId": "alice@example.com",
                "displayName": "Alice Example",
                "id": "00u1",
                "type": "User",
                "login": "alice@example.com",
            }
        ],
    }
    d = _run(spark, "okta/tables/system.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime(2024, 6, 1, 9, 30, 0)
    assert d["okta"]["event_type"] == "user.session.start"
    assert d["event"]["action"] == "user.session.start"
    assert d["event"]["id"] == "uuid-1234"
    assert set(d["event"]["category"]) == {"authentication", "session"}
    assert {"start", "user"} <= set(d["event"]["type"])
    assert d["event"]["outcome"] == "success"
    assert _s(d["okta"]["client"]["ip"]) == "203.0.113.7"
    assert _s(d["source"]["ip"]) == "203.0.113.7"
    assert _s(d["client"]["geo"]["city_name"]) == "Dublin"
    assert _s(d["client"]["geo"]["country_name"]) == "Ireland"
    # manual risk KV parser: "{reasons=..., level=MEDIUM}" → object.
    # The okta schema declares debug_data.flattened as STRING, so the
    # dynamic object may materialize JSON-encoded — parse tolerantly.
    dd = d["okta"]["debug_context"]["debug_data"]

    def _obj(v):
        if isinstance(v, str):
            return json.loads(v)
        return v

    flat = _obj(dd["flattened"])
    risk = _obj(flat["risk"])
    assert _s(risk["reasons"]) == "Anomalous Device"
    assert _s(risk["level"]) == "MEDIUM"
    assert _s(dd["risk_level"]) == "MEDIUM"
    # behaviors brace-strip + parse_key_value(b, "=", ", ")
    behaviors = _obj(flat["behaviors"])
    assert _s(behaviors["New Geo-Location"]) == "NEGATIVE"
    assert _s(behaviors["New Device"]) == "POSITIVE"
    assert _s(dd["request_id"]) == "req-1"
    # ip_chain restructure: geographicalContext → geographical_context
    chain = d["okta"]["request"]["ip_chain"]
    assert len(chain) == 1
    assert _s(chain[0]["geographical_context"]["postal_code"]) == "D01"
    assert "geographicalContext" not in chain[0]
    # target routed into user.target.*
    assert _s(d["user"]["target"]["full_name"]) == "Alice Example"
    assert _s(d["user"]["target"]["email"]) == "alice@example.com"
    assert sorted(_s(u) for u in d["related"]["user"]) == ["Alice Example"]
    assert [_s(i) for i in d["related"]["ip"]] == ["203.0.113.7"]
    # parse_user_agent tail
    assert d["user_agent"]["browser"]["family"] == "Chrome"
    assert d["user_agent"]["os"]["family"] == "Mac OSX"
    assert d["user_agent"]["original"].startswith("Mozilla/5.0 (Macintosh")
    assert d["okta"]["security_context"]["as"]["number"] == 64496


# ------------------------------------------------------------- vpcflow


def test_aws_vpcflow_v2_line_verbatim(spark):
    """aws_vpcflow/log_source.yml on the canonical 14-token v2 line:
    parse_aws_vpc_flow_log, epoch start/end → timestamps, IANA
    protocol map, ACCEPT → success."""
    line = (
        "2 123456789010 eni-1235b8ca123456789 172.31.16.139 172.31.16.21 "
        "20641 22 6 20 4249 1418530010 1418530070 ACCEPT OK"
    )
    d = _run(spark, "aws_vpcflow/log_source.yml", None, message=line)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1418530070)
    assert _ts_utc(d["event"]["start"]) == dt.datetime.utcfromtimestamp(1418530010)
    assert d["event"]["outcome"] == "success"
    assert _s(d["source"]["ip"]) == "172.31.16.139"
    assert int(_s(d["source"]["port"])) == 20641
    assert _s(d["destination"]["ip"]) == "172.31.16.21"
    assert int(_s(d["destination"]["port"])) == 22
    assert _s(d["network"]["iana_number"]) == "6"
    assert _s(d["network"]["transport"]) == "tcp"
    assert _s(d["network"]["type"]) == "ipv4"
    assert int(_s(d["network"]["bytes"])) == 4249
    assert int(_s(d["network"]["packets"])) == 20
    vf = d["aws"]["vpcflow"]
    assert _s(vf["account_id"]) == "123456789010"
    assert _s(vf["interface_id"]) == "eni-1235b8ca123456789"
    assert _s(vf["action"]) == "ACCEPT"
    assert "start" not in (vf or {}) or vf.get("start") is None


# ------------------------------------------------------------ s3access


S3ACCESS_LINE = (
    "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be "
    "awsexamplebucket1 [06/Feb/2019:00:00:38 +0000] 192.0.2.3 "
    "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2bf "
    "3E57427F3EXAMPLE REST.GET.VERSIONING - "
    "\"GET /awsexamplebucket1?versioning HTTP/1.1\" 200 - 113 - 7 - \"-\" "
    "\"S3Console/0.4\" - "
    "s9lzHYrFp76ZVxRcpX9+5cjAnEH2ROuNkd2BHfIa6UkFVdtjf5mKR3/eTPFvsiP/XV/VLi31234= "
    "SigV2 ECDHE-RSA-AES128-GCM-SHA256 AuthHeader "
    "awsexamplebucket1.s3.us-west-1.amazonaws.com TLSV1.1"
)


def test_aws_s3access_full_transform_verbatim(spark):
    d = _run(spark, "aws_s3access/log_source.yml", None, message=S3ACCESS_LINE)
    assert _ts_utc(d["ts"]) == dt.datetime(2019, 2, 6, 0, 0, 38)
    s3 = d["aws"]["s3access"]
    assert _s(s3["bucket"]) == "awsexamplebucket1"
    assert _s(s3["operation"]) == "REST.GET.VERSIONING"
    assert s3["http_status"] == 200
    assert s3["bytes_sent"] == 113
    assert s3["total_time"] == 7
    assert s3["error_code"] is None
    assert d["event"]["outcome"] == "success"
    assert d["event"]["duration"] == 7 * 1_000_000
    assert _s(d["event"]["action"]) == "REST.GET.VERSIONING"
    assert _s(d["http"]["request"]["method"]) == "GET"
    assert _s(d["http"]["version"]) == "1.1"
    assert d["http"]["response"]["status_code"] == 200
    assert _s(d["url"]["original"]) == "/awsexamplebucket1?versioning"
    assert _s(d["url"]["query"]) == "versioning"
    assert _s(d["cloud"]["region"]) == "us-west-1"
    assert _s(d["cloud"]["provider"]) == "aws"
    assert _s(d["client"]["ip"]) == "192.0.2.3"
    assert _s(d["user_agent"]["original"]) == "S3Console/0.4"
    assert _s(d["tls"]["cipher"]) == "ECDHE-RSA-AES128-GCM-SHA256"
    assert _s(d["tls"]["version"]) == "1.1"
    assert _s(d["tls"]["version_protocol"]) == "tls"


# ---------------------------------------------------------- s3inventory


def test_aws_s3inventory_full_transform_verbatim(spark):
    event = {
        "Bucket": "my-bucket",
        "Key": "path/to/object.parquet",
        "VersionId": "v1",
        "IsLatest": "true",
        "IsDeleteMarker": "false",
        "Size": "123456",
        "LastModifiedDate": "2024-03-15T08:00:00.000Z",
        "ETag": "d41d8cd98f00b204e9800998ecf8427e",
        "StorageClass": "STANDARD",
        "IsMultipartUploaded": "false",
        "EncryptionStatus": "SSE-S3",
    }
    d = _run(spark, "aws_s3inventory/log_source.yml", event)
    inv = d["aws"]["s3inventory"]
    assert _s(inv["bucket"]) == "my-bucket"
    assert inv["is_latest"] is True
    assert inv["is_delete_marker"] is False
    assert inv["size"] == 123456
    assert _ts_utc(inv["last_modified"]) == dt.datetime(2024, 3, 15, 8, 0, 0)
    assert _s(d["file"]["path"]) == "s3://my-bucket/path/to/object.parquet"
    assert d["file"]["size"] == 123456
    assert _s(d["file"]["hash"]["md5"]) == "d41d8cd98f00b204e9800998ecf8427e"
    assert [_s(h) for h in d["related"]["hash"]] == [
        "d41d8cd98f00b204e9800998ecf8427e"
    ]
    assert _s(d["cloud"]["service"]["name"]) == "s3"
    assert d["event"]["category"] == ["file"]


# -------------------------------------------------------- config_history


def test_aws_config_history_full_transform_verbatim(spark):
    event = {
        "version": "1.3",
        "configurationItemCaptureTime": "2024-04-02T12:00:00.000Z",
        "configurationItemMD5Hash": "abc123",
        "configurationStateId": 1712059200000,
        "configurationItemStatus": "ResourceDiscovered",
        "arn": "arn:aws:sqs:us-east-1:123456789012:my-queue",
        "resourceType": "AWS::SQS::Queue",
        "resourceId": "my-queue",
        "resourceName": "my-queue",
        "resourceCreationTime": "2024-01-01T00:00:00.000Z",
        "awsRegion": "us-east-1",
        "awsAccountId": "123456789012",
        "availabilityZone": "Not Applicable",
        "relationships": [
            {
                "resourceName": " vpc-1 ",
                "resourceType": "AWS::EC2::VPC",
                "resourceId": "vpc-1",
                "relationshipName": " is contained in ",
            }
        ],
        "configuration": {"QueueName": "my-queue"},
        "tags": {"team": "sec", "env": "prod"},
    }
    d = _run(spark, "aws_config_history/log_source.yml", event)
    assert d["ts"] is not None  # now() — non-null is the contract
    ch = d["aws"]["config_history"]
    assert _ts_utc(ch["item"]["capture_time"]) == dt.datetime(2024, 4, 2, 12, 0, 0)
    assert _s(ch["item"]["state_id"]) == "1712059200000"
    assert _s(ch["resource"]["type"]) == "AWS::SQS::Queue"
    rel = ch["relationship"][0]
    assert _s(rel["name"]) == "is contained in"  # strip_whitespace
    assert _s(rel["resource"]["id"]) == "vpc-1"
    assert _s(d["cloud"]["service"]["name"]) == "sqs"  # AWS::SQS::Queue
    assert _s(d["cloud"]["account"]["id"]) == "123456789012"
    assert d["cloud"].get("availability_zone") is None  # "Not Applicable"
    assert json.loads(_s(ch["configuration"]).replace("'", '"')) == {
        "QueueName": "my-queue"
    } or "QueueName" in _s(ch["configuration"])
    tags = {_s(t) for t in d["tags"]}
    assert tags == {"team=sec", "env=prod"}
    assert d["event"]["type"] == ["creation"]  # ResourceDiscovered
    assert _s(d["event"]["hash"]) == "abc123"


# ------------------------------------------------------- firewall_event


def test_cloudflare_firewall_event_full_transform_verbatim(spark):
    event = {
        "Action": "BLOCK",
        "ClientASN": "64496",
        "ClientASNDescription": "EXAMPLE-ISP",
        "ClientCountry": "ie",
        "ClientIP": "203.0.113.9",
        "ClientIPClass": "noRecord",
        "ClientRefererHost": "ref.example.com",
        "ClientRefererPath": "/from",
        "ClientRefererQuery": "?q=1",
        "ClientRefererScheme": "https",
        "ClientRequestHost": "www.example.com",
        "ClientRequestMethod": "POST",
        "ClientRequestPath": "/login",
        "ClientRequestProtocol": "HTTP/2",
        "ClientRequestQuery": "?x=y",
        "ClientRequestScheme": "https",
        "ClientRequestUserAgent": (
            "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
            "(KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36"
        ),
        "Datetime": 1717200000,
        "Description": "WAF block rule",
        "EdgeColoCode": "DUB",
        "EdgeResponseStatus": "403",
        "Kind": "firewall",
        "MatchIndex": 0,
        "Metadata": {"ruleset": "owasp"},
        "OriginResponseStatus": "0",
        "OriginatorRayID": "ray-0",
        "RayID": "ray-1",
        "RuleID": "rule-42",
        "Ref": "ref-42",
        "Source": "firewallrules",
    }
    d = _run(spark, "cloudflare/tables/firewall_event.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717200000)
    fe = d["cloudflare"]["firewall_event"]
    assert _s(fe["action"]) == "BLOCK"
    assert _s(d["event"]["action"]) == "block"
    assert fe["edge"]["response"]["status"] == 403
    assert d["http"]["response"]["status_code"] == 403
    assert _s(d["http"]["request"]["method"]) == "POST"
    assert _s(d["network"]["protocol"]) == "http"
    assert _s(d["http"]["version"]) == "2"
    assert fe["client"]["asn"]["value"] == 64496
    assert d["source"]["as"]["number"] == 64496
    assert _s(d["source"]["geo"]["country_iso_code"]) == "ie"
    assert _s(d["source"]["ip"]) == "203.0.113.9"
    assert _s(d["rule"]["id"]) == "rule-42"
    assert json.loads(_s(fe["metadata"])) == {"ruleset": "owasp"}
    assert d["user_agent"]["browser"]["family"] == "Chrome"
    assert d["user_agent"]["os"]["family"] == "Windows 10"
    assert [_s(i) for i in d["related"]["ip"]] == ["203.0.113.9"]


# -------------------------------------------------------- aad_auditlogs


def test_msft_aad_auditlogs_full_transform_verbatim(spark):
    event = {
        "id": "Directory_abc_123",
        "category": "UserManagement",
        "correlationId": "corr-1",
        "result": "success",
        "resultReason": "",
        "activityDisplayName": "Update user",
        "activityDateTime": "2024-05-20T14:30:00Z",
        "loggedByService": "Core Directory",
        "operationType": "Update",
        "durationMs": 125,
        "level": "Information",
        "callerIpAddress": "198.51.100.4",
        "initiatedBy": {
            "user": {
                "id": "u-1",
                "displayName": "Admin One",
                "userPrincipalName": "admin@example.com",
                "ipAddress": "198.51.100.4",
            }
        },
        "targetResources": [
            {
                "id": "t-1",
                "displayName": "Bob Target",
                "type": "User",
                "userPrincipalName": "bob@example.com",
                "modifiedProperties": [
                    {
                        "displayName": "AccountEnabled",
                        "oldValue": "false",
                        "newValue": "true",
                    }
                ],
            }
        ],
    }
    d = _run(spark, "msft/tables/aad_auditlogs.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime(2024, 5, 20, 14, 30, 0)
    assert d["event"]["outcome"] == "success"
    assert _s(d["event"]["action"]) == "Update user"
    assert {"change", "user"} <= set(d["event"]["type"])
    assert d["event"]["duration"] == 125 * 1_000_000
    assert _s(d["event"]["id"]) == "Directory_abc_123"
    assert _s(d["source"]["ip"]) == "198.51.100.4"
    aal = d["azure"]["aad_auditlogs"]
    assert _s(aal["activity_display_name"]) == "Update user"
    assert _s(aal["operation_type"]) == "Update"
    tr = aal["target_resources"][0]
    assert _s(tr["display_name"]) == "Bob Target"
    assert _s(tr["user_principal_name"]) == "bob@example.com"
    mp = tr["modified_properties"][0]
    assert _s(mp["display_name"]) == "AccountEnabled"
    assert _s(mp["new_value"]) == "true"
    ib = aal["initiated_by"]["user"]
    assert _s(ib["user_principal_name"]) == "admin@example.com"
    assert _s(d["cloud"]["provider"]) == "azure"


# ------------------------------------------------------------ zeek dns


def test_zeek_dns_full_transform_verbatim(spark):
    event = {
        "ts": 1717200000.123,
        "uid": "CuKFds3",
        "id.orig_h": "10.0.0.5",
        "id.orig_p": 54321,
        "id.resp_h": "10.0.0.53",
        "id.resp_p": 53,
        "proto": "udp",
        "trans_id": 1337,
        "rtt": 0.002,
        "query": "www.example.com",
        "qclass": 1,
        "qclass_name": "C_INTERNET",
        "qtype": 1,
        "qtype_name": "A",
        "rcode": 0,
        "rcode_name": "NOERROR",
        "AA": False,
        "TC": False,
        "RD": True,
        "RA": True,
        "Z": 0,
        "answers": ["93.184.215.14", "cname.example.com"],
        "TTLs": [3600, 60],
        "rejected": False,
    }
    prog = _load_transform("zeek/tables/dns.yml")
    df = spark.createDataFrame([(json.dumps(event),)], "raw string").select(
        F.parse_json(F.col("raw")).alias("json"),
        F.lit("2024-06-01 00:00:00").cast("timestamp").alias("ts"),
    )
    out = compile_vrl(prog)(df)
    d = _norm(out.collect()[0].asDict(recursive=True))
    assert _s(d["network"]["protocol"]) == "dns"
    assert _s(d["network"]["transport"]) == "udp"
    assert _s(d["source"]["ip"]) == "10.0.0.5"
    assert int(_s(d["source"]["port"])) == 54321
    assert int(_s(d["destination"]["port"])) == 53
    assert _s(d["zeek"]["session_id"]) == "CuKFds3"
    assert set(d["dns"]["header_flags"]) == {"RD", "RA"}
    assert _s(d["dns"]["question"]["class"]) == "IN"
    assert _s(d["dns"]["type"]) == "answer"  # rcode_name present
    assert d["event"]["duration"] == 2_000_000  # rtt 0.002s → ns
    answers = d["dns"]["answers"]
    assert [(_s(a["data"]), a["ttl"]) for a in answers] == [
        ("93.184.215.14", 3600),
        ("cname.example.com", 60),
    ]
    assert [_s(i) for i in d["dns"]["resolved_ip"]] == ["93.184.215.14"]
