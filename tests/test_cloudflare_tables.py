"""End-to-end fixtures for the six cloudflare tables beyond
http_request (ref data/managed/log_sources/cloudflare/tables/*.yml):
one realistic record each through run_log_source, asserting ts, the
ECS mappings, and the vendor namespace."""

from __future__ import annotations

import datetime as dt
import json
import shutil
import tempfile
from pathlib import Path

import pytest

from matano_spark.pipeline import run_log_source

ROOT = Path(__file__).resolve().parents[1] / "data" / "log_sources"

TS = 1714557600  # 2024-05-01T10:00:00Z
TS_DT = dt.datetime(2024, 5, 1, 10, 0)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="matano_spark_cf_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, tmpdir, records, table):
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    with open(raw / "objects.json", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    tables = run_log_source(
        spark,
        str(ROOT / "cloudflare"),
        str(raw / "*.json"),
        str(tmpdir / "lake"),
        quarantine_root=str(tmpdir / "q"),
    )
    res = tables[table]
    assert res.rows_sidelined == 0
    return res.read()


def test_cloudflare_dns(spark, tmpdir):
    rec = {
        "Timestamp": TS, "SourceIP": "198.51.100.7", "QueryName": "example.com",
        "QueryType": 28, "ColoCode": "AMS", "EDNSSubnet": "203.0.113.0",
        "EDNSSubnetLength": 24, "ResponseCached": True, "ResponseCode": 0,
    }
    df = _run(spark, tmpdir, [rec], "dns")
    r = df.selectExpr(
        "ts", "source.ip AS sip", "dns.question.name AS q",
        "cloudflare.dns.query.type AS qt",
        "cloudflare.dns.response.cached AS cached",
        "related.ip AS rip", "related.hosts AS rh",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.sip == "198.51.100.7"
    assert r.q == "example.com"
    assert r.qt == 28
    assert r.cached is True
    assert set(r.rip) == {"198.51.100.7", "203.0.113.0"}
    assert r.rh == ["example.com"]


def test_cloudflare_audit(spark, tmpdir):
    rec = {
        "When": TS, "ActionType": "TOKEN_Create", "ActionResult": True,
        "ActorEmail": "admin@example.com", "ActorID": "a1", "ActorIP": "203.0.113.9",
        "ActorType": "user", "ID": "e9", "Interface": "API",
        "NewValue": {"name": "token"}, "OwnerID": "o1",
        "ResourceID": "r1", "ResourceType": "account",
    }
    df = _run(spark, tmpdir, [rec], "audit")
    r = df.selectExpr(
        "ts", "event.action AS act", "event.outcome AS outcome",
        "user.email AS email", "source.ip AS sip", "event.id AS eid",
        "event.provider AS prov", "cloudflare.audit.new_value AS nv",
        "related.user AS ru",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.act == "token_create"
    assert r.outcome == "success"
    assert r.email == "admin@example.com"
    assert r.sip == "203.0.113.9"
    assert r.eid == "e9"
    assert r.prov == "API"
    assert json.loads(r.nv) == {"name": "token"}
    assert r.ru == ["a1"]


def test_cloudflare_firewall_event(spark, tmpdir):
    rec = {
        "Datetime": TS, "Action": "BLOCK", "ClientRequestMethod": "GET",
        "EdgeResponseStatus": 403, "RuleID": "rule9", "Ref": "ref1",
        "Description": "block bad bots", "ClientASN": 64500,
        "ClientCountry": "de", "ClientIP": "198.51.100.9",
        "ClientRequestHost": "shop.example.com", "ClientRequestPath": "/admin",
        "ClientRequestProtocol": "HTTP/1.1", "ClientRequestScheme": "https",
        "ClientRequestUserAgent": "curl/8.0", "ClientRefererHost": "evil.example.net",
        "EdgeColoCode": "FRA", "Kind": "firewall", "MatchIndex": 0,
        "Metadata": {"filter": "f1"}, "OriginResponseStatus": 0,
        "RayID": "ray1", "Source": "firewallrules",
    }
    df = _run(spark, tmpdir, [rec], "firewall_event")
    r = df.selectExpr(
        "ts", "event.action AS act", "http.request.method AS method",
        "http.response.status_code AS status", "rule.id AS rid",
        "network.protocol AS proto", "http.version AS hv",
        "source.as.number AS asn", "source.ip AS sip",
        "url.scheme AS scheme", "user_agent.original AS ua",
        "related.hosts AS rh",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.act == "block"
    assert r.method == "GET"
    assert r.status == 403
    assert r.rid == "rule9"
    assert r.proto == "http"
    assert r.hv == "1.1"
    assert r.asn == 64500
    assert r.sip == "198.51.100.9"
    assert r.scheme == "https"
    assert r.ua == "curl/8.0"
    assert set(r.rh) == {"evil.example.net", "shop.example.com"}


def test_cloudflare_nel_report(spark, tmpdir):
    rec = {
        "Timestamp": TS, "Type": "network-error", "ClientIPASN": 64500,
        "ClientIPASNDescription": "ExampleNet", "ClientIPCountry": "DE",
        "LastKnownGoodColoCode": "AMS", "Phase": "connection",
    }
    df = _run(spark, tmpdir, [rec], "nel_report")
    r = df.selectExpr(
        "ts", "error.type AS et",
        "cloudflare.nel_report.client.ip.asn.value AS asn",
        "cloudflare.nel_report.phase AS phase",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.et == "network-error"
    assert r.asn == 64500
    assert r.phase == "connection"


def test_cloudflare_spectrum_event(spark, tmpdir):
    rec = {
        "Timestamp": TS, "ConnectTimestamp": TS - 10, "DisconnectTimestamp": TS + 50,
        "Event": "Disconnect", "OriginBytes": 1000, "OriginIP": "192.0.2.10",
        "OriginPort": 5432, "Application": "app1", "Status": 200,
        "ClientAsn": 64500, "ClientBytes": 300, "ClientCountry": "de",
        "ClientIP": "198.51.100.10", "ClientPort": 55001, "ClientProto": "TCP",
        "ClientTlsCipher": "AEAD-AES128-GCM-SHA256", "ClientTlsProtocol": "TLSv1.3",
        "ClientTlsStatus": "OK", "ColoCode": "AMS", "IpFirewall": True,
        "OriginProto": "tcp", "ProxyProtocol": "off",
    }
    df = _run(spark, tmpdir, [rec], "spectrum_event")
    r = df.selectExpr(
        "ts", "event.action AS act", "event.start AS start", "event.end AS end",
        "destination.bytes AS dbytes", "destination.ip AS dip",
        "destination.port AS dport", "source.bytes AS sbytes",
        "source.ip AS sip", "network.transport AS transport",
        "tls.version_protocol AS tlsp", "tls.version AS tlsv",
        "related.ip AS rip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.act == "disconnect"
    assert r.start == TS_DT - dt.timedelta(seconds=10)
    assert r.end == TS_DT + dt.timedelta(seconds=50)
    assert r.dbytes == 1000 and r.dip == "192.0.2.10" and r.dport == 5432
    assert r.sbytes == 300 and r.sip == "198.51.100.10"
    assert r.transport == "tcp"
    assert r.tlsp == "tls" and r.tlsv == "1.3"
    assert set(r.rip) == {"198.51.100.10", "192.0.2.10"}


def test_cloudflare_network_analytics(spark, tmpdir):
    rec = {
        "Datetime": TS, "Outcome": "drop", "IPDestinationAddress": "192.0.2.20",
        "DestinationASN": 64500, "DestinationPort": 443, "Direction": "ingress",
        "IPProtocolName": "TCP", "IPSourceAddress": "198.51.100.20",
        "SourceASN": 64501, "SourcePort": 50000, "RuleID": "ruleNA",
        "ColoCountry": "NL", "ColoGeoHash": "u17", "MitigationSystem": "dosd",
        "TCPFlags": 2, "TCPFlagsString": "S", "IPTtl": 60, "Verdict": "drop",
        "SampleInterval": 1000,
    }
    df = _run(spark, tmpdir, [rec], "network_analytics")
    r = df.selectExpr(
        "ts", "event.outcome AS outcome", "destination.ip AS dip",
        "destination.as.number AS dasn", "destination.port AS dport",
        "network.direction AS dir", "network.transport AS transport",
        "source.ip AS sip", "rule.id AS rid",
        "cloudflare.network_analytics.tcp.flags.value AS tcpflags",
        "cloudflare.network_analytics.verdict AS verdict",
        "related.hash AS rhash", "related.ip AS rip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.outcome == "failure"
    assert r.dip == "192.0.2.20" and r.dasn == 64500 and r.dport == 443
    assert r.dir == "ingress"
    assert r.transport == "tcp"
    assert r.sip == "198.51.100.20"
    assert r.rid == "ruleNA"
    assert r.tcpflags == 2
    assert r.verdict == "drop"
    assert r.rhash == ["u17"]
    assert set(r.rip) == {"198.51.100.20", "192.0.2.20"}
