"""Round-8 verbatim full-file executions, batch 7: the cloudflare
long tail (audit, nel_report, spectrum_event, network_analytics), duo
admin/telephony/offline_enrollment, onepassword item_usages, snyk
vulnerabilities, and aws_cloudtrail digest.

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


# --------------------------------------------------------- cloudflare


def test_cloudflare_audit_full_transform_verbatim(spark):
    event = {
        "When": 1717200000,
        "ActionType": "Login",
        "ActionResult": True,
        "ActorEmail": "alice@corp.com",
        "ActorID": "actor-1",
        "ActorIP": "203.0.113.9",
        "ActorType": "user",
        "ID": "evt-77",
        "Interface": "API",
        "Metadata": {"zone": {"id": "z1"}},
        "NewValue": {"setting": "on"},
        "OldValue": {"setting": "off"},
        "OwnerID": "owner-1",
        "ResourceID": "res-1",
        "ResourceType": "zone",
    }
    d = _run(spark, "cloudflare/tables/audit.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717200000)
    assert d["event"]["category"] == ["authentication"]
    assert _s(d["event"]["action"]) == "login"  # downcased
    assert d["event"]["outcome"] == "success"  # ActionResult true
    assert _s(d["event"]["id"]) == "evt-77"
    assert _s(d["event"]["provider"]) == "API"
    assert _s(d["user"]["email"]) == "alice@corp.com"
    assert _s(d["user"]["id"]) == "actor-1"
    assert _s(d["source"]["ip"]) == "203.0.113.9"
    ca = d["cloudflare"]["audit"]
    assert _s(ca["actor"]["type"]) == "user"
    assert _s(ca["owner"]["id"]) == "owner-1"
    assert _s(ca["resource"]["type"]) == "zone"
    # Metadata/NewValue/OldValue are JSON-encoded strings
    assert json.loads(_s(ca["metadata"])) == {"zone": {"id": "z1"}}
    assert json.loads(_s(ca["new_value"])) == {"setting": "on"}
    assert json.loads(_s(ca["old_value"])) == {"setting": "off"}
    assert [_s(u) for u in d["related"]["user"] if u is not None] == ["actor-1"]
    assert [_s(i) for i in d["related"]["ip"] if i is not None] == [
        "203.0.113.9"
    ]


def test_cloudflare_nel_report_full_transform_verbatim(spark):
    event = {
        "Timestamp": 1717200000,
        "Type": "tcp.timed_out",
        "ClientIPASN": 13335,
        "ClientIPASNDescription": "CLOUDFLARENET",
        "ClientIPCountry": "IE",
        "LastKnownGoodColoCode": "DUB",
        "Phase": "connection",
    }
    d = _run(spark, "cloudflare/tables/nel_report.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717200000)
    assert _s(d["error"]["type"]) == "tcp.timed_out"
    nr = d["cloudflare"]["nel_report"]
    assert nr["client"]["ip"]["asn"]["value"] == 13335
    assert _s(nr["client"]["ip"]["asn"]["description"]) == "CLOUDFLARENET"
    assert _s(nr["client"]["ip"]["country"]) == "IE"
    assert _s(nr["last_known_good"]["colo"]["code"]) == "DUB"
    assert _s(nr["phase"]) == "connection"


def test_cloudflare_spectrum_event_full_transform_verbatim(spark):
    event = {
        "Timestamp": 1717200010,
        "ConnectTimestamp": 1717200000,
        "DisconnectTimestamp": 1717200060,
        "Event": "Disconnect",
        "OriginBytes": 2048,
        "OriginIP": "192.0.2.50",
        "OriginPort": 8443,
        "Application": "app-1",
        "Status": 200,
        "ClientAsn": 64500,
        "ClientBytes": 1024,
        "ClientCountry": "ie",
        "ClientIP": "203.0.113.31",
        "ClientPort": 50123,
        "ClientMatchedIpFirewall": "UNKNOWN",
        "ClientProto": "TCP",
        "ClientTcpRtt": 15000,
        "ClientTlsCipher": "AEAD-AES128-GCM-SHA256",
        "ClientTlsClientHelloServerName": "svc.example.com",
        "ClientTlsProtocol": "TLSv1.2",
        "ClientTlsStatus": "OK",
    }
    d = _run(spark, "cloudflare/tables/spectrum_event.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717200010)
    assert _ts_utc(d["event"]["start"]) == dt.datetime.utcfromtimestamp(
        1717200000
    )
    assert _ts_utc(d["event"]["end"]) == dt.datetime.utcfromtimestamp(
        1717200060
    )
    assert _s(d["event"]["action"]) == "disconnect"
    assert _s(d["event"]["id"]) == "app-1"
    assert d["destination"]["bytes"] == 2048
    assert _s(d["destination"]["ip"]) == "192.0.2.50"
    assert d["destination"]["port"] == 8443
    assert d["http"]["response"]["status_code"] == 200
    assert d["source"]["as"]["number"] == 64500
    assert d["source"]["bytes"] == 1024
    assert _s(d["source"]["geo"]["country_iso_code"]) == "ie"
    assert _s(d["source"]["ip"]) == "203.0.113.31"
    assert d["source"]["port"] == 50123
    assert _s(d["network"]["transport"]) == "tcp"
    # TLSv1.2 grok split
    assert _s(d["tls"]["version_protocol"]) == "tls"
    assert _s(d["tls"]["version"]) == "1.2"
    se = d["cloudflare"]["spectrum_event"]
    assert _s(se["client"]["tls"]["cipher"]) == "AEAD-AES128-GCM-SHA256"
    assert se["client"]["tcp_rtt"] == 15000


def test_cloudflare_network_analytics_full_transform_verbatim(spark):
    event = {
        "Datetime": 1717200000,
        "Outcome": "drop",
        "DestinationASN": 64500,
        "IPDestinationAddress": "192.0.2.7",
        "DestinationPort": 443,
        "Direction": "ingress",
        "IPProtocolName": "TCP",
        "IPSourceAddress": "203.0.113.99",
        "SourceASN": 13335,
        "SourcePort": 55555,
        "RuleID": "rule-9",
        "AttackCampaignID": "camp-1",
        "AttackID": "atk-1",
        "ColoCountry": "IE",
        "ColoGeoHash": "gc7x3r",
        "ColoID": 18,
        "ColoName": "DUB",
        "DestinationASNDescription": "EXAMPLE-AS",
        "DestinationCountry": "US",
        "DestinationGeoHash": "dqcjqc",
        "Verdict": "drop",
    }
    d = _run(spark, "cloudflare/tables/network_analytics.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717200000)
    assert d["event"]["outcome"] == "failure"  # drop
    assert d["destination"]["as"]["number"] == 64500
    assert _s(d["destination"]["ip"]) == "192.0.2.7"
    assert d["destination"]["port"] == 443
    assert _s(d["network"]["direction"]) == "ingress"
    assert _s(d["network"]["transport"]) == "tcp"
    assert _s(d["source"]["ip"]) == "203.0.113.99"
    assert d["source"]["as"]["number"] == 13335
    assert d["source"]["port"] == 55555
    assert _s(d["rule"]["id"]) == "rule-9"
    na = d["cloudflare"]["network_analytics"]
    assert _s(na["attack"]["id"]) == "atk-1"
    assert na["colo"]["id"] == 18
    assert _s(na["colo"]["name"]) == "DUB"
    assert _s(na["verdict"]) == "drop"
    # geo hashes fold into related.hash; src+dst into related.ip
    assert {_s(h) for h in d["related"]["hash"] if h is not None} == {
        "gc7x3r",
        "dqcjqc",
    }
    assert {_s(i) for i in d["related"]["ip"] if i is not None} == {
        "203.0.113.99",
        "192.0.2.7",
    }


# ---------------------------------------------------------------- duo


def test_duo_admin_full_transform_verbatim(spark):
    desc = {"realname": "Alice Cooper", "email": "alice@corp.com"}
    event = {
        "timestamp": 1717200000,
        "action": "user_update",
        "username": "admin-bob",
        "object": "alice",
        "description": json.dumps(desc),
    }
    d = _run(spark, "duo/tables/admin.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717200000)
    assert d["event"]["kind"] == "event"
    assert d["event"]["outcome"] == "success"
    assert d["event"]["category"] == ["iam"]
    # user_update -> type user + change (contains "update")
    assert set(d["event"]["type"]) == {"user", "change"}
    assert _s(d["event"]["action"]) == "user_update"
    assert _s(d["user"]["name"]) == "admin-bob"
    assert _s(d["user"]["target"]["name"]) == "alice"
    assert _s(d["user"]["changes"]["name"]) == "Alice Cooper"
    assert _s(d["user"]["changes"]["email"]) == "alice@corp.com"
    da = d["duo"]["admin"]
    assert _s(da["action"]) == "user_update"
    assert _s(da["user"]["name"]) == "admin-bob"
    assert _s(da["action_performed_on"]) == "alice"
    # flattened: re-encoded compact JSON; message/event.reason deleted
    assert json.loads(_s(da["flattened"])) == desc
    assert d.get("message") in (None, "")
    assert (d.get("event") or {}).get("reason") is None
    assert [_s(u) for u in d["related"]["user"] if u is not None] == [
        "admin-bob"
    ]


def test_duo_telephony_full_transform_verbatim(spark):
    event = {
        "timestamp": 1717200000,
        "context": "authentication",
        "credits": 2,
        "phone": "+353830000000",
        "type": "sms",
    }
    d = _run(spark, "duo/tables/telephony.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717200000)
    assert d["event"]["kind"] == "event"
    dtl = d["duo"]["telephony"]
    assert _s(dtl["event_type"]) == "authentication"
    assert dtl["credits"] == 2
    assert _s(dtl["phone_number"]) == "+353830000000"
    assert _s(dtl["type"]) == "sms"


def test_duo_offline_enrollment_full_transform_verbatim(spark):
    desc = {
        "hostname": "WIN-LAPTOP-9",
        "user_agent": "DuoCredProv/4.2",
        "factor": "duo_otp",
    }
    event = {
        "timestamp": 1717200000,
        "action": "o2fa_user_provisioned",
        "username": "carol",
        "object": "carol",
        "description": json.dumps(desc),
    }
    d = _run(spark, "duo/tables/offline_enrollment.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717200000)
    de = d["duo"]["offline_enrollment"]
    assert _s(de["action"]) == "o2fa_user_provisioned"
    assert _s(de["description"]["hostname"]) == "WIN-LAPTOP-9"
    assert _s(de["description"]["user_agent"]) == "DuoCredProv/4.2"
    assert _s(de["description"]["factor"]) == "duo_otp"
    assert _s(de["user"]["name"]) == "carol"
    assert _s(d["user"]["name"]) == "carol"
    assert [_s(h) for h in d["related"]["hosts"] if h is not None] == [
        "WIN-LAPTOP-9"
    ]
    assert [_s(u) for u in d["related"]["user"] if u is not None] == ["carol"]


# -------------------------------------------------------- onepassword


def test_onepassword_item_usages_full_transform_verbatim(spark):
    event = {
        "uuid": "usage-1",
        "timestamp": 1717200000,
        "action": "secure-copy",
        "vault_uuid": "vault-9",
        "item_uuid": "item-7",
        "user": {"uuid": "u-1", "name": "Dana Fox", "email": "dana@corp.com"},
        "client": {
            "app_name": "1Password Browser Extension",
            "app_version": "81202",
            "ip_address": "198.51.100.77",
            "os_name": "MacOSX",
            "os_version": "14.4",
            "platform_name": "Chrome",
        },
        "location": {"city": "Dublin", "country": "IE"},
    }
    d = _run(spark, "onepassword/tables/item_usages.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717200000)
    assert d["event"]["kind"] == "event"
    assert d["event"]["category"] == ["file"]
    assert d["event"]["type"] == ["access"]
    assert _s(d["event"]["action"]) == "secure-copy"
    # `.event.created = .ts` runs BEFORE ts lands -> stays null
    assert (d.get("event") or {}).get("created") is None
    assert _s(d["user"]["id"]) == "u-1"
    assert _s(d["user"]["full_name"]) == "Dana Fox"
    assert _s(d["user"]["email"]) == "dana@corp.com"
    assert _s(d["os"]["name"]) == "MacOSX"
    assert _s(d["os"]["version"]) == "14.4"
    assert _s(d["source"]["ip"]) == "198.51.100.77"
    op = d["onepassword"]
    assert _s(op["uuid"]) == "usage-1"
    assert _s(op["vault_uuid"]) == "vault-9"
    assert _s(op["item_uuid"]) == "item-7"
    assert _s(op["client"]["app_name"]) == "1Password Browser Extension"
    # deleted custom duplicates
    assert op.get("timestamp") is None
    assert op.get("user") is None
    assert op.get("location") is None
    rel_u = {_s(u) for u in d["related"]["user"] if u is not None}
    assert rel_u == {"u-1", "Dana Fox", "dana@corp.com"}
    assert [_s(i) for i in d["related"]["ip"] if i is not None] == [
        "198.51.100.77"
    ]


# --------------------------------------------------------------- snyk


def test_snyk_vulnerabilities_full_transform_verbatim(spark):
    event = {
        "issue": {
            "identifiers": {
                "CVE": ["CVE-2024-1234"],
                "CWE": ["CWE-79"],
                "ALTERNATIVE": [],
            },
            "description": "XSS in widget",
            "cvssScore": "7.5",
            "severity": "high",
            "CVSSv3": "CVSS:3.1/AV:N/AC:L",
            "disclosureTime": "2024-01-02T00:00:00Z",
            "exploitMaturity": "proof-of-concept",
            "isIgnored": False,
            "isPatchable": True,
            "isPatched": False,
            "isPinnable": False,
            "isUpgradable": True,
            "priorityScore": 700,
            "publicationTime": "2024-01-05T00:00:00Z",
            "packageManager": "npm",
            "url": "https://security.snyk.io/vuln/SNYK-JS-WIDGET-1",
            "package": "widget",
            "version": "1.0.0",
            "title": "Cross-site Scripting",
        },
        "isFixed": False,
        "introducedDate": "2024-01-10",
        "projects": [
            {
                "name": "corp/app",
                "packageManager": "npm",
                "targetFile": "package-lock.json",
            }
        ],
    }
    d = _run(spark, "snyk/tables/vulnerabilities.yml", event)
    v = d["vulnerability"]
    assert v["classification"] == "CVSS"
    assert v["category"] == ["Github"]
    assert v["scanner"]["vendor"] == "Snyk"
    assert v["score"]["version"] == "3.0"
    assert _s(v["enumeration"]) == "CVE"
    assert _s(v["id"]) == "CVE-2024-1234"
    assert _s(v["description"]) == "XSS in widget"
    assert abs(v["score"]["base"] - 7.5) < 1e-9
    assert _s(v["severity"]) == "high"
    assert _s(v["reference"]).startswith("https://security.snyk.io")
    sv = d["snyk"]["vulnerabilities"]
    assert _s(sv["cvss3"]) == "CVSS:3.1/AV:N/AC:L"
    assert _s(sv["exploit_maturity"]) == "proof-of-concept"
    assert sv["is_patchable"] is True
    assert sv["is_upgradable"] is True
    assert sv["priority_score"] == 700
    assert _s(sv["package_manager"]) == "npm"
    assert sv["is_fixed"] is False
    assert _s(sv["introduced_date"]) == "2024-01-10"
    projs = d["snyk"]["projects"]
    assert _s(projs[0]["package_manager"]) == "npm"
    assert _s(projs[0]["target_file"]) == "package-lock.json"


# ---------------------------------------------------------- cloudtrail


def test_cloudtrail_digest_full_transform_verbatim(spark):
    event = {
        "digestS3Object": "AWSLogs/1234/digest-2024-06-01.json.gz",
        "digestS3Bucket": "corp-trail-digests",
        "previousDigestSignature": "ab" * 32,
        "previousDigestS3Bucket": "corp-trail-digests",
        "previousDigestHashAlgorithm": "SHA-256",
        "publicKeyFingerprint": "deadbeefcafe",
        "digestSignatureAlgorithm": "SHA256withRSA",
        "digestStartTime": 1717200000000,
        "digestEndTime": 1717203600000,
        "newestEventTime": 1717203000000,
        "oldestEventTime": 1717200300000,
        "logFiles": [],
    }
    d = _run(spark, "aws_cloudtrail/tables/digest.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717203600)
    assert _s(d["file"]["path"]) == "AWSLogs/1234/digest-2024-06-01.json.gz"
    assert _s(d["file"]["hash"]["sha256"]) == "ab" * 32
    assert [_s(h) for h in d["related"]["hash"] if h is not None] == [
        "ab" * 32
    ]
    flat = json.loads(_s(d["aws"]["cloudtrail"]["flattened"]["digest"]))
    assert flat["s3_bucket"] == "corp-trail-digests"
    assert flat["signature_algorithm"] == "SHA256withRSA"
    assert flat["public_key_fingerprint"] == "deadbeefcafe"
    # the digest subtree itself is deleted after flattening
    assert (d["aws"]["cloudtrail"].get("digest")) in (None, {})