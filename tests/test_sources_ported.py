"""Golden end-to-end fixtures for the ported managed log sources: one
realistic raw record per source through run_log_source, asserting the
core ECS normalization (ts, event.*, identity, network) and the vendor
namespace fields."""

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
    d = tempfile.mkdtemp(prefix="matano_spark_ported_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _run_one(spark, tmpdir, source: str, records: list[dict], table: str):
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    with open(raw / "objects.json", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    tables = run_log_source(
        spark, str(ROOT / source), str(raw / "*.json"), str(tmpdir / "lake"),
        quarantine_root=str(tmpdir / "q"),
    )
    res = tables[table]
    assert res.rows_sidelined == 0, "no quarantined rows expected"
    return res.read()


OKTA_RECORD = {
    "published": "2024-05-01T10:00:00.000Z",
    "eventType": "user.session.start",
    "displayMessage": "User login to Okta",
    "uuid": "a0-b1",
    "version": "0",
    "severity": "INFO",
    "actor": {
        "id": "00u1", "type": "User",
        "alternateId": "alice@example.com", "displayName": "Alice A",
    },
    "client": {
        "device": "Computer", "id": None, "ipAddress": "203.0.113.9",
        "zone": "null",
        "userAgent": {
            "browser": "CHROME", "os": "Mac OS X",
            "rawUserAgent": "Mozilla/5.0",
        },
        "geographicalContext": {
            "city": "Berlin", "state": "Berlin", "country": "Germany",
            "postalCode": "10115",
        },
    },
    "outcome": {"result": "SUCCESS", "reason": None},
    "transaction": {"id": "tx1", "type": "WEB"},
    "authenticationContext": {
        "authenticationStep": 0, "externalSessionId": "s1",
    },
    "securityContext": {
        "asNumber": 64500, "asOrg": "ExampleNet", "domain": "example.net",
        "isProxy": False, "isp": "example",
    },
    "debugContext": {"debugData": {"requestId": "r1", "requestUri": "/login"}},
}


def test_okta_system_end_to_end(spark, tmpdir):
    lake = _run_one(spark, tmpdir, "okta", [OKTA_RECORD], "system")
    lake.createOrReplaceTempView("okta_system")
    r = spark.sql(
        """SELECT ts, event.action AS action, event.outcome AS outcome,
                  event.category AS category, event.type AS etype,
                  source.ip AS sip, user.name AS uname, user.email AS email,
                  client.as.number AS asn, client.geo.city_name AS city,
                  okta.event_type AS okta_et, okta.actor.id AS actor_id,
                  okta.security_context.is_proxy AS is_proxy,
                  user_agent.original AS ua,
                  related.ip AS rip, related.user AS ruser
           FROM okta_system"""
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 5, 1, 10, 0)
    assert r.action == "user.session.start"
    assert r.outcome == "success"
    assert set(r.category) == {"authentication", "session"}
    assert {"start", "user"} <= set(r.etype)
    assert r.sip == "203.0.113.9"
    assert r.uname == "alice@example.com"
    assert r.email == "alice@example.com"
    assert r.asn == 64500
    assert r.city == "Berlin"
    assert r.okta_et == "user.session.start"
    assert r.actor_id == "00u1"
    assert r.is_proxy is False
    assert r.ua == "Mozilla/5.0"
    assert r.rip == ["203.0.113.9"]
    assert r.ruser == ["alice@example.com"]


SURICATA_ALERT = {
    "timestamp": "2021-08-16T21:59:55.000000+0000",
    "event_type": "ALERT",
    "flow_id": 1234567890123,
    "in_iface": "eth0",
    "src_ip": "10.0.0.5",
    "src_port": 55342,
    "dest_ip": "203.0.113.99",
    "dest_port": 80,
    "proto": "TCP",
    "app_proto": "http",
    "ether": {"src_mac": "aa:bb:cc:dd:ee:ff", "dest_mac": "11:22:33:44:55:66"},
    "alert": {
        "action": "blocked", "gid": 1, "signature_id": 2019401, "rev": 3,
        "signature": "ET EXPLOIT possible attack", "category": "Attempted Admin",
        "severity": 1,
        "metadata": {
            "created_at": ["2014_10_10"], "updated_at": ["2020_08_04"],
            "cve": ["CVE-2014-6271"], "mitre_tactic_id": ["TA0001"],
            "mitre_tactic_name": ["Initial_Access"],
            "mitre_technique_id": ["T1190"], "signature_severity": ["Major"],
        },
    },
    "http": {
        "hostname": "evil.example.com", "url": "/cgi-bin/status?x=1&y",
        "http_user_agent": "curl/7.58.0", "http_method": "GET",
        "protocol": "HTTP/1.1", "status": 404, "length": 196,
    },
    "flow": {
        "pkts_toserver": 4, "pkts_toclient": 3,
        "bytes_toserver": 582, "bytes_toclient": 302,
        "start": "2021-08-16T21:59:55.000000+0000",
        "end": "2021-08-16T22:00:05.000000+0000",
        "state": "closed",
    },
}

SURICATA_DNS = {
    "timestamp": "2021-08-16T21:59:55.007000+0000",
    "event_type": "dns",
    "flow_id": 42, "src_ip": "10.0.0.5", "src_port": 5353,
    "dest_ip": "8.8.8.8", "dest_port": 53, "proto": "UDP",
    "dns": {
        "version": 1, "type": "answer", "id": 30941, "rcode": "NOERROR",
        "rrname": "example.com", "rrtype": "A", "rdata": "93.184.216.34",
        "ttl": 3600, "aa": True, "rd": True,
    },
}

SURICATA_TLS = {
    "timestamp": "2021-08-16T21:59:56.000000+0000",
    "event_type": "tls",
    "flow_id": 77, "src_ip": "10.0.0.5", "src_port": 49123,
    "dest_ip": "151.101.1.140", "dest_port": 443, "proto": "TCP",
    "tls": {
        "version": "TLS 1.2", "sni": "cdn.example.org.",
        "subject": "C=US, O=Example Org, CN=cdn.example.org",
        "issuerdn": "C=US, O=Example CA, CN=Example Root CA",
        "fingerprint": "36:3f:ee:2a:1c:fa:de:ad",
        "serial": "00:11:22", "session_resumed": False,
        "notafter": "2022-01-01T00:00:00", "notbefore": "2021-01-01T00:00:00",
        "ja3": {"hash": "j3hash"}, "ja3s": {"hash": "j3shash"},
    },
}


def test_suricata_eve_end_to_end(spark, tmpdir):
    lake = _run_one(
        spark, tmpdir, "suricata",
        [SURICATA_ALERT, SURICATA_DNS, SURICATA_TLS], "eve",
    )
    lake.createOrReplaceTempView("eve")
    a = spark.sql(
        """SELECT event.kind AS kind, event.category AS cat, event.type AS etype,
                  event.outcome AS outcome, event.severity AS sev,
                  rule.id AS rid, rule.name AS rname,
                  source.ip AS sip, source.mac AS smac, destination.port AS dport,
                  network.transport AS transport, network.protocol AS proto,
                  network.bytes AS nbytes, network.packets AS npkts,
                  event.duration AS dur, http.response.status_code AS status,
                  url.path AS upath, url.domain AS udom,
                  suricata.eve.alert.created_at AS created_at,
                  threat.tactic.id AS tactic, message
           FROM eve WHERE suricata.eve.event_type = 'alert'"""
    ).collect()[0]
    assert a.kind == "alert"
    assert set(a.cat) == {"network", "intrusion_detection"}
    assert "denied" in a.etype and "end" in a.etype
    # outcome is only set for event_type == "http" (reference parity)
    assert a.outcome is None
    assert a.sev == 1
    assert a.rid == "2019401"
    assert a.smac == "AA-BB-CC-DD-EE-FF"
    assert a.transport == "tcp" and a.proto == "http"
    assert a.nbytes == 884 and a.npkts == 7
    assert a.dur == 10_000_000_000
    assert a.status == 404
    assert a.upath == "/cgi-bin/status"
    assert a.udom == "evil.example.com"
    assert a.created_at == dt.datetime(2014, 10, 10)
    assert a.tactic == ["TA0001"]
    assert a.message == "Attempted Admin"

    d = spark.sql(
        """SELECT dns.id AS did, dns.type AS dtype, dns.response_code AS rcode,
                  dns.answers AS answers, dns.resolved_ip AS rip,
                  dns.header_flags AS flags, related.ip AS relip
           FROM eve WHERE suricata.eve.event_type = 'dns'"""
    ).collect()[0]
    assert d.did == "30941" and d.dtype == "answer" and d.rcode == "NOERROR"
    assert d.answers[0].data == "93.184.216.34" and d.answers[0].ttl == 3600
    assert d.rip == ["93.184.216.34"]
    assert set(d.flags) == {"AA", "RD"}
    assert set(d.relip) == {"10.0.0.5", "8.8.8.8", "93.184.216.34"}

    t = spark.sql(
        """SELECT tls.version AS v, tls.version_protocol AS vp,
                  tls.client.server_name AS sni, destination.domain AS ddom,
                  tls.server.hash.sha1 AS fp,
                  tls.server.x509.subject.common_name AS cn,
                  tls.server.x509.issuer.organization AS io,
                  tls.server.not_after AS na, related.hash AS rh
           FROM eve WHERE suricata.eve.event_type = 'tls'"""
    ).collect()[0]
    assert t.v == "1.2" and t.vp == "tls"
    assert t.sni == "cdn.example.org" and t.ddom == "cdn.example.org"
    assert t.fp == "363FEE2A1CFADEAD"
    assert t.cn == ["cdn.example.org"] and t.io == ["Example CA"]
    assert t.na == dt.datetime(2022, 1, 1)
    assert set(r for r in t.rh) == {"363FEE2A1CFADEAD", "j3shash", "j3hash"}


O365_AAD = {
    "CreationTime": "2024-03-05T08:15:00",
    "Id": "ev-1", "RecordType": 8, "Operation": "Add user.",
    "OrganizationId": "org-1", "UserType": 2, "UserKey": "uk",
    "Workload": "AzureActiveDirectory", "ResultStatus": "Success",
    "ObjectId": "bob@contoso.com", "UserId": "admin@contoso.com",
    "ActorIpAddress": "::ffff:198.51.100.7",
}

O365_ALERT = {
    "CreationTime": "2024-03-05T09:00:00",
    "Id": "ev-2", "RecordType": 40, "Operation": "AlertTriggered",
    "UserId": "SecurityComplianceAlerts", "Workload": "SecurityComplianceCenter",
    "Severity": "medium", "Category": "ThreatManagement",
    "Comments": "Malware campaign detected", "Name": "Malware rule",
    "PolicyId": "pol-9", "EntityType": "MalwareFamily",
    "AlertEntityId": "TrickBot",
    "AlertLinks": [{"AlertLinkHref": "https://portal/alert/1"}],
}

O365_EXCHANGE = {
    "CreationTime": "2024-03-05T10:30:00",
    "Id": "ev-3", "RecordType": 2, "Operation": "MoveToDeletedItems",
    "Workload": "Exchange", "ResultStatus": "Succeeded",
    "MailboxOwnerUPN": "carol@contoso.com", "LogonUserSid": "S-1-5-21",
    "LogonUserDisplayName": "Carol C", "ClientProcessName": "Outlook",
    "ClientIPAddress": "203.0.113.77:443", "OrganizationName": "contoso",
}


def test_o365_audit_end_to_end(spark, tmpdir):
    lake = _run_one(
        spark, tmpdir, "o365", [O365_AAD, O365_ALERT, O365_EXCHANGE], "audit"
    )
    lake.createOrReplaceTempView("o365_audit")
    a = spark.sql(
        """SELECT ts, event.code AS code, event.action AS action,
                  event.category AS cat, event.type AS etype,
                  event.outcome AS outcome, user.target.id AS tid,
                  user.target.name AS tname, user.name AS uname,
                  user.email AS email, source.ip AS sip, network.type AS ntype
           FROM o365_audit WHERE event.id = 'ev-1'"""
    ).collect()[0]
    assert a.ts == dt.datetime(2024, 3, 5, 8, 15)
    assert a.code == "AzureActiveDirectory"
    assert a.action == "added-user-account"
    assert "iam" in a.cat and "user" in a.etype and "creation" in a.etype
    assert a.outcome == "success"
    assert a.tid == "bob@contoso.com" and a.tname == "bob"
    assert a.uname == "admin" and a.email == "admin@contoso.com"
    assert a.sip == "198.51.100.7" and a.ntype == "ipv4"

    b = spark.sql(
        """SELECT event.kind AS kind, event.severity AS sev,
                  event.category AS cat, rule.name AS rname, rule.id AS rid,
                  rule.reference AS ref, threat.technique.id AS tech,
                  message
           FROM o365_audit WHERE event.id = 'ev-2'"""
    ).collect()[0]
    assert b.kind == "alert" and b.sev == 3
    assert "malware" in b.cat
    assert b.rname == "Malware rule" and b.rid == "pol-9"
    assert b.ref == "https://portal/alert/1"
    assert b.tech == ["TrickBot"]
    assert b.message == "Malware campaign detected"

    c = spark.sql(
        """SELECT event.code AS code, user.email AS email,
                  user.full_name AS fname, process.name AS proc,
                  organization.name AS org, source.ip AS sip,
                  client.port AS cport, event.outcome AS outcome
           FROM o365_audit WHERE event.id = 'ev-3'"""
    ).collect()[0]
    assert c.code == "ExchangeItem"
    assert c.email == "carol@contoso.com" and c.fname == "Carol C"
    assert c.proc == "Outlook" and c.org == "contoso"
    assert c.sip == "203.0.113.77" and c.cport == 443
    assert c.outcome == "success"


GCP_AUDIT = {
    "insertId": "abc123",
    "logName": "projects/my-proj/logs/cloudaudit.googleapis.com%2Factivity",
    "severity": "NOTICE",
    "timestamp": "2024-06-01T12:00:00.123Z",
    "resource": {"type": "gce_instance",
                 "labels": {"project_id": "my-proj", "instance_id": "i-99"}},
    "protoPayload": {
        "@type": "type.googleapis.com/google.cloud.audit.AuditLog",
        "methodName": "v1.compute.instances.delete",
        "resourceName": "projects/my-proj/zones/z/instances/vm-1",
        "serviceName": "compute.googleapis.com",
        "numResponseItems": 1,
        "status": {"code": 0, "message": None},
        "authenticationInfo": {
            "principalEmail": "dev@my-proj.iam.gserviceaccount.com",
            "principalSubject": "serviceAccount:dev@my-proj",
        },
        "authorizationInfo": [
            {"granted": True, "permission": "compute.instances.delete",
             "resource": "projects/my-proj/zones/z/instances/vm-1"},
        ],
        "requestMetadata": {
            "callerIp": "198.51.100.23",
            "callerSuppliedUserAgent": "google-cloud-sdk",
        },
        "request": {"kind": "compute#instancesDeleteRequest"},
    },
}

GCP_NOT_AUDITLOG = {
    "insertId": "zzz", "logName": "projects/my-proj/logs/other",
    "timestamp": "2024-06-01T12:00:00Z",
    "protoPayload": {"@type": "type.googleapis.com/other.Thing"},
}


def test_gcp_audit_end_to_end(spark, tmpdir):
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    with open(raw / "objects.json", "w") as f:
        for r in [GCP_AUDIT, GCP_NOT_AUDITLOG]:
            f.write(json.dumps(r) + "\n")
    tables = run_log_source(
        spark, str(ROOT / "gcp_audit"), str(raw / "*.json"),
        str(tmpdir / "lake"), quarantine_root=str(tmpdir / "q"),
    )
    res = tables["default"]
    # the non-AuditLog record aborts (rows_in counts post-abort rows)
    assert res.rows_sidelined == 0
    df = res.read()
    assert df.count() == 1
    df.createOrReplaceTempView("gcp_audit")
    r = spark.sql(
        """SELECT ts, event.id AS eid, event.action AS action,
                  event.outcome AS outcome, event.provider AS provider,
                  event.category AS cat, event.type AS etype,
                  cloud.provider AS cp, cloud.project.id AS proj,
                  cloud.service.name AS svc, user.email AS email,
                  client.user.id AS cuid, source.ip AS sip,
                  user_agent.original AS ua,
                  gcp.audit.resource_name AS rname,
                  gcp.audit.num_response_items AS nitems,
                  gcp.audit.request AS req,
                  gcp.audit.authorization_info[0].permission AS perm,
                  gcp.audit.authorization_info[0].granted AS granted
           FROM gcp_audit"""
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 6, 1, 12, 0, 0, 123000)
    assert r.eid == "abc123" and r.action == "v1.compute.instances.delete"
    assert r.outcome == "success" and r.provider == "activity"
    assert set(r.cat) == {"network", "configuration"}
    assert set(r.etype) == {"allowed", "deletion"}
    assert r.cp == "gcp" and r.proj == "my-proj"
    assert r.svc == "compute.googleapis.com"
    assert r.email == "dev@my-proj.iam.gserviceaccount.com"
    assert r.cuid == "serviceAccount:dev@my-proj"
    assert r.sip == "198.51.100.23" and r.ua == "google-cloud-sdk"
    assert r.rname == "projects/my-proj/zones/z/instances/vm-1"
    assert r.nitems == 1
    assert json.loads(r.req) == {"kind": "compute#instancesDeleteRequest"}
    assert r.perm == "compute.instances.delete" and r.granted is True


GITHUB_TEAM = {
    "@timestamp": 1717243200000,
    "created_at": 1717243200000,
    "_document_id": "doc-1",
    "action": "team.add_member",
    "actor": "octocat",
    "user": "hubot",
    "org": "acme",
    "team": "acme/platform",
    "actor_ip": "192.0.2.4",
    "actor_location": {"country_code": "US"},
    "operation_type": "create",
}

GITHUB_GIT = {
    "@timestamp": 1717243260000,
    "_document_id": "doc-2",
    "action": "git.clone",
    "actor": "octocat",
    "repo": "acme/engine",
    "transport_protocol": 1,
    "transport_protocol_name": "http",
    "repository_public": False,
}


def test_github_audit_end_to_end(spark, tmpdir):
    lake = _run_one(
        spark, tmpdir, "github_audit", [GITHUB_TEAM, GITHUB_GIT], "default"
    )
    lake.createOrReplaceTempView("gh")
    r = spark.sql(
        """SELECT ts, event.action AS action, event.category AS cat,
                  event.type AS etype, user.name AS actor,
                  user.target.name AS target, group.name AS grp,
                  user.target.group.name AS tgrp,
                  client.ip AS cip, client.geo.country_iso_code AS cc,
                  github.category AS ghcat, github.org AS org,
                  related.user AS rusers, related.ip AS rips
           FROM gh WHERE event.id = 'doc-1'"""
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 6, 1, 12, 0)
    assert r.action == "team.add_member"
    assert {"configuration", "web", "iam"} == set(r.cat)
    assert {"group", "user", "creation"} == set(r.etype)
    assert r.actor == "octocat" and r.target == "hubot"
    assert r.grp == "acme/platform" and r.tgrp == "acme/platform"
    assert r.cip == "192.0.2.4" and r.cc == "US"
    assert r.ghcat == "team" and r.org == "acme"
    assert set(r.rusers) == {"octocat", "hubot"}
    assert r.rips == ["192.0.2.4"]

    g = spark.sql(
        """SELECT ts, event.type AS etype, github.repo AS repo,
                  github.transport_protocol.name AS tpn,
                  github.repository_public AS pub, github.category AS ghcat
           FROM gh WHERE event.id = 'doc-2'"""
    ).collect()[0]
    assert g.ts == dt.datetime(2024, 6, 1, 12, 1)
    assert g.etype == ["change"]
    assert g.repo == "acme/engine" and g.tpn == "http"
    assert g.pub is False and g.ghcat == "git"


FALCON_DETECT = {
    "metadata": {
        "customerIDString": "cust-1", "offset": 12,
        "eventType": "DetectionSummaryEvent",
        "eventCreationTime": 1712345678000, "version": "1.0",
    },
    "event": {
        "ProcessStartTime": 1712345600,
        "ProcessEndTime": 0,
        "ComputerName": "WIN-HOST-7",
        "DetectName": "NtdsFileAccessed",
        "DetectDescription": "Process accessed ntds.dit",
        "FalconHostLink": "https://falcon/detect/1",
        "Severity": 4,
        "SeverityName": "High",
        "FileName": "ntdsutil.exe",
        "CommandLine": "  ntdsutil.exe  snapshot  mount ",
        "ParentImageFileName": "C:\\Windows\\cmd.exe",
        "ParentCommandLine": "cmd /c evil.bat",
        "ProcessId": 4242,
        "LocalIP": "10.1.2.3",
        "MachineDomain": "CORP",
        "UserName": "jdoe",
        "SensorId": "sensor-9",
        "MD5String": "0000000000000000000000000000000a",
        "SHA256String": "0000000000000000000000000000000000000000000000000000000000000000",
        "Tactic": "Credential Access",
        "Technique": "OS Credential Dumping",
        "Success": True,
    },
}

FALCON_FIREWALL = {
    "metadata": {
        "customerIDString": "cust-1", "offset": 13,
        "eventType": "FirewallMatchEvent",
        "eventCreationTime": 1712345700000, "version": "1.0",
    },
    "event": {
        "ConnectionDirection": "1", "Ipv": "ipv4",
        "LocalAddress": "10.1.2.3", "LocalPort": 443,
        "RemoteAddress": "203.0.113.50", "RemotePort": 51515,
        "RuleId": "r-1", "RuleName": "Block inbound",
        "RuleGroupName": "defaults", "EventType": "FirewallRuleIP4Matched",
        "HostName": "WIN-HOST-7", "PID": 999,
    },
}


def test_crowdstrike_falcon_end_to_end(spark, tmpdir):
    lake = _run_one(
        spark, tmpdir, "crowdstrike_falcon",
        [FALCON_DETECT, FALCON_FIREWALL], "default",
    )
    lake.createOrReplaceTempView("falcon")
    d = spark.sql(
        """SELECT ts, event.kind AS kind, event.category AS cat,
                  event.outcome AS outcome, event.severity AS sev,
                  event.url AS url, message, rule.name AS rname,
                  user.name AS uname, user.domain AS udom,
                  host.name AS host, agent.id AS aid, agent.type AS atype,
                  process.name AS pname, process.pid AS pid,
                  process.command_line AS cmd, process.args AS pargs,
                  process.executable AS pexe,
                  process.parent.command_line AS pcmd,
                  file.hash.sha256 AS sha256, related.hash AS rhash,
                  threat.tactic.name AS tactic,
                  crowdstrike.event.ProcessStartTime AS pstart,
                  source.ip AS sip
           FROM falcon WHERE crowdstrike.metadata.eventType = 'DetectionSummaryEvent'"""
    ).collect()[0]
    assert d.ts == dt.datetime(2024, 4, 5, 19, 34, 38)
    assert d.kind == "alert" and d.cat == ["malware"]
    assert d.outcome == "success" and d.sev == 4
    assert d.url == "https://falcon/detect/1"
    assert d.rname == "NtdsFileAccessed"
    assert d.uname == "jdoe" and d.udom == "CORP"
    assert d.host == "WIN-HOST-7" and d.aid == "sensor-9" and d.atype == "falcon"
    assert d.pname == "ntdsutil.exe" and d.pid == 4242
    assert d.cmd == "ntdsutil.exe  snapshot  mount"
    assert d.pargs == ["ntdsutil.exe", "snapshot", "mount"]
    assert d.pexe == "ntdsutil.exe"
    assert d.pcmd == "cmd /c evil.bat"
    # the all-zero sha256 is excluded from related.hash; the md5 (ends 0a)
    # is kept (reference parity)
    assert d.rhash == ["0000000000000000000000000000000a"]
    assert d.tactic == ["credential access"]
    assert d.pstart == dt.datetime(2024, 4, 5, 19, 33, 20)
    assert d.sip == "10.1.2.3"

    f = spark.sql(
        """SELECT event.action AS action, network.direction AS dir,
                  source.ip AS sip, source.port AS sport,
                  destination.ip AS dip, destination.port AS dport,
                  rule.name AS rname, event.code AS code, message,
                  related.ip AS rips
           FROM falcon WHERE crowdstrike.metadata.eventType = 'FirewallMatchEvent'"""
    ).collect()[0]
    assert f.action == "firewall_match_event"
    assert f.dir == "ingress"
    assert f.sip == "203.0.113.50" and f.sport == 51515
    assert f.dip == "10.1.2.3" and f.dport == 443
    assert f.rname == "Block inbound" and f.code == "FirewallRuleIP4Matched"
    assert f.message == "Firewall Rule 'Block inbound' triggered"
    assert set(f.rips) == {"203.0.113.50", "10.1.2.3"}


DUO_AUTH = {
    "timestamp": 1717250000,
    "result": "success",
    "reason": "user_approved",
    "email": "dave@corp.io",
    "event_type": "authentication",
    "factor": "duo_push",
    "txid": "tx-77",
    "user": {"key": "DU123", "name": "dave", "groups": ["eng", "vpn"]},
    "application": {"key": "APP1", "name": "VPN"},
    "access_device": {
        "browser": "Chrome", "browser_version": "120.0",
        "os": "Windows", "os_version": "11",
        "hostname": "dave-laptop", "ip": "198.51.100.9",
        "location": {"city": "Austin", "country": "United States", "state": "Texas"},
    },
    "auth_device": {
        "ip": "203.0.113.5", "name": "+1555",
        "location": {"city": "Austin", "country": "United States", "state": "Texas"},
    },
}

DUO_ADMIN = {
    "timestamp": 1717250100,
    "action": "user_create",
    "username": "admin-alice",
    "object": "dave",
    "description": "{\"realname\": \"\", \"status\": \"Active\"}",
}


def test_duo_auth_admin_end_to_end(spark, tmpdir):
    lake = _run_one(spark, tmpdir, "duo", [DUO_AUTH], "auth")
    lake.createOrReplaceTempView("duo_auth")
    r = spark.sql(
        """SELECT ts, event.outcome AS outcome, event.category AS cat,
                  source.ip AS sip, source.user.group.name AS grp,
                  user.name AS uname, user.email AS email,
                  user_agent.os.name AS osname,
                  duo.auth.factor AS factor, duo.auth.txid AS txid,
                  duo.auth.application.name AS app,
                  duo.auth.auth_device.name AS phone,
                  related.ip AS rips, related.hosts AS rhosts
           FROM duo_auth"""
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 6, 1, 13, 53, 20)
    assert r.outcome == "success" and r.cat == ["authentication"]
    assert r.sip == "198.51.100.9" and r.grp == "eng, vpn"
    assert r.uname == "dave" and r.email == "dave@corp.io"
    assert r.osname == "Windows"
    assert r.factor == "duo_push" and r.txid == "tx-77" and r.app == "VPN"
    assert r.phone == "+1555"
    assert set(r.rips) == {"198.51.100.9", "203.0.113.5"}
    assert r.rhosts == ["dave-laptop"]


def test_duo_admin_end_to_end(spark, tmpdir):
    lake = _run_one(spark, tmpdir, "duo", [DUO_ADMIN], "admin")
    lake.createOrReplaceTempView("duo_admin")
    r = spark.sql(
        """SELECT ts, event.action AS action, event.category AS cat,
                  event.type AS etype, event.outcome AS outcome,
                  user.name AS uname, message, related.user AS rusers
           FROM duo_admin"""
    ).collect()[0]
    assert r.action == "user_create"
    assert r.cat == ["iam"]
    assert set(r.etype) == {"user", "creation"}
    assert r.outcome == "success"
    assert r.uname == "admin-alice"
    assert json.loads(r.message) == {"realname": "", "status": "Active"}
    assert r.rusers == ["admin-alice"]


ELB_ALB_LINE = (
    'http 2024-06-02T10:00:01.123456Z app/my-alb/50dc6c495c0c9188 '
    '192.0.2.44:34567 10.0.1.5:80 0.000 0.001 0.000 200 200 34 366 '
    '"GET http://www.example.com:80/path?q=1 HTTP/1.1" "curl/7.46.0" - - '
    'arn:aws:elasticloadbalancing:us-east-1:1:targetgroup/tg/abc '
    '"Root=1-58337262-36d228ad5d99923122bbe354" "-" "-" '
    '0 2024-06-02T10:00:01.000000Z "forward,redirect" "-" "-"'
)


def test_aws_elb_end_to_end(spark, tmpdir):
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    (raw / "elb.log").write_text(ELB_ALB_LINE + "\n")
    tables = run_log_source(
        spark, str(ROOT / "aws_elb"), str(raw / "*.log"),
        str(tmpdir / "lake"), quarantine_root=str(tmpdir / "q"),
    )
    res = tables["default"]
    assert res.rows_sidelined == 0
    df = res.read()
    df.createOrReplaceTempView("elb")
    r = spark.sql(
        """SELECT ts, event.start AS estart, event.outcome AS outcome,
                  event.category AS cat, aws.elb.type AS lbtype,
                  aws.elb.name AS name, aws.elb.protocol AS proto,
                  aws.elb.backend.ip AS bip, aws.elb.backend.port AS bport,
                  aws.elb.target_group.arn AS tg, aws.elb.trace_id AS trace,
                  aws.elb.action_executed AS acts,
                  aws.elb.matched_rule_priority AS prio,
                  source.ip AS sip, source.port AS sport,
                  http.response.status_code AS status,
                  http.request.method AS method, http.version AS hv,
                  url.original AS uorig, url.path AS upath, url.query AS uq,
                  url.domain AS udom, user_agent.original AS ua,
                  trace.id AS tid
           FROM elb"""
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 6, 2, 10, 0, 1, 123456)
    assert r.estart == dt.datetime(2024, 6, 2, 10, 0, 1)
    assert r.outcome == "success" and r.cat == ["web"]
    assert r.lbtype == "http" and r.name == "app/my-alb/50dc6c495c0c9188"
    assert r.proto == "http"
    assert r.bip == "10.0.1.5" and r.bport == "80"  # vendor schema keeps port as string
    assert r.tg.endswith("targetgroup/tg/abc")
    assert r.trace == "Root=1-58337262-36d228ad5d99923122bbe354"
    assert r.acts == ["forward", "redirect"]
    assert r.prio == "0"
    assert r.sip == "192.0.2.44" and r.sport == 34567
    assert r.status == 200 and r.method == "GET" and r.hv == "1.1"
    assert r.uorig == "http://www.example.com:80/path?q=1"
    assert r.upath == "/path" and r.uq == "q=1"
    assert r.udom == "www.example.com:80" or r.udom == "www.example.com"
    assert r.ua == "curl/7.46.0"
    assert r.tid == r.trace


S3ACCESS_LINE = (
    "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be "
    "awsexamplebucket1 [06/Feb/2019:00:00:38 +0000] 192.0.2.3 "
    "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be "
    "3E57427F3EXAMPLE REST.GET.VERSIONING - "
    "\"GET /awsexamplebucket1?versioning HTTP/1.1\" 200 - 113 - 7 - \"-\" "
    "\"S3Console/0.4\" - "
    "s9lzHYrFp76ZVxRcpX9+5cjAnEH2ROuNkd2BHfIa6UkFVdtjf5mKR3/eTPFvsiP/XV/VLi31234= "
    "SigV4 ECDHE-RSA-AES128-GCM-SHA256 AuthHeader awsexamplebucket1.s3.us-west-1.amazonaws.com TLSV1.2"
)


def test_aws_s3access_end_to_end(spark, tmpdir):
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    (raw / "s3.log").write_text(S3ACCESS_LINE + "\n")
    tables = run_log_source(
        spark, str(ROOT / "aws_s3access"), str(raw / "*.log"),
        str(tmpdir / "lake"), quarantine_root=str(tmpdir / "q"),
    )
    res = tables["default"]
    assert res.rows_sidelined == 0
    df = res.read()
    df.createOrReplaceTempView("s3a")
    r = spark.sql(
        """SELECT ts, event.action AS action, event.id AS eid,
                  event.outcome AS outcome, event.duration AS dur,
                  aws.s3access.bucket AS bucket,
                  aws.s3access.operation AS op,
                  aws.s3access.http_status AS status,
                  aws.s3access.bytes_sent AS sent,
                  aws.s3access.signature_version AS sigv,
                  client.ip AS cip, client.user.id AS cuid,
                  http.request.method AS method, url.original AS uorig,
                  url.path AS upath, url.query AS uq,
                  user_agent.original AS ua, related.ip AS rips
           FROM s3a"""
    ).collect()[0]
    assert r.ts == dt.datetime(2019, 2, 6, 0, 0, 38)
    assert r.action == "REST.GET.VERSIONING" and r.eid == "3E57427F3EXAMPLE"
    assert r.outcome == "success" and r.dur == 7_000_000
    assert r.bucket == "awsexamplebucket1"
    assert r.op == "REST.GET.VERSIONING"
    assert r.status == 200 and r.sent == 113
    assert r.sigv == "SigV4"
    assert r.cip == "192.0.2.3"
    assert r.cuid.startswith("79a59df900")
    assert r.method == "GET"
    assert r.uorig == "/awsexamplebucket1?versioning"
    assert r.upath == "/awsexamplebucket1" and r.uq == "versioning"
    assert r.ua == "S3Console/0.4"
    assert r.rips == ["192.0.2.3"]


WAF_RECORD = {
    "timestamp": 1576280412771,
    "formatVersion": 1,
    "webaclId": "arn:aws:wafv2:ap-southeast-2:111122223333:regional/webacl/STMTest/1EXAMPLE-2ARN-3ARN-4ARN-123456EXAMPLE",
    "terminatingRuleId": "STMTest_SQLi_XSS",
    "terminatingRuleType": "REGULAR",
    "action": "BLOCK",
    "httpSourceName": "APIGW",
    "httpSourceId": "srcid",
    "labels": [{"name": "value"}],
    "httpRequest": {
        "clientIp": "192.0.2.15",
        "country": "AU",
        "headers": [{"name": "Host", "value": "api.example.com"}],
        "uri": "/foo", "args": "x=1",
        "httpVersion": "HTTP/1.1", "httpMethod": "POST",
        "requestId": "req-9",
    },
}

R53_RECORD = {
    "version": "1.100000",
    "account_id": "111122223333",
    "region": "us-east-1",
    "vpc_id": "vpc-7example",
    "query_timestamp": "2021-02-04T17:51:55Z",
    "query_name": "example.com.",
    "query_type": "A",
    "query_class": "IN",
    "rcode": "NOERROR",
    "answers": [
        {"Rdata": "203.0.113.9", "Type": "A", "Class": "IN"},
        {"Rdata": "alias.example.net.", "Type": "CNAME", "Class": "IN"},
    ],
    "srcaddr": "10.0.0.30",
    "srcport": "56067",
    "transport": "UDP",
    "srcids": {"instance": "i-0d15cd0d3example"},
}


def test_aws_waf_end_to_end(spark, tmpdir):
    lake = _run_one(spark, tmpdir, "aws_waf", [WAF_RECORD], "default")
    lake.createOrReplaceTempView("waf")
    r = spark.sql(
        """SELECT ts, event.action AS action, event.type AS etype,
                  aws.waf.id AS wid, aws.waf.arn AS arn,
                  aws.waf.source.name AS srcname, aws.waf.labels AS labels,
                  cloud.account.id AS acct, cloud.region AS region,
                  cloud.service.name AS svc, http.version AS hv,
                  http.request.method AS method, network.transport AS nt,
                  rule.id AS rid, source.ip AS sip,
                  source.geo.country_iso_code AS cc,
                  url.path AS upath, url.query AS uq, tags
           FROM waf"""
    ).collect()[0]
    assert r.ts == dt.datetime(2019, 12, 13, 23, 40, 12, 771000)
    assert r.action == "BLOCK" and "denied" in r.etype
    assert r.wid == "regional/webacl/STMTest/1EXAMPLE-2ARN-3ARN-4ARN-123456EXAMPLE"
    assert r.acct == "111122223333" and r.region == "ap-southeast-2"
    assert r.svc == "wafv2"
    assert r.srcname == "APIGW"
    assert r.labels == ["value"] and r.tags == ["value"]
    assert r.hv == "1.1" and r.method == "POST" and r.nt == "tcp"
    assert r.rid == "STMTest_SQLi_XSS"
    assert r.sip == "192.0.2.15" and r.cc == "AU"
    assert r.upath == "/foo" and r.uq == "x=1"


def test_aws_route53_end_to_end(spark, tmpdir):
    lake = _run_one(
        spark, tmpdir, "aws_route53_resolver_logs", [R53_RECORD], "default"
    )
    lake.createOrReplaceTempView("r53")
    r = spark.sql(
        """SELECT ts, dns.question.name AS qname, dns.question.type AS qtype,
                  dns.response_code AS rcode, dns.answers AS answers,
                  network.transport AS nt, network.iana_number AS iana,
                  network.type AS ntype, source.ip AS sip, source.port AS sport,
                  cloud.instance.id AS inst, aws.vpc_id AS vpc,
                  event.outcome AS outcome, related.ip AS rips,
                  related.hosts AS rhosts
           FROM r53"""
    ).collect()[0]
    assert r.ts == dt.datetime(2021, 2, 4, 17, 51, 55)
    assert r.qname == "example.com" and r.qtype == "A" and r.rcode == "NOERROR"
    assert r.answers[0].data == "203.0.113.9" and r.answers[0].type == "A"
    assert r.answers[1].data == "alias.example.net"
    assert r.answers[1].name == "alias.example.net"
    assert r.nt == "udp" and r.iana == "17" and r.ntype == "ipv4"
    assert r.sip == "10.0.0.30" and r.sport == 56067
    assert r.inst == "i-0d15cd0d3example" and r.vpc == "vpc-7example"
    assert r.outcome == "success"
    assert r.rips == ["203.0.113.9"]
    assert r.rhosts == ["alias.example.net"]


TELEPORT_LOGIN = {
    "time": "2024-07-01T08:00:00.5Z",
    "event": "user.login",
    "uid": "ev-1", "code": "T1000I",
    "success": True,
    "user": "root-user",
    "method": "local",
    "cluster_name": "teleport.example.com",
    "addr.remote": "198.51.100.8:45999",
}

TELEPORT_SESSION = {
    "time": "2024-07-01T08:05:00Z",
    "event": "session.command",
    "uid": "ev-2", "code": "T4000I",
    "user": "root-user", "login": "ubuntu",
    "server_hostname": "db-1", "server_id": "srv-9",
    "program": "bash", "path": "/bin/bash",
    "argv": ["-c", "ls"], "return_code": 0,
    "pid": 321, "ppid": 320,
    "sid": "sess-1", "namespace": "default",
}


def test_teleport_end_to_end(spark, tmpdir):
    lake = _run_one(
        spark, tmpdir, "teleport", [TELEPORT_LOGIN, TELEPORT_SESSION], "audit"
    )
    lake.createOrReplaceTempView("tp")
    a = spark.sql(
        """SELECT ts, event.category AS cat, event.outcome AS outcome,
                  user.name AS uname, source.ip AS sip, source.port AS sport,
                  teleport.method AS method, teleport.cluster_name AS cluster,
                  related.user AS rusers
           FROM tp WHERE event.id = 'ev-1'"""
    ).collect()[0]
    assert a.ts == dt.datetime(2024, 7, 1, 8, 0, 0, 500000)
    assert a.cat == ["authentication"] and a.outcome == "success"
    assert a.uname == "root-user"
    assert a.sip == "198.51.100.8" and a.sport == 45999
    assert a.method == "local" and a.cluster == "teleport.example.com"
    assert a.rusers == ["root-user"]

    s = spark.sql(
        """SELECT process.name AS pname, process.executable AS pexe,
                  process.args AS pargs, process.exit_code AS rc,
                  process.pid AS pid, destination.user.name AS duser,
                  host.hostname AS host, teleport.sid AS sid
           FROM tp WHERE event.id = 'ev-2'"""
    ).collect()[0]
    assert s.pname == "bash" and s.pexe == "/bin/bash"
    assert s.pargs == ["-c", "ls"] and s.rc == 0 and s.pid == 321
    assert s.duser == "ubuntu" and s.host == "db-1" and s.sid == "sess-1"


OP_SIGNIN = {
    "uuid": "op-1", "session_uuid": "sess-1",
    "timestamp": 1719820800,
    "category": "credentials_failed", "type": "password_secret_bad",
    "country": "DE",
    "target_user": {"uuid": "U1", "name": "Eve E", "email": "eve@corp.io"},
    "client": {
        "app_name": "1Password Browser Extension", "app_version": "21102",
        "platform_name": "Chrome", "platform_version": "1.2",
        "os_name": "MacOSX", "os_version": "14.1",
        "ip_address": "203.0.113.12",
    },
}

OP_USAGE = {
    "uuid": "op-2", "session_uuid": "sess-2",
    "timestamp": 1719820900, "used_version": 2,
    "vault_uuid": "V1", "item_uuid": "I1", "action": "secure-copy",
    "user": {"uuid": "U2", "name": "Frank F", "email": "frank@corp.io"},
    "client": {
        "app_name": "1Password CLI", "app_version": "2.0",
        "platform_name": "mac", "platform_version": "",
        "os_name": "MacOSX", "os_version": "14.1",
        "ip_address": "203.0.113.13",
    },
}


def test_onepassword_end_to_end(spark, tmpdir):
    lake = _run_one(spark, tmpdir, "onepassword", [OP_SIGNIN], "signin_attempts")
    lake.createOrReplaceTempView("op_signin")
    r = spark.sql(
        """SELECT ts, event.action AS action, event.outcome AS outcome,
                  user.email AS email, os.name AS osname, source.ip AS sip,
                  onepassword.type AS optype, onepassword.country AS country,
                  related.user AS rusers
           FROM op_signin"""
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 7, 1, 8, 0)
    assert r.action == "credentials_failed" and r.outcome == "failure"
    assert r.email == "eve@corp.io" and r.osname == "MacOSX"
    assert r.sip == "203.0.113.12"
    assert r.optype == "password_secret_bad" and r.country == "DE"
    assert set(r.rusers) == {"U1", "Eve E", "eve@corp.io"}


def test_onepassword_usage_end_to_end(spark, tmpdir):
    lake = _run_one(spark, tmpdir, "onepassword", [OP_USAGE], "item_usages")
    lake.createOrReplaceTempView("op_usage")
    r = spark.sql(
        """SELECT event.category AS cat, event.action AS action,
                  user.id AS uid, onepassword.vault_uuid AS vault,
                  onepassword.item_uuid AS item,
                  onepassword.used_version AS ver
           FROM op_usage"""
    ).collect()[0]
    assert r.cat == ["file"] and r.action == "secure-copy"
    assert r.uid == "U2"
    assert r.vault == "V1" and r.item == "I1" and r.ver == 2


SNYK_AUDIT = {
    "groupId": "g1", "orgId": "o1", "projectId": "p1",
    "userId": "u1", "event": "org.project.test",
    "created": 1719820800, "content": {"before": 1, "after": 2},
}

SNYK_VULN = {
    "issue": {
        "id": "SNYK-JS-X-1", "url": "https://snyk.io/vuln/SNYK-JS-X-1",
        "title": "Prototype Pollution", "type": "vuln",
        "description": "A bad bug", "package": "lodash",
        "version": "4.17.15", "severity": "high", "language": "js",
        "packageManager": "npm", "publicationTime": "2024-05-01T00:00:00Z",
        "disclosureTime": "2024-04-20T00:00:00Z",
        "isUpgradable": True, "isPatchable": False,
        "exploitMaturity": "proof-of-concept", "cvssScore": 7.4,
        "CVSSv3": "CVSS:3.1/AV:N",
        "identifiers": {"CVE": ["CVE-2024-1234"], "CWE": ["CWE-1321"]},
    },
}


def test_snyk_end_to_end(spark, tmpdir):
    lake = _run_one(spark, tmpdir, "snyk", [SNYK_AUDIT], "audit")
    lake.createOrReplaceTempView("snyk_audit")
    r = spark.sql(
        """SELECT ts, event.action AS action, user.id AS uid,
                  user.group.id AS gid, snyk.audit.org_id AS org,
                  snyk.audit.content AS content
           FROM snyk_audit"""
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 7, 1, 8, 0)
    assert r.action == "org.project.test" and r.uid == "u1" and r.gid == "g1"
    assert r.org == "o1"
    assert json.loads(r.content) == {"before": 1, "after": 2}

    lake2 = _run_one(spark, tmpdir, "snyk", [SNYK_VULN], "vulnerabilities")
    lake2.createOrReplaceTempView("snyk_vuln")
    v = spark.sql(
        """SELECT vulnerability.id AS vid, vulnerability.enumeration AS enum,
                  vulnerability.severity AS sev, vulnerability.score.base AS score,
                  snyk.vulnerabilities.package AS pkg,
                  snyk.vulnerabilities.identifiers.cwe AS cwe
           FROM snyk_vuln"""
    ).collect()[0]
    assert v.vid == "CVE-2024-1234" and v.enum == "CVE"
    assert v.sev == "high" and abs(v.score - 7.4) < 1e-6  # float32 in schema
    # vulnerability.description is not declared in the table schema
    # (reference parity) — it is dropped at projection time
    assert v.pkg == "lodash" and v.cwe == ["CWE-1321"]


GWS_LOGIN = {
    "kind": "admin#reports#activity",
    "id": {"time": "2024-07-02T09:00:00.000Z", "uniqueQualifier": "q-1",
           "applicationName": "login", "customerId": "C123"},
    "actor": {"email": "grace@corp.io", "profileId": "999", "callerType": "USER"},
    "ipAddress": "198.51.100.77",
    "ownerDomain": "corp.io",
    "events": [{
        "name": "login_failure", "type": "login",
        "parameters": [
            {"name": "login_type", "value": "google_password"},
            {"name": "login_challenge_method", "multiValue": ["password"]},
        ],
    }],
}

GWS_ADMIN = {
    "kind": "admin#reports#activity",
    "id": {"time": "2024-07-02T10:00:00.000Z", "uniqueQualifier": "q-2",
           "applicationName": "admin", "customerId": "C123"},
    "actor": {"email": "it-admin@corp.io", "profileId": "1000"},
    "ownerDomain": "corp.io",
    "events": [{
        "name": "CREATE_USER", "type": "USER_SETTINGS",
        "parameters": [{"name": "USER_EMAIL", "value": "newbie@corp.io"}],
    }],
}


def test_google_workspace_end_to_end(spark, tmpdir):
    lake = _run_one(spark, tmpdir, "google_workspace", [GWS_LOGIN], "login")
    lake.createOrReplaceTempView("gws_login")
    r = spark.sql(
        """SELECT ts, event.action AS action, event.outcome AS outcome,
                  event.category AS cat, event.type AS etype,
                  user.name AS uname, user.domain AS udom, source.ip AS sip,
                  google_workspace.login.type AS ltype,
                  google_workspace.login.challenge_method AS lcm,
                  organization.id AS org
           FROM gws_login"""
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 7, 2, 9, 0)
    assert r.action == "login_failure" and r.outcome == "failure"
    assert set(r.cat) == {"authentication", "session"} and "start" in r.etype
    assert r.uname == "grace" and r.udom == "corp.io"
    assert r.sip == "198.51.100.77"
    assert r.ltype == "google_password" and r.lcm == ["password"]
    assert r.org == "C123"

    lake2 = _run_one(spark, tmpdir, "google_workspace", [GWS_ADMIN], "admin")
    lake2.createOrReplaceTempView("gws_admin")
    a = spark.sql(
        """SELECT event.action AS action, event.category AS cat,
                  event.type AS etype, user.target.email AS temail,
                  user.target.name AS tname,
                  google_workspace.admin.user.email AS aue,
                  related.user AS rusers
           FROM gws_admin"""
    ).collect()[0]
    assert a.action == "CREATE_USER" and a.cat == ["iam"]
    assert {"creation", "user"} <= set(a.etype)
    assert a.temail == "newbie@corp.io" and a.tname == "newbie"
    assert a.aue == "newbie@corp.io"
    assert set(a.rusers) == {"it-admin", "newbie"}


PANW_TRAFFIC_LINE = (
    "1,2024/06/03 10:00:05,015351000038802,TRAFFIC,end,2305,2024/06/03 10:00:05,"
    "192.0.2.10,203.0.113.30,10.0.0.1,203.0.113.30,allow-outbound,corp\\jdoe,,web-browsing,"
    "vsys1,trust,untrust,ethernet1/2,ethernet1/1,forward-log,2024/06/03 10:00:05,336785,1,"
    "55236,443,12345,443,0x400053,tcp,allow,1639,1030,609,10,2024/06/03 09:59:51,13,any,,"
    "7858,0x8000000000000000,United States,United States,,5,5,tcp-fin,0,0,0,0,,PA-VM,from-policy,"
    ",,0,,0,,N/A,0,0,0,0,1efed0b4-9d51-4b1c-8de1-a1ee0b1b9d4e,0"
)


def test_panw_traffic_end_to_end(spark, tmpdir):
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    (raw / "panw.log").write_text(PANW_TRAFFIC_LINE + "\n")
    tables = run_log_source(
        spark, str(ROOT / "panw"), str(raw / "*.log"),
        str(tmpdir / "lake"), quarantine_root=str(tmpdir / "q"),
    )
    res = tables["traffic"]
    assert res.rows_sidelined == 0
    df = res.read()
    assert df.count() == 1
    df.createOrReplaceTempView("panw_traffic")
    r = spark.sql(
        """SELECT ts, event.outcome AS outcome, event.category AS cat,
                  source.ip AS sip, source.port AS sport,
                  destination.ip AS dip, destination.port AS dport,
                  source.user.name AS suname, source.user.domain AS sudom,
                  network.transport AS nt, network.application AS app,
                  network.bytes AS nbytes,
                  observer.serial_number AS serial,
                  observer.ingress.zone AS inzone,
                  panw.panos.ruleset AS ruleset,
                  panw.panos.flow_id AS flow,
                  rule.uuid AS ruuid
           FROM panw_traffic"""
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 6, 3, 10, 0, 5)
    assert r.outcome == "success" and r.cat == ["network"]
    assert r.sip == "192.0.2.10" and r.sport == 55236
    assert r.dip == "203.0.113.30" and r.dport == 443
    assert r.suname == "jdoe" and r.sudom == "corp"
    assert r.nt == "tcp" and r.app == "web-browsing"
    assert r.nbytes == 1639
    assert r.serial == "015351000038802"
    assert r.inzone == "trust"
    assert r.ruleset == "allow-outbound"
    assert r.flow == "336785"
    assert r.ruuid == "1efed0b4-9d51-4b1c-8de1-a1ee0b1b9d4e"


CF_HTTP = {
    "EdgeStartTimestamp": "2024-07-03T11:00:00Z",
    "EdgeEndTimestamp": "2024-07-03T11:00:01Z",
    "ClientIP": "203.0.113.66", "ClientASN": 64501, "ClientCountry": "de",
    "ClientRequestMethod": "GET", "ClientRequestHost": "shop.example.com",
    "ClientRequestPath": "/cart", "ClientRequestProtocol": "HTTP/2",
    "ClientRequestUserAgent": "Mozilla/5.0", "ClientSrcPort": 54321,
    "ClientSSLProtocol": "TLSv1.3", "ClientSSLCipher": "AEAD-AES128-GCM-SHA256",
    "EdgeResponseStatus": 200, "EdgeResponseBytes": 5120,
    "EdgeResponseContentType": "text/html", "EdgeColoCode": "FRA",
    "OriginIP": "10.9.9.9", "OriginResponseStatus": 200,
    "RayID": "87a1b2c3d4", "ZoneName": "example.com", "ZoneID": 42,
    "JA3Hash": "abcd1234",
    "SecurityAction": "allow", "CacheCacheStatus": "hit",
    "WorkerStatus": "ok",
}


def test_cloudflare_http_request_end_to_end(spark, tmpdir):
    lake = _run_one(spark, tmpdir, "cloudflare", [CF_HTTP], "http_request")
    lake.createOrReplaceTempView("cf_http")
    r = spark.sql(
        """SELECT ts, http.request.method AS method,
                  http.response.status_code AS status, http.version AS hv,
                  network.protocol AS proto, source.ip AS sip,
                  source.as.number AS asn, source.geo.country_iso_code AS cc,
                  source.port AS sport, destination.ip AS dip,
                  tls.version AS tlsv, tls.version_protocol AS tlsvp,
                  user_agent.original AS ua,
                  cloudflare.http_request.ray.id AS ray,
                  cloudflare.http_request.zone.name AS zone,
                  cloudflare.http_request.edge.colo.code AS colo,
                  cloudflare.http_request.cache.status AS cache,
                  related.hash AS rhash, related.ip AS rips
           FROM cf_http"""
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 7, 3, 11, 0)
    assert r.method == "GET" and r.status == 200
    assert r.proto == "http" and r.hv == "2"
    assert r.sip == "203.0.113.66" and r.asn == 64501 and r.cc == "de"
    assert r.sport == 54321
    assert r.dip == "10.9.9.9"
    assert r.tlsv == "1.3" and r.tlsvp == "tls"
    assert r.ua == "Mozilla/5.0"
    assert r.ray == "87a1b2c3d4" and r.zone == "example.com" and r.colo == "FRA"
    assert r.cache == "hit"
    assert r.rhash == ["abcd1234"]
    assert set(r.rips) == {"203.0.113.66", "10.9.9.9"}
