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
