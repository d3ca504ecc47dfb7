"""End-to-end fixtures for the msft aad tables and the three duo
utility tables (ref data/managed/log_sources/{msft,duo}/tables/)."""

from __future__ import annotations

import datetime as dt
import json
import shutil
import tempfile
from pathlib import Path

import pytest

from matano_spark.pipeline import run_log_source

ROOT = Path(__file__).resolve().parents[1] / "data" / "log_sources"
TS_DT = dt.datetime(2024, 5, 1, 10, 0)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="matano_spark_msduo_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, tmpdir, source, records, table):
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    with open(raw / "objects.json", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    tables = run_log_source(
        spark,
        str(ROOT / source),
        str(raw / "*.json"),
        str(tmpdir / "lake"),
        quarantine_root=str(tmpdir / "q"),
    )
    res = tables[table]
    assert res.rows_sidelined == 0
    return res.read()


SIGNIN = {
    "_table": "aad_signinlogs",
    "id": "sg1",
    "createdDateTime": "2024-05-01T10:00:00Z",
    "userPrincipalName": "alice@example.com",
    "userDisplayName": "Alice A",
    "userId": "u1",
    "appDisplayName": "Azure Portal",
    "appId": "app1",
    "clientAppUsed": "Browser",
    "correlationId": "c1",
    "conditionalAccessStatus": "success",
    "isInteractive": True,
    "ipAddress": "203.0.113.5",
    "userAgent": "Mozilla/5.0",
    "operationName": "Sign-in activity",
    "tenantId": "t1",
    "level": "4",
    "durationMs": 2,
    "riskLevelAggregated": "low",
    "riskLevelDuringSignIn": "none",
    "status": {"errorCode": 50126, "failureReason": "Invalid credentials",
               "additionalDetails": "bad password"},
    "deviceDetail": {"browser": "Chrome", "operatingSystem": "MacOs",
                     "isCompliant": True, "trustType": "Azure AD joined"},
    "location": {"city": "Berlin", "state": "BE", "countryOrRegion": "DE",
                 "geoCoordinates": {"latitude": 52.52, "longitude": 13.4}},
    "appliedConditionalAccessPolicies": [{"id": "p1", "result": "success"}],
}


def test_msft_aad_signinlogs(spark, tmpdir):
    df = _run(spark, tmpdir, "msft", [SIGNIN], "aad_signinlogs")
    r = df.selectExpr(
        "ts", "event.id AS eid", "event.action AS act",
        "event.outcome AS outcome", "event.duration AS dur",
        "event.risk_score_norm AS risk", "source.ip AS sip",
        "client.ip AS cip", "log.level AS lvl", "message AS msg",
        "geo.city_name AS city", "geo.location.lat AS lat",
        "user.name AS uname", "user.domain AS udom",
        "user.full_name AS ufull", "user_agent.original AS ua",
        "azure.tenant_id AS tid",
        "azure.aad_signinlogs.device_detail.browser AS browser",
        "azure.aad_signinlogs.applied_conditional_access_policies AS acap",
        "related.user AS ruser", "related.ip AS rip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.eid == "sg1"
    assert r.act == "Sign-in activity"
    assert r.outcome == "failure"  # errorCode 50126 != 0
    assert r.dur == 2_000_000
    assert r.risk == pytest.approx(33.333)  # aggregated "low" wins
    assert r.sip == "203.0.113.5" and r.cip == "203.0.113.5"
    assert r.lvl == "4"
    assert r.msg == "Invalid credentials (bad password)"
    assert r.city == "Berlin" and r.lat == pytest.approx(52.52)
    assert r.uname == "alice" and r.udom == "example.com"
    assert r.ufull == "Alice A"
    assert r.ua == "Mozilla/5.0"
    assert r.tid == "t1"
    assert r.browser == "Chrome"
    assert json.loads(r.acap[0]) == {"id": "p1", "result": "success"}
    assert set(r.ruser) == {"u1", "alice", "Alice A"}
    assert r.rip == ["203.0.113.5"]


AUDIT = {
    "_table": "aad_auditlogs",
    "id": "au1",
    "activityDateTime": "2024-05-01T10:00:00Z",
    "activityDisplayName": "Add user",
    "category": "UserManagement",
    "correlationId": "c2",
    "durationMs": 0,
    "loggedByService": "Core Directory",
    "operationName": "Add user",
    "operationType": "Add",
    "result": "success",
    "resultReason": "",
    "tenantId": "t1",
    "callerIpAddress": "203.0.113.6",
    "initiatedBy": {
        "user": {"id": "admin1", "displayName": "Admin",
                 "ipAddress": "203.0.113.6",
                 "userPrincipalName": "admin@example.com"}
    },
    "targetResources": [
        {
            "displayName": "Bob B", "id": "u9", "type": "User",
            "userPrincipalName": "bob@example.com",
            "modifiedProperties": [
                {"displayName": "AccountEnabled", "newValue": "true",
                 "oldValue": None}
            ],
        }
    ],
}


def test_msft_aad_auditlogs(spark, tmpdir):
    df = _run(spark, tmpdir, "msft", [AUDIT], "aad_auditlogs")
    r = df.selectExpr(
        "ts", "event.id AS eid", "event.action AS act",
        "event.outcome AS outcome", "event.type AS etype",
        "source.ip AS sip", "user.name AS uname", "user.domain AS udom",
        "azure.aad_auditlogs.logged_by_service AS svc",
        "azure.aad_auditlogs.target_resources AS tr",
        "related.user AS ruser", "related.ip AS rip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.eid == "au1"
    assert r.act == "Add user"
    assert r.outcome == "success"
    assert {"change", "user", "creation"} <= set(r.etype)
    assert r.sip == "203.0.113.6"
    assert r.uname == "admin" and r.udom == "example.com"
    assert r.svc == "Core Directory"
    tr = r.tr[0]
    assert tr.display_name == "Bob B" and tr.id == "u9" and tr.type == "User"
    assert tr.user_principal_name == "bob@example.com"
    mp = tr.modified_properties[0]
    assert mp.display_name == "AccountEnabled" and mp.new_value == "true"
    assert set(r.ruser) == {"admin1", "admin", "Admin"}


def test_msft_routing_aborts_other_table(spark, tmpdir):
    # a signin record must land ONLY in aad_signinlogs
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    with open(raw / "objects.json", "w") as f:
        f.write(json.dumps(SIGNIN) + "\n")
    tables = run_log_source(
        spark, str(ROOT / "msft"), str(raw / "*.json"), str(tmpdir / "lake"),
        quarantine_root=str(tmpdir / "q"),
    )
    assert tables["aad_signinlogs"].rows_out == 1
    assert tables["aad_auditlogs"].rows_in == 0


def test_duo_summary(spark, tmpdir):
    rec = {"admin_count": 3, "integration_count": 9,
           "telephony_credits_remaining": 100, "user_count": 42}
    df = _run(spark, tmpdir, "duo", [rec], "summary")
    r = df.selectExpr(
        "ts", "duo.summary.admin_count AS ac", "duo.summary.user_count AS uc"
    ).collect()[0]
    assert r.ts is not None  # now()
    assert r.ac == 3 and r.uc == 42


def test_duo_telephony(spark, tmpdir):
    rec = {"timestamp": 1714557600, "context": "authentication",
           "credits": 2, "phone": "+15555550100", "type": "sms"}
    df = _run(spark, tmpdir, "duo", [rec], "telephony")
    r = df.selectExpr(
        "ts", "event.kind AS kind", "duo.telephony.event_type AS et",
        "duo.telephony.credits AS credits",
        "duo.telephony.phone_number AS phone", "duo.telephony.type AS t",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.kind == "event"
    assert r.et == "authentication" and r.credits == 2
    assert r.phone == "+15555550100" and r.t == "sms"


def test_duo_offline_enrollment(spark, tmpdir):
    rec = {
        "timestamp": 1714557600, "action": "o2fa_user_provisioned",
        "username": "carol",
        "description": json.dumps({"hostname": "LAPTOP-9", "factor": "duo_otp",
                                   "user_agent": "DuoCredProv/4.2"}),
        "object": "carol",
    }
    df = _run(spark, tmpdir, "duo", [rec], "offline_enrollment")
    r = df.selectExpr(
        "ts", "user.name AS uname",
        "duo.offline_enrollment.action AS act",
        "duo.offline_enrollment.description.hostname AS host",
        "duo.offline_enrollment.description.factor AS factor",
        "related.hosts AS rh", "related.user AS ru",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.uname == "carol"
    assert r.act == "o2fa_user_provisioned"
    assert r.host == "LAPTOP-9" and r.factor == "duo_otp"
    assert r.rh == ["LAPTOP-9"] and r.ru == ["carol"]


GWS_ALERT = {
    "alertId": "al-1",
    "createTime": "2024-05-01T10:00:00Z",
    "startTime": "2024-05-01T09:00:00Z",
    "endTime": "2024-05-01T11:00:00Z",
    "source": "Gmail phishing",
    "customerId": "C123",
    "type": "Phishing reported by users",
    "metadata": {"severity": "HIGH", "status": "NOT_STARTED",
                 "alertId": "al-1", "customerId": "C123"},
    "data": {
        "email": "victim@example.com",
        "domain": "example.com",
        "maliciousEntity": {"fromHeader": "bad@evil.example",
                            "displayName": "Evil Sender",
                            "entity": {"emailAddress": "bad@evil.example",
                                       "displayName": "Evil Sender"}},
        "messages": [
            {"messageId": "m1", "date": "2024-05-01T09:30:00Z",
             "md5HashSubject": "a1b2", "subjectText": "Urgent invoice",
             "recipient": "victim@example.com",
             "attachmentsSha256Hash": ["s256a"]},
            {"messageId": "m2", "date": "2024-05-01T09:45:00Z",
             "md5HashSubject": "a1b2", "subjectText": "Urgent invoice 2",
             "recipient": "victim2@example.com"},
        ],
    },
}


def test_google_workspace_alert(spark, tmpdir):
    df = _run(spark, tmpdir, "google_workspace", [GWS_ALERT], "alert")
    r = df.selectExpr(
        "ts", "event.kind AS kind", "event.category AS cat",
        "event.action AS act", "event.id AS eid",
        "event.start AS start", "event.end AS end",
        "organization.id AS org",
        "google_workspace.alert.metadata.severity AS sev",
        "google_workspace.alert.data.messages AS msgs",
        "email.message_id AS mid", "email.subject AS subj",
        "email.to.address AS toaddr", "email.delivery_timestamp AS dts",
        "related.hash AS rhash", "user.email AS uemail",
        "user.domain AS udom", "related.user AS ruser",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.kind == "alert"
    assert set(r.cat) == {"email", "threat", "malware"}
    assert r.act == "Gmail phishing"
    assert r.eid == "al-1"
    assert r.start == dt.datetime(2024, 5, 1, 9, 0)
    assert r.end == dt.datetime(2024, 5, 1, 11, 0)
    assert r.org == "C123"
    assert r.sev == "HIGH"
    m = r.msgs[0]
    assert m.id == "m1" and m.subject_text == "Urgent invoice"
    assert m.date == dt.datetime(2024, 5, 1, 9, 30)
    assert m.attachments_sha256_hash == ["s256a"]
    assert m.md5.hash.subject == "a1b2"
    assert r.mid == "m1" and r.subj == "Urgent invoice"
    assert r.toaddr == ["victim@example.com", "victim2@example.com"]
    assert r.dts == dt.datetime(2024, 5, 1, 9, 30)
    assert r.rhash == ["a1b2"]
    assert r.uemail == "bad@evil.example"
    assert r.udom == "example.com"
    assert r.ruser == ["bad@evil.example"]


def test_google_workspace_alert_routing(spark, tmpdir):
    # alert-feed record must not land in admin/login; reports record
    # must not land in alert
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    reports_rec = {
        "kind": "admin#reports#activity",
        "id": {"time": "2024-05-01T10:00:00Z", "uniqueQualifier": "q1",
               "applicationName": "login", "customerId": "C123"},
        "actor": {"email": "alice@example.com", "profileId": "p1"},
        "events": [{"name": "login_success", "type": "login"}],
    }
    with open(raw / "objects.json", "w") as f:
        f.write(json.dumps(GWS_ALERT) + "\n")
        f.write(json.dumps(reports_rec) + "\n")
    tables = run_log_source(
        spark, str(ROOT / "google_workspace"), str(raw / "*.json"),
        str(tmpdir / "lake"), quarantine_root=str(tmpdir / "q"),
    )
    assert tables["alert"].rows_out == 1
    assert tables["login"].rows_out == 1
    assert tables["admin"].rows_in == 0
