"""Round-8 verbatim full-file executions, batch 6: the heaviest
managed transforms still without semantic goldens — panw/threat (the
largest PAN-OS table: 114-column CSV positional map, URL-misc parsing,
threat-name grok, severity ladder), panw/globalprotect, and
google_workspace admin/alert.

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
                F.struct(*[F.col(f"`{c}`") for c in inferred.columns]).alias("json")
            ).limit(1)
        )
    else:
        df = raw.select("message", F.parse_json(F.lit("{}")).alias("json"))
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


# --------------------------------------------------------------- panw


def _panw_threat_line() -> str:
    """A THREAT,url CSV line: grok prelude fields + the 114-column
    positional tail (panw/tables/threat.yml:25-233)."""
    vals = [""] * 114
    vals[0] = "192.0.2.1"  # source.ip
    vals[1] = "198.51.100.2"  # destination.ip
    vals[2] = "10.0.0.1"  # source.nat.ip
    vals[3] = "10.0.0.2"  # destination.nat.ip
    vals[4] = "block-bad-urls"  # ruleset
    vals[5] = "CORP\\alice"  # srcuser (domain\user grok)
    vals[6] = "bob@corp.example.com"  # dstuser (user@domain grok)
    vals[7] = "Web-Browsing"  # network.application (downcased)
    vals[8] = "vsys1"
    vals[9] = "trust"  # source.zone
    vals[10] = "untrust"  # destination.zone
    vals[11] = "ethernet1/1"
    vals[12] = "ethernet1/2"
    vals[13] = "default"
    vals[14] = "2024/06/01 10:00:06"  # logged_time
    vals[15] = "336785"  # flow_id
    vals[16] = "1"  # repeat_count
    vals[17] = "54321"  # source.port
    vals[18] = "443"  # destination.port
    vals[19] = "12345"  # source.nat.port
    vals[20] = "443"  # destination.nat.port
    vals[21] = "0"  # labels
    vals[22] = "TCP"  # protocol (downcased into network.transport)
    vals[23] = "alert"  # action -> outcome success, type allowed
    vals[24] = "www.example.com:8443/path/file.php?q=1"  # misc (url branch)
    vals[25] = "Suspicious URL(9999)"  # threat name (grok + 9999 rewrite)
    vals[26] = "malware"  # url.category
    vals[27] = "medium"  # severity -> log.level -> event.severity 3
    vals[28] = "0"  # direction -> inbound
    vals[29] = "1234567"  # sequence_number
    vals[30] = "0x8000000000000000"  # action_flags
    vals[31] = "United States"  # srcloc -> source.geo.name
    vals[32] = "Ireland"  # dstloc -> destination.geo.name
    vals[34] = "text/html"  # http_content_type
    vals[35] = "0"  # pcap_id == "0" -> deleted
    vals[36] = "abcdef0123456789"  # file.hash -> related.hash
    vals[38] = "1"  # url_idx
    vals[39] = "Mozilla/5.0"  # user_agent
    vals[41] = "203.0.113.77"  # forwarded_ip
    vals[42] = "https://ref.example.com/"  # referrer
    vals[52] = "fw-edge-1"  # device_name -> observer.hostname
    vals[56] = "GET"  # http_method
    vals[62] = "code-execution"  # threat_category
    vals[68] = '" malware,phishing "'  # url_category_list (CSV-quoted; strip+split)
    vals[69] = "1efed0b4-9d51-4b1c-8de1-a1ee0b1b9d4e"  # rule_uuid
    vals[70] = "123"  # http2_connection != 0 -> http.version "2"
    vals[72] = "203.0.113.88"  # xff.ip
    vals[79] = "SRC-HOST"  # src.host
    vals[80] = "aa:bb:cc:dd:ee:ff"  # src.mac -> AA-BB-...
    vals[87] = "DST-HOST"  # dst.host
    vals[88] = "11.22.33.44.55.66"  # dst.mac (dot form)
    vals[107] = "4"  # application.risk_level -> int
    return (
        "1,2024/06/01 10:00:00,015351000038802,THREAT,url,2305,"
        "2024/06/01 10:00:05," + ",".join(vals)
    )


def test_panw_threat_full_transform_verbatim(spark):
    d = _run(spark, "panw/tables/threat.yml", None, message=_panw_threat_line())
    # ts = generated_time + "+00:00" via %Y/%m/%d %H:%M:%S%:z
    assert _ts_utc(d["ts"]) == dt.datetime(2024, 6, 1, 10, 0, 5)
    assert _ts_utc(d["event"]["created"]) == dt.datetime(2024, 6, 1, 10, 0, 0)
    pp = d["panw"]["panos"]
    assert _ts_utc(pp["logged_time"]) == dt.datetime(2024, 6, 1, 10, 0, 6)
    assert pp["type"] == "THREAT"
    assert pp["sub_type"] == "url"
    assert d["observer"]["serial_number"] == "015351000038802"
    assert d["observer"]["vendor"] == "Palo Alto Networks"
    assert d["observer"]["hostname"] == "fw-edge-1"
    assert d["observer"]["ingress"]["zone"] == "trust"
    assert d["observer"]["egress"]["zone"] == "untrust"
    # ECS core
    assert d["event"]["kind"] == "alert"
    assert {"intrusion_detection", "threat", "network"} <= set(
        d["event"]["category"]
    )
    assert d["event"]["outcome"] == "success"  # action alert
    assert "allowed" in d["event"]["type"]
    assert d["event"]["action"] == "url_filtering"  # sub_type url
    assert d["event"]["severity"] == 3  # medium
    assert d["log"]["level"] == "medium"
    assert d["network"]["direction"] == "inbound"  # direction 0
    assert d["network"]["application"] == "web-browsing"
    assert d["network"]["transport"] == "tcp"
    assert d["network"]["type"] == "ipv4"
    assert _s(d["network"]["forwarded_ip"]) == "203.0.113.77"
    assert d["http"]["version"] == "2"
    assert d["http"]["request"]["method"] == "GET"
    assert d["http"]["request"]["referrer"] == "https://ref.example.com/"
    # url branch over misc (domain:port + path + query + extension)
    assert _s(d["url"]["original"]) == "www.example.com:8443/path/file.php?q=1"
    assert _s(d["url"]["domain"]) == "www.example.com"
    assert _s(d["url"]["port"]) == "8443"
    assert _s(d["url"]["path"]) == "/path/file.php"
    assert _s(d["url"]["query"]) == "q=1"
    assert _s(d["url"]["extension"]) == "php"
    # endpoints
    assert _s(d["source"]["ip"]) == "192.0.2.1"
    assert d["source"]["port"] == 54321
    assert _s(d["destination"]["ip"]) == "198.51.100.2"
    assert d["destination"]["port"] == 443
    assert _s(d["source"]["nat"]["ip"]) == "10.0.0.1"
    assert d["source"]["nat"]["port"] == 12345
    assert d["source"]["user"]["name"] == "alice"
    assert d["source"]["user"]["domain"] == "CORP"
    assert d["destination"]["user"]["name"] == "bob"
    assert d["destination"]["user"]["domain"] == "corp.example.com"
    assert d["user"]["name"] == "alice"  # .user = .source.user
    assert d["source"]["geo"]["name"] == "United States"
    assert d["destination"]["geo"]["name"] == "Ireland"
    # threat-name grok + the 9999 rewrite
    assert pp["threat"]["name"] == "URL-filtering"
    assert _s(pp["threat"]["id"]) == "9999"
    assert d["rule"]["name"] == "block-bad-urls"  # falls back to ruleset
    assert d["rule"]["uuid"] == "1efed0b4-9d51-4b1c-8de1-a1ee0b1b9d4e"
    # related.*
    rel_ip = {_s(i) for i in d["related"]["ip"] if i is not None}
    assert rel_ip == {
        "192.0.2.1",
        "198.51.100.2",
        "10.0.0.1",
        "10.0.0.2",
        "203.0.113.88",
        "203.0.113.77",
    }
    rel_user = {_s(u) for u in d["related"]["user"] if u is not None}
    assert {"alice", "bob"} <= rel_user
    assert [_s(h) for h in d["related"]["hash"] if h is not None] == [
        "abcdef0123456789"
    ]
    rel_hosts = {_s(h) for h in d["related"]["hosts"] if h is not None}
    assert {"fw-edge-1", "SRC-HOST", "DST-HOST"} <= rel_hosts
    # mac normalization (colon AND dot forms -> dash upper)
    assert pp["src"]["mac"] == "AA-BB-CC-DD-EE-FF"
    assert pp["dst"]["mac"] == "11-22-33-44-55-66"
    assert pp["url_category_list"] == ["malware", "phishing"]
    assert pp["application"]["risk_level"] == 4
    # duplicate custom fields are deleted after the ECS copy
    assert pp.get("misc") is None
    assert (pp.get("source") or {}).get("ip") is None
    assert (pp.get("network") or {}).get("pcap_id") is None  # "0" -> deleted


def _panw_gp_line() -> str:
    """A GLOBALPROTECT gateway-auth CSV line (42 positional columns,
    panw/tables/globalprotect.yml:49-91); sub_type is empty in GP
    logs."""
    vals = [""] * 42
    vals[0] = "vsys1"
    vals[1] = "gateway-auth"  # event.id -> event.code
    vals[2] = "login"  # stage
    vals[3] = "LDAP"  # auth_method
    vals[4] = "SSLVPN"  # tunnel_type
    vals[5] = "CORP\\alice"  # srcuser
    vals[6] = "United States"  # srcloc -> source.geo.name
    vals[7] = "LAPTOP-01"  # machine.name -> host.name
    vals[8] = "203.0.113.10"  # public.ip -> source.nat.ip
    vals[10] = "10.1.2.3"  # private.ip -> source.ip
    vals[12] = "HOSTID-1"  # host.id
    vals[13] = "SN-1"
    vals[14] = "6.2.0"  # client_ver
    vals[15] = "Windows"  # client.os -> host.os.family
    vals[16] = "Microsoft Windows 11"  # client.os_version -> host.os.full
    vals[17] = "1"
    vals[18] = "auth success"  # event.reason
    vals[21] = "success"  # event.status -> event.outcome
    vals[22] = "US"  # location -> observer.geo.name
    vals[23] = "15"  # login_duration -> event.duration (s -> ns)
    vals[24] = "on-demand"  # connect_method
    vals[25] = "0"  # error_code
    vals[26] = "GP-Portal"  # portal
    vals[27] = "100200"
    vals[28] = "0x0"
    vals[30] = "manual"  # selection_type
    vals[31] = "20"  # response_time
    vals[32] = "1"  # priority
    vals[33] = "gw1;gw2"  # attempted_gateways
    vals[34] = "GW-EU-1"  # gateway
    vals[40] = "fw-edge-1"  # device_name -> observer.hostname
    vals[41] = "1"
    return (
        "1,2024/06/02 08:30:00,015351000038802,GLOBALPROTECT,,2305,"
        "2024/06/02 08:30:05," + ",".join(vals)
    )


def test_panw_globalprotect_full_transform_verbatim(spark):
    d = _run(
        spark, "panw/tables/globalprotect.yml", None, message=_panw_gp_line()
    )
    assert _ts_utc(d["ts"]) == dt.datetime(2024, 6, 2, 8, 30, 5)
    assert _ts_utc(d["event"]["created"]) == dt.datetime(2024, 6, 2, 8, 30, 0)
    pp = d["panw"]["panos"]
    assert pp["type"] == "GLOBALPROTECT"
    assert d["event"]["kind"] == "event"
    assert "network" in d["event"]["category"]
    assert d["event"]["code"] == "gateway-auth"
    assert d["event"]["outcome"] == "success"
    assert d["event"]["reason"] == "auth success"
    assert d["event"]["duration"] == 15 * 1_000_000_000  # s -> ns
    # private ip -> source.ip, public -> nat; host.ip = [source.ip]
    assert _s(d["source"]["ip"]) == "10.1.2.3"
    assert _s(d["source"]["nat"]["ip"]) == "203.0.113.10"
    assert [_s(i) for i in d["host"]["ip"]] == ["10.1.2.3"]
    assert d["host"]["id"] == "HOSTID-1"
    assert d["host"]["name"] == "LAPTOP-01"
    assert d["host"]["os"]["family"] == "Windows"
    assert d["host"]["os"]["full"] == "Microsoft Windows 11"
    assert d["observer"]["geo"]["name"] == "US"
    assert d["observer"]["hostname"] == "fw-edge-1"
    assert d["source"]["user"]["name"] == "alice"
    assert d["source"]["user"]["domain"] == "CORP"
    assert d["user"]["name"] == "alice"
    assert d["source"]["geo"]["name"] == "United States"
    assert d["network"]["type"] == "ipv4"
    # GP-specific custom fields survive the del list
    assert pp["stage"] == "login"
    assert pp["auth_method"] == "LDAP"
    assert pp["tunnel_type"] == "SSLVPN"
    assert pp["connect_method"] == "on-demand"
    assert pp["portal"] == "GP-Portal"
    assert pp["gateway"] == "GW-EU-1"
    assert pp["attempted_gateways"] == "gw1;gw2"
    assert pp["selection_type"] == "manual"
    assert pp["error_code"] == 0
    assert pp["response_time"] == 20
    assert pp["priority"] == "1"
    rel_ip = {_s(i) for i in d["related"]["ip"] if i is not None}
    assert rel_ip == {"10.1.2.3", "203.0.113.10"}
    rel_user = {_s(u) for u in d["related"]["user"] if u is not None}
    assert "alice" in rel_user
    rel_hosts = {_s(h) for h in d["related"]["hosts"] if h is not None}
    assert {"fw-edge-1", "LAPTOP-01"} <= rel_hosts


# --------------------------------------------------- google_workspace


def test_google_workspace_alert_full_transform_verbatim(spark):
    """google_workspace/tables/alert.yml on a Gmail-phishing alert:
    the messages for_each (per-message field renames + hash/recipient
    aggregation), unique(compact(...)) folds, negative indexing
    (.user.email[-1]), and the email.attachments map_values build."""
    event = {
        "source": "Gmail phishing",
        "createTime": "2024-06-01T10:00:00Z",
        "endTime": "2024-06-01T11:00:00Z",
        "startTime": "2024-06-01T09:00:00Z",
        "customerId": "C123",
        "alertId": "alert-1",
        "etag": "etag-1",
        "type": "User reported phishing",
        "metadata": {
            "assignee": "admin@corp.com",
            "alertId": "alert-1",
            "customerId": "C123",
            "severity": "HIGH",
            "status": "NOT_STARTED",
            "updateTime": "2024-06-01T10:05:00Z",
            "etag": "etag-2",
        },
        "data": {
            "@type": "type.googleapis.com/google.apps.alertcenter.type.MailPhishing",
            "domainId": {"customerPrimaryDomain": "corp.com"},
            "maliciousEntity": {
                "entity": {
                    "emailAddress": "evil@attacker.com",
                    "displayName": "Evil Actor",
                },
                "fromHeader": "evil@attacker.com",
            },
            "messages": [
                {
                    "messageId": "m-1",
                    "md5HashSubject": "aaa111",
                    "attachmentsSha256Hash": ["deadbeef01"],
                    "messageBodySnippet": "click here",
                    "md5HashMessageBody": "bbb222",
                    "recipient": "victim@corp.com",
                    "subjectText": "Urgent",
                    "date": "2024-06-01T09:30:00Z",
                },
                {
                    "messageId": "m-2",
                    "md5HashSubject": "ccc333",
                    "attachmentsSha256Hash": ["deadbeef02"],
                    "md5HashMessageBody": "ddd444",
                    "recipient": "victim2@corp.com",
                    "subjectText": "Hello",
                    "date": "2024-06-01T09:45:00Z",
                },
            ],
            "isInternal": False,
            "sourceIp": "203.0.113.66",
            "loginDetails": {
                "ipAddress": "198.51.100.3",
                "loginTime": "2024-06-01T08:00:00Z",
            },
            "actorEmail": "actor@corp.com",
            "systemActionType": "NO_OPERATION",
        },
    }
    d = _run(spark, "google_workspace/tables/alert.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime(2024, 6, 1, 10, 0, 0)
    assert d["event"]["kind"] == "alert"
    assert d["event"]["type"] == ["info"]
    # Gmail phishing -> email+threat+malware
    assert set(d["event"]["category"]) == {"email", "threat", "malware"}
    assert _s(d["event"]["action"]) == "Gmail phishing"
    assert _s(d["event"]["id"]) == "alert-1"
    assert _ts_utc(d["event"]["end"]) == dt.datetime(2024, 6, 1, 11, 0, 0)
    assert _ts_utc(d["event"]["start"]) == dt.datetime(2024, 6, 1, 9, 0, 0)
    assert _s(d["organization"]["id"]) == "C123"
    ga = d["google_workspace"]["alert"]
    assert _s(ga["metadata"]["severity"]) == "HIGH"
    assert _s(ga["metadata"]["status"]) == "NOT_STARTED"
    assert _s(ga["data"]["type"]).endswith("MailPhishing")
    assert ga["data"]["is_internal"] is False
    # user.email[-1]: last push was the malicious-entity address
    assert _s(d["user"]["email"]) == "evil@attacker.com"
    assert _s(d["user"]["name"]) == "Evil Actor"
    assert _s(d["user"]["domain"]) == "corp.com"
    assert _s(d["source"]["ip"]) == "203.0.113.66"
    assert _s(d["source"]["user"]["email"]) == "actor@corp.com"
    # email aggregation over the messages for_each
    assert _s(d["email"]["message_id"]) == "m-1,m-2"  # joined
    assert _s(d["email"]["subject"]) == "Urgent,Hello"  # joined
    assert [_s(a) for a in d["email"]["to"]["address"]] == [
        "victim@corp.com",
        "victim2@corp.com",
    ]
    # delivery_timestamp: first message's date wins (|| keeps lhs).
    # Schemaless it round-trips the variant fold as text; the pack's
    # schema cast restores the timestamp type.
    deliv = d["email"]["delivery_timestamp"]
    if not isinstance(deliv, dt.datetime):
        deliv = dt.datetime.fromisoformat(_s(deliv).replace("Z", "+00:00"))
        deliv = deliv.replace(tzinfo=None)
    assert _ts_utc(deliv) == dt.datetime(2024, 6, 1, 9, 30, 0)
    att = d["email"]["attachments"]
    assert {_s(a["file"]["hash"]["sha256"]) for a in att} == {
        "deadbeef01",
        "deadbeef02",
    }
    # related folds: md5 subject hashes + sha256 attachment hashes
    assert {_s(h) for h in d["related"]["hash"]} == {
        "aaa111",
        "ccc333",
        "deadbeef01",
        "deadbeef02",
    }
    assert {_s(i) for i in d["related"]["ip"]} == {
        "198.51.100.3",
        "203.0.113.66",
    }
    assert {_s(u) for u in d["related"]["user"]} == {
        "Evil Actor",
        "actor@corp.com",
    }
    # per-message renames inside the rebuilt messages array
    msgs = ga["data"]["messages"]
    assert [_s(m["id"]) for m in msgs] == ["m-1", "m-2"]
    assert _s(msgs[0]["md5"]["hash"]["subject"]) == "aaa111"
    assert _s(msgs[0]["recipient_email"]) == "victim@corp.com"
    ld = ga["data"]["login_details"]
    assert _s(ld["ip_address"]) == "198.51.100.3"
    assert _ts_utc(ld["login_time"]) == dt.datetime(2024, 6, 1, 8, 0, 0)


def test_google_workspace_admin_full_transform_verbatim(spark):
    """google_workspace/tables/admin.yml: the parameters for_each with
    set!(.google_workspace.admin, [v.name], ...) dynamic keys, the
    UPPER_SNAKE -> nested rename ladder, email splitting into
    user/group name+domain, and the action categorization lists."""
    event = {
        "id": {
            "time": "2024-06-05T12:00:00Z",
            "applicationName": "admin",
            "uniqueQualifier": "123456789",
            "customerId": "C999",
        },
        "actor": {
            "email": "admin@corp.com",
            "profileId": "99887766",
            "callerType": "USER",
        },
        "ipAddress": "203.0.113.5",
        "kind": "admin#reports#activity",
        "ownerDomain": "corp.com",
        "events": {
            "name": "CHANGE_APPLICATION_SETTING",
            "type": "APPLICATION_SETTINGS",
            "parameters": [
                {"name": "APPLICATION_NAME", "value": "Drive"},
                {"name": "SETTING_NAME", "value": "Sharing outside"},
                {"name": "NEW_VALUE", "value": "off"},
                {"name": "OLD_VALUE", "value": "on"},
                {"name": "GROUP_EMAIL", "value": "eng@corp.com"},
                {"name": "USER_EMAIL", "value": "bob@corp.com"},
                {"name": "BULK_UPLOAD_TOTAL_USERS_NUMBER", "intValue": "42"},
                {"name": "API_SCOPES", "multiValue": ["scope.a", "scope.b"]},
            ],
        },
    }
    d = _run(spark, "google_workspace/tables/admin.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime(2024, 6, 5, 12, 0, 0)
    assert _s(d["event"]["action"]) == "CHANGE_APPLICATION_SETTING"
    assert set(d["event"]["category"]) == {"iam", "configuration"}
    assert d["event"]["type"] == ["change"]
    assert _s(d["event"]["provider"]) == "admin"
    assert _s(d["event"]["id"]) == "123456789"
    assert _s(d["event"]["kind"]) == "event"
    assert _s(d["organization"]["id"]) == "C999"
    assert _s(d["source"]["ip"]) == "203.0.113.5"
    assert _s(d["source"]["user"]["email"]) == "admin@corp.com"
    assert _s(d["source"]["user"]["id"]) == "99887766"
    # email splits
    assert _s(d["user"]["name"]) == "admin"
    assert _s(d["user"]["domain"]) == "corp.com"
    assert _s(d["source"]["user"]["name"]) == "admin"
    assert _s(d["group"]["name"]) == "eng"
    assert _s(d["group"]["domain"]) == "corp.com"
    assert _s(d["user"]["target"]["name"]) == "bob"
    assert _s(d["user"]["target"]["domain"]) == "corp.com"
    assert _s(d["user"]["target"]["email"]) == "bob@corp.com"
    assert _s(d["user"]["target"]["group"]["name"]) == "eng"
    gw = d["google_workspace"]
    assert _s(gw["kind"]) == "admin#reports#activity"
    assert _s(gw["actor"]["type"]) == "USER"
    assert _s(gw["organization"]["domain"]) == "corp.com"
    assert _s(gw["event"]["type"]) == "APPLICATION_SETTINGS"
    adm = gw["admin"]
    assert _s(adm["application"]["name"]) == "Drive"
    assert _s(adm["setting"]["name"]) == "Sharing outside"
    assert _s(adm["new_value"]) == "off"
    assert _s(adm["old_value"]) == "on"
    assert _s(adm["group"]["email"]) == "eng@corp.com"
    assert _s(adm["user"]["email"]) == "bob@corp.com"
    assert adm["bulk_upload"]["total"] == 42
    assert [_s(x) for x in adm["api"]["scopes"]] == ["scope.a", "scope.b"]
    assert [_s(i) for i in d["related"]["ip"] if i is not None] == [
        "203.0.113.5"
    ]
    rel_user = {_s(u) for u in d["related"]["user"] if u is not None}
    assert rel_user == {"admin", "bob"}
