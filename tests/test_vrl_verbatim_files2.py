"""Round-6 verbatim full-file executions: the four heaviest managed
transforms run STRAIGHT from the reference yml text (aws_cloudtrail
log_source.yml:11, msft aad_signinlogs.yml, crowdstrike_falcon
log_source.yml, suricata eve.yml) against realistic events — the
drop-in-your-matano-yml migration story, extended to the programs the
r5 verdict called out as the largest remaining divergence surface."""

from __future__ import annotations

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
    """Compile the verbatim transform against the event's inferred
    struct schema (the per-(source, schema) program cache analog) and
    execute it on the event."""
    prog = _load_transform(rel_yml)
    raw = spark.createDataFrame([(json.dumps(event),)], "raw string")
    inferred = spark.read.json(raw.rdd.map(lambda r: r.raw))
    df = raw.crossJoin(
        inferred.select(F.struct(*inferred.columns).alias("json")).limit(1)
    )
    out = compile_vrl(prog)(df)
    return _norm(out.collect()[0].asDict(recursive=True))


def _norm(v):
    """Schemaless compiles leave dynamic-object leaves variant-typed;
    decode VariantVal to plain Python so asserts compare values."""
    from pyspark.sql.types import VariantVal

    if isinstance(v, VariantVal):
        return _norm(json.loads(v.toJson()))
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    return v


CLOUDTRAIL_CONSOLE_LOGIN = {
    "eventVersion": "1.08",
    "eventTime": "2024-05-01T10:00:00Z",
    "eventSource": "signin.amazonaws.com",
    "eventName": "ConsoleLogin",
    "eventCategory": "Management",
    "awsRegion": "us-east-1",
    "sourceIPAddress": "203.0.113.5",
    "userAgent": "Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/124.0.0.0",
    "userIdentity": {
        "type": "IAMUser",
        "principalId": "AIDAEXAMPLE",
        "arn": "arn:aws:iam::111122223333:user/alice",
        "accountId": "111122223333",
        "accessKeyId": "AKIAEXAMPLE",
        "userName": "alice",
        "sessionContext": {
            "attributes": {
                "mfaAuthenticated": "true",
                "creationDate": "2024-05-01T09:00:00Z",
            }
        },
    },
    "additionalEventData": {
        "MFAUsed": "Yes",
        "MobileVersion": "No",
        "LoginTo": "https://console.aws.amazon.com/console/home",
    },
    "responseElements": {"ConsoleLogin": "Success"},
    "requestID": "req-1",
    "eventID": "evt-1",
    "eventType": "AwsConsoleSignIn",
    "managementEvent": True,
    "readOnly": False,
    "recipientAccountId": "111122223333",
    "tlsDetails": {
        "tlsVersion": "TLSv1.2",
        "cipherSuite": "ECDHE-RSA-AES128-GCM-SHA256",
        "clientProvidedHostHeader": "signin.aws.amazon.com",
    },
    "sessionCredentialFromConsole": "true",
}


def test_aws_cloudtrail_full_transform_verbatim(spark):
    """aws_cloudtrail/log_source.yml (815 lines) end to end: identity
    flattening, source-ip grok, the ~100-entry event-name mappings
    dict with dynamic get + deep event merge, ConsoleLogin
    additional-eventdata booleans, the TLS version split/slice chain,
    outcome block-if, legacy flattened re-encode."""
    d = _run(spark, "aws_cloudtrail/log_source.yml", CLOUDTRAIL_CONSOLE_LOGIN)

    assert str(d["ts"]).startswith("2024-05-01 10:00:00")
    assert d["event"]["action"] == "ConsoleLogin"
    assert d["event"]["kind"] == "event"
    # mappings["ConsoleLogin"] deep-merged into .event
    assert d["event"]["category"] == ["authentication"]
    assert d["event"]["type"] == ["info"]
    # outcome = downcase(responseElements.ConsoleLogin)
    assert d["event"]["outcome"] == "success"
    assert d["event"]["provider"] == "signin.amazonaws.com"
    assert d["event"]["id"] == "evt-1"
    assert d["cloud"]["account"]["id"] == "111122223333"
    assert d["cloud"]["region"] == "us-east-1"
    assert d["user"]["name"] == "alice"
    assert d["user"]["id"] == "AIDAEXAMPLE"
    assert d["related"]["user"] == ["alice"]
    ct = d["aws"]["cloudtrail"]
    assert ct["event_version"] == "1.08"
    assert ct["user_identity"]["type"] == "IAMUser"
    assert ct["user_identity"]["arn"].endswith(":user/alice")
    assert ct["user_identity"]["access_key_id"] == "AKIAEXAMPLE"
    assert ct["user_identity"]["session_context"]["mfa_authenticated"] == "true"
    assert str(
        ct["user_identity"]["session_context"]["creation_date"]
    ).startswith("2024-05-01 09:00:00")
    # grok ^%{IP}$ hit: source.ip extracted from source.address
    assert d["source"]["address"] == "203.0.113.5"
    assert d["source"]["ip"] == "203.0.113.5"
    assert d["user_agent"]["original"].startswith("Mozilla/5.0")
    # ConsoleLogin additional-eventdata normalization
    cl = ct["console_login"]["additional_eventdata"]
    assert cl["mfa_used"] is True
    assert cl["mobile_version"] is False
    assert cl["login_to"] == "https://console.aws.amazon.com/console/home"
    # TLSv1.2 -> protocol tls, version 1.2
    assert d["tls"]["version"] == "1.2"
    assert d["tls"]["version_protocol"] == "tls"
    assert d["tls"]["cipher"] == "ECDHE-RSA-AES128-GCM-SHA256"
    assert d["tls"]["client"]["server_name"] == "signin.aws.amazon.com"
    assert d["destination"]["domain"] == "signin.aws.amazon.com"
    assert ct["session_credential_from_console"] is True
    # response_elements JSON-encoded for the legacy flattened field
    assert json.loads(ct["response_elements"]) == {"ConsoleLogin": "Success"}
    assert json.loads(ct["flattened"]["response_elements"]) == {
        "ConsoleLogin": "Success"
    }
    assert ct["management_event"] is True
    assert ct["read_only"] is False


AAD_SIGNIN_EVENT = {
    "Id": "sign-1",
    "CreatedDateTime": "2024-05-01T10:00:00Z",
    "OperationName": "Sign-in activity",
    "Category": "SignInLogs",
    "TenantId": "tid-1",
    "CorrelationId": "corr-1",
    "Level": 4,
    "DurationMs": 125,
    "CallerIpAddress": "203.0.113.9",
    "UserAgent": "Mozilla/5.0 (Windows NT 10.0)",
    "UserDisplayName": "Alice Liddell",
    "UserPrincipalName": "alice@example.com",
    "UserId": "u-1",
    "AppDisplayName": "Azure Portal",
    "RiskLevelAggregated": "low",
    "Status": {
        "ErrorCode": 50126,
        "FailureReason": "Invalid credentials",
        "AdditionalDetails": "The user failed to sign in",
    },
    "Location": {
        "City": "Dublin",
        "State": "Leinster",
        "CountryOrRegion": "IE",
        "GeoCoordinates": {"Latitude": 53.35, "Longitude": -6.26},
    },
    "DeviceDetail": {"OperatingSystem": "Windows10", "Browser": "Edge 124"},
    "AuthenticationProcessingDetails": [
        {"Key": "Login Hint Present", "Value": "True"}
    ],
    "AppliedConditionalAccessPolicies": [
        {"DisplayName": "MFA policy", "Result": "notApplied"}
    ],
}


def test_msft_aad_signinlogs_full_transform_verbatim(spark):
    """msft/tables/aad_signinlogs.yml end to end: the recursive
    PascalCase->snake_case map_keys closure (parse_regex_all +
    for_each fold per key, applied at every payload depth), grokked
    UPN split, status-message join, risk-level score mapping, and the
    list-of-objects re-encode loops."""
    d = _run(spark, "msft/tables/aad_signinlogs.yml", AAD_SIGNIN_EVENT)

    assert d["cloud"]["provider"] == "azure"
    assert str(d["ts"]).startswith("2024-05-01 10:00:00")
    assert d["event"]["action"] == "Sign-in activity"
    assert d["event"]["kind"] == "event"
    assert d["event"]["category"] == ["authentication"]
    # ErrorCode 50126 > 0 -> failure
    assert d["event"]["outcome"] == "failure"
    assert d["event"]["id"] == "sign-1"
    # DurationMs -> nanoseconds
    assert d["event"]["duration"] == 125 * 1_000_000
    assert d["event"]["risk_score_norm"] == pytest.approx(33.333)
    assert d["message"] == "Invalid credentials (The user failed to sign in)"
    assert d["log"]["level"] == "4"
    assert d["source"]["address"] == "203.0.113.9"
    assert d["source"]["ip"] == "203.0.113.9"
    assert d["client"]["ip"] == "203.0.113.9"
    assert d["related"]["ip"] == ["203.0.113.9"]
    # UPN grok: name@domain
    assert d["user"]["name"] == "alice"
    assert d["user"]["domain"] == "example.com"
    assert d["user"]["full_name"] == "Alice Liddell"
    assert d["user"]["id"] == "u-1"
    assert sorted(d["related"]["user"]) == ["Alice Liddell", "alice", "u-1"]
    assert d["user_agent"]["original"] == "Mozilla/5.0 (Windows NT 10.0)"
    assert d["geo"]["city_name"] == "Dublin"
    assert d["geo"]["region_name"] == "Leinster"
    assert d["geo"]["country_iso_code"] == "IE"
    assert d["geo"]["location"]["lat"] == pytest.approx(53.35)
    assert d["geo"]["location"]["lon"] == pytest.approx(-6.26)
    assert d["azure"]["tenant_id"] == "tid-1"
    assert d["azure"]["correlation_id"] == "corr-1"
    sl = d["azure"]["aad_signinlogs"]
    # recursive snake_case rename reached nested objects
    assert sl["app_display_name"] == "Azure Portal"
    assert sl["device_detail"]["operating_system"] == "Windows10"
    # key/value list folded into one JSON object
    assert json.loads(sl["authentication_processing_details"]) == {
        "Login Hint Present": "True"
    }
    # list-of-objects re-encoded as JSON strings
    pol = [json.loads(x) for x in sl["applied_conditional_access_policies"]]
    assert pol == [{"display_name": "MFA policy", "result": "notApplied"}]


FALCON_DETECTION_EVENT = {
    "metadata": {
        "customerIDString": "cust-1",
        "offset": 14947764,
        "eventType": "DetectionSummaryEvent",
        "eventCreationTime": 1714557600000,
        "version": "1.0",
    },
    "event": {
        "ProcessStartTime": 1714557000,
        "ProcessEndTime": 0,
        "ProcessId": 38684386611,
        "ParentProcessId": 38682494050,
        "ComputerName": "ALICE-PC",
        "UserName": "alice",
        "DetectName": "Process Terminated",
        "DetectDescription": "Terminated a process related to the deletion of backups.",
        "Severity": 4,
        "SeverityName": "High",
        "FileName": "explorer.exe",
        "FilePath": "\\Device\\HarddiskVolume1\\Windows",
        "CommandLine": "C:\\Windows\\Explorer.EXE",
        "SHA256String": "6a5ee2a61b1a02826327cf3ef1b62b78d191154f2ca3aeeee8dff6dc8a100c2b",
        "MD5String": "ac4c51eb24aa95b77f705ab159189e24",
        "SHA1String": "0000000000000000000000000000000000000000",
        "MachineDomain": "EXAMPLE",
        "FalconHostLink": "https://falcon.crowdstrike.com/activity/detections/detail/x/y",
        "SensorId": "sensor-1",
        "DetectId": "ldt:x:y",
        "LocalIP": "10.0.0.7",
        "MACAddress": "00-11-22-33-44-55",
        "Tactic": "Impact",
        "Technique": "Inhibit System Recovery",
        "Objective": "Follow Through",
        "PatternDispositionDescription": "Prevention, process killed.",
        "ParentImageFileName": "\\Device\\HarddiskVolume1\\Windows\\System32\\cmd.exe",
        "ParentCommandLine": "cmd.exe /c backup.bat",
    },
}


def test_crowdstrike_falcon_full_transform_verbatim(spark):
    """crowdstrike_falcon/log_source.yml end to end on a
    DetectionSummaryEvent: epoch-unit timestamp heuristics, the
    eventType dispatch chain, hash push guards (all-zero sha1 must NOT
    land in related.hash), nullish map_values scrub, and the
    process/args rebuild from CommandLine."""
    d = _run(spark, "crowdstrike_falcon/log_source.yml", FALCON_DETECTION_EVENT)

    assert str(d["ts"]).startswith("2024-05-01 10:00:00")
    assert d["event"]["kind"] == "alert"
    assert d["event"]["category"] == ["malware"]
    assert d["event"]["type"] == ["info"]
    assert d["event"]["outcome"] == "unknown"
    assert d["event"]["action"] == "Prevention, process killed."
    assert d["agent"]["type"] == "falcon"
    assert d["agent"]["id"] == "sensor-1"
    assert d["host"]["name"] == "ALICE-PC"
    assert d["user"]["name"] == "alice"
    assert d["user"]["domain"] == "EXAMPLE"
    assert d["source"]["ip"] == "10.0.0.7"
    assert d["process"]["pid"] == 38684386611
    assert d["process"]["name"] == "explorer.exe"
    assert d["process"]["command_line"] == "C:\\Windows\\Explorer.EXE"
    assert d["process"]["args"] == ["C:\\Windows\\Explorer.EXE"]
    assert d["process"]["executable"] == "C:\\Windows\\Explorer.EXE"
    assert d["process"]["parent"]["command_line"] == "cmd.exe /c backup.bat"
    assert d["rule"]["name"] == "Process Terminated"
    assert d["message"].startswith("Terminated a process")
    assert d["event"]["severity"] == 4
    assert d["threat"]["tactic"]["name"] == ["impact"]
    assert d["threat"]["technique"]["name"] == ["inhibit system recovery"]
    # sha256 + md5 pushed; all-zero sha1 filtered by the r'^0+$' guard
    rh = d["related"]["hash"]
    assert FALCON_DETECTION_EVENT["event"]["SHA256String"] in rh
    assert FALCON_DETECTION_EVENT["event"]["MD5String"] in rh
    assert FALCON_DETECTION_EVENT["event"]["SHA1String"] not in rh
    assert d["related"]["user"] == ["alice"]
    assert d["related"]["hosts"] == ["ALICE-PC"]
    ev = d["crowdstrike"]["event"]
    # epoch-seconds heuristic branch (1714557000 < 1e12)
    assert str(ev["ProcessStartTime"]).startswith("2024-05-01")
    # ProcessEndTime == 0 was deleted before the timestamp pass
    assert ev.get("ProcessEndTime") is None


SURICATA_HTTP_EVENT = {
    "timestamp": "2024-05-01T10:00:00.123456+0000",
    "flow_id": 1234567890123,
    "in_iface": "eth0",
    "event_type": "HTTP",
    "src_ip": "10.0.0.5",
    "src_port": 51412,
    "dest_ip": "93.184.216.34",
    "dest_port": 80,
    "proto": "TCP",
    "app_proto": "http",
    "ether": {"src_mac": "00:11:22:33:44:55", "dest_mac": "66:77:88:99:aa:bb"},
    "http": {
        "hostname": "example.com",
        "url": "/path/index.html?a=1",
        "http_user_agent": "curl/7.88.1",
        "http_method": "GET",
        "protocol": "HTTP/1.1",
        "status": 200,
        "length": 1256,
    },
    "flow": {
        "pkts_toserver": 10,
        "pkts_toclient": 12,
        "bytes_toserver": 2215,
        "bytes_toclient": 11406,
        "start": "2024-05-01T09:59:58.000000+0000",
        "state": "new",
    },
}


def test_suricata_eve_http_full_transform_verbatim(spark):
    """suricata/tables/eve.yml end to end on an http event: the
    timezone-suffix rewrite loop for eve timestamps, MAC
    normalization, the event_type mappings object with |= merge,
    status-code outcome, flow-state event.type push, and the
    destination.domain accumulate/join chain."""
    d = _run(spark, "suricata/tables/eve.yml", SURICATA_HTTP_EVENT)

    # +0000 suffix rewritten to +00:00 before to_timestamp
    assert str(d["ts"]).startswith("2024-05-01 10:00:00.123")
    assert d["event"]["kind"] == "event"
    # http mapping replaces category and type, then flow.state=new
    # appends "start"
    assert d["event"]["category"] == ["network", "web"]
    assert d["event"]["type"] == ["access", "protocol", "start"]
    assert d["event"]["outcome"] == "success"  # 200 < 400
    assert d["network"]["protocol"] == "http"
    assert d["network"]["transport"] == "tcp"  # eve.yml:433 downcases
    assert d["source"]["ip"] == "10.0.0.5"
    assert d["source"]["port"] == 51412
    assert d["source"]["mac"] == "00-11-22-33-44-55"
    assert d["destination"]["ip"] == "93.184.216.34"
    assert d["destination"]["port"] == 80
    assert d["destination"]["mac"] == "66-77-88-99-AA-BB"
    assert d["destination"]["domain"] == "example.com"
    assert d["url"]["domain"] == "example.com"
    assert d["url"]["original"] == "/path/index.html?a=1"
    assert d["http"]["request"]["method"] == "GET"
    assert d["http"]["response"]["status_code"] == 200
    sur = d["suricata"]["eve"]
    assert sur["event_type"] == "http"  # downcased
    assert sur["flow_id"] == "1234567890123"  # stringified
