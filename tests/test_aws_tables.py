"""End-to-end fixtures for aws_config_history and aws_inspector (ref
data/managed/log_sources/{aws_config_history,aws_inspector}/
log_source.yml)."""

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
    d = tempfile.mkdtemp(prefix="matano_spark_aws_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, tmpdir, source, payloads):
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    with open(raw / "objects.json", "w") as f:
        for p in payloads:
            f.write(json.dumps(p) + "\n")
    tables = run_log_source(
        spark, str(ROOT / source), str(raw / "*.json"),
        str(tmpdir / "lake"), quarantine_root=str(tmpdir / "q"),
    )
    res = tables["default"]
    assert res.rows_sidelined == 0
    return res.read()


def test_aws_config_history(spark, tmpdir):
    payload = {
        "fileVersion": "1.0",
        "configurationItems": [
            {
                "version": "1.3",
                "configurationItemCaptureTime": "2024-05-01T10:00:00Z",
                "configurationItemMD5Hash": "h4sh",
                "configurationStateId": 1714557600000,
                "configurationItemStatus": "OK",
                "arn": "arn:aws:sqs:eu-central-1:123:q1",
                "resourceType": "AWS::SQS::Queue",
                "resourceId": "q1",
                "resourceName": "q1",
                "resourceCreationTime": "2024-01-01T00:00:00Z",
                "awsRegion": "eu-central-1",
                "awsAccountId": "123456789012",
                "availabilityZone": "Regional",
                "configuration": {"QueueName": "q1"},
                "tags": {"team": "sec"},
                "relationships": [
                    {"resourceName": "p0", "resourceType": "AWS::IAM::Policy",
                     "resourceId": "p0", "relationshipName": " is attached to "}
                ],
            }
        ],
    }
    df = _run(spark, tmpdir, "aws_config_history", [payload])
    r = df.selectExpr(
        "event.kind AS kind", "event.category AS cat", "event.hash AS eh",
        "cloud.provider AS cp", "cloud.region AS region",
        "cloud.account.id AS acct", "cloud.availability_zone AS az",
        "cloud.service.name AS svc",
        "aws.config_history.item.capture_time AS cap",
        "aws.config_history.resource.type AS rtype",
        "aws.config_history.relationship AS rel",
        "aws.config_history.configuration AS conf",
    ).collect()[0]
    assert r.kind == "event" and r.cat == ["configuration"]
    assert r.eh == "h4sh"
    assert r.cp == "aws" and r.region == "eu-central-1"
    assert r.acct == "123456789012"
    assert r.az is None  # "Regional" filtered
    assert r.svc == "sqs"
    assert r.cap == dt.datetime(2024, 5, 1, 10, 0)
    assert r.rtype == "AWS::SQS::Queue"
    rel = r.rel[0]
    assert rel.resource.name == "p0" and rel.name == "is attached to"
    assert json.loads(r.conf) == {"QueueName": "q1"}


def test_aws_inspector(spark, tmpdir):
    finding = {
        "updatedAt": "2024-05-01T10:00:00Z",
        "description": "openssl vulnerable",
        "awsAccountId": "123456789012",
        "severity": "HIGH",
        "findingArn": "arn:aws:inspector2:finding/f1",
        "firstObservedAt": "2024-04-01T00:00:00Z",
        "fixAvailable": "YES",
        "inspectorScore": 8.1,
        "status": "ACTIVE",
        "title": "CVE-2024-1234 - openssl",
        "type": "PACKAGE_VULNERABILITY",
        "packageVulnerabilityDetails": {
            "vulnerabilityId": "CVE-2024-1234",
            "referenceUrls": ["https://nvd.example/CVE-2024-1234"],
            "source": "NVD",
            "sourceUrl": "https://nvd.example/vuln/detail/CVE-2024-1234?x=1",
            "vendorSeverity": "important",
            "vendorCreatedAt": "2024-03-30T00:00:00Z",
            "cvss": [
                {"baseScore": 7.5, "scoringVector": "AV:N", "source": "NVD",
                 "version": "2.0"},
                {"baseScore": 8.1, "scoringVector": "CVSS:3.1", "source": "NVD",
                 "version": "3.1"},
            ],
            "vulnerablePackages": [
                {"arch": "X86_64", "epoch": 0, "name": "openssl",
                 "version": "1.1.1", "release": "r1",
                 "packageManager": "OS", "fixedInVersion": "1.1.1t",
                 "sourceLayerHash": "sha256:layer1"}
            ],
        },
        "remediation": {"recommendation": {"text": "upgrade openssl"}},
        "resources": [
            {
                "id": "i-0abc", "partition": "aws", "region": "eu-central-1",
                "type": "AWS_EC2_INSTANCE",
                "tags": {"env": "prod"},
                "details": {
                    "awsEc2Instance": {
                        "imageId": "ami-1", "ipV4Addresses": ["10.0.0.9"],
                        "ipV6Addresses": [], "keyName": "k1",
                        "launchedAt": "2024-02-01T00:00:00Z",
                        "platform": "AMAZON_LINUX_2", "subnetId": "subnet-1",
                        "type": "t3.micro", "vpcId": "vpc-1",
                    }
                },
            }
        ],
    }
    df = _run(spark, tmpdir, "aws_inspector", [finding])
    r = df.selectExpr(
        "ts", "message AS msg", "cloud.account.id AS acct",
        "cloud.region AS region", "vulnerability.id AS vid",
        "vulnerability.severity AS vsev", "vulnerability.score.base AS vbase",
        "vulnerability.score.version AS vver", "vulnerability.reference AS vref",
        "aws.inspector.inspector_score AS score",
        "aws.inspector.package_vulnerability_details.vulnerable_packages AS pkgs",
        "aws.inspector.package_vulnerability_details.source.url.domain AS udom",
        "aws.inspector.resources AS res",
        "related.hash AS rhash", "related.ip AS rip",
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 5, 1, 10, 0)
    assert r.msg == "openssl vulnerable"
    assert r.acct == "123456789012" and r.region == "eu-central-1"
    assert r.vid == "CVE-2024-1234"
    assert r.vsev == "important"
    assert r.vbase == pytest.approx(8.1)  # max of the cvss list
    assert r.vver == "2.0,3.1"
    assert r.vref == "https://nvd.example/CVE-2024-1234"
    assert r.score == pytest.approx(8.1)
    pkg = r.pkgs[0]
    assert pkg.name == "openssl" and pkg.fixed_in_version == "1.1.1t"
    assert pkg.source_layer_hash == "sha256:layer1"
    assert r.udom == "nvd.example"
    ec2 = r.res[0].details.aws.ec2_instance
    assert ec2.image_id == "ami-1" and ec2.vpc_id == "vpc-1"
    assert ec2.launched_at == dt.datetime(2024, 2, 1, 0, 0)
    assert json.loads(r.res[0].tags) == {"env": "prod"}
    assert r.rhash == ["sha256:layer1"]
    assert r.rip == ["10.0.0.9"]


# slow tier (~2.5 min compile): crowdstrike coverage stays in the
# default tier via test_sources_ported.test_crowdstrike_falcon_end_to_end.
@pytest.mark.slow
def test_crowdstrike_fdr_process_event(spark, tmpdir):
    rec = {
        "event_simpleName": "ProcessRollup2",
        "timestamp": "1714557600000",
        "ContextTimeStamp": "1714557600.123",
        "id": "ev-1",
        "aid": "agent-1",
        "aip": "203.0.113.55",
        "ComputerName": "WKS-01",
        "event_platform": "Win",
        "ConfigBuild": "1007.3.0016606.1",
        "CommandLine": "\"C:\\Windows\\cmd.exe\" /c whoami -",
        "ImageFileName": "\\Device\\HarddiskVolume1\\Windows\\cmd.exe",
        "RawProcessId": "4242",
        "TargetProcessId": "111",
        "ParentProcessId": "42",
        "ParentBaseFileName": "explorer.exe",
        "ProcessStartTime": "1714557000.0",
        "ProcessEndTime": "1714558000.0",
        "MD5HashData": "9e107d9d372bb6826bd81d3542a419d6",
        "SHA256HashData": "2c26b46b68ffc68ff99b453c1d30413413422d706483bfa0f98a5e886266e7ae",
        "SHA1HashData": "0000000000000000000000000000000000000000",
        "UserName": "carol",
        "UserSid": "S-1-5-21-1",
        "UserPrincipal": "carol@example.com",
        "MachineDomain": "EXAMPLE",
    }
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    with open(raw / "objects.json", "w") as f:
        f.write(json.dumps(rec) + "\n")
    tables = run_log_source(
        spark, str(ROOT / "crowdstrike"), str(raw / "*.json"),
        str(tmpdir / "lake"), quarantine_root=str(tmpdir / "q"),
    )
    res = tables["fdr"]
    assert res.rows_sidelined == 0 and res.rows_out == 1
    r = res.read().selectExpr(
        "ts", "event.created AS created", "event.action AS act",
        "event.kind AS kind", "event.category AS cat", "event.type AS etype",
        "event.outcome AS outcome", "observer.serial_number AS aid",
        "observer.ip AS oip", "observer.version AS over",
        "host.name AS hname", "os.type AS ostype",
        "process.name AS pname", "process.pid AS pid",
        "process.args AS args", "process.args_count AS argc",
        "process.parent.name AS ppname", "process.uptime AS uptime",
        "process.hash.md5 AS pmd5", "user.name AS uname",
        "user.full_name AS ufull", "user.domain AS udom",
        "related.hash AS rhash", "related.user AS ruser",
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 5, 1, 10, 0, 0, 123000)
    assert r.created == dt.datetime(2024, 5, 1, 10, 0)
    assert r.act == "ProcessRollup2"
    assert r.kind == "event" and r.cat == ["process"] and r.etype == ["start"]
    assert r.outcome == "success"
    assert r.aid == "agent-1" and r.oip == ["203.0.113.55"]
    assert r.over == "1007.3.0016606.1"
    assert r.hname == "WKS-01" and r.ostype == "windows"
    assert r.pname == "cmd.exe" and r.pid == 4242
    # quotes stripped, "-" arg dropped
    assert r.args == ["C:\\Windows\\cmd.exe", "/c", "whoami"]
    assert r.argc == 4
    assert r.ppname == "explorer.exe"
    assert r.uptime == 1  # (1714558000-1714557000)/1000
    assert r.pmd5 == "9e107d9d372bb6826bd81d3542a419d6"
    assert r.uname == "carol" and r.ufull == "carol" and r.udom == "example.com"
    # all-zero sha1 filtered out of related.hash
    assert set(r.rhash) == {
        "9e107d9d372bb6826bd81d3542a419d6",
        "2c26b46b68ffc68ff99b453c1d30413413422d706483bfa0f98a5e886266e7ae",
    }
    assert set(r.ruser) == {"carol"}


# slow tier (~2.5 min compile): crowdstrike coverage stays in the
# default tier via test_sources_ported.test_crowdstrike_falcon_end_to_end.
@pytest.mark.slow
def test_crowdstrike_fdr_network_event(spark, tmpdir):
    rec = {
        "event_simpleName": "NetworkConnectIP4",
        "UTCTimestamp": "1714557600000",
        "aid": "agent-1",
        "LocalAddressIP4": "10.0.0.7",
        "LocalPort": "50123",
        "RemoteAddressIP4": "203.0.113.9",
        "RemotePort": "443",
        "Protocol": "6",
        "ConnectionDirection": "0",
        "PhysicalAddress": "aa:bb:cc:dd:ee:ff",
        "NetworkConnectCount": "3",
    }
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    with open(raw / "objects.json", "w") as f:
        f.write(json.dumps(rec) + "\n")
    tables = run_log_source(
        spark, str(ROOT / "crowdstrike"), str(raw / "*.json"),
        str(tmpdir / "lake"), quarantine_root=str(tmpdir / "q"),
    )
    res = tables["fdr"]
    assert res.rows_sidelined == 0 and res.rows_out == 1
    r = res.read().selectExpr(
        "ts", "event.kind AS kind", "event.category AS cat",
        "event.type AS etype", "event.outcome AS outcome",
        "source.ip AS sip", "source.port AS sport", "source.mac AS smac",
        "destination.ip AS dip", "destination.port AS dport",
        "network.transport AS transport", "network.iana_number AS iana",
        "network.direction AS dir",
        "crowdstrike.NetworkConnectCount AS ncc",
        "related.ip AS rip",
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 5, 1, 10, 0)
    assert r.kind == "event" and r.cat == ["network"]
    assert r.etype == ["start", "connection"]
    assert r.outcome == "unknown"
    assert r.sip == "10.0.0.7" and r.sport == 50123
    assert r.smac == "AA:BB:CC:DD:EE:FF"
    assert r.dip == "203.0.113.9" and r.dport == 443
    assert r.transport == "tcp" and r.iana == "6" and r.dir == "outbound"
    assert r.ncc == 3
    assert set(r.rip) == {"10.0.0.7", "203.0.113.9", }
