"""End-to-end fixtures for the ten normalized zeek tables (ref
data/managed/log_sources/zeek/tables/*.yml): one JSONL object per
table written to its zeek log filename, routed by the S7 filename
rules, asserting ts + ECS + vendor fields."""

from __future__ import annotations

import datetime as dt
import json
import shutil
import tempfile
from pathlib import Path

import pytest

from matano_spark.pipeline import run_log_source

ROOT = Path(__file__).resolve().parents[1] / "data" / "log_sources"
TS = 1714557600.0
TS_DT = dt.datetime(2024, 5, 1, 10, 0)
CONN_ID = {"id.orig_h": "10.0.0.5", "id.orig_p": 54321,
           "id.resp_h": "192.0.2.6", "id.resp_p": 443}


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="matano_spark_zeek_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, tmpdir, filename, record, table):
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    with open(raw / filename, "w") as f:
        f.write(json.dumps(record) + "\n")
    tables = run_log_source(
        spark, str(ROOT / "zeek"), str(raw / "*"),
        str(tmpdir / "lake"), quarantine_root=str(tmpdir / "q"),
        only_tables=[table],
    )
    res = tables[table]
    assert res.rows_sidelined == 0, table
    assert res.rows_out == 1, table
    return res.read()


def test_zeek_connection(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cabc1", **CONN_ID, "proto": "tcp",
           "service": "https", "duration": 1.5, "orig_bytes": 100,
           "resp_bytes": 230, "conn_state": "SF", "local_orig": True,
           "local_resp": False, "missed_bytes": 0, "history": "ShADadFf",
           "orig_pkts": 6, "orig_ip_bytes": 420, "resp_pkts": 5,
           "resp_ip_bytes": 550}
    r = _run(spark, tmpdir, "conn.log", rec, "connection").selectExpr(
        "ts", "source.ip AS sip", "source.port AS sport",
        "destination.ip AS dip", "destination.port AS dport",
        "network.transport AS transport", "network.protocol AS proto",
        "network.bytes AS nbytes", "network.packets AS npkts",
        "network.direction AS dir", "event.duration AS dur",
        "event.id AS eid", "zeek.connection.state AS state",
        "zeek.connection.state_message AS statemsg", "related.ip AS rip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.sip == "10.0.0.5" and r.sport == 54321
    assert r.dip == "192.0.2.6" and r.dport == 443
    assert r.transport == "tcp" and r.proto == "https"
    assert r.nbytes == 970 and r.npkts == 11
    assert r.dir == "outbound"
    assert r.dur == 1_500_000_000
    assert r.eid == "Cabc1"
    assert r.state == "SF"
    assert r.statemsg == "Normal establishment and termination."
    assert set(r.rip) == {"10.0.0.5", "192.0.2.6"}


def test_zeek_http(spark, tmpdir):
    rec = {"ts": TS, "uid": "Chttp1", **CONN_ID, "method": "POST",
           "host": "api.example.com", "uri": "/v1/login", "version": "1.1",
           "user_agent": "curl/8.0", "request_body_len": 120,
           "response_body_len": 50, "status_code": 403,
           "status_msg": "Forbidden", "username": "bob",
           "tags": ["t1"], "trans_depth": 1}
    r = _run(spark, tmpdir, "http.log", rec, "http").selectExpr(
        "ts", "http.request.method AS method",
        "http.response.status_code AS status", "http.version AS hv",
        "url.domain AS udom", "url.path AS upath", "user.name AS uname",
        "user_agent.original AS ua", "event.outcome AS outcome",
        "zeek.http.tags AS ztags", "related.user AS ruser",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.method == "POST" and r.status == 403 and r.hv == "1.1"
    assert r.udom == "api.example.com" and r.upath == "/v1/login"
    assert r.uname == "bob" and r.ua == "curl/8.0"
    assert r.outcome == "failure"
    assert r.ztags == ["t1"]
    assert r.ruser == ["bob"]


def test_zeek_ssl(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cssl1", **CONN_ID, "version": "TLSv1.2",
           "cipher": "TLS_AES_128_GCM_SHA256", "curve": "x25519",
           "server_name": "shop.example.com", "resumed": False,
           "established": True,
           "subject": "CN=shop.example.com,O=Shop\\\\, Inc.,C=DE",
           "issuer": "CN=Example CA,O=ExampleTrust,C=US",
           "validation_status": "ok", "ja3": "j3", "ja3s": "j3s",
           "not_valid_before": TS - 86400.0, "not_valid_after": TS + 86400.0}
    r = _run(spark, tmpdir, "ssl.log", rec, "ssl").selectExpr(
        "ts", "tls.version_protocol AS vp", "tls.version AS v",
        "tls.cipher AS cipher", "tls.established AS est",
        "tls.server.not_before AS nb", "tls.server.not_after AS na",
        "tls.client.ja3 AS ja3", "tls.server.ja3s AS ja3s",
        "tls.server.x509.subject.common_name AS scn",
        "tls.server.x509.subject.country AS sc",
        "tls.server.x509.issuer.common_name AS icn",
        "tls.server.x509.issuer.organization AS io",
        "zeek.ssl.server.name AS sni",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.vp == "tls" and r.v == "1.2"
    assert r.cipher == "TLS_AES_128_GCM_SHA256"
    assert r.est is True
    assert r.nb == TS_DT - dt.timedelta(days=1)
    assert r.na == TS_DT + dt.timedelta(days=1)
    assert r.ja3 == "j3" and r.ja3s == "j3s"
    assert r.scn == ["shop.example.com"] and r.sc == ["DE"]
    assert r.icn == ["Example CA"] and r.io == ["ExampleTrust"]
    assert r.sni == "shop.example.com"


def test_zeek_files(spark, tmpdir):
    rec = {"ts": TS, "fuid": "Ffile1", "tx_hosts": ["192.0.2.6"],
           "rx_hosts": ["10.0.0.5"], "conn_uids": ["Cabc1"],
           "source": "HTTP", "depth": 0, "analyzers": ["MD5", "SHA1"],
           "mime_type": "application/zip", "filename": "payload.zip",
           "seen_bytes": 2048, "total_bytes": 2048,
           "md5": "9e107d9d372bb6826bd81d3542a419d6",
           "sha1": "2fd4e1c67a2d28fced849ee1bb76e7391b93eb12"}
    r = _run(spark, tmpdir, "files.log", rec, "files").selectExpr(
        "ts", "file.name AS fname", "file.mime_type AS mime",
        "file.size AS fsize", "file.hash.md5 AS md5",
        "server.ip AS sip", "client.ip AS cip", "event.id AS eid",
        "zeek.files.source AS zsource", "related.hash AS rhash",
        "related.ip AS rip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.fname == "payload.zip" and r.mime == "application/zip"
    assert r.fsize == 2048
    assert r.md5 == "9e107d9d372bb6826bd81d3542a419d6"
    assert r.sip == "192.0.2.6" and r.cip == "10.0.0.5"
    assert r.eid == "Cabc1"
    assert r.zsource == "HTTP"
    assert set(r.rhash) == {"9e107d9d372bb6826bd81d3542a419d6",
                            "2fd4e1c67a2d28fced849ee1bb76e7391b93eb12"}
    assert set(r.rip) == {"192.0.2.6", "10.0.0.5"}


def test_zeek_weird(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cw1", **CONN_ID,
           "name": "bad_TCP_checksum", "addl": "", "notice": False,
           "peer": "worker-1"}
    r = _run(spark, tmpdir, "weird.log", rec, "weird").selectExpr(
        "ts", "rule.name AS rname", "zeek.weird.peer AS peer",
        "source.ip AS sip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.rname == "bad_TCP_checksum"
    assert r.peer == "worker-1"
    assert r.sip == "10.0.0.5"


def test_zeek_notice(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cn1", **CONN_ID,
           "note": "Scan::Port_Scan", "msg": "10.0.0.5 scanned 50 ports",
           "sub": "local", "actions": ["Notice::ACTION_LOG"],
           "suppress_for": 3600.0, "dropped": False}
    r = _run(spark, tmpdir, "notice.log", rec, "notice").selectExpr(
        "ts", "event.kind AS kind", "event.category AS cat",
        "rule.name AS rname", "rule.description AS rdesc",
        "zeek.notice.actions AS actions", "source.ip AS sip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.kind == "alert" and r.cat == ["intrusion_detection"]
    assert r.rname == "Scan::Port_Scan"
    assert r.rdesc == "10.0.0.5 scanned 50 ports"
    assert r.actions == ["Notice::ACTION_LOG"]
    assert r.sip == "10.0.0.5"


def test_zeek_ssh(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cssh1", **CONN_ID, "version": 2,
           "auth_success": False, "auth_attempts": 3,
           "direction": "INBOUND", "client": "SSH-2.0-OpenSSH_9.0",
           "server": "SSH-2.0-OpenSSH_8.9", "cipher_alg": "aes256-ctr",
           "kex_alg": "curve25519-sha256"}
    r = _run(spark, tmpdir, "ssh.log", rec, "ssh").selectExpr(
        "ts", "event.outcome AS outcome", "network.protocol AS proto",
        "zeek.ssh.auth.attempts AS attempts",
        "zeek.ssh.algorithm.cipher AS cipher",
        "zeek.ssh.client AS client",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.outcome == "failure"
    assert r.proto == "ssh"
    assert r.attempts == 3
    assert r.cipher == "aes256-ctr"
    assert r.client == "SSH-2.0-OpenSSH_9.0"


def test_zeek_smb_files(spark, tmpdir):
    rec = {"ts": TS, "uid": "Csmb1", **CONN_ID, "fid": 7,
           "action": "SMB::FILE_OPEN", "path": "\\\\srv\\share",
           "name": "secret.docx", "size": 4096,
           "times.modified": TS - 100.0, "times.created": TS - 1000.0}
    r = _run(spark, tmpdir, "smb_files.log", rec, "smb_files").selectExpr(
        "ts", "event.action AS act", "file.name AS fname",
        "file.path AS fpath", "file.size AS fsize",
        "file.mtime AS mtime", "file.created AS created",
        "network.protocol AS proto",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.act == "SMB::FILE_OPEN"
    assert r.fname == "secret.docx" and r.fpath == "\\\\srv\\share"
    assert r.fsize == 4096
    assert r.mtime == TS_DT - dt.timedelta(seconds=100)
    assert r.created == TS_DT - dt.timedelta(seconds=1000)
    assert r.proto == "smb"


def test_zeek_kerberos(spark, tmpdir):
    rec = {"ts": TS, "uid": "Ckrb1", **CONN_ID, "request_type": "TGS",
           "client": "alice/EXAMPLE.COM", "service": "krbtgt/EXAMPLE.COM",
           "success": True, "till": TS + 36000.0, "from": TS,
           "cipher": "aes256-cts-hmac-sha1-96", "forwardable": True,
           "renewable": True}
    r = _run(spark, tmpdir, "kerberos.log", rec, "kerberos").selectExpr(
        "ts", "event.action AS act", "event.outcome AS outcome",
        "user.name AS uname", "user.domain AS udom",
        "zeek.kerberos.service AS svc",
        "zeek.kerberos.valid.until AS until", "related.user AS ruser",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.act == "TGS" and r.outcome == "success"
    assert r.uname == "alice" and r.udom == "EXAMPLE.COM"
    assert r.svc == "krbtgt/EXAMPLE.COM"
    assert r.until == TS_DT + dt.timedelta(hours=10)
    assert r.ruser == ["alice"]


def test_zeek_x509(spark, tmpdir):
    rec = {"ts": TS, "id": "Fx5091", "certificate.version": 3,
           "certificate.serial": "1EA2B3",
           "certificate.subject": "CN=host.example.com,O=Example\\\\, GmbH,C=DE",
           "certificate.issuer": "CN=Example CA,O=ExampleTrust,C=US",
           "certificate.not_valid_before": TS - 86400.0,
           "certificate.not_valid_after": TS + 86400.0,
           "certificate.key_alg": "rsaEncryption",
           "certificate.sig_alg": "sha256WithRSAEncryption",
           "certificate.key_type": "rsa", "certificate.key_length": 2048,
           "certificate.exponent": "65537",
           "san.dns": ["host.example.com", "www.example.com"],
           "basic_constraints.ca": False}
    r = _run(spark, tmpdir, "x509.log", rec, "x509").selectExpr(
        "ts", "file.x509.serial_number AS serial",
        "file.x509.subject.common_name AS scn",
        "file.x509.subject.country AS sc",
        "file.x509.issuer.common_name AS icn",
        "file.x509.not_after AS na",
        "file.x509.public_key_size AS ksize",
        "file.x509.public_key_exponent AS kexp",
        "file.x509.alternative_names AS san",
        "zeek.x509.basic_constraints.certificate_authority AS ca",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.serial == "1EA2B3"
    assert r.scn == ["host.example.com"] and r.sc == ["DE"]
    assert r.icn == ["Example CA"]
    assert r.na == TS_DT + dt.timedelta(days=1)
    assert r.ksize == 2048 and r.kexp == 65537
    assert r.san == ["host.example.com", "www.example.com"]
    assert r.ca is False


def test_zeek_filename_routing(spark, tmpdir):
    # two different log files in one batch: each record lands only in
    # its filename-routed table
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    with open(raw / "conn.log", "w") as f:
        f.write(json.dumps({"ts": TS, "uid": "C1", **CONN_ID,
                            "proto": "tcp"}) + "\n")
    with open(raw / "dns.log", "w") as f:
        f.write(json.dumps({"ts": TS, "uid": "C2", **CONN_ID,
                            "proto": "udp", "query": "example.com",
                            "qtype_name": "A"}) + "\n")
    tables = run_log_source(
        spark, str(ROOT / "zeek"), str(raw / "*"),
        str(tmpdir / "lake"), quarantine_root=str(tmpdir / "q"),
    )
    assert tables["connection"].rows_out == 1
    assert tables["dns"].rows_out == 1
    assert tables["http"].rows_in == 0
