"""End-to-end fixtures for zeek wave 3: known_*, modbus, mysql, ntlm,
ntp, ocsp (ref data/managed/log_sources/zeek/tables/*.yml)."""

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
    d = tempfile.mkdtemp(prefix="matano_spark_zeek3_")
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


def test_zeek_known_certs(spark, tmpdir):
    rec = {"ts": TS, "host": "192.0.2.6", "port_num": 443,
           "subject": "CN=shop.example.com,O=Shop\\\\, Inc.,C=DE",
           "issuer_subject": "CN=Example CA,O=ExampleTrust,C=US",
           "serial": "1EA2B3"}
    r = _run(spark, tmpdir, "known_certs.log", rec, "known_certs").selectExpr(
        "ts", "server.ip AS sip", "server.port AS sport",
        "network.type AS ntype", "host.ip AS hip",
        "tls.server.x509.serial_number AS serial",
        "tls.server.x509.subject.common_name AS scn",
        "tls.server.x509.issuer.common_name AS icn",
        "related.ip AS rip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.sip == "192.0.2.6" and r.sport == 443
    assert r.ntype == "ipv4" and r.hip == ["192.0.2.6"]
    assert r.serial == "1EA2B3"
    assert r.scn == ["shop.example.com"] and r.icn == ["Example CA"]
    assert r.rip == ["192.0.2.6"]


def test_zeek_known_hosts(spark, tmpdir):
    rec = {"ts": TS, "host": "2001:db8::1"}
    r = _run(spark, tmpdir, "known_hosts.log", rec, "known_hosts").selectExpr(
        "ts", "network.type AS ntype", "host.ip AS hip", "related.ip AS rip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.ntype == "ipv6"
    assert r.hip == ["2001:db8::1"] and r.rip == ["2001:db8::1"]


def test_zeek_known_services(spark, tmpdir):
    rec = {"ts": TS, "host": "10.0.0.9", "port_num": 22,
           "port_proto": "tcp", "service": ["SSH"]}
    r = _run(spark, tmpdir, "known_services.log", rec,
             "known_services").selectExpr(
        "ts", "server.ip AS sip", "server.port AS sport",
        "network.transport AS transport", "network.application AS app",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.sip == "10.0.0.9" and r.sport == 22
    assert r.transport == "tcp" and r.app == "ssh"


def test_zeek_modbus(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cmod1", **CONN_ID,
           "func": "WRITE_SINGLE_COIL", "exception": "ILLEGAL_ADDRESS"}
    r = _run(spark, tmpdir, "modbus.log", rec, "modbus").selectExpr(
        "ts", "event.action AS act", "event.outcome AS outcome",
        "network.protocol AS proto", "zeek.modbus.exception AS exc",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.act == "WRITE_SINGLE_COIL"
    assert r.outcome == "failure"
    assert r.proto == "modbus" and r.exc == "ILLEGAL_ADDRESS"


def test_zeek_mysql(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cmys1", **CONN_ID, "cmd": "drop_db",
           "arg": "prod", "success": True, "rows": 0}
    r = _run(spark, tmpdir, "mysql.log", rec, "mysql").selectExpr(
        "ts", "event.action AS act", "event.outcome AS outcome",
        "event.type AS etype", "zeek.mysql.arg AS arg",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.act == "drop_db" and r.outcome == "success"
    # ref mysql.yml cmd dispatch: destructive commands add "change"
    assert r.etype == ["connection", "protocol", "change"]
    assert r.arg == "prod"


def test_zeek_ntlm(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cntlm1", **CONN_ID, "username": "bob",
           "hostname": "WS01", "domainname": "CORP",
           "server_nb_computer_name": "DC01",
           "server_dns_computer_name": "dc01.corp.example",
           "server_tree_name": "corp.example", "success": False}
    r = _run(spark, tmpdir, "ntlm.log", rec, "ntlm").selectExpr(
        "ts", "user.name AS uname", "user.domain AS udom",
        "event.outcome AS outcome",
        "zeek.ntlm.server.name.dns AS sdns", "related.user AS ruser",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.uname == "bob" and r.udom == "CORP"
    assert r.outcome == "failure"
    assert r.sdns == "dc01.corp.example"
    assert r.ruser == ["bob"]


def test_zeek_ntp(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cntp1", **CONN_ID, "version": 4, "mode": 3,
           "stratum": 2, "poll": 64.0, "precision": 9.5e-07,
           "root_delay": 0.01, "root_disp": 0.02, "ref_id": "GPS",
           "ref_time": TS - 10.0, "org_time": TS - 1.0,
           "rec_time": TS - 0.5, "xmt_time": TS - 0.2, "num_exts": 0}
    r = _run(spark, tmpdir, "ntp.log", rec, "ntp").selectExpr(
        "ts", "network.protocol AS proto", "network.type AS ntype",
        "zeek.ntp.version AS v", "zeek.ntp.stratum AS stratum",
        "zeek.ntp.ref_time AS rt",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.proto == "ntp" and r.ntype == "ipv4"
    assert r.v == 4 and r.stratum == 2
    assert r.rt == TS_DT - dt.timedelta(seconds=10)


def test_zeek_ocsp(spark, tmpdir):
    rec = {"ts": TS, "id": "Focsp1", "hashAlgorithm": "sha1",
           "issuerNameHash": "a1b2", "issuerKeyHash": "c3d4",
           "serialNumber": "05F1", "certStatus": "revoked",
           "revoketime": TS - 86400.0, "revokereason": "keyCompromise",
           "thisUpdate": TS - 3600.0, "nextUpdate": TS + 3600.0}
    r = _run(spark, tmpdir, "ocsp.log", rec, "ocsp").selectExpr(
        "ts", "zeek.ocsp.status AS status",
        "zeek.ocsp.revoke.date AS rdate",
        "zeek.ocsp.revoke.reason AS rreason",
        "zeek.ocsp.update.next AS nxt", "related.hash AS rhash",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.status == "revoked"
    assert r.rdate == TS_DT - dt.timedelta(days=1)
    assert r.rreason == "keyCompromise"
    assert r.nxt == TS_DT + dt.timedelta(hours=1)
    assert set(r.rhash) == {"a1b2", "c3d4"}
