"""End-to-end fixtures for zeek wave 4: pe, radius, rdp, rfb,
signature, sip, smb_cmd, smb_mapping."""

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
    d = tempfile.mkdtemp(prefix="matano_spark_zeek4_")
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


def test_zeek_pe(spark, tmpdir):
    rec = {"ts": TS, "id": "Fpe1", "machine": "AMD64",
           "compile_ts": TS - 864000.0, "os": "Windows XP x64 or Server 2003",
           "subsystem": "WINDOWS_GUI", "is_exe": True, "is_64bit": True,
           "uses_aslr": False, "uses_dep": True, "uses_code_integrity": False,
           "uses_seh": True, "has_import_table": True,
           "has_export_table": False, "has_cert_table": False,
           "has_debug_data": True, "section_names": [".text", ".rdata"]}
    r = _run(spark, tmpdir, "pe.log", rec, "pe").selectExpr(
        "ts", "event.category AS cat", "zeek.pe.machine AS machine",
        "zeek.pe.compile_time AS ctime", "zeek.pe.uses_aslr AS aslr",
        "zeek.pe.section_names AS sections",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.cat == ["file"]
    assert r.machine == "AMD64"
    assert r.ctime == TS_DT - dt.timedelta(days=10)
    assert r.aslr is False
    assert r.sections == [".text", ".rdata"]


def test_zeek_radius(spark, tmpdir):
    rec = {"ts": TS, "uid": "Crad1", **CONN_ID, "username": "carol",
           "mac": "aa:bb:cc:00:11:22", "framed_addr": "10.0.1.50",
           "result": "success", "ttl": 2, "logged": True}
    r = _run(spark, tmpdir, "radius.log", rec, "radius").selectExpr(
        "ts", "user.name AS uname", "event.outcome AS outcome",
        "network.protocol AS proto", "zeek.radius.mac AS mac",
        "related.user AS ruser",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.uname == "carol" and r.outcome == "success"
    assert r.proto == "radius" and r.mac == "aa:bb:cc:00:11:22"
    assert r.ruser == ["carol"]


def test_zeek_rdp(spark, tmpdir):
    rec = {"ts": TS, "uid": "Crdp1", **CONN_ID, "cookie": "user1",
           "result": "encrypted", "security_protocol": "HYBRID",
           "client_build": "19041", "client_name": "WS02",
           "desktop_width": 1920, "desktop_height": 1080,
           "requested_color_depth": "32bit", "cert_type": "X.509",
           "cert_count": 1, "cert_permanent": True,
           "encryption_level": "High", "encryption_method": "SSL",
           "ssl": True}
    r = _run(spark, tmpdir, "rdp.log", rec, "rdp").selectExpr(
        "ts", "network.protocol AS proto", "tls.established AS tls",
        "zeek.rdp.client.build AS build", "zeek.rdp.desktop.width AS w",
        "zeek.rdp.security_protocol AS sec",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.proto == "rdp" and r.tls is True
    assert r.build == "19041" and r.w == 1920
    assert r.sec == "HYBRID"


def test_zeek_rfb(spark, tmpdir):
    rec = {"ts": TS, "uid": "Crfb1", **CONN_ID,
           "client_major_version": "003", "client_minor_version": "008",
           "server_major_version": "003", "server_minor_version": "008",
           "auth": True, "authentication_method": "VNC",
           "share_flag": False, "desktop_name": "ops-vnc",
           "width": 1280, "height": 800}
    r = _run(spark, tmpdir, "rfb.log", rec, "rfb").selectExpr(
        "ts", "network.protocol AS proto",
        "zeek.rfb.auth.success AS auth_ok",
        "zeek.rfb.auth.method AS method",
        "zeek.rfb.desktop_name AS desk", "zeek.rfb.width AS w",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.proto == "rfb"
    assert r.auth_ok is True and r.method == "VNC"
    assert r.desk == "ops-vnc" and r.w == 1280


def test_zeek_signature(spark, tmpdir):
    rec = {"ts": TS, "uid": "Csig1", "src_addr": "10.0.0.5",
           "src_port": 54321, "dst_addr": "192.0.2.6", "dst_port": 80,
           "note": "Signatures::Sensitive_Signature",
           "sig_id": "sid-1000", "event_msg": "10.0.0.5: caught by sig",
           "sub_msg": "GET /etc/passwd", "sig_count": 1, "host_count": 1}
    r = _run(spark, tmpdir, "signature.log", rec, "signature").selectExpr(
        "ts", "event.kind AS kind", "rule.id AS rid",
        "rule.description AS rdesc", "network.type AS ntype",
        "source.ip AS sip", "related.ip AS rip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.kind == "alert"
    assert r.rid == "sid-1000"
    assert r.rdesc == "10.0.0.5: caught by sig"
    assert r.ntype == "ipv4"
    assert r.sip == "10.0.0.5"
    assert set(r.rip) == {"10.0.0.5", "192.0.2.6"}


def test_zeek_sip(spark, tmpdir):
    rec = {"ts": TS, "uid": "Csip1", **CONN_ID, "trans_depth": 0,
           "method": "REGISTER", "uri": "sip:pbx.example.com",
           "request_from": "alice <sip:alice@example.com>",
           "request_to": "alice <sip:alice@example.com>",
           "response_from": "alice <sip:alice@example.com>",
           "response_to": "alice <sip:alice@example.com>",
           "call_id": "c-77", "seq": "1 REGISTER",
           "user_agent": "softphone/1.0", "status_code": 401,
           "status_msg": "Unauthorized"}
    r = _run(spark, tmpdir, "sip.log", rec, "sip").selectExpr(
        "ts", "event.action AS act", "event.outcome AS outcome",
        "event.type AS etype", "url.full AS url",
        "zeek.sip.status.code AS code", "zeek.sip.call_id AS cid",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.act == "REGISTER"
    # 4xx → failure + error event.type (ref sip.yml)
    assert r.outcome == "failure"
    assert r.etype == ["connection", "protocol", "error"]
    assert r.url == "sip:pbx.example.com"
    assert r.code == 401 and r.cid == "c-77"


def test_zeek_smb_cmd(spark, tmpdir):
    rec = {"ts": TS, "uid": "Csmbc1", **CONN_ID,
           "command": "NT_CREATE_ANDX", "argument": "\\\\srv\\share\\x.txt",
           "status": "SUCCESS", "rtt": 0.002, "version": "SMB2",
           "username": "dave", "tree": "\\\\srv\\share",
           "tree_service": "DISK",
           "referenced_file.uid": "Fsmb1",
           "referenced_file.id.orig_h": "10.0.0.5",
           "referenced_file.id.resp_h": "192.0.2.6",
           "referenced_file.name": "x.txt",
           "referenced_file.action": "SMB::FILE_OPEN"}
    r = _run(spark, tmpdir, "smb_cmd.log", rec, "smb_cmd").selectExpr(
        "ts", "event.action AS act", "event.outcome AS outcome",
        "user.name AS uname", "zeek.smb_cmd.file.name AS fname",
        "zeek.smb_cmd.file.host.tx AS tx", "zeek.smb_cmd.tree AS tree",
        "related.user AS ruser",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.act == "NT_CREATE_ANDX" and r.outcome == "success"
    assert r.uname == "dave"
    assert r.fname == "x.txt" and r.tx == "10.0.0.5"
    assert r.tree == "\\\\srv\\share"
    assert r.ruser == ["dave"]


def test_zeek_smb_mapping(spark, tmpdir):
    rec = {"ts": TS, "uid": "Csmbm1", **CONN_ID,
           "path": "\\\\srv\\IPC$", "service": "IPC",
           "native_file_system": "NTFS", "share_type": "PIPE"}
    r = _run(spark, tmpdir, "smb_mapping.log", rec, "smb_mapping").selectExpr(
        "ts", "file.path AS fpath", "network.protocol AS proto",
        "zeek.smb_mapping.share_type AS stype",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.fpath == "\\\\srv\\IPC$"
    assert r.proto == "smb"
    assert r.stype == "PIPE"
