"""End-to-end fixtures for the second wave of normalized zeek tables
(ref data/managed/log_sources/zeek/tables/*.yml): one JSONL object per
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
    d = tempfile.mkdtemp(prefix="matano_spark_zeek2_")
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


def test_zeek_capture_loss(spark, tmpdir):
    rec = {"ts": TS, "ts_delta": 60.0, "peer": "worker-1",
           "gaps": 3, "acks": 1000, "percent_lost": 0.3}
    r = _run(spark, tmpdir, "capture_loss.log", rec, "capture_loss").selectExpr(
        "ts", "event.kind AS kind", "zeek.capture_loss.peer AS peer",
        "zeek.capture_loss.gaps AS gaps",
        "zeek.capture_loss.percent_lost AS pct",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.kind == "metric"
    assert r.peer == "worker-1" and r.gaps == 3 and r.pct == 0.3


def test_zeek_dce_rpc(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cdce1", **CONN_ID, "rtt": 0.001,
           "named_pipe": "\\\\pipe\\\\svcctl", "endpoint": "svcctl",
           "operation": "CreateServiceW"}
    r = _run(spark, tmpdir, "dce_rpc.log", rec, "dce_rpc").selectExpr(
        "ts", "event.action AS act", "network.protocol AS proto",
        "source.ip AS sip", "destination.port AS dport",
        "zeek.dce_rpc.endpoint AS ep", "related.ip AS rip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.act == "CreateServiceW" and r.proto == "dce_rpc"
    assert r.sip == "10.0.0.5" and r.dport == 443
    assert r.ep == "svcctl"
    assert set(r.rip) == {"10.0.0.5", "192.0.2.6"}


def test_zeek_dnp3(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cdnp1", **CONN_ID,
           "fc_request": "READ", "iin": 1}
    r = _run(spark, tmpdir, "dnp3.log", rec, "dnp3").selectExpr(
        "ts", "event.action AS act", "network.protocol AS proto",
        "zeek.dnp3.function.request AS req", "zeek.dnp3.id AS iin",
    ).collect()[0]
    assert r.ts == TS_DT
    # no reply → action falls back to the request, downcased (ref dnp3.yml)
    assert r.act == "read" and r.proto == "dnp3"
    assert r.req == "READ" and r.iin == 1


def test_zeek_dpd(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cdpd1", **CONN_ID, "proto": "tcp",
           "analyzer": "HTTP", "failure_reason": "not actually HTTP"}
    r = _run(spark, tmpdir, "dpd.log", rec, "dpd").selectExpr(
        "ts", "network.transport AS transport",
        "zeek.dpd.analyzer AS analyzer",
        "zeek.dpd.failure_reason AS why",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.transport == "tcp"
    assert r.analyzer == "HTTP" and r.why == "not actually HTTP"


def test_zeek_ftp(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cftp1", **CONN_ID, "user": "anonymous",
           "password": "guest", "command": "RETR",
           "arg": "ftp://192.0.2.6/pub/x.zip", "mime_type": "application/zip",
           "file_size": 1024, "reply_code": 226,
           "reply_msg": "Transfer complete.", "data_channel.passive": True,
           "data_channel.orig_h": "10.0.0.5",
           "data_channel.resp_h": "192.0.2.6", "data_channel.resp_p": 20123,
           "fuid": "Fftp1"}
    r = _run(spark, tmpdir, "ftp.log", rec, "ftp").selectExpr(
        "ts", "event.action AS act", "user.name AS uname",
        "file.size AS fsize", "file.mime_type AS mime",
        "zeek.ftp.reply.code AS rcode",
        "zeek.ftp.data_channel.response_port AS dcp",
        "related.user AS ruser",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.act == "RETR" and r.uname == "anonymous"
    assert r.fsize == 1024 and r.mime == "application/zip"
    assert r.rcode == 226 and r.dcp == 20123
    assert r.ruser == ["anonymous"]


def test_zeek_intel(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cintel1", **CONN_ID,
           "seen.indicator": "198.51.100.9",
           "seen.indicator_type": "Intel::ADDR",
           "seen.where": "Conn::IN_RESP", "seen.node": "worker-1",
           "matched": ["Intel::ADDR"], "sources": ["feed-a"]}
    r = _run(spark, tmpdir, "intel.log", rec, "intel").selectExpr(
        "ts", "event.kind AS kind", "threat.indicator.ip AS tip",
        "threat.indicator.type AS ttype",
        "zeek.intel.seen.where AS see_where",
        "zeek.intel.sources AS sources",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.kind == "enrichment"
    assert r.tip == "198.51.100.9" and r.ttype == "ipv4-addr"
    assert r.see_where == "Conn::IN_RESP"
    assert r.sources == ["feed-a"]


def test_zeek_intel_url_indicator(spark, tmpdir):
    rec = {"ts": TS, "uid": "Cintel2", **CONN_ID,
           "seen.indicator": "http://evil.example/p",
           "seen.indicator_type": "Intel::URL"}
    r = _run(spark, tmpdir, "intel.log", rec, "intel").selectExpr(
        "threat.indicator.type AS ttype",
        "threat.indicator.url.original AS turl",
    ).collect()[0]
    assert r.ttype == "url"
    assert r.turl == "http://evil.example/p"


def test_zeek_irc(spark, tmpdir):
    rec = {"ts": TS, "uid": "Circ1", **CONN_ID, "nick": "badnick",
           "user": "spamuser", "command": "DCC SEND",
           "value": "x.exe", "addl": "size 9000",
           "dcc_file_name": "x.exe", "dcc_file_size": 9000,
           "dcc_mime_type": "application/x-dosexec", "fuid": "Firc1"}
    r = _run(spark, tmpdir, "irc.log", rec, "irc").selectExpr(
        "ts", "event.action AS act", "user.name AS uname",
        "file.name AS fname", "file.size AS fsize",
        "zeek.irc.nick AS nick", "related.user AS ruser",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.act == "DCC SEND" and r.uname == "spamuser"
    assert r.fname == "x.exe" and r.fsize == 9000
    assert r.nick == "badnick"
    assert r.ruser == ["spamuser"]


def test_zeek_dhcp(spark, tmpdir):
    rec = {"ts": TS, "uids": ["C1", "C2"], "client_addr": "10.0.0.7",
           "server_addr": "10.0.0.1", "mac": "aa:bb:cc:dd:ee:ff",
           "host_name": "laptop-7", "domain": "corp.example",
           "requested_addr": "10.0.0.7", "assigned_addr": "10.0.0.7",
           "lease_time": 86400.0, "msg_types": ["DISCOVER", "OFFER",
           "REQUEST", "ACK"], "duration": 0.21}
    r = _run(spark, tmpdir, "dhcp.log", rec, "dhcp").selectExpr(
        "ts", "source.ip AS sip", "destination.ip AS dip",
        "source.port AS sport", "destination.port AS dport",
        "network.name AS nname", "event.id AS eid",
        "zeek.dhcp.address.mac AS mac", "zeek.dhcp.hostname AS host",
        "zeek.dhcp.msg.types AS mtypes", "related.ip AS rip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.sip == "10.0.0.7" and r.dip == "10.0.0.1"
    # defaults when ports absent (ref dhcp.yml:144-150)
    assert r.sport == 68 and r.dport == 67
    assert r.nname == "corp.example"
    assert r.eid == "C1,C2"
    assert r.mac == "aa:bb:cc:dd:ee:ff" and r.host == "laptop-7"
    assert r.mtypes == ["DISCOVER", "OFFER", "REQUEST", "ACK"]
    assert set(r.rip) == {"10.0.0.7", "10.0.0.1"}
