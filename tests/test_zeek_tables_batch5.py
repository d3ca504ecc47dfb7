"""End-to-end fixtures for zeek wave 5 (completing all 43 tables):
smtp, snmp, socks, software, stats, syslog, traceroute, tunnel."""

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
    d = tempfile.mkdtemp(prefix="matano_spark_zeek5_")
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


def test_zeek_smtp(spark, tmpdir):
    rec = {"ts": TS, "uid": "Csmtp1", **CONN_ID, "trans_depth": 1,
           "helo": "mail.example.com", "mailfrom": "eve@example.com",
           "rcptto": ["bob@corp.example"], "from": "\"Eve\" <eve@example.com>",
           "to": ["bob@corp.example"], "subject": "invoice",
           "msg_id": "<m1@example.com>", "last_reply": "250 OK",
           "path": ["192.0.2.6", "10.0.0.5"], "user_agent": "mutt",
           "tls": True, "fuids": ["Fsmtp1"], "is_webmail": False}
    r = _run(spark, tmpdir, "smtp.log", rec, "smtp").selectExpr(
        "ts", "network.protocol AS proto", "tls.established AS tls",
        "zeek.smtp.mail_from AS mf", "zeek.smtp.rcpt_to AS rcpt",
        "zeek.smtp.subject AS subj", "zeek.smtp.path AS path",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.proto == "smtp" and r.tls is True
    assert r.mf == "eve@example.com" and r.rcpt == ["bob@corp.example"]
    assert r.subj == "invoice"
    assert r.path == ["192.0.2.6", "10.0.0.5"]


def test_zeek_snmp(spark, tmpdir):
    rec = {"ts": TS, "uid": "Csnmp1", **CONN_ID, "duration": 0.1,
           "version": "2c", "community": "public", "get_requests": 5,
           "get_bulk_requests": 0, "get_responses": 5, "set_requests": 1,
           "display_string": "Linux router", "up_since": TS - 604800.0}
    r = _run(spark, tmpdir, "snmp.log", rec, "snmp").selectExpr(
        "ts", "network.protocol AS proto", "zeek.snmp.version AS v",
        "zeek.snmp.community AS community",
        "zeek.snmp.get.requests AS gets", "zeek.snmp.set.requests AS sets",
        "zeek.snmp.up_since AS up",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.proto == "snmp" and r.v == "2c"
    assert r.community == "public"
    assert r.gets == 5 and r.sets == 1
    assert r.up == TS_DT - dt.timedelta(days=7)


def test_zeek_socks(spark, tmpdir):
    rec = {"ts": TS, "uid": "Csocks1", **CONN_ID, "version": 5,
           "user": "proxyuser", "status": "general SOCKS server failure",
           "request.name": "blocked.example", "request_p": 443,
           "bound.host": "0.0.0.0", "bound_p": 0}
    r = _run(spark, tmpdir, "socks.log", rec, "socks").selectExpr(
        "ts", "event.outcome AS outcome", "event.type AS etype",
        "user.name AS uname", "zeek.socks.request.host AS rhost",
        "zeek.socks.request.port AS rport", "related.user AS ruser",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.outcome == "failure"
    assert r.etype == ["connection", "protocol", "error"]
    assert r.uname == "proxyuser"
    # DOMAIN-type request: host coalesces from request.name
    assert r.rhost == "blocked.example" and r.rport == 443
    assert r.ruser == ["proxyuser"]


def test_zeek_software(spark, tmpdir):
    rec = {"ts": TS, "host": "10.0.0.5", "software_type": "HTTP::BROWSER",
           "name": "Firefox", "version.major": 125, "version.minor": 0,
           "unparsed_version": "Mozilla/5.0 Firefox/125.0"}
    r = _run(spark, tmpdir, "software.log", rec, "software").selectExpr(
        "ts", "network.type AS ntype", "host.ip AS hip",
        "zeek.software.name AS name", "zeek.software.type AS stype",
        "zeek.software.version.major AS vmaj",
        "zeek.software.version.full AS vfull", "related.ip AS rip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.ntype == "ipv4" and r.hip == ["10.0.0.5"]
    assert r.name == "Firefox" and r.stype == "HTTP::BROWSER"
    assert r.vmaj == 125
    assert r.vfull == "Mozilla/5.0 Firefox/125.0"
    assert r.rip == ["10.0.0.5"]


def test_zeek_stats(spark, tmpdir):
    rec = {"ts": TS, "peer": "worker-1", "mem": 256, "pkts_proc": 10000,
           "pkts_dropped": 5, "pkts_link": 10010, "bytes_recv": 9999999,
           "tcp_conns": 100, "active_tcp_conns": 10, "events_proc": 5000,
           "events_queued": 4, "timers": 900, "active_timers": 50,
           "files": 7, "active_files": 1, "dns_requests": 42,
           "active_dns_requests": 2, "reassem_tcp_size": 1024,
           "pkt_lag": 0}
    r = _run(spark, tmpdir, "stats.log", rec, "stats").selectExpr(
        "ts", "event.kind AS kind", "zeek.stats.peer AS peer",
        "zeek.stats.memory AS mem",
        "zeek.stats.packets.processed AS pkts",
        "zeek.stats.packets.dropped AS dropped",
        "zeek.stats.connections.tcp.count AS tcp",
        "zeek.stats.dns_requests.count AS dns",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.kind == "metric"
    assert r.peer == "worker-1" and r.mem == 256
    assert r.pkts == 10000 and r.dropped == 5
    assert r.tcp == 100 and r.dns == 42


def test_zeek_syslog(spark, tmpdir):
    rec = {"ts": TS, "uid": "Csys1", **CONN_ID, "proto": "udp",
           "facility": "AUTH", "severity": "WARNING",
           "message": "pam_unix: authentication failure"}
    r = _run(spark, tmpdir, "syslog.log", rec, "syslog").selectExpr(
        "ts", "message AS msg", "network.transport AS transport",
        "log.syslog.facility.name AS fac",
        "log.syslog.severity.name AS sev", "zeek.syslog.msg AS zmsg",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.msg == "pam_unix: authentication failure"
    assert r.transport == "udp"
    assert r.fac == "AUTH" and r.sev == "WARNING"
    assert r.zmsg == r.msg


def test_zeek_traceroute(spark, tmpdir):
    rec = {"ts": TS, "src": "10.0.0.5", "dst": "203.0.113.77",
           "proto": "udp"}
    r = _run(spark, tmpdir, "traceroute.log", rec, "traceroute").selectExpr(
        "ts", "source.ip AS sip", "destination.ip AS dip",
        "network.transport AS transport", "related.ip AS rip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.sip == "10.0.0.5" and r.dip == "203.0.113.77"
    assert r.transport == "udp"
    assert set(r.rip) == {"10.0.0.5", "203.0.113.77"}


def test_zeek_tunnel(spark, tmpdir):
    rec = {"ts": TS, "uid": "Ctun1", **CONN_ID,
           "tunnel_type": "Tunnel::GRE", "action": "Tunnel::DISCOVER"}
    r = _run(spark, tmpdir, "tunnel.log", rec, "tunnel").selectExpr(
        "ts", "event.action AS act", "zeek.tunnel.type AS ttype",
        "source.ip AS sip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.act == "Tunnel::DISCOVER"
    assert r.ttype == "Tunnel::GRE"
    assert r.sip == "10.0.0.5"
