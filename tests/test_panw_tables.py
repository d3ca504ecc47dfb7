"""End-to-end fixtures for panw globalprotect and threat (ref
data/managed/log_sources/panw/tables/{globalprotect,threat}.yml):
PAN-OS syslog CSV lines through run_log_source with per-table abort
routing on the log type field."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
from pathlib import Path

import pytest

from matano_spark.pipeline import run_log_source

ROOT = Path(__file__).resolve().parents[1] / "data" / "log_sources"
TS_DT = dt.datetime(2024, 5, 1, 10, 0)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="matano_spark_panw_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, tmpdir, lines, table):
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    with open(raw / "objects.log", "w") as f:
        for line in lines:
            f.write(line + "\n")
    tables = run_log_source(
        spark, str(ROOT / "panw"), str(raw / "*.log"),
        str(tmpdir / "lake"), quarantine_root=str(tmpdir / "q"),
    )
    return tables[table]


def _gp_line():
    # header: fu,created,serial,TYPE,subtype,configver,generated_time,
    # then the 42-field globalprotect CSV tail
    tail = [""] * 42
    tail[0] = "vsys1"
    tail[1] = "gateway-auth"          # event id
    tail[2] = "login"                 # stage
    tail[3] = "LDAP"                  # auth method
    tail[4] = "SSL"                   # tunnel type
    tail[5] = "EXAMPLE\\alice"        # srcuser
    tail[6] = "DE"                    # srcloc
    tail[7] = "LAPTOP-7"              # machine name
    tail[8] = "203.0.113.77"          # public ip
    tail[10] = "10.10.1.5"            # private ip
    tail[12] = "host-1"               # host id
    tail[15] = "Windows"              # client os
    tail[16] = "Microsoft Windows 11" # os version
    tail[17] = "1"                    # repeat count
    tail[18] = "auth-success"         # event reason
    tail[21] = "success"              # event status
    tail[22] = "Germany"              # location
    tail[23] = "0"                    # login duration
    tail[26] = "portal1"              # portal
    tail[34] = "gw-fra"               # gateway
    tail[40] = "fw-01"                # device name
    return "1,2024/05/01 10:00:00,SN7,GLOBALPROTECT,,1,2024/05/01 10:00:00," + ",".join(tail)


def test_panw_globalprotect(spark, tmpdir):
    res = _run(spark, tmpdir, [_gp_line()], "globalprotect")
    assert res.rows_sidelined == 0 and res.rows_out == 1
    r = res.read().selectExpr(
        "ts", "event.code AS code", "event.outcome AS outcome",
        "source.ip AS sip", "source.nat.ip AS snat",
        "host.name AS hname", "host.os.family AS osf",
        "user.name AS uname", "user.domain AS udom",
        "observer.hostname AS obs", "panw.panos.gateway AS gw",
        "panw.panos.portal AS portal", "related.ip AS rip",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.code == "gateway-auth"
    assert r.outcome == "success"
    assert r.sip == "10.10.1.5" and r.snat == "203.0.113.77"
    assert r.hname == "LAPTOP-7" and r.osf == "Windows"
    assert r.uname == "alice" and r.udom == "EXAMPLE"
    assert r.obs == "fw-01"
    assert r.gw == "gw-fra" and r.portal == "portal1"
    assert r.rip == ["10.10.1.5"]


def _threat_line():
    tail = [""] * 114
    tail[0] = "198.51.100.8"          # src ip
    tail[1] = "192.0.2.9"             # dst ip
    tail[4] = "block-threats"         # rule
    tail[5] = "EXAMPLE\\bob"          # srcuser
    tail[7] = "web-browsing"          # app
    tail[9] = "untrust"               # src zone
    tail[10] = "trust"                # dst zone
    tail[17] = "50123"                # sport
    tail[18] = "443"                  # dport
    tail[22] = "tcp"                  # proto
    tail[23] = "reset-both"           # action
    tail[24] = "malware.example.net/evil?x=1"  # misc (url)
    tail[25] = "Virus/Win32"          # threat name
    tail[26] = "malware"              # url category
    tail[27] = "critical"             # severity
    tail[28] = "0"                    # direction
    tail[52] = "fw-01"                # device name
    tail[56] = "GET"                  # http method
    tail[62] = "spyware"              # threat category
    tail[69] = "u-1"                  # rule uuid
    return "1,2024/05/01 10:00:00,SN7,THREAT,url,1,2024/05/01 10:00:00," + ",".join(tail)


def test_panw_threat(spark, tmpdir):
    res = _run(spark, tmpdir, [_threat_line()], "threat")
    assert res.rows_sidelined == 0 and res.rows_out == 1
    r = res.read().selectExpr(
        "ts", "event.kind AS kind", "event.outcome AS outcome",
        "event.category AS cat", "network.direction AS dir",
        "source.ip AS sip", "destination.ip AS dip",
        "destination.port AS dport", "network.transport AS transport",
        "log.level AS lvl", "http.request.method AS method",
        "url.original AS uorig", "url.domain AS udom", "url.path AS upath",
        "url.query AS uq", "user.name AS uname",
        "panw.panos.threat.name AS tname",
        "panw.panos.threat_category AS tcat", "rule.uuid AS ruuid",
        "related.hosts AS rh",
    ).collect()[0]
    assert r.ts == TS_DT
    assert r.kind == "alert"
    assert r.outcome == "failure"  # reset-both not in allow-list
    assert {"intrusion_detection", "threat", "network"} <= set(r.cat)
    assert r.dir == "inbound"
    assert r.sip == "198.51.100.8" and r.dip == "192.0.2.9"
    assert r.dport == 443 and r.transport == "tcp"
    assert r.lvl == "critical"
    assert r.method == "GET"
    assert r.uorig == "malware.example.net/evil?x=1"
    assert r.udom == "malware.example.net"
    assert r.upath == "/evil" and r.uq == "x=1"
    assert r.uname == "bob"
    assert r.tname == "Virus/Win32" and r.tcat == "spyware"
    assert r.ruuid == "u-1"
    assert r.rh == ["malware.example.net"]


def test_panw_routing_by_type(spark, tmpdir):
    # one line of each type: each table keeps only its own
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    with open(raw / "objects.log", "w") as f:
        f.write(_gp_line() + "\n")
        f.write(_threat_line() + "\n")
    tables = run_log_source(
        spark, str(ROOT / "panw"), str(raw / "*.log"),
        str(tmpdir / "lake"), quarantine_root=str(tmpdir / "q"),
    )
    assert tables["globalprotect"].rows_out == 1
    assert tables["threat"].rows_out == 1
    assert tables["traffic"].rows_in == 0
