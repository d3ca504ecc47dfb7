"""Golden end-to-end fixtures for the ported managed log sources: one
realistic raw record per source through run_log_source, asserting the
core ECS normalization (ts, event.*, identity, network) and the vendor
namespace fields."""

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
    d = tempfile.mkdtemp(prefix="matano_spark_ported_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _run_one(spark, tmpdir, source: str, records: list[dict], table: str):
    raw = tmpdir / "raw"
    raw.mkdir(exist_ok=True)
    with open(raw / "objects.json", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    tables = run_log_source(
        spark, str(ROOT / source), str(raw / "*.json"), str(tmpdir / "lake"),
        quarantine_root=str(tmpdir / "q"),
    )
    res = tables[table]
    assert res.rows_sidelined == 0, "no quarantined rows expected"
    return res.read()


OKTA_RECORD = {
    "published": "2024-05-01T10:00:00.000Z",
    "eventType": "user.session.start",
    "displayMessage": "User login to Okta",
    "uuid": "a0-b1",
    "version": "0",
    "severity": "INFO",
    "actor": {
        "id": "00u1", "type": "User",
        "alternateId": "alice@example.com", "displayName": "Alice A",
    },
    "client": {
        "device": "Computer", "id": None, "ipAddress": "203.0.113.9",
        "zone": "null",
        "userAgent": {
            "browser": "CHROME", "os": "Mac OS X",
            "rawUserAgent": "Mozilla/5.0",
        },
        "geographicalContext": {
            "city": "Berlin", "state": "Berlin", "country": "Germany",
            "postalCode": "10115",
        },
    },
    "outcome": {"result": "SUCCESS", "reason": None},
    "transaction": {"id": "tx1", "type": "WEB"},
    "authenticationContext": {
        "authenticationStep": 0, "externalSessionId": "s1",
    },
    "securityContext": {
        "asNumber": 64500, "asOrg": "ExampleNet", "domain": "example.net",
        "isProxy": False, "isp": "example",
    },
    "debugContext": {"debugData": {"requestId": "r1", "requestUri": "/login"}},
}


def test_okta_system_end_to_end(spark, tmpdir):
    lake = _run_one(spark, tmpdir, "okta", [OKTA_RECORD], "system")
    lake.createOrReplaceTempView("okta_system")
    r = spark.sql(
        """SELECT ts, event.action AS action, event.outcome AS outcome,
                  event.category AS category, event.type AS etype,
                  source.ip AS sip, user.name AS uname, user.email AS email,
                  client.as.number AS asn, client.geo.city_name AS city,
                  okta.event_type AS okta_et, okta.actor.id AS actor_id,
                  okta.security_context.is_proxy AS is_proxy,
                  user_agent.original AS ua,
                  related.ip AS rip, related.user AS ruser
           FROM okta_system"""
    ).collect()[0]
    assert r.ts == dt.datetime(2024, 5, 1, 10, 0)
    assert r.action == "user.session.start"
    assert r.outcome == "success"
    assert set(r.category) == {"authentication", "session"}
    assert {"start", "user"} <= set(r.etype)
    assert r.sip == "203.0.113.9"
    assert r.uname == "alice@example.com"
    assert r.email == "alice@example.com"
    assert r.asn == 64500
    assert r.city == "Berlin"
    assert r.okta_et == "user.session.start"
    assert r.actor_id == "00u1"
    assert r.is_proxy is False
    assert r.ua == "Mozilla/5.0"
    assert r.rip == ["203.0.113.9"]
    assert r.ruser == ["alice@example.com"]
