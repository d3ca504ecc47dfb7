"""The five managed enrichment packs (ref data/managed/enrichment/*)
through EnrichmentStore: transform fidelity, write modes, and the J1
broadcast lookup over landed content."""

from __future__ import annotations

import datetime as dt
import json
import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from matano_spark.operators.enrichment import EnrichmentStore, enrich, sync_enrichment

ROOT = Path(__file__).resolve().parents[1] / "data" / "enrichment"


@pytest.fixture()
def store(spark):
    d = tempfile.mkdtemp(prefix="matano_spark_enrich_")
    yield EnrichmentStore(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def _raw(spark, records):
    return spark.createDataFrame(
        [(json.dumps(r),) for r in records], ["json"]
    )


KEV = {
    "cveID": "CVE-2021-44228", "vendorProject": "Apache", "product": "Log4j",
    "vulnerabilityName": "Log4Shell",
    "dateAdded": "2021-12-10", "shortDescription": "JNDI RCE",
    "requiredAction": "Patch", "dueDate": "2021-12-24",
}


def test_cisa_kev_pack(spark, store):
    out = sync_enrichment(store, str(ROOT / "cisa_kev"), _raw(spark, [KEV]))
    r = out.selectExpr(
        "event.kind AS kind", "event.category AS cat",
        "vulnerability.id AS vid", "vulnerability.category AS vcat",
        "vulnerability.enumeration AS venum",
        "vulnerability.description AS vdesc",
        "cisa_kev.requiredAction AS act",
    ).collect()[0]
    assert r.kind == "enrichment" and r.cat == ["vulnerability"]
    assert r.vid == "CVE-2021-44228"
    assert r.vcat == ["Log4j", "Apache"]
    assert r.venum == "CVE"
    assert r.vdesc == "JNDI RCE"
    assert r.act == "Patch"

    # overwrite mode: second sync replaces the table
    kev2 = dict(KEV, cveID="CVE-2024-0001")
    out = sync_enrichment(store, str(ROOT / "cisa_kev"), _raw(spark, [kev2]))
    assert [x.vid for x in out.selectExpr("vulnerability.id AS vid").collect()] == [
        "CVE-2024-0001"
    ]


def test_cisa_kev_lookup_j1(spark, store):
    sync_enrichment(store, str(ROOT / "cisa_kev"), _raw(spark, [KEV]))
    kev = store.read("cisa_kev")
    events = spark.createDataFrame(
        [("e1", "CVE-2021-44228"), ("e2", "CVE-0000-0000")],
        ["event_id", "cve"],
    )
    flat = kev.selectExpr(
        "vulnerability.id AS vuln_id",
        "vulnerability.description AS vuln_desc",
        "cisa_kev.requiredAction AS required_action",
    )
    out = enrich(events, flat, on={"cve": "vuln_id"},
                 select=["vuln_desc", "required_action"], target="kev")
    rows = {r.event_id: r for r in out.collect()}
    assert rows["e1"].kev.vuln_desc == "JNDI RCE"
    assert rows["e1"].kev.required_action == "Patch"
    assert rows["e2"].kev is None


def test_malwarebazaar_merge_mode(spark, store):
    rec = {
        "first_seen": "2024-05-01 10:00:00", "file_name": "mal.exe",
        "file_type_mime": "application/x-dosexec", "file_type": "exe",
        "file_size": 1234, "reporter": "abuse_ch", "origin_country": "US",
        "signature": "AgentTesla",
        "md5_hash": "9e107d9d372bb6826bd81d3542a419d6",
        "sha256_hash": "2c26b46b68ffc68ff99b453c1d30413413422d706483bfa0f98a5e886266e7ae",
    }
    out = sync_enrichment(
        store, str(ROOT / "abusech_malwarebazaar"), _raw(spark, [rec])
    )
    r = out.selectExpr(
        "threat.indicator.type AS itype",
        "threat.indicator.file.hash.md5 AS md5",
        "threat.indicator.file.name AS fname",
        "threat.software.alias AS alias", "related.hash AS rhash",
    ).collect()[0]
    assert r.itype == "file"
    assert r.md5 == "9e107d9d372bb6826bd81d3542a419d6"
    assert r.fname == "mal.exe"
    assert r.alias == ["AgentTesla"]
    assert len(r.rhash) == 2

    # merge mode: same md5 updates in place, new md5 adds a row
    rec2 = dict(rec, file_name="mal-v2.exe")
    rec3 = dict(rec, md5_hash="aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
                file_name="other.bin")
    out = sync_enrichment(
        store, str(ROOT / "abusech_malwarebazaar"), _raw(spark, [rec2, rec3])
    )
    rows = {
        r.md5: r.fname
        for r in out.selectExpr(
            "threat.indicator.file.hash.md5 AS md5",
            "threat.indicator.file.name AS fname",
        ).collect()
    }
    assert rows == {
        "9e107d9d372bb6826bd81d3542a419d6": "mal-v2.exe",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa": "other.bin",
    }


def test_threatfox_ioc_dispatch(spark, store):
    recs = [
        {"id": "t1", "ioc": "203.0.113.9:4444", "ioc_type": "ip:port",
         "ioc_type_desc": "C2 server", "malware_printable": "Cobalt Strike",
         "malware_alias": "cs,beacon", "confidence_level": 90,
         "first_seen_utc": "2024-05-01 10:00:00 UTC", "reporter": "r1"},
        {"id": "t2", "ioc": "9e107d9d372bb6826bd81d3542a419d6",
         "ioc_type": "md5_hash", "ioc_type_desc": "payload",
         "confidence_level": 40, "reporter": "r2"},
    ]
    out = sync_enrichment(
        store, str(ROOT / "abusech_threatfox"), _raw(spark, recs)
    )
    rows = {r.eid: r for r in out.selectExpr(
        "event.id AS eid", "threat.indicator.type AS itype",
        "threat.indicator.ip AS ip", "threat.indicator.port AS port",
        "threat.indicator.confidence AS conf",
        "threat.indicator.file.hash.md5 AS md5",
        "threat.software.alias AS alias",
        "threat.indicator.first_seen AS fs",
    ).collect()}
    t1 = rows["t1"]
    assert t1.itype == "ipv4-addr" and t1.ip == "203.0.113.9" and t1.port == 4444
    assert t1.conf == "High"
    assert t1.alias == ["cs", "beacon"]
    assert t1.fs == dt.datetime(2024, 5, 1, 10, 0)
    t2 = rows["t2"]
    assert t2.itype == "file" and t2.md5 == "9e107d9d372bb6826bd81d3542a419d6"
    assert t2.conf == "Medium"


def test_urlhaus_url_split(spark, store):
    rec = {"id": "u1", "dateadded": "2024-05-01 10:00:00",
           "url": "http://bad.example.net/drop/a.exe?x=1",
           "url_status": "online", "last_online": "2024-05-02 04:XX:XX",
           "threat": "malware_download",
           "urlhaus_link": "https://urlhaus.abuse.ch/url/1/",
           "reporter": "r1"}
    out = sync_enrichment(
        store, str(ROOT / "abusech_urlhaus"), _raw(spark, [rec])
    )
    r = out.selectExpr(
        "threat.indicator.type AS itype",
        "threat.indicator.url.domain AS udom",
        "threat.indicator.url.path AS upath",
        "threat.indicator.url.query AS uq",
        "threat.indicator.last_seen AS ls",
        "abusech.url.threat AS threat",
    ).collect()[0]
    assert r.itype == "url"
    assert r.udom == "bad.example.net" and r.upath == "/drop/a.exe"
    assert r.uq == "x=1"
    assert r.ls == dt.datetime(2024, 5, 2, 4, 0)
    assert r.threat == "malware_download"


def test_otx_append_mode(spark, store):
    rec = {"id": 7, "indicator": "203.0.113.70", "type": "IPv4",
           "description": "scanner", "created": "2024-05-01T10:00:00",
           "modified": "2024-05-01T11:00:00", "tlp": "green",
           "tags": ["scan"], "attack_ids": ["T1046"]}
    out = sync_enrichment(store, str(ROOT / "otx"), _raw(spark, [rec]))
    r = out.selectExpr(
        "event.id AS eid", "threat.indicator.type AS itype",
        "threat.indicator.ip AS ip",
        "threat.indicator.marking.tlp AS tlp",
        "threat.technique.id AS tid", "tags",
    ).collect()[0]
    assert r.eid == "7"
    assert r.itype == "ipv4-addr" and r.ip == "203.0.113.70"
    assert r.tlp == "GREEN"
    assert r.tid == ["T1046"]
    assert r.tags == ["scan"]

    rec2 = dict(rec, id=8, indicator="evil.example.org", type="domain")
    out = sync_enrichment(store, str(ROOT / "otx"), _raw(spark, [rec2]))
    assert out.count() == 2  # append mode accumulates
    doms = out.selectExpr("threat.indicator.url.domain AS d").collect()
    assert {x.d for x in doms} == {None, "evil.example.org"}
