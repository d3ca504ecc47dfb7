"""Enrichment write modes + lookup joins (FIXTURES B6) and source
readers/routing (FIXTURES B2-B5, B9)."""

from __future__ import annotations

import gzip
import json
import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from matano_spark.operators.enrichment import EnrichmentStore, enrich
from matano_spark.sources import readers


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="matano_spark_es_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


KEV = [
    ("CVE-2021-44228", "Apache", "Log4j"),
    ("CVE-2023-1234", "VendorX", "ProdY"),
]


def test_enrichment_write_modes_and_lookup(spark, tmpdir):
    store = EnrichmentStore(spark, str(tmpdir))
    kev = spark.createDataFrame(KEV, ["cve_id", "vendor", "product"])
    store.write("cisa_kev", kev, mode="overwrite")

    # merge mode: new generation for one key, one new key (upsert, J4)
    gen2 = spark.createDataFrame(
        [("CVE-2021-44228", "Apache", "Log4j2"), ("CVE-2024-9999", "New", "Thing")],
        ["cve_id", "vendor", "product"],
    )
    store.write("cisa_kev", gen2, mode="merge", primary_key="cve_id")
    rows = {r.cve_id: r.product for r in store.read("cisa_kev").collect()}
    assert rows == {
        "CVE-2021-44228": "Log4j2",  # updated
        "CVE-2023-1234": "ProdY",  # untouched
        "CVE-2024-9999": "Thing",  # inserted
    }

    # append mode
    store.write(
        "cisa_kev",
        spark.createDataFrame([("CVE-2025-1", "A", "B")], ["cve_id", "vendor", "product"]),
        mode="append",
    )
    assert store.read("cisa_kev").count() == 4

    # J1 lookup: hit returns the record as a struct, miss returns null
    scans = spark.createDataFrame(
        [("h1", "CVE-2021-44228"), ("h2", "CVE-0000-0000")], ["host", "cve"]
    )
    out = enrich(
        scans, store.read("cisa_kev"), on={"cve": "cve_id"},
        select=["vendor", "product"], target="kev",
    )
    got = {r.host: r.asDict(recursive=True)["kev"] for r in out.collect()}
    assert got["h1"] == {"vendor": "Apache", "product": "Log4j2"}
    assert got["h2"] is None


def test_csv_with_configured_headers(spark, tmpdir):
    p = tmpdir / "inv.csv"
    p.write_text(
        'my-bucket, path/to/object.txt ,1024,2024-05-01T00:00:00.000Z\n'
        "other-bucket,k,,\n"
    )
    df = readers.read_csv_with_headers(
        spark, str(p), ["bucket", "key", "size", "mtime"]
    )
    rows = [r.asDict() for r in df.orderBy("bucket").collect()]
    assert rows[0]["bucket"] == "my-bucket"
    assert rows[0]["key"] == "path/to/object.txt"  # whitespace trimmed
    assert rows[1]["size"] is None  # flexible arity / missing → null


def test_line_framing_and_cloudwatch_unwrap(spark, tmpdir):
    payload = {
        "messageType": "DATA_MESSAGE",
        "owner": "123456789012",
        "logGroup": "/aws/lambda/f",
        "logStream": "2024/05/01/[$LATEST]abc",
        "subscriptionFilters": ["f"],
        "logEvents": [
            {"id": "0", "timestamp": 1714567890123, "message": "hello world"},
            {"id": "1", "timestamp": 1714567891123, "message": '{"k":1}'},
        ],
    }
    p = tmpdir / "cw.json"
    p.write_text(json.dumps(payload) + "\nplain text line\n")
    lines = readers.read_lines(spark, str(p))
    rows = lines.collect()
    assert sum(r.json is not None for r in rows) == 1
    assert sum(r.message is not None for r in rows) == 1

    ev = readers.unwrap_cloudwatch(lines.filter(F.col("json").isNotNull()))
    out = sorted((r.message for r in ev.collect()))
    assert out == ["hello world", '{"k":1}']
    assert ev.collect()[0].log_group == "/aws/lambda/f"


def test_expand_records_schemaless(spark, tmpdir):
    payload = {"Records": [{"eventName": "GetObject"}, {"eventName": "PutObject"}]}
    df = spark.createDataFrame([(json.dumps(payload),)], ["json"])
    out = readers.expand_records(df, "json", "Records")
    names = sorted(
        json.loads(r.json)["eventName"] for r in out.collect()
    )
    assert names == ["GetObject", "PutObject"]


def test_route_by_path_object_level_abort(spark):
    df = spark.createDataFrame(
        [
            ("x", "s3://b/zeek/dns.log"),
            ("y", "s3://b/zeek/conn.log"),
            ("z", "s3://b/other/unknown.bin"),
        ],
        ["v", "_file"],
    )
    routed = readers.route_by_path(
        df, [(r"dns\.", "dns"), (r"conn\.", "conn")], default=None
    )
    got = {r.v: r.resolved_table for r in routed.collect()}
    assert got == {"x": "dns", "y": "conn"}  # unknown file dropped entirely
    streams = readers.route_streams(routed, ["dns", "conn"])
    assert streams["dns"].count() == 1


def test_compression_matrix_sniffed(spark, tmpdir):
    """B9: same content plain / gzip / wrong-extension gzip / empty —
    row counts must match across variants."""
    content = '{"a":1}\n{"a":2}\n'
    (tmpdir / "plain.json").write_text(content)
    with gzip.open(tmpdir / "right.json.gz", "wt") as f:
        f.write(content)
    # wrong extension: gzip bytes in a .json file
    (tmpdir / "liar.json").write_bytes(gzip.compress(content.encode()))
    (tmpdir / "empty.json").write_bytes(b"")

    out = readers.read_lines_sniffed(spark, str(tmpdir / "*.json*"))
    rows = out.collect()
    by_file = {}
    for r in rows:
        name = r._file.rsplit("/", 1)[-1]
        by_file[name] = by_file.get(name, 0) + 1
    assert by_file.get("plain.json") == 2
    assert by_file.get("right.json.gz") == 2
    assert by_file.get("liar.json") == 2  # magic bytes beat the extension
    assert "empty.json" not in by_file
