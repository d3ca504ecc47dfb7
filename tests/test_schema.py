"""Schema system tests (SURVEY §1.3 resolution pipeline)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from matano_spark.schema import (
    create_table_ddl,
    fields_to_structtype,
    flatten_columns,
    flattened_view_sql,
    merge_schemas,
    resolve_schema,
    structtype_to_fields,
)


def test_fields_to_structtype_dialect():
    st = fields_to_structtype(
        {
            "ts": "timestamp",
            "n": "long",
            "tags": "list<string>",
            "nested": {"a": "string", "b": {"c": "double"}},
            "answers": {
                "type": "list",
                "element": {"type": "struct", "fields": {"ttl": "long"}},
            },
        }
    )
    assert st["ts"].dataType == T.TimestampType()
    assert st["tags"].dataType == T.ArrayType(T.StringType())
    assert st["nested"].dataType["b"].dataType["c"].dataType == T.DoubleType()
    assert st["answers"].dataType == T.ArrayType(
        T.StructType([T.StructField("ttl", T.LongType())])
    )
    # round-trip
    assert fields_to_structtype(structtype_to_fields(st)) == st


def test_resolve_schema_subset_and_defaults():
    st = resolve_schema(
        ["source.ip", "source.port", "event.action", "destination.geo.city_name"]
    )
    names = [f.name for f in st.fields]
    assert names[0] == "ts"  # ts sorted first
    assert set(names) == {"ts", "labels", "tags", "source", "event", "destination"}
    src = st["source"].dataType
    assert {f.name for f in src.fields} == {"ip", "port"}
    dest_geo = st["destination"].dataType["geo"].dataType
    assert [f.name for f in dest_geo.fields] == ["city_name"]


def test_resolve_schema_custom_fields_merge_and_conflict():
    st = resolve_schema(
        ["user.name"],
        custom_fields={"zeek": {"session_id": "string", "dns": {"trans_id": "long"}}},
    )
    assert st["zeek"].dataType["dns"].dataType["trans_id"].dataType == T.LongType()
    # reference rule: only exact leaf-path collisions conflict; new
    # leaves under an ECS group (user.x) are allowed
    st2 = resolve_schema(["user.name"], custom_fields={"user": {"x": "string"}})
    assert {f.name for f in st2["user"].dataType.fields} == {"name", "x"}
    with pytest.raises(ValueError, match="conflict"):
        resolve_schema(["user.name"], custom_fields={"user": {"name": "string"}})


def test_merge_schemas_evolution():
    a = resolve_schema(["source.ip"])
    b = resolve_schema(["source.port", "event.action"], add_defaults=False)
    m = merge_schemas(a, b)
    assert {f.name for f in m["source"].dataType.fields} == {"ip", "port"}
    assert "event" in [f.name for f in m.fields]


def test_ddl_and_flattened_view(spark):
    st = resolve_schema(["source.ip", "event.action"])
    ddl = create_table_ddl("matano.zeek_dns", st)
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (hours(ts))" in ddl
    assert "zstd" in ddl

    view_sql = flattened_view_sql("zeek_dns", st)
    assert "source.ip AS source_ip" in view_sql
    assert "event.action AS event_action" in view_sql

    df = spark.createDataFrame(
        [(("1.2.3.4",), ("login",))],
        T.StructType(
            [
                T.StructField(
                    "source", T.StructType([T.StructField("ip", T.StringType())])
                ),
                T.StructField(
                    "event", T.StructType([T.StructField("action", T.StringType())])
                ),
            ]
        ),
    )
    flat = flatten_columns(df)
    assert flat.columns == ["source_ip", "event_action"]
    assert flat.collect()[0].asDict() == {
        "source_ip": "1.2.3.4",
        "event_action": "login",
    }


def test_vendored_full_ecs_base():
    """The base schema is the full public ECS 8.x inventory (54 top
    groups, ~3.4k leaves), not the mini subset; wide managed-source
    field lists (zeek/dns-style: as/geo subtrees, error.message,
    event.duration) must resolve."""
    from matano_spark.schema.resolve import ECS_BASE, fields_to_structtype

    assert len(ECS_BASE) == 54
    st = fields_to_structtype(ECS_BASE)

    def leaves(dt):
        if isinstance(dt, T.StructType):
            return sum(leaves(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return leaves(dt.elementType)
        return 1

    assert leaves(st) > 3000
    wide = [
        "destination.as.number", "destination.as.organization.name",
        "destination.geo.continent_name", "destination.geo.location",
        "dns.answers", "error.message", "event.duration",
        "network.community_id", "threat.indicator.ip", "tls.client.ja3",
        "user.target.name", "vulnerability.score.base",
    ]
    resolved = resolve_schema(wide, add_defaults=False)
    assert {f.name for f in resolved.fields} == {
        "destination", "dns", "error", "event", "network", "threat",
        "tls", "user", "vulnerability",
    }


def test_all_managed_source_packs_load_and_ddl_compiles():
    """SURVEY §7 step-1 deliverable: every shipped managed log-source
    pack loads, resolves its schema against the full ECS base, and
    produces CREATE TABLE DDL."""
    import os

    from matano_spark.schema.config import load_log_source
    from matano_spark.schema.ddl import create_table_ddl

    root = os.path.join(os.path.dirname(__file__), "..", "data", "log_sources")
    sources = sorted(os.listdir(root))
    assert len(sources) >= 25
    n_tables = 0
    for s in sources:
        for td in load_log_source(os.path.join(root, s)):
            ddl = create_table_ddl(f"{s}_{td.name}", td.schema)
            assert ddl.startswith("CREATE TABLE") and "ts timestamp" in ddl
            n_tables += 1
    assert n_tables >= 80  # zeek alone ships 43 tables
