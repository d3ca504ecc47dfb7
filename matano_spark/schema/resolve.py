"""Schema resolution: JSON field dialect ↔ StructType, ECS-subset
selection, deep merge, evolution.

Field dialect (SURVEY §1.2 — the exact at-rest type set): `string`,
`long`, `double`, `float`, `boolean`, `timestamp`, `struct`,
`list<string>`, `list<struct>`. No maps/decimals/intervals/binary at
rest; timestamps are microsecond (Spark TimestampType)."""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

# -- dialect ↔ StructType ---------------------------------------------------

_SCALARS = {
    "string": T.StringType,
    "long": T.LongType,
    "int": T.IntegerType,
    "double": T.DoubleType,
    "float": T.FloatType,
    "boolean": T.BooleanType,
    "timestamp": T.TimestampType,
}


def _field_type(spec: Any) -> T.DataType:
    """spec: 'string' | {'type': 'list', 'element': ...} |
    {'type': 'struct', 'fields': {...}} | nested dict of fields."""
    if isinstance(spec, str):
        if spec in _SCALARS:
            return _SCALARS[spec]()
        if spec.startswith("list<") and spec.endswith(">"):
            return T.ArrayType(_field_type(spec[5:-1]))
        raise ValueError(f"unknown type {spec!r}")
    if isinstance(spec, dict):
        # A dict is a TYPESPEC only in these unambiguous shapes;
        # otherwise it is a nested field map (which may itself contain
        # a field literally named "type", e.g. ECS event.type).
        kind = spec.get("type")
        if kind == "list" and "element" in spec:
            return T.ArrayType(_field_type(spec["element"]))
        if kind == "struct" and "fields" in spec:
            return fields_to_structtype(spec["fields"])
        if isinstance(kind, str) and kind in _SCALARS and len(spec) == 1:
            return _SCALARS[kind]()
        return fields_to_structtype(spec)
    raise TypeError(f"bad field spec {spec!r}")


def fields_to_structtype(fields: dict[str, Any]) -> T.StructType:
    """{name: typespec} (nested dicts = structs) → StructType."""
    out = []
    for name, spec in fields.items():
        out.append(T.StructField(name, _field_type(spec), True))
    return T.StructType(out)


def structtype_to_fields(st: T.StructType) -> dict[str, Any]:
    def conv(dt: T.DataType) -> Any:
        if isinstance(dt, T.StructType):
            return {f.name: conv(f.dataType) for f in dt.fields}
        if isinstance(dt, T.ArrayType):
            inner = conv(dt.elementType)
            if isinstance(inner, str):
                return f"list<{inner}>"
            return {"type": "list", "element": inner}
        for name, ctor in _SCALARS.items():
            if isinstance(dt, ctor):
                return name
        raise ValueError(f"unsupported type {dt}")

    return {f.name: conv(f.dataType) for f in st.fields}


# -- ECS base subset --------------------------------------------------------
# Hand-written from the public Elastic Common Schema field reference
# (ECS 8.x). The reference vendors the full schema; this subset covers
# the field groups the managed sources actually populate. Use
# load_base_schema() to swap in a full JSON.

ECS_BASE: dict[str, Any] = {
    "ts": "timestamp",
    "labels": "string",
    "tags": "list<string>",
    "message": "string",
    "ecs": {"version": "string"},
    "agent": {"name": "string", "type": "string", "version": "string"},
    "client": {"address": "string", "ip": "string", "port": "long",
               "domain": "string", "bytes": "long", "packets": "long"},
    "server": {"address": "string", "ip": "string", "port": "long",
               "domain": "string", "bytes": "long", "packets": "long"},
    "source": {"address": "string", "ip": "string", "port": "long",
               "domain": "string", "bytes": "long", "packets": "long",
               "geo": {"city_name": "string", "country_iso_code": "string",
                        "country_name": "string", "region_name": "string"}},
    "destination": {"address": "string", "ip": "string", "port": "long",
                    "domain": "string", "bytes": "long", "packets": "long",
                    "geo": {"city_name": "string", "country_iso_code": "string",
                            "country_name": "string", "region_name": "string"}},
    "cloud": {"provider": "string", "region": "string",
              "account": {"id": "string", "name": "string"},
              "instance": {"id": "string", "name": "string"},
              "service": {"name": "string"}},
    "container": {"id": "string", "name": "string",
                  "image": {"name": "string", "tag": "list<string>"}},
    "dns": {"question": {"name": "string", "type": "string",
                          "class": "string", "subdomain": "string",
                          "registered_domain": "string",
                          "top_level_domain": "string"},
            "answers": {"type": "list",
                        "element": {"type": "struct",
                                     "fields": {"name": "string",
                                                "type": "string",
                                                "class": "string",
                                                "ttl": "long",
                                                "data": "string"}}},
            "resolved_ip": "list<string>",
            "response_code": "string", "type": "string", "id": "string",
            "op_code": "string",
            "header_flags": "list<string>"},
    "event": {"action": "string", "category": "list<string>", "code": "string",
              "created": "timestamp", "dataset": "string", "duration": "long",
              "id": "string", "ingested": "timestamp", "kind": "string",
              "module": "string", "original": "string", "outcome": "string",
              "provider": "string", "reason": "string", "severity": "long",
              "type": "list<string>"},
    "file": {"name": "string", "path": "string", "size": "long",
             "extension": "string", "mtime": "timestamp",
             "mime_type": "string", "directory": "string",
             "hash": {"md5": "string", "sha1": "string", "sha256": "string"}},
    "host": {"hostname": "string", "name": "string", "id": "string",
             "ip": "list<string>", "mac": "list<string>",
             "os": {"family": "string", "name": "string", "version": "string",
                     "platform": "string"}},
    "http": {"request": {"method": "string", "referrer": "string",
                          "body": {"bytes": "long", "content": "string"}},
             "response": {"status_code": "long",
                           "body": {"bytes": "long", "content": "string"},
                           "mime_type": "string"},
             "version": "string"},
    "log": {"level": "string", "logger": "string",
            "file": {"path": "string"},
            "origin": {"function": "string"}},
    "network": {"application": "string", "bytes": "long", "packets": "long",
                "community_id": "string", "direction": "string",
                "iana_number": "string", "protocol": "string",
                "transport": "string", "type": "string"},
    "observer": {"name": "string", "product": "string", "type": "string",
                 "vendor": "string", "version": "string"},
    "process": {"name": "string", "pid": "long", "title": "string",
                "command_line": "string", "executable": "string",
                "args": "list<string>", "start": "timestamp",
                "parent": {"name": "string", "pid": "long"}},
    "related": {"ip": "list<string>", "user": "list<string>",
                "hash": "list<string>", "hosts": "list<string>"},
    "rule": {"id": "string", "name": "string", "category": "string",
             "description": "string", "ruleset": "string",
             "reference": "string", "version": "string"},
    "threat": {"indicator": {"type": "string", "ip": "string",
                              "description": "string",
                              "first_seen": "timestamp",
                              "last_seen": "timestamp",
                              "marking": {"tlp": "string"}},
               "feed": {"name": "string", "reference": "string"}},
    "tls": {"version": "string", "cipher": "string",
            "client": {"server_name": "string", "ja3": "string"},
            "server": {"ja3s": "string",
                        "hash": {"sha256": "string"}}},
    "url": {"domain": "string", "full": "string", "original": "string",
            "path": "string", "port": "long", "query": "string",
            "scheme": "string", "fragment": "string",
            "registered_domain": "string", "top_level_domain": "string"},
    "user": {"name": "string", "id": "string", "email": "string",
             "domain": "string", "full_name": "string",
             "group": {"id": "string", "name": "string"},
             "target": {"name": "string", "id": "string"},
             "roles": "list<string>"},
    "user_agent": {"original": "string", "name": "string", "version": "string",
                   "device": {"name": "string"},
                   "os": {"family": "string", "name": "string",
                           "version": "string"}},
    "vulnerability": {"category": "list<string>", "classification": "string",
                      "description": "string", "enumeration": "string",
                      "id": "string", "reference": "string",
                      "severity": "string",
                      "score": {"base": "double", "version": "string"}},
}

DEFAULT_FIELDS = ("ts", "labels", "tags")


def load_base_schema(path: str) -> dict[str, Any]:
    """Load a full base schema JSON in the same field dialect."""
    with open(path) as f:
        return json.load(f)


# -- selection / merge ------------------------------------------------------


def _select_path(base: dict, parts: list[str]) -> Any:
    node: Any = base
    for p in parts:
        if isinstance(node, dict) and "fields" in node:
            node = node["fields"]
        if not isinstance(node, dict) or p not in node:
            raise KeyError(".".join(parts))
        node = node[p]
    return node


def _deep_set(tree: dict, parts: list[str], value: Any) -> None:
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    existing = node.get(parts[-1])
    if isinstance(existing, dict) and isinstance(value, dict):
        _deep_merge(existing, value)
    else:
        node[parts[-1]] = value


def _deep_merge(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], dict) and isinstance(v, dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def resolve_schema(
    ecs_field_names: list[str] | None = None,
    custom_fields: dict[str, Any] | None = None,
    base: dict[str, Any] | None = None,
    add_defaults: bool = True,
) -> T.StructType:
    """Port of resolveSchema (infra/lib/schema.ts:144-182).

    Select ECS subtrees by dotted name, deep-merge custom fields
    (top-level custom names that collide with selected ECS names are
    rejected, :173-178), add ts/labels/tags defaults, sort ts first.
    """
    base = base if base is not None else ECS_BASE
    tree: dict[str, Any] = {}
    selected_top: set[str] = set()
    for name in ecs_field_names or []:
        parts = name.split(".")
        sub = _select_path(base, parts)
        _deep_set(tree, parts, sub)
        selected_top.add(parts[0])
    if custom_fields:
        conflicts = [
            k for k in custom_fields if k in selected_top or (k in base and k not in DEFAULT_FIELDS)
        ]
        if conflicts:
            raise ValueError(
                f"custom fields conflict with ECS fields: {sorted(conflicts)}"
            )
        _deep_merge(tree, dict(custom_fields))
    if add_defaults:
        for name in DEFAULT_FIELDS:
            tree.setdefault(name, base[name])
    # ts first, then alphabetical (log-source.ts:457-458 sortBy)
    ordered = dict(
        sorted(tree.items(), key=lambda kv: (kv[0] != "ts", kv[0]))
    )
    return fields_to_structtype(ordered)


def merge_schemas(a: T.StructType, b: T.StructType) -> T.StructType:
    """Evolution merge — unionByName semantics, existing field types
    win on scalar conflict (ref: unionByNameWith,
    MatanoIcebergTableCustomResource.kt:194-212)."""
    fields = {f.name: f for f in a.fields}
    for f in b.fields:
        if f.name not in fields:
            fields[f.name] = f
        else:
            cur = fields[f.name]
            if isinstance(cur.dataType, T.StructType) and isinstance(
                f.dataType, T.StructType
            ):
                fields[f.name] = T.StructField(
                    f.name, merge_schemas(cur.dataType, f.dataType), True
                )
    return T.StructType(list(fields.values()))
