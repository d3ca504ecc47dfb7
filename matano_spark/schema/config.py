"""Log-source configuration loader (SURVEY.md §1.3 steps 1-3).

A log source is a directory:
    log_source.yml          — name, ingest options, source-level
                              transform (VRL text), schema.ecs_field_names
    tables/<table>.yml      — per-table schema + transform

Reference semantics reproduced (infra/lib/log-source.ts):
- managed + user configs deep-merge, managed transform PREPENDED
  (:19-41,295-309)
- log-source transform and table transform CONCATENATE (:430-449)
- resolved schema = resolveSchema(ecs_field_names, custom fields)
  with ts/labels/tags defaults, ts sorted first (:457-458)

`build_table` compiles the concatenated program with the transform
parser and returns (StructType, pipeline, ingest options) — everything
the streaming ingest job needs for the table.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable

import yaml

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from matano_spark.schema.resolve import resolve_schema
from matano_spark.transform.parser import parse_program


def _deep_merge(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], dict) and isinstance(v, dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v
    return dst


@dataclass
class TableDef:
    log_source: str
    name: str
    schema: T.StructType
    transform_src: str
    pipeline: Callable[[DataFrame], DataFrame]
    ingest: dict[str, Any] = field(default_factory=dict)
    program: tuple = ()  # parsed steps (for projection-pushdown slicing)
    _sliced: dict = field(default_factory=dict, repr=False, compare=False)

    def pipeline_for(
        self, needed: tuple[str, ...] | None
    ) -> Callable[[DataFrame], DataFrame]:
        """Projection-pushdown pipeline: compile only the statements
        observable through the `needed` output paths (backward
        liveness slice — transform/slice.py). Same surviving row set,
        same values for every needed path; cached per read-set."""
        if not needed or not self.program:
            return self.pipeline
        key = tuple(needed)
        hit = self._sliced.get(key)
        if hit is None:
            from matano_spark.transform.compiler import compile_pipeline
            from matano_spark.transform.slice import slice_program

            hit = self._sliced[key] = compile_pipeline(
                slice_program(self.program, key)
            )
        return hit


def merge_configs(managed: dict, user: dict) -> dict:
    """Managed+user deep merge; transforms concatenate with the
    managed program FIRST (log-source.ts:19-41)."""
    managed_tf = (managed.get("transform") or "").strip()
    user_tf = (user.get("transform") or "").strip()
    out = _deep_merge({k: v for k, v in managed.items() if k != "transform"}, {
        k: v for k, v in user.items() if k != "transform"
    })
    combined = "\n".join(x for x in (managed_tf, user_tf) if x)
    if combined:
        out["transform"] = combined
    return out


# Paths the REFERENCE's own managed transforms assign while omitting
# them from their declared schema, relying on the schema cast to drop
# them (aws_cloudtrail/log_source.yml:616 assigns tls.version_protocol
# with tls.version_protocol absent from ecs_field_names:684-687;
# :641 builds the legacy aws.cloudtrail.flattened object the default
# table does not declare). Known-benign: silenced so real lint hits
# stay visible in gate/pytest logs.
_KNOWN_REFERENCE_LINT = {
    "aws_cloudtrail": {"tls.version_protocol", "aws.cloudtrail.flattened"},
}


def load_log_source(
    path: str, user_overrides: dict | None = None, strict: bool = True
) -> list[TableDef]:
    """Load a log-source directory into compiled TableDefs.

    strict=False downgrades the assigned-but-undeclared lint to a
    warning — required for running REFERENCE managed packs verbatim:
    the reference itself ships transforms that write paths its schema
    does not declare (aws_cloudtrail's tls.version_protocol and legacy
    aws.cloudtrail.flattened), relying on its schema cast to silently
    drop them; the full-schema projection here has the same drop
    semantics."""
    with open(os.path.join(path, "log_source.yml")) as f:
        source_cfg = yaml.safe_load(f) or {}
    if user_overrides:
        source_cfg = merge_configs(source_cfg, user_overrides)
    name = source_cfg.get("name") or os.path.basename(path.rstrip("/"))

    tables_dir = os.path.join(path, "tables")
    table_files = (
        sorted(
            tf for tf in os.listdir(tables_dir) if tf.endswith((".yml", ".yaml"))
        )
        if os.path.isdir(tables_dir)
        else []
    )

    defs: list[TableDef] = []
    if not table_files:  # single-table source defined by log_source.yml
        return [build_table(name, "default", source_cfg, {}, strict=strict)]
    for tf in table_files:
        with open(os.path.join(tables_dir, tf)) as f:
            table_cfg = yaml.safe_load(f) or {}
        tname = table_cfg.get("name") or os.path.splitext(tf)[0]
        defs.append(build_table(name, tname, source_cfg, table_cfg, strict=strict))
    return defs


def build_table(
    source_name: str,
    table_name: str,
    source_cfg: dict,
    table_cfg: dict,
    strict: bool = True,
) -> TableDef:
    src_schema = source_cfg.get("schema") or {}
    tbl_schema = table_cfg.get("schema") or {}
    ecs_names = list(
        dict.fromkeys(
            (src_schema.get("ecs_field_names") or [])
            + (tbl_schema.get("ecs_field_names") or [])
        )
    )
    from matano_spark.schema.resolve import fields_list_to_dict

    custom = {}
    for fields in (src_schema.get("fields"), tbl_schema.get("fields")):
        if isinstance(fields, list):  # reference list-form dialect
            fields = fields_list_to_dict(fields)
        if fields:
            _deep_merge(custom, fields)
    schema = resolve_schema(ecs_names, custom or None)

    # transforms concatenate: log-source first, then table
    # (log-source.ts:430-449)
    parts = [
        (source_cfg.get("transform") or "").strip(),
        (table_cfg.get("transform") or "").strip(),
    ]
    transform_src = "\n".join(p for p in parts if p)
    from matano_spark.transform.compiler import compile_pipeline

    program = parse_program(transform_src)
    from matano_spark.schema.lint import lint_transform

    bad = lint_transform(program, schema)
    bad = [p for p in bad if p not in _KNOWN_REFERENCE_LINT.get(source_name, ())]
    if bad:
        msg = (
            f"{source_name}/{table_name}: transform assigns paths the "
            f"resolved schema does not declare (silently dropped by the "
            f"full-schema projection): {bad}"
        )
        if strict:
            raise ValueError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
    pipeline = compile_pipeline(program)
    return TableDef(
        log_source=source_name,
        name=table_name,
        schema=schema,
        transform_src=transform_src,
        pipeline=pipeline,
        ingest=_merged_ingest(source_cfg, table_cfg),
        program=tuple(program),
    )


def _merged_ingest(source_cfg: dict, table_cfg: dict) -> dict:
    """Table-level ingest options override/extend source-level ones.

    Multi-table sources (cloudflare, panw, …) share framing options at
    the source level but carry per-table raw shapes: a table's
    `ingest.input_fields` REPLACES the source's (the raw feeds are
    disjoint), while scalar options deep-merge.
    """
    out = dict(source_cfg.get("ingest") or {})
    tbl = table_cfg.get("ingest") or {}
    if "input_fields" in tbl:
        out["input_fields"] = tbl["input_fields"]
    out.update({k: v for k, v in tbl.items() if k != "input_fields"})
    return out


@dataclass
class EnrichmentDef:
    """A managed enrichment pack: same schema/transform machinery as a
    log-source table plus the enrichment write policy (ref
    data/managed/enrichment/*/enrichment.yml; Enrichment.kt:336-366)."""

    name: str
    schema: T.StructType
    transform_src: str
    pipeline: Callable[[DataFrame], DataFrame]
    ingest: dict[str, Any]
    write_mode: str
    primary_key: str | None
    lookup_keys: list[str]


def load_enrichment(path: str) -> EnrichmentDef:
    """Load an enrichment pack directory (enrichment.yml)."""
    with open(os.path.join(path, "enrichment.yml")) as f:
        cfg = yaml.safe_load(f) or {}
    name = cfg.get("name") or os.path.basename(path.rstrip("/"))
    td = build_table(name, "enrichment", cfg, {})
    return EnrichmentDef(
        name=name,
        schema=td.schema,
        transform_src=td.transform_src,
        pipeline=td.pipeline,
        ingest=td.ingest,
        write_mode=cfg.get("write_mode", "overwrite"),
        primary_key=(cfg.get("schema") or {}).get("primary_key"),
        lookup_keys=cfg.get("lookup_keys") or [],
    )
