"""Port a managed log-source pack's DECLARATIVE parts from the
reference layout into data/log_sources/<name>/.

What ports mechanically (data, not code): schema.ecs_field_names,
schema.fields (list-form dialect), table inventory, and the ingest
routing mode. The `transform` programs are NOT ported by this tool —
they are (re)written by hand in this repo's transform DSL per source;
the tool leaves the existing transform untouched when a pack already
exists, so re-running it refreshes schemas without clobbering work.

Usage: python tools/port_log_source.py <ref_source_dir> <out_dir>
"""

from __future__ import annotations

import os
import sys

import yaml


def _ingest_of(cfg: dict) -> dict:
    """Map reference ingest options onto this repo's reader options."""
    ing = cfg.get("ingest") or {}
    out: dict = {}
    if "select_table_from_payload" in ing:
        out["select_table_from_payload"] = True  # S8: .json._table routing
    if "expand_records_from_payload" in ing:
        out["expand_records_field"] = "Records"
    if ing.get("csv_headers"):
        out["format"] = "csv"
        out["csv_headers"] = ing["csv_headers"]
    return out


def _load_existing(path: str) -> dict:
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return yaml.safe_load(f) or {}


class _LiteralStr(str):
    pass


def _literal_presenter(dumper, data):
    return dumper.represent_scalar("tag:yaml.org,2002:str", data, style="|")


yaml.add_representer(_LiteralStr, _literal_presenter)


def _dump(cfg: dict, path: str) -> None:
    if cfg.get("transform"):
        cfg["transform"] = _LiteralStr(cfg["transform"])
    with open(path, "w") as f:
        yaml.dump(cfg, f, default_flow_style=False, sort_keys=False, width=100)


def port(ref_dir: str, out_dir: str) -> None:
    name = os.path.basename(ref_dir.rstrip("/"))
    os.makedirs(os.path.join(out_dir, "tables"), exist_ok=True)
    with open(os.path.join(ref_dir, "log_source.yml")) as f:
        src = yaml.safe_load(f) or {}

    out_src: dict = {"name": src.get("name") or name}
    if src.get("schema"):
        out_src["schema"] = {
            k: v
            for k, v in src["schema"].items()
            if k in ("ecs_field_names", "fields")
        }
    existing = _load_existing(os.path.join(out_dir, "log_source.yml"))
    ingest = existing.get("ingest") or _ingest_of(src)  # hand-written wins
    if ingest:
        out_src["ingest"] = ingest
    if existing.get("transform"):
        out_src["transform"] = existing["transform"]
    _dump(out_src, os.path.join(out_dir, "log_source.yml"))

    ref_tables = os.path.join(ref_dir, "tables")
    for tf in sorted(os.listdir(ref_tables)) if os.path.isdir(ref_tables) else []:
        with open(os.path.join(ref_tables, tf)) as f:
            tbl = yaml.safe_load(f) or {}
        out_tbl: dict = {"name": tbl.get("name") or os.path.splitext(tf)[0]}
        if tbl.get("schema"):
            out_tbl["schema"] = {
                k: v
                for k, v in tbl["schema"].items()
                if k in ("ecs_field_names", "fields")
            }
        tpath = os.path.join(out_dir, "tables", tf)
        prior = _load_existing(tpath)
        if prior.get("transform"):
            out_tbl["transform"] = prior["transform"]
        _dump(out_tbl, tpath)
    print(f"ported schema for {name}")


if __name__ == "__main__":
    port(sys.argv[1], sys.argv[2])
