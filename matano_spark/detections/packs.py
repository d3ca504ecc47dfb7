"""Detections-as-code directory loader.

The reference packages each detection as a directory of
`detection.yml` (metadata + alert config + table bindings) and
`detect.py` (the `detect(record)` predicate with optional
`title`/`dedupe`/`severity` hooks) — see ref
example/detections/aws_root_credentials/{detection.yml,detect.py} and
the loader in lib/python/matano_detection/detection/common.py. This
module reads that exact layout into `Detection` objects, so a user's
existing detection tree drops in unchanged.

Config mapping (detection.yml → Detection):
  name                                   → name
  alert.severity                         → severity (hook overrides)
  alert.threshold                        → threshold
  alert.deduplication_window_minutes     → deduplication_window_minutes
  tables                                 → tables (binding filter)
  enabled: false                         → skipped entirely
"""

from __future__ import annotations

import os
from typing import Any

import yaml

from matano_spark.detections import Detection


def load_detection(dir_path: str) -> Detection | None:
    """One detection directory → Detection (None when disabled)."""
    with open(os.path.join(dir_path, "detection.yml")) as fh:
        cfg: dict[str, Any] = yaml.safe_load(fh) or {}
    if not cfg.get("enabled", True):
        return None
    # Execute detect.py as a module-like namespace. Same trust model as
    # the reference: detections are first-party code deployed alongside
    # the pipeline, not untrusted input.
    ns: dict[str, Any] = {}
    with open(os.path.join(dir_path, "detect.py")) as fh:
        exec(compile(fh.read(), os.path.join(dir_path, "detect.py"), "exec"), ns)
    if "detect" not in ns:
        raise ValueError(f"{dir_path}: detect.py defines no detect()")
    alert = cfg.get("alert") or {}
    return Detection(
        name=cfg.get("name") or os.path.basename(dir_path.rstrip("/")),
        detect=ns["detect"],
        dedupe=ns.get("dedupe"),
        title=ns.get("title"),
        severity=alert.get("severity", "medium"),
        threshold=int(alert.get("threshold", 1)),
        deduplication_window_minutes=int(
            alert.get("deduplication_window_minutes", 60)
        ),
        tables=tuple(cfg.get("tables") or ()),
        destinations=tuple(alert.get("destinations") or ()),
    )


def load_detection_packs(root: str) -> list[Detection]:
    """Every enabled detection directory under `root` (a directory is
    a detection iff it contains detection.yml)."""
    out: list[Detection] = []
    for entry in sorted(os.listdir(root)):
        d = os.path.join(root, entry)
        if os.path.isdir(d) and os.path.exists(os.path.join(d, "detection.yml")):
            det = load_detection(d)
            if det is not None:
                out.append(det)
    return out


def detections_for_table(detections: list[Detection], table: str) -> list[Detection]:
    """The reference fans a table's realtime stream only to detections
    bound to it (detections.ts table→detection wiring)."""
    return [d for d in detections if not d.tables or table in d.tables]


def rule_config(detections: list[Detection]) -> dict[str, tuple[int, int]]:
    """Detection list → per-rule (threshold, window_seconds) map for
    `aggregate_alerts` / `streaming_alerts` rule_config."""
    return {
        d.name: (d.threshold, d.deduplication_window_minutes * 60)
        for d in detections
    }
