"""Detections-as-code harness (SURVEY.md §2.7).

Runs matano-style Python detection modules unmodified over DataFrames:
a detection is any object/module with `detect(record) -> bool` and
optional `title/dedupe/severity(record)` hooks (ref contract:
detection/common.py:225-259; safe_call :378-380). Records are wrapped
in DeepDict with dotted-path deepget where missing ≡ null (ref:
detection/util.py:109-132).

Execution is Arrow-batched `mapInPandas` — the Spark analog of the
reference's in-process row loop (pyston JIT + 12-thread pool,
common.py:69,137-141): rows stay columnar until the batch boundary,
detections see plain dicts, and the output is the rule-match relation
(A1 input). Match ids are deterministic digests (md5 of
rule:event-key) rather than uuids so results are replayable and
oracle-checkable; a uuid mode can be flipped on for production parity.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import types as T


class DeepDict(dict):
    """Dict wrapper with VRL-style dotted-path access.

    deepget("a.b.c", default) — missing intermediate or leaf returns
    the default (missing ≡ null; ref detection/util.py:109-132).
    """

    def deepget(self, path: str, default: Any = None) -> Any:
        node: Any = self
        for part in path.split("."):
            if isinstance(node, dict) and part in node:
                node = node[part]
            else:
                return default
        return node if node is not None else default


@dataclass
class Detection:
    """A detection rule: predicate + alert metadata hooks.

    `detect` is required; the rest mirror the reference's optional
    module-level hooks (detection/common.py:225-259)."""

    name: str
    detect: Callable[[DeepDict], bool]
    dedupe: Callable[[DeepDict], str] | None = None
    title: Callable[[DeepDict], str] | None = None
    severity: str = "medium"
    threshold: int = 1
    deduplication_window_minutes: int = 60
    tables: tuple[str, ...] = field(default_factory=tuple)
    destinations: tuple[str, ...] = field(default_factory=tuple)


MATCH_SCHEMA = T.StructType(
    [
        T.StructField("rule_name", T.StringType()),
        T.StructField("match_id", T.StringType()),
        T.StructField("dedupe", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("severity", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_key", T.StringType()),
        T.StructField("original_event", T.StringType()),
    ]
)


def _safe_call(hook, record, default=None):
    """Hook errors must not kill the batch (ref safe_call
    detection/common.py:378-380)."""
    if hook is None:
        return default
    try:
        return hook(record)
    except Exception:  # noqa: BLE001
        return default


def run_detections(
    df: DataFrame,
    detections: Iterable[Detection],
    ts_col: str = "ts",
    key_col: str | None = None,
    prefilter: bool = True,
) -> DataFrame:
    """Evaluate detections over every row; emit rule-match rows.

    One pass over the data for ALL detections (the reference loops
    detections per record in-process; same shape here inside each
    Arrow batch). Output is the A1 rule-match relation, ready for the
    alert state machine.

    Fast path: detections whose detect() compiles to a Column
    predicate (detections.compile concolic tracer) run against a
    JVM-prefiltered scan — Catalyst pushes the OR of their compiled
    predicates to parquet and the Python loop only sees candidate
    rows. Hooks (title/dedupe/original_event) still run in Python on
    survivors, so output is bit-identical to the slow path.
    PER-RULE partitioning: untraceable detections fall back to the
    full-scan row loop in a SEPARATE branch, so one dynamic rule never
    strips the fast path from the rest (soundness per rule: a row is
    only skipped for rules whose own predicate excluded it).
    """
    dets = list(detections)
    fields = df.columns
    if prefilter and dets:
        from matano_spark.detections.compile import Untraceable, compile_predicate

        fast: list[tuple[Detection, object]] = []
        slow: list[Detection] = []
        for d in dets:
            try:
                fast.append((d, compile_predicate(d.detect, df.schema)))
            except Untraceable:
                slow.append(d)
        if fast:
            cond = fast[0][1]
            for _, p in fast[1:]:
                cond = cond | p
            fast_out = _match_loop(
                df.filter(cond), [d for d, _ in fast], fields, ts_col, key_col
            )
            if slow:
                return fast_out.unionByName(
                    _match_loop(df, slow, fields, ts_col, key_col)
                )
            return fast_out
    return _match_loop(df, dets, fields, ts_col, key_col)


def _match_loop(
    df: DataFrame,
    dets: list,
    fields: list[str],
    ts_col: str,
    key_col: str | None,
) -> DataFrame:
    def run(batches):
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in MATCH_SCHEMA.fields}
            # column-zip iteration beats DataFrame.to_dict('records')
            # ~2-3x on wide frames; the original-event JSON serializes
            # lazily, at most once per row across all detections.
            cols = list(pdf.columns)
            series = [pdf[c] for c in cols]
            for vals in zip(*series):
                record = DeepDict(zip(cols, vals))
                original = None
                for det in dets:
                    try:
                        hit = bool(det.detect(record))
                    except Exception:  # noqa: BLE001
                        hit = False  # failing detection skips the record
                    if not hit:
                        continue
                    if original is None:
                        original = json.dumps(
                            {k: str(record.get(k)) for k in fields},
                            sort_keys=True,
                        )
                    key = str(record.get(key_col)) if key_col else original
                    dedupe = _safe_call(det.dedupe, record)
                    title = _safe_call(det.title, record, det.name)
                    match_id = hashlib.md5(
                        f"{det.name}:{key}".encode()
                    ).hexdigest()
                    out["rule_name"].append(det.name)
                    out["match_id"].append(match_id)
                    out["dedupe"].append(
                        str(dedupe) if dedupe is not None else det.name
                    )
                    out["title"].append(title)
                    out["severity"].append(det.severity)
                    out["ts"].append(record.get(ts_col))
                    out["event_key"].append(key)
                    out["original_event"].append(original)
            pdf_out = pd.DataFrame(out)
            # Empty batches infer float64 for ts; pin the Arrow-compatible
            # dtype explicitly.
            pdf_out["ts"] = pd.to_datetime(pdf_out["ts"])
            yield pdf_out

    return df.mapInPandas(run, MATCH_SCHEMA)
