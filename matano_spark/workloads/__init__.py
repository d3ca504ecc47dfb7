"""Workload registry: every implemented query/operator registers itself
here with an optional DuckDB oracle SQL string (the driver's correctness
gate — see __spark_entry__).

A query is a callable (spark, sf_dir) -> DataFrame. Oracle SQL runs on
DuckDB with the same parquet tables pre-registered as views, so column
names and value semantics must match exactly (see workloads.util for the
decimal-sum trick that makes float aggregates order-independent).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    doc: str = ""
    front: bool = False  # hoist into the driver's sampled window


REGISTRY: dict[str, Query] = {}

_WORKLOAD_MODULES = (
    "matano_spark.workloads.relational",
    "matano_spark.workloads.security",
    "matano_spark.workloads.llmdata",
    "matano_spark.workloads.sources",
    "matano_spark.workloads.temporal",
)


def query(name: str, oracle: str | None = None, front: bool = False):
    """Decorator: register a query under `name` with its oracle SQL.
    `front=True` hoists the query to the head of the interleave so the
    driver's ~50-entry correctness sample exercises it (used for the
    newest round's marquee entries)."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", front=front
        )
        return fn

    return deco


def load_registry() -> dict[str, Query]:
    """Import all workload modules (populating REGISTRY) and return it
    interleaved round-robin across modules, newest-first within each
    module. The driver's correctness gate samples only the first ~50
    entries, so plain registration order would re-check the same
    early-round block forever; this ordering puts a cross-section of
    every workload family — including the latest additions — inside
    the sampled window. `tools/verify_local.py` always checks all."""
    for mod in _WORKLOAD_MODULES:
        importlib.import_module(mod)
    by_module: dict[str, list[Query]] = {}
    for q in REGISTRY.values():
        by_module.setdefault(q.fn.__module__, []).append(q)
    stacks = [list(reversed(v)) for v in by_module.values()]
    ordered: dict[str, Query] = {}
    for st in stacks:  # front-flagged entries lead the whole listing
        for q in [q for q in st if q.front]:
            ordered[q.name] = q
    while any(stacks):
        for st in stacks:
            if st:
                q = st.pop(0)
                if q.name not in ordered:
                    ordered[q.name] = q
    return ordered
