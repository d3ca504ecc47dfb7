"""Slicer differential over REAL reference transforms: for a sample of
managed programs spanning the corpus's shapes (dynamic set! dances,
grok, for_each folds, guard chains, variant payloads), the sliced
pipeline must agree with the full pipeline on the needed paths and on
row membership, executing on the exec-survey's synthesized events.

Complements tests/test_slice.py (hand program + okta end-to-end) and
tests/test_slice_property.py (generated programs): this one pins the
slicer against the reference corpus itself.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

REF_MANAGED = "/root/reference/data/managed/log_sources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_MANAGED), reason="reference tree not present"
)

# (pack-relative yml, needed paths) — read sets a detection/rollup
# would realistically declare against each source
CASES = [
    ("okta/tables/system.yml", ("event.outcome", "user.name", "ts")),
    ("gcp_audit/log_source.yml", ("event.action", "event.outcome", "ts")),
    ("duo/tables/auth.yml", ("event.outcome", "user.name", "ts")),
    ("teleport/tables/audit.yml", ("event.action", "event.outcome", "ts")),
    ("github_audit/log_source.yml", ("event.action", "user.name", "ts")),
    ("onepassword/tables/signin_attempts.yml", ("event.action", "ts")),
    ("snyk/tables/audit.yml", ("event.action", "user.id", "ts")),
    ("aws_waf/log_source.yml", ("event.action", "source.ip", "ts")),
    (
        "aws_route53_resolver_logs/log_source.yml",
        ("dns.question.name", "dns.response_code", "ts"),
    ),
    ("zeek/tables/rdp.yml", ("source.address", "destination.port", "ts")),
    ("cloudflare/tables/dns.yml", ("dns.question.name", "ts")),
    ("google_workspace/tables/login.yml", ("event.action", "user.email", "ts")),
]


def _program(rel: str) -> str:
    from tools.vrl_parse_survey import iter_programs

    path = os.path.join(REF_MANAGED, rel)
    for p, kind, prog in iter_programs(os.path.dirname(path.rstrip("/"))):
        if p == path and kind == "transform":
            return prog
    raise AssertionError(f"no transform in {rel}")


def _norm(v):
    from pyspark.sql.types import VariantVal

    if isinstance(v, VariantVal):
        return json.loads(v.toJson())
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_norm(x) for x in v]
    return v


@pytest.mark.parametrize("rel,needed", CASES, ids=[c[0] for c in CASES])
def test_reference_program_slice_differential(spark, rel, needed):
    from tools.vrl_exec_survey import _load_overrides, synth_event, collect_paths, OVERRIDES
    from matano_spark.transform.parser import compile_vrl, parse_program
    from matano_spark.transform.compiler import compile_pipeline
    from matano_spark.transform.slice import slice_program

    prog_text = _program(rel)
    steps = parse_program(prog_text)
    reads, _writes = collect_paths(steps)
    _load_overrides()
    ov = OVERRIDES.get(f"{rel}::transform", OVERRIDES.get(rel, {}))
    event = synth_event(reads, ov.get("json"))
    msg = ov.get("message") or json.dumps(event)

    raw = spark.createDataFrame([(msg,)], "message string")
    if event:
        inferred = spark.read.json(
            spark.sparkContext.parallelize([json.dumps(event)], 1)
        )
        df = raw.crossJoin(
            inferred.select(
                F.struct(
                    *[F.col(f"`{c}`") for c in inferred.columns]
                ).alias("json")
            ).limit(1)
        )
    else:
        df = raw.select(
            F.parse_json(F.lit(json.dumps(event) if event else "{}")).alias(
                "json"
            ),
            "message",
        )

    full = compile_vrl(prog_text)(df)
    cut = compile_pipeline(slice_program(steps, needed))(df)
    f_rows = full.collect()
    c_rows = cut.collect()
    assert len(f_rows) == len(c_rows), f"{rel}: row membership differs"
    if not f_rows:
        return  # both aborted the synthesized event — consistent

    fd = f_rows[0].asDict(recursive=True)
    cd = c_rows[0].asDict(recursive=True)

    def get(d, dotted):
        cur = d
        for p in dotted.split("."):
            if not isinstance(cur, dict):
                return None
            cur = cur.get(p)
        return cur

    for path in needed:
        assert _norm(get(fd, path)) == _norm(get(cd, path)), (
            f"{rel}: {path}: full={get(fd, path)!r} sliced={get(cd, path)!r}"
        )
