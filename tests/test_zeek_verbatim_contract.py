"""Verbatim-execution CONTRACT for every zeek table transform in the
reference tree (ref: data/managed/log_sources/zeek/tables/*.yml).

The per-table ported pipelines are condensed rewrites with their own
golden tests (test_zeek_tables*.py); ~10 heavy tables also have full
verbatim goldens (test_vrl_verbatim_files*.py). This test closes the
remaining gap: each REMAINING table's transform runs VERBATIM from the
reference yml text on a synthesized event, and the assertions are
derived from the program's own read/write sets — semantic checks, not
just the exec-floor's non-crash:

  * the row survives (ts was fed, so no abort) and `ts` lands non-null;
  * if the program moves `id.orig_h`/`id.resp_h`/ports into ECS
    source/destination, the SENTINEL values we fed arrive there;
  * if it moves `uid` into zeek.session_id, the sentinel uid arrives;
  * the `.zeek.<proto>` payload subtree it builds is present.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

REF_MANAGED = "/root/reference/data/managed/log_sources"
ZEEK_TABLES = os.path.join(REF_MANAGED, "zeek", "tables")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ZEEK_TABLES), reason="reference tree not present"
)

# tables already covered by full hand-written verbatim goldens
_HAND_GOLDEN = {
    "dns", "http", "kerberos", "notice", "ntlm", "smtp", "ssh", "ssl",
    "weird", "x509",
}

SENTINELS = {
    "id.orig_h": "10.99.88.77",
    "id.resp_h": "10.11.22.33",
    "id.orig_p": 54321,
    "id.resp_p": 443,
    "uid": "Cs3NT01GQ3UmhZZzP3",
}


def _tables():
    if not os.path.isdir(ZEEK_TABLES):
        return []
    return sorted(
        os.path.splitext(f)[0]
        for f in os.listdir(ZEEK_TABLES)
        if f.endswith(".yml") and os.path.splitext(f)[0] not in _HAND_GOLDEN
    )


def _strvals(x):
    """Flatten a possibly-variant value to comparable text."""
    return str(x).strip('"')


@pytest.mark.parametrize("table", _tables())
def test_zeek_table_verbatim_contract(spark, table):
    from tools.vrl_exec_survey import _load_overrides, synth_event
    from tools.vrl_parse_survey import iter_programs
    from matano_spark.transform.parser import compile_vrl, parse_program
    from tools.vrl_exec_survey import collect_paths, OVERRIDES

    path = os.path.join(ZEEK_TABLES, f"{table}.yml")
    prog_text = None
    for p, kind, prog in iter_programs(os.path.join(REF_MANAGED, "zeek")):
        if p == path and kind == "transform":
            prog_text = prog
    if prog_text is None:
        pytest.skip(f"{table}: no transform block")

    steps = parse_program(prog_text)
    reads, writes = collect_paths(steps)
    _load_overrides()
    ov = OVERRIDES.get(f"zeek/tables/{table}.yml::transform", OVERRIDES.get(
        f"zeek/tables/{table}.yml", {}
    ))
    event = synth_event(reads, ov.get("json"))
    # Always feed the zeek identity fields plus a rider key: most
    # programs move the WHOLE payload into .zeek.<proto> first and
    # read fields off that subtree (`.zeek.rdp."id.orig_h"`), so the
    # json.* read set alone under-populates the event. `fed` records
    # which sentinels the program actually consumes (a read of the
    # field under ANY path prefix), keying the assertions below.
    event.setdefault("zz_rider", "kept")  # keeps the subtree non-empty
    fed = {}
    for key, val in SENTINELS.items():
        event[key] = val
        if any(r and r[-1] == key for r in reads):
            fed[key] = val
    if "ts" not in event:
        event["ts"] = 1612461115.0

    inferred = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(event)], 1)
    )
    df = inferred.select(
        F.struct(*[F.col(f"`{c}`") for c in inferred.columns]).alias("json")
    ).withColumn("ts", F.lit(None).cast("timestamp"))

    out = compile_vrl(prog_text)(df)
    rows = out.collect()
    assert len(rows) == 1, f"{table}: row aborted despite ts present"
    d = rows[0].asDict(recursive=True)

    if ("ts",) in writes:
        assert d.get("ts") is not None, f"{table}: ts is null"

    def _get(dd, *parts):
        cur = dd
        for p in parts:
            if not isinstance(cur, dict) or cur.get(p) is None:
                return None
            cur = cur[p]
        return cur

    if "id.orig_h" in fed and ("source", "address") in writes:
        assert _strvals(_get(d, "source", "address")) == fed["id.orig_h"], table
    if "id.resp_h" in fed and ("destination", "address") in writes:
        assert _strvals(_get(d, "destination", "address")) == fed["id.resp_h"], table
    if "id.orig_p" in fed and ("source", "port") in writes:
        got = _get(d, "source", "port")
        assert got is not None and int(_strvals(got)) == fed["id.orig_p"], table
    if "id.resp_p" in fed and ("destination", "port") in writes:
        got = _get(d, "destination", "port")
        assert got is not None and int(_strvals(got)) == fed["id.resp_p"], table
    if "uid" in fed and ("zeek", "session_id") in writes:
        assert _strvals(_get(d, "zeek", "session_id")) == fed["uid"], table

    # the per-proto payload subtree the program builds must exist
    proto_keys = {
        w[1]
        for w in writes
        if len(w) >= 2 and w[0] == "zeek" and w[1] != "session_id"
    }
    if proto_keys:
        zd = d.get("zeek") or {}
        assert any(zd.get(k) is not None for k in proto_keys), (
            f"{table}: none of zeek.{sorted(proto_keys)} present; "
            f"zeek keys={sorted(k for k, v in zd.items() if v is not None)}"
        )
