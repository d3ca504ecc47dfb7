"""Program-slicing (projection pushdown through VRL transforms) —
transform/slice.py. The contract: for every `needed` path the sliced
program produces the SAME values and the SAME surviving row set as the
full program; everything else may be dropped."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matano_spark.transform.parser import parse_program
from matano_spark.transform.compiler import compile_pipeline
from matano_spark.transform.slice import slice_program


PROG = """
.event.kind = "event"
.event.outcome = downcase!(.outcome)
.user.name = .actor_name
.user.id = to_string!(.actor_id)
.http.request.method = upcase(.method) ?? null
.tmp_val = .url
.url = {"full": .tmp_val}
if .outcome == "DENY" { .event.severity = 99 }
if .drop_me == true { abort }
.url.domain = parse_url!(.tmp_val).host ?? null
del(.tmp_val)
"""


def _mk_df(spark):
    return spark.createDataFrame(
        [
            ("ALLOW", "alice", 1, "get", "http://a.example.com/x", False),
            ("DENY", "bob", 2, "post", "http://b.example.com/y", False),
            ("ALLOW", "carol", 3, "put", "http://c.example.com/z", True),
        ],
        "outcome string, actor_name string, actor_id long, method string, url string, drop_me boolean",
    )


def test_sliced_matches_full_on_needed_paths(spark):
    steps = parse_program(PROG)
    needed = ("event.outcome", "user.name")
    sliced = slice_program(steps, needed)
    assert len(sliced) < len(steps)  # it actually drops statements

    df = _mk_df(spark)
    full = compile_pipeline(steps)(df).select(
        F.col("event.outcome").alias("o"), F.col("user.name").alias("u")
    )
    cut = compile_pipeline(sliced)(df).select(
        F.col("event.outcome").alias("o"), F.col("user.name").alias("u")
    )
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, cut.collect()))


def test_slice_preserves_abort_row_membership(spark):
    steps = parse_program(PROG)
    # needed path is unrelated to the abort condition's fields — the
    # abort must survive the slice anyway (row membership)
    sliced = slice_program(steps, ("user.id",))
    df = _mk_df(spark)
    out = compile_pipeline(sliced)(df)
    assert out.count() == 2  # carol aborted


def test_slice_keeps_live_del(spark):
    prog = parse_program('.a = "x"\n.b = "y"\ndel(.a)')
    sliced = slice_program(prog, ("a", "b"))
    df = compile_pipeline(sliced)(
        _spark_one(spark)
    )
    r = df.collect()[0].asDict()
    assert r.get("a") is None
    assert r.get("b") == "y"


def test_slice_drops_dead_del_and_writes(spark):
    prog = parse_program('.a = "x"\n.b = "y"\ndel(.a)')
    sliced = slice_program(prog, ("b",))
    assert len(sliced) == 1  # only `.b = "y"` survives


def _spark_one(spark):
    return spark.createDataFrame([(1,)], "id long")


def test_slice_tracks_locals_transitively(spark):
    prog = parse_program(
        'x = .raw\ny = upcase!(x)\n.keep = y\n.dead = downcase!(x)'
    )
    sliced = slice_program(prog, ("keep",))
    assert len(sliced) == 3  # x, y, .keep — .dead dropped
    df = spark.createDataFrame([("Ab",)], "raw string")
    assert compile_pipeline(sliced)(df).collect()[0].keep == "AB"


def test_slice_foreach_kept_when_target_live(spark):
    prog = parse_program(
        """
.acc = []
if is_array(.items) {
  for_each(array!(.items)) -> |_i, v| { .acc = push(.acc, v) }
}
.other = "dead"
"""
    )
    sliced = slice_program(prog, ("acc",))
    df = spark.createDataFrame([(["a", "b"],)], "items array<string>")
    assert compile_pipeline(sliced)(df).collect()[0].acc == ["a", "b"]
    # and the dead assignment is gone
    full_n = len(parse_program(
        '.acc = []\nif is_array(.items) { for_each(array!(.items)) -> |_i, v| { .acc = push(.acc, v) } }\n.other = "dead"'
    ))
    assert len(sliced) < full_n


REF_OKTA = "/root/reference/data/managed/log_sources"


def test_okta_reference_program_slice_equivalence(spark):
    """The real okta/system transform: full vs sliced pipelines agree
    on the gate query's read set over synthesized events."""
    import os

    if not os.path.isdir(REF_OKTA):
        pytest.skip("reference tree not present")
    from matano_spark.workloads.sources import _table_def, _through_pipeline

    td = _table_def("okta", "system")
    needed = ("event.outcome", "user.name", "ts")
    raw = spark.createDataFrame(
        [
            ('{"published":"2024-01-02T03:04:05Z","eventType":"user.session.start","uuid":"u1","severity":"INFO","actor":{"alternateId":"a@x.com","id":"1","type":"User"},"outcome":{"result":"FAILURE"}}',),
            ('{"published":"2024-01-02T04:05:06Z","eventType":"user.session.start","uuid":"u2","severity":"INFO","actor":{"alternateId":"b@x.com","id":"2","type":"User"},"outcome":{"result":"SUCCESS"}}',),
        ],
        "json string",
    )
    full = _through_pipeline(td, raw).select(
        F.col("event.outcome"), F.col("user.name"), F.col("ts")
    )
    cut = _through_pipeline(td, raw, needed=needed).select(
        F.col("event.outcome"), F.col("user.name"), F.col("ts")
    )
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, cut.collect()))
