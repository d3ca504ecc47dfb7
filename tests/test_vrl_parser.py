"""VRL-text parser + config loader tests: matano-style program text
and log_source.yml directories compile and run."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
from pathlib import Path

import pytest

from matano_spark.schema.config import load_log_source, merge_configs
from matano_spark.transform.parser import compile_vrl, parse_program
from matano_spark.transform import ast


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="matano_spark_vrl_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def row(df):
    return df.collect()[0].asDict(recursive=True)


def test_parse_assignment_and_move():
    steps = parse_program('.event.action = "login"\n.user = del(.raw_user)')
    assert steps[0] == ast.Assign("event.action", ast.L("login")) or (
        isinstance(steps[0], ast.Assign) and steps[0].path == "event.action"
    )
    assert isinstance(steps[1], ast.Move)
    assert steps[1].dst == "user" and steps[1].src == "raw_user"


def test_vrl_program_end_to_end(spark):
    src = """
    .ts = to_timestamp!(.event_time)
    .event.action = downcase(.action)
    .size = to_int(.size_str) ?? 0
    if .status == "fail" { .event.outcome = "failure" }
    else { .event.outcome = "success" }
    if .action == "SKIPME" { abort }
    del(.event_time); del(.action); del(.status); del(.size_str)
    .ecs.version = "8.5.0"
    """
    df = spark.createDataFrame(
        [
            ("2024-05-01T10:00:00Z", "LOGIN", "fail", "42"),
            ("2024-05-01T11:00:00Z", "SKIPME", "ok", "x"),
        ],
        ["event_time", "action", "status", "size_str"],
    )
    out = compile_vrl(src)(df)
    rows = [r.asDict(recursive=True) for r in out.collect()]
    assert len(rows) == 1  # SKIPME row aborted
    r = rows[0]
    assert r["ts"] == dt.datetime(2024, 5, 1, 10, 0, 0)
    assert r["event"] == {"action": "login", "outcome": "failure"}
    assert r["size"] == 42
    assert r["ecs"] == {"version": "8.5.0"}
    assert set(out.columns) == {"ts", "event", "size", "ecs"}


def test_vrl_named_args_and_concat(spark):
    src = """
    .g = parse_grok(.line, pattern: "^%{IP:ip} %{WORD:verb}$")
    .label = "verb=" + .g.verb
    .ok = match(.line, pattern: "GET")
    """
    df = spark.createDataFrame([("10.0.0.1 GET",)], ["line"])
    r = row(compile_vrl(src)(df))
    assert r["g"] == {"ip": "10.0.0.1", "verb": "GET"}
    assert r["label"] == "verb=GET"
    assert r["ok"] is True


def test_coalesce_on_fallible_cast(spark):
    src = '.n = to_int(.v) ?? -1'
    df = spark.createDataFrame([("12",), ("oops",)], ["v"])
    out = compile_vrl(src)(df)
    assert sorted(r.n for r in out.collect()) == [-1, 12]


def test_merge_configs_prepends_managed_transform():
    managed = {"transform": '.a = 1', "ingest": {"x": 1}}
    user = {"transform": '.b = 2', "ingest": {"y": 2}}
    merged = merge_configs(managed, user)
    assert merged["transform"].index(".a") < merged["transform"].index(".b")
    assert merged["ingest"] == {"x": 1, "y": 2}


def test_load_log_source_directory(spark, tmpdir):
    (tmpdir / "tables").mkdir()
    (tmpdir / "log_source.yml").write_text(
        """
name: demo_source
schema:
  ecs_field_names: [source.ip, event.action]
transform: |
  .ts = to_timestamp!(.t)
"""
    )
    (tmpdir / "tables" / "main.yml").write_text(
        """
name: main
schema:
  ecs_field_names: [user.name]
  fields:
    demo:
      code: string
transform: |
  .event.action = downcase(.verb)
  .user.name = .who
  .demo.code = "d1"
  del(.t); del(.verb); del(.who)
"""
    )
    defs = load_log_source(str(tmpdir))
    assert len(defs) == 1
    td = defs[0]
    assert td.log_source == "demo_source" and td.name == "main"
    names = [f.name for f in td.schema.fields]
    assert names[0] == "ts"
    assert {"source", "event", "user", "demo"} <= set(names)

    df = spark.createDataFrame(
        [("2024-05-01T10:00:00Z", "GET", "alice")], ["t", "verb", "who"]
    )
    r = row(td.pipeline(df))
    assert r["event"]["action"] == "get"
    assert r["user"] == {"name": "alice"}
    assert r["demo"] == {"code": "d1"}
    assert r["ts"] == dt.datetime(2024, 5, 1, 10, 0)


def test_nested_conditional_abort_parses_to_anded_cond():
    # `if A { if B { abort } }` must abort only when A AND B — not A alone.
    steps = parse_program('if .a == 1 { if .b == 2 { abort } }')
    assert len(steps) == 1
    s = steps[0]
    assert isinstance(s, ast.AbortIf)
    c = s.cond
    assert isinstance(c, ast.BinOp) and c.op == "&"
    assert isinstance(c.left, ast.BinOp) and c.left.op == "=="
    assert isinstance(c.right, ast.BinOp) and c.right.op == "=="


def test_nested_conditional_abort_end_to_end(spark):
    src = """
    if .a == 1 { if .b == 2 { abort } }
    .keep = true
    """
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 2), (9, 9)], ["a", "b"]
    )
    out = compile_vrl(src)(df)
    rows = sorted((r["a"], r["b"]) for r in out.collect())
    assert rows == [(1, 3), (2, 2), (9, 9)]  # only (1,2) aborted


def test_conditional_abort_with_else_preserved(spark):
    src = """
    if .a == 1 { abort } else { .tag = "kept" }
    """
    df = spark.createDataFrame([(1,), (2,)], ["a"])
    out = compile_vrl(src)(df)
    rows = [r.asDict() for r in out.collect()]
    assert len(rows) == 1
    assert rows[0]["a"] == 2 and rows[0]["tag"] == "kept"


def test_closure_map_values_recursive(spark):
    """The vpcflow/panw shape: map_values(..., recursive: true) with a
    VRL closure body (if/else-if expression chain) compiled entirely to
    column surgery — numeric strings coerce, nullish to null."""
    src = """
    .out = map_values(.rec, recursive: true) -> |v| {
      if is_nullish(v) { null } else if is_string(v) { to_int(v) ?? v } else { v }
    }
    """
    df = spark.createDataFrame(
        [(("42", "-", ("7", "x"),),)],
        "rec struct<a:string, b:string, inner:struct<n:string, s:string>>",
    )
    out = compile_vrl(src)(df)
    r = out.select("out").collect()[0].asDict(recursive=True)["out"]
    assert r == {"a": "42", "b": None, "inner": {"n": "7", "s": "x"}}


def test_closure_map_each_and_filter(spark):
    src = """
    .up = map_each(.xs) -> |v| { upcase(v) }
    .longs = filter(.xs) -> |v| { length(v) > 1 }
    """
    df = spark.createDataFrame([(["ab", "c", "def"],)], "xs array<string>")
    r = compile_vrl(src)(df).collect()[0].asDict(recursive=True)
    assert r["up"] == ["AB", "C", "DEF"]
    assert r["longs"] == ["ab", "def"]


def test_parse_regex_all(spark):
    src = r"""
    .hits = parse_regex_all(.line, pattern: "(?P<k>\\w+)=(?P<val>\\d+)")
    """
    df = spark.createDataFrame([("a=1 b=22 c=x d=3",)], ["line"])
    r = compile_vrl(src)(df).collect()[0].asDict(recursive=True)
    assert r["hits"] == [
        {"k": "a", "val": "1"},
        {"k": "b", "val": "22"},
        {"k": "d", "val": "3"},
    ]


def test_map_values_on_map_type(spark):
    src = """
    .m2 = map_values(.m) -> |v| { to_int(v) ?? v }
    """
    df = spark.createDataFrame([({"x": "5", "y": "n/a"},)], "m map<string,string>")
    r = compile_vrl(src)(df).collect()[0].asDict(recursive=True)
    assert r["m2"] == {"x": "5", "y": "n/a"}
