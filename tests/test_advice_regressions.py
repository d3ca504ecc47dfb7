"""Regression tests for the round-2/3 ADVICE findings: conditional
self-append null semantics, parse_regex mixed named/unnamed group
indexing, and session-timezone-independent ts_hour partitioning."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_conditional_push_keeps_null_when_guard_false(spark):
    """`if cond { .a = push(.a, x) }` with cond FALSE must leave a null
    target NULL — the assignment never ran in VRL; it must not coalesce
    to an empty array."""
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program(
        'if .flag == true { .acc = push(.acc, .val) }'
    )
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame(
        [(True, "x"), (False, "y")], ["flag", "val"]
    )
    rows = {r.flag: r for r in pipe(df).collect()}
    assert rows[True].acc == ["x"]
    assert rows[False].acc is None  # NOT []


def test_conditional_append_keeps_null_when_guard_false(spark):
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program(
        'if .flag == true { .acc = append(.acc, .vals) }'
    )
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame(
        [(True, ["a", "b"]), (False, ["c"])], ["flag", "vals"]
    )
    rows = {r.flag: r for r in pipe(df).collect()}
    assert rows[True].acc == ["a", "b"]
    assert rows[False].acc is None


def test_parse_regex_mixed_named_and_unnamed_groups(spark):
    """A named group after an UNNAMED capture must extract by its true
    group number (2 here), not its position among named groups (1)."""
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program(
        '.out = parse_regex(.s, pattern: "^(foo|bar)-(?P<num>[0-9]+)-(?P<word>[a-z]+)$")'
    )
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame([("foo-42-abc",)], ["s"])
    r = pipe(df).select("out.num", "out.word").collect()[0]
    assert r.num == "42"
    assert r.word == "abc"


def test_parse_regex_all_mixed_groups(spark):
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program(
        '.out = parse_regex_all(.s, pattern: "(k|q)=(?P<v>[0-9]+)")'
    )
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame([("k=1 q=2",)], ["s"])
    r = pipe(df).select("out").collect()[0]
    assert [m.v for m in r.out] == ["1", "2"]


def test_ts_hour_partition_pinned_to_utc(spark):
    """ts_hour must derive from the UTC hour of the instant regardless
    of the session timezone (ref: UTC hour partition path)."""
    from matano_spark.lake import ts_hour_utc

    df = spark.createDataFrame(
        [(dt.datetime(2024, 5, 1, 23, 30),)], ["ts"]
    )  # interpreted in session tz (UTC here) => instant 23:30Z
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        utc_val = df.select(ts_hour_utc("ts").alias("h")).collect()[0].h
        assert utc_val == "2024-05-01-23"
        # re-render the SAME instants under a shifted session tz: the
        # partition key must not move
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = df.select(ts_hour_utc("ts").alias("h")).collect()[0].h
        assert shifted == utc_val
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_prefilter_partitions_per_rule(spark):
    """One untraceable rule must NOT disable the JVM prefilter for the
    traceable rules: the traceable branch's scan keeps the pushed
    filter, and the dynamic rule still sees every row."""
    from matano_spark.detections import Detection, run_detections

    import datetime as _dt

    t0 = _dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [(i, "login_failed" if i % 10 == 0 else "ok", float(i),
             t0 + _dt.timedelta(seconds=i)) for i in range(100)]
    df = spark.createDataFrame(rows, ["event_id", "action", "value", "ts"])

    def traceable(record):
        return record.deepget("action") == "login_failed"

    def dynamic(record):  # defeats the tracer: data-dependent branch
        v = record.deepget("value") or 0.0
        acc = 0.0
        while acc < v:  # loop count depends on the value
            acc += 37.0
        return acc == 74.0  # true for values in (37, 74]

    dets = [
        Detection(name="fast_rule", detect=traceable, severity="low"),
        Detection(name="dyn_rule", detect=dynamic, severity="low"),
    ]
    out = run_detections(df, dets, ts_col="ts", key_col="event_id")
    by_rule = {
        r.rule_name: r.cnt
        for r in out.groupBy("rule_name").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_rule["fast_rule"] == 10
    assert by_rule["dyn_rule"] == 37  # values 38..74


# -- round-6 ADVICE regressions -------------------------------------


def test_parse_url_duplicate_query_params_last_wins(spark):
    """?a=1&a=2 must not throw DUPLICATED_MAP_KEY (default
    mapKeyDedupPolicy=EXCEPTION); VRL parse_url keeps the last value."""
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program('.u = parse_url!(.url)')
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame(
        [
            ("http://example.com/p?a=1&a=2&b=3",),
            ("https://h.io/x?k=only",),
        ],
        ["url"],
    )
    rows = pipe(df).select("u.query").collect()
    assert rows[0].query["a"] == "2"  # last wins
    assert rows[0].query["b"] == "3"
    assert rows[1].query == {"k": "only"}


def test_join_nonliteral_separator_empty_array(spark):
    """join(arr, sep_col) on an EMPTY array must return "" — plain
    element_at(arr, 1) throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT under
    ANSI mode."""
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program('.out = join!(.arr, .sep)')
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame(
        [(["a", "b"], ","), ([], ",")], ["arr", "sep"]
    )
    rows = pipe(df).select("out").collect()
    assert rows[0].out == "a,b"
    assert rows[1].out == ""


def test_root_rest_delete_emits_no_void_column(spark):
    """del of a key that only exists in the root dynamic remainder must
    REMOVE it — not emit a void-typed null column (fails parquet
    sinks), and later reads must not resurrect it through the
    remainder."""
    import json as _json
    import os as _os
    import tempfile as _tempfile

    from pyspark.sql import types as T

    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program(
        '.json = parse_json!(.payload)\n'
        '. = del(.json)\n'
        '.keep2 = .drop_me\n'
        'del(.drop_me)\n'
        '.probe = .drop_me\n'
    )
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame(
        [(_json.dumps({"keep": "k", "drop_me": "d"}),)], ["payload"]
    )
    out = pipe(df).drop("payload")
    assert "drop_me" not in out.columns
    assert not any(
        isinstance(f.dataType, T.NullType) for f in out.schema.fields
    ), out.schema
    r = out.collect()[0]
    assert str(r.keep2).strip('"') == "d"  # read BEFORE the del sees it
    assert r.probe is None  # read AFTER the del must not resurrect
    # the real failure mode: a void column kills the parquet sink
    d = _os.path.join(_tempfile.gettempdir(), "tomb_sink_test")
    out.write.mode("overwrite").parquet(d)
    import shutil as _shutil

    _shutil.rmtree(d, ignore_errors=True)


def test_root_rest_delete_mask_survives_chunk_boundary(spark, monkeypatch):
    """Tombstones are compile-time state: with a 1-step chunk size the
    del and the later read land in different chunks, and the spilled
    __root_rest column still physically holds the key."""
    import json as _json

    monkeypatch.setenv("MATANO_VRL_STAGE_CHUNK", "1")
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program(
        '.json = parse_json!(.payload)\n'
        '. = del(.json)\n'
        'del(.gone)\n'
        '.probe = .gone\n'
        '.keep_out = .keep\n'
    )
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame(
        [(_json.dumps({"keep": "k", "gone": "g"}),)], ["payload"]
    )
    out = pipe(df)
    assert "gone" not in out.columns
    r = out.collect()[0]
    assert r.probe is None
    assert str(r.keep_out).strip('"') == "k"


def test_includes_null_membership_list(spark):
    """includes([null, "", "-"], x): a null x must match (explicit
    null membership), and the literal string "None" must NOT."""
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program(
        '.hit = includes([null, "", "-"], .v)'
    )
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame(
        [("x1", None), ("x2", ""), ("x3", "-"), ("x4", "None"), ("x5", "v")],
        ["id", "v"],
    )
    rows = {r.id: r.hit for r in pipe(df).collect()}
    assert rows["x1"] is True
    assert rows["x2"] is True
    assert rows["x3"] is True
    assert rows["x4"] is False  # "None" is not null
    assert rows["x5"] is False


def test_guarded_self_merge_keeps_old_fields(spark):
    """cloudtrail's `fields, err = get(mappings, [.event.action]);
    if err == null && fields != null { .event = merge(.event, ...) }`:
    rows whose action is NOT in the mapping must keep every pre-merge
    .event field — the off-guard arm of a struct→struct retype must
    rebuild the old value in the new shape, not null it."""
    import json as _json

    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program(
        '.event.action = .json.eventName\n'
        '.event.kind = "event"\n'
        'mappings = {"AddUser": {"category": ["iam"], "type": ["user"]}}\n'
        'fields, err = get(mappings, [.event.action])\n'
        'if err == null && fields != null {\n'
        '  .event = merge(.event, object!(fields), deep: true)\n'
        '}\n'
    )
    pipe = compile_pipeline(prog)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Unmapped",), ("AddUser",)], "et string"
    ).select(
        F.parse_json(
            F.to_json(F.struct(F.col("et").alias("eventName")))
        ).alias("json")
    )
    out = pipe(df)
    assert out.count() == 2  # no row may be dropped
    rows = {
        str(r["action"]).strip('"'): r
        for r in out.select(
            F.col("event.action").cast("string").alias("action"),
            F.col("event.kind").cast("string").alias("kind"),
            F.col("event.category").cast("string").alias("category"),
        ).collect()
    }
    assert rows["Unmapped"].kind == "event"  # old field survived
    assert rows["Unmapped"].category is None
    assert rows["AddUser"].kind == "event"
    assert "iam" in rows["AddUser"].category


def test_abort_coalesce_scoped_to_guard(spark):
    """`x ?? { abort }` inside `if g { ... }` must only drop rows where
    g fired — VRL never evaluates the expression when the guard is
    false."""
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline
    from pyspark.sql import functions as F

    prog = parse_program(
        'if .kind == "strict" {\n'
        '  .v = to_int(.maybe) ?? { abort }\n'
        '}\n'
    )
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame(
        [
            ("strict", "12"),   # guard fires, parse ok → kept
            ("strict", None),   # guard fires, null → aborted
            ("lax", None),      # guard false → MUST be kept
        ],
        "kind string, maybe string",
    )
    out = pipe(df).select("kind", "maybe").collect()
    kinds = sorted((r.kind, r.maybe) for r in out)
    assert kinds == [("lax", None), ("strict", "12")]


def test_delete_then_nested_write_does_not_resurrect(spark):
    """`del(.a); .a.b = "new"` after a schemaless root spread must
    yield {a: {b: "new"}} — the nested write starts from an empty
    object, never from the root remainder's old subtree (round-7
    ADVICE: the tombstone was discarded before path resolution, so
    `.a` resolved through the root remainder and resurrected `old`)."""
    import json as _json
    from matano_spark.transform.parser import compile_vrl
    from pyspark.sql import functions as F
    from pyspark.sql.types import VariantVal

    df = spark.createDataFrame(
        [('{"a": {"old": "X"}, "keep": 1}',)], "raw string"
    ).select(F.parse_json("raw").alias("json"))
    prog = '. = del(.json)\ndel(.a)\n.a.b = "new"\n.k2 = .keep'
    out = compile_vrl(prog)(df)

    def norm(v):
        if isinstance(v, VariantVal):
            return norm(_json.loads(v.toJson()))
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        if isinstance(v, list):
            return [norm(x) for x in v]
        return v

    d = norm(out.collect()[0].asDict(recursive=True))
    assert d.get("a") == {"b": "new"}, d
    # non-deleted keys still resolve through the root remainder
    assert norm(d.get("k2")) == 1


# ---- round-9 ADVICE fixes -------------------------------------------


def test_del_read_assign_same_path_keeps_written_value(spark):
    """`.a = upcase!(del(.a))` — VRL dels FIRST, then the assign
    re-creates the path; the deferred del flush must not clobber the
    just-written value (round-8 ADVICE, compiler deferred-__del_read)."""
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program('.a = upcase!(del(.a))')
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame([("foo",)], ["a"])
    assert pipe(df).collect()[0].a == "FOO"


def test_del_read_assign_other_path_still_deletes(spark):
    """The overlap skip must not weaken the normal case: reading into
    a DIFFERENT target still removes the del'd source."""
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program('.b = upcase!(del(.a))')
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame([("foo",)], ["a"])
    r = pipe(df).collect()[0]
    assert r.b == "FOO"
    assert "a" not in r.asDict() or r.asDict().get("a") is None


def test_guarded_del_local_keeps_value_for_nonmatching_rows(spark):
    """del(local) inside an `if` branch must erase the local ONLY for
    rows matching the guard (round-8 ADVICE, Delete var branch)."""
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program(
        'x = .val\nif .flag == true { del(x) }\n.out = x'
    )
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame(
        [(True, "gone"), (False, "kept")], ["flag", "val"]
    )
    rows = {r.flag: r for r in pipe(df).collect()}
    assert rows[True].out is None
    assert rows[False].out == "kept"


def test_lazy_or_del_fires_on_false_lhs(spark):
    """VRL `||` also evaluates the rhs when the lhs is FALSE (not just
    null): `exists(.a) || del(.b)` must delete .b on rows where .a is
    absent (round-8 ADVICE, lazy-arm del guard)."""
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program('.got = exists(.a) || del(.b)\n.keep = .b')
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame(
        [("x", "b1"), (None, "b2")], ["a", "b"]
    )
    rows = {r.b is not None and "present" or "absent": r for r in []}
    out = pipe(df).collect()
    by_a = {("x" if r.a == "x" else None): r for r in out}
    assert by_a["x"].keep == "b1"      # lhs true: rhs never ran
    assert by_a[None].keep is None     # lhs false: del fired


def test_when_condition_del_flushes_unconditionally(spark):
    """A del() inside an `if` CONDITION is evaluated for every row —
    it must not inherit the branch guard (round-8 ADVICE)."""
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program(
        'if del(.flag) == "y" { .out = "hit" }\n.keep = .flag'
    )
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame([("y",), ("n",)], ["flag"])
    out = pipe(df).collect()
    assert all(r.keep is None for r in out), out
    by_out = sorted((r.out for r in out), key=lambda v: (v is None, v))
    assert by_out == ["hit", None]


def test_variant_compact_drops_empty_objects_and_arrays(spark):
    """VRL compact defaults also drop empty objects/arrays; a STRING
    value "{}" must survive (round-8 ADVICE, functions compact)."""
    import json as _json
    from matano_spark.transform.parser import parse_program
    from matano_spark.transform.compiler import compile_pipeline

    prog = parse_program('.out = encode_json(compact!(parse_json(.s)))')
    pipe = compile_pipeline(prog)
    df = spark.createDataFrame(
        [('{"x":{},"y":[],"z":"v","w":"","c":"{}"}',)], ["s"]
    )
    got = _json.loads(pipe(df).collect()[0].out)
    assert got == {"z": "v", "c": "{}"}, got
