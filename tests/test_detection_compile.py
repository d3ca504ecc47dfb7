"""Concolic detection-predicate compiler: compiled Columns must agree
with the Python predicate row-for-row (nulls included), and anything
untraceable must abort compilation rather than mis-compile."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from matano_spark.detections import DeepDict, Detection, run_detections
from matano_spark.detections.compile import Untraceable, compile_predicate


@pytest.fixture(scope="module")
def rows_df(spark):
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("name", T.StringType()),
            T.StructField(
                "meta", T.StructType([T.StructField("plan", T.StringType())])
            ),
        ]
    )
    data = [
        ("error", 7.0, "Alice", ("pro",)),
        ("error", 3.0, "bob", ("free",)),
        ("login", 9.0, None, (None,)),
        (None, None, "carol", None),
        ("error", None, "", ("pro",)),
    ]
    return spark.createDataFrame(data, schema)


def _assert_equivalent(spark, df, fn):
    compiled = compile_predicate(fn, df.schema)
    spark_ids = {
        i for i, r in enumerate(df.withColumn("__i", F.monotonically_increasing_id()).collect())
    }
    got = [
        r["__i"]
        for r in df.withColumn("__i", F.monotonically_increasing_id())
        .filter(compiled)
        .collect()
    ]
    want = []
    for r in df.withColumn("__i", F.monotonically_increasing_id()).collect():
        rec = DeepDict(r.asDict(recursive=True))
        try:
            hit = bool(fn(rec))
        except Exception:
            hit = False
        if hit:
            want.append(r["__i"])
    assert sorted(got) == sorted(want), f"compiled {got} != python {want}"
    assert spark_ids  # sanity


PREDICATES = [
    lambda r: r.deepget("event_type") == "error",
    lambda r: r.deepget("event_type") != "error",  # None != → True
    lambda r: r.deepget("event_type") == "error" and r.deepget("value", 0.0) > 5.0,
    lambda r: r.deepget("event_type") == "error" or r.deepget("value", 0.0) > 8.0,
    lambda r: r.deepget("value", 0.0) + 1 > 4 and not r.deepget("event_type") == "login",
    lambda r: r.deepget("meta.plan") == "pro",
    lambda r: r.deepget("missing.path", "x") == "x",
    lambda r: r.deepget("event_type") in ("error", "login"),
    lambda r: r.deepget("name", "").lower().startswith("a"),
    lambda r: r.deepget("value") is not None and r.deepget("value") > 5,  # falls back
]


@pytest.mark.parametrize("idx", range(len(PREDICATES) - 1))
def test_compiled_predicate_matches_python(spark, rows_df, idx):
    _assert_equivalent(spark, rows_df, PREDICATES[idx])


def test_identity_test_is_untraceable(rows_df):
    with pytest.raises(Untraceable):
        compile_predicate(PREDICATES[-1], rows_df.schema)


def test_isinstance_and_hash_are_untraceable(rows_df):
    with pytest.raises(Untraceable):
        compile_predicate(
            lambda r: isinstance(r.deepget("name"), str), rows_df.schema
        )
    with pytest.raises(Untraceable):
        compile_predicate(
            lambda r: r.deepget("event_type") in {"error"}, rows_df.schema
        )
    with pytest.raises(Untraceable):
        compile_predicate(
            lambda r: len(r.deepget("name")) > 2, rows_df.schema
        )


def test_regex_predicate_falls_back(rows_df):
    import re

    with pytest.raises(Untraceable):
        compile_predicate(
            lambda r: re.match(r"err", r.deepget("event_type") or ""),
            rows_df.schema,
        )


def test_run_detections_prefilter_same_output_and_pushdown(spark, rows_df):
    df = rows_df.withColumn("ts", F.lit("2024-05-01 10:00:00").cast("timestamp")).withColumn(
        "event_id", F.monotonically_increasing_id().cast("string")
    )
    det = Detection(
        name="err",
        detect=lambda r: r.deepget("event_type") == "error"
        and r.deepget("value", 0.0) > 5.0,
        dedupe=lambda r: r.deepget("name"),
        title=lambda r: f"err by {r.deepget('name')}",
    )
    fast = run_detections(df, [det], key_col="event_id")
    slow = run_detections(df, [det], key_col="event_id", prefilter=False)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))
    # the compiled disjunction must appear as a Filter in the plan
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "event_type" in plan and "Filter" in plan


def test_mixed_traceable_untraceable_disables_prefilter(spark, rows_df):
    df = rows_df.withColumn("ts", F.lit("2024-05-01 10:00:00").cast("timestamp"))
    import re

    dets = [
        Detection(name="a", detect=lambda r: r.deepget("event_type") == "error"),
        Detection(
            name="b",
            detect=lambda r: bool(re.match("log", r.deepget("event_type") or "")),
        ),
    ]
    out = run_detections(df, dets)  # must not throw, must include rule b
    names = {r.rule_name for r in out.collect()}
    assert names == {"a", "b"}
