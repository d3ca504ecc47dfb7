"""Property-based tests (hypothesis): the alert state machine against
a pure-Python reference on random match sequences, hashing/fold
invariants, and P7 schema-cast routing."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from matano_spark.operators.alerts import aggregate_alerts
from matano_spark.schema.cast import apply_schema

T0 = dt.datetime(2024, 5, 1, 0, 0, 0)


def reference_fold(offsets, threshold, window_s):
    """Pure-Python oracle of the fixed-anchor recurrence
    (matano_alerts.rs:92-307 semantics)."""
    alerts = []
    anchor = None
    cur = None
    for off in sorted(offsets):
        t = T0 + dt.timedelta(seconds=off)
        if anchor is None or (t - anchor).total_seconds() >= window_s:
            if cur:
                alerts.append(cur)
            anchor = t
            cur = {"first": t, "last": t, "n": 1, "act": 1 >= threshold,
                   "created": t if 1 >= threshold else None}
        else:
            cur["n"] += 1
            cur["last"] = t
            if not cur["act"] and cur["n"] >= threshold:
                cur["act"] = True
                cur["created"] = t
    if cur:
        alerts.append(cur)
    return alerts


# One spark-backed hypothesis test keeps runtime sane: moderate examples,
# distinct offsets (equal timestamps have no deterministic tie order in
# the reference fold either).
@settings(max_examples=15, deadline=None)
@given(
    offsets=st.lists(
        st.integers(min_value=0, max_value=4 * 3600), min_size=1, max_size=40,
        unique=True,
    ),
    threshold=st.integers(min_value=1, max_value=5),
    window_minutes=st.sampled_from([5, 30, 60]),
)
def test_alert_state_machine_matches_reference(spark_global, offsets, threshold, window_minutes):
    spark = spark_global
    rows = [
        ("r", "k", T0 + dt.timedelta(seconds=off), f"m{off}") for off in offsets
    ]
    df = spark.createDataFrame(
        rows, "rule_name string, dedupe string, ts timestamp, match_id string"
    )
    got = sorted(
        (
            (r.first_matched_at, r.last_matched_at, r.match_count, r.activated,
             r.created_at)
            for r in aggregate_alerts(
                df, threshold=threshold, window_seconds=window_minutes * 60
            ).collect()
        )
    )
    expect = sorted(
        (a["first"], a["last"], a["n"], a["act"], a["created"])
        for a in reference_fold(offsets, threshold, window_minutes * 60)
    )
    assert got == expect


# Register a session fixture alias usable inside @given (function-scoped
# fixtures don't mix with hypothesis).
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


def test_apply_schema_routes_mismatches(spark):
    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("port", T.LongType()),
                        T.StructField("host", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [
            ("1", ("443", "a")),
            ("oops", ("80", "b")),      # n fails
            ("3", ("not-a-port", "c")),  # meta.port fails
            (None, (None, "d")),         # nulls are fine
        ],
        "n string, meta struct<port:string, host:string>",
    )
    good, bad = apply_schema(df, schema)
    assert good.schema["n"].dataType == T.LongType()
    good_rows = {r.asDict(recursive=True)["meta"]["host"] for r in good.collect()}
    assert good_rows == {"a", "d"}
    bad_rows = {
        r.asDict(recursive=True)["meta"]["host"]: r.mismatch_fields
        for r in bad.collect()
    }
    assert bad_rows == {"b": ["n"], "c": ["meta"]}


def test_apply_schema_flags_scalar_where_struct_declared(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "geo", T.StructType([T.StructField("city", T.StringType())])
            ),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    df = spark.createDataFrame(
        [
            (1, "not-a-struct", "not-an-array"),  # geo + tags both mismatch
            (2, None, None),                      # nulls fine
        ],
        "id long, geo string, tags string",
    )
    good, bad = apply_schema(df, schema)
    assert [r.id for r in good.collect()] == [2]
    b = bad.collect()
    assert len(b) == 1
    assert sorted(b[0].mismatch_fields) == ["geo", "tags"]
