"""Sigma compiler tests + A4/A5 context aggregation and diff."""

from __future__ import annotations

from pyspark.sql import functions as F

from matano_spark.detections.sigma import compile_sigma, sigma_filter
from matano_spark.operators.alerts import aggregate_context, context_diff


def _events(spark):
    return spark.createDataFrame(
        [
            (1, ("authentication", "failure"), ("10.0.0.1", 22), "Failed password for root"),
            (2, ("authentication", "success"), ("10.0.0.2", 22), "Accepted publickey"),
            (3, ("network", "failure"), ("10.0.0.3", 443), "TLS handshake error"),
            (4, ("authentication", "failure"), ("172.16.0.9", 3389), "Failed password for admin"),
        ],
        "id long, event struct<category:string, outcome:string>, "
        "source struct<ip:string, port:long>, message string",
    )


def test_sigma_basic_and_not(spark):
    rule = {
        "title": "failed auth not internal",
        "detection": {
            "selection": {
                "event.category": "authentication",
                "event.outcome": "failure",
            },
            "internal": {"source.ip|startswith": "10."},
            "condition": "selection and not internal",
        },
    }
    out = sigma_filter(_events(spark), rule)
    assert [r.id for r in out.collect()] == [4]


def test_sigma_modifiers_and_lists(spark):
    rule = {
        "detection": {
            "sel": {
                "message|contains": ["password", "publickey"],
                "source.port|lte": 22,
            },
            "condition": "sel",
        }
    }
    out = sigma_filter(_events(spark), rule)
    assert sorted(r.id for r in out.collect()) == [1, 2]


def test_sigma_one_of_them_and_regex(spark):
    rule = {
        "detection": {
            "a": {"message|re": "^TLS .*error$"},
            "b": {"source.ip": "172.16.0.9"},
            "condition": "1 of them",
        }
    }
    out = sigma_filter(_events(spark), rule)
    assert sorted(r.id for r in out.collect()) == [3, 4]


def test_sigma_missing_field_is_false(spark):
    rule = {
        "detection": {
            "sel": {"does.not.exist": "x"},
            "neg": {"event.category": "authentication"},
            "condition": "sel or neg",
        }
    }
    out = sigma_filter(_events(spark), rule)
    assert sorted(r.id for r in out.collect()) == [1, 2, 4]


def test_context_aggregation_and_diff(spark):
    m1 = spark.createDataFrame(
        [
            ("a1", "10.0.0.1", "root"),
            ("a1", "10.0.0.1", "admin"),
            ("a2", "10.0.0.9", "bob"),
        ],
        "alert_id string, src_ip string, user string",
    )
    ctx1 = aggregate_context(m1, ["alert_id"], ["src_ip", "user"])
    rows = {r.alert_id: r.asDict(recursive=True) for r in ctx1.collect()}
    assert rows["a1"]["context"] == {
        "src_ip": ["10.0.0.1"],
        "user": ["admin", "root"],
    }
    assert rows["a1"]["match_count"] == 2

    # generation 2: a1 gains a user, a2 unchanged, a3 appears
    m2 = spark.createDataFrame(
        [
            ("a1", "10.0.0.1", "root"),
            ("a1", "10.0.0.1", "admin"),
            ("a1", "10.0.0.2", "admin"),
            ("a2", "10.0.0.9", "bob"),
            ("a3", "10.0.0.7", "eve"),
        ],
        "alert_id string, src_ip string, user string",
    )
    ctx2 = aggregate_context(m2, ["alert_id"], ["src_ip", "user"])
    diff = {
        r.alert_id: r.asDict(recursive=True)["changed"]
        for r in context_diff(ctx1, ctx2, ["alert_id"]).collect()
    }
    assert set(diff) == {"a1", "a3"}  # a2 unchanged → no CDC row
    assert diff["a1"]["src_ip"] == ["10.0.0.1", "10.0.0.2"]
    assert diff["a3"]["user"] == ["eve"]
