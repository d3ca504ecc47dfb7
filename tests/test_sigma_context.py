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


def test_alert_delivery_ledger(spark, tmp_path):
    from matano_spark.streaming.delivery import DeliveryLedger, deliver_batch

    alerts = spark.createDataFrame(
        [
            ("a1", "bf", "1.2.3.4", 5, True, "2024-05-01 12:00:00", "2024-05-01 12:12:00"),
            ("a2", "bf", "5.6.7.8", 2, False, "2024-05-01 12:00:00", None),
        ],
        "alert_id string, rule_name string, dedupe string, match_count long, "
        "activated boolean, first_matched_at string, created_at string",
    ).withColumn("first_matched_at", F.col("first_matched_at").cast("timestamp")) \
     .withColumn("created_at", F.col("created_at").cast("timestamp"))

    sent: list[tuple[str, dict]] = []
    ledger = DeliveryLedger(spark, str(tmp_path / "ledger"))
    n = deliver_batch(alerts, ["slack", "email"], ledger, lambda d, p: sent.append((d, p)))
    # only the ACTIVATED alert delivers, once per destination
    assert n == 2
    assert {d for d, _ in sent} == {"slack", "email"}
    assert all(p["alert_id"] == "a1" for _, p in sent)

    # second batch with the same alert → deduped, zero deliveries
    sent.clear()
    n2 = deliver_batch(alerts, ["slack", "email"], ledger, lambda d, p: sent.append((d, p)))
    assert n2 == 0 and sent == []


def test_map_value_functions(spark):
    from matano_spark.transform import Assign, Fn, P, compile_pipeline

    df = spark.createDataFrame(
        [("k1=1 k2=2",)], ["kv"]
    )
    out = compile_pipeline(
        [
            Assign("m", Fn("parse_key_value", P("kv"))),
            Assign("m", Fn("map_values", P("m"), fn=lambda v: F.concat(v, F.lit("0")))),
            Assign("ks", Fn("object_keys", P("m"))),
            Assign("vs", Fn("object_values", P("m"))),
        ]
    )(df)
    r = out.collect()[0].asDict(recursive=True)
    assert r["m"] == {"k1": "10", "k2": "20"}
    assert sorted(r["ks"]) == ["k1", "k2"]
    assert sorted(r["vs"]) == ["10", "20"]


def test_sigma_case_insensitive_and_wildcards(spark):
    # Sigma spec: string equality/contains match case-insensitively;
    # * and ? wildcards in plain values
    rule = {
        "title": "wildcard + case",
        "detection": {
            "selection": {"message": "failed password*"},
            "condition": "selection",
        },
    }
    out = sigma_filter(_events(spark), rule)
    assert sorted(r.id for r in out.collect()) == [1, 4]

    rule2 = {
        "title": "ci contains",
        "detection": {
            "selection": {"message|contains": "TLS HANDSHAKE"},
            "condition": "selection",
        },
    }
    assert [r.id for r in sigma_filter(_events(spark), rule2).collect()] == [3]

    rule3 = {
        "title": "single-char wildcard",
        "detection": {
            "selection": {"message": "Failed password for roo?"},
            "condition": "selection",
        },
    }
    assert [r.id for r in sigma_filter(_events(spark), rule3).collect()] == [1]


def test_sigma_contains_all_modifier(spark):
    rule = {
        "title": "all-of list",
        "detection": {
            "selection": {"message|contains|all": ["failed", "root"]},
            "condition": "selection",
        },
    }
    assert [r.id for r in sigma_filter(_events(spark), rule).collect()] == [1]


def test_sigma_cidr_modifier(spark):
    rule = {
        "title": "rfc1918 172.16/12 sources",
        "detection": {
            "selection": {"source.ip|cidr": "172.16.0.0/12"},
            "condition": "selection",
        },
    }
    assert [r.id for r in sigma_filter(_events(spark), rule).collect()] == [4]


def test_sigma_group_of_patterns(spark):
    rule = {
        "title": "selection groups",
        "detection": {
            "sel_auth": {"event.category": "authentication"},
            "sel_fail": {"event.outcome": "failure"},
            "filter_int": {"source.ip|startswith": "10."},
            "condition": "all of sel_* and not filter_int",
        },
    }
    assert [r.id for r in sigma_filter(_events(spark), rule).collect()] == [4]

    rule2 = {
        "title": "1 of group",
        "detection": {
            "sel_net": {"event.category": "network"},
            "sel_rdp": {"source.port": 3389},
            "condition": "1 of sel_*",
        },
    }
    assert sorted(r.id for r in sigma_filter(_events(spark), rule2).collect()) == [3, 4]


def test_sigma_list_of_maps_selection(spark):
    # Sigma list-of-maps = OR of the maps; must also participate in
    # "of them" conditions instead of being silently dropped
    rule = {
        "title": "list selection",
        "detection": {
            "selection": [
                {"source.port": 3389},
                {"event.category": "network"},
            ],
            "condition": "selection",
        },
    }
    assert sorted(r.id for r in sigma_filter(_events(spark), rule).collect()) == [3, 4]

    import pytest as _pytest

    bad = {
        "title": "keyword list unsupported",
        "detection": {"selection": ["some keyword"], "condition": "selection"},
    }
    with _pytest.raises(ValueError, match="unsupported sigma selection"):
        sigma_filter(_events(spark), bad)


def test_sigma_base64_modifier(spark):
    import base64

    enc = base64.b64encode(b"Failed password").decode()
    df = _events(spark).withColumn(
        "message_b64",
        F.concat(F.lit("prefix:"), F.base64(F.col("message").cast("binary"))),
    )
    rule = {
        "title": "b64-embedded credential failure",
        "detection": {
            "selection": {"message_b64|base64|contains": "Failed password"},
            "condition": "selection",
        },
    }
    assert [r.id for r in sigma_filter(df, rule).collect()] == [1, 4]
    # plain |base64 is exact equality on the encoded literal
    df2 = df.withColumn("exact_b64", F.lit(enc))
    rule2 = {
        "title": "exact b64",
        "detection": {
            "selection": {"exact_b64|base64": "Failed password"},
            "condition": "selection",
        },
    }
    assert sigma_filter(df2, rule2).count() == 4


def test_sigma_windash_modifier(spark):
    df = spark.createDataFrame(
        [
            (1, "cmd.exe /c whoami -all"),
            (2, "cmd.exe -c whoami /all"),
            (3, "powershell -encodedcommand xyz"),
        ],
        "id long, message string",
    )
    rule = {
        "title": "dash-variant command flag",
        "detection": {
            "selection": {"message|windash|contains": "-c whoami"},
            "condition": "selection",
        },
    }
    assert sorted(r.id for r in sigma_filter(df, rule).collect()) == [1, 2]


def test_sigma_windash_per_occurrence_and_unicode_dashes(spark):
    """ADVICE regression: multi-flag values must match MIXED
    obfuscation ('-foo /bar' for value '-foo -bar'), and the modern
    spec's en/em-dash variants must match too."""
    df = spark.createDataFrame(
        [
            (1, "x -foo /bar y"),   # mixed per-occurrence substitution
            (2, "x /foo -bar y"),
            (3, "x –foo —bar y"),  # en dash + em dash
            (4, "x -foo .bar y"),   # '.' is not a dash variant
        ],
        "id long, message string",
    )
    rule = {
        "title": "mixed dash obfuscation",
        "detection": {
            "selection": {"message|windash|contains": "-foo -bar"},
            "condition": "selection",
        },
    }
    assert sorted(r.id for r in sigma_filter(df, rule).collect()) == [1, 2, 3]
