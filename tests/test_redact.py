"""PII redaction operator — pattern behavior and plan shape."""

from __future__ import annotations

from matano_spark.operators.redact import redact_documents


def test_redacts_all_three_classes(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@example.co.uk for details"),
            (2, "server at 192.168.10.7 timed out"),
            (3, "call +1-555-867-5309 or 030 555 123456"),
            (4, "clean text with no pii at all"),
            (5, "mix: a@b.io from 10.0.0.1 dial 555-123-4567"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_documents(df).collect()}

    assert out[1].text_redacted == "contact <EMAIL> for details"
    assert out[1].n_email == 1 and out[1].n_ipv4 == 0 and out[1].n_phone == 0

    assert out[2].text_redacted == "server at <IP> timed out"
    assert out[2].n_ipv4 == 1

    assert "<PHONE>" in out[3].text_redacted and out[3].n_phone == 2
    assert "5309" not in out[3].text_redacted

    assert out[4].text_redacted == out[4].text
    assert (out[4].n_email, out[4].n_ipv4, out[4].n_phone) == (0, 0, 0)

    assert out[5].text_redacted == "mix: <EMAIL> from <IP> dial <PHONE>"


def test_redaction_is_map_only(spark):
    df = spark.createDataFrame([(1, "a@b.io")], "doc_id long, text string")
    plan = (
        redact_documents(df)._jdf.queryExecution().executedPlan().toString()
    )
    # no shuffle anywhere in a redaction pass
    assert "Exchange" not in plan
