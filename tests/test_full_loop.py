"""Full detection→alert→delivery lifecycle (SURVEY.md §3.2) on the B7
brute-force fixture: ECS-shaped auth events → Python detection →
fixed-anchor state machine → context aggregation → deduped delivery."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from matano_spark.detections import Detection, run_detections
from matano_spark.operators.alerts import aggregate_alerts, aggregate_context
from matano_spark.streaming.delivery import DeliveryLedger, deliver_batch

T0 = dt.datetime(2024, 5, 1, 12, 0, 0)


def test_brute_force_lifecycle(spark, tmp_path):
    # auth_events fixture (B7): 5 failures from one IP inside 15 min
    # (activates), 1 failure from another IP (does not), successes
    # interleaved (no matches)
    rows = []
    for i, m in enumerate((0, 2, 5, 9, 12)):
        rows.append((i, T0 + dt.timedelta(minutes=m), ["authentication"],
                     "failure", "alice", "1.2.3.4"))
    rows.append((10, T0 + dt.timedelta(minutes=3), ["authentication"],
                 "success", "alice", "1.2.3.4"))
    rows.append((11, T0 + dt.timedelta(minutes=4), ["authentication"],
                 "failure", "bob", "9.9.9.9"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, category array<string>, "
        "outcome string, user string, src_ip string",
    )

    # detection runs unmodified matano-style hooks (example/detections/
    # login_brute_force_by_ip shape)
    det = Detection(
        name="login_brute_force_by_ip",
        detect=lambda r: "authentication" in (r.deepget("category") or [])
        and r.deepget("outcome") == "failure",
        title=lambda r: f"Multiple failed logins from {r.deepget('user')} - {r.deepget('src_ip')}",
        dedupe=lambda r: r.deepget("src_ip"),
        severity="high",
        threshold=5,
        deduplication_window_minutes=15,
    )
    matches = run_detections(events, [det], key_col="event_id")
    assert matches.count() == 6  # successes never match

    alerts = aggregate_alerts(
        matches,
        threshold=det.threshold,
        window_seconds=det.deduplication_window_minutes * 60,
    )
    by_key = {r.dedupe: r.asDict() for r in alerts.collect()}
    assert by_key["1.2.3.4"]["activated"] is True
    assert by_key["1.2.3.4"]["match_count"] == 5
    assert by_key["1.2.3.4"]["created_at"] == T0 + dt.timedelta(minutes=12)
    assert by_key["9.9.9.9"]["activated"] is False

    # context aggregation joins alert ids onto matches by key
    enriched = matches.join(
        alerts.select("dedupe", "alert_id"), "dedupe"
    )
    ctx = aggregate_context(enriched, ["alert_id"], ["dedupe", "title"])
    ctx_row = {
        r.alert_id: r.asDict(recursive=True)
        for r in ctx.collect()
    }[by_key["1.2.3.4"]["alert_id"]]
    assert ctx_row["context"]["dedupe"] == ["1.2.3.4"]
    assert ctx_row["match_count"] == 5

    # delivery: only the activated alert goes out, exactly once per dest
    sent = []
    ledger = DeliveryLedger(spark, str(tmp_path / "ledger"))
    n = deliver_batch(alerts, ["slack"], ledger, lambda d, p: sent.append(p))
    assert n == 1
    assert sent[0]["dedupe"] == "1.2.3.4"
    assert deliver_batch(alerts, ["slack"], ledger, lambda d, p: sent.append(p)) == 0


def test_matano_alerts_row_shape(spark):
    """B7 expected row shape: nested matano.alert struct with stable
    alert id across all matches of one alert."""
    from matano_spark.operators.alerts import alert_rows

    rows = [(i, T0 + dt.timedelta(minutes=m), ["authentication"], "failure",
             "alice", "1.2.3.4") for i, m in enumerate((0, 2, 5, 9, 12))]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, category array<string>, "
        "outcome string, user string, src_ip string",
    )
    det = Detection(
        name="login_brute_force_by_ip",
        detect=lambda r: r.deepget("outcome") == "failure",
        dedupe=lambda r: r.deepget("src_ip"),
        severity="high",
    )
    matches = run_detections(events, [det], key_col="event_id")
    alerts = aggregate_alerts(matches, threshold=5, window_seconds=900)
    out = alert_rows(matches, alerts).collect()
    assert len(out) == 5
    dicts = [r.asDict(recursive=True)["matano"]["alert"] for r in out]
    assert len({d["id"] for d in dicts}) == 1  # one stable alert id
    assert all(d["activated"] for d in dicts)
    assert all(d["rule"]["name"] == "login_brute_force_by_ip" for d in dicts)
    assert all(d["first_matched_at"] == T0 for d in dicts)
    assert len({d["rule"]["match"]["id"] for d in dicts}) == 5  # per-match ids
    assert all(d["created"] == T0 + dt.timedelta(minutes=12) for d in dicts)


def test_delivery_storm_capped_carry_over(spark, tmp_path):
    """10k activated alerts deliver without driver materialization of
    the full set (toLocalIterator streaming) and a per-batch cap
    carries the remainder over to the next batch via the ledger
    anti-join."""
    from pyspark.sql import functions as F

    alerts = spark.range(10_000).select(
        F.concat(F.lit("alert-"), F.col("id")).alias("alert_id"),
        F.lit(True).alias("activated"),
        F.lit("storm_rule").alias("rule_name"),
        F.col("id").cast("string").alias("dedupe"),
        F.lit(1).alias("match_count"),
        F.current_timestamp().alias("first_matched_at"),
        F.current_timestamp().alias("created_at"),
    )
    ledger = DeliveryLedger(spark, str(tmp_path / "ledger"))
    got: list[str] = []
    n1 = deliver_batch(
        alerts, ["slack"], ledger,
        lambda d, p: got.append(p["alert_id"]), max_per_batch=6_000,
    )
    assert n1 == 6_000
    n2 = deliver_batch(
        alerts, ["slack"], ledger,
        lambda d, p: got.append(p["alert_id"]), max_per_batch=6_000,
    )
    assert n2 == 4_000
    assert len(set(got)) == 10_000  # exactly-once across batches
    assert deliver_batch(
        alerts, ["slack"], ledger, lambda d, p: got.append(p["alert_id"])
    ) == 0
