"""Detections-as-code loader: the reference's detection.yml +
detect.py directory layout drives detection + the alert state machine
end-to-end."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from matano_spark.detections import run_detections
from matano_spark.detections.packs import (
    detections_for_table,
    load_detection_packs,
)

PACK_ROOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", "detections")

T0 = dt.datetime(2024, 5, 1, 12, 0, 0)


def test_pack_loading_and_config():
    dets = {d.name: d for d in load_detection_packs(PACK_ROOT)}
    assert set(dets) == {"aws_root_credentials", "login_brute_force_by_ip", "zeek_events"}
    bf = dets["login_brute_force_by_ip"]
    assert bf.threshold == 5
    assert bf.deduplication_window_minutes == 15
    assert bf.tables == ("okta_system", "aws_cloudtrail")
    assert bf.destinations == ("slack_secops",)
    assert dets["aws_root_credentials"].threshold == 1

    bound = detections_for_table(list(dets.values()), "okta_system")
    assert [d.name for d in bound] == ["login_brute_force_by_ip"]


def test_pack_detections_run_and_fold_to_alerts(spark):
    dets = load_detection_packs(PACK_ROOT)
    rows = []
    # 6 failures from one IP within 10 min (crosses the threshold of 5),
    # 2 from another (stays below), one success
    for i in range(6):
        rows.append((T0 + dt.timedelta(minutes=i), ["authentication"],
                     "failure", "198.51.100.7", f"e{i}"))
    rows.append((T0, ["authentication"], "failure", "203.0.113.5", "e6"))
    rows.append((T0 + dt.timedelta(minutes=1), ["authentication"], "failure",
                 "203.0.113.5", "e7"))
    rows.append((T0, ["authentication"], "success", "198.51.100.7", "e8"))
    df = spark.createDataFrame(
        [
            (ts, {"category": cat, "outcome": outcome}, {"ip": ip}, eid)
            for ts, cat, outcome, ip, eid in rows
        ],
        "ts timestamp, event struct<category:array<string>, outcome:string>, "
        "source struct<ip:string>, event_id string",
    )
    bound = detections_for_table(dets, "okta_system")
    matches = run_detections(df, bound, key_col="event_id")
    got = matches.collect()
    assert len(got) == 8  # 8 failures, success excluded
    assert {r.dedupe for r in got} == {"198.51.100.7", "203.0.113.5"}
    assert all(r.rule_name == "login_brute_force_by_ip" for r in got)

    # fold into the alert state machine with the PACK's config
    from matano_spark.operators.alerts import aggregate_alerts

    bf = [d for d in dets if d.name == "login_brute_force_by_ip"][0]
    alerts = aggregate_alerts(
        matches,
        threshold=bf.threshold,
        window_seconds=bf.deduplication_window_minutes * 60,
    )
    by_ip = {r.dedupe: r for r in alerts.collect()}
    assert by_ip["198.51.100.7"].activated is True
    assert by_ip["198.51.100.7"].match_count == 6
    assert by_ip["203.0.113.5"].activated is False


def test_root_detection_prefilter_compiles(spark):
    dets = load_detection_packs(PACK_ROOT)
    root = [d for d in dets if d.name == "aws_root_credentials"]
    df = spark.createDataFrame(
        [
            (T0, ("Root", "AwsApiCall"), "e1", "CreateUser"),
            (T0, ("Root", "AwsServiceEvent"), "e2", "internal"),
            (T0, ("IAMUser", "AwsApiCall"), "e3", "PutObject"),
        ],
        "ts timestamp, aws_ct struct<t:string, et:string>, event_id string, action string",
    ).select(
        "ts",
        "event_id",
        F.struct(
            F.struct(
                F.struct(
                    F.col("aws_ct.t").alias("type")
                ).alias("user_identity"),
                F.col("aws_ct.et").alias("event_type"),
            ).alias("cloudtrail")
        ).alias("aws"),
        F.struct(F.col("action").alias("action")).alias("event"),
    )
    matches = run_detections(df, root, key_col="event_id")
    got = matches.collect()
    assert [r.event_key for r in got] == ["e1"]
    assert "root account used" in got[0].title


def test_per_rule_config_folds_in_one_pass(spark):
    """Two rules with different thresholds AND windows fold correctly
    in a single state-machine pass (ref: per-detection alert config)."""
    from matano_spark.detections import Detection
    from matano_spark.detections.packs import rule_config
    from matano_spark.operators.alerts import aggregate_alerts

    dets = [
        Detection(name="fast", detect=lambda r: True, threshold=1,
                  deduplication_window_minutes=10),
        Detection(name="slow", detect=lambda r: True, threshold=3,
                  deduplication_window_minutes=60),
    ]
    rows = []
    # both rules see the same 3 matches 15 min apart
    for rule in ("fast", "slow"):
        for i in range(3):
            rows.append((rule, "k", T0 + dt.timedelta(minutes=15 * i), f"m{i}"))
    matches = spark.createDataFrame(
        rows, "rule_name string, dedupe string, ts timestamp, match_id string"
    )
    alerts = aggregate_alerts(matches, rule_config=rule_config(dets))
    by_rule = {}
    for r in alerts.collect():
        by_rule.setdefault(r.rule_name, []).append(r)

    # fast: 10-min window → every match opens a NEW alert; threshold 1
    # activates each instantly
    fast = sorted(by_rule["fast"], key=lambda r: r.first_matched_at)
    assert len(fast) == 3
    assert all(a.activated and a.match_count == 1 for a in fast)

    # slow: 60-min window → one alert accumulating all 3; threshold 3
    # activates on the third match
    slow = by_rule["slow"]
    assert len(slow) == 1
    assert slow[0].match_count == 3 and slow[0].activated
    assert slow[0].created_at == T0 + dt.timedelta(minutes=30)


def test_pack_config_drives_streaming_state_machine(spark, tmp_path):
    """The brute-force pack's threshold/window flow into the STREAMING
    fold: 5 failures from one IP across two micro-batches activate the
    alert; 4 from another stay pending."""
    import json

    from matano_spark.detections.packs import rule_config
    from matano_spark.streaming.alerting import streaming_alerts
    from pyspark.sql import types as T

    dets = load_detection_packs(PACK_ROOT)
    cfg = rule_config(dets)
    assert cfg["login_brute_force_by_ip"] == (5, 900)

    schema = T.StructType([
        T.StructField("rule_name", T.StringType()),
        T.StructField("dedupe", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("match_id", T.StringType()),
    ])
    src = tmp_path / "src"
    src.mkdir()

    def write(name, rows):
        with open(src / name, "w") as f:
            for minute, ip, mid in rows:
                f.write(json.dumps({
                    "rule_name": "login_brute_force_by_ip",
                    "dedupe": ip,
                    "ts": (T0 + dt.timedelta(minutes=minute)).isoformat(),
                    "match_id": mid,
                }) + "\n")

    write("b1.json", [(i, "198.51.100.7", f"a{i}") for i in range(3)]
          + [(i, "203.0.113.5", f"b{i}") for i in range(2)])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        streaming_alerts(stream, rule_config=cfg)
        .writeStream.format("memory")
        .queryName("pack_alerts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        write("b2.json", [(3 + i, "198.51.100.7", f"c{i}") for i in range(2)]
              + [(5, "203.0.113.5", "b2"), (6, "203.0.113.5", "b3")])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM pack_alerts ORDER BY last_matched_at"
        ).collect()
        latest = {}
        for r in rows:
            latest[r.dedupe] = r
        # threshold 5 reached across batches for the first IP only
        assert latest["198.51.100.7"].match_count == 5
        assert latest["198.51.100.7"].activated is True
        assert latest["203.0.113.5"].match_count == 4
        assert latest["203.0.113.5"].activated is False
    finally:
        q.stop()
