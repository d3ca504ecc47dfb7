"""Alert delivery (SURVEY.md M6): activated-alert CDC payloads fanned
out to destinations with per-destination dedup.

Reference shape: alert_writer publishes CDC payloads, alert_forwarder
delivers to Slack/SES with a per-destination dedup marker
(alert_writer/src/main.rs:136-183; forwarders under
alert_forwarder/src/forwarders/). Here delivery is a foreachBatch
sink: each micro-batch of alert upserts is filtered to activation
transitions, deduped against the delivery ledger (alert_id,
destination), handed to a transport callable, and recorded. The
transport is pluggable — webhook/SMTP adapters drop in where the
network exists; tests use a collecting transport."""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Transport = Callable[[str, dict], None]  # (destination, payload) -> None


class DeliveryLedger:
    """Parquet-backed (alert_id, destination) delivery dedup ledger —
    the reference's DynamoDB dedup marker (main.rs:136-183)."""

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path

    def delivered(self) -> DataFrame:
        from pyspark.errors import AnalysisException

        try:
            # Spark-reader probe, not driver-local os.path — the ledger
            # may live on object storage
            return self.spark.read.parquet(self.path)
        except AnalysisException:  # PATH_NOT_FOUND before first delivery
            return self.spark.createDataFrame(
                [], "alert_id string, destination string"
            )

    def record(self, df: DataFrame) -> None:
        df.select("alert_id", "destination").write.mode("append").parquet(self.path)


def deliver_batch(
    alerts: DataFrame,
    destinations: list[str],
    ledger: DeliveryLedger,
    transport: Transport,
) -> int:
    """Deliver newly-activated alerts to every destination once.

    Returns the number of deliveries performed. The fan-out is a
    cross join against the (tiny) destination list; dedup is a
    left-anti join against the ledger. Payload rows reach the driver
    only here — delivery is inherently a driver/edge concern and the
    activated set is small by construction."""
    spark = alerts.sparkSession
    dest_df = spark.createDataFrame(
        [(d,) for d in destinations], "destination string"
    )
    todo = (
        alerts.filter(F.col("activated"))
        .crossJoin(dest_df)
        .join(ledger.delivered(), ["alert_id", "destination"], "left_anti")
        .select(
            "alert_id",
            "destination",
            "rule_name",
            "dedupe",
            "match_count",
            F.col("first_matched_at").cast("string").alias("first_matched_at"),
            F.col("created_at").cast("string").alias("created_at"),
        )
    )
    rows = todo.collect()
    # record from the already-collected rows — never re-execute the lazy
    # plan (it reads the same ledger path we append to, and a partial
    # transport failure must not record undelivered alerts)
    sent: list[tuple[str, str]] = []
    try:
        for r in rows:
            payload = {k: r[k] for k in r.asDict() if k != "destination"}
            transport(r.destination, payload)
            sent.append((r.alert_id, r.destination))
    finally:
        if sent:
            ledger.record(
                spark.createDataFrame(
                    sent, "alert_id string, destination string"
                )
            )
    return len(sent)


def webhook_transport(url: str) -> Transport:
    """HTTP POST transport (requires outbound network — not exercised
    in the sandboxed test environment)."""

    def send(destination: str, payload: dict) -> None:
        import urllib.request

        req = urllib.request.Request(
            url,
            data=json.dumps({"destination": destination, **payload}).encode(),
            headers={"Content-Type": "application/json"},
        )
        urllib.request.urlopen(req, timeout=10)  # noqa: S310

    return send
