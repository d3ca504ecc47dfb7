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
    max_per_batch: int | None = None,
) -> int:
    """Deliver newly-activated alerts to every destination once.

    Returns the number of deliveries performed. The fan-out is a
    cross join against the (tiny) destination list; dedup is a
    left-anti join against the ledger. Payload rows stream to the
    driver one partition at a time (`toLocalIterator`, no prefetch) —
    an alert storm never materializes the whole activated set
    driver-side. `max_per_batch` caps deliveries per call; anything
    beyond the cap stays out of the ledger, so the next batch's
    anti-join naturally carries it over."""
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
    # stream, don't collect; the ledger append happens only AFTER we
    # stop consuming (a partial transport failure must not record
    # undelivered alerts, and the plan reads the path we append to)
    sent: list[tuple[str, str]] = []
    try:
        for r in todo.toLocalIterator(prefetchPartitions=False):
            if max_per_batch is not None and len(sent) >= max_per_batch:
                break
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


def slack_transport(url: str, channel: str) -> Transport:
    """Slack Block Kit transport: renders the reference's new-alert /
    update payloads (streaming/render.py ↔ forwarders/slack.rs) and
    POSTs them as chat.postMessage bodies. New alerts send the channel
    message; updates would thread via the recorded ts (the dest_info
    analog) — both payloads come from the same pure renderers the
    goldens pin."""
    from matano_spark.streaming.render import (
        render_slack_alert_update,
        render_slack_new_alert,
    )

    def send(destination: str, payload: dict) -> None:
        alert = {
            "id": payload.get("alert_id"),
            "title": payload.get("rule_name", ""),
            "severity": payload.get("severity", ""),
            "tables": payload.get("tables", []),
            "match_count": payload.get("match_count", 0),
            "created": payload.get("created_at", ""),
            "runbook": payload.get("runbook", ""),
            "context": payload.get("context") or {},
        }
        if payload.get("update_count", 0) > 0:
            blocks = render_slack_alert_update(
                alert, payload.get("context_diff") or {}
            )
            bodies = [{"channel": channel, "blocks": json.dumps(blocks)}]
        else:
            blocks, thread = render_slack_new_alert(alert)
            bodies = [
                {"channel": channel, "blocks": json.dumps(blocks)},
                {"channel": channel, "blocks": json.dumps(thread)},
            ]
        for body in bodies:
            _post_json(url, body)

    return send


def ses_transport(url: str, from_addr: str, to_addrs: list[str]) -> Transport:
    """SES-shaped email transport: renders the reference's HTML email
    (render.render_ses_html ↔ forwarders/ses.rs) and POSTs the
    SendEmail-shaped body. Mirrors the reference's noise gate: only
    never-before-delivered alerts email (update_count == 0)."""
    from matano_spark.streaming.render import render_ses_html

    def send(destination: str, payload: dict) -> None:
        if payload.get("update_count", 0) > 0:
            return
        alert = {
            "title": payload.get("rule_name", ""),
            "tables": payload.get("tables", []),
            "created": payload.get("created_at", ""),
            "runbook": payload.get("runbook", ""),
            "context": payload.get("context") or {},
        }
        subject, html = render_ses_html(alert)
        _post_json(
            url,
            {
                "from": from_addr,
                "to": to_addrs,
                "subject": subject,
                "html": html,
            },
        )

    return send


def _post_json(url: str, body: dict) -> None:
    import urllib.request

    req = urllib.request.Request(
        url,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    urllib.request.urlopen(req, timeout=10)  # noqa: S310


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
