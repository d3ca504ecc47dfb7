"""Temporal-join workload: as-of join and interval containment join
over the events table — point-in-time attribution and incident-window
correlation, the two temporal shapes the reference's Athena surface
would hand to SQL and a feature/security pipeline needs as operators.

Both oracles are INDEPENDENT formulations: DuckDB's native ASOF JOIN
for the as-of query and a plain inequality join for the range query —
so the window-union and bucket-join implementations are verified
against engines that compute the same relation a completely different
way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matano_spark.operators.temporal import asof_join, range_join_bucketed
from matano_spark.workloads import query
from matano_spark.workloads.util import t


@query(
    "asof_purchase_attribution",
    oracle="""
    WITH views AS (
      SELECT user_id, ts, max(value) AS view_value
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           v.ts AS asof_ts, v.view_value AS asof_view_value
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attribute each purchase to the most recent prior
    view by the same user (point-in-time correctness — the feature-
    store/enrichment-at-event-time primitive).

    SCALE: operators.temporal.asof_join — union + last(ignorenulls)
    window, ONE shuffle on user_id, no theta-join blowup; verified
    against DuckDB's native ASOF JOIN, an entirely independent
    implementation.
    """
    ev = t(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_join(
        purchases, views, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["view_value"],
    )


@query(
    "range_join_incident_windows",
    oracle="""
    WITH windows AS (
      SELECT DISTINCT user_id, ts AS win_start,
             ts + INTERVAL 30 MINUTE AS win_end
      FROM events WHERE event_type = 'error'
    )
    SELECT w.user_id, w.win_start,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases
    FROM events e
    JOIN windows w
      ON e.user_id = w.user_id
     AND e.ts >= w.win_start AND e.ts <= w.win_end
    WHERE e.event_type <> 'error'
    GROUP BY w.user_id, w.win_start
    """,
)
def range_join_incident_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join: activity inside each user's
    30-minute post-error incident window (the alert-context /
    maintenance-window correlation shape).

    SCALE: operators.temporal.range_join_bucketed — time bucketed at
    the window width, so the join is an equi-join on (user_id, bucket)
    with fan-out <= 2 per interval and a residual containment filter;
    the naive inequality join the oracle runs would be per-key
    quadratic on a cluster.
    """
    ev = t(spark, sf_dir, "events")
    windows = (
        ev.filter(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("ts").alias("win_start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("win_end"),
        )
        .distinct()
    )
    others = ev.filter(F.col("event_type") != "error").select(
        "user_id", "ts", "event_type"
    )
    pairs = range_join_bucketed(
        others, windows, key="user_id", event_ts="ts",
        start_col="win_start", end_col="win_end", bucket_seconds=1800,
    )
    return pairs.groupBy(
        F.col("user_id_interval").alias("user_id"), "win_start"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchases"),
    )


@query(
    "rollup_time_cascade",
    oracle="""
    SELECT 'hour' AS resolution,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS total_value
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'day', CAST(date_trunc('day', ts) AS TIMESTAMP), event_type,
           COUNT(*),
           CAST(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
             / 1000000.0
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'month', CAST(date_trunc('month', ts) AS TIMESTAMP), event_type,
           COUNT(*),
           CAST(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
             / 1000000.0
    FROM events GROUP BY 2, 3
    """,
)
def rollup_time_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: hourly, daily,
    and monthly rollups where each coarser level re-aggregates the
    finer PRE-AGGREGATE (operators.rollup.time_cascade) — one scan of
    the fact table total. The oracle computes every level directly
    from raw, proving the cascade is lossless (scaled-integer carry
    keeps float sums exact through the levels)."""
    from matano_spark.operators.rollup import time_cascade

    ev = t(spark, sf_dir, "events")
    return time_cascade(ev, "ts", ["event_type"], "value")
