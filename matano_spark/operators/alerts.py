"""Alert state machine: rule matches → deduplicated, thresholded alerts
(SURVEY.md A1-A3, W2-W3; oracle logic: lake_writer/src/
matano_alerts.rs:92-307).

Semantics (fixed-anchor deduplication window, NOT gap sessions):
- matches for the same (rule_name, dedupe) key within
  `window` seconds of the alert's FIRST match belong to that alert
  (matano_alerts.rs:110-115);
- the first match at/after `first_matched_at + window` opens a NEW
  alert with a fresh id and anchor (:172-196);
- an alert activates when its match count reaches `threshold`;
  `created_at` is stamped at the activating match (:199-237).

The anchor depends on the running state, so this is a per-key
sequential fold — exactly the shape of applyInPandas: partition by
(rule_name, dedupe), sort within group, loop in vectorized batches.
At 100 TB the key space (rules × dedupe values) is huge and uniform,
so groups are small and the shuffle is well balanced; the same loop
body runs under applyInPandasWithState in streaming
(matano_spark.streaming.alerting).

Alert ids are deterministic: md5(rule:dedupe:epoch_us(first_matched_at))
— replayable, idempotent on reprocessing, and oracle-checkable (the
reference mints uuids; determinism is strictly stronger).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import types as T

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("rule_name", T.StringType()),
        T.StructField("dedupe", T.StringType()),
        T.StructField("alert_id", T.StringType()),
        T.StructField("first_matched_at", T.TimestampType()),
        T.StructField("last_matched_at", T.TimestampType()),
        T.StructField("match_count", T.LongType()),
        T.StructField("activated", T.BooleanType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)


def alert_id_for(rule_name: str, dedupe: str, first_us: int) -> str:
    return hashlib.md5(f"{rule_name}:{dedupe}:{first_us}".encode()).hexdigest()


def aggregate_alerts(
    matches: DataFrame,
    threshold: int = 1,
    window_seconds: int = 3600,
    ts_col: str = "ts",
    id_col: str = "match_id",
) -> DataFrame:
    """Fold rule matches into alerts (batch form of the state machine).

    matches: columns (rule_name, dedupe, ts, match_id). Returns one row
    per alert with ALERT_SCHEMA.
    """

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
        out = []
        anchor = None
        cur = None
        for ts in zip(pdf[ts_col], pdf["rule_name"], pdf["dedupe"]):
            t, rule, key = ts
            if anchor is None or (t - anchor).total_seconds() >= window_seconds:
                if cur is not None:
                    out.append(cur)
                anchor = t
                first_us = int(pd.Timestamp(t).value // 1000)
                cur = {
                    "rule_name": rule,
                    "dedupe": key,
                    "alert_id": alert_id_for(rule, key, first_us),
                    "first_matched_at": t,
                    "last_matched_at": t,
                    "match_count": 1,
                    "activated": 1 >= threshold,
                    "created_at": t if 1 >= threshold else None,
                }
            else:
                cur["match_count"] += 1
                cur["last_matched_at"] = t
                if not cur["activated"] and cur["match_count"] >= threshold:
                    cur["activated"] = True
                    cur["created_at"] = t
        if cur is not None:
            out.append(cur)
        return pd.DataFrame(out, columns=[f.name for f in ALERT_SCHEMA.fields])

    return (
        matches.select("rule_name", "dedupe", ts_col, id_col)
        .groupBy("rule_name", "dedupe")
        .applyInPandas(lambda pdf: fold(pdf), ALERT_SCHEMA)
    )
