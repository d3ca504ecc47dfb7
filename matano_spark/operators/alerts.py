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
from pyspark.sql import functions as F
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
    rule_config: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Fold rule matches into alerts (batch form of the state machine).

    matches: columns (rule_name, dedupe, ts, match_id). Returns one row
    per alert with ALERT_SCHEMA.

    `rule_config` maps rule_name → (threshold, window_seconds),
    overriding the global defaults per rule — the reference configures
    both per detection (detection.yml alert block), so one pass must
    fold rules with different thresholds/windows together. The map is
    rule-count-sized and ships in the task closure (no join needed).

    Execution: with a GLOBAL (threshold, window) config the fold runs
    entirely in the JVM (aggregate_alerts_sql — collect_list +
    `aggregate` lambda per key): the r10 A/B at 10× match volume
    measured it 1.44 → 0.89 s min vs the mapInPandas pass (tie at 1×),
    with exact parity at both volumes, so the JVM fold is now the
    batch default. The mapInPandas partition fold below remains for
    per-rule configs (closure-shipped thresholds) and is the shape the
    streaming path shares; it also never materializes a key's matches
    as one array, so it stays the fallback if a pathological dedupe
    key (10⁷ matches on one reducer) ever matters more than the
    steady-state win. mapInPandas itself beats per-group applyInPandas
    by an order of magnitude when keys are many and groups are small.
    """
    if rule_config is None:
        return aggregate_alerts_sql(
            matches, threshold, window_seconds, ts_col, id_col
        )
    cfg = {
        r: (thr, win * 1_000_000)
        for r, (thr, win) in (rule_config or {}).items()
    }
    default_cfg = (threshold, window_seconds * 1_000_000)

    def fold_partition(batches):
        import pandas as pd

        out_cols = [f.name for f in ALERT_SCHEMA.fields]
        state: dict | None = None  # open alert of the current key
        cur_key: tuple | None = None
        thr, window_us = default_cfg
        pending: list[dict] = []

        def close():
            nonlocal state
            if state is not None:
                pending.append(state)
                state = None

        for pdf in batches:
            ts_us = pdf[ts_col].astype("int64") // 1000
            for rule, key, t_us in zip(
                pdf["rule_name"], pdf["dedupe"], ts_us
            ):
                k = (rule, key)
                if k != cur_key:
                    close()
                    cur_key = k
                    thr, window_us = cfg.get(rule, default_cfg)
                t_us = int(t_us)
                if state is None or t_us - state["_anchor_us"] >= window_us:
                    close()
                    state = {
                        "rule_name": rule,
                        "dedupe": key,
                        "alert_id": alert_id_for(rule, key, t_us),
                        "first_matched_at": pd.Timestamp(t_us * 1000),
                        "last_matched_at": pd.Timestamp(t_us * 1000),
                        "match_count": 1,
                        "activated": 1 >= thr,
                        "created_at": (
                            pd.Timestamp(t_us * 1000) if 1 >= thr else None
                        ),
                        "_anchor_us": t_us,
                    }
                else:
                    state["match_count"] += 1
                    state["last_matched_at"] = pd.Timestamp(t_us * 1000)
                    if (
                        not state["activated"]
                        and state["match_count"] >= thr
                    ):
                        state["activated"] = True
                        state["created_at"] = pd.Timestamp(t_us * 1000)
            if len(pending) >= 10_000:
                yield pd.DataFrame(pending, columns=out_cols)
                pending.clear()
        close()
        if pending:
            yield pd.DataFrame(pending, columns=out_cols)
        else:
            # typed empty frame — untyped empties infer float64 and fail
            # the Arrow cast to timestamp
            dtypes = {
                "rule_name": "object",
                "dedupe": "object",
                "alert_id": "object",
                "first_matched_at": "datetime64[ns]",
                "last_matched_at": "datetime64[ns]",
                "match_count": "int64",
                "activated": "bool",
                "created_at": "datetime64[ns]",
            }
            yield pd.DataFrame(
                {c: pd.Series(dtype=dtypes[c]) for c in out_cols}
            )

    return (
        matches.select("rule_name", "dedupe", ts_col, id_col)
        .repartition("rule_name", "dedupe")
        .sortWithinPartitions("rule_name", "dedupe", ts_col, id_col)
        .mapInPandas(fold_partition, ALERT_SCHEMA)
    )


def aggregate_alerts_sql(
    matches: DataFrame,
    threshold: int = 1,
    window_seconds: int = 3600,
    ts_col: str = "ts",
    id_col: str = "match_id",
) -> DataFrame:
    """JVM-side prototype of aggregate_alerts (see SCALE.md §alert
    fold): per (rule, dedupe) key, collect the sorted match-timestamp
    array and run the fixed-anchor fold as a SQL `aggregate` lambda —
    no Python in the loop, whole plan stays in codegen.

    Semantics identical to aggregate_alerts for a GLOBAL
    (threshold, window) config (per-rule overrides would need a config
    join; the Python fold ships them in the closure). Trade-off vs the
    mapInPandas fold: each key's matches materialize as ONE in-memory
    array inside the aggregation, so a pathological dedupe key with
    10⁷ matches lands on one reducer as one array — the streaming
    partition fold never materializes a key. ADOPTED as the batch
    default in r10: the re-A/B at 10× match volume (194k alerts)
    measured 0.89 vs 1.44 s min (tie at 1×), parity exact."""
    win_us = window_seconds * 1_000_000
    cur_t = (
        "struct<anchor:bigint,last:bigint,cnt:bigint,created:bigint>"
    )
    new_cur = (
        "named_struct('anchor', t, 'last', t, 'cnt', 1L, 'created', "
        f"if(1 >= {threshold}, t, cast(null as bigint)))"
    )
    fold = F.expr(
        f"""
        aggregate(
          ts_list,
          struct(cast(array() as array<{cur_t}>) as done,
                 cast(null as {cur_t}) as cur),
          (acc, t) -> case
            when acc.cur is null
              then named_struct('done', acc.done, 'cur', {new_cur})
            when t - acc.cur.anchor >= {win_us}L
              then named_struct('done', array_append(acc.done, acc.cur),
                                'cur', {new_cur})
            else named_struct('done', acc.done,
              'cur', named_struct(
                'anchor', acc.cur.anchor, 'last', t,
                'cnt', acc.cur.cnt + 1L,
                'created', coalesce(acc.cur.created,
                  if(acc.cur.cnt + 1L >= {threshold}L, t,
                     cast(null as bigint)))))
          end,
          acc -> if(acc.cur is null, acc.done,
                    array_append(acc.done, acc.cur))
        )
        """
    )
    alerts = (
        matches.groupBy("rule_name", "dedupe")
        .agg(
            F.array_sort(
                F.collect_list(F.unix_micros(F.col(ts_col)))
            ).alias("ts_list")
        )
        .select("rule_name", "dedupe", F.explode(fold).alias("a"))
    )
    us = lambda c: F.timestamp_micros(c)  # noqa: E731
    return alerts.select(
        "rule_name",
        "dedupe",
        F.md5(
            F.concat_ws(
                ":",
                "rule_name",
                "dedupe",
                F.col("a.anchor").cast("string"),
            )
        ).alias("alert_id"),
        us(F.col("a.anchor")).alias("first_matched_at"),
        us(F.col("a.last")).alias("last_matched_at"),
        F.col("a.cnt").alias("match_count"),
        (F.col("a.cnt") >= threshold).alias("activated"),
        us(F.col("a.created")).alias("created_at"),
    )


def aggregate_context(
    matches: DataFrame,
    alert_key_cols: list[str],
    context_cols: list[str],
) -> DataFrame:
    """A4 alert-context aggregation (ref: alert_writer/src/main.rs:
    54-64 flattener, :345-400 VRL merge program): per alert, each
    context field's distinct values merge into a sorted list; the
    context lands as map<field, array<string>> + match_count.

    Shape: explode to (alert_key, field, value) → collect_set →
    map_from_entries — two shuffles on the alert key, all built-in.
    """
    from pyspark.sql import functions as F

    kv = None
    for c in context_cols:
        part = matches.select(
            *alert_key_cols,
            F.lit(c).alias("ctx_key"),
            F.col(c).cast("string").alias("ctx_value"),
        )
        kv = part if kv is None else kv.unionByName(part)
    per_key = (
        kv.filter(F.col("ctx_value").isNotNull())
        .groupBy(*alert_key_cols, "ctx_key")
        .agg(F.array_sort(F.collect_set("ctx_value")).alias("vals"))
    )
    counts = matches.groupBy(*alert_key_cols).agg(
        F.count(F.lit(1)).alias("match_count")
    )
    ctx = per_key.groupBy(*alert_key_cols).agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct(F.col("ctx_key"), F.col("vals")))
            )
        ).alias("context")
    )
    return ctx.join(counts, alert_key_cols)


def context_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """A5 context CDC (ref: alert_writer/src/main.rs:400+): per alert,
    which context fields changed between two aggregation generations —
    the payload the forwarder delivers. Returns rows with
    changed = map<field, array<string>> of NEW values for fields whose
    value set changed or appeared."""
    from pyspark.sql import functions as F

    o = old.select(*key_cols, F.col("context").alias("old_ctx"))
    n = new.select(*key_cols, F.col("context").alias("new_ctx"))
    joined = n.join(o, key_cols, "left")
    changed = F.map_filter(
        F.col("new_ctx"),
        lambda k, v: F.col("old_ctx").isNull()
        | ~F.array_contains(F.map_keys(F.col("old_ctx")), k)
        | (F.element_at(F.col("old_ctx"), k) != v),
    )
    return joined.select(
        *key_cols, changed.alias("changed")
    ).filter(F.size(F.map_keys(F.col("changed"))) > 0)


def alert_rows(matches: DataFrame, alerts: DataFrame) -> DataFrame:
    """Synthesize matano_alerts-shaped rows (FIXTURES.md B7; ref:
    detection/common.py:310-345 rule-match synthesis +
    data/managed/log_sources/matano_alerts schema): one row per rule
    match carrying the nested matano.alert struct with the alert-level
    state (id, activated, first_matched_at, created) joined in by
    (rule_name, dedupe) for the window containing the match ts."""
    from pyspark.sql import functions as F

    m = matches.alias("m")
    a = alerts.alias("a")
    joined = m.join(
        a,
        (F.col("m.rule_name") == F.col("a.rule_name"))
        & (F.col("m.dedupe") == F.col("a.dedupe"))
        & (F.col("m.ts") >= F.col("a.first_matched_at"))
        & (F.col("m.ts") <= F.col("a.last_matched_at")),
    )
    alert_struct = F.struct(
        F.col("a.alert_id").alias("id"),
        F.col("m.title").alias("title"),
        F.col("m.severity").alias("severity"),
        F.col("m.dedupe").alias("dedupe"),
        F.col("a.activated").alias("activated"),
        F.col("a.created_at").alias("created"),
        F.col("a.first_matched_at").alias("first_matched_at"),
        F.col("m.ts").alias("original_timestamp"),
        F.col("m.original_event").alias("original_event"),
        F.struct(
            F.col("m.rule_name").alias("name"),
            F.struct(F.col("m.match_id").alias("id")).alias("match"),
        ).alias("rule"),
    )
    return joined.select(
        F.col("m.ts").alias("ts"),
        F.struct(alert_struct.alias("alert")).alias("matano"),
    )
