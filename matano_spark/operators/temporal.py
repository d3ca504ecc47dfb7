"""Temporal join operators Spark lacks natively: as-of join and
interval (range) join — both expressed so the big side never explodes.

As-of join (most recent right row at or before each left row, per key)
is the point-in-time-correctness primitive of feature stores, market
data, and enrichment-at-event-time. Naive formulations are O(n·m)
theta-joins; the scalable Spark form is the UNION + WINDOW trick:
interleave both sides on (key, ts), carry the latest right payload
forward with last(ignorenulls) over an unbounded-preceding window, and
keep only left rows. One shuffle on key, zero row blowup, whole-stage
codegen throughout.

Range join (events ⋈ intervals with containment) degenerates to a
per-key cartesian in naive form. The scale path buckets time into
fixed-width epochs: each interval lands in the buckets it covers, each
event in exactly one, and the join becomes an equi-join on
(key, bucket) + a residual containment filter. With bucket width >=
max interval length every interval covers <= 2 buckets, so the blowup
factor is bounded by 2 regardless of data volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts on the same key (DuckDB/pandas `merge_asof`
    semantics, 'backward' direction, inclusive).

    Right (key, ts) pairs should be unique for deterministic output —
    pre-aggregate the right side if they are not (the same requirement
    every asof engine has for ties).

    Returns left columns plus `asof_<c>` for each right payload column
    and `asof_ts` (the matched right timestamp; all null when no right
    row precedes the left row, or the match is older than
    `tolerance_seconds`).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]
    # side 0 = right rows sort BEFORE left rows at equal ts, making the
    # match inclusive (right row at exactly left.ts is visible to it).
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__rt"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    l = left.select(  # noqa: E741
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rt"].dataType).alias("__rt"),
        *[
            F.lit(None).cast(r.schema[f"__r_{c}"].dataType).alias(f"__r_{c}")
            for c in right_cols
        ],
        F.struct(*left.columns).alias("__lrow"),
    )
    r = r.withColumn("__lrow", F.lit(None).cast(l.schema["__lrow"].dataType))
    unioned = r.unionByName(l)
    w = (
        W.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "__side",
        "__t",
        "__lrow",
        F.last("__rt", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    ).filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        stale: Column = (
            F.col("__t").cast("long") - F.col("asof_ts").cast("long")
        ) > tolerance_seconds
        carried = carried.select(
            "__lrow",
            F.when(stale, F.lit(None)).otherwise(F.col("asof_ts")).alias("asof_ts"),
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(f"asof_{c}")).alias(
                    f"asof_{c}"
                )
                for c in right_cols
            ],
        )
    else:
        carried = carried.select(
            "__lrow", "asof_ts", *[f"asof_{c}" for c in right_cols]
        )
    return carried.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        "asof_ts",
        *[f"asof_{c}" for c in right_cols],
    )


def range_join_bucketed(
    events: DataFrame,
    intervals: DataFrame,
    key: str,
    event_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Containment join: event rows x interval rows with
    interval.start <= event.ts <= interval.end on the same key.

    `bucket_seconds` must be >= the longest interval so each interval
    covers at most 2 buckets (asserted per-row is not possible cheaply;
    callers own the invariant — a longer interval still joins correctly
    but fans out over more buckets).

    Returns every (event, interval) pairing with all columns of both.
    """
    ev = events.withColumn(
        "__b", F.floor(F.col(event_ts).cast("long") / bucket_seconds)
    )
    iv = intervals.withColumn(
        "__bs",
        F.sequence(
            F.floor(F.col(start_col).cast("long") / bucket_seconds),
            F.floor(F.col(end_col).cast("long") / bucket_seconds),
        ),
    ).withColumn("__b", F.explode("__bs")).drop("__bs")
    ev_k, iv_k = F.col(f"__e.{key}"), F.col(f"__i.{key}")
    joined = ev.alias("__e").join(
        iv.alias("__i"),
        (ev_k == iv_k) & (F.col("__e.__b") == F.col("__i.__b")),
    )
    contained = joined.filter(
        (F.col(f"__e.{event_ts}") >= F.col(f"__i.{start_col}"))
        & (F.col(f"__e.{event_ts}") <= F.col(f"__i.{end_col}"))
    )
    ecols = [F.col(f"__e.{c}") for c in events.columns]
    icols = [
        F.col(f"__i.{c}").alias(c if c != key else f"{key}_interval")
        for c in intervals.columns
    ]
    return contained.select(*ecols, *icols)
