"""Multi-resolution time rollup (hypertable continuous-aggregate
pattern): hour → day → month, each level aggregated FROM the next
finer level rather than from raw rows.

At 100 TB this is the difference between one full scan and three: raw
events aggregate once into the hourly level (the only pass over the
fact table); daily re-aggregates the hourly rows (≈ 10⁴-10⁶× smaller),
monthly re-aggregates daily. The same shape incrementalizes naturally:
a streaming job maintains the hourly level, and the coarser levels
refresh from it on a cadence.

Correctness requires the measures to be re-aggregatable: counts/sums
fold exactly; the float sums are carried as SCALED BIGINTS through the
cascade and only converted to double at the output edge, so the
cascaded result is bit-identical to a direct single-level aggregation
(same property workloads.util.dsum relies on).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000.0

RESOLUTIONS = ("hour", "day", "month")


def time_cascade(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    resolutions: tuple[str, ...] = RESOLUTIONS,
) -> DataFrame:
    """Cascaded rollup of `df` over `resolutions` (fine → coarse).

    Returns one unioned frame: (resolution, bucket, *key_cols,
    n_events, total_value) — total_value exact to 6dp at every level.
    """
    scaled = F.round(F.col(value_col) * F.lit(SCALE), 0).cast("bigint")
    finest = resolutions[0]
    level = df.groupBy(
        F.date_trunc(finest, F.col(ts_col)).alias("bucket"), *key_cols
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(scaled).alias("__sv"),
    )
    # Materialize each level before it fans out (into the next level
    # AND the output union): without this, Spark recomputes the common
    # subplan per union branch and the plan scans raw once per
    # resolution — the exact rescan the cascade exists to avoid
    # (plan-pinned: one `Scan parquet` total). Levels are aggregates —
    # tiny relative to raw — so executor-local materialization is the
    # same cost a real continuous-aggregate table pays by design.
    level = level.localCheckpoint(eager=True)
    levels = {finest: level}
    for res in resolutions[1:]:
        level = level.groupBy(
            F.date_trunc(res, F.col("bucket")).alias("bucket"), *key_cols
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("__sv").alias("__sv"),
        )
        level = level.localCheckpoint(eager=True)
        levels[res] = level
    tagged = [
        lv.select(
            F.lit(res).alias("resolution"),
            "bucket",
            *key_cols,
            F.col("n_events").cast("bigint").alias("n_events"),
            (F.col("__sv").cast("double") / F.lit(SCALE)).alias("total_value"),
        )
        for res, lv in levels.items()
    ]
    return reduce(lambda a, b: a.unionByName(b), tagged)
