"""Skew mitigation: salting for hot keys (brief: "skewed keys hurt —
salting for skew; AQE for runtime re-plan").

AQE's skew-join split handles most sort-merge cases automatically
(enabled in session.py). Salting remains the tool for the cases AQE
cannot rewrite:
- shuffle joins where one key dominates AND the small side cannot
  broadcast: `salted_join` spreads the hot key across
  `salt_factor` partitions by replicating the small side;
- holistic aggregations (collect_list/set) over skewed keys where
  partial aggregation cannot shrink the hot partition: two-stage
  `salted_collect_set` aggregates per (key, salt) then merges.

Salt values only affect placement, never results, so F.rand-based
salts are semantically safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_partitions(df: DataFrame) -> DataFrame:
    """Round-robin a narrow relation up to the cluster's parallelism
    before an expensive per-row stage. A small input (one parquet
    split) otherwise pins every downstream map — a compiled transform
    projection, shingle hashing, signature folds — to a single core;
    at real scale the scan already has enough splits and this is a
    no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big side salted and the small side
    replicated salt_factor times. Output == big.join(small, on, how)
    with the hot key's rows spread across salt_factor tasks."""
    b = big.withColumn("__salt", (F.rand(seed) * salt_factor).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")


def salted_collect_set(
    df: DataFrame, key: str, value: str, salt_factor: int = 8, seed: int = 42
) -> DataFrame:
    """Two-stage distinct-collect for skewed keys: per-(key, salt)
    partial sets, then a merge of salt_factor small arrays — the hot
    key never funnels all raw rows through one task. Output column
    `values` is sorted for determinism."""
    partial = (
        df.withColumn("__salt", (F.rand(seed) * salt_factor).cast("int"))
        .groupBy(key, "__salt")
        .agg(F.collect_set(value).alias("__vals"))
    )
    return (
        partial.groupBy(key)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("__vals")))
            ).alias("values")
        )
    )
