"""Oracle-parity helpers.

Floating-point SUM is order-dependent: Spark's partial-aggregate order
is nondeterministic, and even an exact DECIMAL sum fails parity because
decimal→double casting rounds differently between engines (observed 1
ulp differences). The bulletproof construction is scaled-integer
summation:

    sum(x) := CAST(SUM(CAST(ROUND(x * 1e6, 0) AS BIGINT)) AS DOUBLE) / 1e6

Test values carry <= 6 decimal digits (prices/discounts are 2dp, their
3-way products 6dp), so ROUND(x*1e6) recovers the exact integer in
units of 1e-6 in both engines (per-row double arithmetic is IEEE-
deterministic and the result sits ~1e-4 from the rounding boundary).
The BIGINT sum is exact and association-free; the final cast+divide is
a single correctly-rounded double op in each engine → bit-identical.

At scale this costs two extra codegen'd expressions per row inside the
hash aggregate — no extra shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SCALE = 1_000_000.0


def _scaled(c: Column) -> Column:
    return F.round(c * F.lit(SCALE), 0).cast("bigint")


def dsum(col: Column | str) -> Column:
    """Order-independent, engine-portable SUM for <=6dp doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_scaled(c)).cast("double") / F.lit(SCALE)


def sql_dsum(expr: str) -> str:
    return (
        f"(CAST(SUM(CAST(ROUND(({expr}) * 1000000.0, 0) AS BIGINT)) AS DOUBLE)"
        " / 1000000.0)"
    )


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact scaled-integer sum / count / scale."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(_scaled(c)).cast("double") / F.count(F.lit(1))) / F.lit(SCALE)


def sql_davg(expr: str) -> str:
    return (
        f"((CAST(SUM(CAST(ROUND(({expr}) * 1000000.0, 0) AS BIGINT)) AS DOUBLE)"
        " / COUNT(*)) / 1000000.0)"
    )


def views(spark: SparkSession, sf_dir: str) -> None:
    """Register test tables as temp views and pin UTC for oracle parity."""
    from matano_spark import tables
    from matano_spark.session import tune_for_oracle

    tune_for_oracle(spark)
    tables.register_views(spark, sf_dir)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from matano_spark import tables
    from matano_spark.session import tune_for_oracle

    tune_for_oracle(spark)
    return tables.table(spark, sf_dir, name)


def literal_rows(
    spark: SparkSession, rows: list[tuple], cols: list[str]
) -> DataFrame:
    """A handful of constant rows as a pure-JVM relation.

    `spark.createDataFrame(rows)` pickles the rows into a Python RDD
    whose scan launches a Python worker at execution (measured
    ~0.15–0.3 s per query at bench scale — pure overhead for 1–2 row
    catch-all dims). explode(array(struct…)) over range(1) stays
    whole-stage-codegen'd JVM literals: same rows, same column names,
    no Python boundary."""
    structs = [
        F.struct(*[F.lit(v).alias(c) for v, c in zip(r, cols)]) for r in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("__r"))
        .select("__r.*")
    )
