"""Test-table catalog: loads the driver-generated parquet tables and
registers them as temp views so workloads can mix DataFrame and SQL.

All reads are plain `spark.read.parquet` — columnar scan with Catalyst
filter/column pushdown. At 100 TB these would be Iceberg tables with
hidden partitioning (see matano_spark.lake); the workload code is
identical either way because it only sees DataFrames/views.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_columns(path)
    if ns_cols:
        # Parquet TIMESTAMP(NANOS) is illegal for Spark's reader; read ns
        # as long and convert with exact integer division (the data is
        # µs-aligned; truncation matches DuckDB's ns→µs read behavior).
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in ns_cols:
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
    else:
        df = spark.read.parquet(path)
    return _normalize_ntz(df)


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to the session timestamp type.

    µs-precision parquet timestamps not adjusted to UTC read as
    TIMESTAMP_NTZ, on which epoch arithmetic (`cast("long")`,
    `unix_timestamp`) is an AnalysisException. The session is pinned to
    UTC (session.py:26), so NTZ→LTZ is value-preserving and keeps
    DuckDB-oracle parity.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


def _nanos_columns(path: str) -> list[str]:
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view (idempotent)."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
