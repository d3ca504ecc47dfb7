"""DDL + view generation from StructType.

- create_table_ddl: Iceberg CREATE TABLE with hidden partitioning
  (hours(ts) default, identity/bucket supported — the reference's
  partition transforms, MatanoIcebergTableCustomResource.kt:105-128).
- flattened_view_sql / flatten_columns: per-table `<t>_view` that
  flattens every nested leaf to `a_b_c` columns (ref:
  MatanoIcebergTableCustomResource.kt:266-318 — the Athena-precision
  timestamp cast there is unnecessary on Spark)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _sql_type(dt: T.DataType) -> str:
    if isinstance(dt, T.StructType):
        inner = ", ".join(f"{f.name}: {_sql_type(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    if isinstance(dt, T.ArrayType):
        return f"array<{_sql_type(dt.elementType)}>"
    return dt.simpleString()


def create_table_ddl(
    table: str,
    schema: T.StructType,
    partition_by: tuple[str, ...] = ("hours(ts)",),
    table_format: str = "iceberg",
    properties: dict[str, str] | None = None,
) -> str:
    cols = ",\n  ".join(f"{f.name} {_sql_type(f.dataType)}" for f in schema.fields)
    parts = ", ".join(partition_by)
    props = dict(
        {"write.parquet.compression-codec": "zstd"}, **(properties or {})
    )
    props_sql = ",\n  ".join(f"'{k}' = '{v}'" for k, v in props.items())
    return (
        f"CREATE TABLE IF NOT EXISTS {table} (\n  {cols}\n)\n"
        f"USING {table_format}\n"
        f"PARTITIONED BY ({parts})\n"
        f"TBLPROPERTIES (\n  {props_sql}\n)"
    )


def _leaves(schema: T.StructType, prefix: tuple[str, ...] = ()):
    for f in schema.fields:
        path = prefix + (f.name,)
        if isinstance(f.dataType, T.StructType):
            yield from _leaves(f.dataType, path)
        else:
            yield path, f.dataType


def flatten_columns(df: DataFrame) -> DataFrame:
    """Every nested leaf as a top-level `a_b_c` column (lists kept)."""
    cols = [
        F.col(".".join(path)).alias("_".join(path))
        for path, _dt in _leaves(df.schema)
    ]
    return df.select(*cols)


def flattened_view_sql(table: str, schema: T.StructType, view: str | None = None) -> str:
    view = view or f"{table}_view"
    sel = ",\n  ".join(
        f"{'.'.join(path)} AS {'_'.join(path)}" for path, _dt in _leaves(schema)
    )
    return f"CREATE OR REPLACE VIEW {view} AS\nSELECT\n  {sel}\nFROM {table}"
