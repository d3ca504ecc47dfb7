"""Lake table abstraction: one API over Iceberg (when the runtime jar
is on the classpath) and partitioned-parquet directories (this
container). Pipeline code writes through `LakeTable` and never cares
which backend landed the rows.

Iceberg path (ref: MatanoIcebergTableCustomResource.kt table creation,
IcebergMetadataWriter.kt commits): `CREATE TABLE ... USING iceberg
PARTITIONED BY (hours(ts))`, `df.writeTo(t).append()`, `MERGE INTO`
for upserts, `CALL ...` procedures for maintenance — see
operators.maintenance and schema.ddl for the statements.

Parquet fallback: hour-partition column `ts_hour=yyyy-MM-dd-HH`
(exactly the reference's partition path, transformer/src/main.rs:
961-965), append/overwrite writes, latest-wins merge emulation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matano_spark.operators.maintenance import iceberg_available
from matano_spark.schema.ddl import create_table_ddl

TS_HOUR_FMT = "yyyy-MM-dd-HH"


def ts_hour_utc(col: F.Column | str) -> F.Column:
    """UTC-pinned hour-partition key (ref: partition path derives from
    the event time's UTC hour, IcebergMetadataWriter.kt:60-65 /
    transformer/src/main.rs:961-965). `date_format` alone renders in
    the SESSION timezone — a job launched under a non-UTC session would
    scatter the same instants into different partitions. to_utc_timestamp
    against the current session zone pins rendering to UTC regardless."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(
        F.to_utc_timestamp(c, F.current_timezone()), TS_HOUR_FMT
    )


class LakeTable:
    def __init__(
        self,
        spark: SparkSession,
        name: str,
        path: str,
        ts_col: str = "ts",
        use_iceberg: bool | None = None,
    ):
        self.spark = spark
        self.name = name
        self.path = path
        self.ts_col = ts_col
        self.iceberg = (
            iceberg_available(spark) if use_iceberg is None else use_iceberg
        )

    # -- DDL ----------------------------------------------------------
    def ddl(self, schema) -> str:
        return create_table_ddl(self.name, schema)

    # -- writes -------------------------------------------------------
    def _with_partition(self, df: DataFrame) -> DataFrame:
        if self.ts_col in df.columns and "ts_hour" not in df.columns:
            return df.withColumn("ts_hour", ts_hour_utc(self.ts_col))
        return df

    def append(self, df: DataFrame) -> None:
        if self.iceberg:
            df.writeTo(self.name).append()
            return
        (
            self._with_partition(df)
            .write.mode("append")
            .partitionBy("ts_hour")
            .parquet(self.path)
        )

    def overwrite(self, df: DataFrame) -> None:
        """Dynamic partition overwrite on BOTH backends: only the
        ts_hour partitions present in `df` are replaced — a partial
        write never deletes untouched hour partitions (matches Iceberg
        overwritePartitions semantics)."""
        if self.iceberg:
            df.writeTo(self.name).overwritePartitions()
            return
        out = self._with_partition(df)
        out.write.mode("overwrite").partitionBy("ts_hour").parquet(
            self.path + ".tmp"
        )
        (
            self.spark.read.parquet(self.path + ".tmp")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ts_hour")
            .parquet(self.path)
        )

    def merge_by_key(self, df: DataFrame, key_cols: list[str]) -> None:
        """Upsert: MERGE INTO on Iceberg; latest-wins rewrite on the
        parquet fallback (new rows shadow old rows per key)."""
        if self.iceberg:
            view = f"__merge_src_{self.name.replace('.', '_')}"
            df.createOrReplaceTempView(view)
            on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
            self.spark.sql(
                f"MERGE INTO {self.name} t USING {view} s ON {on} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
            return
        from pyspark.sql import Window as W

        new = self._with_partition(df).withColumn("__gen", F.lit(1))
        if os.path.exists(self.path):
            old = self.spark.read.parquet(self.path).withColumn(
                "__gen", F.lit(0)
            )
            merged = old.unionByName(new, allowMissingColumns=True)
        else:
            merged = new
        w = W.partitionBy(*key_cols).orderBy(F.desc("__gen"))
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__gen")
        )
        latest.persist()
        latest.count()
        latest.write.mode("overwrite").partitionBy("ts_hour").parquet(
            self.path + ".tmp"
        )
        self.spark.read.parquet(self.path + ".tmp").write.mode(
            "overwrite"
        ).partitionBy("ts_hour").parquet(self.path)
        latest.unpersist()

    # -- reads --------------------------------------------------------
    def read(self, schema=None) -> DataFrame:
        """Read the table; pass the RESOLVED table schema to make the
        parquet fallback schema-evolution-safe.

        A pack upgrade that declares a new field leaves older files
        without the column; a plain parquet read takes its schema from
        an arbitrary footer, so the new column can silently vanish (or
        a query against it fail) depending on which file is sampled.
        Reading with the resolved schema pins the contract: files
        missing a declared column yield typed nulls — the same
        evolution semantics Iceberg provides from its own metadata,
        which is why the Iceberg path needs no schema argument.
        """
        if self.iceberg:
            return self.spark.table(self.name)
        if schema is None:
            return self.spark.read.parquet(self.path)
        import pyspark.sql.types as T

        names = {f.name for f in schema.fields}
        fields = list(schema.fields) + (
            [] if "ts_hour" in names
            else [T.StructField("ts_hour", T.StringType())]
        )
        return self.spark.read.schema(T.StructType(fields)).parquet(self.path)

    def read_hours(self, start_hour: str, end_hour: str) -> DataFrame:
        """Partition-pruned read over [start_hour, end_hour] — the
        'last day of partitions' alert-state scan shape
        (matano_alerts.rs:578-601)."""
        df = self.read()
        return df.filter(
            (F.col("ts_hour") >= start_hour) & (F.col("ts_hour") <= end_hour)
        )
