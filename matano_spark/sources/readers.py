"""Ingestion format readers + routing (SURVEY.md §2.1).

S1  file/object source        → spark.read / readStream over a path
S2  compression inference     → extension-based codecs are native in
    Spark/Hadoop (.gz/.zst); wrong-extension objects are sniffed by
    magic bytes from a binaryFile scan and decompressed in Arrow
    batches (the only Python hop, and only for mislabeled objects)
S3  line framing              → text source; JSON-object lines vs raw
    lines split into {json}/{message} columns
S4  CSV with configured headers (no header row in file, flexible
    arity, whitespace trim — ref transformer/src/main.rs:1520-1548)
S5  CloudWatch Logs subscription unwrap → explode logEvents
    (ref transformer/src/main.rs:547-605)
S6  expand_records_from_payload → whole payload as one value, explode
    an inner array (ref :492-524; CloudTrail `.Records`)
S7  select_table_from_payload_metadata → object-level routing by file
    path BEFORE row processing (abort skips whole files — a path
    filter, not a row filter; ref :405-490)
S9  log-source routing by bucket/prefix/regex (data_batcher/src/
    main.rs:42-126) → path glob + regex on _metadata.file_path
"""

from __future__ import annotations

import gzip
import io
import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GZIP_MAGIC = b"\x1f\x8b"
ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


# -- S3: line framing -------------------------------------------------------


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited records with the json/message dichotomy:
    object-looking lines land in `json`, everything else in `message`
    (ref transformer/src/main.rs:537-543,606-617)."""
    raw = spark.read.text(path).withColumn(
        "_file", F.col("_metadata.file_path")
    )
    is_json = F.trim(F.col("value")).startswith("{")
    return raw.select(
        F.when(is_json, F.col("value")).alias("json"),
        F.when(~is_json, F.col("value")).alias("message"),
        "_file",
    )


# -- S4: CSV with configured headers ---------------------------------------


def read_csv_with_headers(
    spark: SparkSession, path: str, headers: list[str]
) -> DataFrame:
    """Headerless CSV mapped to configured column names; extra columns
    dropped, missing → null (flexible arity), whitespace trimmed."""
    schema = T.StructType([T.StructField(h, T.StringType()) for h in headers])
    return spark.read.csv(
        path,
        schema=schema,
        header=False,
        mode="PERMISSIVE",
        ignoreLeadingWhiteSpace=True,
        ignoreTrailingWhiteSpace=True,
    )


# -- S5: CloudWatch Logs unwrap --------------------------------------------

CLOUDWATCH_SCHEMA = T.StructType(
    [
        T.StructField("messageType", T.StringType()),
        T.StructField("owner", T.StringType()),
        T.StructField("logGroup", T.StringType()),
        T.StructField("logStream", T.StringType()),
        T.StructField("subscriptionFilters", T.ArrayType(T.StringType())),
        T.StructField(
            "logEvents",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("timestamp", T.LongType()),
                        T.StructField("message", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def unwrap_cloudwatch(df: DataFrame, payload_col: str = "json") -> DataFrame:
    """DATA_MESSAGE payload → one row per log event {ts, message}."""
    parsed = df.select(
        F.from_json(F.col(payload_col), CLOUDWATCH_SCHEMA).alias("cw")
    ).filter(F.col("cw.messageType") == "DATA_MESSAGE")
    ev = parsed.select(
        F.col("cw.logGroup").alias("log_group"),
        F.col("cw.logStream").alias("log_stream"),
        F.explode("cw.logEvents").alias("e"),
    )
    return ev.select(
        "log_group",
        "log_stream",
        F.timestamp_millis(F.col("e.timestamp")).alias("ts"),
        F.col("e.message").alias("message"),
    )


# -- S6: expand records from payload ---------------------------------------


def expand_records(
    df: DataFrame,
    payload_col: str,
    records_field: str,
    element_schema: T.DataType | None = None,
) -> DataFrame:
    """Whole payload bound to __raw; an inner array field becomes the
    record stream (CloudTrail `.Records`, ref usage
    aws_cloudtrail/tables/default.yml:4)."""
    if element_schema is not None:
        arr_schema = T.StructType(
            [T.StructField(records_field, T.ArrayType(element_schema))]
        )
        parsed = F.from_json(F.col(payload_col), arr_schema)
        return df.select(
            F.explode(parsed.getField(records_field)).alias("record")
        ).select("record.*")
    # schemaless: keep records as raw JSON strings via variant
    v = F.try_parse_json(F.col(payload_col))
    arr = F.try_variant_get(v, f"$.{records_field}", "array<variant>")
    return df.select(F.explode(arr).alias("record_variant")).select(
        F.to_json(F.col("record_variant")).alias("json")
    )


# -- S7/S9: routing ---------------------------------------------------------


def route_by_path(
    df: DataFrame,
    rules: list[tuple[str, str]],
    default: str | None = None,
    path_col: str = "_file",
) -> DataFrame:
    """Object-level table routing: first regex match on the file path
    wins; None default drops unmatched files entirely (object-level
    abort BEFORE row processing)."""
    col = F.col(path_col)
    expr = None
    for pattern, table in rules:
        cond = col.rlike(pattern)
        expr = F.when(cond, table) if expr is None else expr.when(cond, table)
    expr = expr.otherwise(F.lit(default)) if expr is not None else F.lit(default)
    out = df.withColumn("resolved_table", expr)
    return out.filter(F.col("resolved_table").isNotNull())


def route_streams(df: DataFrame, tables: list[str]) -> dict[str, DataFrame]:
    """One filtered stream per resolved table (S8 write fan-out)."""
    return {t: df.filter(F.col("resolved_table") == t) for t in tables}


# -- S2: magic-byte sniffing for mislabeled compressed objects --------------


def read_lines_sniffed(spark: SparkSession, path: str) -> DataFrame:
    """binaryFile scan + magic-byte dispatch (gzip incl. multi-member;
    zstd where the codec is available), then line framing. Used only
    for objects whose extension lies (ref transformer/src/main.rs:
    167-251 infers from Content-Encoding/Type, extension, magic
    bytes); correctly-named files take the native JVM codec path."""

    bin_df = spark.read.format("binaryFile").load(path)

    out_schema = T.StructType(
        [
            T.StructField("value", T.StringType()),
            T.StructField("_file", T.StringType()),
        ]
    )

    def decode(batches) -> Iterator:
        import pandas as pd

        try:
            import zstandard  # type: ignore
        except Exception:  # noqa: BLE001
            zstandard = None

        for pdf in batches:
            rows = {"value": [], "_file": []}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == GZIP_MAGIC:
                    # multi-member gzip: GzipFile reads all members
                    with gzip.GzipFile(fileobj=io.BytesIO(data)) as g:
                        data = g.read()
                elif data[:4] == ZSTD_MAGIC and zstandard is not None:
                    data = zstandard.ZstdDecompressor().decompress(data)
                if not data:
                    continue  # empty objects are skipped (size>0 filter)
                for line in data.decode("utf-8", errors="replace").splitlines():
                    if line:
                        rows["value"].append(line)
                        rows["_file"].append(fpath)
            yield pd.DataFrame(rows, columns=["value", "_file"])

    return bin_df.mapInPandas(decode, out_schema)
