"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed in Arrow batches (BASELINE.json north star).

Schema convention: a modality column is
    struct<data: binary, meta: struct<mime: string, width: int,
           height: int, duration_ms: long, sample_rate: int>>
Binary payloads never enter expressions — they flow scan → Arrow batch
→ (decode UDF) → output, so Catalyst prunes them unless the UDF stage
actually needs the bytes, and partitioning follows the id column like
any other table.

The decode/resize/frame-sample kernels are STUBS here: the container
has no image/audio libraries, so `decode_image` raises
NotImplementedError unless `fake=True`, where a deterministic fake
decoder (dimensions + checksum from the bytes) exercises the full
Spark plumbing — schema, batch shape, partitioning — which is the part
that has to be right at 100 TB."""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODALITY_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_binary_column(
    df: DataFrame, id_col: str, payload_col: str, mime: str
) -> DataFrame:
    """Wrap a binary payload column into the modality convention."""
    return df.select(
        F.col(id_col).alias("id"),
        F.struct(
            F.col(payload_col).alias("data"),
            F.struct(
                F.lit(mime).alias("mime"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("bigint").alias("duration_ms"),
                F.lit(None).cast("int").alias("sample_rate"),
            ).alias("meta"),
        ).alias("media"),
    )


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode stage: media struct → per-item features via mapInPandas.

    Real decode requires an imaging library not present in this
    container — STUBBED. With fake=True a deterministic pseudo-decoder
    derives width/height from the payload digest so the distributed
    plumbing is fully testable."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library; run with fake=True "
            "to exercise the pipeline with the deterministic stub decoder"
        )

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in FEATURE_SCHEMA.fields}
            for id_, media in zip(pdf["id"], pdf["media"]):
                data = bytes(media["data"]) if media["data"] is not None else b""
                digest = hashlib.md5(data).hexdigest()
                out["id"].append(int(id_))
                out["mime"].append(media["meta"]["mime"])
                out["n_bytes"].append(len(data))
                out["checksum"].append(digest)
                out["width"].append(int(digest[:4], 16) % 4096)
                out["height"].append(int(digest[4:8], 16) % 4096)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FEATURE_SCHEMA)
