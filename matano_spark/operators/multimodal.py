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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("offset_ms", T.LongType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def sample_frame_refs(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling GRID for video-like media: one row per sampled
    timestamp, from metadata alone — (id, frame_idx, offset_ms).

    Pure Column math (sequence + posexplode over duration_ms): the
    binary payload is UNTOUCHED, so Catalyst prunes it from the scan
    entirely — at 100 TB the grid for a billion videos is computed
    without reading a single video byte. The decode of the referenced
    frames is the separate mapInPandas stage (decode_frames), which is
    the only stage that pulls payload bytes into Python.
    """
    grid = F.sequence(
        F.lit(0).cast("bigint"),
        F.greatest(F.col("media.meta.duration_ms") - 1, F.lit(0).cast("bigint")),
        F.lit(every_ms).cast("bigint"),
    )
    return df.select(
        "id", F.posexplode(grid).alias("frame_idx", "offset_ms")
    ).select(
        "id", F.col("frame_idx").cast("int").alias("frame_idx"), "offset_ms"
    )


def decode_frames(
    df: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Frame decode: media struct → one row per sampled frame.

    Real frame extraction needs a video library not in this container —
    STUBBED. fake=True derives each frame's checksum from
    (payload digest, offset) so cardinality, ordering, and batch shape
    are all real and testable. Cardinality-CHANGING mapInPandas: one
    input row yields ceil(duration/every_ms) output rows.
    """
    if not fake:
        raise NotImplementedError(
            "frame decode requires a video library; run with fake=True "
            "to exercise the pipeline with the deterministic stub"
        )

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in FRAME_SCHEMA.fields}
            for id_, media in zip(pdf["id"], pdf["media"]):
                data = bytes(media["data"]) if media["data"] is not None else b""
                digest = hashlib.md5(data).hexdigest()
                dur = media["meta"]["duration_ms"] or 0
                n = max(1, -(-int(dur) // every_ms)) if dur > 0 else 1
                for i in range(n):
                    off = i * every_ms
                    out["id"].append(int(id_))
                    out["frame_idx"].append(i)
                    out["offset_ms"].append(off)
                    out["frame_checksum"].append(
                        hashlib.md5(f"{digest}:{off}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)


def audio_windows(df: DataFrame, window_ms: int = 1000) -> DataFrame:
    """Fixed-size analysis windows for audio-like media: (id, window
    start/end in ms AND samples) from sample_rate + duration_ms
    metadata — pure Column math, payload never read. The downstream
    feature extractor (spectrogram, VAD, ...) plugs into the same
    mapInPandas slot as decode_frames."""
    grid = F.sequence(
        F.lit(0).cast("bigint"),
        F.greatest(F.col("media.meta.duration_ms") - 1, F.lit(0).cast("bigint")),
        F.lit(window_ms).cast("bigint"),
    )
    rate = F.col("media.meta.sample_rate").cast("bigint")
    return (
        df.select(
            "id",
            rate.alias("sample_rate"),
            F.col("media.meta.duration_ms").alias("duration_ms"),
            F.posexplode(grid).alias("window_idx", "start_ms"),
        )
        .select(
            "id",
            F.col("window_idx").cast("int").alias("window_idx"),
            "start_ms",
            F.least(
                F.col("start_ms") + window_ms, F.col("duration_ms")
            ).alias("end_ms"),
            (F.col("start_ms") * F.col("sample_rate") / 1000)
            .cast("bigint")
            .alias("start_sample"),
            (
                F.least(F.col("start_ms") + window_ms, F.col("duration_ms"))
                * F.col("sample_rate")
                / 1000
            )
            .cast("bigint")
            .alias("end_sample"),
        )
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Resize stage: media struct → resized binary + new dims.

    Real resize needs an imaging library — STUBBED. fake=True emits a
    deterministic pseudo-payload (digest of input bytes + target dims)
    so the binary-in/binary-out Arrow path — the expensive shape at
    100 TB, where both directions stream payload bytes — is exercised
    end to end."""
    if not fake:
        raise NotImplementedError(
            "image resize requires an imaging library; run with fake=True "
            "to exercise the binary-in/binary-out path with the stub"
        )

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in RESIZED_SCHEMA.fields}
            for id_, media in zip(pdf["id"], pdf["media"]):
                data = bytes(media["data"]) if media["data"] is not None else b""
                digest = hashlib.md5(data).hexdigest()
                out["id"].append(int(id_))
                out["data"].append(f"{digest}:{width}x{height}".encode())
                out["width"].append(width)
                out["height"].append(height)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, RESIZED_SCHEMA)
