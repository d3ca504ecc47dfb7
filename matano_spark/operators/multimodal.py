"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed in Arrow batches (BASELINE.json north star).

Schema convention: a modality column is
    struct<data: binary, meta: struct<mime: string, width: int,
           height: int, duration_ms: long, sample_rate: int>>
Binary payloads never enter expressions — they flow scan → Arrow batch
→ (decode UDF) → output, so Catalyst prunes them unless the UDF stage
actually needs the bytes, and partitioning follows the id column like
any other table.

Image (PNG), audio (WAV) and video-frame (animated GIF) kernels are
REAL, pure-stdlib codecs (operators/media_codecs.py: zlib inflate +
PNG filter reconstruction, wave/PCM unpack, GIF LZW + GIF89a
disposal compositing) — fake=True swaps in a deterministic
pseudo-decoder for plumbing tests that don't want to construct valid
media bytes."""

from __future__ import annotations

import bisect
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

    Real path (default): pure-stdlib PNG decode (media_codecs) —
    width/height from IHDR, checksum over the RECONSTRUCTED pixel
    buffer (so it proves full filter reconstruction, not a header
    peek). Undecodable payloads yield a row with null dimensions and
    the raw-bytes digest — sidelined, never task-fatal. fake=True
    keeps the deterministic pseudo-decoder (dimensions from the
    payload digest) for plumbing tests."""

    def run(batches) -> Iterator:
        import pandas as pd

        from matano_spark.operators.media_codecs import (
            MediaDecodeError,
            png_decode,
            sniff_mime,
        )

        for pdf in batches:
            out = {k.name: [] for k in FEATURE_SCHEMA.fields}
            for id_, media in zip(pdf["id"], pdf["media"]):
                data = bytes(media["data"]) if media["data"] is not None else b""
                digest = hashlib.md5(data).hexdigest()
                out["id"].append(int(id_))
                out["n_bytes"].append(len(data))
                if fake:
                    out["mime"].append(media["meta"]["mime"])
                    out["checksum"].append(digest)
                    out["width"].append(int(digest[:4], 16) % 4096)
                    out["height"].append(int(digest[4:8], 16) % 4096)
                    continue
                out["mime"].append(
                    sniff_mime(data) or media["meta"]["mime"]
                )
                try:
                    px = png_decode(data)
                    out["checksum"].append(
                        hashlib.md5(px.tobytes()).hexdigest()
                    )
                    out["width"].append(int(px.shape[1]))
                    out["height"].append(int(px.shape[0]))
                except MediaDecodeError:
                    out["checksum"].append(digest)
                    out["width"].append(None)
                    out["height"].append(None)
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

    Real path (default): pure-stdlib animated-GIF decode
    (media_codecs.gif_decode_frames — LZW, interlace, full GIF89a
    disposal/transparency compositing). Per-frame delays build the
    timeline; each sample offset (0, every_ms, ...) checksums the
    COMPOSITED canvas visible at that instant, so the hash proves the
    disposal model ran, not a header peek. Undecodable payloads yield
    one sideline row (null checksum) — never task-fatal. fake=True
    keeps the deterministic pseudo-decoder (checksum from payload
    digest + offset) for plumbing tests that don't want to construct
    valid media bytes. Cardinality-CHANGING mapInPandas: one input
    row yields ceil(duration/every_ms) output rows.
    """

    def run(batches) -> Iterator:
        import pandas as pd

        from matano_spark.operators.media_codecs import (
            MediaDecodeError,
            gif_decode_frames,
        )

        for pdf in batches:
            out = {k.name: [] for k in FRAME_SCHEMA.fields}

            def emit(id_, i, off, checksum):
                out["id"].append(int(id_))
                out["frame_idx"].append(i)
                out["offset_ms"].append(off)
                out["frame_checksum"].append(checksum)

            for id_, media in zip(pdf["id"], pdf["media"]):
                data = bytes(media["data"]) if media["data"] is not None else b""
                digest = hashlib.md5(data).hexdigest()
                if fake:
                    dur = media["meta"]["duration_ms"] or 0
                    n = max(1, -(-int(dur) // every_ms)) if dur > 0 else 1
                    for i in range(n):
                        off = i * every_ms
                        emit(
                            id_, i, off,
                            hashlib.md5(f"{digest}:{off}".encode()).hexdigest(),
                        )
                    continue
                try:
                    starts, sums = [], []
                    t = 0
                    for _idx, delay_ms, canvas in gif_decode_frames(data):
                        starts.append(t)
                        sums.append(hashlib.md5(canvas.tobytes()).hexdigest())
                        t += max(0, int(delay_ms))
                    if not sums:
                        raise MediaDecodeError("GIF with no frames")
                except (MediaDecodeError, IndexError, ValueError):
                    emit(id_, 0, 0, None)  # sideline row
                    continue
                total = t
                offsets = (
                    range(0, total, every_ms) if total > 0 else [0]
                )
                for i, off in enumerate(offsets):
                    # frame visible at `off`: last start <= off
                    j = max(0, bisect.bisect_right(starts, off) - 1)
                    emit(id_, i, off, sums[j])
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

    Real path (default): PNG decode → nearest-neighbor resample →
    PNG re-encode, all pure-stdlib (media_codecs) — the
    binary-in/binary-out Arrow path, the expensive shape at 100 TB
    where both directions stream payload bytes. Undecodable payloads
    emit a null-data row. fake=True emits the deterministic
    pseudo-payload (digest of input bytes + target dims) instead."""

    def run(batches) -> Iterator:
        import pandas as pd

        from matano_spark.operators.media_codecs import (
            MediaDecodeError,
            png_decode,
            png_encode,
            resize_nearest,
        )

        for pdf in batches:
            out = {k.name: [] for k in RESIZED_SCHEMA.fields}
            for id_, media in zip(pdf["id"], pdf["media"]):
                data = bytes(media["data"]) if media["data"] is not None else b""
                out["id"].append(int(id_))
                if fake:
                    digest = hashlib.md5(data).hexdigest()
                    out["data"].append(f"{digest}:{width}x{height}".encode())
                    out["width"].append(width)
                    out["height"].append(height)
                    continue
                try:
                    px = resize_nearest(png_decode(data), width, height)
                    out["data"].append(png_encode(px))
                    out["width"].append(width)
                    out["height"].append(height)
                except MediaDecodeError:
                    out["data"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, RESIZED_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def decode_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Audio decode stage: media struct → per-item PCM features via
    the same mapInPandas slot as image decode.

    Real path (default): stdlib wave/PCM decode (media_codecs) —
    sample rate, channel count, frame count, duration, RMS energy and
    peak amplitude over the actual samples. Undecodable payloads
    yield null features. fake=True derives pseudo-features from the
    payload digest for plumbing tests."""

    def run(batches) -> Iterator:
        import numpy as np
        import pandas as pd

        from matano_spark.operators.media_codecs import (
            MediaDecodeError,
            wav_decode,
        )

        for pdf in batches:
            out = {k.name: [] for k in AUDIO_SCHEMA.fields}
            for id_, media in zip(pdf["id"], pdf["media"]):
                data = bytes(media["data"]) if media["data"] is not None else b""
                out["id"].append(int(id_))
                if fake:
                    digest = hashlib.md5(data).hexdigest()
                    out["sample_rate"].append(8000)
                    out["channels"].append(1)
                    out["n_frames"].append(len(data))
                    out["duration_ms"].append(len(data) * 1000 // 8000)
                    out["rms"].append(float(int(digest[:4], 16)))
                    out["peak"].append(int(digest[4:8], 16))
                    continue
                try:
                    rate, nch, nframes, samples = wav_decode(data)
                    out["sample_rate"].append(rate)
                    out["channels"].append(nch)
                    out["n_frames"].append(nframes)
                    out["duration_ms"].append(
                        nframes * 1000 // rate if rate else None
                    )
                    flat = samples.astype(np.float64)
                    out["rms"].append(
                        float(np.sqrt(np.mean(flat * flat)))
                        if flat.size
                        else 0.0
                    )
                    out["peak"].append(
                        int(np.max(np.abs(samples))) if samples.size else 0
                    )
                except MediaDecodeError:
                    out["sample_rate"].append(None)
                    out["channels"].append(None)
                    out["n_frames"].append(None)
                    out["duration_ms"].append(None)
                    out["rms"].append(None)
                    out["peak"].append(None)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, AUDIO_SCHEMA)
