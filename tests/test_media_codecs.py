"""Real media decode kernels (operators/media_codecs.py): PNG filter
reconstruction against a hand-assembled golden file (NOT produced by
our own encoder), encoder/decoder roundtrips, WAV PCM features, and
the Spark mapInPandas end-to-end paths with real bytes."""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from matano_spark.operators.media_codecs import (
    MediaDecodeError,
    png_decode,
    png_encode,
    resize_nearest,
    sniff_mime,
    wav_decode,
)
from matano_spark.operators.multimodal import (
    attach_binary_column,
    decode_audio_features,
    decode_image_features,
    resize_images,
)

def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _hand_png(w, h, color, raw_scanlines: bytes, plte: bytes | None = None) -> bytes:
    """Assemble a PNG by hand from pre-filtered scanline bytes."""
    out = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    )
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw_scanlines)) + _chunk(b"IEND", b"")


# 2x5 grayscale, one row per filter type, filter bytes computed BY HAND
# from the PNG spec's reconstruction equations (see comments).
GOLDEN_FILTERS_PNG = _hand_png(
    2,
    5,
    0,
    bytes(
        [
            0, 10, 20,   # None:    recon [10, 20]
            1, 30, 15,   # Sub:     [30, 30+15=45]
            2, 10, 5,    # Up:      [30+10=40, 45+5=50]
            3, 40, 15,   # Average: [40+floor(40/2)=60, 15+floor((60+50)/2)=70]
            4, 20, 10,   # Paeth:   [20+pred(0,60,0)=80, 10+pred(80,70,60)=90]
        ]
    ),
)
GOLDEN_FILTERS_PIXELS = np.array(
    [[10, 20], [30, 45], [40, 50], [60, 70], [80, 90]], dtype=np.uint8
)


def test_png_golden_all_filters():
    px = png_decode(GOLDEN_FILTERS_PNG)
    assert px.shape == (5, 2, 1)
    np.testing.assert_array_equal(px[:, :, 0], GOLDEN_FILTERS_PIXELS)


def test_png_palette_expansion():
    # 2x2 palette image: PLTE = [red, green], indices [[0,1],[1,0]]
    data = _hand_png(
        2,
        2,
        3,
        bytes([0, 0, 1, 0, 1, 0]),
        plte=bytes([255, 0, 0, 0, 255, 0]),
    )
    px = png_decode(data)
    assert px.shape == (2, 2, 3)
    np.testing.assert_array_equal(px[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(px[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(px[1, 1], [255, 0, 0])


def test_png_roundtrip_rgb_rgba():
    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
        dec = png_decode(png_encode(arr))
        np.testing.assert_array_equal(dec, arr)


def test_png_rejects_garbage_and_bad_crc():
    with pytest.raises(MediaDecodeError):
        png_decode(b"not a png at all")
    corrupt = bytearray(GOLDEN_FILTERS_PNG)
    corrupt[-6] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(MediaDecodeError):
        png_decode(bytes(corrupt))


def test_resize_nearest_exact_mapping():
    # 2x2 distinct colors -> 4x4 duplicates each source pixel 2x2
    arr = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 9, 9]]],
        dtype=np.uint8,
    )
    big = resize_nearest(arr, 4, 4)
    np.testing.assert_array_equal(big, arr.repeat(2, axis=0).repeat(2, axis=1))
    small = resize_nearest(big, 2, 2)
    np.testing.assert_array_equal(small, arr)


def _square_wav(rate=8000, amp=1000, frames=800) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        samples = np.where(np.arange(frames) % 2 == 0, amp, -amp).astype("<i2")
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def test_wav_decode_square_wave():
    rate, nch, nframes, samples = wav_decode(_square_wav())
    assert (rate, nch, nframes) == (8000, 1, 800)
    assert samples.shape == (800, 1)
    assert int(np.max(np.abs(samples))) == 1000
    with pytest.raises(MediaDecodeError):
        wav_decode(b"RIFFnope")


def test_sniff_mime():
    assert sniff_mime(GOLDEN_FILTERS_PNG) == "image/png"
    assert sniff_mime(_square_wav()) == "audio/wav"
    assert sniff_mime(b"\xff\xd8\xff\xe0rest") == "image/jpeg"
    assert sniff_mime(b"plain text") is None


def test_spark_decode_image_features_real(spark):  # noqa: F811
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    png = png_encode(arr)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"garbage"))],
        "doc_id long, payload binary",
    )
    media = attach_binary_column(df, "doc_id", "payload", "application/octet-stream")
    rows = {r.id: r.asDict() for r in decode_image_features(media).collect()}
    assert rows[1]["width"] == 4 and rows[1]["height"] == 6
    assert rows[1]["mime"] == "image/png"  # sniffed, not the declared meta
    assert rows[1]["checksum"] == hashlib.md5(arr.tobytes()).hexdigest()
    assert rows[2]["width"] is None and rows[2]["height"] is None


def test_spark_resize_images_real(spark):  # noqa: F811
    arr = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 9, 9]]],
        dtype=np.uint8,
    )
    df = spark.createDataFrame(
        [(1, bytearray(png_encode(arr)))], "doc_id long, payload binary"
    )
    media = attach_binary_column(df, "doc_id", "payload", "image/png")
    out = resize_images(media, 4, 4).collect()[0]
    assert (out.width, out.height) == (4, 4)
    resized = png_decode(bytes(out.data))
    assert resized.shape == (4, 4, 3)
    np.testing.assert_array_equal(resized, resize_nearest(arr, 4, 4))


def test_spark_decode_audio_features_real(spark):  # noqa: F811
    df = spark.createDataFrame(
        [(1, bytearray(_square_wav())), (2, bytearray(b"nope"))],
        "doc_id long, payload binary",
    )
    media = attach_binary_column(df, "doc_id", "payload", "audio/wav")
    rows = {r.id: r.asDict() for r in decode_audio_features(media).collect()}
    assert rows[1]["sample_rate"] == 8000
    assert rows[1]["channels"] == 1
    assert rows[1]["n_frames"] == 800
    assert rows[1]["duration_ms"] == 100
    assert rows[1]["peak"] == 1000
    assert rows[1]["rms"] == pytest.approx(1000.0)
    assert rows[2]["sample_rate"] is None


# -- GIF: codec roundtrip + the real Spark frame-decode path ----------


def _animated_gif():
    """3-frame 4x4 animated GIF: solid red -> green -> blue, delays
    200/300/500 ms, built by our encoder (decode independence is
    covered by the disposal/interlace goldens below)."""
    from matano_spark.operators.media_codecs import gif_encode

    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [0, 0, 0]], dtype=np.uint8
    )
    frames = [np.full((4, 4), i, dtype=np.uint8) for i in range(3)]
    return gif_encode(frames, palette, delays_ms=[200, 300, 500]), palette


def test_gif_roundtrip_frames_and_delays():
    from matano_spark.operators.media_codecs import gif_decode_frames

    data, palette = _animated_gif()
    assert sniff_mime(data) == "image/gif"
    frames = list(gif_decode_frames(data))
    assert [(i, d) for i, d, _ in frames] == [(0, 200), (1, 300), (2, 500)]
    for i, _, canvas in frames:
        assert canvas.shape == (4, 4, 3)
        np.testing.assert_array_equal(canvas, np.tile(palette[i], (4, 4, 1)))


def test_gif_disposal_restore_background():
    """Hand-assembled 2-frame GIF: frame 2 is a 1x1 sub-rectangle with
    disposal=2 on frame 1 — compositing must overlay, not replace."""
    from matano_spark.operators.media_codecs import (
        _gif_lzw_encode,
        gif_decode_frames,
    )

    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)
    out += bytes([255, 0, 0, 0, 255, 0])  # GCT: red, green (depth 1)
    for left, top, w, h, idx_bytes, disposal in (
        (0, 0, 2, 2, bytes([0, 0, 0, 0]), 1),  # full red frame, keep
        (1, 1, 1, 1, bytes([1]), 2),  # green dot bottom-right
    ):
        out += b"\x21\xf9\x04" + struct.pack("<BHB", disposal << 2, 10, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        lzw = _gif_lzw_encode(2, idx_bytes)
        out += bytes([2, len(lzw)]) + lzw + b"\x00"
    out += b"\x3b"
    frames = list(gif_decode_frames(bytes(out)))
    assert len(frames) == 2
    np.testing.assert_array_equal(
        frames[0][2], np.tile([255, 0, 0], (2, 2, 1)).astype(np.uint8)
    )
    f2 = frames[1][2]
    np.testing.assert_array_equal(f2[1, 1], [0, 255, 0])  # the dot
    np.testing.assert_array_equal(f2[0, 0], [255, 0, 0])  # red kept


def test_spark_decode_frames_real_gif(spark):  # noqa: F811
    """decode_frames default path: timeline-sampled composited-canvas
    checksums from a real animated GIF; undecodable bytes sideline."""
    from matano_spark.operators.media_codecs import gif_decode_frames
    from matano_spark.operators.multimodal import decode_frames

    data, palette = _animated_gif()
    expected = {
        i: hashlib.md5(canvas.tobytes()).hexdigest()
        for i, _, canvas in gif_decode_frames(data)
    }
    df = spark.createDataFrame(
        [(1, bytearray(data)), (2, bytearray(b"not a gif"))],
        "doc_id long, payload binary",
    )
    media = attach_binary_column(df, "doc_id", "payload", "image/gif")
    rows = sorted(
        decode_frames(media, every_ms=250).collect(),
        key=lambda r: (r.id, r.frame_idx),
    )
    g1 = [r for r in rows if r.id == 1]
    # timeline: f0 [0,200), f1 [200,500), f2 [500,1000) -> samples at
    # 0,250,500,750 see frames 0,1,2,2
    assert [r.offset_ms for r in g1] == [0, 250, 500, 750]
    assert [r.frame_checksum for r in g1] == [
        expected[0], expected[1], expected[2], expected[2],
    ]
    side = [r for r in rows if r.id == 2]
    assert len(side) == 1 and side[0].frame_checksum is None
