"""Pure-stdlib media codecs backing the real (fake=False) decode path
of operators/multimodal.py: PNG via zlib inflate + per-spec scanline
filter reconstruction, WAV via the stdlib wave module + numpy PCM
unpack. No third-party imaging/audio library — everything here is the
published PNG (RFC 2083 / ISO 15948) and RIFF/WAVE formats.

These run INSIDE the Arrow-batched mapInPandas kernels, so the unit of
work is one payload per call on an executor core; the Spark-side
plumbing (schema, partitioning, batch shape) is unchanged from the
stub path. Per-scanline filter reconstruction is numpy-vectorized
across the row for filters None/Up and runs a per-pixel recurrence
(vectorized across channels) for Sub/Average/Paeth, which the spec
makes inherently sequential along x.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_COLOR_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class MediaDecodeError(ValueError):
    """Payload is not decodable media (bad magic, CRC, or an
    unsupported profile). The decode kernels catch this and emit a
    null-feature row instead of failing the task — at 100 TB a corrupt
    object must sideline, not kill the stage."""


def sniff_mime(data: bytes) -> str | None:
    if data.startswith(PNG_SIG):
        return "image/png"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if data[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    return None


def _png_chunks(data: bytes):
    if not data.startswith(PNG_SIG):
        raise MediaDecodeError("not a PNG (bad signature)")
    pos = 8
    while pos + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        if pos + 12 + ln > len(data):
            raise MediaDecodeError("truncated PNG chunk")
        chunk = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(typ + chunk) & 0xFFFFFFFF != crc:
            raise MediaDecodeError(f"bad CRC in {typ.decode('latin1')}")
        yield typ, chunk
        pos += 12 + ln
        if typ == b"IEND":
            return
    raise MediaDecodeError("no IEND chunk")


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG → uint8 array (h, w, ch).

    Supports color types 0 (gray), 2 (RGB), 3 (palette → expanded to
    RGB), 4 (gray+alpha), 6 (RGBA). All five scanline filters are
    reconstructed per the spec."""
    ihdr = None
    idat: list[bytes] = []
    plte = None
    for typ, chunk in _png_chunks(data):
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"PLTE":
            plte = chunk
    if ihdr is None or len(ihdr) != 13:
        raise MediaDecodeError("missing/short IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise MediaDecodeError(f"unsupported bit depth {depth}")
    if color not in _COLOR_CHANNELS:
        raise MediaDecodeError(f"unsupported color type {color}")
    if comp != 0 or filt != 0:
        raise MediaDecodeError("unsupported compression/filter method")
    if interlace != 0:
        raise MediaDecodeError("interlaced PNG not supported")
    if w == 0 or h == 0:
        raise MediaDecodeError("zero-dimension image")
    ch = _COLOR_CHANNELS[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise MediaDecodeError(f"IDAT inflate failed: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise MediaDecodeError("decompressed size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos + 1
        ).astype(np.int32)
        pos += stride + 1
        if f == 0:  # None
            recon = line
        elif f == 2:  # Up
            recon = (line + prev) & 0xFF
        elif f == 1:  # Sub — sequential along x, vectorized over ch
            recon = line.copy()
            for x in range(ch, stride, ch):
                recon[x : x + ch] = (
                    recon[x : x + ch] + recon[x - ch : x]
                ) & 0xFF
        elif f == 3:  # Average
            recon = line.copy()
            recon[:ch] = (recon[:ch] + prev[:ch] // 2) & 0xFF
            for x in range(ch, stride, ch):
                recon[x : x + ch] = (
                    recon[x : x + ch]
                    + (recon[x - ch : x] + prev[x : x + ch]) // 2
                ) & 0xFF
        elif f == 4:  # Paeth
            recon = line.copy()
            recon[:ch] = (recon[:ch] + _paeth(0, prev[:ch], 0)) & 0xFF
            for x in range(ch, stride, ch):
                recon[x : x + ch] = (
                    recon[x : x + ch]
                    + _paeth(
                        recon[x - ch : x],
                        prev[x : x + ch],
                        prev[x - ch : x],
                    )
                ) & 0xFF
        else:
            raise MediaDecodeError(f"unknown filter type {f} at row {y}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    pixels = out.reshape(h, w, ch)
    if color == 3:  # palette → RGB
        if plte is None or len(plte) % 3:
            raise MediaDecodeError("palette image without valid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = pixels[:, :, 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise MediaDecodeError("palette index out of range")
        pixels = pal[idx]
    return pixels


def _paeth(a, b, c):
    """Paeth predictor, elementwise over channel vectors (spec
    §6.6)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    )


def png_encode(pixels: np.ndarray, level: int = 6) -> bytes:
    """Encode a uint8 (h, w) or (h, w, ch) array as an 8-bit PNG
    (filter None on every scanline)."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"cannot encode {ch}-channel image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(
        b"\x00" + arr[y].tobytes() for y in range(h)
    )
    idat = zlib.compress(raw, level)

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pure index
    arithmetic, the standard pixel-center mapping."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return pixels[ys][:, xs]


def wav_decode(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a PCM WAV → (sample_rate, n_channels, n_frames,
    samples[n_frames, n_channels] as int32). 8-bit unsigned is
    recentred to signed; 16/32-bit little-endian signed pass through."""
    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            rate = wf.getframerate()
            nch = wf.getnchannels()
            nframes = wf.getnframes()
            width = wf.getsampwidth()
            frames = wf.readframes(nframes)
    except (wave.Error, EOFError) as e:
        raise MediaDecodeError(f"not a decodable WAV: {e}") from e
    if width == 1:
        samples = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.int32) - 128
        )
    elif width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.int32)
    elif width == 4:
        samples = np.frombuffer(frames, dtype="<i4").astype(np.int32)
    else:
        raise MediaDecodeError(f"unsupported sample width {width}")
    nframes = len(samples) // nch if nch else 0
    return rate, nch, nframes, samples[: nframes * nch].reshape(
        nframes, nch
    )
