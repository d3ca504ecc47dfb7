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
    if data[:6] in GIF_SIGS:
        return "image/gif"
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


# -- GIF (GIF87a/GIF89a, pure stdlib) ---------------------------------
#
# Backs the real (fake=False) video-frame path of
# operators/multimodal.decode_frames: an animated GIF is the one
# multi-frame container decodable from the published spec with zero
# third-party code. LZW decode is the classic table-rebuild algorithm
# from the GIF89a specification, appendix F.

GIF_SIGS = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(min_code_size: int, data: bytes, npixels: int) -> bytearray:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # table maps code -> byte sequence; rebuilt on CLEAR
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    bitbuf = bitlen = 0
    prev: bytes | None = None
    for byte in data:
        bitbuf |= byte << bitlen
        bitlen += 8
        while bitlen >= code_size:
            code = bitbuf & ((1 << code_size) - 1)
            bitbuf >>= code_size
            bitlen -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                if code >= len(table):
                    raise MediaDecodeError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise MediaDecodeError("LZW code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
            if len(out) >= npixels:
                return out
    return out


def _gif_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise MediaDecodeError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + n])
        pos += n


_GIF_DEINTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode_frames(data: bytes):
    """Yield (index, delay_ms, HxWx3 uint8 RGB canvas) per frame,
    composited per the GIF89a disposal model (sub-rectangle frames,
    transparency, restore-to-background)."""
    if data[:6] not in GIF_SIGS:
        raise MediaDecodeError("not a GIF (bad signature)")
    if len(data) < 13:
        raise MediaDecodeError("truncated GIF header")
    width, height, flags, bg_idx, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        if gct.shape[0] != n:
            raise MediaDecodeError("truncated global color table")
        pos += 3 * n
    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    bg = canvas.copy()
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    idx = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            block, npos = _gif_subblocks(data, pos)
            pos = npos
            if label == 0xF9 and len(block) >= 4:  # graphic control
                gflags, delay_cs, tidx = struct.unpack_from("<BHB", block, 0)
                delay_ms = delay_cs * 10
                disposal = (gflags >> 2) & 0x07
                transparent = tidx if gflags & 0x01 else None
            continue
        if b != 0x2C:
            raise MediaDecodeError(f"unknown GIF block 0x{b:02x}")
        # image descriptor
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if left + w > width or top + h > height:
            raise MediaDecodeError("GIF frame exceeds logical screen")
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise MediaDecodeError("GIF frame without a color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _gif_subblocks(data, pos)
        indices = _gif_lzw_decode(min_code, lzw, w * h)
        if len(indices) < w * h:
            raise MediaDecodeError("GIF frame pixel data truncated")
        grid = np.frombuffer(bytes(indices[: w * h]), dtype=np.uint8).reshape(
            h, w
        )
        if iflags & 0x40:  # interlaced: reorder rows per spec passes
            de = np.empty_like(grid)
            src = 0
            for start, step in _GIF_DEINTERLACE:
                rows = range(start, h, step)
                for r in rows:
                    de[r] = grid[src]
                    src += 1
            grid = de
        if grid.max() >= len(ct):
            raise MediaDecodeError("GIF pixel index outside color table")
        prev_region = canvas[top : top + h, left : left + w].copy()
        rgb = ct[grid]
        region = canvas[top : top + h, left : left + w]
        if transparent is not None:
            mask = grid != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        yield idx, delay_ms, canvas.copy()
        idx += 1
        if disposal == 2:  # restore to background
            canvas[top : top + h, left : left + w] = bg[
                top : top + h, left : left + w
            ]
        elif disposal == 3:  # restore to previous
            canvas[top : top + h, left : left + w] = prev_region
    raise MediaDecodeError("GIF missing trailer")


def _gif_lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Minimal spec-correct LZW: emit CLEAR, then literal codes,
    re-CLEARing before the code width would grow past the literal
    range — O(n), no string table, decodes on any conformant reader."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    out = bytearray()
    bitbuf = bitlen = 0

    def emit(code: int):
        nonlocal bitbuf, bitlen
        bitbuf |= code << bitlen
        bitlen += code_size
        while bitlen >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitlen -= 8

    emit(clear)
    # after CLEAR the table holds `end + 1` codes; each literal we emit
    # conceptually adds one (decoder-side), so re-CLEAR before the
    # decoder's table reaches 1 << code_size
    budget = (1 << code_size) - end - 2
    for i in indices:
        emit(i)
        budget -= 1
        if budget <= 0:
            emit(clear)
            budget = (1 << code_size) - end - 2
    emit(end)
    if bitlen:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def gif_encode(frames, palette, delays_ms=None, transparent=None) -> bytes:
    """Encode HxW uint8 index grids into an animated GIF89a (test
    fixture + snapshot-export path; palette is Nx3 uint8, N a power of
    two >= 2)."""
    palette = np.asarray(palette, dtype=np.uint8)
    n = palette.shape[0]
    if n & (n - 1) or n < 2:
        raise ValueError("palette size must be a power of two >= 2")
    depth = max(1, n.bit_length() - 1)
    h, w = np.asarray(frames[0]).shape
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    if len(frames) > 1:  # Netscape loop extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for i, frame in enumerate(frames):
        grid = np.asarray(frame, dtype=np.uint8)
        delay_cs = (delays_ms[i] if delays_ms else 100) // 10
        gflags = (1 << 2) | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", gflags, delay_cs, transparent or 0
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        min_code = max(2, depth)
        out += bytes([min_code])
        lzw = _gif_lzw_encode(min_code, grid.tobytes())
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
