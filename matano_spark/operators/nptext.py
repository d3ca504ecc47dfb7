"""Arrow+NumPy batch kernels for the text-hash hot loops (guide §4.2).

The dedup fingerprint/signature stages fold poly_hash over every
character of every (distinct) token or shingle with Spark higher-order
functions — interpreted per element, and the dominant cost of
dedup_simhash / the minhash signature stage at any scale. These
kernels hand whole Arrow batches to NumPy and compute BIT-IDENTICAL
values with vectorized integer arithmetic:

- poly_hash(tok) = fold h*131+cp mod P  ==  Σ cp_i · 131^(L-1-i) mod P,
  evaluated as one products-vector + segmented sum per batch
  (np.add.reduceat). All terms bound by 127·P < 2^37 and segment
  length ≤ 512, so partial sums stay < 2^46 — exact in int64.
- shingle hashes compose from word hashes without touching bytes
  again: H(a||" "||b) = ((H(a)·131+32) mod P · 131^len(b) + H(b)) mod P
  (products < P² < 2^63 — exact in int64).
- per-row DISTINCT tokens/shingles are exact string-level dedupe:
  tokens padded into a fixed-width byte matrix (+ length column, so a
  NUL-padded token can't alias a shorter one) and np.unique'd with the
  row id; shingles dedupe by (row, word-id triple), which is bijective
  with the shingle string because words are space-free.
- majority counts / permutation minima are order-free integer
  reductions (np.add.reduceat / np.minimum.reduceat over row offsets).

The fast path requires pure-ASCII batch bytes (codepoint == byte) with
no nulls and tokens ≤ 512 chars; anything else routes the batch to a
per-row Python fold that replicates the JVM semantics exactly
(verified against Spark split/ascii on empty tokens, repeated spaces,
Latin-1, Greek and astral codepoints — Spark's split("") and ascii()
are codepoint-based, i.e. Python ord()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matano_spark.operators.hashing import MINHASH_A, MINHASH_B, P

_BASE = 131
_MAX_TOK = 512  # max token chars on the vectorized path (pow table size)
_MAX_PAD = 64  # max token width for the padded-dedupe matrix


def _pows():
    import numpy as np

    p = np.empty(_MAX_TOK + 1, dtype=np.int64)
    p[0] = 1
    for i in range(1, _MAX_TOK + 1):
        p[i] = p[i - 1] * _BASE % P
    return p


def _py_poly_hash(tok: str) -> int:
    h = 0
    for ch in tok:
        h = (h * _BASE + ord(ch)) % P
    return h


def _str_buffers(arr):
    """(data uint8 view, absolute int64 offsets) for a string /
    large_string Array, or None when the batch must take the exact
    per-row fallback (nulls, non-string)."""
    import numpy as np
    import pyarrow as pa

    if arr.null_count != 0:
        return None
    t = arr.type
    if pa.types.is_string(t):
        odt = np.int32
    elif pa.types.is_large_string(t):
        odt = np.int64
    else:
        return None
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], odt)[arr.offset : arr.offset + len(arr) + 1].astype(
        np.int64
    )
    data = (
        np.frombuffer(bufs[2], np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return data, off


def _segment_hashes(data, starts, ends, pows):
    """poly_hash per [start, end) byte segment (ASCII bytes ==
    codepoints). Exact: per-byte products cp·131^e < 2^37, summed per
    segment with reduceat (segments ≤ _MAX_TOK, partial sums < 2^46).
    Empty segments hash to 0. Returns None if any segment is too long
    for the pow table (caller falls back)."""
    import numpy as np

    lens = ends - starts
    if lens.size == 0:
        return np.empty(0, np.int64)
    if int(lens.max()) > _MAX_TOK:
        return None
    total = int(lens.sum())
    coff = np.concatenate([[0], np.cumsum(lens)])
    if total == 0:
        return np.zeros(lens.size, np.int64)
    # gather byte positions: concat of the ranges [start_i, end_i)
    idx = np.repeat(starts, lens) + (np.arange(total) - np.repeat(coff[:-1], lens))
    vals = data[idx].astype(np.int64)
    exps = np.repeat(ends - 1, lens) - idx
    prod = vals * pows[exps]
    h = np.zeros(lens.size, np.int64)
    nz = lens > 0
    bnd = coff[:-1][nz]
    h[nz] = np.add.reduceat(prod, bnd) % P
    return h


def _tokenize_rows(data, off):
    """Split each row's [off[r], off[r+1]) byte span on 0x20, exactly
    like split(text, " ") (keeps empty tokens, one token minimum).
    Returns (tok_row, tok_start, tok_end) in (row, position) order."""
    import numpy as np

    n = off.size - 1
    s0, s1 = off[0], off[-1]
    sp = np.nonzero(data[s0:s1] == 32)[0] + s0
    sp_row = np.searchsorted(off, sp, side="right") - 1
    starts_all = np.concatenate([off[:-1], sp + 1])
    rows_all = np.concatenate([np.arange(n), sp_row])
    order = np.lexsort((starts_all, rows_all))
    tok_start = starts_all[order]
    tok_row = rows_all[order]
    ends_all = np.concatenate([sp, off[1:]])
    erows_all = np.concatenate([sp_row, np.arange(n)])
    eorder = np.lexsort((ends_all, erows_all))
    tok_end = ends_all[eorder]
    return tok_row, tok_start, tok_end


def _distinct_mask(data, tok_row, tok_start, tok_end):
    """Boolean keep-mask implementing per-row array_distinct by STRING
    value: (row, length, padded bytes) keys np.unique'd, first
    occurrence kept. Returns None when a token exceeds the pad width
    (caller falls back)."""
    import numpy as np

    lens = tok_end - tok_start
    nt = lens.size
    if nt == 0:
        return np.zeros(0, bool)
    wmax = int(lens.max())
    if wmax > _MAX_PAD:
        return None
    w = max(wmax, 1)
    key = np.zeros((nt, 16 + w), np.uint8)
    key[:, :8] = tok_row.astype(">i8").view(np.uint8).reshape(nt, 8)
    key[:, 8:16] = lens.astype(">i8").view(np.uint8).reshape(nt, 8)
    total = int(lens.sum())
    if total:
        coff = np.concatenate([[0], np.cumsum(lens)])
        idx = np.repeat(tok_start, lens) + (
            np.arange(total) - np.repeat(coff[:-1], lens)
        )
        key[np.repeat(np.arange(nt), lens), 16 + np.arange(total) - np.repeat(coff[:-1], lens)] = data[idx]
    flat = np.ascontiguousarray(key).view(np.dtype((np.void, key.shape[1]))).ravel()
    _, first = np.unique(flat, return_index=True)
    keep = np.zeros(nt, bool)
    keep[first] = True
    return keep


def _py_simhash_row(text, chunk_as, chunk_bs, chunk_bits):
    """Exact per-row fallback replicating the JVM expression chain:
    array_distinct(split(text," ")), per-token poly_hash, per-chunk
    affine, bit-majority (strictly-more-set wins the bit)."""
    if text is None:
        return (None,) * len(chunk_as)
    hs = [_py_poly_hash(t) for t in dict.fromkeys(text.split(" "))]
    out = []
    for a, b in zip(chunk_as, chunk_bs):
        chunk = 0
        for bit in range(chunk_bits):
            m = 1 << bit
            c = 0
            for h in hs:
                c += 1 if ((a * h + b) % P) & m else -1
            if c > 0:
                chunk |= m
        out.append(chunk)
    return tuple(out)


def np_simhash_fingerprint(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_as: list[int],
    chunk_bs: list[int],
    chunk_bits: int = 16,
) -> DataFrame:
    """(id, text) → (id, c0..cK) SimHash chunks via Arrow+NumPy,
    bit-identical to operators.dedup.simhash_fingerprint (same tokens,
    same poly/affine arithmetic, same strict bit-majority). Non-ASCII
    / null / oversized-token batches take the exact per-row fallback."""
    import pyarrow as pa

    from pyspark.sql import types as T

    k = len(chunk_as)
    schema = T.StructType(
        [df.schema[id_col]]
        + [T.StructField(f"c{i}", T.LongType()) for i in range(k)]
    )
    names = [id_col] + [f"c{i}" for i in range(k)]

    def fn(it):
        import numpy as np

        pows = _pows()
        bit_idx = np.arange(chunk_bits)
        for batch in it:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(id_col)
            texts = batch.column(text_col)
            cols = None
            sb = _str_buffers(texts)
            if sb is not None:
                data, off = sb
                span = data[off[0] : off[-1]]
                if span.size == 0 or int(span.max()) < 128:
                    tok_row, ts, te = _tokenize_rows(data, off)
                    keep = _distinct_mask(data, tok_row, ts, te)
                    if keep is not None:
                        h = _segment_hashes(data, ts[keep], te[keep], pows)
                        if h is not None:
                            rows = tok_row[keep]  # nondecreasing
                            rcnt = np.bincount(rows, minlength=n)
                            rowoff = np.concatenate(
                                [[0], np.cumsum(rcnt)[:-1]]
                            ).astype(np.int64)
                            cols = []
                            for a, b in zip(chunk_as, chunk_bs):
                                g = (a * h + b) % P
                                bits = ((g[:, None] >> bit_idx) & 1).astype(np.int64)
                                cnt = np.add.reduceat(bits, rowoff, axis=0)
                                acc = 2 * cnt - rcnt[:, None]
                                chunk = (
                                    (acc > 0).astype(np.int64) << bit_idx
                                ).sum(axis=1)
                                cols.append(pa.array(chunk))
            if cols is None:
                outs = [
                    _py_simhash_row(t, chunk_as, chunk_bs, chunk_bits)
                    for t in texts.to_pylist()
                ]
                cols = [
                    pa.array([o[i] for o in outs], pa.int64()) for i in range(k)
                ]
            yield pa.RecordBatch.from_arrays([ids] + cols, names=names)

    return df.select(id_col, text_col).mapInArrow(fn, schema)


def _py_minhash_row(words, n, num_hashes):
    """Exact per-row fallback replicating shingle_array ∘ poly_hash ∘
    affine minima (concat_ws skips null words, matching the JVM)."""
    if words is None or len(words) < n:
        return None
    sh = dict.fromkeys(
        " ".join(w for w in words[i : i + n] if w is not None)
        for i in range(len(words) - n + 1)
    )
    hs = [_py_poly_hash(s) for s in sh]
    return tuple(
        min((MINHASH_A[i] * h + MINHASH_B[i]) % P for h in hs)
        for i in range(num_hashes)
    )


def np_minhash_signatures_from_words(
    words_df: DataFrame,
    id_col: str,
    n: int = 3,
    num_hashes: int = 8,
    words_col: str = "__ws",
) -> DataFrame:
    """(id, words[]) → (id, m1..mk) MinHash signatures via Arrow+NumPy,
    bit-identical to operators.dedup.minhash_signatures_from_words:
    per-row distinct n-word shingles (dedupe by word-id tuple — the
    shingle string determines the word tuple because words are
    space-free), shingle hashes composed from per-word poly hashes
    (H(a||" "||b) identity, exact in int64), k affine minima. Rows
    with fewer than n words are dropped, matching the JVM filter."""
    import pyarrow as pa

    from pyspark.sql import types as T

    schema = T.StructType(
        [words_df.schema[id_col]]
        + [T.StructField(f"m{i + 1}", T.LongType()) for i in range(num_hashes)]
    )
    names = [id_col] + [f"m{i + 1}" for i in range(num_hashes)]

    def fn(it):
        import numpy as np

        pows = _pows()
        for batch in it:
            nrow = batch.num_rows
            if nrow == 0:
                continue
            ids = batch.column(id_col)
            words = batch.column(words_col)
            res = _np_minhash_batch(np, pa, words, n, num_hashes, pows)
            if res is None:
                sigs, kept_rows = [], []
                for r, ws in enumerate(words.to_pylist()):
                    sig = _py_minhash_row(ws, n, num_hashes)
                    if sig is not None:
                        sigs.append(sig)
                        kept_rows.append(r)
                cols = [
                    pa.array([s[i] for s in sigs], pa.int64())
                    for i in range(num_hashes)
                ]
                kept = np.asarray(kept_rows, np.int64)
            else:
                cols, kept = res
            yield pa.RecordBatch.from_arrays(
                [ids.take(pa.array(kept))] + cols, names=names
            )

    return words_df.select(id_col, words_col).mapInArrow(fn, schema)


def _np_minhash_batch(np, pa, words, n, num_hashes, pows):
    """Vectorized minhash for one list<string> batch, or None for the
    exact fallback (nulls, non-ASCII, oversized words)."""
    if words.null_count != 0:
        return None
    t = words.type
    if pa.types.is_list(t):
        odt = np.int32
    elif pa.types.is_large_list(t):
        odt = np.int64
    else:
        return None
    loff = np.frombuffer(words.buffers()[1], odt)[
        words.offset : words.offset + len(words) + 1
    ].astype(np.int64)
    child = words.values
    sb = _str_buffers(child)
    if sb is None:
        return None
    data, woff = sb
    lo0, lo1 = loff[0], loff[-1]
    span = data[woff[lo0] : woff[lo1]]
    if span.size and int(span.max()) >= 128:
        return None
    # per-word hashes + lengths over the touched child slice
    ws = woff[lo0:lo1]
    we = woff[lo0 + 1 : lo1 + 1]
    lw = we - ws
    if lw.size and int(lw.max()) > min(_MAX_TOK, _MAX_PAD):
        return None
    hw = _segment_hashes(data, ws, we, pows)
    # global word ids (equal strings share an id) for triple dedupe
    nw = lw.size
    wmax = int(lw.max()) if nw else 0
    w = max(wmax, 1)
    key = np.zeros((nw, 8 + w), np.uint8)
    key[:, :8] = lw.astype(">i8").view(np.uint8).reshape(nw, 8)
    total = int(lw.sum())
    if total:
        coff = np.concatenate([[0], np.cumsum(lw)])
        pos = np.arange(total) - np.repeat(coff[:-1], lw)
        key[np.repeat(np.arange(nw), lw), 8 + pos] = data[
            np.repeat(ws, lw) + pos
        ]
    flat = np.ascontiguousarray(key).view(np.dtype((np.void, key.shape[1]))).ravel()
    _, wid = np.unique(flat, return_inverse=True)
    # kept rows and their shingle index arrays (local word positions)
    wc = np.diff(loff)
    rk = wc >= n
    kept = np.nonzero(rk)[0].astype(np.int64)
    k = kept.size
    if k == 0:
        return [pa.array([], pa.int64()) for _ in range(num_hashes)], kept
    shn = (wc[rk] - n + 1).astype(np.int64)
    tot_sh = int(shn.sum())
    soff = np.concatenate([[0], np.cumsum(shn)])
    lo = loff - lo0
    base = np.repeat(lo[:-1][rk], shn) + (
        np.arange(tot_sh) - np.repeat(soff[:-1], shn)
    )
    sh_rowk = np.repeat(np.arange(k), shn)
    # composed shingle hash: fold words with the " " separator identity
    h = hw[base]
    for j in range(1, n):
        h = ((h * _BASE + 32) % P * pows[lw[base + j]] + hw[base + j]) % P
    # distinct (row, word-id tuple) — first occurrence kept (order-free min)
    trip = np.empty((tot_sh, n + 1), np.int64)
    trip[:, 0] = sh_rowk
    for j in range(n):
        trip[:, j + 1] = wid[base + j]
    tflat = np.ascontiguousarray(trip).view(
        np.dtype((np.void, trip.shape[1] * 8))
    ).ravel()
    _, first = np.unique(tflat, return_index=True)
    keep = np.zeros(tot_sh, bool)
    keep[first] = True
    hk = h[keep]
    cnt = np.bincount(sh_rowk[keep], minlength=k)
    rowoff = np.concatenate([[0], np.cumsum(cnt)[:-1]]).astype(np.int64)
    cols = []
    for i in range(num_hashes):
        g = (MINHASH_A[i] * hk + MINHASH_B[i]) % P
        cols.append(pa.array(np.minimum.reduceat(g, rowoff)))
    return cols, kept
