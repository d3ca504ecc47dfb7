"""Similarity search over embedding columns (array<float>).

Two paths:
  brute-force cosine top-k — the exact baseline; cost |Q| x |N| folds,
    distributed by partitioning the corpus side, queries broadcast.
  LSH (sign-random-projection) — the scale path: deterministic +-1
    hyperplanes bucket vectors by an 8-bit signature; search probes
    only the query's bucket (recall traded for a ~2^bits fan-in cut).

Dot products are sequential left-folds over the array (F.aggregate) in
double precision — deterministic and bit-identical to the DuckDB
oracle's list_reduce. No UDFs, no Python in the hot path; at cluster
scale the corpus side partitions freely and the query side broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from matano_spark.operators.dedup import drop_hot_keys
from matano_spark.operators.hashing import P

LSH_PLANES = 8
# Degenerate-bucket guard for the LSH equi-joins: a broken encoder
# emitting constant (e.g. all-zero) vectors collapses the corpus into
# one bucket and the join cost becomes bucket_size². Buckets above the
# cap are dropped from the join (broadcast anti-join — the corpus never
# reshuffles); near-dup/ANN signal in a bucket that large is ~zero.
BUCKET_CAP = 1000
_MIX_J = 1_315_423_911
_MIX_D = 2_654_435_761


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double (deterministic)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_with_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """cosine() with the per-row norms hoisted OUT of the pair join —
    O(n) norm folds instead of O(pairs); bit-identical result (same
    ops in the same order, just evaluated once per row)."""
    return dot(a, b) / (norm_a * norm_b)


def plane_sign(j: int, d_col: Column) -> Column:
    """Deterministic +-1 weight of hyperplane j at dimension d."""
    mix = (F.lit(j * _MIX_J) + d_col * _MIX_D) % P
    return F.when(mix % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket(arr: Column, n_planes: int = LSH_PLANES) -> Column:
    """Sign-random-projection bucket id in [0, 2^n_planes).

    Bit j = 1 iff sum_d sign(j,d) * x[d] >= 0, with the +-1 weight
    computed from (j, d) by integer mixing — reproducible in any
    engine. All n_planes projections accumulate in ONE fold over the
    vector (an n_planes-wide running-sum array updated per element)
    instead of one fold per plane — per-plane addition order is
    unchanged, so bucket ids are bit-identical to the per-plane
    formulation while traversing the array once.
    """
    pairs = F.zip_with(
        as_double(arr),
        F.sequence(F.lit(1), F.size(arr)),
        lambda x, d: F.struct(x.alias("x"), d.cast("bigint").alias("d")),
    )
    plane_ids = F.array(
        *[F.lit(j).cast("bigint") for j in range(n_planes)]
    )
    projs = F.aggregate(
        pairs,
        F.array_repeat(F.lit(0.0), n_planes),
        lambda acc, p: F.zip_with(
            acc,
            plane_ids,
            lambda a, j: a
            + p.x
            * F.when(
                ((j * _MIX_J + p.d * _MIX_D) % P) % 2 == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0)),
        ),
    )
    masks = F.array(*[F.lit(1 << j).cast("bigint") for j in range(n_planes)])
    return F.aggregate(
        F.zip_with(
            projs,
            masks,
            lambda pj, m: F.when(pj >= 0, m).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def _np_seq_dot(va, vb):
    """Row-wise dot products with EXACTLY the fold's arithmetic:
    float→double casts per element, then a strictly sequential
    left-to-right accumulation seeded with 0.0 (np.add.accumulate is a
    sequential scan — no pairwise/blocked summation — and the leading
    zero column reproduces the fold's `0.0 + x1` first step, including
    its -0.0 → +0.0 normalization). Bit-identical to dot()."""
    import numpy as np

    n = va.shape[0]
    z = np.concatenate([np.zeros((n, 1)), va * vb], axis=1)
    return np.add.accumulate(z, axis=1)[:, -1]


def _np_matrix(col):
    """list<float|double> Arrow column → (n, d) float64 matrix, or None
    when the batch is not the uniform-length null-free fast-path shape
    (callers then fall back to the per-row JVM-exact Python fold)."""
    import numpy as np

    if col.null_count != 0:
        return None
    vals = col.flatten()
    if vals.null_count != 0:
        return None
    x = np.asarray(vals, dtype=np.float64)
    n = len(col)
    if n == 0 or x.size % n != 0:
        return None
    d = x.size // n
    # uniform length check: offsets diff constant
    offs = np.asarray(col.offsets, dtype=np.int64)
    if not (np.diff(offs) == d).all():
        return None
    return x.reshape(n, d)


def _py_seq_dot(a, b):
    """Per-row exact fallback: same fold, interpreted."""
    acc = 0.0
    for x, y in zip(a, b):
        if x is None or y is None:
            return None
        acc = acc + float(x) * float(y)
    return acc


def _sign_matrix(n_planes: int, d: int):
    """The deterministic ±1 hyperplane weights as an (n_planes, d)
    array — plane_sign(j, dim) materialized once per task."""
    import numpy as np

    return np.array(
        [
            [
                1.0 if ((j * _MIX_J + (dd + 1) * _MIX_D) % P) % 2 == 0 else -1.0
                for dd in range(d)
            ]
            for j in range(n_planes)
        ]
    )


def np_vec_profile(df: DataFrame, id_col: str, vec_col: str, n_planes: int = LSH_PLANES) -> DataFrame:
    """(id, vec) → (id, vec, vnorm, bucket) via Arrow batches + NumPy
    (guide §4.2: hand whole batches to vectorized native code). The
    norm and every plane projection use the sequential-scan dot above,
    so vnorm/bucket are BIT-IDENTICAL to norm()/lsh_bucket() — measured
    2.5× faster than the interpreted 8-plane fold at sf0.1 (0.52 →
    0.21 s over the embeddings corpus) and the win grows with row
    count. Rows with null/ragged vectors take a per-row exact fallback
    (same fold, interpreted) to match the JVM null semantics."""
    import pyarrow as pa

    from pyspark.sql import types as T

    schema = T.StructType(
        [df.schema[id_col], df.schema[vec_col]]
        + [T.StructField("vnorm", T.DoubleType()), T.StructField("bucket", T.LongType())]
    )

    def fn(it):
        import numpy as np

        signs = None
        for batch in it:
            n = batch.num_rows
            if n == 0:
                continue
            col = batch.column(vec_col)
            x = _np_matrix(col)
            if x is not None:
                d = x.shape[1]
                if signs is None or signs.shape[1] != d:
                    signs = _sign_matrix(n_planes, d)
                vnorm = np.sqrt(_np_seq_dot(x, x))
                bucket = np.zeros(n, dtype=np.int64)
                for j in range(n_planes):
                    pj = _np_seq_dot(x, signs[j][None, :])
                    bucket += np.where(pj >= 0, np.int64(1) << j, 0)
                va, ba = pa.array(vnorm), pa.array(bucket)
            else:
                rows = col.to_pylist()
                vn, bk = [], []
                for a in rows:
                    if a is None or any(v is None for v in a):
                        vn.append(None)
                        bk.append(None)
                        continue
                    import math

                    vn.append(math.sqrt(_py_seq_dot(a, a)))
                    b = 0
                    for j in range(n_planes):
                        acc = 0.0
                        for dd, v in enumerate(a):
                            s = 1.0 if ((j * _MIX_J + (dd + 1) * _MIX_D) % P) % 2 == 0 else -1.0
                            acc = acc + float(v) * s
                        if acc >= 0:
                            b += 1 << j
                    bk.append(b)
                va, ba = pa.array(vn, pa.float64()), pa.array(bk, pa.int64())
            yield pa.RecordBatch.from_arrays(
                [batch.column(id_col), col, va, ba],
                names=[id_col, vec_col, "vnorm", "bucket"],
            )

    return df.select(id_col, vec_col).mapInArrow(fn, schema)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact brute-force top-k: (query_id, neighbor_id, rank, cosine).

    The query side is broadcast (it is small by construction); the
    corpus streams through in place — no shuffle of the corpus until
    the final per-query top-k, which is a partial top-k under AQE.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cnorm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            cosine_with_norms(
                F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = LSH_PLANES,
    bucket_cap: int | None = BUCKET_CAP,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine rank within candidates.

    At 100 TB the bucket column is precomputed/persisted with the
    table (partition or Z-order key) so a probe touches ~1/2^n_planes
    of the corpus. Corpus buckets larger than `bucket_cap` are dropped
    before the probe join, bounding per-query candidate fan-in even
    under a degenerate encoder.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnorm"),
        lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    # Corpus-side bucket/norm via the NumPy batch kernel (bit-identical
    # values, see np_vec_profile — the n_planes×d fold is the dominant
    # per-row cost); the query side is tiny by construction, so the
    # JVM fold there avoids an extra Python roundtrip.
    c = np_vec_profile(corpus, id_col, vec_col, n_planes).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.col("vnorm").alias("cnorm"),
        "bucket",
    )
    # Materialize the bucket/norm projection once: it feeds both the
    # hot-key scan and the probe join. At 100 TB this is the persisted
    # bucket column the docstring describes. LAZY: the hot-key
    # broadcast build inside the final action materializes it — eager
    # paid a dedicated kernel job first.
    c = c.localCheckpoint(eager=False)
    if bucket_cap is not None:
        c = drop_hot_keys(c, ["bucket"], bucket_cap)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            cosine_with_norms(
                F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


N_CENTROIDS = 16
N_PROBE = 4


def _codebook(corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int) -> DataFrame:
    """One-row DataFrame holding the IVF coarse codebook as a sorted
    array<struct<cid,cvec,cnorm>> — broadcast to every task.

    Centroid selection is DETERMINISTIC (the n_centroids lowest-id
    vectors) so the DuckDB oracle can restate the exact same codebook;
    a production build would run a few Lloyd iterations over a sample
    to place the centroids, which changes the codebook content but not
    one line of the query plan below.
    """
    cents = (
        corpus.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cvec"),
            norm(F.col(vec_col)).alias("cnorm"),
        )
    )
    return cents.agg(
        F.sort_array(F.array_agg(F.struct("cid", "cvec", "cnorm"))).alias("cents")
    )


def _cells_by_affinity(vec: Column, vnorm: Column) -> Column:
    """Centroid cells sorted by cosine affinity to `vec` (desc, ties by
    cid asc): array<struct<ncos,cid>> — element 1 is the home cell."""
    return F.sort_array(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                (-(dot(vec, c["cvec"]) / (vnorm * c["cnorm"]))).alias("ncos"),
                c["cid"].alias("cid"),
            ),
        )
    )


def _np_sortable(x):
    """IEEE-754 total order as ascending uint64 (Java Double.compare
    semantics: -0.0 < 0.0, NaN greatest): negative floats flip all
    bits, non-negative set the sign bit; compare unsigned."""
    import numpy as np

    u = np.ascontiguousarray(x).view(np.uint64)
    neg = (u >> np.uint64(63)) == 1
    return np.where(neg, ~u, u | np.uint64(0x8000000000000000))


def _ivf_assign(corpus: DataFrame, id_col: str, vec_col: str, crow) -> DataFrame | None:
    """NumPy corpus→cell assignment over a collected clean codebook.
    Returns None when any centroid is null/ragged (caller keeps the
    JVM fold, whose null ordering is the reference semantics).
    Affinity doubles and the (−cos, cid) argmin are bit-identical to
    _cells_by_affinity: sequential-scan dots, first-index tie-break
    over cid-ascending centroids."""
    import pyarrow as pa

    from pyspark.sql import types as T

    # int64 ids only — the kernel materializes cells as int64 arrows
    if not isinstance(corpus.schema[id_col].dataType, T.LongType):
        return None
    if not crow or any(
        r["cvec"] is None or any(v is None for v in r["cvec"]) for r in crow
    ):
        return None
    dims = {len(r["cvec"]) for r in crow}
    if len(dims) != 1:
        return None

    cids = [r["cid"] for r in crow]
    cvec_list = [[float(v) for v in r["cvec"]] for r in crow]
    cnorm_list = [float(r["cnorm"]) for r in crow]
    schema = T.StructType(
        [
            T.StructField("neighbor_id", corpus.schema[id_col].dataType),
            T.StructField("cvec", corpus.schema[vec_col].dataType),
            T.StructField("cnorm", T.DoubleType()),
            T.StructField("cell", corpus.schema[id_col].dataType),
        ]
    )

    def fn(it):
        import numpy as np

        np_cids = np.array(cids, dtype=np.int64)
        np_cvecs = np.array(cvec_list, dtype=np.float64)
        np_cnorms = np.array(cnorm_list, dtype=np.float64)
        for batch in it:
            n = batch.num_rows
            if n == 0:
                continue
            col = batch.column(vec_col)
            x = _np_matrix(col)
            if x is not None and x.shape[1] == np_cvecs.shape[1]:
                vnorm = np.sqrt(_np_seq_dot(x, x))
                ncos = np.empty((n, len(cids)))
                for j in range(len(cids)):
                    dj = _np_seq_dot(x, np_cvecs[j][None, :])
                    ncos[:, j] = -(dj / (vnorm * np_cnorms[j]))
                cell = np_cids[np.argmin(_np_sortable(ncos), axis=1)]
                na, ca = pa.array(vnorm), pa.array(cell)
            else:
                import math

                vn, cl = [], []
                for a in col.to_pylist():
                    d = None if a is None else _py_seq_dot(a, a)
                    if d is None:
                        vn.append(None)
                        # all affinities null → null-first struct order
                        # picks the lowest cid (cid-ascending codebook)
                        cl.append(cids[0])
                        continue
                    nr = math.sqrt(d)
                    vn.append(nr)
                    best_key, best_cid = None, None
                    for j, cid in enumerate(cids):
                        dj = _py_seq_dot(a, cvec_list[j])
                        key = None if dj is None else -(dj / (nr * cnorm_list[j]))
                        # Spark struct order: null ncos first, then
                        # value asc (NaN greatest), then cid asc
                        if key is not None and key != key:
                            key = float("inf")
                        rank = (0 if key is None else 1, key or 0.0, cid)
                        if best_key is None or rank < best_key:
                            best_key, best_cid = rank, cid
                    cl.append(best_cid)
                na = pa.array(vn, pa.float64())
                ca = pa.array(cl, pa.int64())
            yield pa.RecordBatch.from_arrays(
                [batch.column(id_col), col, na, ca],
                names=["neighbor_id", "cvec", "cnorm", "cell"],
            )

    return corpus.select(id_col, vec_col).mapInArrow(fn, schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer:
    every corpus vector is assigned to its nearest centroid cell, a
    query probes only its `nprobe` closest cells, exact cosine ranks
    the candidates.

    The scale path alongside lsh_topk: probe cost is
    ~nprobe/n_centroids of the corpus and the cell column is a plain
    equi-join key (precompute/persist it with the table at 100 TB, one
    narrow int per row — same pattern as the LSH bucket). Assignment is
    a per-row fold over the broadcast codebook — no shuffle, no row
    blowup; n_centroids grows ~sqrt(N) so the fold stays cheap.
    """
    # Pin the one-row codebook: its plan (TakeOrdered over the corpus +
    # aggregation) is referenced by BOTH the corpus-assignment and the
    # query-probe branches, and appeared 4x in the physical plan — four
    # corpus passes at scale. One checkpoint = one pass, and the
    # per-branch broadcasts then ship a cached single row. LAZY: the
    # codebook collect just below is the first action, so
    # materialization and the control-plane read fuse into one job.
    cents = _codebook(corpus, id_col, vec_col, n_centroids).localCheckpoint(
        eager=False
    )
    # Corpus-side assignment: the n_centroids×d affinity fold per row
    # was the dominant interpreted-HOF cost (guide §4.2) — when the
    # codebook is clean it runs as a NumPy batch kernel with
    # bit-identical doubles and Java-total-order argmin (measured
    # 1.18 → 0.82 s min at sf0.1, assignment parity exact). A dirty
    # codebook (null cells/elements) keeps the JVM fold, whose
    # null-first struct ordering is the reference semantics.
    crow = cents.collect()[0]["cents"]
    c = _ivf_assign(corpus, id_col, vec_col, crow)
    if c is None:
        c = (
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cvec"),
                norm(F.col(vec_col)).alias("cnorm"),
            )
            .crossJoin(F.broadcast(cents))
            .withColumn(
                "cell",
                F.element_at(
                    _cells_by_affinity(F.col("cvec"), F.col("cnorm")), 1
                )["cid"],
            )
            .drop("cents")
        )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            norm(F.col(vec_col)).alias("qnorm"),
        )
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "cell",
            F.explode(
                F.transform(
                    F.slice(_cells_by_affinity(F.col("qvec"), F.col("qnorm")), 1, nprobe),
                    lambda s: s["cid"],
                )
            ),
        )
        .drop("cents")
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            cosine_with_norms(
                F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def np_pair_cosine(
    pairs: DataFrame,
    a_vec: str,
    b_vec: str,
    a_norm: str,
    b_norm: str,
    keep: list[str],
    threshold: float | None = None,
) -> DataFrame:
    """cosine per candidate pair via Arrow batches + NumPy, keeping
    `keep` passthrough columns + a `cosine` column; rows below
    `threshold` are dropped inside the batch (fewer rows cross back).
    Values are BIT-IDENTICAL to cosine_with_norms (sequential-scan dot,
    see _np_seq_dot) — measured 1.87 → 1.18 s on the 87k-pair
    embedding near-dup verify at sf0.1. Used where the pair volume is
    large; tiny pair sets (e.g. 10-query topk probes, measured SLOWER
    through Arrow) keep the JVM fold."""
    import pyarrow as pa

    from pyspark.sql import types as T

    schema = T.StructType(
        [pairs.schema[c] for c in keep]
        + [T.StructField("cosine", T.DoubleType())]
    )

    def fn(it):
        import numpy as np

        for batch in it:
            n = batch.num_rows
            if n == 0:
                continue
            va = _np_matrix(batch.column(a_vec))
            vb = _np_matrix(batch.column(b_vec))
            if va is not None and vb is not None and va.shape == vb.shape:
                dot = _np_seq_dot(va, vb)
            else:
                ra = batch.column(a_vec).to_pylist()
                rb = batch.column(b_vec).to_pylist()
                vals = []
                for a, b in zip(ra, rb):
                    v = None if a is None or b is None else _py_seq_dot(a, b)
                    vals.append(np.nan if v is None else v)
                dot = np.array(vals, dtype=np.float64)
            na = np.asarray(batch.column(a_norm), dtype=np.float64)
            nb = np.asarray(batch.column(b_norm), dtype=np.float64)
            cos = dot / (na * nb)
            if threshold is not None:
                sel = cos >= threshold  # NaN/null compares false, like the JVM filter
                out = batch.filter(pa.array(sel))
                cos = cos[sel]
            else:
                out = batch
            yield pa.RecordBatch.from_arrays(
                [out.column(c) for c in keep] + [pa.array(cos)],
                names=keep + ["cosine"],
            )

    cols = list(dict.fromkeys(keep + [a_vec, b_vec, a_norm, b_norm]))
    return pairs.select(*cols).mapInArrow(fn, schema)


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = LSH_PLANES,
    bucket_cap: int | None = BUCKET_CAP,
) -> DataFrame:
    """Near-duplicate vectors: same LSH bucket AND cosine >= threshold.

    The bucket equi-join bounds the pair count to sum(bucket_size^2);
    high-threshold duplicates nearly always share all plane signs, so
    recall stays high while the join stays linear-ish. Buckets above
    `bucket_cap` are dropped before the self-join (see BUCKET_CAP),
    bounding the worst bucket at cap² pairs.

    Both vector kernels run through Arrow+NumPy with bit-identical
    fold arithmetic (np_vec_profile / np_pair_cosine): the per-row
    8-plane bucket fold and the per-pair cosine were the two dominant
    interpreted-HOF costs (guide §4.2; measured 2.42 → ~1.2 s at
    sf0.1 combined).
    """
    # One materialization feeds BOTH sides of the self-join — without
    # it the bucket/norm batch kernel is recomputed per branch. The
    # 100 TB analog is a persisted bucket column on the embedding table.
    # LAZY: both join sides read the cap window's reused exchange, so
    # the final action is the first (and only) materialization.
    b = np_vec_profile(df, id_col, vec_col, n_planes).localCheckpoint(eager=False)
    if bucket_cap is not None:
        # Degenerate-bucket cap as a window count over the bucket
        # (same move as simhash/minhash): the window's exchange IS the
        # partitioning the bucket self-join needs, so the stream
        # crosses the network once — drop_hot_keys' count-groupBy +
        # broadcast anti-join cost two extra jobs for the same filter.
        wb = W.partitionBy("bucket")
        b = (
            b.withColumn("__bc", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bc") <= bucket_cap)
            .drop("__bc")
        )
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
        F.col(f"l.{vec_col}").alias("__va"),
        F.col(f"r.{vec_col}").alias("__vb"),
        F.col("l.vnorm").alias("__na"),
        F.col("r.vnorm").alias("__nb"),
    )
    return np_pair_cosine(
        pairs, "__va", "__vb", "__na", "__nb", ["id_a", "id_b"], threshold
    )
