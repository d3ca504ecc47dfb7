"""Deduplication operators for large-scale training-data pipelines.

Methods, cheapest first (the standard cascade at 100 TB):
  1. exact        — content-hash groupBy (one shuffle on the digest)
  2. minhash_lsh  — MinHash signatures + banded LSH candidate join +
                    exact-Jaccard verification of candidates only
  3. simhash      — near-dup by Hamming distance over a bitwise
                    fingerprint; banded by pigeonhole chunks
  4. ngram_jaccard— exact shingle-overlap join (no approximation); cost
                    bounded by inverted-index sparsity, not n²

All hashing uses matano_spark.operators.hashing (integer arithmetic,
engine-portable → DuckDB-oracle-checkable). No UDFs: everything is
Column expressions inside whole-stage codegen; every shuffle key is a
hash/shingle/band value with near-uniform distribution.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from matano_spark.operators import hashing

NUM_MINHASHES = 8
BAND_SIZE = 2  # 4 bands of 2 → catches jaccard >~ 0.4 candidates reliably

# SimHash: 64-bit fingerprint as 4 independent 16-bit chunks, each
# derived from a distinct affine transform of the token's poly hash.
# Pigeonhole over the 4 chunks: any pair within Hamming distance 3
# agrees on at least one full chunk. 16-bit chunks give a 65,536-value
# keyspace per band (vs 256 for the old 30-bit/8-bit layout, which
# degenerated quadratic at ~10^8 docs); drop_hot_keys bounds the worst
# remaining bucket.
SIMHASH_CHUNKS = 4
SIMHASH_CHUNK_BITS = 16
# Affine constants (a*h + b) % P per chunk — distinct from MINHASH_A/B
# so minhash and simhash sketches stay decorrelated.
SIMHASH_A = [40503, 99991, 31337, 65537]
SIMHASH_B = [11, 101, 1009, 10007]


from matano_spark.operators.skew import spread_partitions  # noqa: E402,F401


@lru_cache(maxsize=32)
def shingle_array(n: int = 3, words_col: str = "__ws") -> Column:
    """Per-row array of DISTINCT n-word shingles from a words[] column
    — pure map-side expression, the shared core of every shingle
    consumer. Empty array when the doc has fewer than n words (the
    guard matters: sequence(0, size-n) runs DESCENDING when size < n,
    producing negative element_at indices = from-the-end reads).
    lru_cache: a Column is an immutable expression tree resolved by
    name per plan, so the (n, words_col) tree builds once per process
    instead of once per query (pure py4j construction, ~0.05-0.09 s)."""
    ws = F.col(words_col)
    idx = F.sequence(F.lit(0), F.size(ws) - n)
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(ws, i + j + 1) for j in range(n)]
    )
    return F.when(F.size(ws) >= n, F.array_distinct(F.transform(idx, mk))).otherwise(
        F.array().cast("array<string>")
    )


def shingles_from_words(
    words_df: DataFrame, id_col: str, n: int = 3, words_col: str = "__ws"
) -> DataFrame:
    """Distinct n-word shingles from a pre-tokenized (id, words[])
    relation — (id, shingle) rows. Distinctness is PER DOC and done
    map-side (array_distinct before the explode), so this is a pure
    generate — no distinct shuffle. Callers that need several shingle
    sizes over the same corpus (curation composite: minhash n=3 +
    decontamination n=8) tokenize ONCE and feed both."""
    arr = shingle_array(n, words_col)
    return words_df.filter(F.size(F.col(words_col)) >= n).select(
        id_col, F.explode(arr).alias("shingle")
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct n-word shingles per document: (id, shingle).

    The words array is materialized once per row; element_at over a
    bound array is O(1) (split() inside the lambda would re-tokenize
    per shingle — measured 7.6x slower).
    """
    return shingles_from_words(
        df.select(id_col, F.split(F.col(text_col), " ").alias("__ws")), id_col, n
    )


def exact_dedup_groups(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Content-hash dedup groups: (content_hash, n_copies, keeper id)."""
    return df.groupBy(F.md5(F.col(content_col)).alias("content_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min(id_col).alias(f"keeper_{id_col}"),
    )


def drop_hot_keys(df: DataFrame, key_cols: list[str], cap: int) -> DataFrame:
    """Skew guard for inverted-index / bucket self-joins: anti-join away
    keys whose frequency exceeds `cap`.

    On real web text, stop-shingles (or degenerate LSH buckets) make the
    self-join cost Σ(df²) explode — one shingle present in 1M docs is
    5·10¹¹ pairs on its own. Keys above the cap carry ~zero signal for
    near-dup detection (they match everything) and are dropped, exactly
    like stopword removal. The hot-key list is tiny by construction
    (only keys with df > cap survive the HAVING), so it broadcasts and
    the big relation never reshuffles.
    """
    hot = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > cap)
        .select(*key_cols)
    )
    return df.join(F.broadcast(hot), list(key_cols), "left_anti")


def minhash_signatures(
    shingle_df: DataFrame, id_col: str, num_hashes: int = NUM_MINHASHES
) -> DataFrame:
    """One row per id with m1..mk MinHash components.

    Single aggregation: the shingle's base hash is computed map-side
    once, each permutation is an affine transform of it, and all k
    minima fold into one groupBy — no k-fold row blowup, one shuffle.
    """
    h = hashing.poly_hash(F.col("shingle"))
    aggs = [
        F.min(hashing.affine(h, i)).alias(f"m{i + 1}") for i in range(num_hashes)
    ]
    return shingle_df.groupBy(id_col).agg(*aggs)


def minhash_signatures_from_words(
    words_df: DataFrame,
    id_col: str,
    n: int = 3,
    num_hashes: int = NUM_MINHASHES,
    words_col: str = "__ws",
) -> DataFrame:
    """MinHash signatures computed ENTIRELY map-side from a
    pre-tokenized (id, words[]) relation: the per-doc shingle array is
    built in-row, each shingle hashed once into a hash array, and all
    k permutation minima fold over that array — zero shuffles, zero
    exploded-relation materialization. Bit-identical to
    minhash_signatures∘shingles_from_words (min over a doc's distinct
    shingles), which stays for pre-exploded inputs (streaming probe).
    Docs with fewer than n words are dropped, matching the exploded
    path (they produced no shingle rows, hence no signature)."""
    # Two projections: the shingle-hash array lands in a named column
    # first, so the k minima read it by reference (CollapseProject
    # keeps non-cheap expressions single-evaluated) instead of
    # re-hashing every shingle per permutation.
    hashed = words_df.filter(F.size(F.col(words_col)) >= n).select(
        id_col,
        F.transform(
            shingle_array(n, words_col), lambda s: hashing.poly_hash(s)
        ).alias("__shh"),
    )
    cols = [
        F.array_min(
            F.transform(F.col("__shh"), lambda h: hashing.affine(h, i))
        ).alias(f"m{i + 1}")
        for i in range(num_hashes)
    ]
    return hashed.select(id_col, *cols)


@lru_cache(maxsize=16)
def _band_array(num_hashes: int, band_size: int) -> Column:
    """Banded-signature struct array (cached expression tree — built
    once per process, see shingle_array)."""
    n_bands = num_hashes // band_size
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    ":",
                    *[
                        F.col(f"m{b * band_size + j + 1}").cast("string")
                        for j in range(band_size)
                    ],
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )


def band_keys(
    sig_df: DataFrame,
    id_col: str,
    num_hashes: int = NUM_MINHASHES,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """Explode signature rows to (id, band_id, band_key) LSH band keys.

    The band key concatenates the band's minhash components; two docs
    collide on a band iff those components all agree. Shared by the
    batch self-join (lsh_candidate_pairs) and the incremental
    streaming probe (streaming.dedup), so both paths bucket
    identically.
    """
    bands = _band_array(num_hashes, band_size)
    return sig_df.select(F.col(id_col), F.explode(bands).alias("band")).select(
        id_col,
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_key").alias("band_key"),
    )


@lru_cache(maxsize=16)
def pair_structs(ids_col: str, a_name: str, b_name: str) -> Column:
    """In-row i<j pair expansion of a sorted id array: exactly the
    a.id < b.id self-join pair set per bucket, generated map-side.
    Cached expression tree (built once per process, see shingle_array);
    shared by the minhash LSH and ngram posting-list paths."""
    ids = F.col(ids_col)
    return F.flatten(
        F.transform(
            ids,
            lambda a, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda b: F.struct(a.alias(a_name), b.alias(b_name)),
            ),
        )
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    num_hashes: int = NUM_MINHASHES,
    band_size: int = BAND_SIZE,
    bucket_cap: int | None = 1000,
) -> DataFrame:
    """Banded-LSH candidate pairs (id_a < id_b), deduplicated.

    ONE exchange of the banded stream: the bucket-size guard is a
    window count over (band_id, band_key), and the per-bucket id list
    (collect_list) REUSES that window's partitioning (guide §2.4 —
    same key, no second shuffle); pairs are generated in-row from the
    sorted id array. The previous formulation — drop_hot_keys groupBy
    + banded self-join — shuffled the banded stream three times
    (count, join left, join right). Identical pair set: sorted ids
    with i<j is exactly the a.id < b.id self-join per bucket.

    Degenerate buckets (boilerplate/empty docs all hashing alike) with
    more than `bucket_cap` members are dropped by the window count
    BEFORE collect_list runs, so no task ever materializes a hot
    bucket's id array — the window row buffer spills gracefully,
    bounding the worst bucket at cap² in-row pairs.
    """
    banded = band_keys(sig_df, id_col, num_hashes, band_size)
    if bucket_cap is not None:
        w = Window.partitionBy("band_id", "band_key")
        banded = banded.withColumn("__bc", F.count(F.lit(1)).over(w)).filter(
            F.col("__bc") <= bucket_cap
        )
    grouped = (
        banded.groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return (
        grouped.select(F.explode(pair_structs("ids", "id_a", "id_b")).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def jaccard_for_pairs(
    shingle_df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Exact Jaccard for given candidate pairs: (id_a, id_b, jaccard)."""
    sizes = shingle_df.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = shingle_df.alias("sa")
    sb = shingle_df.alias("sb")
    common = (
        pairs.join(sa, F.col(f"sa.{id_col}") == F.col("id_a"))
        .join(
            sb,
            (F.col(f"sb.{id_col}") == F.col("id_b"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za = sizes.alias("za")
    zb = sizes.alias("zb")
    jac = F.col("n_common").cast("double") / (
        F.col("za.n") + F.col("zb.n") - F.col("n_common")
    )
    return (
        common.join(za, F.col(f"za.{id_col}") == F.col("id_a"))
        .join(zb, F.col(f"zb.{id_col}") == F.col("id_b"))
        .select("id_a", "id_b", jac.alias("jaccard"))
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.35,
    bucket_cap: int | None = 1000,
    words_df: DataFrame | None = None,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection.

    shingle → signature → banded candidates → exact-Jaccard verify.
    Only candidate pairs (not n²) reach the verification join; the
    shingle relation is materialized once and reused. `bucket_cap`
    bounds degenerate LSH buckets (see lsh_candidate_pairs).
    `words_df` lets a composite pipeline share one tokenization pass
    (an already-checkpointed (id, __ws words[]) relation).
    """
    if words_df is None:
        # LAZY: the first action (the candidate materialization below)
        # computes+caches the tokenized relation in the same job — an
        # eager checkpoint paid a dedicated materialization job first
        # (pure scheduling overhead; same pattern as lpm_join/CC).
        words_df = spread_partitions(
            df.select(id_col, F.split(F.col(text_col), " ").alias("__ws"))
        ).localCheckpoint(eager=False)
    # Signatures are computed MAP-SIDE from the words array (per-doc
    # shingle set + k permutation minima fold in-row): the corpus-wide
    # exploded shingle relation is never built or shuffled here. Since
    # candidate generation became a single-pass window+collect over the
    # banded stream (no self-join), sigs has exactly ONE consumer — no
    # checkpoint needed (it would be a wasted materialization job).
    # The per-shingle char folds run as an Arrow+NumPy batch kernel
    # (bit-identical, r10 A/B 1.54 → 0.58 s min at sf0.1); the JVM
    # expression form above stays for the streaming per-batch probe.
    from matano_spark.operators.nptext import np_minhash_signatures_from_words

    sigs = np_minhash_signatures_from_words(words_df, id_col)
    # cands feeds the id-set semi-join AND both sides of the verify
    # join — checkpoint, or the banded pass re-runs per branch. EAGER
    # deliberately (r10 A/B): the three consumer stages (cand_ids
    # broadcast + both verify sides) materialize concurrently under
    # AQE, and a lazy checkpoint lets them race on the uncached RDD —
    # re-running the kernel+banding pass; the eager job guarantees the
    # expensive candidate pass computes exactly once. (The words
    # checkpoint above stays lazy: this job is its first action.)
    cands = lsh_candidate_pairs(
        sigs, id_col, bucket_cap=bucket_cap
    ).localCheckpoint()
    # Exact-Jaccard verification on per-doc shingle ARRAYS, restricted
    # to candidate docs: at 100 TB the candidate set is a sliver of
    # the corpus, so the semi-join keeps the relation tiny before any
    # shingle materialization (AQE broadcasts the id list when small).
    # The array form (size/array_intersect over the per-doc DISTINCT
    # shingle set) replaces the previous exploded-shingle formulation
    # — cands ⋈ shingles ⋈ shingles → groupBy(pair) → ⋈ sizes ⋈ sizes
    # — with two plain joins and ZERO aggregations: 4 joins + 2
    # groupBy shuffles become 2 joins (plan: 4 SortMergeJoin + 2
    # HashAggregate exchanges removed). array_intersect hashes one
    # side (O(|A|+|B|) per pair), and |A∩B| over distinct sets equals
    # the exploded COUNT(*) match, so jaccard values are identical.
    # One scan of cands (explode, not union-of-two-selects) and NO
    # distinct: the left_semi join below deduplicates by construction,
    # so the distinct was a full exchange + aggregation over the id
    # stream that bought nothing (AQE broadcasts the list either way).
    cand_ids = cands.select(
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias(id_col)
    )
    arrs = words_df.join(cand_ids, id_col, "left_semi").select(
        id_col, shingle_array(3).alias("__sh")
    )
    a = arrs.select(
        F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a")
    )
    b = arrs.select(
        F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b")
    )
    n_common = F.size(F.array_intersect(F.col("__sh_a"), F.col("__sh_b")))
    jac = n_common.cast("double") / (
        F.size(F.col("__sh_a")) + F.size(F.col("__sh_b")) - n_common
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc SimHash: (id, c0..c3), four 16-bit fingerprint chunks.

    Chunk k's bit b is 1 iff more (distinct) tokens have bit b set in
    (SIMHASH_A[k] * poly_hash(tok) + SIMHASH_B[k]) % P than not. The
    chunks double as the 64-bit fingerprint (hamming = Σ chunk XOR
    popcounts), so no 2^63 packing is ever needed and each chunk is a
    ready-made band key.

    Entirely MAP-SIDE: distinct tokens via array_distinct, the token
    hashes and the 64 per-bit majority counts as higher-order array
    folds within one row — ZERO shuffles (the previous
    explode→distinct→64-SUM groupBy formulation shuffled twice and was
    2.4x slower at sf0.1; the bitsum math and therefore the oracle SQL
    are unchanged). Each chunk folds its hash array ONCE with a
    16-element count-vector accumulator (zip_with against a literal
    bit-mask array) instead of 16 independent per-bit folds — same
    arithmetic, 1/16th the array traversals and a far smaller codegen
    unit (measured 4x faster at sf0.1, bit-identical output). Each
    intermediate (token set, hash array, per-chunk g arrays) is a
    named column referenced more than once, which keeps
    CollapseProject from inlining and recomputing it.
    """
    toks = F.array_distinct(F.split(F.col(text_col), " "))
    hashed = df.select(
        F.col(id_col),
        F.transform(
            toks,
            lambda tok: F.aggregate(
                F.split(tok, ""),
                F.lit(0).cast("bigint"),
                lambda h, ch: (h * hashing.BASE + F.ascii(ch).cast("bigint"))
                % hashing.P,
            ),
        ).alias("__hs"),
    )
    ghashed = hashed.select(
        id_col,
        *[
            F.transform(
                F.col("__hs"),
                lambda h: (F.lit(SIMHASH_A[k]) * h + F.lit(SIMHASH_B[k])) % hashing.P,
            ).alias(f"__g{k}")
            for k in range(SIMHASH_CHUNKS)
        ],
    )

    masks = F.array(
        *[F.lit(1 << b).cast("bigint") for b in range(SIMHASH_CHUNK_BITS)]
    )

    def bit_majority_counts(k: int) -> Column:
        # one pass over the hash array; acc[b] += ±1 per bit b
        return F.aggregate(
            F.col(f"__g{k}"),
            F.array_repeat(F.lit(0), SIMHASH_CHUNK_BITS),
            lambda acc, g: F.zip_with(
                acc,
                masks,
                lambda a, m: a + F.when(g.bitwiseAND(m) == m, 1).otherwise(-1),
            ),
        )

    chunk_cols = []
    for k in range(SIMHASH_CHUNKS):
        fp = F.aggregate(
            F.zip_with(
                bit_majority_counts(k),
                masks,
                lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("bigint")),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )
        chunk_cols.append(fp.alias(f"c{k}"))
    return ghashed.select(F.col(id_col), *chunk_cols)


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bucket_cap: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Pigeonhole banding: with 4 chunks, any pair within distance 3
    agrees on at least one full chunk, so the candidate join is an
    equi-join on (band_id, chunk) — never a cross join. Degenerate
    buckets (boilerplate corpora collapsing to one fingerprint) are
    dropped by a window count over the band key before the self-join
    (one pass per join side, replacing drop_hot_keys' count-groupBy +
    broadcast anti-join; the window's exchange doubles as the join
    side's required partitioning), bounding the worst bucket at cap²
    pairs; Σ bit_count(chunk xor) verifies survivors.

    NOTE (measured, sf0.1): the posting-list in-row pair expansion
    that won for minhash/ngram LOSES here (1.8 s → 3.0 s) — this
    corpus yields 261k candidate pairs, and per-pair work inside
    higher-order-function lambdas is interpreted, while the self-join
    + filter path is whole-stage-codegen'd. Pair volume decides; keep
    the join.
    """
    # Fingerprints via the Arrow+NumPy batch kernel (bit-identical to
    # simhash_fingerprint — same tokens, arithmetic and bit-majority;
    # r10 A/B 2.65 → 0.64 s min at sf0.1: the per-char JVM fold is
    # interpreted per element, the kernel hashes the whole batch as
    # one segmented-sum pass).
    from matano_spark.operators.nptext import np_simhash_fingerprint

    # LAZY checkpoint: both self-join sides read the windowed banding's
    # reused exchange, so the final count is the first (and only)
    # materialization — eager paid a dedicated kernel job first.
    fps = np_simhash_fingerprint(
        df, id_col, text_col, SIMHASH_A, SIMHASH_B, SIMHASH_CHUNK_BITS
    ).localCheckpoint(eager=False)
    chunk_names = [f"c{k}" for k in range(SIMHASH_CHUNKS)]
    bands = F.array(
        *[
            F.struct(F.lit(k).alias("band_id"), F.col(f"c{k}").alias("chunk"))
            for k in range(SIMHASH_CHUNKS)
        ]
    )
    banded = fps.select(id_col, *chunk_names, F.explode(bands).alias("b")).select(
        id_col,
        *chunk_names,
        F.col("b.band_id").alias("band_id"),
        F.col("b.chunk").alias("chunk"),
    )
    if bucket_cap is not None:
        w = Window.partitionBy("band_id", "chunk")
        banded = (
            banded.withColumn("__bc", F.count(F.lit(1)).over(w))
            .filter(F.col("__bc") <= bucket_cap)
            .drop("__bc")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    ham: Column = F.lit(0)
    for k in range(SIMHASH_CHUNKS):
        ham = ham + F.bit_count(
            F.col(f"a.c{k}").bitwiseXOR(F.col(f"b.c{k}"))
        )
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        # hamming is a pure function of the pair's chunk columns, so
        # filtering BEFORE the dedup shuffle is value-identical and the
        # distinct only shuffles surviving pairs (far fewer than raw
        # band collisions)
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
