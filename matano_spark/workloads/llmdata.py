"""LLM training-data pipeline workload over `documents` and `embeddings`.

First-class operators beyond the reference surface (BASELINE.json north
star): deduplication (exact / n-gram Jaccard / MinHash-LSH / SimHash),
similarity search (brute-force cosine top-k, LSH/IVF scale path), and
text analysis (language-ID, quality scoring, token counting,
fingerprinting). All are pure DataFrame ops — no Python UDFs in the hot
path — so they stay in whole-stage codegen and scale by partitioning on
doc_id / band-bucket keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from matano_spark.workloads import query
from matano_spark.workloads.util import t

# Tiny multilingual stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic, dependency-free; mirrored in oracle SQL.
_LANG_MARKERS = {
    "en": ("the", "and", "of", "a"),
    "de": ("der", "und", "die", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "de", "y"),
    "zh": ("的", "是", "了", "在"),
}


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           COUNT(*) AS n_copies,
           min(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest, keep min doc_id.

    Scale path: md5 is computed map-side, the shuffle key is the hash
    (uniformly distributed — no skew), and only duplicate groups
    survive the HAVING. At 100 TB this is the cheapest dedup pass and
    runs before any near-dup method.
    """
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars,
           length(text) - length(replace(text, ' ', '')) + 1 AS ws_tokens,
           length(regexp_replace(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 'X', 'g'))
             - length(replace(regexp_replace(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 'X', 'g'), 'X', '')) AS bpe_ish_tokens
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token count
    (alpha runs / digit runs / single punctuation as tokens). Pure
    expression — codegen'd, no UDF."""
    docs = t(spark, sf_dir, "documents")
    bpe_pat = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
    marked = F.regexp_replace(F.col("text"), bpe_pat, "X")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        (
            F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", "")) + 1
        ).alias("ws_tokens"),
        (F.length(marked) - F.length(F.regexp_replace(marked, "X", ""))).alias(
            "bpe_ish_tokens"
        ),
    )


@query(
    "text_quality_score",
    oracle="""
    SELECT doc_id, n_words, stopword_ratio, punct_ratio, mean_word_len,
           CAST(CASE WHEN n_words BETWEEN 10 AND 100000 THEN 4 ELSE 0 END
            + CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 3 ELSE 0 END
            + CASE WHEN punct_ratio < 0.2 THEN 2 ELSE 0 END
            + CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END
            AS DOUBLE) / 10.0 AS quality_score
    FROM (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(len(list_filter(string_split(text, ' '),
                  w -> w IN ('the','and','of','a','is','in','to','it')))
                  AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio,
             CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                  / length(text) AS punct_ratio,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
                  / len(string_split(text, ' ')) AS mean_word_len
      FROM documents
    )
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword-ratio / punctuation-ratio /
    word-shape heuristics combined into a [0,1] score (the standard
    pre-filter stage of a training-data pipeline)."""
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    stop = F.array(*[F.lit(w) for w in ("the", "and", "of", "a", "is", "in", "to", "it")])
    n_words = F.size(words).cast("bigint")
    stopword_ratio = (
        F.size(F.filter(words, lambda w: F.array_contains(stop, w))).cast("double")
        / F.size(words)
    )
    # punct count as a length difference over translate (chars deleted
    # one table lookup each) instead of a regex scan — identical count:
    # regexp_replace kept exactly the chars translate deletes, and both
    # operate per codepoint.
    punct_ratio = (
        (
            F.length("text") - F.length(F.translate(F.col("text"), ".,;:!?", ""))
        ).cast("double")
        / F.length("text")
    )
    mean_word_len = (
        F.length(F.translate(F.col("text"), " ", "")).cast("double")
        / F.size(words)
    )
    base = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        stopword_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        mean_word_len.alias("mean_word_len"),
    )
    points = (
        F.when(F.col("n_words").between(10, 100000), 4).otherwise(0)
        + F.when(F.col("stopword_ratio").between(0.01, 0.6), 3).otherwise(0)
        + F.when(F.col("punct_ratio") < 0.2, 2).otherwise(0)
        + F.when(F.col("mean_word_len").between(2.0, 12.0), 1).otherwise(0)
    )
    # Integer point sum, single final division — float-association-free.
    return base.withColumn("quality_score", points.cast("double") / F.lit(10.0))


@query(
    "text_lang_id",
    oracle="""
    SELECT doc_id, lang,
           CASE
             WHEN de_hits >= en_hits AND de_hits >= fr_hits AND de_hits >= es_hits
                  AND de_hits >= zh_hits AND de_hits > 0 THEN 'de'
             WHEN fr_hits >= en_hits AND fr_hits >= es_hits AND fr_hits >= zh_hits
                  AND fr_hits > 0 THEN 'fr'
             WHEN es_hits >= en_hits AND es_hits >= zh_hits AND es_hits > 0 THEN 'es'
             WHEN zh_hits >= en_hits AND zh_hits > 0 THEN 'zh'
             ELSE 'en'
           END AS predicted_lang
    FROM (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), w -> w IN ('the','and','of','a'))) AS en_hits,
             len(list_filter(string_split(text, ' '), w -> w IN ('der','und','die','das'))) AS de_hits,
             len(list_filter(string_split(text, ' '), w -> w IN ('le','la','et','les'))) AS fr_hits,
             len(list_filter(string_split(text, ' '), w -> w IN ('el','los','de','y'))) AS es_hits,
             len(list_filter(string_split(text, ' '), w -> w IN ('的','是','了','在'))) AS zh_hits
      FROM documents
    )
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID: stopword-marker voting heuristic, deterministic
    priority de>fr>es>zh>en on ties. Pure expressions (no UDF)."""
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")

    def hits(markers: tuple[str, ...]):
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))

    base = docs.select(
        "doc_id",
        "lang",
        hits(_LANG_MARKERS["en"]).alias("en_hits"),
        hits(_LANG_MARKERS["de"]).alias("de_hits"),
        hits(_LANG_MARKERS["fr"]).alias("fr_hits"),
        hits(_LANG_MARKERS["es"]).alias("es_hits"),
        hits(_LANG_MARKERS["zh"]).alias("zh_hits"),
    )
    c = F.col
    pred = (
        F.when(
            (c("de_hits") >= c("en_hits"))
            & (c("de_hits") >= c("fr_hits"))
            & (c("de_hits") >= c("es_hits"))
            & (c("de_hits") >= c("zh_hits"))
            & (c("de_hits") > 0),
            "de",
        )
        .when(
            (c("fr_hits") >= c("en_hits"))
            & (c("fr_hits") >= c("es_hits"))
            & (c("fr_hits") >= c("zh_hits"))
            & (c("fr_hits") > 0),
            "fr",
        )
        .when(
            (c("es_hits") >= c("en_hits")) & (c("es_hits") >= c("zh_hits")) & (c("es_hits") > 0),
            "es",
        )
        .when((c("zh_hits") >= c("en_hits")) & (c("zh_hits") > 0), "zh")
        .otherwise("en")
    )
    return base.select("doc_id", "lang", pred.alias("predicted_lang"))


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''), ch -> CAST(unicode(ch) AS BIGINT))),
             (h, code) -> (h * 131 + code) % 1000000007
           ) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: polynomial rolling hash over codepoints,
    h = (h*131 + code) mod 1e9+7 — sequential fold, identical in Spark
    `aggregate` and DuckDB `list_reduce`. Used as a cheap content id
    that survives whitespace-preserving copies."""
    docs = t(spark, sf_dir, "documents")
    chars = F.split(F.col("text"), "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda h, ch: (h * 131 + F.ascii(ch).cast("bigint")) % 1000000007,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH shingles_all AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                       for i in range(1, len(ws) - 1)]) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      )
    ),
    shingles AS (
      SELECT s.* FROM shingles_all s
      JOIN (SELECT shingle FROM shingles_all
            GROUP BY shingle HAVING COUNT(*) <= 1000) ok
      USING (shingle)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.35
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: exact 3-word-shingle Jaccard via an inverted
    index self-join (explode shingles → join on shingle → count common
    → |A∩B| / (|A|+|B|-|A∩B|)).

    Scale path: the join key is the shingle (high cardinality → well
    distributed); only pairs sharing ≥1 shingle are materialized, so
    cost is Σ(docs-per-shingle²) not n² — the same sparsity MinHash-LSH
    exploits, but exact. Hot shingles (document frequency > 1000) are
    dropped via drop_hot_keys before the self-join — stop-shingle
    removal that bounds the worst key at cap² pairs on real web text.
    """
    docs = t(spark, sf_dir, "documents")
    # Tokenize once per row; per-doc shingle DISTINCTNESS is map-side
    # (array_distinct before the explode, via shingles_from_words).
    with_ws = docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
    # ONE exchange of the shingle stream: the hot-shingle cap is a
    # window count over the shingle, and the per-shingle posting list
    # (collect_list) reuses that window's partitioning (guide §2.4) —
    # the previous formulation shuffled the stream for the cap count,
    # then again on BOTH sides of the inverted-index self-join.
    # Checkpointed once; it feeds both the pair branch and sizes.
    w_sh = W.partitionBy("shingle")
    buckets = (
        D.shingles_from_words(with_ws, "doc_id", 3, words_col="ws")
        .withColumn("__df", F.count(F.lit(1)).over(w_sh))
        .filter(F.col("__df") <= 1000)
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        # LAZY: the final action's first consumer materializes it in
        # the same job (eager paid a dedicated posting-list job first)
    ).localCheckpoint(eager=False)
    # sizes = per-doc capped-shingle count — singleton buckets still
    # count (a doc's size includes shingles shared with nobody), so
    # the explode runs over ALL buckets; shuffle bytes are doc_id-only
    # partial counts.
    sizes = (
        buckets.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Pairs sharing a shingle, generated in-row from the sorted
    # posting list (i<j == the old a.doc_id < b.doc_id self-join);
    # n_common = pair multiplicity across buckets. The cap bounds the
    # worst bucket at cap² in-row pairs, exactly the old join bound.
    common = (
        buckets.filter(F.size("ids") >= 2)
        .select(F.explode(D.pair_structs("ids", "doc_a", "doc_b")).alias("p"))
        .groupBy(
            F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        common.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.35)
    )


# ---------------------------------------------------------------------------
# MinHash-LSH / SimHash near-dup + embedding similarity search.
# Oracle SQL is generated from the same integer-hash definitions
# (operators.hashing) so DuckDB reproduces Spark's values exactly.
# ---------------------------------------------------------------------------

from matano_spark.operators import dedup as D  # noqa: E402
from matano_spark.operators import similarity as S  # noqa: E402
from matano_spark.operators.hashing import (  # noqa: E402
    MINHASH_A,
    MINHASH_B,
    P,
    sql_poly_hash,
)

_SHINGLES_CTE = """
    shingles AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      )
    )
"""


def _sql_minhash_sigs() -> str:
    h = sql_poly_hash("shingle")
    mins = ", ".join(
        f"min(({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {P}) AS m{i + 1}"
        for i in range(D.NUM_MINHASHES)
    )
    return f"""
    hashes AS (SELECT doc_id, {h} AS h FROM shingles),
    sigs AS (SELECT doc_id, {mins} FROM hashes GROUP BY doc_id)
    """


def _sql_minhash_bands() -> str:
    n_bands = D.NUM_MINHASHES // D.BAND_SIZE
    selects = []
    for b in range(n_bands):
        cols = " || ':' || ".join(
            f"CAST(m{b * D.BAND_SIZE + j + 1} AS VARCHAR)"
            for j in range(D.BAND_SIZE)
        )
        selects.append(
            f"SELECT doc_id, {b} AS band_id, {cols} AS band_key FROM sigs"
        )
    return "banded AS (" + " UNION ALL ".join(selects) + ")"


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_sql_minhash_sigs()},
    {_sql_minhash_bands()},
    banded_capped AS (
      SELECT b.* FROM banded b
      JOIN (SELECT band_id, band_key FROM banded
            GROUP BY band_id, band_key HAVING COUNT(*) <= 1000) ok
      USING (band_id, band_key)
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded_capped a JOIN banded_capped b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    common AS (
      SELECT id_a, id_b, COUNT(*) AS n_common
      FROM cands
      JOIN shingles sa ON sa.doc_id = id_a
      JOIN shingles sb ON sb.doc_id = id_b AND sa.shingle = sb.shingle
      GROUP BY id_a, id_b
    )
    SELECT id_a, id_b,
           CAST(n_common AS DOUBLE) / (za.n + zb.n - n_common) AS jaccard
    FROM common
    JOIN sizes za ON za.doc_id = id_a
    JOIN sizes zb ON zb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / (za.n + zb.n - n_common) >= 0.35
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup detection (see operators.dedup).

    The approximate stage only *generates candidates*; survivors are
    verified with exact Jaccard, so output quality does not depend on
    the sketch. At 100 TB only the candidate pairs — a tiny fraction
    of n² — reach the verification join.
    """
    docs = t(spark, sf_dir, "documents")
    return D.minhash_near_dups(docs, "doc_id", "text", threshold=0.35)


def _sql_simhash() -> str:
    h = sql_poly_hash("tok")
    gs = ", ".join(
        f"(({D.SIMHASH_A[k]} * h + {D.SIMHASH_B[k]}) % {P}) AS g{k}"
        for k in range(D.SIMHASH_CHUNKS)
    )
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (g{k} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{k}_{b}"
        for k in range(D.SIMHASH_CHUNKS)
        for b in range(D.SIMHASH_CHUNK_BITS)
    )
    fps = ", ".join(
        "("
        + " + ".join(
            f"CASE WHEN s{k}_{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
            for b in range(D.SIMHASH_CHUNK_BITS)
        )
        + f") AS c{k}"
        for k in range(D.SIMHASH_CHUNKS)
    )
    chunks = ", ".join(f"c{k}" for k in range(D.SIMHASH_CHUNKS))
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {chunks}, {k} AS band_id, c{k} AS chunk FROM fps"
        for k in range(D.SIMHASH_CHUNKS)
    )
    return f"""
    tokens AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    ),
    hashes AS (SELECT doc_id, {h} AS h FROM tokens),
    ghashes AS (SELECT doc_id, {gs} FROM hashes),
    bitsums AS (SELECT doc_id, {bit_sums} FROM ghashes GROUP BY doc_id),
    fps AS (SELECT doc_id, {fps} FROM bitsums),
    banded_all AS ({bands}),
    banded AS (
      SELECT b.* FROM banded_all b
      JOIN (SELECT band_id, chunk FROM banded_all
            GROUP BY band_id, chunk HAVING COUNT(*) <= 1000) ok
      USING (band_id, chunk)
    )
    """


def _sql_simhash_hamming() -> str:
    return " + ".join(
        f"bit_count(xor(a.c{k}, b.c{k}))" for k in range(D.SIMHASH_CHUNKS)
    )


@query(
    "dedup_simhash",
    oracle=f"""
    WITH {_sql_simhash()}
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST({_sql_simhash_hamming()} AS INT) AS hamming
    FROM banded a JOIN banded b
      ON a.band_id = b.band_id AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    WHERE CAST({_sql_simhash_hamming()} AS INT) <= 1
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit sign-aggregated fingerprint held as four
    16-bit chunks, pigeonhole banding (4 chunks ⇒ distance-3 pairs
    always collide on one), hot-bucket cap before the self-join, and
    Σ bit_count(chunk xor) verification. All integer expressions — no
    UDF, engine-portable."""
    docs = t(spark, sf_dir, "documents")
    out = D.simhash_near_dups(docs, "doc_id", "text", max_hamming=1)
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(x, y) -> x + y)"
    )


def _sql_cosine(a: str, b: str) -> str:
    return (
        f"({_sql_dot(a, b)} / (sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)})))"
    )


def _sql_lsh_bucket(arr: str) -> str:
    terms = []
    for j in range(S.LSH_PLANES):
        proj = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, len({arr}) + 1), "
            f"i -> CAST({arr}[i] AS DOUBLE) * "
            f"(CASE WHEN (({j * S._MIX_J} + i * {S._MIX_D}) % {P}) % 2 = 0 "
            f"THEN 1.0 ELSE -1.0 END))), (x, y) -> x + y)"
        )
        terms.append(
            f"CASE WHEN {proj} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


@query(
    "sim_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             {_sql_cosine('q.qvec', 'c.embedding')} AS cosine
      FROM q JOIN embeddings c ON c.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 query vectors — the exact ANN
    baseline. Sequential-fold dot products (bit-identical to the
    oracle); corpus side streams, query side broadcasts."""
    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    out = S.cosine_topk(emb, queries_df, "vec_id", "embedding", k=5)
    return out.withColumn("rank", F.col("rank").cast("int"))


@query(
    "sim_ann_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_sql_lsh_bucket('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qvec, bucket
          FROM b WHERE vec_id < 10),
    c AS (
      SELECT b.* FROM b
      JOIN (SELECT bucket FROM b GROUP BY bucket
            HAVING COUNT(*) <= {S.BUCKET_CAP}) ok USING (bucket)
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             {_sql_cosine('q.qvec', 'c.embedding')} AS cosine
      FROM q JOIN c ON c.bucket = q.bucket AND c.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via sign-random-projection LSH buckets: the
    scale path — a probe touches ~1/256 of the corpus. Recall vs the
    brute-force baseline is asserted in tests."""
    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    out = S.lsh_topk(emb, queries_df, "vec_id", "embedding", k=5)
    return out.withColumn("rank", F.col("rank").cast("int"))


@query(
    "sim_ann_ivf",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings ORDER BY vec_id LIMIT {S.N_CENTROIDS}
    ),
    assign AS (
      SELECT e.vec_id, e.embedding, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_sql_cosine('e.embedding', 'c.cvec')} DESC, c.cid
             ) AS rn
      FROM embeddings e CROSS JOIN cent c
    ),
    cells AS (SELECT vec_id, embedding, cid AS cell FROM assign WHERE rn = 1),
    qprobe AS (
      SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cid AS cell,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_sql_cosine('q.embedding', 'c.cvec')} DESC, c.cid
             ) AS rn
      FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10
    ),
    qp AS (SELECT query_id, qvec, cell FROM qprobe WHERE rn <= {S.N_PROBE}),
    scored AS (
      SELECT qp.query_id, t.vec_id AS neighbor_id,
             {_sql_cosine('qp.qvec', 't.embedding')} AS cosine
      FROM qp JOIN cells t ON t.cell = qp.cell AND t.vec_id != qp.query_id
    )
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via an IVF coarse quantizer: corpus vectors
    live in their nearest-centroid cell, a query probes its 4 closest
    of 16 cells. The second ANN scale path next to sign-LSH — cell
    assignment is a per-row fold over the broadcast codebook, and the
    probe is a plain equi-join on the (persistable) cell id."""
    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    out = S.ivf_topk(emb, queries_df, "vec_id", "embedding", k=5)
    return out.withColumn("rank", F.col("rank").cast("int"))


@query(
    "dedup_embedding_near",
    oracle=f"""
    WITH b0 AS (
      SELECT vec_id, embedding, {_sql_lsh_bucket('embedding')} AS bucket
      FROM embeddings
    ),
    b AS (
      SELECT b0.* FROM b0
      JOIN (SELECT bucket FROM b0 GROUP BY bucket
            HAVING COUNT(*) <= {S.BUCKET_CAP}) ok USING (bucket)
    )
    SELECT l.vec_id AS id_a, r.vec_id AS id_b,
           {_sql_cosine('l.embedding', 'r.embedding')} AS cosine
    FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
    WHERE {_sql_cosine('l.embedding', 'r.embedding')} >= 0.3
    """,
)
def dedup_embedding_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH-bucket equi-join bounds the
    candidate count; cosine >= threshold verifies. The semantic-dedup stage
    of a training-data pipeline."""
    emb = t(spark, sf_dir, "embeddings")
    return S.embedding_near_dups(emb, "vec_id", "embedding", threshold=0.3)


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           CAST(CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 4096 AS INTEGER) AS width,
           CAST(CAST(('0x' || substr(md5(text), 5, 4)) AS INTEGER) % 4096 AS INTEGER) AS height
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: wrap a payload as the binary
    modality struct, run the Arrow-batched (stub) decode kernel, emit
    per-item features (operators.multimodal). The deterministic fake
    decoder makes even the Python decode stage oracle-checkable; a real
    imaging decode drops into the same mapInPandas slot."""
    from matano_spark.operators.multimodal import (
        attach_binary_column,
        decode_image_features,
    )

    docs = t(spark, sf_dir, "documents")
    payload = docs.select("doc_id", F.col("text").cast("binary").alias("payload"))
    media = attach_binary_column(payload, "doc_id", "payload", "text/plain")
    return decode_image_features(media, fake=True)


@query(
    "text_lm_fluency",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    big AS (
      SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
            FROM toks WHERE len(ws) >= 2)
    ),
    cnt2 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
    cnt1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
    scored AS (
      SELECT b.doc_id, (c12 * 1000000) // c1 AS p_micro
      FROM big b JOIN cnt2 USING (w1, w2) JOIN cnt1 USING (w1)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(p_micro) AS BIGINT) AS fluency_micro_sum
    FROM scored GROUP BY doc_id
    """,
)
def text_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM quality filter (CCNet-style, log-free): score
    each document by its bigram transition probabilities under the
    corpus's own bigram model — boilerplate and fluent text score
    high, lorem-garbage and mojibake score low. Kept as exact integer
    micro-probabilities (floor(1e6 * c(w1,w2)/c(w1)) summed per doc)
    instead of float log-perplexity, so ranks are engine-portable
    bit-for-bit; a monotone log transform downstream doesn't change
    the filter decision.

    SCALE: the bigram stream shuffles twice (pair counts, context
    counts); both count tables are VOCABULARY-sized, orders smaller
    than the corpus. The context-count join key (w1) is Zipf-skewed —
    'the' is a hot key — so cnt1 is BROADCAST (vocab fits by
    construction); the pair-count join shuffles on (w1,w2), whose skew
    is far milder, with AQE skew-join as the backstop.
    """
    docs = t(spark, sf_dir, "documents")
    with_ws = docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
    ws = F.col("ws")
    idx = F.sequence(F.lit(0), F.size(ws) - 2)
    pair = lambda i: F.struct(  # noqa: E731
        F.element_at(ws, i + 1).alias("w1"), F.element_at(ws, i + 2).alias("w2")
    )
    # NOTE (r10, measured): pre-aggregating this stream to
    # (doc_id, w1, w2, k) before the joins — so every exchange ships
    # distinct within-doc bigrams — was A/B'd per the r9 verdict and
    # REJECTED: 0.86 → 1.71 s min on the real corpus and 2.00 → 2.32 s
    # even on a 5×-within-doc-duplication fixture. cnt2/cnt1 already
    # collapse repeats in their map-side partial aggregation, so the
    # extra (doc,w1,w2) exchange is pure added cost; only the scoring
    # join ships occurrences, and re-weighting doesn't pay for the
    # extra shuffle.
    big = (
        with_ws.filter(F.size(ws) >= 2)
        .select("doc_id", F.explode(F.transform(idx, pair)).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        # feeds cnt2, cnt1, and the scoring join; LAZY so the final
        # action's first consumer materializes it in the same job
        # (eager paid a dedicated bigram-stream job first)
        .localCheckpoint(eager=False)
    )
    cnt2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    cnt1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        big.join(cnt2, ["w1", "w2"])
        .join(F.broadcast(cnt1), "w1")
        .select(
            "doc_id",
            F.expr("(c12 * 1000000L) div c1").alias("p_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("p_micro").cast("bigint").alias("fluency_micro_sum"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(offset_ms // 1000 AS INTEGER) AS frame_idx,
           CAST(offset_ms AS BIGINT) AS offset_ms
    FROM (
      SELECT doc_id,
             unnest(range(0, CAST(n_chars * 40 AS BIGINT), 1000)) AS offset_ms
      FROM documents
      WHERE n_chars > 0
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling grid over video-like media: one row per sampled
    timestamp, derived from duration metadata ALONE (duration_ms :=
    n_chars * 40 stands in for real probe metadata). The payload
    column is never touched — the oracle proves the grid math, and the
    plan shows the binary column pruned from the scan
    (operators.multimodal.sample_frame_refs docstring)."""
    from matano_spark.operators.multimodal import sample_frame_refs

    docs = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    media = docs.select(
        F.col("doc_id").alias("id"),
        F.struct(
            F.col("text").cast("binary").alias("data"),
            F.struct(
                F.lit("video/fake").alias("mime"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                (F.col("n_chars") * 40).cast("bigint").alias("duration_ms"),
                F.lit(16000).alias("sample_rate"),
            ).alias("meta"),
        ).alias("media"),
    )
    return sample_frame_refs(media, every_ms=1000).select(
        F.col("id").alias("doc_id"), "frame_idx", "offset_ms"
    )


def _oracle_of(name: str) -> str:
    from matano_spark.workloads import REGISTRY

    return REGISTRY[name].oracle


@query(
    "doc_pipeline_corpus_stats",
    oracle=None,  # composed below after all parts are registered
)
def doc_pipeline_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data pipeline as ONE composition of the
    verified stages: exact-dedup keep-list → quality filter (>= 0.5) →
    language routing → corpus stats per predicted language. Both sides
    compose the SAME building blocks (the Spark DataFrames and their
    oracle SQL), so the composite is verified against the composed
    oracle."""
    from matano_spark.workloads import REGISTRY

    quality = REGISTRY["text_quality_score"].fn(spark, sf_dir)
    lang = REGISTRY["text_lang_id"].fn(spark, sf_dir)
    tokens = REGISTRY["text_token_stats"].fn(spark, sf_dir)
    keepers = (
        REGISTRY["dedup_exact"].fn(spark, sf_dir)
        .select(F.col("keeper_doc_id").alias("doc_id"))
    )
    return (
        quality.filter(F.col("quality_score") >= 0.5)
        .join(keepers, "doc_id", "left_semi")
        .join(lang.select("doc_id", "predicted_lang"), "doc_id")
        .join(tokens.select("doc_id", "ws_tokens"), "doc_id")
        .groupBy("predicted_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


# Compose the oracle from the registered parts (registration order puts
# the parts above this query in the module).
from matano_spark.workloads import REGISTRY as _REG  # noqa: E402

_REG["doc_pipeline_corpus_stats"].oracle = f"""
    WITH quality AS ({_oracle_of("text_quality_score")}),
    lang AS ({_oracle_of("text_lang_id")}),
    tokens AS ({_oracle_of("text_token_stats")}),
    keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
    SELECT predicted_lang,
           COUNT(*) AS n_docs,
           CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
           min(q.doc_id) AS min_doc_id
    FROM quality q
    JOIN lang USING (doc_id)
    JOIN tokens USING (doc_id)
    WHERE q.quality_score >= 0.5
      AND q.doc_id IN (SELECT doc_id FROM keepers)
    GROUP BY predicted_lang
"""


@query(
    "text_bigram_topk",
    oracle="""
    WITH bigrams AS (
      SELECT unnest(list_transform(range(1, len(ws)),
               i -> ws[i] || ' ' || ws[i+1])) AS bigram
      FROM (SELECT string_split(text, ' ') AS ws FROM documents)
    )
    SELECT bigram, COUNT(*) AS n
    FROM bigrams GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram statistics: top-20 word bigrams — the vocabulary/
    collocation profiling stage of a data pipeline. Explode → count →
    partial top-k; ties broken lexicographically for determinism."""
    docs = t(spark, sf_dir, "documents")
    ws = F.col("__ws")
    idx = F.sequence(F.lit(0), F.size(ws) - 2)
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at(ws, i + 1), F.element_at(ws, i + 2)
    )
    return (
        docs.select(F.split(F.col("text"), " ").alias("__ws"))
        .filter(F.size(ws) >= 2)
        .select(F.explode(F.transform(idx, mk)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


@query(
    "text_repetition_signals",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    words AS (
      SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
             CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct
      FROM base
    ),
    bi AS (
      SELECT doc_id, unnest(list_transform(range(1, len(ws)),
               i -> ws[i] || ' ' || ws[i+1])) AS bigram
      FROM base WHERE len(ws) >= 2
    ),
    bc AS (
      SELECT doc_id, bigram, COUNT(*) AS c FROM bi GROUP BY doc_id, bigram
    ),
    bt AS (
      SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
               AS top_bigram_ratio
      FROM bc GROUP BY doc_id
    )
    SELECT words.doc_id, n_words,
           1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE)
             AS dup_word_ratio,
           top_bigram_ratio
    FROM words JOIN bt ON words.doc_id = bt.doc_id
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText filter
    family): per-document duplicate-word fraction and most-frequent-
    bigram share. Highly repetitive documents (boilerplate, keyword
    stuffing, generation loops) score high on both and are dropped
    before training.

    SCALE: duplicate-word fraction is a pure array expression (no
    shuffle); the bigram mode shuffles on (doc_id, bigram) — a key
    strictly finer than doc_id, so it inherits the corpus's doc
    partitioning bound and has no global hot key.
    """
    docs = t(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    words = docs.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(ws)).cast("bigint").alias("n_distinct"),
    )
    wsc = F.col("__ws")
    idx = F.sequence(F.lit(0), F.size(wsc) - 2)
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at(wsc, i + 1), F.element_at(wsc, i + 2)
    )
    bigram_counts = (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("__ws"))
        .filter(F.size(wsc) >= 2)
        .select("doc_id", F.explode(F.transform(idx, mk)).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = bigram_counts.groupBy(F.col("doc_id").alias("bid")).agg(
        (F.max("c").cast("double") / F.sum("c").cast("double")).alias(
            "top_bigram_ratio"
        )
    )
    return (
        words.join(top, words.doc_id == top.bid)
        .select(
            "doc_id",
            "n_words",
            (
                F.lit(1.0)
                - F.col("n_distinct").cast("double") / F.col("n_words").cast("double")
            ).alias("dup_word_ratio"),
            "top_bigram_ratio",
        )
    )


@query(
    "dedup_boilerplate_spans",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(ws) - 3),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                    || ws[i+3] || ' ' || ws[i+4])) AS shingle
      FROM base WHERE len(ws) >= 5
    ),
    hot AS (
      SELECT shingle, COUNT(*) AS n_docs
      FROM sh GROUP BY shingle HAVING COUNT(*) >= 3
    )
    SELECT sh.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN hot.shingle IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boilerplate,
           CAST(SUM(CASE WHEN hot.shingle IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS boilerplate_ratio
    FROM sh LEFT JOIN hot ON sh.shingle = hot.shingle
    GROUP BY sh.doc_id
    """,
)
def dedup_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document span (boilerplate) detection, RefinedWeb-style:
    5-word shingles occurring in >= 3 distinct documents are boilerplate
    (headers, footers, license blurbs); each document reports how much
    of it is made of such spans.

    SCALE: the shingle inventory is distinct-per-document before the
    frequency count, so a span repeated inside one document counts once
    — and the join key (shingle) has its fan-out bounded by the number
    of DOCUMENTS containing the span, not occurrences. The hot side is
    the aggregated (shingle, n_docs) relation — tiny relative to the
    corpus — and the per-doc rollup shuffles on doc_id only.
    """
    docs = t(spark, sf_dir, "documents")
    wsc = F.col("__ws")
    idx = F.sequence(F.lit(0), F.size(wsc) - 5)
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(wsc, i + k) for k in range(1, 6)]
    )
    sh = (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("__ws"))
        .filter(F.size(wsc) >= 5)
        .select("doc_id", F.explode(F.transform(idx, mk)).alias("shingle"))
        .distinct()
    )
    hot = (
        sh.groupBy(F.col("shingle").alias("hs"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 3)
    )
    is_hot = F.when(F.col("hs").isNotNull(), 1).otherwise(0)
    return (
        sh.join(hot, sh.shingle == hot.hs, "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(is_hot).cast("bigint").alias("n_boilerplate"),
            (F.sum(is_hot).cast("double") / F.count(F.lit(1))).alias(
                "boilerplate_ratio"
            ),
        )
    )


@query(
    "pii_redaction_stats",
    oracle="""
    WITH synth AS (
      SELECT event_id, event_type,
             CASE WHEN event_type = 'signup'
                  THEN concat('contact user-', CAST(user_id AS VARCHAR),
                              '@example.com for onboarding')
                  WHEN event_type = 'error'
                  THEN concat('failure from 10.0.',
                              CAST(user_id % 250 AS VARCHAR),
                              '.7 dial +1-555-867-5309')
                  ELSE 'no sensitive content here' END AS text
      FROM events
    ),
    red AS (
      SELECT event_id, event_type,
             CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
               AS n_email,
             CAST(len(regexp_extract_all(text,
               '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS BIGINT) AS n_ipv4,
             CAST(len(regexp_extract_all(text,
               '\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,6}(?:[-. ][0-9]{2,6})?'))
               AS BIGINT) AS n_phone,
             length(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g'),
               '\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,6}(?:[-. ][0-9]{2,6})?',
               '<PHONE>', 'g')) AS redacted_len
      FROM synth
    )
    SELECT event_type,
           CAST(SUM(n_email) AS BIGINT) AS n_emails,
           CAST(SUM(n_ipv4) AS BIGINT) AS n_ipv4,
           CAST(SUM(n_phone) AS BIGINT) AS n_phones,
           CAST(SUM(redacted_len) AS BIGINT) AS total_redacted_len
    FROM red GROUP BY event_type
    """,
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit rollup: deterministic PII-bearing text is
    synthesized from `events` (the documents corpus carries no PII by
    construction), scrubbed by operators.redact — map-only
    regexp_replace/regexp_count, patterns in the Java-regex/RE2 common
    subset — and the per-class counts plus redacted lengths aggregate
    per event type. The oracle re-runs the same patterns in DuckDB's
    RE2, proving cross-engine pattern portability."""
    from matano_spark.operators.redact import redact_documents

    ev = t(spark, sf_dir, "events")
    synth = ev.select(
        "event_id",
        "event_type",
        F.when(
            F.col("event_type") == "signup",
            F.concat(
                F.lit("contact user-"),
                F.col("user_id").cast("string"),
                F.lit("@example.com for onboarding"),
            ),
        )
        .when(
            F.col("event_type") == "error",
            F.concat(
                F.lit("failure from 10.0."),
                (F.col("user_id") % 250).cast("string"),
                F.lit(".7 dial +1-555-867-5309"),
            ),
        )
        .otherwise(F.lit("no sensitive content here"))
        .alias("text"),
    )
    red = redact_documents(synth)
    return red.groupBy("event_type").agg(
        F.sum("n_email").cast("bigint").alias("n_emails"),
        F.sum("n_ipv4").cast("bigint").alias("n_ipv4"),
        F.sum("n_phone").cast("bigint").alias("n_phones"),
        F.sum(F.length("text_redacted")).cast("bigint").alias("total_redacted_len"),
    )


@query(
    "doc_chunking",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    chunks AS (
      SELECT doc_id, s / 24 AS chunk_id,
             array_to_string(ws[s + 1 : s + 32], ' ') AS chunk
      FROM base, LATERAL (SELECT unnest(range(0, len(ws), 24)) AS s)
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(string_split(chunk, ' ')) AS BIGINT) AS chunk_words,
           md5(chunk) AS chunk_hash
    FROM chunks
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for context-window-bounded training: 32-word
    windows with 8-word overlap (stride 24), the standard long-document
    preprocessing step. Pure array expressions — sequence + slice +
    explode, map-only, no shuffle; chunk content is verified via md5 so
    the oracle proves byte-identical chunk text, not just counts."""
    docs = t(spark, sf_dir, "documents")
    ws = F.col("__ws")
    starts = F.sequence(F.lit(0), F.size(ws) - 1, F.lit(24))
    mk = lambda s: F.struct(  # noqa: E731
        (s / 24).cast("bigint").alias("chunk_id"),
        F.concat_ws(" ", F.slice(ws, s + 1, 32)).alias("chunk"),
    )
    return (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("__ws"))
        .select("doc_id", F.explode(F.transform(starts, mk)).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.size(F.split(F.col("c.chunk"), " ")).cast("bigint").alias(
                "chunk_words"
            ),
            F.md5(F.col("c.chunk")).alias("chunk_hash"),
        )
    )


from matano_spark.operators.hashing import sql_poly_hash as _sql_ph  # noqa: E402


@query(
    "corpus_split",
    oracle=f"""
    WITH bucketed AS (
      SELECT doc_id, n_chars,
             {_sql_ph('text')} % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM bucketed GROUP BY 1
    """,
)
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/val/test split (90/5/5): the
    split assignment is a pure function of document CONTENT, so it is
    reproducible across runs, engines, and re-partitioning — and
    duplicate documents always land in the same split (no train/test
    leakage through near-identical copies). Map-only + one tiny
    aggregation."""
    from matano_spark.operators import hashing

    docs = t(spark, sf_dir, "documents")
    bucket = hashing.poly_hash(F.col("text")) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return docs.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_sql_minhash_sigs()},
    {_sql_minhash_bands()},
    banded_capped AS (
      SELECT b.* FROM banded b
      JOIN (SELECT band_id, band_key FROM banded
            GROUP BY band_id, band_key HAVING COUNT(*) <= 1000) ok
      USING (band_id, band_key)
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded_capped a JOIN banded_capped b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    common AS (
      SELECT id_a, id_b, COUNT(*) AS n_common
      FROM cands
      JOIN shingles sa ON sa.doc_id = id_a
      JOIN shingles sb ON sb.doc_id = id_b AND sa.shingle = sb.shingle
      GROUP BY id_a, id_b
    ),
    pairs AS (
      SELECT id_a, id_b FROM common
      JOIN sizes za ON za.doc_id = id_a
      JOIN sizes zb ON zb.doc_id = id_b
      WHERE CAST(n_common AS DOUBLE) / (za.n + zb.n - n_common) >= 0.35
    ),
    sym AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach(node, lab) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
    )
    SELECT min(lab) AS cluster_id, node AS doc_id
    FROM reach GROUP BY node
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: the MinHash pair set closed into connected
    components (operators.graph min-label propagation), assigning every
    paired document its component id (= min doc_id reachable through
    the near-dup relation). This is the keeper-selection stage every
    production dedup pipeline runs after pairwise detection — A~B and
    B~C collapse to one cluster even though A~C was never emitted.

    The oracle closes the same pair set with a recursive CTE — a
    completely different transitive-closure algorithm — so the
    distributed propagation is verified against an independent one.
    """
    from matano_spark.operators.graph import connected_components

    docs = t(spark, sf_dir, "documents")
    pairs = D.minhash_near_dups(docs, "doc_id", "text", threshold=0.35).select(
        "id_a", "id_b"
    )
    labels = connected_components(pairs)
    return labels.select(
        F.col("component").alias("cluster_id"), F.col("node").alias("doc_id")
    )


@query(
    "text_tfidf_topk",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY doc_id, term
    ),
    dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf AS BIGINT) AS tf,
             CAST(dfreq.df AS BIGINT) AS df,
             CAST(tf.tf * n.n AS DOUBLE) / dfreq.df AS score
      FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, term) AS rn
      FROM scored
    )
    WHERE rn <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 distinguishing terms by TF-IDF. The IDF is
    the log-free rational form tf * N / df — order-equivalent to the
    log form for ranking within a document (log is monotone) while
    keeping every score an exact integer ratio, so ranks AND scores
    hash-match across engines. The keyword-extraction stage of corpus
    curation.

    SCALE: tf is a (doc, term) groupBy (one shuffle over the token
    stream); df aggregates tf's output (already one row per doc-term);
    N is a 1-row broadcast; top-k per doc is a window over tf-sized
    data partitioned on doc_id.
    """
    docs = t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy(F.col("term").alias("dterm")).agg(
        F.count(F.lit(1)).alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, tf.term == dfreq.dterm)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            ((F.col("tf") * F.col("n")).cast("double") / F.col("df")).alias(
                "score"
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "decontamination_overlap",
    oracle="""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws) - 6),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                      ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' ||
                      ws[i+6] || ' ' || ws[i+7])) AS shingle
        FROM ws WHERE len(ws) >= 8
      )
    ),
    eval_sh AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % 29 = 0
    ),
    train_sh AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 29 <> 0),
    hits AS (
      SELECT t.doc_id,
             COUNT(*) AS n_shingles,
             COUNT(e.shingle) AS n_hits
      FROM train_sh t LEFT JOIN eval_sh e ON t.shingle = e.shingle
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_shingles, 0) AS n_shingles,
           COALESCE(h.n_hits, 0) AS n_hits,
           COALESCE(h.n_hits, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 29 <> 0
    """,
)
def decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix-C style): flag every
    training document sharing an 8-word shingle with the held-out eval
    set (here the deterministic doc_id % 29 == 0 slice stands in for a
    benchmark suite). Output = per-train-doc shingle count, collision
    count, and the contaminated flag an exclusion list is built from.

    SCALE: eval suites are tiny (MMLU+GSM8K+... ≈ 10^5 shingles), so
    the distinct eval-shingle set is BROADCAST and the train side —
    the 100 TB side — is probed map-side with no shuffle; the only
    shuffle is the per-doc count aggregation keyed by doc_id (uniform).
    The shingle explode is map-side; nothing materializes n² state.
    """
    docs = t(spark, sf_dir, "documents")
    return _decon_flags(docs, _words_of(docs))


def _words_of(docs: DataFrame) -> DataFrame:
    """(doc_id, __ws words[]) — the one tokenization pass shared by
    every shingle-based stage (minhash n=3, decontamination n=8)."""
    return docs.select("doc_id", F.split(F.col("text"), " ").alias("__ws"))


def _decon_flags(docs: DataFrame, words: DataFrame) -> DataFrame:
    """decontamination_overlap core over a pre-tokenized words
    relation (shared with the curation composite)."""
    from matano_spark.operators.dedup import shingles_from_words

    sh = shingles_from_words(words, "doc_id", 8)
    is_eval = F.col("doc_id") % 29 == 0
    eval_sh = sh.filter(is_eval).select("shingle").distinct()
    train_sh = sh.filter(~is_eval)
    hits = (
        train_sh.join(
            F.broadcast(eval_sh.withColumn("hit", F.lit(1))),
            "shingle",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_hits"),
        )
    )
    return (
        docs.filter(~is_eval)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


@query(
    "corpus_sample_stratified",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {sql_poly_hash("text")}, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n_lang
      FROM documents
    )
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS sample_rank
    FROM ranked
    WHERE rn * 5 <= n_lang + 4
    """,
)
def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep the 20% of each language
    stratum with the smallest content hash. Content-hash ordering makes
    the sample (a) reproducible across runs/engines/partitionings and
    (b) consistent — a document's membership never changes when other
    strata grow. The standard down-sampling stage for rebalancing a
    multilingual corpus.

    SCALE: one shuffle partitioned by stratum. A window per-lang is
    safe when strata are coarse (≈10²) but each stratum lands on ONE
    reducer; at 100 TB swap the ROW_NUMBER for the equivalent
    hash-threshold filter (keep if hash < frac * P — map-only, no
    shuffle at all) once exact per-stratum counts aren't required.
    Both forms are content-deterministic; this query keeps the exact
    window form so the oracle checks rank logic too.
    """
    from matano_spark.operators.hashing import poly_hash

    docs = t(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(poly_hash(F.col("text")), "doc_id")
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("lang")).alias("n_lang"),
    )
    # rn <= ceil(n/5) in pure integer form (rn*5 <= n+4): float-free,
    # so the boundary row can never diverge between engines.
    return ranked.filter(
        F.col("rn") * 5 <= F.col("n_lang") + 4
    ).select("doc_id", "lang", F.col("rn").cast("bigint").alias("sample_rank"))


@query(
    "seq_packing_bins",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM toks
    )
    SELECT doc_id, lang, n_tokens,
           CAST(cum_before // 256 AS BIGINT) AS bin_first,
           CAST((cum_before + n_tokens - 1) // 256 AS BIGINT) AS bin_last
    FROM packed
    """,
)
def seq_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk): assign every document its
    span of fixed 256-token training sequences under per-language
    greedy concatenation in doc_id order — the packing strategy GPT-
    style pretraining uses to waste no context tokens. bin_first !=
    bin_last marks documents split across sequence boundaries.

    SCALE: the running sum is windowed PER STRATUM (lang), so packing
    is embarrassingly parallel across strata — no global total-order
    sort. At 100 TB the stratum key is (lang, shard) where shard is a
    coarse doc_id range: each shard packs independently and sequence
    ids are (shard, bin) pairs — identical plan, bounded reducer
    state. Integer token counts keep the oracle comparison exact.
    """
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return packed.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor(F.col("cum_before") / 256).alias("bin_first"),
        F.floor((F.col("cum_before") + F.col("n_tokens") - 1) / 256).alias(
            "bin_last"
        ),
    )


@query(
    "dedup_keep_list",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_sql_minhash_sigs()},
    {_sql_minhash_bands()},
    banded_capped AS (
      SELECT b.* FROM banded b
      JOIN (SELECT band_id, band_key FROM banded
            GROUP BY band_id, band_key HAVING COUNT(*) <= 1000) ok
      USING (band_id, band_key)
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded_capped a JOIN banded_capped b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    common AS (
      SELECT id_a, id_b, COUNT(*) AS n_common
      FROM cands
      JOIN shingles sa ON sa.doc_id = id_a
      JOIN shingles sb ON sb.doc_id = id_b AND sa.shingle = sb.shingle
      GROUP BY id_a, id_b
    ),
    pairs AS (
      SELECT id_a, id_b FROM common
      JOIN sizes za ON za.doc_id = id_a
      JOIN sizes zb ON zb.doc_id = id_b
      WHERE CAST(n_common AS DOUBLE) / (za.n + zb.n - n_common) >= 0.35
    ),
    sym AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach(node, lab) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
    ),
    clusters AS (
      SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
    ),
    exact AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
      FROM documents
    )
    SELECT d.doc_id,
           CASE WHEN e.keeper <> d.doc_id THEN 'exact_dup'
                WHEN c.cluster_id IS NOT NULL AND c.cluster_id <> d.doc_id
                  THEN 'near_dup'
                ELSE 'kept' END AS status
    FROM documents d
    JOIN exact e ON e.doc_id = d.doc_id
    LEFT JOIN clusters c ON c.doc_id = d.doc_id
    """,
)
def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's END PRODUCT: a per-document keep/drop
    verdict composing the exact and near-dup stages — 'exact_dup' when
    another doc with identical content has a smaller id, else
    'near_dup' when the doc sits in a MinHash cluster whose keeper
    (min id reachable through the near-dup relation) is someone else,
    else 'kept'. The list a training run actually consumes.

    SCALE: the exact stage is one window over the content hash
    (uniform key); the near-dup stage reuses the clustered pair set
    (operators.graph over capped LSH candidates); the final verdict is
    two joins on doc_id against corpus-sized relations — no new
    quadratic structure beyond the already-bounded candidate join.
    """
    docs = t(spark, sf_dir, "documents")
    return _keep_status(docs)


# The keeper rule shared by dedup_keep_list and the curation
# composite (single source of truth — a change here changes both, and
# both are pinned by their oracles): near-dup clusters come from the
# MinHash pair set at this threshold, a row survives iff it is its own
# exact keeper AND not claimed by a near-dup cluster rooted elsewhere.
KEEP_NEAR_DUP_THRESHOLD = 0.35


def _kept_predicate() -> Column:
    """True iff the row survives both dedup stages, evaluated against
    `keeper` (min doc_id over the content hash) and `cluster_id`
    (near-dup component, null when unclustered) columns."""
    return (F.col("keeper") == F.col("doc_id")) & (
        F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id"))
    )


def _keep_status(docs: DataFrame, words: DataFrame | None = None) -> DataFrame:
    """dedup_keep_list core; `words` shares one tokenization pass with
    the other shingle stages in a composite pipeline. A precomputed
    content-hash column `__h` (curation composite's one-scan base
    relation) is used when present so the fat text column never
    re-scans."""
    from matano_spark.operators.graph import connected_components

    # keeper is a window column on docs directly — no corpus-corpus
    # self-join for the exact stage (one shuffle on the content hash)
    h = F.col("__h") if "__h" in docs.columns else F.md5(F.col("text"))
    w = W.partitionBy(h)
    exact = docs.select(
        "doc_id", F.min("doc_id").over(w).alias("keeper")
    )
    pairs = D.minhash_near_dups(
        docs, "doc_id", "text", threshold=KEEP_NEAR_DUP_THRESHOLD, words_df=words
    ).select("id_a", "id_b")
    clusters = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    # kept-first is value-identical to the exact_dup/near_dup/kept
    # cascade: when _kept_predicate holds, neither of the other two
    # conditions can (keeper==doc_id excludes exact_dup; a null-or-self
    # cluster excludes near_dup).
    status = (
        F.when(_kept_predicate(), "kept")
        .when(F.col("keeper") != F.col("doc_id"), "exact_dup")
        .otherwise("near_dup")
    )
    return exact.join(clusters, "doc_id", "left").select(
        "doc_id", status.alias("status")
    )


@query(
    "corpus_mix_weights",
    oracle="""
    WITH toks AS (
      SELECT lang, SUM(len(string_split(text, ' '))) AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT SUM(n_tokens) AS total, COUNT(*) AS n_langs FROM toks)
    SELECT lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((n_tokens * 1000000) // total AS BIGINT) AS actual_share_micro,
           CAST(((1000000 // n_langs) * 1000000)
                // ((n_tokens * 1000000) // total) AS BIGINT) AS weight_micro
    FROM toks CROSS JOIN tot
    """,
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weights: per-stratum sampling multipliers that
    rebalance the corpus toward a target token distribution (uniform
    across languages here) — the static form of the mixture-tuning
    stage every multilingual pretraining run performs. weight > 1e6
    means upsample, < 1e6 downsample. All integer micro-unit math, so
    the weight table is bit-identical across engines.

    SCALE: ONE shuffle (token counts per stratum); the total is a
    1-row broadcast. The weight table is strata-sized (~10²) — it
    broadcasts back to the corpus for the actual resampling pass.
    """
    docs = t(spark, sf_dir, "documents")
    toks = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("n_tokens")
    )
    tot = toks.agg(
        F.sum("n_tokens").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
    )
    actual = F.expr("(n_tokens * 1000000L) div total")
    target = F.expr("1000000L div n_langs")
    return toks.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        actual.alias("actual_share_micro"),
        (
            F.expr(
                "((1000000L div n_langs) * 1000000L) div "
                "((n_tokens * 1000000L) div total)"
            )
        ).alias("weight_micro"),
    )


def _curation_quality_cols() -> tuple:
    """(quality_score, ws_tokens) columns computed from the __ws words
    array. Quality/token formulas recomputed EXACTLY from the words
    array (text == join(__ws, " ") roundtrip, so every char count
    below equals its text-side oracle formula integer-for-integer):
    keeps the curation checkpoint slim — only (__ws, __h, lang) ride
    along. Cached expression trees (fixed column names; a Column is an
    immutable tree resolved by name per plan), built once per process
    instead of once per query."""
    hit = getattr(_curation_quality_cols, "_memo", None)
    if hit is not None:
        return hit
    ws = F.col("__ws")
    n_words = F.size(ws).cast("bigint")
    chars_no_space = F.aggregate(
        ws, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
    )
    text_len = chars_no_space + F.size(ws).cast("bigint") - 1
    # punct count per word via translate (table lookup per char)
    # instead of a regex scan — identical count, see text_quality_score
    punct = F.aggregate(
        ws,
        F.lit(0).cast("bigint"),
        lambda a, w: a + (F.length(w) - F.length(F.translate(w, ".,;:!?", ""))),
    )
    stop = F.array(
        *[F.lit(w) for w in ("the", "and", "of", "a", "is", "in", "to", "it")]
    )
    q_points = (
        F.when(n_words.between(10, 100000), 4).otherwise(0)
        + F.when(
            (
                F.size(F.filter(ws, lambda w: F.array_contains(stop, w))).cast(
                    "double"
                )
                / F.size(ws)
            ).between(0.01, 0.6),
            3,
        ).otherwise(0)
        + F.when(punct.cast("double") / text_len < 0.2, 2).otherwise(0)
        + F.when(
            (chars_no_space.cast("double") / F.size(ws)).between(2.0, 12.0), 1
        ).otherwise(0)
    )
    memo = (
        (q_points.cast("double") / F.lit(10.0)).alias("quality_score"),
        n_words.alias("ws_tokens"),
    )
    _curation_quality_cols._memo = memo
    return memo


@query(
    "curation_pipeline_stats",
    oracle=None,  # composed below from the verified stage oracles
)
def curation_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CURATION pipeline as ONE composition of verified stages:
    eval-slice exclusion + decontamination → dedup keep-list ('kept'
    only) → quality filter (>= 0.5) → per-language corpus totals. The
    number a data team actually reports: what survives into training,
    by stratum. Both sides compose the SAME verified building blocks,
    so the composite checks stage WIRING, not just stages.
    """
    docs = t(spark, sf_dir, "documents")
    # ONE scan of documents feeds EVERY stage: the raw text is read
    # once and projected into (words, content hash, quality points,
    # ws_tokens, lang) in a single map, then localCheckpoint'ed — the
    # shingle stages (decon n=8, minhash n=3), the exact-dup window,
    # the quality gate and the token totals all run off this slim
    # relation, so the fat text column never re-scans (r7/r8 residual:
    # quality + token stages re-read the parquet). Stage SEMANTICS are
    # the same verified expressions the standalone queries compile
    # (identical quality/ws_tokens formulas — oracle composes their
    # stage SQL unchanged).
    # spread_partitions: a one-split parquet input would otherwise pin
    # every downstream shingle/signature map to a single core.
    # LAZY: the minhash candidate pass is the first consumer and
    # materializes the checkpoint in its own job (eager paid a
    # dedicated corpus-tokenization job first).
    base = D.spread_partitions(
        docs.select(
            "doc_id",
            "lang",
            F.split(F.col("text"), " ").alias("__ws"),
            F.md5(F.col("text")).alias("__h"),
        )
    ).localCheckpoint(eager=False)
    words = base.select("doc_id", "__ws")
    base = base.select("*", *_curation_quality_cols())
    # Decon stage, survivor-set form: the composite needs only the
    # UNcontaminated doc ids, so skip _decon_flags' full left-join +
    # two-count aggregation over the whole exploded shingle stream
    # (guide §2.3 aggregate-less when existence suffices): inner
    # broadcast probe emits ONLY hit rows (contamination is rare by
    # construction), distinct over that sliver, anti-join it away.
    # Same semantics: a doc is contaminated iff ≥1 of its 8-shingles
    # is in the eval set; docs with <8 words have no shingles, hence
    # no hits, hence survive — exactly coalesce(n_hits,0)=0.
    sh8 = D.shingles_from_words(words, "doc_id", 8)
    is_eval = F.col("doc_id") % 29 == 0
    # No distinct on either side: `contaminated` feeds ONLY a left_anti
    # join, which ignores right-side duplicates, and the broadcast hash
    # relation tolerates duplicate eval shingles (shingles are already
    # distinct PER DOC, so cross-doc duplication is the only residue).
    # Each dropped distinct was a full exchange + aggregation.
    eval_sh = sh8.filter(is_eval).select("shingle")
    contaminated = (
        sh8.filter(~is_eval)
        .join(F.broadcast(eval_sh), "shingle")
        .select("doc_id")
    )
    # Keep-status INLINE on base instead of joining the corpus-sized
    # keep list back onto the corpus-sized survivor set (guide §2.4 —
    # establish the partitioning once): the exact-dup keeper is a
    # window over the content hash computed directly on the slim base
    # projection (__ws dropped first, so the window exchange carries
    # ~40 B/row), and the near-dup clusters attach with the same small
    # left join _keep_status used. One corpus×corpus equi-join (two
    # exchanges + shuffled-hash join) disappears; the window must run
    # BEFORE the eval/quality filters because the keeper is the min
    # over ALL copies, filtered or not (oracle: keep list over the
    # full corpus, filters applied after).
    from matano_spark.operators.graph import connected_components

    pairs = D.minhash_near_dups(
        base, "doc_id", "text", threshold=KEEP_NEAR_DUP_THRESHOLD, words_df=words
    ).select("id_a", "id_b")
    clusters = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    wk = W.partitionBy("__h")
    # the keeper rule is the SHARED predicate _keep_status evaluates
    # (single source of truth — see KEEP_NEAR_DUP_THRESHOLD)
    kept_row = _kept_predicate()
    survivors = (
        base.select("doc_id", "lang", "ws_tokens", "quality_score", "__h")
        .withColumn("keeper", F.min("doc_id").over(wk))
        .join(clusters, "doc_id", "left")
        .filter(~is_eval)
        .filter(F.col("quality_score") >= 0.5)
        .filter(kept_row)
        .select("doc_id", "lang", "ws_tokens")
        .join(contaminated, "doc_id", "left_anti")
    )
    return (
        survivors.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").cast("bigint").alias("total_ws_tokens"),
        )
    )


_REG["curation_pipeline_stats"].oracle = f"""
    WITH decon AS ({_oracle_of("decontamination_overlap")}),
    keep AS ({_oracle_of("dedup_keep_list")}),
    quality AS ({_oracle_of("text_quality_score")}),
    tokens AS ({_oracle_of("text_token_stats")})
    SELECT d.lang,
           COUNT(*) AS n_docs,
           CAST(SUM(tokens.ws_tokens) AS BIGINT) AS total_ws_tokens
    FROM decon
    JOIN keep ON keep.doc_id = decon.doc_id AND keep.status = 'kept'
    JOIN quality ON quality.doc_id = decon.doc_id
               AND quality.quality_score >= 0.5
    JOIN tokens ON tokens.doc_id = decon.doc_id
    JOIN documents d ON d.doc_id = decon.doc_id
    WHERE NOT decon.contaminated
    GROUP BY d.lang
"""


@query(
    "dedup_span_duplication",
    front=True,
    oracle="""
    WITH words AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    spans AS (
      SELECT lang,
             unnest([md5(array_to_string(w[(i*10+1):(i*10+10)], ' '))
                     for i in range(0, CAST(floor(len(w)/10.0) AS BIGINT))])
               AS span
      FROM words
    ),
    counted AS (
      SELECT lang, span, COUNT(*) AS n FROM spans GROUP BY 1, 2
    )
    SELECT lang,
           CAST(SUM(n) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           CAST(COUNT(CASE WHEN n >= 2 THEN 1 END) AS BIGINT)
             AS n_distinct_dup
    FROM counted
    GROUP BY 1
    """,
)
def dedup_span_duplication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplication profile (the C4/RefinedWeb paragraph-
    dedup shape, on word windows since the synthetic docs are
    single-paragraph): split each doc into non-overlapping 10-word
    spans, count within-language duplicate spans, report per-language
    totals. Scale shape: spans reduce by their md5 (fixed-width
    shuffle key, never the raw text), one partial-agg shuffle on
    (lang, span-hash) then a tiny per-lang rollup — the document side
    is scanned once and the span explosion is map-side."""
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_spans = F.floor(F.size(words) / F.lit(10.0)).cast("int")
    spans = docs.select(
        F.col("lang"),
        F.explode(
            F.when(
                n_spans >= 1,
                F.transform(
                    F.sequence(F.lit(0), n_spans - 1),
                    lambda i: F.md5(
                        F.array_join(F.slice(words, i * 10 + 1, 10), " ")
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("span"),
    )
    counted = spans.groupBy("lang", "span").agg(F.count(F.lit(1)).alias("n"))
    return counted.groupBy("lang").agg(
        F.sum("n").alias("n_spans"),
        F.sum(F.when(F.col("n") >= 2, F.col("n")).otherwise(0)).alias(
            "n_dup_spans"
        ),
        F.count(F.when(F.col("n") >= 2, F.lit(1))).alias("n_distinct_dup"),
    )
