"""Bit-parity of the Arrow+NumPy text-hash kernels (operators.nptext)
against the JVM expression implementations they replace in the batch
dedup paths (r10). Covers the vectorized ASCII fast path AND the exact
per-row fallbacks (non-ASCII, astral codepoints, nulls, empty/repeated
tokens, oversized tokens, sub-n word counts)."""

from pyspark.sql import functions as F

from matano_spark.operators import dedup as D
from matano_spark.operators import nptext as NT

EDGE_TEXTS = [
    (1, ""),
    (2, "a"),
    (3, "a "),
    (4, " a"),
    (5, "a  b"),
    (6, "x " * 50),
    (7, "héllo wörld plus ascii"),
    (8, "κόσμε x"),
    (9, "a\U0001d11eb c"),
    (10, "same same same diff"),
    (11, None),
    (12, "z" * 600 + " tail"),
    (13, "tab\tsep and more words here"),
    (14, "one two three four five six seven"),
]


def _ascii_corpus(spark, n=200):
    # deterministic pseudo-corpus with repeated words/shingles
    rows = [
        (i, " ".join(f"w{(i * 7 + j * 3) % 23}" for j in range(5 + i % 9)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_np_simhash_parity_ascii_and_edges(spark):
    for df in (_ascii_corpus(spark), spark.createDataFrame(EDGE_TEXTS, ["doc_id", "text"])):
        a = {r[0]: tuple(r[1:]) for r in D.simhash_fingerprint(df, "doc_id", "text").collect()}
        b = {
            r[0]: tuple(r[1:])
            for r in NT.np_simhash_fingerprint(
                df, "doc_id", "text", D.SIMHASH_A, D.SIMHASH_B, D.SIMHASH_CHUNK_BITS
            ).collect()
        }
        assert a == b


def test_np_minhash_parity_ascii_and_edges(spark):
    edge = [(i, t) for i, t in EDGE_TEXTS]
    for df in (_ascii_corpus(spark), spark.createDataFrame(edge, ["doc_id", "text"])):
        words = df.select("doc_id", F.split(F.col("text"), " ").alias("__ws"))
        a = {
            r[0]: tuple(r[1:])
            for r in D.minhash_signatures_from_words(words, "doc_id").collect()
        }
        b = {
            r[0]: tuple(r[1:])
            for r in NT.np_minhash_signatures_from_words(words, "doc_id").collect()
        }
        assert a == b  # includes identical kept-row sets (<3 words dropped)


def test_simhash_near_dups_pairs_unchanged(spark):
    # end-to-end: the routed kernel yields the same pair set as the
    # all-JVM path on a corpus with real near-dups
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base) for i in range(4)] + [
        (10, base.replace("gamma", "gamma2")),
        (11, "totally different words here nothing shared at all ok"),
        (12, None),
    ]
    rows = [(i, t) for i, t in rows if t is not None] + [(12, "x y")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        tuple(r) for r in D.simhash_near_dups(df, "doc_id", "text").collect()
    )
    fps = D.simhash_fingerprint(df, "doc_id", "text").collect()
    by_id = {r[0]: tuple(r[1:]) for r in fps}
    want = []
    ids = sorted(by_id)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = sum(bin(x ^ y).count("1") for x, y in zip(by_id[a], by_id[b]))
            if ham <= 3 and any(x == y for x, y in zip(by_id[a], by_id[b])):
                want.append((a, b, ham))
    assert got == sorted(want)
