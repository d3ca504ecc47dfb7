"""Operator-level tests for dedup (SURVEY.md §5 strategy: golden
fixtures + property checks the SQL oracle can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from matano_spark.operators import dedup as D
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_exact_dedup_groups_synthetic(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa")], ["doc_id", "text"]
    )
    out = {
        r["keeper_doc_id"]: r["n_copies"]
        for r in D.exact_dedup_groups(df, "doc_id", "text").collect()
    }
    assert out == {1: 3, 2: 1}


def test_minhash_lsh_recall_vs_exact(spark):
    """Every exact-Jaccard>=0.5 pair must be recovered by MinHash-LSH
    (candidates are approximate; at 0.5+ similarity with 4 bands of 2
    the miss probability is (1-s^2)^4 <= 0.32 per pair — the seeded
    test corpus duplicates sit far above 0.9 where misses vanish)."""
    docs = _docs(spark)
    shingles = D.word_shingles(docs, "doc_id", "text")
    # exact ground truth via full inverted-index join
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = shingles.alias("a"), shingles.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    za, zb = sizes.alias("za"), sizes.alias("zb")
    exact = (
        common.join(za, F.col("za.doc_id") == F.col("id_a"))
        .join(zb, F.col("zb.doc_id") == F.col("id_b"))
        .withColumn("j", F.col("c") / (F.col("za.n") + F.col("zb.n") - F.col("c")))
        .filter(F.col("j") >= 0.5)
        .select("id_a", "id_b")
        .collect()
    )
    exact_pairs = {(r.id_a, r.id_b) for r in exact}
    assert exact_pairs, "fixture should contain near-duplicate documents"

    found = D.minhash_near_dups(docs, "doc_id", "text", threshold=0.5).collect()
    found_pairs = {(r.id_a, r.id_b) for r in found}
    missed = exact_pairs - found_pairs
    assert not missed, f"LSH missed high-similarity pairs: {missed}"
    # verification stage guarantees no false positives
    assert found_pairs <= exact_pairs


def test_simhash_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words entirely unrelated text corpus"),
        ],
        ["doc_id", "text"],
    )
    out = D.simhash_near_dups(df, "doc_id", "text", max_hamming=0).collect()
    assert {(r.id_a, r.id_b, r.hamming) for r in out} == {(1, 2, 0)}


def test_word_shingles_short_doc(spark):
    """Docs with fewer than n words must produce no shingles (not
    garbage from negative sequence ranges)."""
    df = spark.createDataFrame(
        [(1, "one two"), (2, "one two three four")], ["doc_id", "text"]
    )
    out = D.word_shingles(df, "doc_id", "text", n=3).collect()
    got = {(r.doc_id, r.shingle) for r in out}
    assert got == {(2, "one two three"), (2, "two three four")}


def test_connected_components_chain_and_islands(spark):
    """A 5-node chain (diameter 4, needs several propagation rounds),
    a triangle, and an isolated pair — all must converge to min-id
    components."""
    from matano_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),        # chain
         (10, 11), (11, 12), (10, 12),          # triangle
         (20, 21)],                              # pair
        "id_a long, id_b long",
    )
    comp = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                    10: 10, 11: 10, 12: 10,
                    20: 20, 21: 20}


def test_connected_components_long_chain_logarithmic(spark):
    """Pointer-doubling shortcut: a 10k-node chain (diameter 9999)
    converges in O(log n) rounds — well under 25 — where plain
    label propagation would need ~10k rounds."""
    from matano_spark.operators.graph import connected_components

    n = 10_000
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    ).coalesce(4)
    labels = connected_components(edges, max_rounds=25)
    assert labels.filter(F.col("component") != 0).count() == 0
    assert labels.count() == n


def test_connected_components_round_guard(spark):
    from matano_spark.operators.graph import connected_components
    import pytest as _pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=2)
