"""Salting utilities: results identical to unsalted operators on a
deliberately skewed key distribution (90% one key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from matano_spark.operators.skew import salted_collect_set, salted_join


def _skewed(spark):
    return spark.range(0, 10000).select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("HOT", "hot-dim"), ("k3", "k3-dim"), ("k7", "k7-dim")], ["k", "dim"]
    )
    plain = big.join(small, "k").groupBy("k", "dim").count()
    salted = salted_join(big, small, "k", salt_factor=8).groupBy("k", "dim").count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed(spark).limit(100)
    small = spark.createDataFrame([("HOT", "d")], ["k", "dim"])
    out = salted_join(big, small, "k", salt_factor=4, how="left")
    plain = big.join(small, "k", "left")
    assert out.count() == plain.count()
    assert out.filter(F.col("dim").isNull()).count() == plain.filter(
        F.col("dim").isNull()
    ).count()


def test_salted_collect_set_equals_direct(spark):
    df = _skewed(spark).withColumn("val", (F.col("v") % 50).cast("string"))
    direct = {
        r.k: sorted(r.vals)
        for r in df.groupBy("k").agg(F.collect_set("val").alias("vals")).collect()
    }
    salted = {
        r.k: list(r.values)
        for r in salted_collect_set(df, "k", "val", salt_factor=8).collect()
    }
    assert salted == direct


def test_drop_hot_keys_bounds_stop_shingle_blowup(spark):
    """One stop-shingle in 80% of docs: uncapped, it alone contributes
    C(80,2)=3160 pairs to the inverted-index self-join; with the df-cap
    the pair count is bounded by the rare shingles only."""
    from matano_spark.operators.dedup import drop_hot_keys

    rows = []
    for i in range(100):
        rows.append((i, "the quick brown"))  # doc_id, rare marker shingle
    # shingle relation: every doc has a unique shingle; 80 share a hot one
    shingles = [(i, f"uniq shingle {i}") for i in range(100)]
    shingles += [(i, "hot stop shingle") for i in range(80)]
    df = spark.createDataFrame(shingles, ["doc_id", "shingle"])

    capped = drop_hot_keys(df, ["shingle"], cap=10)
    assert capped.count() == 100  # the 80 hot rows dropped, uniques kept
    assert capped.filter(F.col("shingle") == "hot stop shingle").count() == 0

    a, b = capped.alias("a"), capped.alias("b")
    pairs = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    assert pairs.count() == 0  # uniques collide with nobody

    # the hot-key list side of the anti-join must be broadcast
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_minhash_bucket_cap_bounds_degenerate_bucket(spark):
    """200 identical docs collapse into one LSH bucket per band; with
    bucket_cap below 200 the candidate join yields zero pairs instead
    of 4·C(200,2) — completing instead of exploding."""
    from matano_spark.operators.dedup import minhash_near_dups

    docs = [(i, "same text everywhere for all docs here now") for i in range(200)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = minhash_near_dups(df, "doc_id", "text", bucket_cap=50)
    assert out.count() == 0
    uncapped = minhash_near_dups(df, "doc_id", "text", bucket_cap=None)
    assert uncapped.count() == 200 * 199 // 2


def test_simhash_bucket_cap_bounds_degenerate_corpus(spark):
    """A boilerplate corpus collapses to one fingerprint — every chunk
    bucket holds all docs. With the cap the banded self-join emits zero
    candidates; uncapped it would be 4·C(n,2)."""
    from matano_spark.operators.dedup import simhash_near_dups

    docs = [(i, "identical boilerplate text in every document") for i in range(120)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    capped = simhash_near_dups(df, "doc_id", "text", bucket_cap=50)
    assert capped.count() == 0
    uncapped = simhash_near_dups(df, "doc_id", "text", bucket_cap=None)
    assert uncapped.count() == 120 * 119 // 2


def test_embedding_bucket_cap_bounds_degenerate_encoder(spark):
    """1k identical vectors (broken encoder) land in one LSH bucket.
    The cap drops that bucket: near-dup join emits zero pairs and the
    ANN probe returns no candidates, instead of bucket_size² work."""
    from matano_spark.operators.similarity import embedding_near_dups, lsh_topk

    vec = [0.1, 0.2, 0.3, 0.4]
    df = spark.createDataFrame(
        [(i, vec) for i in range(1000)], ["vec_id", "embedding"]
    )
    pairs = embedding_near_dups(
        df, "vec_id", "embedding", threshold=0.5, bucket_cap=100
    )
    assert pairs.count() == 0

    queries = df.filter(F.col("vec_id") < 3)
    topk = lsh_topk(df, queries, "vec_id", "embedding", k=5, bucket_cap=100)
    assert topk.count() == 0

    # sanity: a healthy (sub-cap) corpus still produces pairs/candidates
    small = df.filter(F.col("vec_id") < 50)
    assert embedding_near_dups(
        small, "vec_id", "embedding", threshold=0.5, bucket_cap=100
    ).count() == 50 * 49 // 2
