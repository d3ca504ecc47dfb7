"""Similarity-search operator tests: exactness of the brute-force
baseline and recall/consistency of the LSH scale path."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from matano_spark.operators import similarity as S
from tests.conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_cosine_topk_matches_python_reference(spark):
    emb = _emb(spark)
    rows = {r.vec_id: r.embedding for r in emb.collect()}
    queries = emb.filter(F.col("vec_id") < 3)
    out = S.cosine_topk(emb, queries, "vec_id", "embedding", k=3).collect()

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return d / (na * nb)

    for qid in (0, 1, 2):
        expect = sorted(
            ((cos(rows[qid], v), -nid) for nid, v in rows.items() if nid != qid),
            reverse=True,
        )[:3]
        got = sorted(
            (r.cosine, -r.neighbor_id) for r in out if r.query_id == qid
        )[::-1]
        for (ec, eid), (gc, gid) in zip(expect, got):
            assert abs(ec - gc) < 1e-9 and eid == gid


def test_lsh_topk_consistent_with_bruteforce(spark):
    """Every LSH hit must carry the same cosine as brute force computes
    for that pair, and per-query results must be <= k."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    brute = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in S.cosine_topk(emb, queries, "vec_id", "embedding", k=1000).collect()
    }
    lsh = S.lsh_topk(emb, queries, "vec_id", "embedding", k=5).collect()
    per_q = {}
    for r in lsh:
        per_q.setdefault(r.query_id, []).append(r)
        key = (r.query_id, r.neighbor_id)
        assert key in brute and abs(brute[key] - r.cosine) < 1e-12
    assert all(len(v) <= 5 for v in per_q.values())


def test_embedding_near_dups_symmetric_and_thresholded(spark):
    emb = _emb(spark)
    out = S.embedding_near_dups(emb, "vec_id", "embedding", threshold=0.2).collect()
    assert out, "threshold 0.2 should produce pairs on the fixture"
    for r in out:
        assert r.id_a < r.id_b
        assert r.cosine >= 0.2


def test_ivf_topk_consistent_with_bruteforce(spark):
    """Every IVF hit carries the exact brute-force cosine for that
    pair; per-query results <= k; and recall against brute-force top-5
    is non-trivial (the 4-of-16-cell probe finds most true neighbors)."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    brute_all = S.cosine_topk(emb, queries, "vec_id", "embedding", k=1000).collect()
    brute = {(r.query_id, r.neighbor_id): r.cosine for r in brute_all}
    top5 = {
        qid: {r.neighbor_id for r in brute_all if r.query_id == qid and r.rank <= 5}
        for qid in range(5)
    }
    ivf = S.ivf_topk(emb, queries, "vec_id", "embedding", k=5).collect()
    per_q = {}
    for r in ivf:
        per_q.setdefault(r.query_id, set()).add(r.neighbor_id)
        key = (r.query_id, r.neighbor_id)
        assert key in brute and abs(brute[key] - r.cosine) < 1e-12
    assert all(len(v) <= 5 for v in per_q.values())
    hits = sum(len(per_q.get(q, set()) & top5[q]) for q in range(5))
    assert hits >= 10, f"IVF recall collapsed: {hits}/25 true top-5 found"


def test_ivf_assignment_partitions_corpus(spark):
    """Each corpus vector lands in exactly one cell and every cell id
    is one of the 16 lowest vec_ids (the deterministic codebook)."""
    emb = _emb(spark)
    cents = emb.orderBy("vec_id").limit(S.N_CENTROIDS)
    c = (
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cvec"),
            S.norm(F.col("embedding")).alias("cnorm"),
        )
        .crossJoin(F.broadcast(S._codebook(emb, "vec_id", "embedding", S.N_CENTROIDS)))
        .withColumn(
            "cell",
            F.element_at(
                S._cells_by_affinity(F.col("cvec"), F.col("cnorm")), 1
            )["cid"],
        )
    )
    cells = {r.cell for r in c.select("cell").distinct().collect()}
    valid = {r.vec_id for r in cents.collect()}
    assert cells <= valid
    assert c.count() == emb.count()
