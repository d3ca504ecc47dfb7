"""Incremental near-dup dedup: signature store grows per batch, later
copies of earlier content are routed to the dupes ledger, the corpus is
never rescanned."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from matano_spark.streaming.dedup import (
    dedup_batch_against_store,
    incremental_dedup_stream,
    read_signature_store,
)

DOC_A = "the quick brown fox jumps over the lazy dog again and again"
DOC_B = "spark shuffles hash partitions across the executor fleet tonight"
DOC_C = "completely different content about parquet footers and stats"
SHORT = "tiny"  # < 3 words: no shingles, must be kept, never stored


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_batch_split_against_empty_then_loaded_store(spark):
    store = read_signature_store(spark, "/nonexistent/dir")
    assert store.count() == 0

    b1 = _df(spark, [(1, DOC_A), (2, DOC_B), (3, SHORT)])
    kept1, dupes1 = dedup_batch_against_store(b1, store)
    assert dupes1.count() == 0
    assert {r["doc_id"] for r in kept1.collect()} == {1, 2, 3}
    # short doc kept but has no signature
    assert kept1.filter(F.col("doc_id") == 3).first()["m1"] is None

    # batch 2: verbatim copy of A, near-copy of B, and novel C
    near_b = DOC_B.replace("tonight", "today")
    b2 = _df(spark, [(10, DOC_A), (11, near_b), (12, DOC_C)])
    store2 = kept1.filter(F.col("m1").isNotNull()).select(
        "doc_id", *[f"m{i}" for i in range(1, 9)]
    )
    kept2, dupes2 = dedup_batch_against_store(b2, store2)
    d = {r["doc_id"]: r for r in dupes2.collect()}
    assert 10 in d and d[10]["matched_id"] == 1
    assert d[10]["est_jaccard"] == 1.0  # verbatim copy agrees on all k
    assert 12 not in d  # novel doc survives
    kept_ids = {r["doc_id"] for r in kept2.collect()}
    assert 12 in kept_ids and 10 not in kept_ids


def test_intra_batch_duplicate_keeps_min_id(spark):
    store = read_signature_store(spark, "/nonexistent/dir")
    b = _df(spark, [(5, DOC_A), (9, DOC_A)])
    kept, dupes = dedup_batch_against_store(b, store)
    assert {r["doc_id"] for r in kept.collect()} == {5}
    row = dupes.first()
    assert (row["doc_id"], row["matched_id"]) == (9, 5)


def test_incremental_stream_two_deliveries(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    store_dir = str(tmp_path / "sigstore")
    dupes_dir = str(tmp_path / "dupes")
    ckpt = str(tmp_path / "ckpt")

    def deliver(name, rows):
        with open(src / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    schema = "doc_id LONG, text STRING"
    deliver("b1.jsonl", [(1, DOC_A), (2, DOC_B)])
    stream = spark.readStream.schema(schema).json(str(src))
    q = incremental_dedup_stream(
        spark, stream, store_dir, dupes_dir, ckpt
    )
    q.awaitTermination(120)

    store = read_signature_store(spark, store_dir)
    assert store.count() == 2

    # second delivery: one copy, one novel — resume from checkpoint
    deliver("b2.jsonl", [(20, DOC_A), (21, DOC_C)])
    stream = spark.readStream.schema(schema).json(str(src))
    q = incremental_dedup_stream(
        spark, stream, store_dir, dupes_dir, ckpt
    )
    q.awaitTermination(120)

    store = read_signature_store(spark, store_dir)
    assert {r["doc_id"] for r in store.collect()} == {1, 2, 21}
    dupes = spark.read.parquet(dupes_dir)
    d = {r["doc_id"]: r["matched_id"] for r in dupes.collect()}
    assert d == {20: 1}
    assert os.path.isdir(os.path.join(store_dir, "epoch=1"))


def test_curation_stream_quality_gate_plus_dedup(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    dirs = {k: str(tmp_path / k) for k in ("store", "dupes", "rejects", "ckpt")}

    rows = [
        (1, DOC_A),               # kept
        (2, "bad"),               # rejected: too short
        (3, DOC_A + " extended"), # near-dup of 1 (high overlap)
        (4, DOC_C),               # kept
    ]
    with open(src / "b1.jsonl", "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    from matano_spark.streaming.dedup import curation_stream

    stream = spark.readStream.schema("doc_id LONG, text STRING").json(str(src))
    pred = F.size(F.split(F.col("text"), " ")) >= 5
    q = curation_stream(
        spark, stream, dirs["store"], dirs["dupes"], dirs["rejects"],
        dirs["ckpt"], pred, threshold=0.5,
    )
    q.awaitTermination(120)

    store = {r["doc_id"] for r in read_signature_store(spark, dirs["store"]).collect()}
    dupes = {r["doc_id"]: r["matched_id"] for r in spark.read.parquet(dirs["dupes"]).collect()}
    rejects = {r["doc_id"] for r in spark.read.parquet(dirs["rejects"]).collect()}
    assert rejects == {2}
    assert dupes == {3: 1}
    assert store == {1, 4}
    # conservation: every input row in exactly one output
    assert store | set(dupes) | rejects == {1, 2, 3, 4}
