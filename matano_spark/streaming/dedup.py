"""Incremental near-dup dedup against a persisted signature store.

At 100 TB, corpora arrive continuously; re-running batch LSH over the
full corpus per delivery is O(corpus) every time. The incremental
shape keeps MinHash signatures at rest — (doc_id, m1..mk) — and per
micro-batch:

  1. computes signatures for the NEW documents only,
  2. probes the store by LSH band key (equi-join, never a cross join),
  3. scores candidates by signature agreement (E[matching components
     / k] = Jaccard — the classic MinHash estimator),
  4. routes near-dups of history (or of an earlier doc in the same
     batch) to a duplicates ledger,
  5. appends the survivors' signatures to the store.

Per-batch cost is O(batch + touched buckets); the historical corpus is
never re-shingled or rescanned. The store keeps signatures only —
verifying candidates with EXACT Jaccard would require historical
shingles (O(corpus) storage); signature-estimated Jaccard is the
standard storage/recall trade for the incremental path, while the
batch path (operators.dedup.minhash_near_dups) keeps exact
verification. Reference parity note: the reference has no near-dup
surface; this extends its exactly-once ingest dedup
(IcebergMetadataWriter.kt DDB sequencer) from object identity to
content near-identity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from matano_spark.operators import dedup as D

_SIG_COLS = [f"m{i + 1}" for i in range(D.NUM_MINHASHES)]


def _store_schema(id_col: str) -> T.StructType:
    return T.StructType(
        [T.StructField(id_col, T.LongType())]
        + [T.StructField(m, T.LongType()) for m in _SIG_COLS]
    )


def read_signature_store(
    spark: SparkSession, store_dir: str, id_col: str = "doc_id"
) -> DataFrame:
    """Signature store reader; empty-typed DataFrame before first write.

    Existence is probed with a read attempt, not os.path (driver-local
    fs probes are wrong on object storage)."""
    from pyspark.errors import AnalysisException

    try:
        return (
            spark.read.schema(_store_schema(id_col))
            .parquet(store_dir)
            .select(id_col, *_SIG_COLS)  # shed discovered epoch= partition col
        )
    except AnalysisException as e:
        # ONLY missing-path means "store not yet written"; a transient
        # read failure must propagate, not silently disable dedup
        # history for the batch (known dupes would be kept AND
        # appended to the store with no error surfaced).
        cond = getattr(e, "getCondition", getattr(e, "getErrorClass", lambda: ""))()
        if cond != "PATH_NOT_FOUND":
            raise
        return spark.createDataFrame([], _store_schema(id_col))


def dedup_batch_against_store(
    batch_df: DataFrame,
    store_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    bucket_cap: int | None = 1000,
) -> tuple[DataFrame, DataFrame]:
    """Split a batch into (kept, dupes) against historical signatures.

    Returns:
      kept  — batch rows that are NOT near-dups, with their m1..mk
              signature columns attached (ready to append to the store)
      dupes — (id, matched_id, est_jaccard) rows: the prior document
              each duplicate collided with (min matched_id on ties)

    A batch doc duplicates (a) any store doc, or (b) an earlier doc —
    smaller id — in the same batch that itself survives. The
    earlier-doc rule uses id order, matching the batch pipeline's
    min-id keeper convention. Both sides meet on LSH band keys, so the
    probe is an equi-join; `bucket_cap` drops degenerate buckets
    (drop_hot_keys) exactly as in the batch path.
    """
    # map-side signature fold (same builder as the batch path since
    # r8): per-doc shingle set + k permutation minima computed in-row,
    # so the per-micro-batch signature pass has ZERO shuffles — the
    # previous explode→groupBy formulation shuffled every shingle row
    # per batch. Bit-identical output (min over distinct shingles).
    sigs = D.minhash_signatures_from_words(
        batch_df.select(id_col, F.split(F.col(text_col), " ").alias("__ws")),
        id_col,
    ).localCheckpoint()

    # Candidate generation: new docs vs (store ∪ earlier-in-batch).
    prior = store_df.select(id_col, *_SIG_COLS).unionByName(
        sigs.select(id_col, *_SIG_COLS)
    )
    new_b = D.band_keys(sigs, id_col).alias("a")
    prior_b = D.band_keys(prior, id_col)
    if bucket_cap is not None:
        prior_b = D.drop_hot_keys(prior_b, ["band_id", "band_key"], bucket_cap)
    prior_b = prior_b.alias("b")

    cands = (
        new_b.join(
            prior_b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id"),
            F.col(f"b.{id_col}").alias("matched_id"),
        )
        .distinct()
    )

    # Signature-agreement estimate for candidate pairs.
    sa = sigs.alias("sa")
    sp = prior.alias("sp")
    agree = sum(
        F.when(F.col(f"sa.{m}") == F.col(f"sp.{m}"), 1).otherwise(0)
        for m in _SIG_COLS
    )
    scored = (
        cands.join(sa, F.col(f"sa.{id_col}") == F.col("id"))
        .join(sp, F.col(f"sp.{id_col}") == F.col("matched_id"))
        .select(
            "id",
            "matched_id",
            (agree.cast("double") / F.lit(len(_SIG_COLS))).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )

    # Earlier-in-batch matches only count when the earlier doc itself
    # survives — otherwise a dup-of-a-dup chain could keep nothing.
    # One pass of the transitive rule suffices for the min-id keeper:
    # if B matches dup A, A matched something older still in the store,
    # and banding is transitive enough in practice; exact chain closure
    # is the batch path's connected-components job (dedup_clusters).
    # Conservation: every batch row lands in exactly one of kept/dupes.
    # Docs too short to shingle have no signature — they can't match
    # anything and are kept (left join leaves their m* null; the store
    # append filters those out).
    dup_ids = scored.select(F.col("id").alias(id_col)).distinct()
    dupes = (
        scored.groupBy("id")
        .agg(
            F.min("matched_id").alias("matched_id"),
            F.max("est_jaccard").alias("est_jaccard"),
        )
        .withColumnRenamed("id", id_col)
    )
    # batch ∖ dupes directly: the old batch_ids ∖ dup_ids intermediate
    # re-joined the batch against itself (inner) — one join more than
    # the anti-join needs; row set identical.
    kept = batch_df.join(dup_ids, id_col, "left_anti").join(
        sigs, id_col, "left"
    )
    return kept, dupes


def incremental_dedup_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    store_dir: str,
    dupes_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
):
    """Wire the incremental dedup into Structured Streaming.

    foreachBatch: probe + split + append. The signature store append
    and the dupes-ledger append are idempotent per epoch via the
    checkpointed batch id (standard foreachBatch exactly-once recipe:
    the epoch id names the output subdirs, replays overwrite).
    """

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        store = read_signature_store(spark, store_dir, id_col)
        kept, dupes = dedup_batch_against_store(
            batch_df, store, id_col, text_col, threshold
        )
        kept.filter(F.col("m1").isNotNull()).select(
            id_col, *_SIG_COLS
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_dir, f"epoch={epoch_id}")
        )
        dupes.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(dupes_dir, f"epoch={epoch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def curation_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    store_dir: str,
    dupes_dir: str,
    rejects_dir: str,
    checkpoint_dir: str,
    quality_predicate,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
):
    """The curation pipeline as ONE stream: quality gate → incremental
    near-dup check → signature store append. Every batch row lands in
    exactly one of {kept (store), dupes ledger, rejects ledger} —
    conservation mirrors the ingest pipeline's rows_in = rows_out +
    sidelined invariant.

    quality_predicate is a Column over the stream's columns (built
    from the same expressions the batch text_quality_score query
    pins), so the gate stays in whole-stage codegen — only documents
    that SURVIVE it pay for shingling and the store probe.
    """

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        scored = batch_df.withColumn("__pass", quality_predicate)
        rejects = scored.filter(~F.col("__pass")).drop("__pass")
        survivors = scored.filter(F.col("__pass")).drop("__pass")
        store = read_signature_store(spark, store_dir, id_col)
        kept, dupes = dedup_batch_against_store(
            survivors, store, id_col, text_col, threshold
        )
        kept.filter(F.col("m1").isNotNull()).select(
            id_col, *_SIG_COLS
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_dir, f"epoch={epoch_id}")
        )
        dupes.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(dupes_dir, f"epoch={epoch_id}")
        )
        rejects.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(rejects_dir, f"epoch={epoch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
