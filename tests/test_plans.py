"""Physical-plan regression tests — the scale contract (100 TB):
filters must reach the parquet scan, dimension joins must broadcast
(never sort-merge), and corpus-side relations must not be broadcast.
A silent planner regression here is a cluster-scale outage, so the
properties are pinned."""

from __future__ import annotations

import pytest

from matano_spark.workloads import load_registry
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def plans(spark):
    reg = load_registry()

    def plan_of(name: str) -> str:
        df = reg[name].fn(spark, SF_SMALL)
        return df._jdf.queryExecution().executedPlan().toString()

    return plan_of


def test_filters_push_to_scan(plans):
    p = plans("q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p

    p = plans("q3_shipping_priority")
    assert "EqualTo(c_mktsegment,BUILDING)" in p
    assert "GreaterThan(l_shipdate" in p

    p = plans("alert_state_machine")
    assert "EqualTo(event_type,error)" in p


def test_dim_joins_broadcast_never_sortmerge(plans):
    for name in (
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q10_returned_items",
        "j1_enrichment_lookup",
        "q18_large_orders",
    ):
        p = plans(name)
        assert "SortMergeJoin" not in p, name
        assert "BroadcastHashJoin" in p, name


def test_topk_uses_partial_topk_not_global_sort(plans):
    # LIMIT over ORDER BY must plan as TakeOrderedAndProject
    p = plans("q3_shipping_priority")
    assert "TakeOrderedAndProject" in p


def test_cosine_topk_broadcasts_queries_not_corpus(plans):
    p = plans("sim_cosine_topk")
    # query side (vec_id < 10) broadcast; corpus side streamed
    assert "BroadcastNestedLoopJoin BuildRight" in p or "BroadcastNestedLoopJoin BuildLeft" in p
    assert "LessThan(vec_id,10)" in p


def test_column_pruning_reaches_scan(plans):
    # q1 projects 7 of 11 lineitem columns; ReadSchema must not include
    # the unused ones
    p = plans("q1_pricing_summary")
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read and "l_orderkey" not in read[0] and "l_partkey" not in read[0]


def test_alert_merge_read_is_partition_pruned(spark, tmp_path):
    """The streaming alert sink's per-batch read of the existing alerts
    table must hit only the touched ts_hour partitions (PartitionFilters
    at the scan) — the O(touched-hours)-not-O(history) contract."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a1", "2024-05-01-10"), ("a2", "2024-05-01-14")],
        "alert_id string, ts_hour string",
    )
    path = str(tmp_path / "alerts")
    df.write.partitionBy("ts_hour").parquet(path)
    pruned = spark.read.parquet(path).filter(
        F.col("ts_hour").isin(["2024-05-01-14"])
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ts_hour" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    # and the filter is genuinely partition-level: only one file read
    assert pruned.count() == 1


def test_detections_prefilter_pushes_to_scan(plans):
    """The concolic-compiled detection predicate must reach the parquet
    scan — the fast path's whole point is JVM-side pre-selection."""
    p = plans("detections_rule_matches")
    assert "EqualNullSafe(event_type,error)" in p


def test_new_tpch_analogs_plan_shapes(plans):
    # Q2 analog: the min-cost join-back must broadcast every dimension
    # (part/supplier/nation/region) — only the two lineitem aggregates
    # may shuffle.
    p = plans("q2_min_cost_supplier")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p

    # Q16 analog: the negative-balance exclusion must be a broadcast
    # anti join, and the part filters must reach the scan.
    p = plans("q16_supplier_cnt_by_part")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "Not(EqualTo(p_brand,Brand#5))" in p

    # Q21 analog: the decorrelated per-order aggregate joins back on
    # l_orderkey; supplier lookup must broadcast, and the final top-k
    # must be a partial top-k.
    p = plans("q21_waiting_sole_late_supplier")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "EqualTo(o_orderstatus,F)" in p


def test_every_registered_query_plans(spark):
    """Registry-wide smoke: every queries() entry must at least produce
    a physical plan against the smallest SF — a query that fails
    analysis would otherwise only surface in the driver's gate."""
    reg = load_registry()
    failures = []
    for name, q in reg.items():
        try:
            q.fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {e}")
    assert not failures, failures


def test_llmdata_additions_plan_shapes(plans):
    # chunking and redaction stats are map-only up to their final
    # aggregation — chunking must plan NO exchange at all
    p = plans("doc_chunking")
    assert "Exchange" not in p

    # corpus_split: map-side bucket assignment, one tiny aggregation
    p = plans("corpus_split")
    assert p.count("Exchange") <= 2  # partial+final agg only

    # cascade rollup: the day/month levels must NOT rescan the parquet
    # source — raw is scanned once while materializing the hourly
    # level, and the output union reads only the materialized levels
    p = plans("rollup_time_cascade")
    assert p.count("Scan parquet") == 0
    assert "ExistingRDD" in p


def test_frame_grid_prunes_payload_from_scan(spark, tmp_path):
    """sample_frame_refs claims the binary payload never leaves the
    scan: over a parquet media table, ReadSchema must select only the
    metadata subtree, not `data`."""
    from matano_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, b"\x00" * 64, 2500)], "id LONG, payload BINARY, dur LONG"
    )
    import pyspark.sql.functions as F

    media = df.select(
        "id",
        F.struct(
            F.col("payload").alias("data"),
            F.struct(
                F.lit("video/fake").alias("mime"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.col("dur").alias("duration_ms"),
                F.lit(16000).alias("sample_rate"),
            ).alias("meta"),
        ).alias("media"),
    )
    path = str(tmp_path / "media_tbl")
    media.write.parquet(path)
    grid = M.sample_frame_refs(spark.read.parquet(path), every_ms=1000)
    plan = grid._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    assert "data" not in read_schema[0], read_schema[0]
    assert "duration_ms" in read_schema[0]


def test_decontamination_probe_broadcasts_eval_side(plans):
    """The eval-shingle set must broadcast; the training corpus side
    must never be broadcast or sort-merge-joined on the shingle."""
    p = plans("decontamination_overlap")
    assert "BroadcastHashJoin" in p
    # the shingle probe join is the broadcast one — no SMJ anywhere
    assert "SortMergeJoin" not in p


def test_curation_single_shuffle_claims(plans):
    """seq_packing and stratified sampling claim ONE shuffle (per-
    stratum windows, no global sort); the KMV sketch claims two
    (distinct hashes, then the per-group window). Pin the exchange
    counts so a planner or refactor regression is loud."""
    assert plans("seq_packing_bins").count("Exchange") == 1
    assert plans("corpus_sample_stratified").count("Exchange") == 1
    assert plans("sketch_kmv_distinct").count("Exchange") <= 2
    assert "SortMergeJoin" not in plans("seq_packing_bins")


def test_lpm_and_fuzzy_never_theta_join(plans):
    """The LPM CIDR join must be per-length broadcast equi-joins and
    the fuzzy matcher a gram-bucket equi-join — a cartesian or
    nested-loop node here is the scale failure these operators exist
    to avoid."""
    for q in ("lpm_geo_enrichment", "lpm_v6_enrichment", "fuzzy_name_pairs"):
        p = plans(q)
        assert "CartesianProduct" not in p, q
        assert "BroadcastNestedLoopJoin" not in p, q
    assert "BroadcastHashJoin" in plans("lpm_geo_enrichment")
    assert "BroadcastHashJoin" in plans("lpm_v6_enrichment")


def test_window_cap_reuses_bucket_exchange(spark):
    """The degenerate-bucket caps in the embedding/simhash self-join
    paths are window counts whose exchange doubles as BOTH self-join
    sides' required partitioning (r9/r10 optimization) — if a planner
    change stops the exchange reuse, the corpus shuffles an extra
    time. The reuse is an AQE RUNTIME property (the initial plan shows
    two textually-distinct exchanges; the stage cache dedupes them on
    canonical equality), so pin the FINAL adaptive plan: the second
    join side must be a ReusedExchange of the window's shuffle
    (advice item, r10)."""
    import contextlib
    import io

    reg = load_registry()
    for q in ("dedup_embedding_near", "dedup_simhash"):
        df = reg[q].fn(spark, SF_SMALL)
        df.collect()  # executes THIS df's own query execution (final AQE plan)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        assert "isFinalPlan=true" in p, q
        assert "ReusedExchange" in p, f"{q}: bucket exchange no longer reused"
