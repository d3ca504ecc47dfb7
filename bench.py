"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once after a warmup of the input scans; timing
covers plan + execution to a count/collect action.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from matano_spark.session import get_spark  # noqa: E402
from matano_spark.tables import TABLE_NAMES, table  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_orders",
    "w1_hourly_rollup",
    "a1_rule_match_aggregation",
    "j1_enrichment_lookup",
    "w2_gap_sessions",
    "vrl_transform_normalize",
    "detections_rule_matches",
    "alert_state_machine",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "dedup_embedding_near",
    "text_quality_score",
    "text_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")

    # Warm the JVM + file listing so per-query numbers measure the query,
    # not session startup.
    for t in TABLE_NAMES:
        table(spark, sf_dir, t).count()

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in queries:
            continue
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        _ = n
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
