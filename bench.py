"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query runs REPEATS (default 3) times after a warmup of the input
scans; the reported per-query number is the MEDIAN, so single-run GC /
JIT jitter doesn't read as a regression. A query that raises is recorded
as {"err": ...} and never takes down the rest of the run.
"""

from __future__ import annotations

import json
import os
import statistics
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
    "sim_ann_ivf",
    "dedup_embedding_near",
    "text_quality_score",
    "text_fingerprint",
    "asof_purchase_attribution",
    "range_join_incident_windows",
    "decontamination_overlap",
    "text_lm_fluency",
    "seq_packing_bins",
    "sketch_kmv_distinct",
    # r5 breadth (r4 verdict task 6): a full compiled pack pipeline,
    # both LPM joins, entity resolution, and the composed curation
    # chain, so perf regressions in those families are caught
    "okta_failed_auth_rollup",
    "lpm_geo_enrichment",
    "lpm_v6_enrichment",
    "fuzzy_name_pairs",
    "curation_pipeline_stats",
    # r7: span-level duplication profile (paragraph-dedup shape)
    "dedup_span_duplication",
]


def _cpu_sample() -> tuple[int, int, int] | None:
    """(steal_ticks, busy_ticks, total_ticks) from /proc/stat, or None
    on non-Linux hosts. Used only for the additive `host` block."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle+iowait
        steal = vals[7] if len(vals) > 7 else 0
        total = sum(vals)
        return steal, total - idle, total
    except Exception:  # noqa: BLE001 — diagnostics must never fail the bench
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")

    # Warm the JVM + file listing so per-query numbers measure the query,
    # not session startup.
    for t in TABLE_NAMES:
        table(spark, sf_dir, t).count()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    queries = entry_mod.queries()
    cpu0 = _cpu_sample()
    timings: dict[str, float] = {}
    minima: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        if name not in queries:
            continue
        runs: list[float] = []
        for _ in range(repeats):
            t0 = time.time()
            try:
                queries[name](spark, sf_dir).count()
            except Exception as e:  # noqa: BLE001 — isolate per query
                errors[name] = f"{type(e).__name__}: {e}"[:500]
                break
            runs.append(time.time() - t0)
        if runs:
            timings[name] = round(statistics.median(runs), 3)
            minima[name] = round(min(runs), 3)
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    # Additive diagnostics (round-10 verdict item 3): per-query MIN
    # (noise floor — host-contention windows inflate medians but rarely
    # all repeats), the q1 canary (pure scan+agg, untouched since r1 —
    # a high value flags a slow host window, not a code change), and
    # /proc/stat steal/busy over the run. The timed values, the median
    # semantics, and the `value`/`queries` contract are unchanged.
    out["queries_min"] = minima
    out["value_min"] = round(sum(minima.values()), 3)
    if "q1_pricing_summary" in timings:
        out["canary"] = timings["q1_pricing_summary"]
    cpu1 = _cpu_sample()
    if cpu0 and cpu1 and cpu1[2] > cpu0[2]:
        dtot = cpu1[2] - cpu0[2]
        out["host"] = {
            "steal_pct": round(100.0 * (cpu1[0] - cpu0[0]) / dtot, 2),
            "busy_pct": round(100.0 * (cpu1[1] - cpu0[1]) / dtot, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
