"""Plan audit: print physical-plan scale properties for every
registered query — broadcast vs sort-merge joins, exchange counts,
pushed filters. The quick way to spot a planner regression beyond the
pinned assertions in tests/test_plans.py.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matano_spark.session import get_spark  # noqa: E402
from matano_spark.workloads import load_registry  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("plan_audit")
    reg = load_registry()
    header = f"{'query':34} {'bcast':>5} {'smj':>4} {'bnlj':>4} {'exch':>4}  pushed filters"
    print(header)
    print("-" * len(header))
    for name, q in sorted(reg.items()):
        if only and name not in only:
            continue
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name:34} ERROR {e}")
            continue
        pushed = [
            p[:48]
            for p in re.findall(r"PushedFilters: \[([^\]]+)\]", plan)
            if p and p != "IsNotNull"
        ]
        print(
            f"{name:34} {plan.count('BroadcastHashJoin'):>5} "
            f"{plan.count('SortMergeJoin'):>4} "
            f"{plan.count('BroadcastNestedLoopJoin'):>4} "
            f"{len(re.findall(r'Exchange (hash|range|Single)', plan)):>4}"
            f"  {('; '.join(pushed[:2]))}"
        )


if __name__ == "__main__":
    main()
