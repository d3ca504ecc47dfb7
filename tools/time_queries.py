"""Isolated per-query timing (guide §1): times selected queries with
BOTH the bench's historical action (`.count()`) and the noop sink
(`df.write.format("noop")` — computes every column, §1.4), labelling
each job so the timings are attributable.

Usage: python tools/time_queries.py [-r N] [query ...]   (default: all headline)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matano_spark.session import get_spark  # noqa: E402
from matano_spark.tables import TABLE_NAMES, table  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    if args and args[0] == "-r":
        repeats = int(args[1])
        args = args[2:]
    only = list(args)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from matano_spark.workloads import load_registry

    spark = get_spark("time_queries")
    for t in TABLE_NAMES:
        table(spark, sf_dir, t).count()

    reg = load_registry()
    names = only or [n for n in bench.HEADLINE if n in reg]
    out: dict[str, dict[str, float]] = {}
    for name in names:
        q = reg[name]
        res: dict[str, float] = {}
        for action in ("count", "noop"):
            runs = []
            for i in range(repeats):
                spark.sparkContext.setJobDescription(f"{name}[{action}#{i}]")
                t0 = time.time()
                df = q.fn(spark, sf_dir)
                if action == "count":
                    df.count()
                else:
                    df.write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
            res[action] = round(statistics.median(runs), 3)
        out[name] = res
        print(json.dumps({name: res}), flush=True)
    print("TOTALS " + json.dumps({k: v for k, v in out.items()}))


if __name__ == "__main__":
    main()
