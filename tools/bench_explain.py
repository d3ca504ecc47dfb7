"""Dump `.explain("formatted")` for every headline bench query to
plans/r09/<query>_<tag>.txt (tag = before/after). Build-only — no jobs
run except the control-plane collects inside query builders.

Usage: python tools/bench_explain.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matano_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r10",
    )
    os.makedirs(out_dir, exist_ok=True)

    import bench
    from matano_spark.workloads import load_registry

    spark = get_spark("bench_explain")
    reg = load_registry()
    names = list(only) if only else [n for n in bench.HEADLINE if n in reg]
    for name in names:
        q = reg.get(name)
        if q is None:
            continue
        try:
            df = q.fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
