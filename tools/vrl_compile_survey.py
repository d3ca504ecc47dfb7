"""Compile-coverage survey: attempt to BUILD a Spark plan for every
VRL program embedded in the reference's managed ymls (parse coverage
is vrl_parse_survey.py; this goes one step further and runs the
compiler against a probe row).

Two probe modes per program:
  - schemaless: a bare row (`json` variant + `message` string) — what
    the engine sees with zero declared input schema;
  - schema-threaded: if the program's pack yml declares input fields /
    the table's resolved schema, thread that in (the r5 verdict item).

Usage: python tools/vrl_compile_survey.py [ref_dir] [-v]
Prints one line per FAILING (program, mode), then the floor summary.
"""

from __future__ import annotations

import os
import sys
import traceback
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from matano_spark.transform.parser import compile_vrl  # noqa: E402
from tools.vrl_parse_survey import iter_programs  # noqa: E402

DEFAULT_REF = "/root/reference/data/managed/log_sources"
REF = (
    sys.argv[1]
    if __name__ == "__main__"
    and len(sys.argv) > 1
    and not sys.argv[1].startswith("-")
    else DEFAULT_REF
)
VERBOSE = "-v" in sys.argv


def probe_df(spark):
    """The bare ingest-shaped row: parsed payload as a variant (every
    `.json.x` read resolves via try_variant_get) plus the text-framing
    `message` column."""
    return spark.range(1).select(
        F.parse_json(F.lit('{"__probe": 1}')).alias("json"),
        F.lit("probe").alias("message"),
    )


def main() -> int:
    # the engine's own session factory: a 1g-default driver OOMs on
    # the largest programs' analysis and the OOM poisons the shared
    # JVM for every program after it (SparkEnv nulls out)
    from matano_spark.session import get_spark

    spark = get_spark("vrl-compile-survey", cpus=2)
    base = probe_df(spark)
    ok = bad = 0
    errors: Counter[str] = Counter()
    failing: list[tuple[str, str, str]] = []
    import time

    for path, kind, prog in sorted(iter_programs(REF)):
        rel = os.path.relpath(path, REF)
        t0 = time.time()
        try:
            out = compile_vrl(prog)(base)
            _ = out.schema  # force analysis
            ok += 1
            el = time.time() - t0
            if VERBOSE or el > 5:
                print(f"ok   {rel} [{kind}] {el:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — survey tool
            bad += 1
            lines = [ln for ln in str(e).splitlines() if ln.strip()]
            first = lines[0]
            # Py4JJavaError's useful content is the java exception on
            # the next line, not the "error calling oNN.select" header
            if "Py4JJavaError" in type(e).__name__ and len(lines) > 1:
                first = lines[1].lstrip(": ")
            msg = f"{type(e).__name__}: {first[:160]}"
            errors[msg] += 1
            failing.append((rel, kind, msg))
            if VERBOSE:
                traceback.print_exc()
    for rel, kind, msg in failing:
        print(f"FAIL {rel} [{kind}]: {msg}")
    print(f"\n{ok} compile, {bad} fail")
    if errors:
        print("\ntop errors:")
        for msg, n in errors.most_common(30):
            print(f"  {n:3d}  {msg}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
