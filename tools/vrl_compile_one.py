"""Compile ONE reference managed program against the schemaless probe
and print the full traceback on failure.

Usage: python tools/vrl_compile_one.py <rel_yml> [kind]
e.g.   python tools/vrl_compile_one.py zeek/tables/dhcp.yml
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matano_spark.transform.parser import compile_vrl  # noqa: E402
from tools.vrl_compile_survey import REF, probe_df  # noqa: E402
from tools.vrl_parse_survey import iter_programs  # noqa: E402


def main() -> int:
    rel = sys.argv[1]
    want_kind = sys.argv[2] if len(sys.argv) > 2 else "transform"
    target = os.path.join(REF, rel)
    prog = None
    for path, kind, text in iter_programs(os.path.dirname(target)):
        if path == target and kind == want_kind:
            prog = text
            break
    if prog is None:
        print(f"no {want_kind} block in {rel}")
        return 2
    from matano_spark.session import get_spark

    spark = get_spark("vrl-compile-one", cpus=2)
    base = probe_df(spark)
    try:
        out = compile_vrl(prog)(base)
        print(out.schema.simpleString()[:2000])
        print("OK")
        return 0
    except Exception:  # noqa: BLE001
        traceback.print_exc()
        return 1


if __name__ == "__main__":
    sys.exit(main())
