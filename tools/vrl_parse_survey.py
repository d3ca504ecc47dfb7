"""Parse-coverage survey: run the transform parser over every VRL
program embedded in the reference's managed log-source YAMLs and
report what parses, what doesn't, and which function names the
registry doesn't know yet.

The reference ymls are treated strictly as DATA (program text to
parse); nothing is executed. Usage:

    python tools/vrl_parse_survey.py [ref_dir]

Output: one line per failing program (source, table, error), then a
summary with the unknown-function histogram — the §2.3 gap list.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matano_spark.transform.parser import parse_program  # noqa: E402

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data/managed/log_sources"


def iter_programs(root: str):
    """Yield (path, kind, text) for every `transform:` / `select_*`
    VRL block in the managed ymls. Cheap literal-block extraction —
    the transform is always `transform: |` followed by an indented
    block."""
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if not fn.endswith((".yml", ".yaml")):
                continue
            path = os.path.join(dirpath, fn)
            with open(path, encoding="utf-8") as f:
                text = f.read()
            for m in re.finditer(
                r"^([ \t]*)(transform|select_table_from_payload(?:_metadata)?):[ \t]*\|[-+0-9]*[ \t]*\n((?:\1[ \t]+\S[^\n]*\n|[ \t]*\n)+)",
                text,
                re.MULTILINE,
            ):
                indent, kind, body = m.group(1), m.group(2), m.group(3)
                lines = [
                    ln[len(indent) + 2 :]
                    if ln.startswith(indent + "  ")
                    else ln.strip()
                    for ln in body.splitlines()
                ]
                yield path, kind, "\n".join(lines)


def main() -> int:
    ok = bad = 0
    unknown: Counter[str] = Counter()
    errors: Counter[str] = Counter()
    failing: list[tuple[str, str, str]] = []
    for path, kind, prog in iter_programs(REF):
        try:
            steps = parse_program(prog)
            _collect_unknown(steps, unknown)
            ok += 1
        except SyntaxError as e:
            bad += 1
            msg = str(e).split(" at ")[0]
            errors[msg] += 1
            failing.append((os.path.relpath(path, REF), kind, msg))
    for path, kind, msg in failing:
        print(f"FAIL {path} [{kind}]: {msg}")
    print(f"\n{ok} parse, {bad} fail")
    if errors:
        print("\ntop parse errors:")
        for msg, n in errors.most_common(10):
            print(f"  {n:3d}  {msg}")
    if unknown:
        print("\nfunctions not in the registry (by call count):")
        for name, n in unknown.most_common(25):
            print(f"  {n:3d}  {name}")
    return 0


def _collect_unknown(node, out: Counter) -> None:
    from matano_spark.transform import ast as A
    from matano_spark.transform.functions import REGISTRY

    internal = {"__stmt_block", "__abort_block", "__del_read", "__field"}  # compiler-special forms

    def walk(e):
        if isinstance(e, A.Fn):
            if e.name not in REGISTRY and e.name not in internal:
                out[e.name] += 1
            for a in e.args:
                walk(a)
            for v in e.kwargs.values():
                if isinstance(v, A.Lambda):
                    walk(v.body)
                else:
                    walk(v)
        elif isinstance(e, (A.BinOp,)):
            walk(e.left)
            walk(e.right)
        elif isinstance(e, A.UnaryOp):
            walk(e.operand)
        elif isinstance(e, (list, tuple)):
            for x in e:
                walk(x)
        elif isinstance(e, A.When):
            walk(e.cond)
            walk(e.steps)
            walk(e.orelse)
        elif isinstance(e, A.ForEach):
            walk(e.coll)
            walk(e.steps)
        elif isinstance(e, (A.Assign, A.LetVar)):
            walk(e.expr)
        elif isinstance(e, A.LetErr):
            walk(e.expr)
        elif isinstance(e, A.AbortIf):
            walk(e.cond)

    walk(list(node))


if __name__ == "__main__":
    sys.exit(main())
