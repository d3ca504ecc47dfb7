"""Execution-floor survey: COMPILE and EXECUTE every VRL program in
the reference's managed log-source ymls against a synthesized
representative event, and assert the floor the engine promises a
migrating matano user:

  * the compiled plan collects without crashing (1-row execute);
  * when the program assigns `.ts`, the landed ts is non-null (the
    reference engine's hard requirement — a null ts row is sidelined);
  * report (not assert) the null-rate of the program's other primary
    top-level outputs, so heuristic-fixture gaps are visible.

The input event is synthesized per program by static analysis: every
`.json.*` path the program READS gets a value whose shape is guessed
from the leaf name (timestamps, ips, ports, urls, ...), merged with
per-program overrides below for fields whose semantics a name can't
carry (enums the transform switches on, CSV `message` lines, epoch
numbers). Parse coverage is vrl_parse_survey.py, compile coverage is
vrl_compile_survey.py; this is the third floor on top.

Usage: python tools/vrl_exec_survey.py [ref_dir] [-v] [pack-filter]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from matano_spark.transform import ast  # noqa: E402
from matano_spark.transform.parser import compile_vrl, parse_program  # noqa: E402
from tools.vrl_parse_survey import iter_programs  # noqa: E402

DEFAULT_REF = "/root/reference/data/managed/log_sources"


# -- static read/write collection ------------------------------------


def _unlit(v):
    return v.value if isinstance(v, ast.L) else v


def _get_chain_path(e):
    """Reconstruct `.json.items[0].name` from its parsed
    Fn('get', Fn('get', P, index=0), path=['name']) chain."""
    if isinstance(e, ast.P):
        return e.parts
    if isinstance(e, ast.Fn) and e.name == "get" and len(e.args) == 1:
        base = _get_chain_path(e.args[0])
        if base is None:
            return None
        idx = _unlit(e.kwargs.get("index"))
        if isinstance(idx, int):
            return base + (str(idx),)
        path = _unlit(e.kwargs.get("path"))
        if isinstance(path, (list, tuple)):
            parts = tuple(
                str(_unlit(x)) for x in path if isinstance(_unlit(x), (str, int))
            )
            if len(parts) == len(path):
                return base + parts
    return None


def _walk_exprs(obj, on_path, on_write):
    """Generic AST walk: on_path(parts) for every row-path READ,
    on_write(parts) for every row-path WRITE."""
    if isinstance(obj, (tuple, list)):
        for x in obj:
            _walk_exprs(x, on_path, on_write)
    elif isinstance(obj, ast.P):
        on_path(obj.parts)
    elif isinstance(obj, ast.Fn):
        full = _get_chain_path(obj)
        if full is not None:
            on_path(full)  # `.json.items[0].name` parses to get() chains
        _walk_exprs(obj.args, on_path, on_write)
        _walk_exprs(tuple(obj.kwargs.values()), on_path, on_write)
    elif isinstance(obj, ast.BinOp):
        _walk_exprs((obj.left, obj.right), on_path, on_write)
    elif isinstance(obj, ast.UnaryOp):
        _walk_exprs(obj.operand, on_path, on_write)
    elif isinstance(obj, ast.Lambda):
        _walk_exprs((obj.body, obj.steps), on_path, on_write)
    elif isinstance(obj, ast.Assign):
        on_write(ast.split_path(obj.path))
        _walk_exprs(obj.expr, on_path, on_write)
    elif isinstance(obj, ast.Move):
        if obj.dst:
            on_write(ast.split_path(obj.dst))
        if obj.src:
            on_path(ast.split_path(obj.src))
    elif isinstance(obj, ast.Delete):
        if not obj.var:
            on_path(ast.split_path(obj.path))
    elif isinstance(obj, ast.AbortIf):
        _walk_exprs(obj.cond, on_path, on_write)
    elif isinstance(obj, ast.When):
        _walk_exprs((obj.cond, obj.steps, obj.orelse), on_path, on_write)
    elif isinstance(obj, (ast.LetVar,)):
        _walk_exprs(obj.expr, on_path, on_write)
    elif isinstance(obj, ast.LetErr):
        if obj.val_row and obj.val_path:
            on_write(ast.split_path(obj.val_path))
        _walk_exprs(obj.expr, on_path, on_write)
    elif isinstance(obj, ast.ExprStmt):
        _walk_exprs(obj.expr, on_path, on_write)
    elif isinstance(obj, ast.Multi):
        _walk_exprs(obj.steps, on_path, on_write)
    elif isinstance(obj, ast.ForEach):
        _walk_exprs((obj.coll, obj.steps), on_path, on_write)


def collect_paths(steps):
    reads: set[tuple[str, ...]] = set()
    writes: set[tuple[str, ...]] = set()
    _walk_exprs(list(steps), reads.add, writes.add)
    return reads, writes


# -- event synthesis ---------------------------------------------------

UA = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36"
)


def _leaf_value(parts: tuple[str, ...]):
    """Name-keyed value heuristic for a read leaf."""
    leaf = parts[-1].lower()
    joined = "_".join(parts).lower()
    if leaf.isdigit():
        leaf = parts[-2].lower() if len(parts) > 1 else "item"
    if (
        "time" in leaf
        or "date" in leaf
        or leaf in ("ts", "@timestamp", "start", "end", "published")
        or leaf.endswith(("_at", "_on"))
    ):
        return "2024-05-01T10:00:00.123Z"
    if leaf == "timestamp_desc":
        return "login"
    if leaf.endswith("port") or leaf == "port":
        return 443
    if "useragent" in leaf.replace("_", "") or "user_agent" in joined:
        return UA
    if leaf.endswith("ip") or "ip_address" in leaf or leaf in (
        "address", "client_ip", "remote_addr", "sourceipaddress"
    ):
        return "203.0.113.7"
    if "email" in leaf:
        return "alice@example.com"
    if "url" in leaf or leaf == "uri" or leaf == "referrer":
        return "https://www.example.com/a/b?q=1"
    if "domain" in leaf or "hostname" in leaf or leaf == "host":
        return "host.example.com"
    if leaf.startswith("sha256") or leaf.endswith("sha256"):
        return "a" * 64
    if leaf.startswith("sha1") or leaf.endswith("sha1"):
        return "b" * 40
    if leaf == "md5" or leaf.endswith("_md5"):
        return "c" * 32
    if (
        "bytes" in leaf
        or "count" in leaf
        or leaf.endswith(("_size", "size", "_num", "duration", "_ms", "_sec"))
        or leaf in ("pid", "ppid", "uid", "gid", "severity", "priority")
    ):
        return 42
    if leaf in ("version",):
        return "1.0"
    if leaf in ("success", "enabled", "encrypted", "compressed"):
        return True
    return f"v-{parts[-1]}"


def synth_event(reads: set[tuple[str, ...]], overrides: dict | None = None):
    """Build a nested JSON-able event covering every `.json.*` read.

    Digit path segments become single-element arrays. A path that is
    both read as a leaf and descended into becomes an object (the
    descent wins; the leaf read resolves to the object, which the
    try_* builders tolerate)."""
    root: dict = {}
    json_reads = sorted(
        p[1:] for p in reads if p and p[0] == "json" and len(p) > 1
    )
    for parts in json_reads:
        cur = root
        ok = True
        for i, part in enumerate(parts[:-1]):
            nxt = parts[i + 1]
            if isinstance(cur, list):
                if not cur:
                    cur.append({})
                cur = cur[0]
            if not isinstance(cur, dict):
                ok = False
                break  # a parent was already forced to a scalar leaf
            if part not in cur or not isinstance(cur[part], (dict, list)):
                cur[part] = [] if nxt.isdigit() else {}
            cur = cur[part]
        if not ok:
            continue
        if isinstance(cur, list):
            if not cur:
                cur.append({})
            cur = cur[0]
        if not isinstance(cur, dict):
            continue
        leaf = parts[-1]
        if leaf.isdigit():
            continue  # array index of an already-created list parent
        if leaf not in cur:
            cur[leaf] = _leaf_value(parts)
    if overrides:
        _deep_merge(root, overrides)
    return root


def _deep_merge(dst: dict, src: dict):
    for k, v in src.items():
        if v is _DEL:
            dst.pop(k, None)
        elif isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v


class _Del:
    pass


_DEL = _Del()  # override sentinel: remove a synthesized field


# -- per-program overrides ---------------------------------------------
# Keyed by yml path relative to the reference root (+ kind). Values:
#   json: deep-merged into the synthesized `.json` object
#   message: the raw text line for CSV/grok-framed programs
# Keep these MINIMAL — they exist only where a field's semantics can't
# be guessed from its name (enums the transform switches on, epoch
# seconds vs ISO strings, positional CSV lines).
OVERRIDES: dict[str, dict] = {}


def _load_overrides():
    here = os.path.dirname(os.path.abspath(__file__))
    p = os.path.join(here, "vrl_exec_fixtures.json")
    if os.path.exists(p):
        with open(p, encoding="utf-8") as f:
            OVERRIDES.update(json.load(f))


def run_one(spark, rel: str, kind: str, prog_text: str):
    """Compile + execute one program; returns (status, detail).

    status: 'ok' | 'ts-null' | 'crash'
    """
    steps = parse_program(prog_text)
    reads, writes = collect_paths(steps)
    ov = OVERRIDES.get(f"{rel}::{kind}", OVERRIDES.get(rel, {}))
    event = synth_event(reads, ov.get("json"))
    msg = ov.get("message") or json.dumps(event)

    raw = spark.createDataFrame([(msg,)], "message string")
    if event:
        inferred = spark.read.json(
            spark.sparkContext.parallelize([json.dumps(event)], 1)
        )
        df = raw.crossJoin(
            inferred.select(
                # backtick-quote: teleport synthesizes literal dotted
                # keys ("addr.local") — bare names parse as nested refs
                F.struct(*[F.col(f"`{c}`") for c in inferred.columns]).alias(
                    "json"
                )
            ).limit(1)
        )
    else:
        df = raw.select(
            F.parse_json(F.lit(json.dumps(event) if event else "{}")).alias(
                "json"
            ),
            "message",
        )
    out = compile_vrl(prog_text)(df)
    rows = out.collect()
    assigns_ts = ("ts",) in writes
    if not rows:
        # the synthesized event fell into an abort branch — still an
        # execution (the plan ran end-to-end), but ts can't be checked
        return ("ok-aborted", "0 rows (abort path)")
    row = rows[0].asDict()
    if assigns_ts and row.get("ts") is None:
        return ("ts-null", f"outputs={sorted(k for k in row if row[k] is not None)[:8]}")
    null_outs = sorted(
        k
        for k in row
        if row[k] is None and not k.startswith("__")
    )
    return ("ok", f"null_outputs={null_outs[:10]}")


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("-")]
    ref = argv[0] if argv and os.path.isdir(argv[0]) else DEFAULT_REF
    pat = argv[1] if len(argv) > 1 else (argv[0] if argv and not os.path.isdir(argv[0]) else "")
    verbose = "-v" in sys.argv

    from matano_spark.session import get_spark

    _load_overrides()
    spark = get_spark("vrl-exec-survey", cpus=2)
    ok = tsnull = crash = 0
    failing: list[tuple[str, str, str]] = []
    for path, kind, prog in sorted(iter_programs(ref)):
        rel = os.path.relpath(path, ref)
        if pat and pat not in rel:
            continue
        t0 = time.time()
        try:
            status, detail = run_one(spark, rel, kind, prog)
        except Exception as e:  # noqa: BLE001 — survey tool
            status = "crash"
            lines = [ln for ln in str(e).splitlines() if ln.strip()]
            first = lines[0] if lines else ""
            if "Py4JJavaError" in type(e).__name__ and len(lines) > 1:
                first = lines[1].lstrip(": ")
            detail = f"{type(e).__name__}: {first[:200]}"
            if verbose:
                traceback.print_exc()
        el = time.time() - t0
        if status.startswith("ok"):
            ok += 1
            if verbose or el > 10:
                print(f"ok   {rel} [{kind}] {el:.1f}s {detail}", flush=True)
        elif status == "ts-null":
            tsnull += 1
            failing.append((rel, kind, f"ts NULL — {detail}"))
            print(f"TSNULL {rel} [{kind}]: {detail}", flush=True)
        else:
            crash += 1
            failing.append((rel, kind, detail))
            print(f"CRASH {rel} [{kind}]: {detail}", flush=True)
    print(f"\n{ok} execute, {tsnull} ts-null, {crash} crash")
    return 0 if not failing else 1


if __name__ == "__main__":
    sys.exit(main())
