"""Backward-liveness program slicing — projection pushdown THROUGH a
VRL transform.

A compiled pack pipeline materializes the full normalized event (all
ECS paths the program writes). A query that reads three fields off the
pipeline output pays for every other assignment anyway: Catalyst's
ColumnPruning works at column granularity and cannot drop individual
statement effects inside the wide generated projections. This module
does what a columnar engine's scan-level projection pushdown does, one
level higher: given the set of output paths a consumer needs, walk the
program BACKWARD keeping only statements whose effects are observable
through those paths —

  * a statement is kept iff it writes (or deletes) a path that
    overlaps the live set, or it can change ROW MEMBERSHIP (abort /
    AbortIf / `?? { abort }` blocks — dropping those would change
    which rows survive, not just which columns exist);
  * keeping a statement makes everything it reads live (row paths and
    locals); liveness is never killed (over-approximation — safe);
  * `del` counts as a write: it nulls later reads and removes output
    keys, so a del whose target overlaps the live set must stay;
  * the root spread `. = del(.json)` writes every top-level path, so
    it is kept whenever anything is live (reads stay resolvable
    through the root remainder).

Semantics preserved by construction: the sliced program produces the
same values for every needed path and the same surviving row set as
the full program (oracle-gate checked per query). Reference parity
note: the reference engine has no such feature — transforms always
materialize the full event (transformer/src/main.rs) — because its
consumers are the lake sink; this engine's detection/rollup consumers
declare their read set, the Spark-first win.
"""

from __future__ import annotations

from typing import Iterable

from matano_spark.transform import ast


Path = tuple


def _overlaps(p: Path, live: set[Path]) -> bool:
    for q in live:
        n = min(len(p), len(q))
        if p[:n] == q[:n]:
            return True
    return False


class _Effects:
    """Reads, writes and control effects of one statement."""

    __slots__ = (
        "row_reads", "var_reads", "row_writes", "var_writes",
        "row_dels", "var_dels", "abort", "writes_all",
    )

    def __init__(self):
        self.row_reads: set[Path] = set()
        self.var_reads: set[str] = set()
        self.row_writes: set[Path] = set()
        self.var_writes: set[str] = set()
        self.row_dels: set[Path] = set()
        self.var_dels: set[str] = set()
        self.abort = False
        self.writes_all = False


_ABORT_FNS = {"__abort_block", "abort"}


def _expr(e, fx: _Effects, shadow: frozenset = frozenset()) -> None:
    if isinstance(e, ast.P):
        fx.row_reads.add(ast.split_path(e.path))
        return
    if isinstance(e, ast.Var):
        if e.name not in shadow:
            fx.var_reads.add(e.name)
        return
    if isinstance(e, ast.L):
        return
    if isinstance(e, ast.Fn):
        if e.name in _ABORT_FNS:
            fx.abort = True
        if e.name == "__del_read":
            tgt = e.kwargs.get("target")
            if e.kwargs.get("var"):
                if tgt not in shadow:
                    fx.var_dels.add(tgt)
            else:
                fx.row_dels.add(ast.split_path(tgt))
        for a in e.args:
            _expr(a, fx, shadow)
        for v in e.kwargs.values():
            if isinstance(v, ast.Lambda):
                inner = shadow | frozenset(v.params)
                if v.body is not None:
                    _expr(v.body, fx, inner)
                for s in v.steps:
                    _stmt_effects(s, fx, inner)
            elif isinstance(
                v, (ast.P, ast.Fn, ast.BinOp, ast.UnaryOp, ast.Var, ast.L)
            ):
                _expr(v, fx, shadow)
        return
    if isinstance(e, ast.BinOp):
        _expr(e.left, fx, shadow)
        _expr(e.right, fx, shadow)
        return
    if isinstance(e, ast.UnaryOp):
        _expr(e.operand, fx, shadow)
        return
    if isinstance(e, ast.Lambda):
        inner = shadow | frozenset(e.params)
        if e.body is not None:
            _expr(e.body, fx, inner)
        for s in e.steps:
            _stmt_effects(s, fx, inner)


def _stmt_effects(s, fx: _Effects, shadow: frozenset = frozenset()) -> None:
    """Accumulate a statement's effects into fx (used for opaque
    containers — ForEach bodies, lambdas — and top-level analysis)."""
    if isinstance(s, ast.Assign):
        fx.row_writes.add(ast.split_path(s.path))
        _expr(s.expr, fx, shadow)
    elif isinstance(s, ast.LetVar):
        head = ast.split_path(s.path)
        if head and head[0] not in shadow:
            fx.var_writes.add(head[0])
        _expr(s.expr, fx, shadow)
    elif isinstance(s, ast.LetErr):
        if s.val_path:
            if s.val_row:
                fx.row_writes.add(ast.split_path(s.val_path))
            else:
                head = ast.split_path(s.val_path)
                if head and head[0] not in shadow:
                    fx.var_writes.add(head[0])
        if s.err_path:
            fx.var_writes.add(ast.split_path(s.err_path)[0])
        _expr(s.expr, fx, shadow)
    elif isinstance(s, ast.Move):
        dst = ast.split_path(s.dst)
        src = ast.split_path(s.src)
        if not dst:
            fx.writes_all = True
        else:
            fx.row_writes.add(dst)
        fx.row_reads.add(src)
        if dst != src:
            fx.row_dels.add(src)
    elif isinstance(s, ast.Delete):
        if s.var:
            nm = ast.split_path(s.path)[0]
            if nm not in shadow:
                fx.var_dels.add(nm)
        else:
            fx.row_dels.add(ast.split_path(s.path))
    elif isinstance(s, ast.AbortIf):
        fx.abort = True
        _expr(s.cond, fx, shadow)
    elif isinstance(s, ast.When):
        _expr(s.cond, fx, shadow)
        for sub in s.steps:
            _stmt_effects(sub, fx, shadow)
        for sub in s.orelse:
            _stmt_effects(sub, fx, shadow)
    elif isinstance(s, ast.Multi):
        for sub in s.steps:
            _stmt_effects(sub, fx, shadow)
    elif isinstance(s, ast.ForEach):
        _expr(s.coll, fx, shadow)
        inner = shadow | frozenset(s.params)
        for sub in s.steps:
            _stmt_effects(sub, fx, inner)
    elif isinstance(s, ast.ExprStmt):
        _expr(s.expr, fx, shadow)
    elif isinstance(s, ast.Enrich):
        fx.row_writes.add(ast.split_path(s.target))
        for k in s.on:
            fx.row_reads.add(ast.split_path(k))


class _Live:
    def __init__(self, rows: set[Path], variables: set[str]):
        self.rows = rows
        self.vars = variables

    def touches(self, fx: _Effects) -> bool:
        if fx.abort:
            return True
        if fx.writes_all and (self.rows or self.vars):
            return True
        for p in fx.row_writes | fx.row_dels:
            if _overlaps(p, self.rows):
                return True
        if (fx.var_writes | fx.var_dels) & self.vars:
            return True
        return False

    def absorb(self, fx: _Effects) -> None:
        self.rows |= fx.row_reads
        self.vars |= fx.var_reads
        # expression-position dels are effects the kept statement
        # carries with it; nothing further to track (no kill analysis
        # — over-approximation, safe)


def _slice(steps, live: _Live):
    """Backward pass: return the kept sub-list of steps."""
    kept = []
    for s in reversed(list(steps)):
        if isinstance(s, ast.When):
            body = _slice(s.steps, live)
            orelse = _slice(s.orelse, live)
            cfx = _Effects()
            _expr(s.cond, cfx)
            # keep when a branch survived, or the condition itself has
            # observable effects (`?? { abort }`, a live-touching del)
            if not (body or orelse or live.touches(cfx)):
                continue
            live.absorb(cfx)
            kept.append(ast.When(s.cond, tuple(body), tuple(orelse)))
            continue
        if isinstance(s, ast.Multi):
            body = _slice(s.steps, live)
            if body:
                kept.append(ast.Multi(tuple(body)))
            continue
        fx = _Effects()
        _stmt_effects(s, fx)
        if live.touches(fx):
            live.absorb(fx)
            kept.append(s)
    kept.reverse()
    return kept


def slice_program(steps, needed: Iterable[str]):
    """Slice a parsed program to the statements observable through the
    `needed` output paths (dotted strings). Returns the kept steps."""
    live = _Live({ast.split_path(p) for p in needed}, set())
    return tuple(_slice(steps, live))
