"""Column-compiled fast path for pure-predicate detections (§2.7).

matano detections are plain Python `detect(record) -> bool` callables
(ref detection/common.py:225-259). Running them row-at-a-time is the
slow path; most real rules are simple field predicates that Catalyst
could evaluate JVM-side with predicate pushdown. This module compiles
such predicates to a pyspark Column by CONCOLIC TRACING: the callable
is executed against a symbolic record whose field accesses build
Column expressions, every boolean decision forks exploration into both
branches, and the final predicate is the OR over accepting paths of
the AND of each path's branch conditions.

Soundness contract: compilation either produces a Column with exactly
the Python predicate's row semantics (null/missing handling included)
or raises `Untraceable` — callers then fall back to the row loop. Any
construct the tracer cannot model faithfully (identity tests,
isinstance, hashing, str()/len() coercion, unknown methods, >128
paths) aborts compilation; nothing silently mis-compiles. The
fast path is used as a PREFILTER: the Python hooks still run on
surviving rows, so title/dedupe/original_event semantics are
bit-identical to the slow path.

Null mapping (Python truthiness vs SQL three-valued logic):
  ==  → eqNullSafe          (None == x is a plain False in Python)
  !=  → NOT eqNullSafe      (None != x is True in Python)
  < <= > >=  → plain compare; NULL propagates → path not taken, which
     matches Python raising TypeError on None comparison (no match)
  branch taken   → expr IS TRUE
  branch refused → NOT coalesce(expr, FALSE)  (null is falsy)
"""

from __future__ import annotations

import dis
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class Untraceable(Exception):
    """The predicate uses a construct the tracer cannot model; use the
    row-loop path."""


_MAX_PATHS = 128

# builtins whose observation of a symbolic value returns a plain Python
# value without consulting our dunders — silently wrong, so reject any
# predicate that loads them
_FORBIDDEN_GLOBALS = {"isinstance", "type", "id", "hasattr", "getattr",
                      "callable", "vars", "repr"}


def _reject_unsafe_bytecode(fn: Callable) -> None:
    try:
        instructions = list(dis.get_instructions(fn))
    except TypeError as e:  # builtins/partials without bytecode
        raise Untraceable(str(e)) from e
    for ins in instructions:
        if ins.opname == "IS_OP":  # `is` / `is not` cannot be traced
            raise Untraceable("identity test in predicate")
        if ins.opname in ("LOAD_GLOBAL", "LOAD_NAME") and ins.argval in _FORBIDDEN_GLOBALS:
            raise Untraceable(f"{ins.argval}() in predicate")


class _Tracer:
    """One execution: prescribed decisions for a prefix, True beyond."""

    def __init__(self, prefix: list[bool]):
        self.decisions = list(prefix)
        self.trail: list[tuple[Column, bool]] = []
        self.i = 0

    def decide(self, sym: "_Sym") -> bool:
        if not sym.is_bool:
            raise Untraceable("truthiness of non-boolean expression")
        if self.i < len(self.decisions):
            taken = self.decisions[self.i]
        else:
            taken = True
            self.decisions.append(True)
        self.trail.append((sym.expr, taken))
        self.i += 1
        return taken


def _lit(v: Any) -> Column:
    if isinstance(v, _Sym):
        return v.expr
    return F.lit(v)


class _Sym:
    """Symbolic value: wraps a Column, records decisions via the tracer."""

    def __init__(self, expr: Column, tracer: _Tracer, is_bool: bool = False):
        self.expr = expr
        self.tracer = tracer
        self.is_bool = is_bool

    def _cmp(self, other: Any, op: str) -> "_Sym":
        o = _lit(other)
        if op == "eq":
            e = self.expr.eqNullSafe(o)
        elif op == "ne":
            e = ~self.expr.eqNullSafe(o)
        elif op == "lt":
            e = self.expr < o
        elif op == "le":
            e = self.expr <= o
        elif op == "gt":
            e = self.expr > o
        else:
            e = self.expr >= o
        return _Sym(e, self.tracer, is_bool=True)

    def __eq__(self, other):  # noqa: D105
        return self._cmp(other, "eq")

    def __ne__(self, other):
        return self._cmp(other, "ne")

    def __lt__(self, other):
        return self._cmp(other, "lt")

    def __le__(self, other):
        return self._cmp(other, "le")

    def __gt__(self, other):
        return self._cmp(other, "gt")

    def __ge__(self, other):
        return self._cmp(other, "ge")

    def _arith(self, other: Any, op: str, swapped: bool = False) -> "_Sym":
        o = _lit(other)
        a, b = (o, self.expr) if swapped else (self.expr, o)
        e = {"add": a + b, "sub": a - b, "mul": a * b, "div": a / b,
             "mod": a % b}[op]
        return _Sym(e, self.tracer)

    def __add__(self, other):
        return self._arith(other, "add")

    def __radd__(self, other):
        return self._arith(other, "add", swapped=True)

    def __sub__(self, other):
        return self._arith(other, "sub")

    def __rsub__(self, other):
        return self._arith(other, "sub", swapped=True)

    def __mul__(self, other):
        return self._arith(other, "mul")

    def __rmul__(self, other):
        return self._arith(other, "mul", swapped=True)

    def __truediv__(self, other):
        return self._arith(other, "div")

    def __rtruediv__(self, other):
        return self._arith(other, "div", swapped=True)

    def __mod__(self, other):
        return self._arith(other, "mod")

    def __bool__(self):
        return self.tracer.decide(self)

    def __contains__(self, item):  # "x" in r.deepget("s")
        return _Sym(
            self.expr.contains(_lit(item)), self.tracer, is_bool=True
        )

    # string helpers with SQL equivalents; None-receiver raises in
    # Python (no match) and propagates NULL in SQL (no match) — same
    def lower(self):
        return _Sym(F.lower(self.expr), self.tracer)

    def upper(self):
        return _Sym(F.upper(self.expr), self.tracer)

    def strip(self):
        return _Sym(F.trim(self.expr), self.tracer)

    def startswith(self, prefix):
        return _Sym(
            self.expr.startswith(_lit(prefix)), self.tracer, is_bool=True
        )

    def endswith(self, suffix):
        return _Sym(
            self.expr.endswith(_lit(suffix)), self.tracer, is_bool=True
        )

    # constructs with no faithful symbolic analog: abort compilation
    def __hash__(self):
        raise Untraceable("hashing a record field")

    def __str__(self):
        raise Untraceable("str() of a record field")

    def __format__(self, spec):
        raise Untraceable("formatting a record field")

    def __len__(self):
        raise Untraceable("len() of a record field")

    def __iter__(self):
        raise Untraceable("iterating a record field")

    def __getattr__(self, name):
        raise Untraceable(f"unsupported method .{name}")


def _resolve_path(schema: T.StructType, path: str, default: Any) -> Column:
    """Dotted path → Column; a missing path is the deepget default."""
    parts = path.split(".")
    cur: T.DataType = schema
    col: Column | None = None
    for p in parts:
        if not isinstance(cur, T.StructType) or p not in cur.fieldNames():
            return F.lit(default)
        cur = cur[p].dataType
        col = F.col(f"`{parts[0]}`") if col is None else col.getField(p)
    if default is not None:
        return F.coalesce(col, F.lit(default))
    return col


class _SymRecord:
    """The symbolic DeepDict handed to detect() during tracing."""

    def __init__(self, schema: T.StructType, tracer: _Tracer):
        self._schema = schema
        self._tracer = tracer

    def deepget(self, path: str, default: Any = None) -> _Sym:
        return _Sym(_resolve_path(self._schema, path, default), self._tracer)

    def get(self, key: str, default: Any = None) -> _Sym:
        return self.deepget(key, default)

    def __getitem__(self, key: str) -> _Sym:
        return self.deepget(key)

    def __contains__(self, key):
        raise Untraceable("membership test on the record itself")

    def __iter__(self):
        raise Untraceable("iterating the record")


def compile_predicate(
    detect: Callable[[Any], Any], schema: T.StructType
) -> Column:
    """Compile a detect() callable to an equivalent boolean Column.

    Raises Untraceable when faithful compilation is impossible.
    """
    _reject_unsafe_bytecode(detect)
    paths: list[tuple[tuple[tuple[Column, bool], ...], Any]] = []
    queue: list[tuple[bool, ...]] = [()]
    seen: set[tuple[bool, ...]] = set()
    runs = 0
    while queue:
        prefix = queue.pop()
        if prefix in seen:
            continue
        seen.add(prefix)
        runs += 1
        if runs > _MAX_PATHS:
            raise Untraceable("path explosion")
        tracer = _Tracer(list(prefix))
        rec = _SymRecord(schema, tracer)
        try:
            ret = detect(rec)
        except Untraceable:
            raise
        except Exception as e:  # re.match(sym), None.foo, ... — can't model
            raise Untraceable(f"predicate raised during trace: {e}") from e
        vector = tuple(taken for _, taken in tracer.trail)
        if vector in seen and prefix != vector:
            continue
        seen.add(vector)
        paths.append((tuple(tracer.trail), ret))
        for j in range(len(prefix), len(tracer.trail)):
            queue.append(vector[:j] + (False,))

    accepted: list[Column] = []
    for trail, ret in paths:
        if isinstance(ret, _Sym):
            if not ret.is_bool:
                raise Untraceable("non-boolean return value")
            ret_cond: Column | None = F.coalesce(ret.expr, F.lit(False))
        elif isinstance(ret, bool) or ret is None:
            if not ret:
                continue  # rejecting path
            ret_cond = None
        else:
            if not bool(ret):  # constant falsy (0, "", ...)
                continue
            ret_cond = None
        conds = [
            e if taken else ~F.coalesce(e, F.lit(False)) for e, taken in trail
        ]
        if ret_cond is not None:
            conds.append(ret_cond)
        if not conds:
            return F.lit(True)  # unconditionally-true predicate
        acc = conds[0]
        for c in conds[1:]:
            acc = acc & c
        accepted.append(acc)
    if not accepted:
        return F.lit(False)
    out = accepted[0]
    for c in accepted[1:]:
        out = out | c
    return out
