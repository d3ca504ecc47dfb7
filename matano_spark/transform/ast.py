"""AST for the transform DSL.

Expressions:
  P("a.b.c")        — dotted path reference (missing ≡ null, like VRL)
  L(3) / L("x")     — literal
  Fn("to_int", x)   — scalar function call (see transform.functions)
  python operators  — composed via Column arithmetic at compile time

Steps (ref semantics: SURVEY.md §2.2 P1-P8):
  Assign(path, expr)         — .a.b = expr            (P1)
  Move(dst, src)             — .a = del(.b)           (P1)
  Delete(path)               — del(.a.b)              (P2)
  AbortIf(expr)              — abort when truthy      (P3 row filter)
  When(cond, steps, orelse)  — if/else if chains      (P4)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Union


class _ExprOps:
    """Operator overloads so expressions compose like Columns:
    P("a") == L(1), P("x") & ~P("y"), P("n") + 1 ..."""

    def _bin(self, op: str, other: Any, swap: bool = False):
        left, right = (other, self) if swap else (self, other)
        return BinOp(op, left, right)

    def __eq__(self, other):  # noqa: D105
        return self._bin("==", other)

    def __ne__(self, other):
        return self._bin("!=", other)

    def __gt__(self, other):
        return self._bin(">", other)

    def __ge__(self, other):
        return self._bin(">=", other)

    def __lt__(self, other):
        return self._bin("<", other)

    def __le__(self, other):
        return self._bin("<=", other)

    def __and__(self, other):
        return self._bin("&", other)

    def __or__(self, other):
        return self._bin("|", other)

    def __add__(self, other):
        return self._bin("+", other)

    def __radd__(self, other):
        return self._bin("+", other, swap=True)

    def __sub__(self, other):
        return self._bin("-", other)

    def __mul__(self, other):
        return self._bin("*", other)

    def __truediv__(self, other):
        return self._bin("/", other)

    def __mod__(self, other):
        return self._bin("%", other)

    def __invert__(self):
        return UnaryOp("!", self)

    def __hash__(self):
        return id(self)


def split_path(path: str) -> tuple[str, ...]:
    """Split a dotted path honoring quoted segments: `a."id.orig_h".b`
    → ("a", "id.orig_h", "b") — VRL quotes segments whose names
    contain dots (zeek keys like id.orig_h)."""
    parts: list[str] = []
    buf: list[str] = []
    in_q = False
    for ch in path:
        if ch == '"':
            in_q = not in_q
        elif ch == "." and not in_q:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return tuple(p for p in parts if p != "")


class RegexLit(str):
    """An r'...' regex literal — string builders (replace/split) must
    treat it as a PATTERN, not a literal separator."""


@dataclass(frozen=True, eq=False)
class P(_ExprOps):
    """Dotted path reference into the row."""

    path: str

    @property
    def parts(self) -> tuple[str, ...]:
        return split_path(self.path)


@dataclass(frozen=True, eq=False)
class L(_ExprOps):
    """Literal value."""

    value: Any


@dataclass(frozen=True, eq=False)
class Fn(_ExprOps):
    """Scalar function call by VRL name."""

    name: str
    args: tuple = ()
    kwargs: dict = field(default_factory=dict)

    def __init__(self, name: str, *args: Any, **kwargs: Any):
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "args", tuple(args))
        object.__setattr__(self, "kwargs", kwargs)


@dataclass(frozen=True, eq=False)
class BinOp(_ExprOps):
    op: str
    left: Any
    right: Any


@dataclass(frozen=True, eq=False)
class UnaryOp(_ExprOps):
    op: str
    operand: Any


@dataclass(frozen=True, eq=False)
class Var(_ExprOps):
    """Closure-bound bare variable (the `v` in `-> |v| { ... }`)."""

    name: str


@dataclass(frozen=True, eq=False)
class Lambda:
    """VRL closure: params bound in the body, evaluated per element by
    map_values/map_each/filter/for_each builders. `steps` carries a
    STATEMENT body (local/param-field mutations) evaluated before the
    value expression (okta's ip_chain map_values rebuild)."""

    params: tuple
    body: Any
    steps: tuple = ()

    def __init__(self, params, body, steps=()):
        object.__setattr__(self, "params", tuple(params))
        object.__setattr__(self, "body", body)
        object.__setattr__(self, "steps", tuple(steps))


Expr = Union[P, L, Fn, BinOp, UnaryOp, Var, "Any"]  # also raw pyspark Column


@dataclass(frozen=True)
class Assign:
    path: str
    expr: Expr


@dataclass(frozen=True)
class Move:
    dst: str
    src: str


@dataclass(frozen=True)
class Delete:
    path: str
    var: bool = False  # True: delete a local variable, not a row path


@dataclass(frozen=True)
class AbortIf:
    cond: Expr


@dataclass(frozen=True)
class When:
    cond: Expr
    steps: tuple
    orelse: tuple = ()

    def __init__(self, cond: Expr, steps, orelse=()):
        object.__setattr__(self, "cond", cond)
        object.__setattr__(self, "steps", tuple(steps))
        object.__setattr__(self, "orelse", tuple(orelse))


@dataclass(frozen=True)
class LetVar:
    """Local-variable assignment statement (`risk = string!(...)`,
    `debug_data.flattened.risk = ...` — VRL locals may carry nested
    path writes). Locals live per row, per program; they never reach
    the output unless assigned to a row path."""

    path: str
    expr: Expr


@dataclass(frozen=True)
class LetErr:
    """VRL error destructuring: `val, err = f(...)` (locals) or
    `.path, err = f(...)` (row paths, val_row=True). Our function
    builders are try_* (null on error), so err is approximated as
    'error' when the call yields null — the `err == null` guard
    pattern (zeek dns ip_pton) behaves identically. `_` discards."""

    val_path: str | None
    err_path: str | None
    expr: Expr
    val_row: bool = False


@dataclass(frozen=True)
class ExprStmt:
    """Bare expression statement (`string!(.x)` on its own line):
    VRL evaluates and discards; with infallible try_* builders this
    compiles to a no-op. The parser rewrites a PROGRAM-trailing
    expression (select_table_from_payload programs return their last
    expression) into Assign('__vrl_result', expr) instead."""

    expr: Expr


@dataclass(frozen=True)
class Multi:
    """Several steps emitted by one statement (chained assignment
    `.a = .b = expr`)."""

    steps: tuple


@dataclass(frozen=True, eq=False)
class ForEach:
    """Statement-position `for_each(coll) -> |i_or_k, v| { steps }`
    with outer-variable mutation — compiled to ONE JVM-side
    F.aggregate fold whose accumulator is a struct of the mutated
    targets (see compiler._for_each)."""

    coll: Any
    params: tuple
    steps: tuple

    def __init__(self, coll, params, steps):
        object.__setattr__(self, "coll", coll)
        object.__setattr__(self, "params", tuple(params))
        object.__setattr__(self, "steps", tuple(steps))


Step = Union[Assign, Move, Delete, AbortIf, When, LetVar, LetErr, ForEach, "Enrich"]


@dataclass(frozen=True, eq=False)
class Enrich:
    """get_enrichment_table_record as a pipeline step (ref:
    shared/src/functions.rs:108-255): look up `on` equality keys in an
    enrichment DataFrame and bind the (projected) record struct at
    `target` — null on miss. Compiles to a broadcast left join between
    two projection stages."""

    target: str
    table: Any  # enrichment DataFrame
    on: dict  # {row path: enrichment column}
    select: tuple = ()

    def __init__(self, target: str, table: Any, on: dict, select=()):
        object.__setattr__(self, "target", target)
        object.__setattr__(self, "table", table)
        object.__setattr__(self, "on", dict(on))
        object.__setattr__(self, "select", tuple(select))
