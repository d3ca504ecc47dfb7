"""Compiler: transform-DSL steps → one Spark projection (+ filter).

Design (SURVEY.md §4 "custom Spark work #1"): the reference executes
VRL programs row-at-a-time over dynamic values; here every step is
folded into a dict of top-level Column expressions compiled against the
input schema, so the whole program becomes a single select() that
Catalyst optimizes and codegens. Row filters (VRL `abort`) accumulate
into one filter() applied before the projection — abort skips the row
(ref: transformer/src/main.rs:905-916 abort-as-skip).

Path semantics:
- reads of missing paths yield null (VRL missing ≡ null;
  ref: detection/util.py:131-132)
- writes create intermediate structs as needed (`.a.b.c = v` scaffolds
  a and a.b); writing into a null-but-typed struct replaces it
- When(cond, ...) applies each inner write conditionally:
  new = CASE WHEN cond THEN value ELSE old END

Compile-time representation: struct-valued columns being written are
held as a lazy TREE of child Columns (exploded from the source struct
once, on first write), and folded back into one F.struct() only at
the final projection. Rebuilding the full struct expression on every
nested assignment instead (the naive approach) duplicates the prior
expression once per sibling field, i.e. grows the Catalyst tree
EXPONENTIALLY in the number of sequential writes — a 60-assign program
like okta's took minutes to analyze; the tree form is linear.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from matano_spark.transform import ast
from matano_spark.transform.functions import build_call


class _Leaf:
    """An unexploded column expression + its (best-effort) type."""

    __slots__ = ("col", "dtype")

    def __init__(self, col: Column, dtype: T.DataType | None):
        self.col = col
        self.dtype = dtype


class _Tree:
    """A struct being edited: child name → _Leaf | _Tree."""

    __slots__ = ("children",)

    def __init__(self, children: dict | None = None):
        self.children: dict[str, _Leaf | _Tree] = children or {}


def _explode(node: _Leaf) -> _Tree:
    """Leaf struct → tree of per-field leaves. Each child references the
    parent expression once (getField), so repeated writes after the
    explode never re-copy siblings."""
    if not isinstance(node.dtype, T.StructType):
        # non-struct (or unknown) value being written through: VRL
        # overwrite semantics — start fresh scaffolding
        return _Tree()
    return _Tree(
        {
            f.name: _Leaf(node.col.getField(f.name), f.dataType)
            for f in node.dtype.fields
        }
    )


def _materialize(node) -> tuple[Column, T.DataType]:
    if isinstance(node, _Leaf):
        return node.col, node.dtype if node.dtype is not None else T.StringType()
    if not node.children:
        return F.lit(None), T.NullType()
    cols, fields = [], []
    for name, child in node.children.items():
        c, t = _materialize(child)
        cols.append(c.alias(name))
        fields.append(T.StructField(name, t))
    return F.struct(*cols), T.StructType(fields)


class _RowState:
    """Mutable compile-time model of the row: top-level name → node
    (lazy tree for structs under edit, plain leaf otherwise)."""

    def __init__(self, df: DataFrame):
        # backtick-escape so literally-dotted column names (zeek's
        # id.orig_h) resolve as single columns, not nested paths
        self.nodes: dict[str, _Leaf | _Tree] = {
            f.name: _Leaf(F.col(f"`{f.name}`"), f.dataType)
            for f in df.schema.fields
        }
        self.filters: list[Column] = []

    # -- reads ---------------------------------------------------------
    def _node(self, parts: tuple[str, ...]):
        """Walk to the node at `parts`; returns _Leaf | _Tree | None.
        Descending through an unexploded leaf struct follows getField
        without exploding (reads don't mutate). Descending INTO a
        VariantType leaf (parse_json without schema, `variant` input
        fields) compiles the remaining path to try_variant_get — the
        VRL dynamic-object read on semi-structured data."""
        node = self.nodes.get(parts[0])
        for i, part in enumerate(parts[1:], start=1):
            if node is None:
                return None
            if isinstance(node, _Tree):
                node = node.children.get(part)
                continue
            dtype = node.dtype
            if isinstance(dtype, T.VariantType):
                path = "$." + ".".join(parts[i:])
                return _Leaf(
                    F.try_variant_get(node.col, path, "string"),
                    T.StringType(),
                )
            if isinstance(dtype, T.MapType):
                # map member read (parse_key_value output): one key per
                # remaining path step
                col = node.col
                for p in parts[i:]:
                    col = F.element_at(col, p)
                return _Leaf(col, dtype.valueType)
            if not isinstance(dtype, T.StructType):
                return None
            match = next((f for f in dtype.fields if f.name == part), None)
            if match is None:
                return None
            node = _Leaf(node.col.getField(part), match.dataType)
        return node

    def get(self, parts: tuple[str, ...]) -> Column:
        node = self._node(parts)
        if node is None:
            return F.lit(None)
        return _materialize(node)[0]

    def get_type(self, parts: tuple[str, ...]) -> T.DataType | None:
        node = self._node(parts)
        if node is None:
            return None
        if isinstance(node, _Leaf):
            return node.dtype
        return _materialize(node)[1]

    # -- writes --------------------------------------------------------
    def _tree_at(self, parts: tuple[str, ...]) -> _Tree:
        """Walk/create the tree at `parts`, exploding leaves in place."""
        node = self.nodes.get(parts[0])
        if not isinstance(node, _Tree):
            node = _explode(node) if isinstance(node, _Leaf) else _Tree()
            self.nodes[parts[0]] = node
        for part in parts[1:]:
            child = node.children.get(part)
            if not isinstance(child, _Tree):
                child = _explode(child) if isinstance(child, _Leaf) else _Tree()
                node.children[part] = child
            node = child
        return node

    def set(self, parts: tuple[str, ...], value: Column, vtype: T.DataType) -> None:
        leaf = _Leaf(value, vtype)
        if len(parts) == 1:
            self.nodes[parts[0]] = leaf
            return
        self._tree_at(parts[:-1]).children[parts[-1]] = leaf

    def delete(self, parts: tuple[str, ...]) -> None:
        if len(parts) == 1:
            self.nodes.pop(parts[0], None)
            return
        # only explode if the path actually exists
        if self._node(parts) is None:
            return
        self._tree_at(parts[:-1]).children.pop(parts[-1], None)

    # -- output --------------------------------------------------------
    def columns(self) -> list[Column]:
        out = []
        for name, node in self.nodes.items():
            col, dtype = _materialize(node)
            if isinstance(node, _Tree) and isinstance(dtype, T.NullType):
                col = col.cast(T.StringType())  # empty struct remnant
            out.append(col.alias(name))
        return out


def _infer_type(value: Any) -> T.DataType:
    if value is None:
        # typed as NULL so ternary/coalesce arms adopt the OTHER arm's
        # type instead of unifying everything to string
        return T.NullType()
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, str):
        return T.StringType()
    return T.StringType()


class Compiler:
    def __init__(self, state: _RowState):
        self.state = state
        self.env: dict[str, tuple[Column, T.DataType | None]] = {}

    def _compile_lambda(self, lam: ast.Lambda):
        """ast.Lambda → typed callable evaluated with params bound in
        self.env (the builders call it per element/leaf)."""
        from matano_spark.transform.functions import TypedLambda

        def call(*typed_args):
            # accepts (col, dtype) pairs — one per closure param
            saved = {p: self.env.get(p) for p in lam.params}
            for p, (c, t) in zip(lam.params, typed_args):
                self.env[p] = (c, t)
            try:
                return self.expr(lam.body)
            finally:
                for p, old in saved.items():
                    if old is None:
                        self.env.pop(p, None)
                    else:
                        self.env[p] = old

        return TypedLambda(call, n_params=len(lam.params))

    # expression → (Column, best-effort DataType)
    def expr(self, e: Any) -> tuple[Column, T.DataType]:
        if isinstance(e, ast.Var):
            if e.name not in self.env:
                raise ValueError(f"unbound variable {e.name!r}")
            c, t = self.env[e.name]
            return c, t or T.StringType()
        if isinstance(e, ast.P):
            return self.state.get(e.parts), self.state.get_type(e.parts) or T.StringType()
        if isinstance(e, ast.L):
            if isinstance(e.value, list):
                et = (
                    _infer_type(e.value[0]) if e.value else T.StringType()
                )
                out_t = T.ArrayType(et)
                if not e.value:
                    return F.array().cast(out_t), out_t
                return (
                    F.array(*[F.lit(v).cast(et) for v in e.value]),
                    out_t,
                )
            return F.lit(e.value), _infer_type(e.value)
        if isinstance(e, ast.Fn):
            args = []
            for a in e.args:
                if isinstance(a, ast.L):
                    # literals reach builders RAW ((value, type)) so
                    # separator/pattern args keep their python string;
                    # functions._c lifts to F.lit when a Column is needed
                    args.append((a.value, _infer_type(a.value)))
                elif isinstance(a, (ast.P, ast.Fn, ast.BinOp, ast.UnaryOp, ast.Var)):
                    args.append(self.expr(a))
                else:
                    args.append((a, None))
            kwargs = {
                k: self._compile_lambda(v) if isinstance(v, ast.Lambda) else v
                for k, v in e.kwargs.items()
            }
            return build_call(e.name, args, kwargs)
        if isinstance(e, ast.BinOp):
            lc, lt = self.expr(e.left)
            rc, rt = self.expr(e.right)
            op = e.op
            # VRL `x == null` / `x != null` are IS NULL checks, not SQL
            # three-valued comparisons
            lnull = isinstance(e.left, ast.L) and e.left.value is None
            rnull = isinstance(e.right, ast.L) and e.right.value is None
            if op == "==" and (lnull or rnull):
                return (rc if lnull else lc).isNull(), T.BooleanType()
            if op == "!=" and (lnull or rnull):
                return (rc if lnull else lc).isNotNull(), T.BooleanType()
            # VRL equality is VALUE equality (null is a comparable
            # value): `null != "x"` is true, not SQL-NULL
            if op == "==":
                return lc.eqNullSafe(rc), T.BooleanType()
            if op == "!=":
                return ~lc.eqNullSafe(rc), T.BooleanType()
            if op == ">":
                return lc > rc, T.BooleanType()
            if op == ">=":
                return lc >= rc, T.BooleanType()
            if op == "<":
                return lc < rc, T.BooleanType()
            if op == "<=":
                return lc <= rc, T.BooleanType()
            if op == "&":
                return lc & rc, T.BooleanType()
            if op == "|":
                return lc | rc, T.BooleanType()
            if op == "+":
                return lc + rc, lt
            if op == "-":
                return lc - rc, lt
            if op == "*":
                return lc * rc, lt
            if op == "/":
                return lc / rc, T.DoubleType()
            if op == "%":
                return lc % rc, lt
            raise ValueError(f"unknown op {op}")
        if isinstance(e, ast.UnaryOp):
            c, _ = self.expr(e.operand)
            if e.op == "!":
                return ~c, T.BooleanType()
            raise ValueError(f"unknown unary op {e.op}")
        if isinstance(e, Column):
            return e, T.StringType()
        return F.lit(e), _infer_type(e)

    def run(self, steps: Iterable[ast.Step], cond: Column | None = None) -> None:
        for step in steps:
            self.step(step, cond)

    def step(self, step: ast.Step, cond: Column | None) -> None:
        s = self.state
        if isinstance(step, ast.Assign):
            parts = ast.split_path(step.path)
            # conditional self-append (`if c { .p = push(.p, v) }`) is the
            # dominant shape in managed-source transforms (ECS category/
            # type tagging). The generic form CASE WHEN c THEN push(old,v)
            # ELSE old END embeds `old` twice, doubling the expression per
            # step (2^n over a transform's tag chain). Compile it instead
            # to old ++ compact([CASE WHEN c THEN v END]) — `old` appears
            # once and growth stays linear.
            if (
                cond is not None
                and isinstance(step.expr, ast.Fn)
                and step.expr.name in ("push", "append")
                and step.expr.args
                and isinstance(step.expr.args[0], ast.P)
                and step.expr.args[0].parts == tuple(parts)
            ):
                old = s.get(parts)
                oldt = s.get_type(parts)
                v, vt = self.expr(step.expr.args[1])
                if step.expr.name == "push":
                    et = (
                        oldt.elementType
                        if isinstance(oldt, T.ArrayType)
                        else (vt or T.StringType())
                    )
                    out_t = T.ArrayType(et)
                    tail = F.array(v)
                else:  # append: second arg is already an array
                    out_t = (
                        oldt
                        if isinstance(oldt, T.ArrayType)
                        else (vt if isinstance(vt, T.ArrayType) else T.ArrayType(T.StringType()))
                    )
                    tail = F.coalesce(v, F.array().cast(out_t))
                empty = F.array().cast(out_t)
                # When the guard is FALSE the assignment never ran in
                # VRL: the target keeps its old value (null stays null —
                # NOT coalesced to []). Built so `old` appears ONCE:
                # chained conditional pushes (o365's event.type chain)
                # would otherwise double the expression per step.
                # concat propagates null: old null + guard false →
                # coalesce picks the null branch → whole concat null.
                value = F.concat(
                    F.coalesce(old, F.when(cond, empty)),
                    F.when(cond, tail).otherwise(empty),
                )
                s.set(parts, value, out_t)
                return
            value, vtype = self.expr(step.expr)
            if cond is not None:
                old = s.get(parts)
                value = F.when(cond, value).otherwise(old)
            s.set(parts, value, vtype)
        elif isinstance(step, ast.Move):
            dst = ast.split_path(step.dst)
            src = ast.split_path(step.src)
            value = s.get(src)
            vtype = s.get_type(src) or T.StringType()
            if cond is not None:
                value = F.when(cond, value).otherwise(s.get(dst))
            s.set(dst, value, vtype)
            if cond is None:
                s.delete(src)
        elif isinstance(step, ast.Delete):
            if cond is not None:
                raise ValueError("Delete inside When is not supported; assign null")
            s.delete(ast.split_path(step.path))
        elif isinstance(step, ast.AbortIf):
            c, _ = self.expr(step.cond)
            if cond is not None:
                c = cond & c
            s.filters.append(~F.coalesce(c, F.lit(False)))
        elif isinstance(step, ast.When):
            c, _ = self.expr(step.cond)
            c = F.coalesce(c, F.lit(False))
            inner = c if cond is None else (cond & c)
            self.run(step.steps, inner)
            if step.orelse:
                neg = ~c if cond is None else (cond & ~c)
                self.run(step.orelse, neg)
        else:
            raise TypeError(f"unknown step {step!r}")


def compile_pipeline(steps: Iterable[ast.Step]):
    """Compile steps into a DataFrame -> DataFrame transformation.

    One filter() (all aborts) + one select() (all writes) per stage;
    Enrich steps split the program into stages joined by broadcast
    lookups (VRL's get_enrichment_table_record boundary). The program
    compiles per input schema — the analog of the reference's
    per-(source, schema) VRL program cache.
    """
    steps = tuple(steps)
    stages: list[tuple] = []
    cur: list = []
    for s in steps:
        if isinstance(s, ast.Enrich):
            stages.append(("steps", tuple(cur)))
            cur = []
            stages.append(("enrich", s))
        else:
            cur.append(s)
    stages.append(("steps", tuple(cur)))

    def apply_steps(df: DataFrame, stage_steps) -> DataFrame:
        state = _RowState(df)
        Compiler(state).run(stage_steps)
        out = df
        for f in state.filters:
            out = out.filter(f)
        return out.select(*state.columns())

    def apply_enrich(df: DataFrame, step: ast.Enrich) -> DataFrame:
        from matano_spark.operators.enrichment import enrich

        # row paths may be nested — materialize join keys as columns
        keyed = df
        tmp_keys = {}
        for i, row_path in enumerate(step.on):
            tmp = f"__ek_{i}"
            state = _RowState(df)
            keyed = keyed.withColumn(
                tmp, state.get(tuple(ast.split_path(row_path)))
            )
            tmp_keys[tmp] = step.on[row_path]
        out = enrich(
            keyed,
            step.table,
            on=tmp_keys,
            select=list(step.select) or None,
            target=step.target,
        )
        return out.drop(*tmp_keys.keys())

    def apply(df: DataFrame) -> DataFrame:
        out = df
        for kind, payload in stages:
            if kind == "steps":
                if payload:
                    out = apply_steps(out, payload)
            else:
                out = apply_enrich(out, payload)
        return out

    return apply
