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
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from matano_spark.transform import ast
from matano_spark.transform.functions import build_call


class _RowState:
    """Mutable compile-time model of the row: top-level name → Column,
    plus the (evolving) struct schema used to resolve path reads."""

    def __init__(self, df: DataFrame):
        # backtick-escape so literally-dotted column names (zeek's
        # id.orig_h) resolve as single columns, not nested paths
        self.cols: dict[str, Column] = {
            name: F.col(f"`{name}`") for name in df.columns
        }
        self.schema: dict[str, T.DataType] = {
            f.name: f.dataType for f in df.schema.fields
        }
        self.filters: list[Column] = []

    # -- reads ---------------------------------------------------------
    def get(self, parts: tuple[str, ...]) -> Column:
        head, rest = parts[0], parts[1:]
        if head not in self.cols:
            return F.lit(None)
        col = self.cols[head]
        dtype = self.schema.get(head)
        for part in rest:
            if not isinstance(dtype, T.StructType):
                return F.lit(None)
            match = next((f for f in dtype.fields if f.name == part), None)
            if match is None:
                return F.lit(None)
            col = col.getField(part)
            dtype = match.dataType
        return col

    def get_type(self, parts: tuple[str, ...]) -> T.DataType | None:
        dtype = self.schema.get(parts[0])
        for part in parts[1:]:
            if not isinstance(dtype, T.StructType):
                return None
            match = next((f for f in dtype.fields if f.name == part), None)
            if match is None:
                return None
            dtype = match.dataType
        return dtype

    # -- writes --------------------------------------------------------
    def set(self, parts: tuple[str, ...], value: Column, vtype: T.DataType) -> None:
        head = parts[0]
        if len(parts) == 1:
            self.cols[head] = value
            self.schema[head] = vtype
            return
        cur_type = self.schema.get(head)
        cur_col = self.cols.get(head)
        new_col, new_type = _set_nested(cur_col, cur_type, parts[1:], value, vtype)
        self.cols[head] = new_col
        self.schema[head] = new_type

    def delete(self, parts: tuple[str, ...]) -> None:
        head = parts[0]
        if head not in self.cols:
            return
        if len(parts) == 1:
            del self.cols[head]
            del self.schema[head]
            return
        cur_type = self.schema.get(head)
        if not isinstance(cur_type, T.StructType):
            return
        new_col, new_type = _drop_nested(self.cols[head], cur_type, parts[1:])
        self.cols[head] = new_col
        self.schema[head] = new_type


def _nest(parts: tuple[str, ...], value: Column, vtype: T.DataType):
    """Build struct scaffolding holding `value` at the nested path."""
    col, dtype = value, vtype
    for part in reversed(parts):
        col = F.struct(col.alias(part))
        dtype = T.StructType([T.StructField(part, dtype)])
    return col, dtype


def _set_nested(
    cur: Column | None,
    cur_type: T.DataType | None,
    parts: tuple[str, ...],
    value: Column,
    vtype: T.DataType,
):
    if cur is None or not isinstance(cur_type, T.StructType):
        # overwrite whatever was there with fresh scaffolding
        return _nest(parts, value, vtype)
    head, rest = parts[0], parts[1:]
    match = next((f for f in cur_type.fields if f.name == head), None)
    if rest:
        child_col = cur.getField(head) if match else None
        child_type = match.dataType if match else None
        new_child, new_child_type = _set_nested(
            child_col, child_type, rest, value, vtype
        )
    else:
        new_child, new_child_type = value, vtype
    # Rebuild the struct explicitly (portable, and keeps the schema
    # model exact; withField leaves nullability/order ambiguities).
    fields = []
    out_fields: list[T.StructField] = []
    replaced = False
    for f in cur_type.fields:
        if f.name == head:
            fields.append(new_child.alias(head))
            out_fields.append(T.StructField(head, new_child_type))
            replaced = True
        else:
            fields.append(cur.getField(f.name).alias(f.name))
            out_fields.append(f)
    if not replaced:
        fields.append(new_child.alias(head))
        out_fields.append(T.StructField(head, new_child_type))
    return F.struct(*fields), T.StructType(out_fields)


def _drop_nested(cur: Column, cur_type: T.StructType, parts: tuple[str, ...]):
    head, rest = parts[0], parts[1:]
    match = next((f for f in cur_type.fields if f.name == head), None)
    if match is None:
        return cur, cur_type
    fields = []
    out_fields: list[T.StructField] = []
    for f in cur_type.fields:
        if f.name != head:
            fields.append(cur.getField(f.name).alias(f.name))
            out_fields.append(f)
        elif rest and isinstance(f.dataType, T.StructType):
            sub_col, sub_type = _drop_nested(cur.getField(head), f.dataType, rest)
            fields.append(sub_col.alias(head))
            out_fields.append(T.StructField(head, sub_type))
        # else: drop the field entirely
    if not fields:
        return F.lit(None), T.NullType()
    return F.struct(*fields), T.StructType(out_fields)


def _infer_type(value: Any) -> T.DataType:
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
            return F.lit(e.value), _infer_type(e.value)
        if isinstance(e, ast.Fn):
            args = []
            for a in e.args:
                if isinstance(a, (ast.P, ast.L, ast.Fn, ast.BinOp, ast.UnaryOp, ast.Var)):
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
            if op == "==":
                return lc == rc, T.BooleanType()
            if op == "!=":
                return lc != rc, T.BooleanType()
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
        return out.select(
            *[col.alias(name) for name, col in state.cols.items()]
        )

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
