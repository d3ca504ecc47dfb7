"""Scalar function library — the VRL surface actually used by the
reference's 26 managed sources + 5 enrichments (SURVEY.md §2.3 table;
counts from grep over data/managed/**/*.yml), each mapped to built-in
Spark expressions (JVM-side, codegen'd — no Python UDFs).

Every builder takes [(Column, DataType|None), ...] compiled args plus
kwargs, and returns (Column, DataType) so the pipeline compiler can
track the evolving row schema. Fallible VRL variants (`to_int!` vs
`to_int`) map to try_* / null-on-error expressions — VRL's
error-coalescing `??` is then plain F.coalesce.
"""

from __future__ import annotations

import re
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from matano_spark.transform import grok as grok_mod

Arg = tuple[Column, "T.DataType | None"]
Builder = Callable[..., tuple[Column, T.DataType]]

REGISTRY: dict[str, Builder] = {}


def fn(name: str):
    def deco(f: Builder) -> Builder:
        REGISTRY[name] = f
        return f

    return deco


# builders that understand VARIANT-typed args natively (schemaless
# `.json.*` reads); everything else gets the scalar concretization
# (cast to string — the pre-variant behavior) applied in build_call
VARIANT_AWARE = {
    "to_timestamp",
    "is_string",
    "is_integer",
    "is_float",
    "is_boolean",
    "get",
    "join",
    "filter",
    "map_each",
    "map_values",
    "map_keys",
    "object_keys",
    "object_values",
    "merge",
    "flatten",
    "compact",
    "unique",
    "push",
    "append",
    "includes",
    "length",
    "array",
    "object",
    "is_array",
    "is_object",
    "is_empty",
    "array_max",
    "array_min",
    "encode_json",
    "coalesce",
    "ternary",
    # set stores VARIANT values into map<string,variant> objects —
    # the build_call funnel would render array/object values as JSON
    # text (google_workspace admin's API_SCOPES multiValue)
    "set",
}


def build_call(name: str, args: list[Arg], kwargs: dict[str, Any]):
    if name not in REGISTRY:
        raise KeyError(f"unknown transform function {name!r}")
    if name not in VARIANT_AWARE:
        args = [
            (a[0].cast("string"), T.StringType())
            if isinstance(a[1], T.VariantType) and isinstance(a[0], Column)
            else a
            for a in args
        ]
    return REGISTRY[name](args, kwargs)


def _c(a: Arg) -> Column:
    v = a[0]
    if isinstance(a[1], T.VariantType) and isinstance(v, Column):
        return v.cast("string")
    return v if isinstance(v, Column) else F.lit(v)


def _t(a: Arg) -> T.DataType | None:
    return a[1]


def _cv(a: Arg) -> Column:
    """The raw column WITHOUT variant concretization (for builders
    that re-extract structured forms)."""
    v = a[0]
    return v if isinstance(v, Column) else F.lit(v)


def _as_array(a: Arg, elem: str = "string") -> Arg:
    """Concretize an arg to an array: variants re-extract via
    try_variant_get, arrays pass through, null/absent and non-arrays
    become a typed null array (VRL fallible-array semantics)."""
    c, t = a
    if not isinstance(c, Column):
        c = F.lit(c)
    if isinstance(t, T.VariantType):
        et = T.VariantType() if elem == "variant" else T.StringType()
        return F.try_variant_get(c, "$", f"array<{elem}>"), T.ArrayType(et)
    if isinstance(t, T.ArrayType):
        return c, t
    return F.lit(None).cast("array<string>"), T.ArrayType(T.StringType())


def _as_map(a: Arg) -> Arg:
    """Concretize an arg to a map: variants re-extract the object
    form, maps pass through; anything else → typed null map. Struct
    args stay structs (callers branch on that first)."""
    c, t = a
    if not isinstance(c, Column):
        c = F.lit(c)
    if isinstance(t, T.VariantType):
        return (
            F.try_variant_get(c, "$", "map<string,variant>"),
            T.MapType(T.StringType(), T.VariantType()),
        )
    if isinstance(t, T.MapType):
        return c, t
    return (
        F.lit(None).cast("map<string,string>"),
        T.MapType(T.StringType(), T.StringType()),
    )


class TypedLambda:
    """Compiled VRL closure: call with (col, dtype) pairs per param,
    returns (Column, DataType). Builders that accept plain
    Column→Column lambdas should route through `apply_value_fn`."""

    def __init__(self, fn, n_params: int = 1):
        self.fn = fn
        self.n_params = n_params

    def __call__(self, *typed_args):
        return self.fn(*typed_args)


def apply_value_fn(f, col: Column, dtype: T.DataType | None):
    """Uniformly apply either a TypedLambda or a plain Column lambda."""
    if isinstance(f, TypedLambda):
        return f((col, dtype))
    return f(col), dtype


def _unify(args: list[Arg]) -> list[Arg]:
    """VRL is dynamically typed; when branches/coalesce arms disagree
    statically, fall back to string (the schema cast re-types later)."""
    known = {t.simpleString() for _, t in args if t is not None and not isinstance(t, T.NullType)}
    if len(known) <= 1:
        return args
    typed = [t for _, t in args if t is not None and not isinstance(t, T.NullType)]
    def _simple_elem(t):
        return isinstance(t, T.ArrayType) and not isinstance(
            t.elementType, (T.StructType, T.MapType, T.ArrayType)
        )

    # `x` vs `[x]` rebinding arms (o365's `if is_array(x) {x} else
    # {[x]}` over a statically-array x): the arm types differ by ONE
    # nesting level and only one executes per row — unify on
    # array<variant> so each arm keeps its runtime kind instead of
    # force-casting the flat arm into a nested array
    if all(isinstance(t, T.ArrayType) for t in typed) and any(
        isinstance(b.elementType, T.ArrayType)
        and any(
            b.elementType.simpleString() == a.simpleString() for a in typed
        )
        for b in typed
    ):
        at = T.ArrayType(T.VariantType())
        return [
            (
                a[0]
                if _t(a) is not None
                and _t(a).simpleString() == at.simpleString()
                else _cv(a).cast(at.simpleString()),
                at,
            )
            for a in args
        ]
    cplx = {
        t.elementType.simpleString(): t
        for t in typed
        if isinstance(t, T.ArrayType) and not _simple_elem(t)
    }
    if (
        len(cplx) == 1
        and all(isinstance(t, T.ArrayType) for t in typed)
    ):
        # one complex-element array + empty/simple defaults
        # (`mapped ?? []`): unify on the complex shape — the empty
        # literal casts to any array type
        at = next(iter(cplx.values()))
        return [
            (a[0], at)
            if _t(a) is not None and _t(a).simpleString() == at.simpleString()
            else (_cv(a).cast(at.simpleString()), at)
            for a in args
        ]
    if all(
        isinstance(t, T.VariantType) or _simple_elem(t) for t in typed
    ):
        # disagreeing collection arms (array<variant> ?? []): unify on
        # array<variant> instead of stringifying — downstream
        # map_values/for_each need the array shape
        at = T.ArrayType(T.VariantType())
        return [
            (_as_array(a, "variant")[0], at)
            if isinstance(_t(a), T.VariantType)
            else (_cv(a).cast("array<variant>"), at)
            for a in args
        ]
    if all(
        isinstance(t, T.VariantType)
        or (
            isinstance(t, T.MapType)
            and not isinstance(
                t.valueType, (T.StructType, T.MapType, T.ArrayType)
            )
        )
        for t in typed
    ):
        mt = T.MapType(T.StringType(), T.VariantType())
        return [
            (_as_map(a)[0], mt)
            if isinstance(_t(a), T.VariantType)
            else (_cv(a).cast("map<string,variant>"), mt)
            for a in args
        ]
    return [(_c(a).cast("string"), T.StringType()) for a in args]


# -- casts (to_int 330 / to_float / to_bool / to_string uses) ---------------


@fn("to_int")
def _to_int(args, kw):
    return _c(args[0]).try_cast("bigint"), T.LongType()


@fn("int")
def _int(args, kw):
    return _c(args[0]).cast("bigint"), T.LongType()


@fn("to_float")
def _to_float(args, kw):
    return _c(args[0]).try_cast("double"), T.DoubleType()


@fn("float")
def _float(args, kw):
    return _c(args[0]).cast("double"), T.DoubleType()


@fn("to_bool")
def _to_bool(args, kw):
    c = _c(args[0])
    if isinstance(_t(args[0]), T.StringType) or _t(args[0]) is None:
        lowered = F.lower(c)
        return (
            F.when(lowered.isin("true", "t", "yes", "y", "1"), F.lit(True))
            .when(lowered.isin("false", "f", "no", "n", "0"), F.lit(False))
            .otherwise(c.try_cast("boolean")),
            T.BooleanType(),
        )
    return c.try_cast("boolean"), T.BooleanType()


@fn("to_string")
def _to_string(args, kw):
    return _c(args[0]).cast("string"), T.StringType()


@fn("string")
def _string(args, kw):
    return _c(args[0]).cast("string"), T.StringType()


# -- timestamps (to_timestamp 302 / parse_timestamp 32 uses) ----------------

_STRF_TO_JAVA = [
    ("%Y", "yyyy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%f", "SSSSSS"),
    ("%3f", "SSS"),
    ("%z", "XX"),
    ("%:z", "XXX"),
    ("%Z", "zz"),
    ("%b", "MMM"),
    ("%B", "MMMM"),
    ("%a", "EEE"),
    ("%A", "EEEE"),
    ("%e", "d"),
    ("%j", "DDD"),
    ("%T", "HH:mm:ss"),
]


def strftime_to_java(fmt: str) -> str:
    out = fmt
    for a, b in _STRF_TO_JAVA:
        out = out.replace(a, b)
    return out


@fn("to_timestamp")
def _to_timestamp(args, kw):
    """Epoch seconds/millis/nanos (unit kwarg, default seconds) for
    numerics; ISO-ish strings parse directly (ref: VRL to_timestamp;
    transformer/src/avro.rs:52 micros precision)."""
    c, t = args[0]
    unit = (
        args[1][0]
        if len(args) > 1 and isinstance(args[1][0], str)
        else kw.get("unit", "seconds")
    )
    def _from_num(n):
        if unit == "seconds":
            return F.timestamp_seconds(n)
        if unit == "milliseconds":
            return F.timestamp_millis(n.cast("bigint"))
        if unit == "microseconds":
            return F.timestamp_micros(n.cast("bigint"))
        if unit == "nanoseconds":
            return F.timestamp_micros((n.cast("bigint") / 1000).cast("bigint"))
        raise ValueError(f"bad unit {unit}")

    def _from_str(s):
        # VRL to_timestamp accepts the well-known non-ISO layouts too
        # (chrono-parsed): CLF access-log dates (aws_s3access
        # `06/Feb/2019:00:00:38 +0000`) and RFC 2822
        return F.coalesce(
            F.try_to_timestamp(s),
            F.try_to_timestamp(s, F.lit("dd/MMM/yyyy:HH:mm:ss Z")),
            # RFC 2822: Spark's parser rejects 'EEE' in parse mode —
            # strip the weekday prefix and parse the rest
            F.try_to_timestamp(
                F.regexp_replace(s, r"^[A-Za-z]{3},\s*", ""),
                F.lit("dd MMM yyyy HH:mm:ss Z"),
            ),
        )

    if isinstance(t, T.TimestampType):
        return c, t  # already a timestamp (falcon re-runs the dichotomy)
    if isinstance(t, T.VariantType):
        # a variant holds either a JSON number (unit applies) or a
        # datetime string (parse) — the old string funnel turned
        # falcon/kerberos epoch numbers into unparseable strings
        num = F.try_variant_get(c, "$", "double")
        return (
            F.when(num.isNotNull(), _from_num(num)).otherwise(
                _from_str(c.cast("string"))
            ),
            T.TimestampType(),
        )
    if isinstance(t, (T.LongType, T.IntegerType, T.DoubleType, T.FloatType)):
        return _from_num(c), T.TimestampType()
    return _from_str(c), T.TimestampType()


@fn("parse_timestamp")
def _parse_timestamp(args, kw):
    # VRL passes the format positionally (`parse_timestamp!(x, "%Y...")`,
    # panw traffic :291) or as `format:` kwarg
    fmt = kw.get("format")
    if fmt is None and len(args) > 1 and isinstance(args[1][0], str):
        fmt = args[1][0]
    java = strftime_to_java(fmt) if fmt else None
    c = _c(args[0])
    if java:
        return F.try_to_timestamp(c, F.lit(java)), T.TimestampType()
    return F.try_to_timestamp(c), T.TimestampType()


@fn("to_unix_timestamp")
def _to_unix(args, kw):
    # unit as kwarg or VRL positional second arg
    unit = (
        args[1][0]
        if len(args) > 1 and isinstance(args[1][0], str)
        else kw.get("unit", "seconds")
    )
    c = _c(args[0])
    if unit == "seconds":
        return c.cast("long") if False else F.unix_timestamp(c), T.LongType()
    if unit == "milliseconds":
        return (F.unix_micros(c) / 1000).cast("bigint"), T.LongType()
    if unit == "microseconds":
        return F.unix_micros(c), T.LongType()
    if unit == "nanoseconds":
        return F.unix_micros(c) * 1000, T.LongType()
    raise ValueError(f"bad unit {unit}")


@fn("now")
def _now(args, kw):
    return F.current_timestamp(), T.TimestampType()


# -- strings ----------------------------------------------------------------


@fn("downcase")
def _downcase(args, kw):
    return F.lower(_c(args[0])), T.StringType()


@fn("upcase")
def _upcase(args, kw):
    return F.upper(_c(args[0])), T.StringType()


@fn("strip_whitespace")
def _strip(args, kw):
    return F.trim(_c(args[0])), T.StringType()


@fn("split")
def _split(args, kw):
    if kw.get("pattern") is not None:
        sep = kw["pattern"]  # kwarg form: regex, as documented
    else:
        from matano_spark.transform.ast import RegexLit

        raw = args[1][0]
        # VRL string separators are LITERAL (split(s, ".") splits on
        # dots, not on every char) — escape before F.split's regex;
        # r'...' literals stay patterns
        if isinstance(raw, RegexLit):
            sep = str(raw)
        elif isinstance(raw, str):
            sep = re.escape(raw)
        else:
            # runtime separator COLUMN (fdr splits a path by its own
            # first character, '\\'): still a literal per VRL — quote
            # with \Q..\E so F.split's regex engine can't choke on it
            sep = F.concat(F.lit("\\Q"), _c(args[1]), F.lit("\\E"))
    limit = kw.get("limit", -1)
    if len(args) > 2:  # VRL positional limit
        limit = args[2][0] if isinstance(args[2][0], int) else limit
    if (
        isinstance(args[0][0], str)
        and isinstance(raw, str)
        and not isinstance(raw, RegexLit)
    ):
        # constant-fold a fully-literal split: zeek's dotted-key
        # unflatten `set(.o, split("id.orig_p", "."), v)` needs the
        # path as a compile-time list for the static struct rebuild
        parts = (
            args[0][0].split(raw)
            if limit == -1
            else args[0][0].split(raw, limit - 1)
        )
        return parts, T.ArrayType(T.StringType())
    return F.split(_c(args[0]), sep, limit), T.ArrayType(T.StringType())


@fn("replace")
def _replace(args, kw):
    c = _c(args[0])
    # VRL positional form replace(value, pattern, with) or kwargs
    pattern = args[1][0] if len(args) > 1 else kw.get("pattern")
    with_ = args[2][0] if len(args) > 2 else kw.get("with", "")
    if pattern is None:
        raise ValueError("replace requires a pattern arg or pattern= kwarg")
    from matano_spark.transform.ast import RegexLit

    if kw.get("regex", False) or isinstance(pattern, RegexLit):
        # VRL regex-literal pattern (r'...') → regexp replace; VRL
        # capture refs use $1 while Spark wants $1 too — compatible
        return F.regexp_replace(c, str(pattern), with_), T.StringType()
    pattern = pattern if isinstance(pattern, Column) else F.lit(pattern)
    with_ = with_ if isinstance(with_, Column) else F.lit(with_)
    return F.replace(c, pattern, with_), T.StringType()


@fn("slice")
def _slice(args, kw):
    """VRL slice(value, start[, end]) — positional or start=/end= kwargs;
    negative indices count from the end (python/VRL semantics)."""
    c, t = args[0]
    start = _c(args[1]) if len(args) > 1 else F.lit(kw.get("start", 0))
    end = (
        _c(args[2])
        if len(args) > 2
        else (F.lit(kw["end"]) if kw.get("end") is not None else None)
    )
    n = F.size(c) if isinstance(t, T.ArrayType) else F.length(c)
    abs_start = F.when(start < 0, F.greatest(n + start, F.lit(0))).otherwise(start)
    if end is None:
        abs_end = n
    else:
        abs_end = F.when(end < 0, n + end).otherwise(F.least(end, n))
    length = F.greatest(abs_end - abs_start, F.lit(0))
    if isinstance(t, T.ArrayType):
        return F.slice(c, abs_start + 1, length), t
    return F.substr(c, abs_start + 1, length), T.StringType()


@fn("contains")
def _contains(args, kw):
    if kw.get("case_sensitive", True):
        return F.contains(_c(args[0]), _c(args[1])), T.BooleanType()
    return (
        F.contains(F.lower(_c(args[0])), F.lower(_c(args[1]))),
        T.BooleanType(),
    )


@fn("starts_with")
def _starts(args, kw):
    return F.startswith(_c(args[0]), _c(args[1])), T.BooleanType()


@fn("ends_with")
def _ends(args, kw):
    return F.endswith(_c(args[0]), _c(args[1])), T.BooleanType()


@fn("match")
def _match(args, kw):
    # kwarg form match(x, pattern: '...') or verbatim positional
    # match(x, r'...') (the parser lowers r-literals to strings)
    pat = args[1][0] if len(args) > 1 else kw["pattern"]
    return _c(args[0]).rlike(pat), T.BooleanType()


@fn("is_empty")
def _is_empty(args, kw):
    c, t = args[0]
    if isinstance(t, T.VariantType):
        s = c.cast("string")
        return (
            c.isNull() | s.isin("", "[]", "{}", '""'),
            T.BooleanType(),
        )
    if isinstance(t, (T.ArrayType, T.MapType)):
        return F.coalesce(F.size(c) == 0, F.lit(True)), T.BooleanType()
    if isinstance(t, T.StructType):
        return F.lit(len(t.fields) == 0), T.BooleanType()
    return F.coalesce(F.length(c.cast("string")) == 0, F.lit(True)), T.BooleanType()


@fn("match_any")
def _match_any(args, kw):
    # patterns kwarg or VRL positional list of r'...' literals
    pats = (
        args[1][0]
        if len(args) > 1 and isinstance(args[1][0], list)
        else kw["patterns"]
    )
    out = F.lit(False)
    for p in pats:
        out = out | _c(args[0]).rlike(p)
    return out, T.BooleanType()


@fn("find")
def _find(args, kw):
    """VRL find: byte index of substring, -1 when absent. The pattern
    arrives positionally (suricata eve.yml:265 `find!(.x, ".")`) or as
    the `substring:` kwarg."""
    pat = kw.get("substring")
    if pat is None and len(args) > 1:
        pat = args[1][0]
    if isinstance(pat, Column):
        raise ValueError("find() requires a literal pattern")
    return (F.locate(str(pat), _c(args[0])) - 1).cast("bigint"), T.LongType()


@fn("truncate")
def _truncate(args, kw):
    return F.substring(_c(args[0]), 1, kw["limit"]), T.StringType()


def _static_type_check(args, types) -> tuple[Column, T.DataType]:
    """VRL is_string/is_integer/…: answered statically from the schema
    (non-null value of the right static type)."""
    c, t = args[0]
    ok = t is not None and isinstance(t, types)
    return (c.isNotNull() & F.lit(ok)), T.BooleanType()


def _variant_type_check(a: Arg, names: tuple[str, ...]):
    """Runtime type test on a VARIANT value via schema_of_variant —
    the static check is meaningless there (every variant used to
    funnel to string, making is_string() true for ints and flipping
    falcon's epoch-dichotomy guards)."""
    st = F.schema_of_variant(_cv(a))
    ok = F.lit(False)
    for n in names:
        ok = ok | (st == F.lit(n)) | st.startswith(n + "(")
    return (_cv(a).isNotNull() & ok), T.BooleanType()


@fn("is_string")
def _is_string(args, kw):
    if isinstance(_t(args[0]), T.VariantType):
        return _variant_type_check(args[0], ("STRING",))
    return _static_type_check(args, T.StringType)


@fn("is_integer")
def _is_integer(args, kw):
    if isinstance(_t(args[0]), T.VariantType):
        return _variant_type_check(
            args[0], ("BIGINT", "INT", "SMALLINT", "TINYINT")
        )
    return _static_type_check(
        args, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )


@fn("is_float")
def _is_float(args, kw):
    if isinstance(_t(args[0]), T.VariantType):
        return _variant_type_check(args[0], ("DOUBLE", "FLOAT", "DECIMAL"))
    return _static_type_check(args, (T.FloatType, T.DoubleType))


@fn("is_boolean")
def _is_boolean(args, kw):
    if isinstance(_t(args[0]), T.VariantType):
        return _variant_type_check(args[0], ("BOOLEAN",))
    return _static_type_check(args, T.BooleanType)


@fn("is_object")
def _is_object(args, kw):
    c, t = args[0]
    if isinstance(t, T.VariantType):  # dynamic check on variants
        return (
            F.try_variant_get(c, "$", "map<string,variant>").isNotNull(),
            T.BooleanType(),
        )
    return _static_type_check(args, (T.StructType, T.MapType))


@fn("is_array")
def _is_array(args, kw):
    c, t = args[0]
    if isinstance(t, T.VariantType):
        return (
            F.try_variant_get(c, "$", "array<variant>").isNotNull(),
            T.BooleanType(),
        )
    return _static_type_check(args, T.ArrayType)


@fn("is_nullish")
def _is_nullish(args, kw):
    """null / '' / '-' / whitespace-only (VRL is_nullish semantics)."""
    c = _c(args[0])
    s = c.cast("string")
    return (
        c.isNull() | (F.trim(s) == "") | (F.trim(s) == "-"),
        T.BooleanType(),
    )


@fn("length")
def _length(args, kw):
    c, t = args[0]
    if isinstance(t, T.VariantType):
        # dynamic dispatch: array size / object key count / string len
        return (
            F.coalesce(
                F.size(F.try_variant_get(c, "$", "array<variant>")),
                F.size(F.try_variant_get(c, "$", "map<string,variant>")),
                F.length(c.cast("string")),
            ).cast("bigint"),
            T.LongType(),
        )
    if isinstance(t, (T.ArrayType, T.MapType)):
        return F.size(c).cast("bigint"), T.LongType()
    if isinstance(t, T.StructType):
        return F.lit(len(t.fields)).cast("bigint"), T.LongType()
    return F.length(c).cast("bigint"), T.LongType()


# -- arrays -----------------------------------------------------------------


@fn("push")
def _push(args, kw):
    if isinstance(_t(args[0]), T.VariantType):
        args = [_as_array(args[0]), *args[1:]]
    arr, t = args[0]
    vt = _t(args[1])
    # keep VARIANT values raw — the _c scalar funnel would render
    # arrays/objects as JSON text (google_workspace admin pushes
    # v.multiValue read through a schemaless rebind)
    v = _cv(args[1]) if isinstance(vt, T.VariantType) else _c(args[1])
    et = t.elementType if isinstance(t, T.ArrayType) else (vt or T.StringType())
    if isinstance(et, T.StringType) and isinstance(
        vt, (T.StructType, T.ArrayType, T.MapType)
    ):
        # a string-claimed target (the `[]` placeholder) receiving a
        # complex value re-types to the value's shape (zeek's
        # answers-struct push)
        et = vt
    if isinstance(et, T.StringType) and isinstance(vt, T.VariantType):
        # a string-claimed target receiving a VARIANT keeps the
        # runtime kind — concat's string unification would render
        # variant arrays/objects as JSON text (google_workspace
        # admin pushes v.multiValue through a schemaless rebind)
        et = T.VariantType()
    out_t = T.ArrayType(et)
    base = arr
    if (
        isinstance(t, T.ArrayType)
        and t.elementType.simpleString() != et.simpleString()
    ):
        base = arr.cast(out_t.simpleString())
    safe = F.coalesce(base, F.array().cast(out_t))
    return F.concat(safe, F.array(v)), out_t


@fn("append")
def _append(args, kw):
    args = [
        _as_array(x) if isinstance(_t(x), T.VariantType) else x for x in args
    ]
    a, ta = args[0]
    b, tb = args[1]
    out_t = (
        ta
        if isinstance(ta, T.ArrayType)
        else (tb if isinstance(tb, T.ArrayType) else T.ArrayType(T.StringType()))
    )
    # one side string-claimed (the `[]` placeholder), the other
    # VARIANT elements: keep the runtime kind — string unification
    # would render variant values as JSON text (same hazard as push)
    if (
        isinstance(out_t.elementType, T.StringType)
        and any(
            isinstance(t, T.ArrayType)
            and isinstance(t.elementType, T.VariantType)
            for t in (ta, tb)
        )
    ):
        out_t = T.ArrayType(T.VariantType())

    def _side(c, t):
        if not isinstance(t, T.ArrayType):
            # scalar-claimed side: a VRL type-error arm (append
            # requires arrays), reachable only behind an is_array
            # guard that is false for this static shape (teleport
            # audit's `if is_array(.teleport.participants)` over a
            # string-inferred field) — contribute nothing, and keep
            # the coalesce type-consistent
            return F.lit(None).cast(out_t)
        if t.elementType.simpleString() != out_t.elementType.simpleString():
            c = c.cast(out_t.simpleString())
        return c

    empty = F.array().cast(out_t)
    return (
        F.concat(
            F.coalesce(_side(a, ta), empty), F.coalesce(_side(b, tb), empty)
        ),
        out_t,
    )


@fn("unique")
def _unique(args, kw):
    a = args[0]
    if isinstance(_t(a), (T.VariantType, T.NullType)):
        a = _as_array(a)
    c, t = _cv(a), _t(a) or T.ArrayType(T.StringType())
    if isinstance(t, T.ArrayType) and isinstance(t.elementType, T.VariantType):
        # variants aren't orderable — distinct over the string forms
        c = F.transform(c, lambda v: v.cast("string"))
        t = T.ArrayType(T.StringType())
    return F.array_distinct(c), t


@fn("array_max")
def _array_max(args, kw):
    """Max element of an array (VRL does this with a for_each fold —
    e.g. aws_inspector max CVSS base score; here a builtin)."""
    c, t = args[0]
    if isinstance(t, T.VariantType):
        return (
            F.array_max(F.try_variant_get(c, "$", "array<double>")),
            T.DoubleType(),
        )
    el = t.elementType if isinstance(t, T.ArrayType) else T.DoubleType()
    return F.array_max(c), el


@fn("array_min")
def _array_min(args, kw):
    c, t = args[0]
    if isinstance(t, T.VariantType):
        return (
            F.array_min(F.try_variant_get(c, "$", "array<double>")),
            T.DoubleType(),
        )
    el = t.elementType if isinstance(t, T.ArrayType) else T.DoubleType()
    return F.array_min(c), el


@fn("flatten")
def _flatten(args, kw):
    c, t = args[0]
    if isinstance(t, T.VariantType):
        c = F.try_variant_get(c, "$", "array<array<string>>")
        t = T.ArrayType(T.ArrayType(T.StringType()))
    if isinstance(t, T.NullType):
        return F.lit(None).cast("array<string>"), T.ArrayType(T.StringType())
    if isinstance(t, T.ArrayType) and isinstance(t.elementType, T.ArrayType):
        inner = t.elementType.elementType
        # VRL flatten keeps a null ELEMENT as an element ([null, "x"]
        # -> [null, "x"]); Spark's flatten null-propagates when any
        # inner array is null (panw threat's
        # `flatten([.related.user, .source.user.name])` with the
        # guarded pre-push leaving related.user a typed-null array),
        # so map null inners to [null] first.
        if isinstance(inner, T.NullType):
            inner = T.StringType()  # array<void> breaks downstream ops
        null_inner = F.array(F.lit(None).cast(inner.simpleString()))
        return (
            F.flatten(F.transform(c, lambda e: F.coalesce(e, null_inner))),
            T.ArrayType(inner),
        )
    return F.flatten(c), T.ArrayType(T.StringType())


@fn("join")
def _join(args, kw):
    # VRL positional join(arr, sep) or separator: kwarg
    sep = args[1][0] if len(args) > 1 else kw.get("separator", "")
    arr, at = _as_array(args[0])
    if not isinstance(at, T.ArrayType):
        return F.lit(None).cast("string"), T.StringType()
    if isinstance(sep, Column):
        # non-literal separator (crowdstrike fdr joins on a
        # per-row split_char): array_join needs a literal, so fold
        # head + (sep ++ elem)* instead — stays one expression
        joined = F.aggregate(
            F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
            # try_element_at: plain element_at throws
            # INVALID_ARRAY_INDEX_IN_ELEMENT_AT on an empty array
            # under ANSI mode (a filtered/compacted fdr array)
            F.coalesce(
                F.try_element_at(arr, F.lit(1)).cast("string"), F.lit("")
            ),
            lambda acc, x: F.concat(acc, sep, x.cast("string")),
        )
        return F.when(arr.isNotNull(), joined), T.StringType()
    return F.array_join(arr, sep), T.StringType()


@fn("includes")
def _includes(args, kw):
    if isinstance(_t(args[0]), (T.VariantType, T.NullType)):
        args = [_as_array(args[0]), *args[1:]]
    null_member = False
    if isinstance(args[0][0], list) and any(
        x is None for x in args[0][0]
    ):
        # null in a literal membership list (falcon's
        # [null, "", "-", "N/A"]): array_contains can never match
        # null, and lifting None via str() would fabricate the string
        # "None" — drop it here and OR an explicit isNull below
        null_member = True
        kept = [x for x in args[0][0] if x is not None]
        if not kept:
            return _c(args[1]).isNull(), T.BooleanType()
        args = [(kept, args[0][1]), *args[1:]]
    if isinstance(args[0][0], list) and len(
        {type(x) for x in args[0][0]}
    ) > 1:
        # mixed-type literal list (panw `includes([0, "0", " "], x)`):
        # lift per element as strings — a single F.lit would coerce to
        # the first element's type and null the rest
        args = [
            (
                F.array(*[F.lit(str(x)) for x in args[0][0]]),
                T.ArrayType(T.StringType()),
            ),
            *args[1:],
        ]
    arr, at = _c(args[0]), _t(args[0])
    v, vt = _c(args[1]), _t(args[1])
    # a null-typed probe value needs an explicit element-type cast
    # (array_contains rejects VOID)
    if vt is None or isinstance(vt, T.NullType):
        et = at.elementType if isinstance(at, T.ArrayType) else T.StringType()
        v = v.cast(et.simpleString())
    elif (
        isinstance(at, T.ArrayType)
        and at.elementType.simpleString() != vt.simpleString()
    ):
        # mixed-type membership (panw `includes([0, "0", " "], x)`):
        # compare by string value — VRL equality across int/string
        # literals in one list is value-based
        arr = F.transform(arr, lambda x: x.cast("string"))
        v = v.cast("string")
    hit = F.array_contains(arr, v)
    if null_member:
        hit = F.coalesce(hit, F.lit(False)) | v.isNull()
    return hit, T.BooleanType()


@fn("filter")
def _filter(args, kw):
    pred = kw.get("predicate") or kw["fn"]  # Column lambda or TypedLambda
    c, t = args[0]
    if isinstance(t, T.VariantType):
        c, t = _as_array(args[0], "variant")
    if isinstance(t, T.StructType):
        # object filter over a typed struct: a static schema can't
        # drop fields per-row, so filter the MAP form (values
        # stringified) — VRL object semantics, map-shaped result
        c = F.map_from_arrays(
            F.array(*[F.lit(f.name) for f in t.fields]),
            F.array(*[c.getField(f.name).cast("string") for f in t.fields]),
        )
        t = T.MapType(T.StringType(), T.StringType())
    if isinstance(t, T.NullType) or t is None or not isinstance(
        t, (T.ArrayType, T.MapType)
    ):
        # null / statically-unknown / non-collection input → null out
        # (the try-form)
        return F.lit(None).cast("array<string>"), T.ArrayType(T.StringType())
    if isinstance(t, T.MapType) and getattr(pred, "n_params", 1) == 2:
        # object filter: |k, v| closure → map_filter
        return (
            F.map_filter(
                c, lambda k, v: pred((k, t.keyType), (v, t.valueType))[0]
            ),
            t,
        )
    et = t.elementType if isinstance(t, T.ArrayType) else None
    if getattr(pred, "n_params", 1) == 2:
        # VRL array closures are |index, value|
        return (
            F.filter(
                c,
                lambda x, i: pred((i, T.IntegerType()), (x, et))[0],
            ),
            t or T.ArrayType(T.StringType()),
        )
    return (
        F.filter(c, lambda x: apply_value_fn(pred, x, et)[0]),
        t or T.ArrayType(T.StringType()),
    )


@fn("map_each")
def _map_each(args, kw):
    f = kw["fn"]
    c, t = args[0]
    if isinstance(t, (T.VariantType, T.NullType)):
        c, t = _as_array(args[0], "variant")
    et = t.elementType if isinstance(t, T.ArrayType) else None
    if getattr(f, "n_params", 1) == 2:  # |index, value| form
        _, nt = f((F.lit(0), T.IntegerType()), (F.lit(None).cast(et) if et else F.lit(None), et))
        return (
            F.transform(c, lambda x, i: f((i, T.IntegerType()), (x, et))[0]),
            T.ArrayType(nt or et or T.StringType()),
        )
    _, nt = apply_value_fn(f, F.lit(None).cast(et) if et else F.lit(None), et)
    return (
        F.transform(c, lambda x: apply_value_fn(f, x, et)[0]),
        T.ArrayType(nt or et or T.StringType()),
    )


@fn("compact")
def _compact(args, kw):
    """Array compact: drop nulls and empty strings (P6 footer
    semantics, ref: transformer/src/main.rs:276-282; full-row compact
    is null-uniform at rest — see SURVEY §7 'compact() semantics')."""
    c, t = args[0]
    if isinstance(t, T.NullType):
        return F.lit(None).cast("array<string>"), T.ArrayType(T.StringType())
    if isinstance(t, T.VariantType):
        # schemaless input: VRL compact works on BOTH objects and
        # arrays — probe the object form first (duo admin's
        # `encode_json(compact!(parse_json(.description)))`), fall
        # back to the array form; stay VARIANT so downstream
        # encode_json/is_* keep the runtime kind
        raw = _cv(args[0])
        vm = F.try_variant_get(raw, "$", "map<string,variant>")
        va = F.try_variant_get(raw, "$", "array<variant>")
        # VRL compact defaults (recursive:true, object:true,
        # array:true) also drop EMPTY objects/arrays; to_json keeps a
        # string value "{}" distinct from an actual empty object
        keep = lambda v: (  # noqa: E731
            v.isNotNull()
            & (v.cast("string") != "")
            & ~F.to_json(v).isin("{}", "[]")
        )
        return (
            F.coalesce(
                F.to_variant_object(
                    F.map_filter(vm, lambda _k, v: keep(v))
                ),
                F.to_variant_object(F.filter(va, keep)),
            ),
            T.VariantType(),
        )
    if isinstance(t, T.StructType):
        # object compact on a typed struct: static schemas can't drop
        # fields per-row — go through the map<string,VARIANT> form
        # (same rule as filter/merge); variant values keep nested
        # objects intact instead of flattening them to display strings
        c = F.map_from_arrays(
            F.array(*[F.lit(f.name) for f in t.fields]),
            F.array(
                *[
                    (
                        F.to_variant_object(c.getField(f.name))
                        if isinstance(
                            f.dataType,
                            (T.StructType, T.ArrayType, T.MapType),
                        )
                        else c.getField(f.name).cast("variant")
                    )
                    for f in t.fields
                ]
            ),
        )
        t = T.MapType(T.StringType(), T.VariantType())
    if isinstance(t, T.MapType):
        # VRL compact over an object: drop null/empty values
        return (
            F.map_filter(
                c, lambda _k, v: v.isNotNull() & (v.cast("string") != "")
            ),
            t,
        )
    if not isinstance(t, T.ArrayType) and t is not None:
        # scalar input: VRL compact on a non-collection is a runtime
        # error — the fallible form (`compact(x) ?? null`) must see
        # null, not an analysis failure
        return F.lit(None).cast("array<string>"), T.ArrayType(T.StringType())
    return (
        F.filter(c, lambda x: x.isNotNull() & (x.cast("string") != "")),
        t or T.ArrayType(T.StringType()),
    )


def _struct_set(obj, ot, parts, val, vt):
    """set obj[parts...] = val on a struct (creating intermediate
    structs), returning (Column, StructType)."""
    fields = list(ot.fields) if isinstance(ot, T.StructType) else []
    name = parts[0]
    if len(parts) == 1:
        child_val, child_t = val, vt
    else:
        sub = next((f for f in fields if f.name == name), None)
        child_val, child_t = _struct_set(
            obj.getField(name) if sub is not None else F.lit(None),
            sub.dataType if sub is not None else None,
            parts[1:],
            val,
            vt,
        )
    cols, new_fields, replaced = [], [], False
    for f in fields:
        if f.name == name:
            cols.append(child_val.alias(name))
            new_fields.append(T.StructField(name, child_t))
            replaced = True
        else:
            cols.append(obj.getField(f.name).alias(f.name))
            new_fields.append(f)
    if not replaced:
        cols.append(child_val.alias(name))
        new_fields.append(T.StructField(name, child_t))
    return F.struct(*cols), T.StructType(new_fields)


def _struct_dynamic_get(c: Column, t: T.StructType, seg: Column):
    """get(struct, [dynamic_key]): CASE WHEN key == field THEN value,
    unifying heterogeneous field values (see _get)."""
    kinds = {f.dataType.simpleString() for f in t.fields}
    if not t.fields:
        return F.lit(None).cast("string"), T.StringType()
    if len(kinds) == 1:
        vt = t.fields[0].dataType
        vals = {f.name: c.getField(f.name) for f in t.fields}
    elif all(isinstance(f.dataType, T.StructType) for f in t.fields):
        # ragged object values (VRL lookup tables): each arm becomes
        # a map<string,variant> holding ONLY its own keys — a union
        # superstruct would pad absent keys with nulls, and a later
        # `|= lookup_result` merge would clobber fields the selected
        # entry never mentioned (suricata eve's event_mappings carry
        # `kind` on 2 of 19 entries; the http entry must not null
        # .event.kind)
        vt = T.MapType(T.StringType(), T.VariantType())
        vals = {
            f.name: F.try_variant_get(
                F.to_variant_object(c.getField(f.name)),
                "$",
                "map<string,variant>",
            )
            for f in t.fields
        }
    else:
        vt = T.StringType()
        vals = {
            f.name: c.getField(f.name).cast("string") for f in t.fields
        }
    out = None
    for name, v in vals.items():
        arm = F.when(seg.cast("string") == name, v)
        out = arm if out is None else out.when(seg.cast("string") == name, v)
    return out, vt


def _single_path_seg(arg):
    """A VRL dynamic path argument `[expr]`: a raw python list
    (literal path) or a compiled one-element array column (parser's
    __array of a non-literal segment). Returns (Column, py_value|None)."""
    v, ty = arg
    if isinstance(v, list):
        if len(v) != 1:
            raise ValueError("only single-segment dynamic paths are supported")
        return F.lit(v[0]), v[0]
    if isinstance(ty, T.ArrayType):
        return F.element_at(_c(arg), 1), None
    if isinstance(ty, T.VariantType):
        # could be a 1-element path array OR a bare scalar key (zeek
        # smb_files: get(_map, .zeek.smb_files.action) passes the key
        # value directly) — try both
        return (
            F.coalesce(
                F.try_variant_get(v, "$[0]", "string"),
                F.try_variant_get(v, "$", "string"),
            ),
            None,
        )
    # bare scalar segment (string key or numeric index)
    return _c(arg), None


@fn("get")
def _get(args, kw):
    c, t = args[0]
    if isinstance(t, T.NullType):  # null object → null member (try-form)
        return F.lit(None).cast("string"), T.StringType()
    if isinstance(t, T.VariantType):
        idx = kw.get("index")
        if idx is not None and idx >= 0:
            return F.try_variant_get(c, f"$[{idx}]", "variant"), T.VariantType()
        if idx is not None:  # negative index: count from the end
            arr = F.try_variant_get(c, "$", "array<variant>")
            return F.try_element_at(arr, F.lit(idx)), T.VariantType()
        path = kw.get("path")
        if path is not None:
            vp = "$" + "".join(
                f"[{p}]" if str(p).isdigit() else f".{p}" for p in path
            )
            return F.try_variant_get(c, vp, "variant"), T.VariantType()
        seg, raw = _single_path_seg(args[1])
        if isinstance(raw, int):
            arr = F.try_variant_get(c, "$", "array<variant>")
            ix = seg.cast("int")
            return (
                F.try_element_at(arr, F.when(ix >= 0, ix + 1).otherwise(ix)),
                T.VariantType(),
            )
        m = F.try_variant_get(c, "$", "map<string,variant>")
        return F.try_element_at(m, seg.cast("string")), T.VariantType()
    if len(args) > 1:
        # verbatim form get(value, [seg]) — seg may be a closure var
        # (zeek: get!(ttls, [i])) or negative literal (okta: [-1])
        seg, raw = _single_path_seg(args[1])
        if isinstance(t, T.StringType) and (
            isinstance(raw, int) or raw is None
        ):
            # indexing a STRING (crowdstrike fdr's `path[1] == ":"`
            # drive-letter check): character at index, null when out
            # of range; negative counts from the end
            ix = seg.cast("int")
            ch = F.when(
                ix >= 0, F.substring(c, ix + F.lit(1), F.lit(1))
            ).otherwise(F.substring(c, F.length(c) + ix + F.lit(1), F.lit(1)))
            return F.nullif(ch, F.lit("")), T.StringType()
        if isinstance(t, T.ArrayType) or isinstance(raw, int) or (
            raw is None and not isinstance(t, (T.MapType, T.StructType))
        ):
            et = t.elementType if isinstance(t, T.ArrayType) else T.StringType()
            ix = seg.cast("int")
            return (
                F.try_element_at(c, F.when(ix >= 0, ix + 1).otherwise(ix)),
                et,
            )
        if isinstance(t, T.StructType) and raw is not None:
            m = next((f for f in t.fields if f.name == raw), None)
            if m is None:
                # absent key: VRL get() yields null — getField on a
                # typed struct would fail ANALYSIS (github_audit reads
                # "@timestamp" off events that may not carry it)
                return F.lit(None).cast("string"), T.StringType()
            return c.getField(raw), m.dataType
        if isinstance(t, T.StructType):
            # DYNAMIC key over a lookup-object (suricata's
            # event_mappings idiom): a CASE chain over the fields,
            # values unified — identical types as-is, all-struct
            # values padded to their union superstruct, else string
            return _struct_dynamic_get(c, t, seg)
        et = t.valueType if isinstance(t, T.MapType) else T.StringType()
        return F.try_element_at(c, seg.cast("string")), et
    idx = kw.get("index")
    if idx is not None:
        if isinstance(t, T.StringType):
            # indexing a STRING (fdr's `path[1] == ":"`): char at
            # index, null out of range; negative counts from the end
            pos = (
                F.lit(idx + 1)
                if idx >= 0
                else F.length(c) + F.lit(idx + 1)
            )
            return (
                F.nullif(F.substring(c, pos, F.lit(1)), F.lit("")),
                T.StringType(),
            )
        et = t.elementType if isinstance(t, T.ArrayType) else T.StringType()
        return F.try_element_at(c, F.lit(idx + 1 if idx >= 0 else idx)), et
    key = kw.get("key")
    if key is not None:  # map lookup (VRL get(map, ["k"]))
        et = t.valueType if isinstance(t, T.MapType) else T.StringType()
        return F.try_element_at(c, F.lit(key)), et
    path = kw.get("path")
    out = c
    dtype = t
    for p in path:
        out = out.getField(p)
        if isinstance(dtype, T.StructType):
            m = next((f for f in dtype.fields if f.name == p), None)
            dtype = m.dataType if m else T.StringType()
    return out, dtype or T.StringType()


def _map_set_nested(base, mt, segs, val, vt):
    """set base[segs...] = val on a map<string,variant>, creating
    intermediate objects and merging with existing ones (so sibling
    dotted keys land in one nested object). Returns (Column, MapType)."""
    key = F.lit(segs[0])
    if len(segs) == 1:
        new_val = (
            val if isinstance(vt, T.VariantType) else val.cast("variant")
        )
    else:
        inner = F.coalesce(
            F.try_variant_get(
                F.try_element_at(base, key), "$", "map<string,variant>"
            ),
            F.create_map().cast("map<string,variant>"),
        )
        inner_set, _it = _map_set_nested(
            inner, T.MapType(T.StringType(), T.VariantType()), segs[1:],
            val, vt,
        )
        new_val = F.to_variant_object(inner_set)
    return (
        F.map_concat(
            F.map_filter(base, lambda k, _v: k != key),
            F.create_map(key, new_val),
        ),
        mt,
    )


@fn("set")
def _set(args, kw):
    """VRL set(obj, [key], value) with a DYNAMIC key — the loop-built
    object pattern (okta risk kv, google_workspace params). Dynamic
    keys need a MAP representation (structs are fixed-shape); a
    null/untyped/empty target starts as map<string,string>. Values
    cast to the map's value type (heterogeneous VRL values unify to
    string; the schema projection re-types declared fields, including
    map→struct — see schema/cast.py). Single assignment is
    filter-then-concat so duplicate keys never trip Spark's
    EXCEPTION dedup policy; null keys leave the object unchanged
    (VRL would error the expression)."""
    obj, ot = args[0]
    # keep VARIANT values raw (same funnel hazard as push): the
    # map-store logic below casts per the map's value type
    val = (
        _cv(args[2])
        if isinstance(_t(args[2]), T.VariantType)
        else _c(args[2])
    )
    seg_list = args[1][0] if isinstance(args[1][0], list) else None
    if (
        seg_list is not None
        and len(seg_list) > 1
        and isinstance(ot, T.MapType)
        and isinstance(ot.valueType, T.VariantType)
    ):
        # literal multi-segment path on a dynamic object (zeek's
        # dotted-key unflatten over object!(del(.json))): nest by
        # merging with any existing object at the prefix so repeated
        # sets under one key (id.orig_p then id.orig_h) accumulate
        return _map_set_nested(
            F.coalesce(obj, F.create_map().cast(ot.simpleString())),
            ot,
            [str(x) for x in seg_list],
            val,
            _t(args[2]),
        )
    if seg_list is not None and not isinstance(ot, T.MapType):
        # literal (possibly multi-segment) path on an object → struct
        # rebuild with path scaffolding (zeek's dotted-key unflatten:
        # set(.o, ["id","orig_p"], v))
        return _struct_set(
            obj, ot, [str(x) for x in seg_list], val,
            _t(args[2]) or T.StringType(),
        )
    seg, raw = _single_path_seg(args[1])
    if isinstance(ot, T.StructType) and ot.fields:
        # dynamic (runtime-key) set on a typed struct (crowdstrike
        # fdr's Count$/Port$ int-coercion loop over object!(x)):
        # funnel to the map<string,variant> form, keeping nested
        # objects intact
        obj = F.map_from_arrays(
            F.array(*[F.lit(f.name) for f in ot.fields]),
            F.array(
                *[
                    (
                        F.to_variant_object(obj.getField(f.name))
                        if isinstance(
                            f.dataType,
                            (T.StructType, T.ArrayType, T.MapType),
                        )
                        else obj.getField(f.name).cast("variant")
                    )
                    for f in ot.fields
                ]
            ),
        )
        ot = T.MapType(T.StringType(), T.VariantType())
    # a fresh dynamic object starts as map<string,VARIANT> so array/
    # object values keep their runtime kind (google_workspace admin
    # stores API_SCOPES multiValue then branches on is_array vs
    # is_string — a string-valued map would stringify the array)
    mt = (
        ot
        if isinstance(ot, T.MapType)
        else T.MapType(T.StringType(), T.VariantType())
    )
    key = seg.cast(mt.keyType.simpleString())
    base = (
        F.coalesce(obj, F.create_map().cast(mt))
        if isinstance(ot, T.MapType)
        else F.create_map().cast(mt)
    )
    vt = _t(args[2])
    if isinstance(mt.valueType, T.VariantType) and isinstance(
        vt, (T.StructType, T.ArrayType, T.MapType)
    ):
        val = F.to_variant_object(val)
    else:
        val = val.cast(mt.valueType.simpleString())
    updated = F.map_concat(
        F.map_filter(base, lambda k, _v: k != key),
        F.create_map(key, val),
    )
    return F.when(key.isNull(), base).otherwise(updated), mt


@fn("ip_pton")
def _ip_pton(args, kw):
    """Parse-or-null IP (the `_, err = ip_pton(x)` validity-probe
    pattern, ref zeek/tables/dns.yml): non-null iff x is a v4/v6
    address; the value is the input itself (callers here only test
    err)."""
    c = _c(args[0])
    ok = c.rlike(_IPV4_RE) | (c.rlike(r"^[0-9a-fA-F:]{2,45}$") & c.contains(":"))
    return F.when(ok, c), T.StringType()


@fn("bool")
def _bool_assert(args, kw):
    """VRL bool!(x) type assertion."""
    return _c(args[0]).try_cast("boolean"), T.BooleanType()


@fn("object")
def _object_assert(args, kw):
    """VRL object!(x) type assertion — typed object args pass through;
    a schemaless variant concretizes to its object (map) form; a
    statically-scalar arg is the runtime type error → typed null (so
    `??` fallbacks and downstream member reads see an absent object
    instead of failing analysis)."""
    t = _t(args[0])
    if isinstance(t, T.VariantType):
        return _as_map(args[0])
    if t is not None and not isinstance(
        t, (T.MapType, T.StructType, T.NullType)
    ):
        mt = "map<string,variant>"
        return F.lit(None).cast(mt), T.MapType(T.StringType(), T.VariantType())
    return args[0]


@fn("array")
def _array_assert(args, kw):
    """VRL array!(x) type assertion — typed array args pass through; a
    schemaless variant concretizes to its array form; a
    statically-scalar arg is the runtime type error → typed null
    (google_workspace indexes array!(.json.events)[0] where events
    may not be array-shaped)."""
    t = _t(args[0])
    if isinstance(t, T.VariantType):
        return _as_array(args[0], "variant")
    if t is not None and not isinstance(t, (T.ArrayType, T.NullType)):
        return (
            F.lit(None).cast("array<variant>"),
            T.ArrayType(T.VariantType()),
        )
    return args[0]


# -- json / kv / structured parsing ----------------------------------------


@fn("__object")
def _object_literal(args, kw):
    """Object literal { "k": v, ... } → struct(k=v, ...). The EMPTY
    literal `{}` is a dynamic object seed (set!-with-dynamic-key
    loops): an empty map<string,string>, so later map updates and
    conditional blending type-check."""
    if not args:
        mt = T.MapType(T.StringType(), T.StringType())
        return F.create_map().cast(mt), mt
    cols, fields = [], []
    for i in range(0, len(args), 2):
        key = args[i][0]
        c, t = _c(args[i + 1]), _t(args[i + 1]) or T.StringType()
        cols.append(c.alias(key))
        fields.append(T.StructField(key, t))
    return F.struct(*cols), T.StructType(fields)


@fn("__array")
def _array_literal(args, kw):
    """List-literal with non-literal elements: [a, .b, f(c)]."""
    if not args:
        return F.array().cast("array<string>"), T.ArrayType(T.StringType())
    et = next((_t(a) for a in args if _t(a) is not None), T.StringType())
    return F.array(*[_c(a) for a in args]), T.ArrayType(et)


@fn("__field")
def _field_access(args, kw):
    """Member access on a closure-bound variable: v.a.b → getField
    chain (parser emits __field(Var, path="a.b"))."""
    c, t = args[0]
    out, dtype = c, t
    for p in kw["path"].split("."):
        out = out.getField(p)
        if isinstance(dtype, T.StructType):
            m = next((f for f in dtype.fields if f.name == p), None)
            dtype = m.dataType if m else None
        else:
            dtype = None
    return out, dtype or T.StringType()


@fn("lookup")
def _lookup(args, kw):
    """Inline map-literal lookup (VRL `get(static_map, [key])`):
    lookup(key, k1, v1, k2, v2, ...) → value or null. Compiles to one
    element_at over a CreateMap literal — the Spark form of the
    reference's dict lookups (e.g. o365 RecordType → schema name)."""
    key = _c(args[0])
    m = F.create_map(*[_c(a) for a in args[1:]])
    vt = _t(args[2]) if len(args) > 2 else T.StringType()
    return F.element_at(m, key), vt or T.StringType()


@fn("encode_json")
def _encode_json(args, kw):
    c, t = args[0]
    if isinstance(t, (T.StructType, T.ArrayType, T.MapType, T.VariantType)):
        return F.to_json(c), T.StringType()
    if isinstance(t, T.StringType) or t is None:
        # scalar string → JSON string literal: encode via a 1-element
        # array and strip the brackets (keeps escaping exact)
        j = F.to_json(F.array(c))
        return j.substr(F.lit(2), F.length(j) - 2), T.StringType()
    return c.cast("string"), T.StringType()


@fn("parse_json")
def _parse_json(args, kw):
    """With schema kwarg → typed struct (from_json); without → Spark 4
    VariantType (semi-structured, ref VRL dynamic objects)."""
    schema = kw.get("schema")
    if schema is not None:
        return F.from_json(_c(args[0]), schema), schema
    return F.try_parse_json(_c(args[0])), T.VariantType()


@fn("parse_key_value")
def _parse_kv(args, kw):
    # VRL signature: parse_key_value(value[, key_value_delimiter
    # [, field_delimiter]]) — kwargs (zeek ssl/x509, suricata eve) or
    # positional (okta system.yml:220 `parse_key_value(b, "=", ", ")`)
    pair = kw.get("field_delimiter")
    kv = kw.get("key_value_delimiter")
    if kv is None and len(args) > 1 and isinstance(args[1][0], str):
        kv = args[1][0]
    if pair is None and len(args) > 2 and isinstance(args[2][0], str):
        pair = args[2][0]
    pair = " " if pair is None else pair
    kv = "=" if kv is None else kv
    return (
        F.str_to_map(_c(args[0]), F.lit(pair), F.lit(kv)),
        T.MapType(T.StringType(), T.StringType()),
    )


@fn("parse_csv")
def _parse_csv(args, kw):
    """CSV line → array<string> honoring double quotes."""
    c = _c(args[0])
    # split on commas not inside quotes, then strip quotes
    parts = F.split(c, r',(?=(?:[^"]*"[^"]*")*[^"]*$)')
    unq = F.transform(
        parts, lambda x: F.regexp_replace(F.trim(x), r'^"(.*)"$', "$1")
    )
    return unq, T.ArrayType(T.StringType())


@fn("parse_url")
def _parse_url(args, kw):
    """VRL parse_url → {scheme, host, port, path, query, fragment};
    `query` is an OBJECT of decoded params (reference transforms
    for_each over it — aws_inspector log_source.yml:444), valueless
    keys map to ''."""
    c = _c(args[0])
    t = T.StructType(
        [
            T.StructField("scheme", T.StringType()),
            T.StructField("host", T.StringType()),
            T.StructField("port", T.LongType()),
            T.StructField("path", T.StringType()),
            T.StructField(
                "query", T.MapType(T.StringType(), T.StringType())
            ),
            T.StructField("fragment", T.StringType()),
        ]
    )
    qs = F.parse_url(c, F.lit("QUERY"))
    entries = F.transform(
        F.split(qs, "&"),
        lambda kv: F.struct(
            F.split_part(kv, F.lit("="), F.lit(1)).alias("key"),
            F.when(
                kv.contains("="),
                F.try_url_decode(
                    kv.substr(F.locate("=", kv) + F.lit(1), F.length(kv))
                ),
            )
            .otherwise("")
            .alias("value"),
        ),
    )
    # last-wins fold instead of map_from_entries: repeated query params
    # (?a=1&a=2 — routine in real URLs, e.g. the urlhaus feed) throw
    # DUPLICATED_MAP_KEY under the default mapKeyDedupPolicy=EXCEPTION;
    # VRL parse_url never errors there (last value wins)
    query = F.when(
        qs.isNotNull() & (qs != ""),
        F.aggregate(
            entries,
            F.create_map().cast("map<string,string>"),
            lambda m, e: F.map_concat(
                F.map_filter(m, lambda k, _v: k != e["key"]),
                F.create_map(e["key"], e["value"]),
            ),
        ),
    )
    host_port = F.parse_url(c, F.lit("HOST"))
    return (
        F.struct(
            F.parse_url(c, F.lit("PROTOCOL")).alias("scheme"),
            host_port.alias("host"),
            F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*?:(\d+)(?:[/?#]|$)", 1)
            .try_cast("bigint")
            .alias("port"),
            F.parse_url(c, F.lit("PATH")).alias("path"),
            query.alias("query"),
            F.parse_url(c, F.lit("REF")).alias("fragment"),
        ),
        t,
    )


@fn("parse_grok")
def _parse_grok(args, kw):
    """parse_grok(value, pattern: "...", NAME: "regex"...) — extra
    kwargs define custom grok patterns (VRL alias set)."""
    pattern = (
        args[1][0]
        if len(args) > 1 and isinstance(args[1][0], str)
        else kw["pattern"]
    )
    custom = kw.get("patterns")
    if custom is None and len(args) > 2 and isinstance(args[2][0], dict):
        custom = args[2][0]  # verbatim positional alias dict
    custom = custom or {
        k: v for k, v in kw.items() if k not in ("pattern", "patterns")
    } or None
    return grok_mod.parse_grok(_c(args[0]), pattern, custom)


@fn("parse_groks")
def _parse_groks(args, kw):
    """Try patterns in order; first whole-match wins (VRL parse_groks,
    29 uses). Result struct spans the UNION of all patterns' fields.
    Patterns list as args[1] or patterns: kwarg; extra kwargs (or a
    custom: dict) define custom grok aliases."""
    c = _c(args[0])
    grok_patterns = (
        args[1][0] if len(args) > 1 and isinstance(args[1][0], list)
        else kw["patterns"]
    )
    custom = kw.get("custom")
    if custom is None and len(args) > 2 and isinstance(args[2][0], dict):
        custom = args[2][0]  # verbatim positional alias dict
    custom = custom or {
        k: v for k, v in kw.items() if k not in ("patterns", "custom")
    } or None
    return grok_mod.parse_groks(c, grok_patterns, custom)


def _named_group_indices(pattern: str) -> list[tuple[str, int]]:
    """(name, 1-based capture index) for each named group, counting
    UNNAMED capture groups too — a pattern mixing `(a|b)` with
    `(?P<x>...)` must extract x by its true group number, not by its
    position among the named groups."""
    import re as _re

    out: list[tuple[str, int]] = []
    idx = 0
    i = 0
    in_class = False
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            i += 1
            continue
        if ch == "[":
            in_class = True
            i += 1
            continue
        if ch == "(":
            m = _re.match(r"\(\?P?<(\w+)>", pattern[i:])
            if m:
                idx += 1
                out.append((m.group(1), idx))
                i += m.end()
                continue
            if pattern[i : i + 2] == "(?":
                # non-capturing / lookaround / flags group
                i += 2
                continue
            idx += 1
        i += 1
    return out


@fn("parse_regex")
def _parse_regex(args, kw):
    """Named captures → struct (VRL parse_regex)."""
    import re as _re

    pattern = (
        args[1][0]
        if len(args) > 1 and isinstance(args[1][0], str)
        else kw["pattern"]
    )
    # value may arrive as the `value:` kwarg (aws_waf webaclId ARN)
    c = _c(args[0]) if args else _c(kw["value"])
    groups = _named_group_indices(pattern)
    # Java named groups reject underscores; strip names, extract by the
    # group's true index (unnamed captures keep their numbering)
    java_pat = _re.sub(r"\(\?P?<\w+>", "(", pattern)
    cols = []
    fields = []
    for name, i in groups:
        ext = F.regexp_extract(c, java_pat, i)
        cols.append(F.when(ext != "", ext).alias(name))
        fields.append(T.StructField(name, T.StringType()))
    return F.struct(*cols), T.StructType(fields)


@fn("parse_regex_all")
def _parse_regex_all(args, kw):
    """Every match of a named-capture pattern → array<struct> (VRL
    parse_regex_all; ref panw-style repeated-field extraction). The
    whole-match list comes from regexp_extract_all(…, 0); each match
    is then re-parsed per capture group — all JVM-side, no UDF."""
    import re as _re

    pattern = (
        args[1][0]
        if len(args) > 1 and isinstance(args[1][0], str)
        else kw["pattern"]
    )
    c = _c(args[0])
    groups = _named_group_indices(pattern)
    # Java named groups reject underscores; strip names, extract by the
    # group's true index (unnamed captures keep their numbering)
    java_pat = _re.sub(r"\(\?P?<\w+>", "(", pattern)
    matches = F.regexp_extract_all(c, F.lit(java_pat), 0)

    def per_match(m):
        cols = []
        for name, i in groups:
            ext = F.regexp_extract(m, java_pat, i)
            cols.append(F.when(ext != "", ext).alias(name))
        return F.struct(*cols)

    return (
        F.transform(matches, per_match),
        T.ArrayType(
            T.StructType([T.StructField(n, T.StringType()) for n, _ in groups])
        ),
    )


@fn("parse_aws_vpc_flow_log")
def _parse_vpcflow(args, kw):
    """Space-separated VPC flow v2 record → typed struct (ref:
    aws_vpcflow/log_source.yml:14-22 parse_aws_vpc_flow_log; '-' means
    absent)."""
    c = _c(args[0])
    toks = F.split(c, " ")
    spec = [
        ("version", "bigint"),
        ("account_id", "string"),
        ("interface_id", "string"),
        ("srcaddr", "string"),
        ("dstaddr", "string"),
        ("srcport", "bigint"),
        ("dstport", "bigint"),
        ("protocol", "bigint"),
        ("packets", "bigint"),
        ("bytes", "bigint"),
        ("start", "bigint"),
        ("end", "bigint"),
        ("action", "string"),
        ("log_status", "string"),
    ]
    cols = []
    fields = []
    for i, (name, typ) in enumerate(spec):
        # try_element_at: a short line (fewer tokens than the format)
        # must yield nulls, not an ANSI index error
        raw = F.try_element_at(toks, F.lit(i + 1))
        val = F.when(raw != "-", raw)
        if typ != "string":
            val = val.try_cast(typ)
        cols.append(val.alias(name))
        fields.append(
            T.StructField(name, T.LongType() if typ == "bigint" else T.StringType())
        )
    return F.struct(*cols), T.StructType(fields)


def _rex(c, pat):
    """regexp_extract group 1, '' → null (VRL/woothee absent-version)."""
    v = F.regexp_extract(c, pat, 1)
    return F.when(v != "", v)


@fn("parse_user_agent")
def _parse_ua(args, kw):
    """VRL parse_user_agent, fast mode (the only mode the reference's
    managed ymls use — cloudflare firewall_event.yml:244,
    http_request.yml:515, okta system.yml:387): woothee-shaped
    {browser:{family,version}, device:{category}, os:{family,version}}.

    The classifier is a pure Column when-chain following woothee's
    classification order — crawler → appliance/console → Japanese
    feature phone → browser(+os) → tool — over the families in the
    public woothee ruleset: the Googlebot sub-family, ~30 named
    crawlers/previewers with a generic spider fallback, game consoles
    (PlayStation/Nintendo/Xbox → category 'appliance'), carrier
    feature phones (docomo/au/SoftBank/WILLCOM → 'mobilephone'),
    Windows Phone + BlackBerry smartphones, 14 browser engines, and
    the long tail of HTTP client tools. The woothee dataset itself is
    not available offline, so long-tail entries woothee names
    specifically may classify under the generic fallbacks here
    (documented divergence); tool agents classify as category 'misc'
    rather than woothee's UNKNOWN, since security pipelines key on
    them."""
    c = _c(args[0])
    is_ios = c.rlike("iPhone|iPad|iPod")
    is_android = c.contains("Android")
    is_winphone = c.contains("Windows Phone")
    is_bb = c.rlike("BlackBerry|BB10")

    # -- crawlers (woothee: challenge_google then challenge_crawlers) --
    crawler_name = (
        F.when(c.contains("compatible; Googlebot-Mobile"), "Googlebot Mobile")
        .when(c.rlike("compatible; Googlebot|Googlebot[-/]"), "Googlebot")
        .when(c.contains("Mediapartners-Google"), "Googlebot Mediapartners")
        .when(c.contains("AdsBot-Google"), "AdsBot-Google")
        .when(c.contains("Feedfetcher-Google"), "Google Feedfetcher")
        .when(c.contains("AppEngine-Google"), "Google AppEngine")
        .when(c.contains("Google Web Preview"), "Google Web Preview")
        .when(c.contains("Google-InspectionTool"), "Google-InspectionTool")
        .when(c.contains("GoogleOther"), "GoogleOther")
        .when(c.contains("Storebot-Google"), "Storebot-Google")
        .when(c.contains("Yahoo! Slurp"), "Yahoo! Slurp")
        .when(c.contains("bingbot"), "bingbot")
        .when(c.contains("BingPreview"), "BingPreview")
        .when(c.contains("msnbot"), "msnbot")
        .when(c.contains("Baiduspider"), "Baiduspider")
        .when(c.contains("YandexBot"), "YandexBot")
        .when(c.contains("DuckDuckBot"), "DuckDuckBot")
        .when(c.contains("Applebot"), "Applebot")
        .when(c.contains("Yeti/"), "Yeti")
        .when(c.contains("SeznamBot"), "SeznamBot")
        .when(c.rlike("Sogou (?:web|News) [Ss]pider"), "Sogou spider")
        .when(c.contains("Exabot"), "Exabot")
        .when(c.contains("facebookexternalhit"), "facebookexternalhit")
        .when(c.contains("Twitterbot"), "Twitterbot")
        .when(c.contains("Slackbot"), "Slackbot")
        .when(c.contains("Slack-ImgProxy"), "Slack-ImgProxy")
        .when(c.contains("LinkedInBot"), "LinkedInBot")
        .when(c.contains("Discordbot"), "Discordbot")
        .when(c.contains("TelegramBot"), "TelegramBot")
        .when(c.contains("WhatsApp/"), "WhatsApp")
        .when(c.contains("SemrushBot"), "SemrushBot")
        .when(c.contains("AhrefsBot"), "AhrefsBot")
        .when(c.contains("MJ12bot"), "MJ12bot")
        .when(c.contains("DotBot"), "DotBot")
        .when(c.contains("PetalBot"), "PetalBot")
        .when(c.contains("Bytespider"), "Bytespider")
        .when(c.contains("GPTBot"), "GPTBot")
        .when(c.contains("CCBot"), "CCBot")
        .when(c.rlike("ia_archiver|archive\\.org_bot"), "Internet Archive")
        .when(c.contains("Pingdom"), "Pingdom")
        .when(c.contains("UptimeRobot"), "UptimeRobot")
        .when(c.contains("FeedBurner/"), "FeedBurner")
        .when(c.contains("Hatena"), "Hatena")
        .when(c.contains("ichiro/"), "ichiro")
        # generic fallback, woothee challenge_etc shape
        .when(c.rlike("[Ss]pider|[Cc]rawler|[Bb]ot[/; )]|[Bb]ot$"), "misc crawler")
    )
    crawler = crawler_name.isNotNull()

    # -- appliances / consoles (checked before browsers: several emit
    #    WebKit tokens that would otherwise fall through to Safari) --
    appliance_name = (
        F.when(c.contains("Nintendo Switch"), "Nintendo Switch")
        .when(c.contains("Nintendo 3DS"), "Nintendo 3DS")
        .when(c.contains("Nintendo DSi"), "Nintendo DSi")
        .when(c.contains("Nintendo WiiU"), "Nintendo Wii U")
        .when(c.contains("Nintendo Wii"), "Nintendo Wii")
        .when(c.contains("PlayStation 5"), "PlayStation 5")
        .when(c.contains("PlayStation 4"), "PlayStation 4")
        .when(c.rlike("PL[Aa][Yy]STATION 3"), "PlayStation 3")
        .when(c.contains("PlayStation Vita"), "PlayStation Vita")
        .when(c.contains("PlayStation Portable"), "PSP")
        .when(c.contains("Xbox"), "Xbox")
        .when(c.rlike("InettvBrowser|AQUOSBrowser|SmartTV|SMART-TV"), "Digital TV")
    )
    appliance = appliance_name.isNotNull()
    appliance_version = _rex(c, r"(?:PlayStation [45a-zA-Z]*|STATION 3|Nintendo [3A-Za-z]+)[ ;/]+([0-9][0-9.]+)")

    # -- Japanese carrier feature phones (woothee 'mobilephone') --
    mobile_name = (
        F.when(c.rlike("^DoCoMo|DoCoMo/"), "docomo")
        .when(c.rlike("^KDDI-|UP\\.Browser"), "au by KDDI")
        .when(c.rlike("^SoftBank|^Vodafone|^J-PHONE"), "SoftBank")
        .when(c.rlike("WILLCOM|DDIPOCKET"), "WILLCOM")
    )
    mobilephone = mobile_name.isNotNull()

    # -- tools (woothee 'misc') --
    tool = _rex(
        c,
        r"^(curl|Wget|wget|aws-cli|aws-sdk-[a-z]+|python-requests|python-httpx"
        r"|Python-urllib|Go-http-client|okhttp|Java|libwww-perl"
        r"|Apache-HttpClient|axios|node-fetch|undici|Scrapy|PostmanRuntime"
        r"|insomnia|HTTPie|Ruby|Faraday|GuzzleHttp|Dart|PHP|Typhoeus"
        r"|Jakarta Commons-HttpClient|WinHttp\.WinHttpRequest)[/ .0-9]",
    )

    browser_family = (
        F.when(crawler, crawler_name)
        .when(appliance, appliance_name)
        .when(mobilephone, mobile_name)
        .when(tool.isNotNull(), tool)
        .when(c.rlike("Edge?/|EdgA/|EdgiOS/"), "Edge")
        .when(c.rlike("OPR/|Opera"), "Opera")
        .when(c.contains("Vivaldi/"), "Vivaldi")
        .when(c.contains("YaBrowser/"), "Yandex Browser")
        .when(c.contains("SamsungBrowser/"), "Samsung Internet")
        .when(c.contains("Whale/"), "Whale")
        .when(c.contains("Sleipnir/"), "Sleipnir")
        .when(c.rlike("UCBrowser/|UCWEB/"), "UC Browser")
        .when(c.rlike("QQBrowser"), "QQBrowser")
        .when(c.contains("Silk/"), "Silk")
        .when(c.rlike("FxiOS/"), "Firefox")
        .when(c.rlike("CriOS/"), "Chrome")
        .when(c.contains("Chromium/"), "Chromium")
        .when(c.contains("Chrome/"), "Chrome")
        .when(c.contains("Firefox/"), "Firefox")
        .when(is_winphone & c.contains("IEMobile"), "Internet Explorer")
        .when(c.rlike("MSIE |Trident/"), "Internet Explorer")
        .when(is_bb, "BlackBerry")
        .when(c.contains("Safari/"), "Safari")
    )
    browser_version = (
        F.when(crawler | mobilephone, F.lit(None).cast("string"))
        .when(appliance, appliance_version)
        .when(tool.isNotNull(), _rex(c, r"^[^/ ]+/([0-9][0-9.a-z]*)"))
        .when(c.rlike("Edge?/|EdgA/|EdgiOS/"), _rex(c, r"(?:Edge|Edg|EdgA|EdgiOS)/([0-9.]+)"))
        .when(c.contains("OPR/"), _rex(c, r"OPR/([0-9.]+)"))
        .when(c.contains("Vivaldi/"), _rex(c, r"Vivaldi/([0-9.]+)"))
        .when(c.contains("YaBrowser/"), _rex(c, r"YaBrowser/([0-9.]+)"))
        .when(c.contains("SamsungBrowser/"), _rex(c, r"SamsungBrowser/([0-9.]+)"))
        .when(c.contains("Whale/"), _rex(c, r"Whale/([0-9.]+)"))
        .when(c.contains("Sleipnir/"), _rex(c, r"Sleipnir/([0-9.]+)"))
        .when(c.rlike("UCBrowser/|UCWEB/"), _rex(c, r"(?:UCBrowser|UCWEB)/([0-9.]+)"))
        .when(c.contains("QQBrowser"), _rex(c, r"QQBrowser/([0-9.]+)"))
        .when(c.contains("Silk/"), _rex(c, r"Silk/([0-9.]+)"))
        .when(c.rlike("CriOS/|Chromium/|Chrome/"), _rex(c, r"(?:CriOS|Chromium|Chrome)/([0-9.]+)"))
        .when(c.rlike("FxiOS/|Firefox/"), _rex(c, r"(?:FxiOS|Firefox)/([0-9.]+)"))
        .when(is_winphone & c.contains("IEMobile"), _rex(c, r"IEMobile/([0-9.]+)"))
        .when(c.contains("MSIE "), _rex(c, r"MSIE ([0-9.]+)"))
        .when(c.contains("Trident/"), _rex(c, r"rv:([0-9.]+)"))
        .when(is_bb, _rex(c, r"Version/([0-9.]+)"))
        .when(c.contains("Safari/"), _rex(c, r"Version/([0-9.]+)"))
    )
    nt = _rex(c, r"Windows NT ([0-9.]+)")
    os_family = (
        F.when(appliance, appliance_name)
        .when(mobilephone, mobile_name)
        .when(is_winphone, "Windows Phone OS")
        .when(is_bb, "BlackBerry")
        .when(is_ios & c.contains("iPad"), "iPad")
        .when(is_ios, "iPhone")
        .when(is_android, "Android")
        .when(
            nt.isNotNull(),
            # woothee's NT → marketing-name map
            F.when(nt == "10.0", "Windows 10")
            .when(nt == "6.3", "Windows 8.1")
            .when(nt == "6.2", "Windows 8")
            .when(nt == "6.1", "Windows 7")
            .when(nt == "6.0", "Windows Vista")
            .when(nt == "5.2", "Windows Server 2003")
            .when(nt == "5.1", "Windows XP")
            .when(nt == "5.0", "Windows 2000")
            .otherwise(F.concat(F.lit("Windows NT "), nt)),
        )
        .when(c.contains("Mac OS X"), "Mac OSX")
        .when(c.contains("CrOS"), "ChromeOS")
        .when(c.contains("Linux"), "Linux")
        .when(c.contains("FreeBSD"), "FreeBSD")
        .when(c.contains("OpenBSD"), "OpenBSD")
        .when(c.contains("NetBSD"), "NetBSD")
        .when(c.contains("SunOS"), "Solaris")
    )
    os_version = (
        F.when(appliance, appliance_version)
        .when(mobilephone, F.lit(None).cast("string"))
        .when(is_winphone, _rex(c, r"Windows Phone (?:OS )?([0-9.]+)"))
        .when(is_bb, _rex(c, r"BlackBerry ?(?:[0-9]+)?/([0-9.]+)"))
        .when(
            is_ios,
            F.replace(_rex(c, r"OS ([0-9_.]+) like"), F.lit("_"), F.lit(".")),
        )
        .when(is_android, _rex(c, r"Android ([0-9.]+)"))
        .when(nt.isNotNull(), F.concat(F.lit("NT "), nt))
        .when(
            c.contains("Mac OS X"),
            F.replace(_rex(c, r"Mac OS X ([0-9_.]+)"), F.lit("_"), F.lit(".")),
        )
        .when(c.contains("CrOS"), _rex(c, r"CrOS [^ ]+ ([0-9.]+)"))
    )
    category = (
        F.when(crawler, "crawler")
        .when(appliance, "appliance")
        .when(mobilephone, "mobilephone")
        .when(tool.isNotNull(), "misc")
        .when(
            is_winphone | is_bb | is_ios | is_android
            | c.rlike("FxiOS/|CriOS/|Mobile Safari"),
            "smartphone",
        )
        .when(
            nt.isNotNull()
            | c.rlike("Mac OS X|CrOS|Linux|FreeBSD|OpenBSD|NetBSD|SunOS|Macintosh"),
            "pc",
        )
    )
    t = T.StructType(
        [
            T.StructField(
                "browser",
                T.StructType(
                    [
                        T.StructField("family", T.StringType()),
                        T.StructField("version", T.StringType()),
                    ]
                ),
            ),
            T.StructField(
                "device",
                T.StructType([T.StructField("category", T.StringType())]),
            ),
            T.StructField(
                "os",
                T.StructType(
                    [
                        T.StructField("family", T.StringType()),
                        T.StructField("version", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    return (
        F.struct(
            F.struct(
                browser_family.alias("family"), browser_version.alias("version")
            ).alias("browser"),
            F.struct(category.alias("category")).alias("device"),
            F.struct(os_family.alias("family"), os_version.alias("version")).alias(
                "os"
            ),
        ),
        t,
    )


# -- net / misc -------------------------------------------------------------

_IPV4_RE = (
    r"^(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}$"
)


@fn("is_ipv4")
def _is_ipv4(args, kw):
    return _c(args[0]).rlike(_IPV4_RE), T.BooleanType()


@fn("is_ipv6")
def _is_ipv6(args, kw):
    return (
        _c(args[0]).rlike(r"^[0-9a-fA-F:]{2,45}$") & _c(args[0]).contains(":"),
        T.BooleanType(),
    )


@fn("bitwise_and")
def _bitwise_and(args, kw):
    """Custom matano VRL fn (ref: shared/src/functions.rs:33-106)."""
    return _c(args[0]).bitwiseAND(_c(args[1])), T.LongType()


@fn("decode_percent")
def _decode_percent(args, kw):
    return F.try_url_decode(_c(args[0])), T.StringType()


@fn("round")
def _round(args, kw):
    return F.round(_c(args[0]), kw.get("precision", 0)), T.DoubleType()


@fn("mod")
def _mod(args, kw):
    return F.pmod(_c(args[0]), _c(args[1])), T.LongType()


@fn("merge")
def _merge(args, kw):
    """Shallow struct merge: right fields win (VRL merge; deep:true is
    compile-time recursive application)."""
    args = [
        _as_map(a) if isinstance(_t(a), T.VariantType) else a for a in args
    ]
    lc, lt = args[0]
    rc, rt = args[1]
    # a null/absent side contributes nothing (VRL merge with null errs;
    # the try-form yields the other side)
    if lt is None or isinstance(lt, T.NullType):
        return rc, rt if rt is not None else T.StringType()
    if rt is None or isinstance(rt, T.NullType):
        return lc, lt
    if (
        isinstance(lt, T.MapType)
        and isinstance(rt, T.MapType)
        and not isinstance(rt.valueType, T.VariantType)
    ):
        key = lt.keyType
        out = T.MapType(key, lt.valueType)
        return (
            F.map_concat(
                F.map_filter(
                    F.coalesce(lc, F.create_map().cast(out)),
                    lambda k, _v: ~F.array_contains(F.map_keys(rc), k),
                ),
                rc.cast(out.simpleString()),
            ),
            out,
        )
    if (isinstance(lt, T.MapType) and isinstance(lt.valueType, T.VariantType)) or (
        isinstance(rt, T.MapType) and isinstance(rt.valueType, T.VariantType)
    ):
        # a dynamic-object side (ragged lookup-table entry, object!()
        # of a mutated payload): unify through map<string,variant> so
        # non-string values (arrays, nested objects) survive — right
        # side wins per VRL, keys absent from the right keep the left
        def to_vmap(c, t):
            if isinstance(t, T.MapType) and isinstance(t.valueType, T.VariantType):
                return c
            if isinstance(t, T.MapType):
                return F.transform_values(c, lambda _k, v: v.cast("variant"))
            return F.try_variant_get(
                F.to_variant_object(c), "$", "map<string,variant>"
            )

        out = T.MapType(T.StringType(), T.VariantType())
        l_m, r_m = to_vmap(lc, lt), to_vmap(rc, rt)
        empty = F.create_map().cast("map<string,variant>")
        return (
            F.map_concat(
                F.map_filter(
                    F.coalesce(l_m, empty),
                    lambda k, _v: ~F.array_contains(F.map_keys(r_m), k),
                ),
                F.coalesce(r_m, empty),
            ),
            out,
        )
    if isinstance(lt, T.MapType) or isinstance(rt, T.MapType):
        # mixed map/struct (parse_key_value output merged into a typed
        # object, or vice versa): unify through the map<string,VARIANT>
        # form — right side wins per VRL. Variant values keep NESTED
        # objects intact (s3access merges a grok struct carrying
        # request.method into `.http = {}`; the old map<string,string>
        # funnel flattened the nested struct to its string cast).
        def to_map(c, t):
            if isinstance(t, T.MapType):
                if isinstance(t.valueType, T.VariantType):
                    return c
                return F.transform_values(
                    c, lambda _k, v: v.cast("variant")
                )
            return F.map_from_arrays(
                F.array(*[F.lit(f.name) for f in t.fields]),
                F.array(
                    *[
                        (
                            F.to_variant_object(c.getField(f.name))
                            if isinstance(
                                f.dataType,
                                (T.StructType, T.ArrayType, T.MapType),
                            )
                            else c.getField(f.name).cast("variant")
                        )
                        for f in t.fields
                    ]
                ),
            )
        mt = "map<string,variant>"
        out = T.MapType(T.StringType(), T.VariantType())
        l_m, r_m = to_map(lc, lt), to_map(rc, rt)
        return (
            F.map_concat(
                F.map_filter(
                    F.coalesce(l_m, F.create_map().cast(mt)),
                    lambda k, _v: ~F.array_contains(F.map_keys(r_m), k),
                ),
                F.coalesce(r_m, F.create_map().cast(mt)),
            ),
            out,
        )
    if not isinstance(lt, T.StructType) or not isinstance(rt, T.StructType):
        raise ValueError("merge requires struct-typed args with known schema")
    names = [f.name for f in lt.fields if f.name not in {g.name for g in rt.fields}]
    cols = [lc.getField(n).alias(n) for n in names] + [
        rc.getField(f.name).alias(f.name) for f in rt.fields
    ]
    fields = [f for f in lt.fields if f.name in names] + list(rt.fields)
    return F.struct(*cols), T.StructType(fields)


@fn("exists")
def _exists(args, kw):
    return _c(args[0]).isNotNull(), T.BooleanType()


@fn("coalesce")
def _coalesce(args, kw):
    """VRL `??` error/null coalescing: fallible exprs compile to
    null-on-error try_* forms, so `a ?? b` is plain COALESCE. Arms of
    different static types unify to string (`to_int(v) ?? v`) —
    except the `struct ?? {}` empty-object-default idiom, where the
    empty-map arm becomes a null of the struct's type."""
    types = [_t(a) for a in args]
    struct_ts = {
        t.simpleString() for t in types if isinstance(t, T.StructType)
    }
    if len(struct_ts) == 1 and all(
        t is None
        or isinstance(t, (T.StructType, T.NullType))
        or (isinstance(t, T.MapType) and t.simpleString() == "map<string,string>")
        for t in types
    ):
        st = next(t for t in types if isinstance(t, T.StructType))
        cols = [
            _c(a) if isinstance(_t(a), T.StructType) else F.lit(None).cast(st)
            for a in args
        ]
        return (F.coalesce(*cols) if len(cols) > 1 else cols[0]), st
    args = _unify(list(args))
    t = next((_t(a) for a in args if _t(a) is not None), T.StringType())
    if isinstance(t, T.VariantType):
        # keep the variant COLUMN (the scalar funnel would cast to
        # string while the claimed type stays variant — a read through
        # the result would then variant_get a string)
        cols = [
            _cv(a) if isinstance(_t(a), T.VariantType) else _c(a).cast("variant")
            for a in args
        ]
        return F.coalesce(*cols), t
    return F.coalesce(*[_c(a) for a in args]), t


@fn("ternary")
def _ternary(args, kw):
    """Expression-position if/else (closure bodies): when(cond, then)
    .otherwise(orelse), branch types unified."""
    cond = _c(args[0])
    then, orelse = _unify([args[1], args[2]])
    t = _t(then) if _t(then) is not None and not isinstance(_t(then), T.NullType) else _t(orelse)
    if isinstance(t, T.VariantType):
        branches = [
            _cv(a) if isinstance(_t(a), T.VariantType) else _c(a).cast("variant")
            for a in (then, orelse)
        ]
        return F.when(cond, branches[0]).otherwise(branches[1]), t
    return F.when(cond, _c(then)).otherwise(_c(orelse)), t or T.StringType()


@fn("concat_or_add")
def _concat_or_add(args, kw):
    """VRL `+`: string concatenation when either side is a string,
    numeric addition otherwise (resolved statically from schema)."""
    lt, rt = _t(args[0]), _t(args[1])
    if isinstance(lt, T.StringType) or isinstance(rt, T.StringType):
        return F.concat(_c(args[0]).cast("string"), _c(args[1]).cast("string")), T.StringType()
    return _c(args[0]) + _c(args[1]), lt or rt or T.DoubleType()


@fn("floor")
def _floor(args, kw):
    return F.floor(_c(args[0])), T.LongType()


@fn("ceil")
def _ceil(args, kw):
    return F.ceil(_c(args[0])), T.LongType()


@fn("abs")
def _abs(args, kw):
    return F.abs(_c(args[0])), _t(args[0]) or T.DoubleType()


def _map_values_walk(f, col: Column, t: T.DataType, recursive: bool):
    """Apply f to every value of a map/struct; `recursive` descends
    into nested maps/structs/arrays-of-structs. Struct shape is static,
    so the struct rewrite is pure compile-time column surgery — no UDF
    (ref aws_vpcflow/log_source.yml:28-30 map_values recursive)."""
    if isinstance(t, T.MapType):
        if recursive and isinstance(
            t.valueType, (T.MapType, T.StructType, T.ArrayType)
        ):
            # value type is uniform → one sample walk gives the new type
            inner = lambda v: _map_values_walk(f, v, t.valueType, True)  # noqa: E731
            _, vt = inner(F.lit(None).cast(t.valueType))
            return F.transform_values(col, lambda k, v: inner(v)[0]), T.MapType(
                t.keyType, vt
            )
        nc_t = apply_value_fn(f, F.lit(None).cast(t.valueType), t.valueType)[1]
        return (
            F.transform_values(col, lambda k, v: apply_value_fn(f, v, t.valueType)[0]),
            T.MapType(t.keyType, nc_t or t.valueType),
        )
    if isinstance(t, T.StructType):
        cols, fields = [], []
        for fld in t.fields:
            child = col.getField(fld.name)
            if recursive and isinstance(
                fld.dataType, (T.MapType, T.StructType, T.ArrayType)
            ):
                cc, ct = _map_values_walk(f, child, fld.dataType, True)
            else:
                cc, ct = apply_value_fn(f, child, fld.dataType)
            cols.append(cc.alias(fld.name))
            fields.append(T.StructField(fld.name, ct or fld.dataType))
        # a null struct stays null instead of becoming a struct of nulls
        out_t = T.StructType(fields)
        return (
            F.when(col.isNull(), F.lit(None).cast(out_t)).otherwise(
                F.struct(*cols)
            ),
            out_t,
        )
    if isinstance(t, T.ArrayType):
        inner = lambda v: _map_values_walk(f, v, t.elementType, recursive)  # noqa: E731
        if isinstance(t.elementType, (T.MapType, T.StructType, T.ArrayType)):
            _, et = inner(F.lit(None).cast(t.elementType))
            return F.transform(col, lambda v: inner(v)[0]), T.ArrayType(et)
        return col, t  # array of scalars: values are the array itself
    # scalar leaf (recursive descent bottom)
    return apply_value_fn(f, col, t)


@fn("map_values")
def _map_values(args, kw):
    """Transform map/struct values with a closure (VRL map_values, 56
    uses). `recursive: true` rewrites nested maps/structs leaf-by-leaf
    at compile time — struct shape is static, so no UDF is needed."""
    f = kw["fn"]
    recursive = bool(kw.get("recursive", False))
    c, t = args[0]
    if isinstance(t, T.VariantType):
        # schemaless arg: every reference map_values-over-unknown site
        # iterates an ARRAY (okta ip_chain, gcp authz_info) — object
        # iteration always arrives via object!() which concretizes to
        # a map before reaching here
        c, t = _as_array(args[0], "variant")
        args = [(c, t), *args[1:]]
    if isinstance(t, T.ArrayType) or t is None:
        # VRL map_values also maps over ARRAY elements (the okta
        # ip_chain / route53 answers rebuild closures)
        return _map_each(args, kw)
    if isinstance(t, T.NullType):  # null in → null out (try-form)
        return F.lit(None).cast("array<string>"), T.ArrayType(T.StringType())
    if not isinstance(t, (T.MapType, T.StructType)):
        # scalar input: VRL map_values on a non-collection is a
        # runtime error, not a compile failure — null (array form) so
        # `??` fallbacks and sidelining see an absent value
        return F.lit(None).cast("array<string>"), T.ArrayType(T.StringType())
    return _map_values_walk(f, c, t, recursive)


@fn("map_keys")
def _map_keys(args, kw):
    f = kw["fn"]
    recursive = bool(kw.get("recursive", False))
    c, t = args[0]
    if isinstance(t, T.StructType):
        # static shape: go through the dynamic-object form so one
        # code path (and the recursion) serves both
        c, t = (
            F.try_variant_get(
                F.to_variant_object(c), "$", "map<string,variant>"
            ),
            T.MapType(T.StringType(), T.VariantType()),
        )
    if isinstance(t, (T.VariantType, T.NullType)) or t is None:
        c, t = _as_map(args[0])
    if not isinstance(t, T.MapType):
        raise ValueError("map_keys requires a map-typed column")

    def apply_key(k):
        if isinstance(f, TypedLambda):
            return f((k, t.keyType))[0]
        return f(k)

    if not recursive or not isinstance(t.valueType, T.VariantType):
        return F.transform_keys(c, lambda k, v: apply_key(k)), t

    # recursive rename over a DYNAMIC object (msft aad logs snake_case
    # the whole PascalCase payload). Structural recursion over nested
    # lambdas explodes the expression tree exponentially (the closure
    # is embedded per level), so rename on the serialized JSON TEXT
    # instead: in serialized JSON an unescaped `"k":` token can only
    # be a key (quotes inside string values are escaped, and a closing
    # value-quote is never followed by `:`), so replacing each
    # distinct key's token renames it at EVERY depth in one pass. A
    # sentinel phase (\x00 never appears raw in serialized JSON)
    # prevents rename chains when f(k1) == k2. One closure instance,
    # two linear folds — analysis and execution both stay O(payload).
    js = F.to_json(F.to_variant_object(c))
    keys = F.array_distinct(
        F.regexp_extract_all(js, F.lit(r'"((?:[^"\\]|\\.)*)":'), F.lit(1))
    )
    pairs = F.transform(
        keys, lambda k, i: F.struct(k.alias("k"), i.alias("i"))
    )

    def tok(s):
        return F.concat(F.lit('"'), s, F.lit('":'))

    def sentinel(i):
        return F.concat(F.lit("\x00"), i.cast("string"), F.lit("\x00"))

    def esc(s):  # keep the rewritten key valid inside JSON text
        return F.replace(
            F.replace(s, F.lit("\\"), F.lit("\\\\")),
            F.lit('"'),
            F.lit('\\"'),
        )

    phase1 = F.aggregate(
        pairs,
        js,
        lambda acc, p: F.replace(acc, tok(p["k"]), tok(sentinel(p["i"]))),
    )
    phase2 = F.aggregate(
        pairs,
        phase1,
        lambda acc, p: F.replace(
            acc, tok(sentinel(p["i"])), tok(esc(apply_key(p["k"])))
        ),
    )
    out = F.try_variant_get(F.parse_json(phase2), "$", "map<string,variant>")
    return out, t


@fn("__bool_guard")
def _bool_guard(args, kw):
    """Internal (compiler-emitted, not VRL-visible): null-safe branch
    guard — coalesce(bool(x), false). Used by the When-flattening
    pass so hoisted guard locals are never null."""
    c, t = args[0]
    if isinstance(t, T.VariantType):
        c = F.try_variant_get(c, "$", "boolean")
    return F.coalesce(c.cast("boolean"), F.lit(False)), T.BooleanType()


@fn("object_keys")
def _object_keys(args, kw):
    c, t = args[0]
    if isinstance(t, (T.VariantType, T.NullType)) or t is None:
        c, t = _as_map(args[0])
    if isinstance(t, T.MapType):
        return F.map_keys(c), T.ArrayType(t.keyType)
    if isinstance(t, T.StructType):
        return (
            F.array(*[F.lit(f.name) for f in t.fields]),
            T.ArrayType(T.StringType()),
        )
    raise ValueError("object_keys requires map or struct")


@fn("object_values")
def _object_values(args, kw):
    c, t = args[0]
    if isinstance(t, (T.VariantType, T.NullType)) or t is None:
        c, t = _as_map(args[0])
    if isinstance(t, T.MapType):
        return F.map_values(c), T.ArrayType(t.valueType)
    if isinstance(t, T.StructType):
        return (
            F.array(*[c.getField(f.name).cast("string") for f in t.fields]),
            T.ArrayType(T.StringType()),
        )
    raise ValueError("object_values requires a map-typed column")


def compact_expr(col: Column, dtype: T.DataType) -> Column:
    """Recursive VRL compact(.) semantics (P6, footer
    transformer/src/main.rs:276-282): empty strings and empty arrays
    become null; a struct whose members are all null becomes null.
    Schema-static rewrite — no UDF."""
    if isinstance(dtype, T.StringType):
        return F.when(col == "", F.lit(None)).otherwise(col)
    if isinstance(dtype, T.ArrayType):
        cleaned = F.filter(
            col,
            lambda x: x.isNotNull()
            & (
                x.cast("string") != ""
                if isinstance(dtype.elementType, T.StringType)
                else F.lit(True)
            ),
        )
        return F.when(F.size(cleaned) > 0, cleaned)
    if isinstance(dtype, T.StructType):
        members = [
            compact_expr(col.getField(f.name), f.dataType).alias(f.name)
            for f in dtype.fields
        ]
        rebuilt = F.struct(*members)
        any_set = None
        for f in dtype.fields:
            flag = compact_expr(col.getField(f.name), f.dataType).isNotNull()
            any_set = flag if any_set is None else (any_set | flag)
        return F.when(any_set, rebuilt)
    return col


def compact_rows(df):
    """Apply compact() to every column of a DataFrame (the transform
    footer `. = compact(.)`)."""
    return df.select(
        *[
            compact_expr(F.col(f"`{f.name}`"), f.dataType).alias(f.name)
            for f in df.schema.fields
        ]
    )


def _ipv4_to_long(c: Column) -> Column:
    o = F.split(c, r"\.")
    return (
        F.element_at(o, 1).cast("bigint") * 16777216
        + F.element_at(o, 2).cast("bigint") * 65536
        + F.element_at(o, 3).cast("bigint") * 256
        + F.element_at(o, 4).cast("bigint")
    )


@fn("ip_to_long")
def _ip_to_long(args, kw):
    """Dotted-quad IPv4 → numeric (VRL ip_pton analog for the v4
    case; enables range joins against threat-intel CIDR tables)."""
    c = _c(args[0])
    valid = c.rlike(_IPV4_RE)
    return F.when(valid, _ipv4_to_long(c)), T.LongType()


@fn("ip_cidr_contains")
def _ip_cidr_contains(args, kw):
    """VRL ip_cidr_contains(cidr, ip) for IPv4: pure integer/bit
    expressions — mask = ~(2^(32-prefix) - 1); match when
    (ip & mask) == (base & mask). Null/invalid inputs → false."""
    cidr = kw.get("cidr")
    ip_col = _c(args[0])
    if cidr is None:
        raise ValueError("ip_cidr_contains requires cidr= kwarg")
    base_str, prefix_str = cidr.split("/")
    prefix = int(prefix_str)
    mask = ((1 << 32) - 1) ^ ((1 << (32 - prefix)) - 1)
    import ipaddress

    base = int(ipaddress.IPv4Address(base_str)) & mask
    valid = ip_col.rlike(_IPV4_RE)
    hit = (_ipv4_to_long(ip_col).bitwiseAND(F.lit(mask)) == F.lit(base))
    return F.coalesce(F.when(valid, hit), F.lit(False)), T.BooleanType()


@fn("md5")
def _md5(args, kw):
    return F.md5(_c(args[0]).cast("string")), T.StringType()


@fn("sha1")
def _sha1(args, kw):
    return F.sha1(_c(args[0]).cast("string").cast("binary")), T.StringType()


@fn("sha2")
def _sha2(args, kw):
    bits = kw.get("variant", 256)
    return (
        F.sha2(_c(args[0]).cast("string").cast("binary"), bits),
        T.StringType(),
    )


@fn("format_timestamp")
def _format_timestamp(args, kw):
    fmt = strftime_to_java(kw.get("format", "%Y-%m-%dT%H:%M:%SZ"))
    return F.date_format(_c(args[0]), fmt), T.StringType()


@fn("encode_base64")
def _encode_base64(args, kw):
    """VRL encode_base64 (functions.rs surface; common in CloudTrail /
    Defender transforms for binary-ish payload fields)."""
    return F.base64(_c(args[0]).cast("string").cast("binary")), T.StringType()


@fn("decode_base64")
def _decode_base64(args, kw):
    return F.unbase64(_c(args[0]).cast("string")).cast("string"), T.StringType()


@fn("parse_int")
def _parse_int(args, kw):
    """VRL parse_int with base= (hex registry values, octal modes).
    Invalid digits → null (fallible, pairs with ?? like other parses)."""
    base = kw.get("base", 10)
    c = _c(args[0]).cast("string")
    if base == 10:
        return c.cast("bigint"), T.LongType()
    pat = {2: "^[01]+$", 8: "^[0-7]+$", 16: "^[0-9a-fA-F]+$"}.get(base)
    if pat is None:
        raise ValueError(f"parse_int: unsupported base {base}")
    return (
        F.when(c.rlike(pat), F.conv(c, base, 10).cast("bigint")),
        T.LongType(),
    )


@fn("reverse")
def _reverse(args, kw):
    c, t = args[0]
    if isinstance(t, T.ArrayType):
        return F.reverse(c), t
    return F.reverse(_c(args[0]).cast("string")), T.StringType()


@fn("sort")
def _sort(args, kw):
    c, t = args[0]
    return F.array_sort(c), t if isinstance(t, T.ArrayType) else T.ArrayType(
        T.StringType()
    )


@fn("strip_ansi_escape_codes")
def _strip_ansi(args, kw):
    return (
        F.regexp_replace(_c(args[0]).cast("string"), r"\x1b\[[0-9;]*[A-Za-z]", ""),
        T.StringType(),
    )


@fn("parse_duration")
def _parse_duration(args, kw):
    """VRL parse_duration(s, unit: "s"): "250ms"/"1.5s"/"2m"/"1h" →
    numeric in the requested output unit. Unknown shapes → null."""
    out_unit = kw.get("unit", "s")
    per_s = {"ns": 1e9, "us": 1e6, "ms": 1e3, "s": 1.0, "m": 1 / 60.0,
             "h": 1 / 3600.0}
    if out_unit not in per_s:
        raise ValueError(f"parse_duration: unsupported unit {out_unit!r}")
    c = _c(args[0]).cast("string")
    num = F.regexp_extract(c, r"^([0-9]*\.?[0-9]+)\s*(ns|us|ms|s|m|h)$", 1)
    unit = F.regexp_extract(c, r"^([0-9]*\.?[0-9]+)\s*(ns|us|ms|s|m|h)$", 2)
    in_s = (
        F.when(unit == "ns", num.cast("double") / 1e9)
        .when(unit == "us", num.cast("double") / 1e6)
        .when(unit == "ms", num.cast("double") / 1e3)
        .when(unit == "s", num.cast("double"))
        .when(unit == "m", num.cast("double") * 60)
        .when(unit == "h", num.cast("double") * 3600)
    )
    return in_s * F.lit(per_s[out_unit]), T.DoubleType()


@fn("parse_syslog")
def _parse_syslog(args, kw):
    """RFC3164 syslog line → struct(priority, facility, severity,
    timestamp, hostname, appname, procid, message). The standard
    security-ingest parse (the zeek/panw syslog feeds arrive in this
    framing); non-syslog lines yield null fields, pairing with ?? /
    abort like the other fallible parses."""
    c = _c(args[0]).cast("string")
    pat = (
        r"^<(\d{1,3})>"
        r"([A-Z][a-z]{2}\s+\d{1,2}\s\d{2}:\d{2}:\d{2})\s"
        r"(\S+)\s"
        r"([^\s\[:]+)(?:\[(\d+)\])?:\s?"
        r"(.*)$"
    )
    pri = F.regexp_extract(c, pat, 1)
    prio = F.when(pri != "", pri.cast("int"))
    out_t = T.StructType(
        [
            T.StructField("priority", T.IntegerType()),
            T.StructField("facility", T.IntegerType()),
            T.StructField("severity", T.IntegerType()),
            T.StructField("timestamp", T.StringType()),
            T.StructField("hostname", T.StringType()),
            T.StructField("appname", T.StringType()),
            T.StructField("procid", T.LongType()),
            T.StructField("message", T.StringType()),
        ]
    )
    nullif = lambda e: F.when(e != "", e)  # noqa: E731
    return (
        F.struct(
            prio.alias("priority"),
            (prio / 8).cast("int").alias("facility"),
            (prio % 8).cast("int").alias("severity"),
            nullif(F.regexp_extract(c, pat, 2)).alias("timestamp"),
            nullif(F.regexp_extract(c, pat, 3)).alias("hostname"),
            nullif(F.regexp_extract(c, pat, 4)).alias("appname"),
            nullif(F.regexp_extract(c, pat, 5)).cast("long").alias("procid"),
            nullif(F.regexp_extract(c, pat, 6)).alias("message"),
        ),
        out_t,
    )
