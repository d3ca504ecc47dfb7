"""Sigma rule → Column expression compiler (SURVEY.md §2.7: "Sigma
rules compile to boolean column expressions"; the reference converts
Sigma to Python detections via pySigma — README.md:37).

Supported subset (the common shape of public Sigma rules):
  detection:
    <selection-name>:            # map → AND of field predicates
      field: value               # equality (case-insensitive, per spec)
      field: v*lue?              # wildcards in values (* any, ? one)
      field|contains: v          # substring
      field|startswith: v
      field|endswith: v
      field|contains|all: [a,b]  # |all chains a list with AND, not OR
      field|re: regex            # case-SENSITIVE, as written (spec)
      field|cidr: 10.0.0.0/8     # IPv4 network containment
      field|gt/gte/lt/lte: n     # numeric compare
      field|base64[|contains]: v # value base64-encoded at compile time
      field|base64offset[|contains]: v  # all 3 base64 alignments OR'd
      field|utf16le|base64offset|contains: v  # (also utf16/utf16be/wide)
      field|windash[|contains]: v# -/ argument-dash variant expansion
      field|contains|cased: v    # cased disables case-folding
      field|exists: true         # field presence (non-null)
      field|fieldref: other.field# compare against another event field
      field: [v1, v2]            # any-of (OR)
    <selection-name>:            # list of scalars → keyword full-text
      - keyword1                 # (contains over the row's JSON form)
    condition: selection1 and not selection2 | 1 of them | all of them
               | 1 of sel_* | all of sel_*

Per the Sigma spec, string matching (equality/contains/startswith/
endswith and wildcard values) is case-INSENSITIVE; `re` is not.

Field names are dotted ECS paths resolved against the DataFrame
schema (missing → null → predicate false). Compiling to Column
expressions keeps detection evaluation inside whole-stage codegen —
the fast path; Python `detect()` modules remain the escape hatch.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _field_col(df: DataFrame, dotted: str) -> Column:
    from pyspark.sql import types as T

    parts = dotted.split(".")
    dtype: Any = df.schema
    col = None
    for p in parts:
        if not isinstance(dtype, (T.StructType,)):
            return F.lit(None)
        match = next((f for f in dtype.fields if f.name == p), None)
        if match is None:
            return F.lit(None)
        col = F.col(f"`{p}`") if col is None else col.getField(p)
        dtype = match.dataType
    return col if col is not None else F.lit(None)


_WILDCARD = re.compile(r"[*?]")


def _wildcard_to_regex(value: str) -> str:
    """Sigma wildcard value → anchored regex (* = any run, ? = one)."""
    out = []
    for ch in value:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def _ci(col: Column) -> Column:
    return F.lower(col.cast("string"))


def _predicate(col: Column, modifier: str | None, value: Any) -> Column:
    if isinstance(value, list):
        preds = [_predicate(col, modifier, v) for v in value]
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out
    if modifier is None:
        if value is None:
            return col.isNull()
        if isinstance(value, str):
            if _WILDCARD.search(value):
                return _ci(col).rlike(_wildcard_to_regex(value.lower()))
            return _ci(col) == F.lit(value.lower())
        return col == F.lit(value)
    if modifier == "contains":
        return _ci(col).contains(str(value).lower())
    if modifier == "startswith":
        return _ci(col).startswith(str(value).lower())
    if modifier == "endswith":
        return _ci(col).endswith(str(value).lower())
    if modifier == "re":
        return col.rlike(str(value))
    if modifier == "cidr":
        import ipaddress

        base_str, prefix_str = str(value).split("/")
        prefix = int(prefix_str)
        if ":" in base_str:
            # IPv6: the rule network expands to four masked 32-bit
            # words (compile-time); the event IP parses via the same
            # 128-bit machinery as LPM enrichment.
            from matano_spark.operators.enrichment import (
                _mask_words,
                ip6_words,
            )

            net = int(ipaddress.IPv6Network(str(value), strict=False).network_address)
            masks = _mask_words(prefix)
            words = ip6_words(col.cast("string"))
            p: Column | None = None
            for k in range(4):
                want = (net >> (32 * (3 - k))) & 0xFFFFFFFF & masks[k]
                q = words[k].bitwiseAND(F.lit(masks[k])) == F.lit(want)
                p = q if p is None else (p & q)
            assert p is not None
            return F.when(col.cast("string").contains(":"), p)
        from matano_spark.transform.functions import _IPV4_RE, _ipv4_to_long

        mask = ((1 << 32) - 1) ^ ((1 << (32 - prefix)) - 1)
        base = int(ipaddress.IPv4Address(base_str)) & mask
        ip = col.cast("string")
        return F.when(
            ip.rlike(_IPV4_RE),
            _ipv4_to_long(ip).bitwiseAND(F.lit(mask)) == F.lit(base),
        )
    if modifier == "exists":
        # spec: `exists: true` matches when the field is present;
        # against a fixed relational schema, presence = non-null.
        want = value if isinstance(value, bool) else str(value).lower() == "true"
        return col.isNotNull() if want else col.isNull()
    if modifier in ("cased", "contains|cased", "startswith|cased", "endswith|cased"):
        # spec: `cased` disables the default case-insensitive matching
        s = col.cast("string")
        v = str(value)
        if modifier == "cased":
            if _WILDCARD.search(v):
                return s.rlike(_wildcard_to_regex(v))
            return s == F.lit(v)
        rest = modifier.split("|", 1)[0]
        if rest == "contains":
            return s.contains(v)
        if rest == "startswith":
            return s.startswith(v)
        return s.endswith(v)
    enc_prefix = None
    base_mod = modifier
    head = modifier.split("|", 1)[0]
    if head in ("utf16le", "utf16be", "utf16", "wide"):
        # spec: utf16* re-encode the VALUE's bytes and must be chained
        # with a base64 modifier (the raw utf16 bytes are not
        # representable as a match literal).
        enc_prefix = head
        if "|" not in modifier:
            raise ValueError(
                f"sigma modifier {head!r} must chain a base64 modifier"
            )
        base_mod = modifier.split("|", 1)[1]

    def _value_bytes() -> bytes:
        v = str(value)
        if enc_prefix in ("utf16le", "wide"):
            return v.encode("utf-16le")
        if enc_prefix == "utf16be":
            return v.encode("utf-16be")
        if enc_prefix == "utf16":
            return v.encode("utf-16")  # includes the BOM, per spec
        return v.encode()

    if base_mod == "base64" or base_mod.startswith("base64|"):
        # spec: base64 TRANSFORMS the value (encoded at compile time);
        # any chained modifier (e.g. base64|contains) then applies to
        # the encoded literal. base64 matching is case-SENSITIVE.
        import base64 as _b64

        rest = base_mod[len("base64|"):] if "|" in base_mod else None
        enc = _b64.b64encode(_value_bytes()).decode()
        if rest is None:
            return col.cast("string") == F.lit(enc)
        if rest == "contains":
            return col.cast("string").contains(enc)
        raise ValueError(f"unsupported sigma modifier chain {modifier!r}")
    if base_mod == "base64offset" or base_mod.startswith("base64offset|"):
        # spec: the value may start at any byte offset mod 3 inside
        # the base64 stream — encode at the 3 alignments (filler bytes
        # prepended, then the filler-tainted leading chars and the
        # padding-tainted trailing chars cut) and OR the contains.
        import base64 as _b64

        rest = base_mod[len("base64offset|"):] if "|" in base_mod else None
        if rest not in (None, "contains"):
            raise ValueError(f"unsupported sigma modifier chain {modifier!r}")
        raw = _value_bytes()
        start_offsets = (0, 2, 3)
        end_offsets = (None, -3, -2)
        out: Column | None = None
        for i in range(3):
            enc = _b64.b64encode(b"\x00" * i + raw)[
                start_offsets[i] : end_offsets[(len(raw) + i) % 3]
            ].decode()
            p = col.cast("string").contains(enc)
            out = p if out is None else (out | p)
        assert out is not None
        return out
    if modifier == "windash" or modifier.startswith("windash|"):
        # spec: windash expands EVERY dash-like occurrence (-, /, en
        # dash, em dash, horizontal bar) INDEPENDENTLY — a per-
        # occurrence cartesian product of variants, so '-foo /bar'
        # must match the value '-foo -bar'. Equivalent O(1) form
        # instead of 5^k OR'd predicates: fold all dash variants to
        # '-' on BOTH sides (JVM-side translate) and match once — a
        # string is in the expansion set iff it equals the value
        # everywhere except dash positions, where any dash char sits.
        rest = modifier[len("windash|"):] if "|" in modifier else None
        if rest not in (None, "contains", "startswith", "endswith"):
            raise ValueError(f"unsupported sigma modifier chain {modifier!r}")
        dash = "/–—―"
        norm_val = str(value)
        for ch in dash:
            norm_val = norm_val.replace(ch, "-")
        norm_col = F.translate(col.cast("string"), dash, "----")
        return _predicate(norm_col, rest, norm_val)
    if modifier == "gt":
        return col > F.lit(value)
    if modifier == "gte":
        return col >= F.lit(value)
    if modifier == "lt":
        return col < F.lit(value)
    if modifier == "lte":
        return col <= F.lit(value)
    raise ValueError(f"unsupported sigma modifier {modifier!r}")


def _selection_expr(df: DataFrame, sel: dict[str, Any]) -> Column:
    preds = []
    for key, value in sel.items():
        if "|" in key:
            field, modifier = key.split("|", 1)
        else:
            field, modifier = key, None
        if modifier == "fieldref":
            # spec: compare against ANOTHER FIELD of the same event
            # (case-sensitive — these are references, not patterns)
            p = _field_col(df, field).cast("string") == _field_col(
                df, str(value)
            ).cast("string")
            preds.append(F.coalesce(p, F.lit(False)))
            continue
        # `|all` suffix: a list combines with AND instead of any-of OR
        if modifier is not None and modifier.endswith("|all"):
            modifier = modifier[: -len("|all")]
            items = value if isinstance(value, list) else [value]
            p: Column | None = None
            for v in items:
                q = _predicate(_field_col(df, field), modifier, v)
                p = q if p is None else (p & q)
            assert p is not None
            preds.append(F.coalesce(p, F.lit(False)))
            continue
        preds.append(
            F.coalesce(_predicate(_field_col(df, field), modifier, value), F.lit(False))
        )
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


_COND_TOKEN = re.compile(
    r"\(|\)|\band\b|\bor\b|\bnot\b|1 of [\w*]+|all of [\w*]+|[\w*]+"
)


def compile_sigma(df: DataFrame, rule: dict[str, Any]) -> Column:
    """Sigma rule dict (yaml.safe_load of a rule file) → boolean Column."""
    detection = rule["detection"]
    condition = detection.get("condition", "selection")
    selections: dict[str, Column] = {}
    for name, sel in detection.items():
        if name in ("condition", "timeframe"):
            continue
        if isinstance(sel, dict):
            selections[name] = _selection_expr(df, sel)
        elif isinstance(sel, list) and sel and all(
            isinstance(s, dict) for s in sel
        ):
            # Sigma list-of-maps selection = OR of the maps
            out = _selection_expr(df, sel[0])
            for s in sel[1:]:
                out = out | _selection_expr(df, s)
            selections[name] = out
        elif isinstance(sel, list) and sel and all(
            isinstance(s, (str, int, float)) for s in sel
        ):
            # keyword selection (list of scalars): full-text search —
            # any keyword present anywhere in the event. Relational
            # analog: case-insensitive contains over the row's JSON
            # rendering (wildcards honored). One to_json per row —
            # JVM-side, but necessarily scans every column; prefer
            # field predicates in hot rules.
            blob = F.lower(F.to_json(F.struct(*df.columns)))
            out = None
            for kw in sel:
                kws = str(kw).lower()
                p = (
                    blob.rlike(_wildcard_to_regex(kws)[1:-1])
                    if _WILDCARD.search(kws)
                    else blob.contains(kws)
                )
                out = p if out is None else (out | p)
            assert out is not None
            selections[name] = out
        else:
            # other forms are not supported — fail loudly rather than
            # silently skipping the selection (it would corrupt
            # '1 of them' conditions)
            raise ValueError(
                f"unsupported sigma selection form for {name!r}"
            )
    if not selections:
        raise ValueError("sigma rule has no selections")

    tokens = _COND_TOKEN.findall(condition)

    def _group(pattern: str) -> list[Column]:
        if pattern == "them":
            return list(selections.values())
        import fnmatch

        names = [n for n in selections if fnmatch.fnmatchcase(n, pattern)]
        if not names:
            raise ValueError(f"no selection matches {pattern!r} in condition")
        return [selections[n] for n in names]

    def any_of(pattern: str = "them") -> Column:
        out = None
        for c in _group(pattern):
            out = c if out is None else (out | c)
        return out

    def all_of(pattern: str = "them") -> Column:
        out = None
        for c in _group(pattern):
            out = c if out is None else (out & c)
        return out

    pos = 0

    def parse_or() -> Column:
        nonlocal pos
        left = parse_and()
        while pos < len(tokens) and tokens[pos] == "or":
            pos += 1
            left = left | parse_and()
        return left

    def parse_and() -> Column:
        nonlocal pos
        left = parse_not()
        while pos < len(tokens) and tokens[pos] == "and":
            pos += 1
            left = left & parse_not()
        return left

    def parse_not() -> Column:
        nonlocal pos
        if pos < len(tokens) and tokens[pos] == "not":
            pos += 1
            return ~parse_not()
        return parse_atom()

    def parse_atom() -> Column:
        nonlocal pos
        tok = tokens[pos]
        pos += 1
        if tok == "(":
            e = parse_or()
            pos += 1  # ')'
            return e
        if tok.startswith("1 of "):
            return any_of(tok[len("1 of "):])
        if tok.startswith("all of "):
            return all_of(tok[len("all of "):])
        if tok in selections:
            return selections[tok]
        raise ValueError(f"unknown selection {tok!r} in condition")

    return parse_or()


def sigma_filter(df: DataFrame, rule: dict[str, Any]) -> DataFrame:
    """Rows matching the rule (the detection pre-filter / full
    detection when the rule is pure predicate)."""
    return df.filter(compile_sigma(df, rule))


def sigma_fields(rule: dict[str, Any]) -> tuple[str, ...]:
    """The rule's field READ SET — every selection key before `|`,
    plus `|fieldref` comparand fields. This is the projection-pushdown
    contract a detection declares: feed it to
    `TableDef.pipeline_for(sigma_fields(rule) + extras)` and the
    upstream transform compiles only the statements the detection can
    observe (transform/slice.py). Keyword (full-text) selections read
    no named field and contribute nothing here."""
    out: list[str] = []

    def walk(sel: Any) -> None:
        if isinstance(sel, dict):
            for k, v in sel.items():
                field = k.split("|", 1)[0]
                if field:
                    out.append(field)
                mods = k.split("|")[1:]
                if "fieldref" in mods and isinstance(v, str):
                    out.append(v)
        elif isinstance(sel, list):
            for x in sel:
                walk(x)

    for name, sel in (rule.get("detection") or {}).items():
        if name in ("condition", "timeframe"):
            continue
        walk(sel)
    return tuple(dict.fromkeys(out))
