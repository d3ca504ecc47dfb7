"""Grok → regex translation (SURVEY.md §2.3 parse_grok/parse_groks;
ref usage: aws_cloudtrail/log_source.yml grok on source.address,
aws_vpcflow/log_source.yml big patterns).

A grok pattern interleaves regex text with `%{NAME}` / `%{NAME:field}`
references. Translation produces (java_regex, [(field, group_idx)]):
named captures become plain capturing groups (indexed), unnamed ones
non-capturing — so extraction is one `regexp_extract` per field over
the same compiled regex (the JVM caches pattern compilation per
expression)."""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Core pattern table (subset of the standard grok library the managed
# sources rely on; all plain Java-compatible regex).
PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NONNEGINT": r"\d+",
    "POSINT": r"[1-9]\d*",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPV6": r"[0-9a-fA-F:]{2,45}",
    "IP": r"(?:(?:\d{1,3}\.){3}\d{1,3}|[0-9a-fA-F:]{2,45})",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?",
    "IPORHOST": r"(?:(?:\d{1,3}\.){3}\d{1,3}|\b[0-9A-Za-z][0-9A-Za-z-.]*)",
    "USER": r"[a-zA-Z0-9._-]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "QUOTEDSTRING": r"\"[^\"]*\"",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHNUM2": r"(?:0[1-9]|1[0-2])",
    "PORT": r"\d{1,5}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]\d{2}(?::?\d{2})?)",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "MONTH": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b",
    "MONTHDAY": r"(?:0[1-9]|[12]\d|3[01]|[1-9])",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?\d)",
    "MINUTE": r"[0-5]\d",
    "SECOND": r"(?:[0-5]?\d)(?:\.\d+)?",
    "TIME": r"(?:2[0123]|[01]?\d):[0-5]\d:(?:[0-5]?\d)(?:\.\d+)?",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|CRIT(?:ICAL)?|FATAL|SEVERE|EMERG(?:ENCY)?)",
    "PATH": r"(?:/[\w.-]+)+",
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+.-]*",
}

_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+))?\}")


def _count_raw_captures(text: str) -> int:
    """Count RAW capturing groups in a literal regex fragment — a grok
    pattern may carry bare parens around alternations (s3access:
    `\"(-|%{DATA:user_agent})\"`), and Java numbers those too, so the
    %{}-assigned indices must skip past them. Escapes and character
    classes are honored; `(?...)` (non-capturing/lookaround/named) is
    not counted — managed patterns don't use named groups."""
    n = 0
    i = 0
    in_class = False
    while i < len(text):
        ch = text[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(" and text[i + 1 : i + 2] != "?":
            n += 1
        i += 1
    return n


def translate(pattern: str, patterns: dict[str, str] | None = None):
    """Grok pattern → (regex, [(field_name, group_index)]).

    Pattern bodies may themselves reference other patterns (the
    standard grok composition style, e.g. ELB's ELBCOMMON →
    ELBTIMESTAMP/ELBNAME/...); expansion is recursive with group
    indices assigned in document order, counting raw capturing
    groups in the literal text between references."""
    table = {**PATTERNS, **(patterns or {})}
    fields: list[tuple[str, int]] = []
    state = {"n": 0}

    def expand(pat: str, depth: int) -> str:
        if depth > 12:
            raise ValueError("grok pattern recursion too deep")
        out: list[str] = []
        pos = 0
        for m in _REF.finditer(pat):
            seg = pat[pos : m.start()]
            out.append(seg)
            state["n"] += _count_raw_captures(seg)
            name, field = m.group(1), m.group(2)
            if name not in table:
                raise KeyError(f"unknown grok pattern %{{{name}}}")
            body = table[name]
            if field:
                state["n"] += 1
                fields.append((field, state["n"]))
                out.append("(" + expand(body, depth + 1) + ")")
            else:
                out.append("(?:" + expand(body, depth + 1) + ")")
            pos = m.end()
        tail = pat[pos:]
        out.append(tail)
        state["n"] += _count_raw_captures(tail)
        return "".join(out)

    regex = expand(pattern, 0)
    return regex, fields


def parse_groks(
    col: Column, grok_patterns: list[str], patterns: dict[str, str] | None = None
):
    """First-whole-match-wins over several grok patterns, returning ONE
    struct over the UNION of every pattern's fields (fields a pattern
    doesn't define are null) — the shape VRL's parse_groks yields."""
    per = []  # (regex, {field: group_idx})
    union: dict = {}
    for gp in grok_patterns:
        regex, fields = translate(gp, patterns)
        # VRL grok is WHOLE-string: unanchored rlike would let an
        # earlier, shorter pattern claim a SUBSTRING of a longer line
        # (classic-ELB pattern swallowing ALB v2 lines) — anchor with
        # a non-capturing group so capture indices are unchanged
        regex = f"^(?:{regex})$"
        fmap = dict(fields)
        per.append((regex, fmap))
        for field in fmap:
            node = union
            parts = field.split(".")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node.setdefault(parts[-1], None)

    def build(node: dict, prefix: str):
        cols, fields_t = [], []
        for k, v in sorted(node.items()):
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                c, t = build(v, path)
            else:
                t = T.StringType()
                # first-match-wins CASE chain over the pattern list
                c = None
                for regex, fmap in per:
                    ext = (
                        F.regexp_extract(col, regex, fmap[path])
                        if path in fmap
                        else None
                    )
                    val = (
                        F.when(ext != "", ext) if ext is not None else F.lit(None)
                    )
                    c = (
                        F.when(col.rlike(regex), val)
                        if c is None
                        else c.when(col.rlike(regex), val)
                    )
            cols.append(c.alias(k))
            fields_t.append(T.StructField(k, t))
        return F.struct(*cols), T.StructType(fields_t)

    c, t = build(union, "")
    # NO pattern matched -> NULL result (not a struct of null fields):
    # the `_grokked, err = parse_groks(...)` idiom keys err on a null
    # result, and a non-null all-null struct made `if err == null`
    # branches fire on unparseable input (duo auth's ip:port split
    # merged null over the bare ip)
    matched = None
    for regex, _f in per:
        matched = col.rlike(regex) if matched is None else matched | col.rlike(regex)
    if matched is not None:
        c = F.when(matched, c)
    return c, t


def parse_grok(col: Column, pattern: str, patterns: dict[str, str] | None = None):
    """Column → struct of extracted fields (empty match → null fields).

    Dotted field names become nested struct fields, mirroring VRL's
    path creation. Returns (Column, StructType).
    """
    regex, fields = translate(pattern, patterns)
    regex = f"^(?:{regex})$"  # VRL grok is whole-string (see parse_groks)
    # Group dotted names into a nested dict of extracts.
    tree: dict = {}
    for field, idx in fields:
        parts = field.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        ext = F.regexp_extract(col, regex, idx)
        node[parts[-1]] = F.when(ext != "", ext)  # non-match → null

    def build(node: dict):
        cols, fields_t = [], []
        for k, v in node.items():
            if isinstance(v, dict):
                c, t = build(v)
            else:
                c, t = v, T.StringType()
            cols.append(c.alias(k))
            fields_t.append(T.StructField(k, t))
        return F.struct(*cols), T.StructType(fields_t)

    c, t = build(tree)
    # no match -> NULL result, same err-idiom reasoning as parse_groks
    return F.when(col.rlike(regex), c), t
