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
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|CRIT(?:ICAL)?|FATAL|SEVERE|EMERG(?:ENCY)?)",
    "PATH": r"(?:/[\w.-]+)+",
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+.-]*",
}

_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+))?\}")


def translate(pattern: str, patterns: dict[str, str] | None = None):
    """Grok pattern → (regex, [(field_name, group_index)])."""
    table = {**PATTERNS, **(patterns or {})}
    fields: list[tuple[str, int]] = []
    group_counter = 0
    out: list[str] = []
    pos = 0
    for m in _REF.finditer(pattern):
        out.append(pattern[pos : m.start()])
        name, field = m.group(1), m.group(2)
        if name not in table:
            raise KeyError(f"unknown grok pattern %{{{name}}}")
        body = table[name]
        if field:
            group_counter += 1
            fields.append((field, group_counter))
            out.append(f"({body})")
        else:
            out.append(f"(?:{body})")
        pos = m.end()
    out.append(pattern[pos:])
    return "".join(out), fields


def parse_grok(col: Column, pattern: str, patterns: dict[str, str] | None = None):
    """Column → struct of extracted fields (empty match → null fields).

    Dotted field names become nested struct fields, mirroring VRL's
    path creation. Returns (Column, StructType).
    """
    regex, fields = translate(pattern, patterns)
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

    return build(tree)
