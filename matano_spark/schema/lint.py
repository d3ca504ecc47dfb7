"""Schema-vs-transform lint (round-3 verdict task #1).

A transform that assigns a path the resolved table schema does not
declare is silently dropped by the full-schema projection
(pipeline `apply_schema` lands only declared fields) — the write
vanishes with no error, which is how the cloudflare `source.port`
bug shipped. This lint makes that class of bug a load-time failure.

Rules:
- every Assign / Move-destination / Enrich-target path must resolve
  inside the table's StructType (struct member at each step; a
  MapType or other dynamic leaf accepts any suffix),
- EXCEPT paths that the program later deletes (VRL temp-var idiom:
  `.tmp_x = ...` ... `del(.tmp_x)`) or uses as a Move source
  (`.a = del(.tmp_x)` deletes the source).

Reference parity: the reference validates table schemas at apply
time (infra/lib/log-source.ts resolveSchema) but has no equivalent
assigned-but-undeclared check; this is an addition.
"""

from __future__ import annotations

from pyspark.sql import types as T

from matano_spark.transform import ast


def _collect(steps, assigns: list[str], deletes: set[str]) -> None:
    for s in steps:
        if isinstance(s, ast.Assign):
            assigns.append(s.path)
        elif isinstance(s, ast.Move):
            assigns.append(s.dst)
            deletes.add(s.src)
        elif isinstance(s, ast.Delete):
            deletes.add(s.path)
        elif isinstance(s, ast.Enrich):
            assigns.append(s.target)
        elif isinstance(s, ast.When):
            _collect(s.steps, assigns, deletes)
            _collect(s.orelse, assigns, deletes)


def _resolves(schema: T.StructType, parts: tuple[str, ...]) -> bool:
    node: T.DataType = schema
    for i, part in enumerate(parts):
        if isinstance(node, T.StructType):
            names = {f.name: f.dataType for f in node.fields}
            if part not in names:
                return False
            node = names[part]
        elif isinstance(node, (T.MapType, T.VariantType)) or (
            isinstance(node, T.StringType) and i > 0
        ):
            # dynamic containers (and JSON-string leaves) accept any
            # suffix — the cast layer serializes into them
            return True
        else:
            return False  # path descends below a non-struct leaf
    return True


def lint_transform(steps, schema: T.StructType) -> list[str]:
    """Return assigned-but-undeclared paths (empty = clean)."""
    assigns: list[str] = []
    deletes: set[str] = set()
    _collect(steps, assigns, deletes)

    def _deleted(path: str) -> bool:
        parts = ast.split_path(path)
        for d in deletes:
            dp = ast.split_path(d)
            if parts[: len(dp)] == dp:
                return True
        return False

    bad: list[str] = []
    for path in assigns:
        parts = ast.split_path(path)
        if not parts:  # whole-row assignment `. = ...`
            continue
        if _resolves(schema, parts):
            continue
        if parts[0].startswith("tmp_") and not _resolves(schema, parts[:1]):
            # temp-var convention: UNDECLARED `.tmp_*` roots are
            # intentionally dropped by the full-schema projection.
            # Root-resolution guard keeps schema-declared tmp_* fields
            # (which the projection would KEEP) lint-covered.
            continue
        if _deleted(path):
            continue
        if path not in bad:
            bad.append(path)
    return bad
