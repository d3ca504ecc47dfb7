"""Generate the vendored full ECS base schema (data/ecs/ecs_base.json).

The Elastic Common Schema field reference is public (elastic/ecs,
Apache-2.0). The reference engine vendors it lowered to Iceberg
primitives (ecs_iceberg_schema.json — 54 top-level fields, ~3.4k
leaves); this tool lowers the same public field inventory into THIS
repo's schema dialect (nested dicts = structs, `list<...>` strings,
scalar names) so resolve_schema can select subtrees from the complete
ECS tree instead of the hand-written mini subset.

Usage:  python tools/gen_ecs_schema.py <ecs-iceberg-json> <out-json>
"""

from __future__ import annotations

import json
import sys


def lower(t) -> object:
    if isinstance(t, str):
        return t  # scalar names already match the dialect
    kind = t["type"]
    if kind == "struct":
        return {f["name"]: lower(f["type"]) for f in t["fields"]}
    if kind == "list":
        el = lower(t["element"])
        if isinstance(el, str):
            return f"list<{el}>"
        return {"type": "list", "element": {"type": "struct", "fields": el}}
    return kind


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    with open(src) as f:
        tree = json.load(f)
    out = lower(tree)
    assert isinstance(out, dict)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {dst}: {len(out)} top-level fields")


if __name__ == "__main__":
    main()
