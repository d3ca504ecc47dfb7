"""Schema system (SURVEY.md §1.3): declared, fixed-per-table schemas
composed from an ECS subset + custom fields, emitted as Spark
StructType.

Reference pipeline (infra/lib/schema.ts:44-182): `resolveSchema`
selects ECS fields by dotted name, deep-merges user fields (conflicts
with ECS names rejected, :173-178), always adds ts/labels/tags
defaults (:94-95,154-161), and sorts `ts` first (log-source.ts:
457-458). Evolution merges by name with new field ids
(MatanoIcebergTableCustomResource.kt:194-212).

The base ECS subset here is hand-written from the public Elastic
Common Schema field reference (the reference vendors the full ~3000
leaf JSON; `load_base_schema(path)` accepts such a JSON for full
coverage — same dialect)."""

from matano_spark.schema.resolve import (  # noqa: F401
    ECS_BASE,
    fields_to_structtype,
    load_base_schema,
    merge_schemas,
    resolve_schema,
    structtype_to_fields,
)
from matano_spark.schema.ddl import (  # noqa: F401
    create_table_ddl,
    flatten_columns,
    flattened_view_sql,
)
