"""Transform DSL: a VRL-subset pipeline language compiled to Spark
Column expressions (SURVEY.md §2.2/§2.3; ref: the reference engine
compiles VRL programs once and caches them, shared/src/vrl_util.rs —
here "compilation" happens at plan-build time and Catalyst is the
cache).

A transform program is a sequence of steps over a row with nested
fields (Assign/Move/Delete/AbortIf/When); expressions are literals,
dotted paths, scalar-function calls (matano_spark.transform.functions)
and operators. Because programs compile against the *resolved schema*,
every dynamic VRL path becomes a static column reference — rows never
leave the JVM and the whole program is one Catalyst projection.
"""

from matano_spark.transform.ast import (  # noqa: F401
    AbortIf,
    Assign,
    Delete,
    Enrich,
    Move,
    When,
    P,
    L,
    Fn,
)
from matano_spark.transform.compiler import compile_pipeline  # noqa: F401
