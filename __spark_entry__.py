"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship smoke query at sf0.001.
`queries()` — every implemented query/operator (SURVEY.md §2 + LLM-data
pipeline ops), callables (spark, sf_dir) -> DataFrame.
`oracle_sql()` — DuckDB-equivalent SQL per query (omitted only for ops
that are not plain-SQL-expressible; those get rows-only checks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hourly security rollup (W1 tumbling partition window)
    on the events stream table at sf0.001."""
    from matano_spark.workloads import load_registry

    return load_registry()["w1_hourly_rollup"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from matano_spark.workloads import load_registry

    return {name: q.fn for name, q in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    from matano_spark.workloads import load_registry

    return {
        name: q.oracle for name, q in load_registry().items() if q.oracle is not None
    }
