"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over `vector_database_spark.workload`, which holds the full
query inventory (vector core, dedup, text analysis, relational surface,
events) with per-query DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_database_spark import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BSP-tree index build
    over the embeddings table + pruned vicinity search + exact
    refinement (matches the brute-force oracle)."""
    return workload.v01_search_exact(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    return workload.oracle_sql()
