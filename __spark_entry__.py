"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 plus the
LLM-pipeline extensions, as (spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — DuckDB-equivalent SQL for each query (the correctness
gate compares row counts, schemas, and order-insensitive value hashes).

Implementations live in ``mallarddv_spark.suite``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mallarddv_spark.suite import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q3-style shipping-priority join/agg/top-k."""
    fn, _ = REGISTRY["tpch_q3"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle for name, (_fn, oracle) in REGISTRY.items() if oracle is not None
    }
