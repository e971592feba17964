"""Staging hash views: ``stg.{t}_hash_vw``.

A catalog view over the staging table that adds every hub hash key, link
hash key and satellite hash-diff the downstream loads need (reference
``hash_generator.py:69-179`` + CREATE_HASH_VIEW template). Views are logical
— Catalyst inlines them into each load, so the hash expressions participate
in whole-stage codegen and column pruning drops unused hashes per-load.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from mallarddv_spark.plans.model import TransitionRecord
from mallarddv_spark.plans.planner import plan_hash_view


def create_hash_view(
    spark: SparkSession,
    stg_db: str,
    stg_table: str,
    records: list[TransitionRecord],
    algo: str = "sha1",
    verbose: bool = False,
) -> str:
    """CREATE OR REPLACE the hash view; returns the view SQL."""
    plan = plan_hash_view(stg_table, records, algo=algo)
    sql = plan.view_sql(stg_db)
    if verbose:
        print(sql)
    spark.sql(sql)
    return sql
