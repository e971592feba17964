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
    issued: dict[str, str] | None = None,
) -> str:
    """CREATE OR REPLACE the hash view; returns the view SQL.

    ``issued`` is an optional caller-owned memo of previously issued view
    SQL per ``db.table`` — when the byte-identical SQL was already issued,
    the CREATE OR REPLACE round-trip is skipped (~50 ms of catalog DDL per
    flow). View DDL is derived purely from metadata, so identical SQL means
    an identical catalog view; any metadata or algo change produces
    different SQL and re-issues. The memo's owner (the flow executor) must
    discard it whenever the catalog may have been rebuilt under it
    (``init_vault``)."""
    plan = plan_hash_view(stg_table, records, algo=algo)
    sql = plan.view_sql(stg_db)
    if verbose:
        print(sql)
    key = f"{stg_db}.{stg_table}"
    if issued is not None and issued.get(key) == sql:
        return sql
    spark.sql(sql)
    if issued is not None:
        issued[key] = sql
    return sql
