"""Catalog management: databases, metadata control tables, staging DDL,
user view scripts.

Replaces the reference's SchemaManager/MetadataManager DDL duties
(``db/schema_manager.py``, ``metadata/metadata_manager.py:72-167``) with
Spark catalog operations. Tables are managed tables (parquet in the session
warehouse); on a production lake these would be Delta/Iceberg tables — the
load protocol below only relies on atomic append/overwrite, which both
provide.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from mallarddv_spark.functions.hashing import quote_ident
from mallarddv_spark.plans.model import (
    TABLES_SCHEMA,
    TRANSITIONS_SCHEMA,
    RUNINFO_SCHEMA,
    TableColumn,
    group_records,
)
from mallarddv_spark.plans.types import spark_type_for

#: the five fixed layers of the vault (reference ``schema_manager.py:20``).
#: "metadata" is renamed-able via VaultConfig; these are the defaults.
DEFAULT_SCHEMAS = ("stg", "dv", "bv", "dm", "metadata")


def ensure_databases(spark: SparkSession, schemas=DEFAULT_SCHEMAS) -> None:
    # independent catalog entries; each CREATE is a serial driver round
    # trip, so issue them from a small pool (they commonly run five at a
    # time at vault init)
    from concurrent.futures import ThreadPoolExecutor

    schemas = list(schemas)
    if len(schemas) <= 1:
        for s in schemas:
            spark.sql(f"CREATE DATABASE IF NOT EXISTS {quote_ident(s)}")
        return
    # capped: a long custom schema list must not spawn one thread each
    # (concurrent DDL serializes on an embedded metastore anyway — the
    # overlap pays off against a remote one)
    with ThreadPoolExecutor(max_workers=min(8, len(schemas))) as pool:
        futs = [
            pool.submit(
                spark.sql, f"CREATE DATABASE IF NOT EXISTS {quote_ident(s)}"
            )
            for s in schemas
        ]
        for f in futs:
            f.result()


def drop_vault(spark: SparkSession, schemas=DEFAULT_SCHEMAS) -> None:
    """Drop all vault databases (test teardown / rebuild-from-scratch)."""
    for s in schemas:
        spark.sql(f"DROP DATABASE IF EXISTS {quote_ident(s)} CASCADE")


def ensure_metadata_tables(spark: SparkSession, metadata_db: str) -> None:
    """Create the three control tables if absent."""
    for name, schema in (
        ("tables", TABLES_SCHEMA),
        ("transitions", TRANSITIONS_SCHEMA),
        ("runinfo", RUNINFO_SCHEMA),
    ):
        fq = f"{metadata_db}.{name}"
        if not spark.catalog.tableExists(fq):
            cols = ", ".join(
                f"{quote_ident(f.name)} {f.dataType.simpleString()}" for f in schema.fields
            )
            spark.sql(f"CREATE TABLE {fq} ({cols}) USING parquet")


def load_metadata_csvs(
    spark: SparkSession,
    metadata_db: str,
    tables_csv: str | None = None,
    transitions_csv: str | None = None,
) -> None:
    """Overwrite the control tables from CSV files (header row expected) —
    the reference's ``read_metadata_from_files`` (``metadata_manager.py:114-167``)."""
    if tables_csv:
        df = (
            spark.read.option("header", True)
            .schema(TABLES_SCHEMA)
            .csv(tables_csv)
        )
        df.write.mode("overwrite").insertInto(f"{metadata_db}.tables", overwrite=True)
    if transitions_csv:
        df = (
            spark.read.option("header", True)
            .schema(TRANSITIONS_SCHEMA)
            .csv(transitions_csv)
        )
        df.write.mode("overwrite").insertInto(
            f"{metadata_db}.transitions", overwrite=True
        )


def create_staging_tables(
    spark: SparkSession,
    stg_db: str,
    table_columns: list[TableColumn],
) -> list[str]:
    """CREATE TABLE IF NOT EXISTS ``stg.{base}`` from metadata rows with
    ``rel_type='stg'``/``mapping='c'`` (reference ``schema_manager.py:57-112``).

    Returns the list of created (or pre-existing) table names.
    """
    stg_rows = [c for c in table_columns if c.rel_type == "stg" and c.mapping == "c"]
    created = []
    for base, cols in group_records(stg_rows, ["base_name"]).items():
        cols = sorted(cols, key=lambda c: c.column_position)
        col_sql = ", ".join(
            f"{quote_ident(c.column_name)} {spark_type_for(c.column_type)}"
            for c in cols
        )
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {stg_db}.{quote_ident(base)} "
            f"({col_sql}) USING parquet"
        )
        created.append(base)
    return created


def apply_script_files(
    spark: SparkSession,
    scripts_path: str,
    table_columns: list[TableColumn],
    verbose: bool = False,
) -> list[tuple[str, str]]:
    """Apply user-authored ``.sql`` view scripts.

    A metadata row ``(base_name=X, rel_type='stg_vw', column_name=SUB,
    mapping='vwdef')`` points at ``{scripts_path}/{SUB}/{X}.sql``
    (reference ``schema_manager.py:114-170``). Scripts must be Spark SQL
    dialect (documented divergence: the reference executes DuckDB SQL).

    Returns (script, error) tuples for failures.
    """
    errors: list[tuple[str, str]] = []
    for c in table_columns:
        if c.rel_type != "stg_vw" or c.mapping != "vwdef":
            continue
        path = os.path.join(scripts_path, c.column_name or "", f"{c.base_name}.sql")
        try:
            with open(path) as fh:
                script = fh.read()
            for stmt in [s.strip() for s in script.split(";") if s.strip()]:
                if verbose:
                    print(stmt)
                spark.sql(stmt)
        except Exception as ex:  # collected, not raised — reference behavior
            errors.append((path, str(ex)))
    return errors
