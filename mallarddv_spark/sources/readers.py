"""File → staging ingestion with an *imposed* (metadata-declared) schema.

The reference dispatches on file extension to DuckDB's ``read_{ext}`` with an
explicit name→type map (``etl/etl_service.py:58-102``) and truncate-reloads
the staging table. Here: ``spark.read.format(ext).schema(...)`` and an
atomic ``INSERT OVERWRITE`` of the staging table.

Schema imposition (not inference) matters at scale: a schema-inferring scan
reads the data twice and can flip types between loads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from mallarddv_spark.functions.hashing import quote_ident
from mallarddv_spark.plans.model import TableColumn
from mallarddv_spark.plans.types import spark_type_for
from mallarddv_spark.exceptions import DVConfigurationError, DVMetadataError


def staging_schema(table_columns: list[TableColumn], base_name: str) -> StructType:
    """The imposed schema for a staging table: metadata rows with
    ``rel_type='stg'``/``mapping='c'`` ordered by column_position."""
    cols = sorted(
        (
            c
            for c in table_columns
            if c.base_name == base_name and c.rel_type == "stg" and c.mapping == "c"
        ),
        key=lambda c: c.column_position,
    )
    if not cols:
        raise DVMetadataError(f"no staging columns defined for '{base_name}'")
    ddl = ", ".join(
        f"{quote_ident(c.column_name)} {spark_type_for(c.column_type)}" for c in cols
    )
    return StructType.fromDDL(ddl)


def read_file(
    spark: SparkSession,
    file_path: str,
    schema: StructType,
    file_type: str | None = None,
) -> DataFrame:
    """Extension-dispatched read with imposed schema
    (csv/tsv/parquet/orc/json)."""
    ftype = (file_type or file_path.rsplit(".", 1)[-1]).lower()
    if ftype in ("csv", "tsv"):
        return (
            spark.read.schema(schema)
            .option("header", True)
            .option("sep", "\t" if ftype == "tsv" else ",")
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
            .csv(file_path)
        )
    if ftype in ("parquet", "orc"):
        # both carry their own schema; project+cast to the imposed one
        df = (
            spark.read.parquet(file_path)
            if ftype == "parquet"
            else spark.read.orc(file_path)
        )
        return df.selectExpr(
            *[
                f"cast({quote_ident(f.name)} as {f.dataType.simpleString()}) as {quote_ident(f.name)}"
                for f in schema.fields
            ]
        )
    if ftype in ("json", "jsonl", "ndjson"):
        return spark.read.schema(schema).json(file_path)
    raise DVConfigurationError(f"unsupported file type: {ftype}")


def load_file_to_staging(
    spark: SparkSession,
    stg_db: str,
    source_table: str,
    file_path: str,
    table_columns: list[TableColumn],
    file_type: str | None = None,
) -> None:
    """Truncate-and-reload ``stg.{source_table}`` from a file.

    On a plain parquet catalog the overwrite is job-atomic (a failed write
    job commits nothing) but not crash-proof across the commit itself.
    Staging is ephemeral by contract — it is rebuilt from the source file
    on every flow — so a torn staging table self-heals on flow re-run: the
    file never reached a 'success' ledger row, the idempotence probe lets
    the flow through, and this overwrite rewrites the table
    (proven end-to-end by ``tests/test_crash_recovery.py``). Delta/Iceberg
    make the overwrite itself transactional on a lake deployment."""
    schema = staging_schema(table_columns, source_table)
    df = read_file(spark, file_path, schema, file_type)
    # Under-parallel inputs (one gzip file, a parquet with few row groups)
    # would otherwise pin every downstream hub/link/sat consumer to a
    # handful of scan tasks — the staging table inherits the source file's
    # partitioning. Spread the write across the cluster ONLY when
    # (a) the source arrives with well under half the cluster's cores in
    #     splits (a near-parallel input does not pay a full shuffle for a
    #     marginal gain; a lake batch with thousands of splits skips it
    #     outright), and
    # (b) the input is big enough to matter (>= 8 MB): a tiny dimension
    #     load (a 25-row table) would otherwise fragment into one
    #     near-empty file per core that every downstream scan pays to
    #     open, for zero parallelism gain.
    # Measured at sf0.1: dv_flow_lineitem 6.4 -> 5.9 s min-of-5 interleaved
    # (round 14; the 2x/8MB guards change nothing for that path).
    # Split count via the JVM RDD — df.rdd would build the Python-pickle
    # conversion pipeline just to read a partition count. Size from the
    # optimized plan's file-source statistics (sum of file lengths): one
    # py4j call, no job.
    n_in = df._jdf.rdd().getNumPartitions()
    par = spark.sparkContext.defaultParallelism
    if n_in * 2 <= par:
        size = int(df._jdf.queryExecution().optimizedPlan().stats()
                   .sizeInBytes())
        if size >= 8 * 1024 * 1024:
            df = df.repartition(par)
    df.write.mode("overwrite").insertInto(
        f"{stg_db}.{quote_ident(source_table)}", overwrite=True
    )
