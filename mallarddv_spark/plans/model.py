"""Typed plan model parsed from the metadata control tables.

The reference plans loads by running ``itertools.groupby`` over stringly
dict rows (``hash_generator.py:48-67``); we parse the same two control tables
into dataclasses once per flow and build DataFrame pipelines from them.
Metadata is tiny (KBs) — collecting it to the driver is plan construction,
not a data path.

Control-table schemas (the public contract, mirrored from
``db/sql_templates.py:11-48``):

- ``metadata.tables``      (base_name, rel_type, column_name, column_type,
                            column_position, mapping)
- ``metadata.transitions`` (source_table, source_field, target_table,
                            target_field, group_name, position, raw,
                            transformation, transfer_type)
- ``metadata.runinfo``     (source_table, run_id, log_date, source_file,
                            status, message)

``rel_type`` ∈ {stg, stg_vw, hub, link, nhl, hsat, lsat};
``mapping`` ∈ {c, bk, hk, f, ll, dk, vwdef};
``transfer_type`` ∈ {bk, ll, dk, f, sat_delta, sat_full}.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TABLES_SCHEMA = StructType(
    [
        StructField("base_name", StringType()),
        StructField("rel_type", StringType()),
        StructField("column_name", StringType()),
        StructField("column_type", StringType()),
        StructField("column_position", IntegerType()),
        StructField("mapping", StringType()),
    ]
)

TRANSITIONS_SCHEMA = StructType(
    [
        StructField("source_table", StringType()),
        StructField("source_field", StringType()),
        StructField("target_table", StringType()),
        StructField("target_field", StringType()),
        StructField("group_name", StringType()),
        StructField("position", IntegerType()),
        StructField("raw", BooleanType()),
        StructField("transformation", StringType()),
        StructField("transfer_type", StringType()),
    ]
)

RUNINFO_SCHEMA = StructType(
    [
        StructField("source_table", StringType()),
        StructField("run_id", IntegerType()),
        StructField("log_date", TimestampType()),
        StructField("source_file", StringType()),
        StructField("status", StringType()),
        StructField("message", StringType()),
    ]
)


@dataclass(frozen=True)
class TableColumn:
    """One row of ``metadata.tables``."""

    base_name: str
    rel_type: str
    column_name: str
    column_type: str | None
    column_position: int
    mapping: str


@dataclass(frozen=True)
class TransitionRecord:
    """One row of ``metadata.transitions``."""

    source_table: str
    source_field: str
    target_table: str
    target_field: str
    group_name: str
    position: int
    raw: bool
    transformation: str | None
    transfer_type: str


def fetch_table_columns(
    spark: SparkSession,
    metadata_db: str,
    base_name: str | None = None,
    rel_type: str | None = None,
) -> list[TableColumn]:
    """Read ``metadata.tables`` (ordered by rel_type, base_name, mapping,
    column_position — matching the reference's GET_TABLES ordering)."""
    df = spark.table(f"{metadata_db}.tables")
    if base_name is not None:
        df = df.filter(df.base_name == base_name)
    if rel_type is not None:
        df = df.filter(df.rel_type == rel_type)
    rows = df.orderBy("rel_type", "base_name", "mapping", "column_position").collect()
    return [
        TableColumn(
            base_name=r.base_name,
            rel_type=r.rel_type,
            column_name=r.column_name,
            column_type=r.column_type,
            column_position=r.column_position,
            mapping=r.mapping,
        )
        for r in rows
    ]


def fetch_transitions(
    spark: SparkSession, metadata_db: str, source_table: str
) -> list[TransitionRecord]:
    """Read ``metadata.transitions`` for one staging table, ordered by
    (target_table, group_name, position) — the order that fixes hash-input
    field sequence (reference GET_TRANSITIONS, ``db/sql_templates.py:50-57``)."""
    from pyspark.sql import functions as F

    df = spark.table(f"{metadata_db}.transitions").filter(
        F.col("source_table") == source_table
    )
    rows = df.orderBy("source_table", "target_table", "group_name", "position").collect()
    return [
        TransitionRecord(
            source_table=r.source_table,
            source_field=r.source_field,
            target_table=r.target_table,
            target_field=r.target_field,
            group_name=r.group_name,
            position=r.position,
            raw=bool(r.raw),
            transformation=r.transformation,
            transfer_type=r.transfer_type,
        )
        for r in rows
    ]


def group_records(records: Iterable, keys: list[str]) -> dict[str, list]:
    """Group already-sorted records by dotted key values — same contract as
    the reference's ``HashViewGenerator.groupby`` but order-preserving and
    not dependent on adjacent sorting quirks."""
    out: dict[str, list] = {}
    for r in records:
        k = ".".join(str(getattr(r, key)) for key in keys)
        out.setdefault(k, []).append(r)
    return out
