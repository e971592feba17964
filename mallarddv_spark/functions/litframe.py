"""JVM-literal construction of small local DataFrames.

``spark.createDataFrame(rows)`` builds a *pickled Python RDD* under the
hood: every subsequent action on the frame (and anything joined to or
written from it) schedules Python worker processes just to deserialize a
handful of rows — measured ~0.3 s for one partition and 2–5 s when the
frame inherits ``defaultParallelism`` (32) partitions on this host. For
control-plane rows (index params, codebooks, centroid tables, ledger
rows) that cost dwarfs the actual work.

:func:`literal_frame` builds the same rows as pure Catalyst literals on
top of ``spark.range(1)`` — the optimizer constant-folds it to a
``LocalRelation``: no RDD, no Python workers, whole plan JVM-side.
Intended for SMALL frames (tens of rows × reasonable width); every value
becomes an expression-tree node, so a million-element frame belongs in
``createDataFrame``/parquet, not here.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def _lit(v) -> Column:
    """One value → one literal Column (recursing into lists)."""
    if isinstance(v, (list, tuple)):
        return F.array(*[_lit(x) for x in v])
    if isinstance(v, bool):  # before int: bool is an int subclass
        return F.lit(v)
    if isinstance(v, int):
        # plain ints surface as IntegerType when they fit; schema casts
        # (below) pick the final width
        return F.lit(v)
    if isinstance(v, float):
        return F.lit(float(v))
    if isinstance(v, datetime.datetime):
        return F.lit(v)
    if v is None:
        return F.lit(None)
    return F.lit(v)


def literal_frame(spark: SparkSession, rows: list[tuple], schema) -> DataFrame:
    """Build a small DataFrame from Python rows as Catalyst literals.

    ``schema`` is a DDL string (``"a int, b array<double>"``) or a
    ``StructType`` — the same shapes ``createDataFrame`` accepts — and
    every column is cast to its declared type, so the result's schema is
    identical to the ``createDataFrame`` equivalent (including NULL
    typing). List/tuple values become arrays; struct-typed columns are
    not supported (use ``createDataFrame`` for those).
    """
    from pyspark.sql.types import StructType

    fields = (
        schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
    )
    names = [f.name for f in fields]
    types = [f.dataType.simpleString() for f in fields]
    if not rows:
        return spark.createDataFrame([], schema)
    parts = []
    for row in rows:
        if len(row) != len(names):
            raise ValueError(
                f"row width {len(row)} != schema width {len(names)}"
            )
        parts.append(
            # one partition: the default range() would carve 1 row into
            # defaultParallelism empty tasks. The when(id == 0, ...)
            # wrapper is always-true but NOT analysis-time foldable, so
            # it relaxes the literal's non-nullable marker to the
            # nullable fields createDataFrame produces — downstream
            # schema equality (driver gate, unions) depends on it
            spark.range(0, 1, numPartitions=1).select(
                *[
                    F.when(F.col("id") == 0, _lit(v).cast(t)).alias(n)
                    for v, n, t in zip(row, names, types)
                ]
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
