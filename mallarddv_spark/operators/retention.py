"""Satellite history retention: bound SCD2 history growth.

A 100 TB vault's satellites grow without bound — every source change
appends a version row forever. Most deployments only ever query the
current view plus a bounded lookback, so the maintenance op is: keep the
newest ``keep_versions`` rows per hash key, drop the deep tail.

Semantics guarantees (tested):

* the LATEST version per key always survives (``keep_versions >= 1`` is
  enforced), so every ``*_cv`` current view and PIT probe over retained
  timestamps is unchanged — including keys whose latest row is a
  tombstone (``del_flag = true``): delete state is preserved;
* version order is the satellite's own ordering (``load_dts`` desc,
  ``run_id`` desc tiebreak — the same ordering the current views use).

Mechanism: one window pass (rank per key) and a rewrite through
:func:`mallarddv_spark.sources.layout.rewrite_table` — the same size-gated
strategy as compaction: small tables overwrite in place behind a
checkpoint, big tables go through the crash-safe ``__compact`` rename
swap, so an interrupted prune is healed by the facade's ``recover()``.
On Delta/Iceberg this whole op is a transactional ``DELETE`` via an
anti-join on the retained set.

The reference has no equivalent (its history is unbounded); this is part
of the scale-maintenance surface alongside compaction and Z-ordering.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window, functions as F

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.sources.layout import (
    bucket_spec,
    rewrite_table,
    table_file_stats,
)


def prune_sat_history(
    spark: SparkSession,
    sat_fqn: str,
    keep_versions: int = 1,
    hk_col: str | None = None,
    order_cols: tuple[str, ...] = ("load_dts", "run_id"),
    max_checkpoint_bytes: int = 8 << 30,
) -> dict:
    """Keep the newest ``keep_versions`` rows per ``hk_col`` in a satellite
    (default: the table's first column, the engine's hk-first convention);
    returns ``{"rows_before": n, "rows_after": m}``."""
    if keep_versions < 1:
        raise DVConfigurationError(
            "prune_sat_history: keep_versions must be >= 1 (the latest "
            "version per key must survive or current views change)"
        )
    df = spark.table(sat_fqn)
    hk = hk_col or df.columns[0]
    missing = [c for c in (hk, *order_cols) if c not in df.columns]
    if missing:
        raise DVConfigurationError(
            f"prune_sat_history: {sat_fqn} lacks column(s) {missing}"
        )
    rows_before = df.count()
    w = Window.partitionBy(hk).orderBy(*[F.desc(c) for c in order_cols])
    pruned = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= keep_versions)
        .drop("__rn")
    )
    stats = table_file_stats(spark, sat_fqn)
    rewrite_table(
        spark, sat_fqn, pruned,
        staged=stats["total_bytes"] > max_checkpoint_bytes,
        spec=bucket_spec(spark, sat_fqn),
    )
    return {
        "rows_before": rows_before,
        "rows_after": spark.table(sat_fqn).count(),
    }
