"""Mergeable distinct-count sketches (Apache DataSketches HLL, exposed by
Spark ≥3.5 as ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``).

The lake-scale pattern these enable: compute ONE sketch per (stratum,
ingestion window) as data lands — a few KB of binary per group — then
answer any coarser distinct-count question (monthly uniques, all-time
uniques, uniques per region) by UNIONING stored sketches, never
rescanning the 100 TB history. ``approx_count_distinct`` alone can't do
this: its HLL++ buffer is not exposed, so every new rollup is a full
rescan.

All three steps are JVM aggregate expressions — no Python, one shuffle
per groupBy, sketches merge associatively so partial aggregation
(map-side combine) applies.

Sibling module: :mod:`mallarddv_spark.functions.sketches` implements a
register-table HLL whose state is plain parquet and whose estimate
replays bit-for-bit in the DuckDB oracle — choose it when sketches must
cross engines or be value-verified; choose THIS module for raw speed
and theta set algebra inside Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def build_distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per ``group_cols``
    group: ``(*group_cols, sketch binary, n_rows)``. ``lg_k`` trades size
    for accuracy (12 → ~2.5 KB, ~1.6% relative standard error). Store the
    result partitioned by the grouping — e.g. per ingestion day — and
    roll up later with :func:`merge_distinct_sketches`."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(int(lg_k))).alias(sketch_col),
        F.count("*").alias("n_rows"),
    )


def merge_distinct_sketches(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Union stored sketches to a coarser grouping (empty ``group_cols`` =
    one global sketch). Returns ``(*group_cols, sketch, n_rows,
    distinct_estimate)`` — the union is exact over the sketch state, so
    rolling daily sketches into a month carries the same error bound as
    sketching the month directly."""
    gb = sketches.groupBy(*(group_cols or []))
    out = gb.agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col),
        F.sum("n_rows").alias("n_rows"),
    )
    return out.withColumn(
        "distinct_estimate", F.hll_sketch_estimate(F.col(sketch_col))
    )


def estimate_distinct(
    sketches: DataFrame, sketch_col: str = "distinct_sketch"
) -> DataFrame:
    """Attach the point estimate to each stored sketch row."""
    return sketches.withColumn(
        "distinct_estimate", F.hll_sketch_estimate(F.col(sketch_col))
    )


# ---------------------------------------------------------------------------
# Theta sketches — distinct counting WITH set algebra (union, intersection,
# difference). The question HLL cannot answer: "how many users did BOTH X
# and Y" across stored per-segment sketches, no rescan.
# ---------------------------------------------------------------------------


def build_theta_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    sketch_col: str = "theta_sketch",
) -> DataFrame:
    """One theta sketch of ``value_col``'s distinct values per group:
    ``(*group_cols, sketch binary, n_rows)``. Same storage pattern as
    :func:`build_distinct_sketches`, but the stored state also supports
    ``theta_intersection`` / ``theta_difference``."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(F.col(value_col)).alias(sketch_col),
        F.count("*").alias("n_rows"),
    )


def merge_theta_sketches(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "theta_sketch",
) -> DataFrame:
    """Union stored theta sketches to a coarser grouping, with the point
    estimate attached."""
    out = sketches.groupBy(*(group_cols or [])).agg(
        F.theta_union_agg(F.col(sketch_col)).alias(sketch_col),
        F.sum("n_rows").alias("n_rows"),
    )
    return out.withColumn(
        "distinct_estimate", F.theta_sketch_estimate(F.col(sketch_col))
    )


def theta_overlap(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    sketch_col: str = "theta_sketch",
) -> DataFrame:
    """Per-key audience algebra over two stored sketch tables: full-outer
    joins on ``on`` and returns distinct estimates for left, right, their
    intersection (both), and their difference (left only) — e.g. "users
    active in BOTH January and February, per region", answered from a few
    KB per key instead of two corpus scans plus a join. Keys present in
    only one side surface with the other side's count at 0 (total churn
    is the highest-signal row, not one to drop)."""
    l = left.select(*on, F.col(sketch_col).alias("__l"))
    r = right.select(*on, F.col(sketch_col).alias("__r"))
    j = l.join(r, on, "full_outer")
    est_l = F.when(
        F.col("__l").isNotNull(), F.theta_sketch_estimate(F.col("__l"))
    ).otherwise(F.lit(0))
    est_r = F.when(
        F.col("__r").isNotNull(), F.theta_sketch_estimate(F.col("__r"))
    ).otherwise(F.lit(0))
    both = F.when(
        F.col("__l").isNotNull() & F.col("__r").isNotNull(),
        F.expr("theta_sketch_estimate(theta_intersection(__l, __r))"),
    ).otherwise(F.lit(0))
    left_only = F.when(
        F.col("__l").isNotNull() & F.col("__r").isNotNull(),
        F.expr("theta_sketch_estimate(theta_difference(__l, __r))"),
    ).otherwise(est_l)
    return j.select(
        *on,
        est_l.alias("left_distinct"),
        est_r.alias("right_distinct"),
        both.alias("both_distinct"),
        left_only.alias("left_only_distinct"),
    )


def approx_heavy_hitters(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 10,
) -> DataFrame:
    """Top-k most frequent values per group via Spark's frequent-items
    sketch (``approx_top_k``), exploded to ``(*group_cols, item,
    approx_count, rnk)`` rows. The sketch is a bounded-memory aggregate —
    the exact top-k needs a full groupBy on the value (every distinct
    value shuffles); this shuffles only the sketch state per group."""
    agg = df.groupBy(*group_cols).agg(
        F.expr(f"approx_top_k({value_col}, {int(k)})").alias("__tk")
    )
    return agg.select(
        *group_cols, F.posexplode("__tk").alias("__pos", "__e")
    ).select(
        *group_cols,
        F.col("__e.item").alias("item"),
        F.col("__e.count").alias("approx_count"),
        (F.col("__pos") + 1).alias("rnk"),
    )
