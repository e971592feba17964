"""Skew mitigation utilities.

Data Vault keys are cryptographic hashes — uniform, never skewed — so the
core load protocol needs none of this. These utilities are for the *source*
side of pipelines (raw event streams, web corpora) where natural keys are
Zipfian: a handful of users/domains own most rows.

First line of defense is AQE (``spark.sql.adaptive.skewJoin`` splits skewed
partitions at runtime — enabled by the session factory). Salting is the
explicit fallback for the two cases AQE doesn't cover: skewed *aggregations*
with expensive per-group state, and skewed shuffle joins where one side can
be replicated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from mallarddv_spark.exceptions import DVConfigurationError


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    Phase 1 groups by (key, salt) — hot keys split across ``salt``
    partitions; phase 2 re-aggregates the partials by key. ``aggs`` maps
    output name → *partial* aggregate Column; the reduce phase applies a
    matching merge (sum for counts/sums, min/max for min/max).

    Only algebraic aggregates (sum/count/min/max) are mergeable this way —
    exactly the ones whose partials Spark itself merges map-side.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        *[c.alias(f"__p_{name}") for name, c in aggs.items()]
    )
    merges = []
    for name, col in aggs.items():
        fn = col._jc.toString().split("(")[0].lower()
        partial = F.col(f"__p_{name}")
        if fn.startswith("min"):
            merges.append(F.min(partial).alias(name))
        elif fn.startswith("max"):
            merges.append(F.max(partial).alias(name))
        else:  # sum, count → sum of partials
            merges.append(F.sum(partial).alias(name))
    return phase1.groupBy(*key_cols).agg(*merges)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with the skewed side salted and the small side
    replicated ``salt`` times, so one hot key spreads over ``salt``
    partitions instead of melting a single reducer.

    Use when the small side is too big to broadcast but small enough to
    replicate (|small| × salt rows shuffle). For broadcast-able dims just
    use ``F.broadcast`` — this is the middle regime.

    Only ``inner`` and ``left`` joins are supported: under right/full outer
    joins the salt replication would emit one null-extended row *per salt
    replica* for every unmatched small-side row (salt-fold duplicates).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise DVConfigurationError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "right/full outer would duplicate unmatched small-side rows "
            "once per salt replica"
        )
    s = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = s.join(replicated, on=[on, "__salt"], how=how)
    return out.drop("__salt")
