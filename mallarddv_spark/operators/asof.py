"""As-of joins and point-in-time (PIT) tables.

The reference has no temporal join operators (SURVEY §2.8); these are the
standard Data Vault / time-series companions, implemented with the
union-tag-window technique rather than a range join:

    tag left rows (is_left=1) and right rows (is_left=0), union, then
    last_value of the right payload over a window ordered by
    (ts, is_left) per key — each left row sees the latest right row at or
    before its timestamp.

Why this shape at 100 TB: a naive as-of as an inequality join explodes to
O(|L|·|R|) pairs per key before aggregation; the union-window form is one
shuffle on the key and a linear scan per partition — and the window key is
the join key, so Data Vault hash keys make it skew-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.right_ts <= left.left_ts`` and the same key ``on``
    (backward as-of join; unmatched left rows keep NULL payload).

    Returns all left columns plus right payload columns (suffixed on
    collision) and ``{right_ts}{suffix}`` — the matched right timestamp.
    """
    if right_payload is None:
        right_payload = [
            c for c in right.columns if c not in (on, right_ts)
        ]
    payload_out = [
        (c, c + suffix if c in left.columns else c) for c in right_payload
    ]
    ts_out = right_ts + suffix if right_ts in left.columns else right_ts

    lt = left.withColumn("__is_left", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = right.withColumn("__is_left", F.lit(0)).withColumn("__ts", F.col(right_ts))

    l_cols = [c for c in left.columns]
    tagged = lt.select(
        F.col(on).alias("__k"),
        "__ts",
        "__is_left",
        F.struct(*l_cols).alias("__l"),
        F.lit(None).cast(
            rt.select(F.struct(*[F.col(c) for c in right_payload + [right_ts]]).alias("s"))
            .schema["s"].dataType
        ).alias("__r"),
    ).unionByName(
        rt.select(
            F.col(on).alias("__k"),
            "__ts",
            "__is_left",
            F.lit(None).cast(
                lt.select(F.struct(*l_cols).alias("s")).schema["s"].dataType
            ).alias("__l"),
            F.struct(*[F.col(c) for c in right_payload + [right_ts]]).alias("__r"),
        )
    )

    # right rows sort before left rows at equal ts (is_left asc) so a left row
    # at t sees a right row at exactly t
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = tagged.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    out = matched.filter("__is_left = 1").select(
        *[F.col(f"__l.{c}").alias(c) for c in l_cols],
        *[F.col(f"__last_r.{src}").alias(dst) for src, dst in payload_out],
        F.col(f"__last_r.{right_ts}").alias(ts_out),
    )
    return out


def pit_table(
    sats: dict[str, DataFrame],
    hk_col: str,
    snapshots: DataFrame,
    snapshot_col: str = "snapshot_ts",
) -> DataFrame:
    """Point-in-time table: for each (hub key, snapshot date), the load_dts
    of the latest version of each satellite at or before the snapshot.

    ``sats`` maps satellite name → its history DataFrame (must contain
    ``hk_col`` and ``load_dts``). Output: (hk, snapshot_ts,
    {sat}_load_dts ...) — the classic DV query accelerator: equi-joining
    sats on (hk, load_dts) afterwards avoids repeating window scans in
    every mart query.
    """
    keys = None
    for sat_df in sats.values():
        k = sat_df.select(F.col(hk_col)).distinct()
        keys = k if keys is None else keys.unionByName(k).distinct()
    pit = keys.crossJoin(F.broadcast(snapshots.select(snapshot_col)))
    for name, sat_df in sats.items():
        versions = sat_df.select(
            F.col(hk_col), F.col("load_dts").alias("__v_ts")
        )
        matched = asof_join(
            pit,
            versions,
            on=hk_col,
            left_ts=snapshot_col,
            right_ts="__v_ts",
            right_payload=[],
        )
        pit = matched.withColumnRenamed("__v_ts", f"{name}_load_dts")
    return pit
