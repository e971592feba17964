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
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row, attach one right row with the same key ``on``
    (the pandas ``merge_asof`` surface; unmatched left rows keep NULL
    payload):

    * ``direction="backward"`` (default) — the LATEST right row with
      ``right_ts <= left_ts`` (the original attribution shape);
    * ``"forward"`` — the EARLIEST right row with
      ``right_ts >= left_ts`` (next-event attribution: "first purchase
      AFTER the campaign email");
    * ``"nearest"`` — whichever of the two is closer in time, ties
      preferring backward (deterministic).

    ``tolerance`` bounds the match distance: a matched row further than
    ``tolerance`` is discarded (NULL payload). Seconds for timestamp
    columns, same-unit for numeric ones. Correctness note: the
    backward match is the single latest candidate, so if IT fails the
    tolerance no earlier candidate can pass (symmetric for forward) —
    post-filtering is exact, not an approximation.

    Returns all left columns plus right payload columns (suffixed on
    collision) and ``{right_ts}{suffix}`` — the matched right timestamp.

    Scale shape unchanged from the original: union-tag-window per key —
    one shuffle, no join; ``nearest`` runs the window twice (both
    directions) and combines with a projection.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "asof_join: direction must be backward | forward | nearest"
        )
    if direction == "nearest":
        back = asof_join(left, right, on, left_ts, right_ts,
                         right_payload, suffix + "__b", "backward",
                         tolerance)
        fwd = asof_join(left, right, on, left_ts, right_ts,
                        right_payload, suffix + "__f", "forward",
                        tolerance)
        if right_payload is None:
            right_payload = [
                c for c in right.columns if c not in (on, right_ts)
            ]
        if right_ts in left.columns:
            ts_b, ts_f = right_ts + suffix + "__b", right_ts + suffix + "__f"
        else:
            ts_b = ts_f = right_ts
        ts_out = right_ts + suffix if right_ts in left.columns else right_ts
        # re-join the two passes on the full left row; duplicate left
        # rows pair arbitrarily but receive IDENTICAL matches from each
        # directional pass (same key, same ts), so any pairing is right
        lcols = list(left.columns)
        from pyspark.sql import Window as _W
        w = _W.partitionBy(*lcols).orderBy(F.lit(1))
        b = back.withColumn("__rn", F.row_number().over(w))
        f = fwd.withColumn("__rn", F.row_number().over(w))
        joined = b.join(
            f.select(
                *lcols, "__rn",
                *[F.col(c + suffix + "__f" if c + suffix + "__f" in f.columns
                        else c).alias("__f_" + c) for c in right_payload],
                F.col(ts_f).alias("__f_ts"),
            ),
            lcols + ["__rn"],
        )
        d_b = _abs_delta(joined, left_ts, ts_b)
        d_f = _abs_delta(joined, left_ts, "__f_ts")
        use_b = F.col(ts_b).isNotNull() & (
            F.col("__f_ts").isNull() | (d_b <= d_f)
        )
        sel = [F.col(c) for c in lcols]
        for c in right_payload:
            bcol = c + suffix + "__b" if c + suffix + "__b" in joined.columns else c
            out_name = c + suffix if c in left.columns else c
            sel.append(
                F.when(use_b, F.col(bcol))
                .otherwise(F.col("__f_" + c)).alias(out_name)
            )
        sel.append(
            F.when(use_b, F.col(ts_b)).otherwise(F.col("__f_ts")).alias(ts_out)
        )
        return joined.select(*sel)
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
    # at t sees a right row at exactly t; forward = the same scan over
    # ts DESC (the earliest >= t is the last one seen walking backward)
    ts_order = (
        F.col("__ts").asc() if direction == "backward"
        else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = tagged.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    out = matched.filter("__is_left = 1").select(
        *[F.col(f"__l.{c}").alias(c) for c in l_cols],
        *[F.col(f"__last_r.{src}").alias(dst) for src, dst in payload_out],
        F.col(f"__last_r.{right_ts}").alias(ts_out),
    )
    if tolerance is not None:
        within = _abs_delta(out, left_ts, ts_out) <= float(tolerance)
        out = out.select(
            *l_cols,
            *[
                F.when(within, F.col(dst)).alias(dst)
                for _, dst in payload_out
            ],
            F.when(within, F.col(ts_out)).alias(ts_out),
        )
    return out


def _abs_delta(df: DataFrame, a: str, b: str):
    """|a − b| as double — seconds for timestamp columns (via
    ``timestampdiff``, the NTZ-safe arithmetic), plain difference for
    numeric ones."""
    t = dict(df.dtypes)[a]
    if t.startswith("timestamp"):
        return F.abs(
            F.expr(f"timestampdiff(MICROSECOND, `{b}`, `{a}`)").cast("double")
        ) / F.lit(1e6)
    return F.abs(F.col(a).cast("double") - F.col(b).cast("double"))


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
    # ONE distinct over the union of every sat's keys: the same key set
    # as per-sat distincts + pairwise union-distincts, for one aggregation
    # over the unioned stream (map-side partial aggregation dedups within
    # each sat's partitions first) instead of 2N-1 of them (guide §2.4)
    keys = None
    for sat_df in sats.values():
        k = sat_df.select(F.col(hk_col))
        keys = k if keys is None else keys.unionByName(k)
    keys = keys.distinct()
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
