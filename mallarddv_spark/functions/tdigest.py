"""Merging t-digest (Dunning & Ertl 2019) — mergeable ROW-WEIGHTED
quantiles over an UNDECLARED value range, relationally.

Reference scope note: the reference engine has no sketch tier — this
completes the portable-sketch family in
:mod:`mallarddv_spark.functions.sketches`, which leaves exactly one
cell of the quantile matrix open:

* fixed-range histogram — row-weighted quantiles, but the ``[lo, hi)``
  range must be DECLARED up front;
* KMV bottom-k — range-free quantiles, but of the DISTINCT values
  (every value counted once, however often it occurs);
* **t-digest (this module)** — row-weighted AND range-free: the scale
  function concentrates centroid resolution at the tails, so p99.9 of
  an unbounded latency/length/score column is answerable from a
  kilobyte of state.

Unlike the other three sketches the estimate is NOT a single
closed-form SQL expression (the compress pass is an inherently
sequential merge loop), so this member is pytest-evidenced rather than
driver-gate-oracled — the module exists precisely for the cases the
oracle-exact histogram cannot serve (no declarable range). What it
KEEPS from the family contract:

* **content-determinism** — the same multiset of (value, weight) rows
  yields bit-identical centroids regardless of partitioning: stage 1
  is an exact ``groupBy(value)`` (map-side combine, deterministic),
  stage 2 buckets DISTINCT values by hash and compresses each bucket's
  value-sorted array in one fold expression (fixed evaluation order),
  stage 3 re-compresses the union of bucket centroids sorted by
  ``(mean, weight)`` — no sampling, no partition-dependent state
  anywhere (the ADVICE-r9 determinism discipline);
* **plain-parquet state** — ``(mean double, weight double)`` centroid
  rows plus exact ``__min/__max/__delta`` columns; any engine can read
  the state and run the (documented) interpolation;
* **lossless-contract merges** — ``tdigest_merge`` unions centroid
  tables and re-compresses; weights ADD, so appends are NOT idempotent
  (the count-min/histogram contract: fence replays upstream).

Scale shape: stage 1 is one exact groupBy over the data (the only
corpus-touching pass). Stage 2's per-bucket ``collect_list`` holds
``distinct_values / n_buckets`` entries — size ``n_buckets`` so that
stays in task memory (default 256; at 10^9 distinct doubles use 10^4+,
still kilobytes of final state). Stage 3 collapses ``n_buckets × ~2δ``
centroids (metadata-scale) into the final ≤ ~2δ.

The scale function is Dunning's k1, ``k(q) = δ·(asin(2q−1)/π + ½)``:
two adjacent clusters may merge while ``k(q_right) − k(q_left) ≤ 1``,
which bounds centroid weight to ~``2W/δ`` mid-stream and ~``W·(π/δ)²``
at the extreme tails — the tail-accuracy guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mallarddv_spark.exceptions import DVConfigurationError

__all__ = [
    "tdigest_build", "tdigest_merge", "tdigest_quantiles",
    "save_tdigest", "load_tdigest", "tdigest_append", "heal_tdigest",
]


def _check_delta(delta: int) -> None:
    if not 10 <= int(delta) <= 10_000:
        raise DVConfigurationError("tdigest: delta must be in [10, 10000]")


def _compress_expr(pts_col: str, total_col: str, delta: int) -> str:
    """One merging-t-digest pass over a value-sorted array of
    ``struct(v double, w double)``: returns the walk's final state
    struct — close it with :func:`_close_expr`.

    State: ``cs`` = emitted centroids, ``(cm, cw)`` = the open cluster,
    ``wb`` = weight fully emitted before it. The next point joins the
    open cluster iff ``k((wb+cw+x.w)/W) − k(wb/W) ≤ 1``; the mean
    update ``cm += (x.v − cm)·x.w/(cw + x.w)`` is fixed-order, so the
    whole pass is deterministic for a given sorted input."""
    d = float(int(delta))
    # q clamped into [0, 1]: the fold's running weight and the
    # aggregated total are the same doubles summed in different orders,
    # so q can exceed 1 by ulps — asin past 1 is NaN, which would turn
    # the merge condition false nondeterministically
    q_hi = (
        f"least(greatest((st.wb + st.cw + x.w) / {total_col}, 0.0d), 1.0d)"
    )
    q_lo = f"least(greatest(st.wb / {total_col}, 0.0d), 1.0d)"
    k_hi = f"{d} * (asin(2.0d * ({q_hi}) - 1.0d) / pi() + 0.5d)"
    k_lo = f"{d} * (asin(2.0d * ({q_lo}) - 1.0d) / pi() + 0.5d)"
    merge_branch = (
        "struct(st.cs as cs, "
        "st.cm + (x.v - st.cm) * x.w / (st.cw + x.w) as cm, "
        "st.cw + x.w as cw, st.wb as wb)"
    )
    emit_branch = (
        "struct(st.cs || array(struct(st.cm as m, st.cw as w)) as cs, "
        "x.v as cm, x.w as cw, st.wb + st.cw as wb)"
    )
    open_branch = "struct(st.cs as cs, x.v as cm, x.w as cw, st.wb as wb)"
    return (
        f"aggregate({pts_col}, "
        f"struct(cast(array() as array<struct<m: double, w: double>>) as cs, "
        f"cast(0.0 as double) as cm, cast(0.0 as double) as cw, "
        f"cast(0.0 as double) as wb), "
        f"(st, x) -> CASE WHEN st.cw = 0.0d THEN {open_branch} "
        f"WHEN {k_hi} - {k_lo} <= 1.0d THEN {merge_branch} "
        f"ELSE {emit_branch} END)"
    )


# close the walk: append the still-open cluster (a zero-weight open
# cluster means the input array was empty — emit nothing)
_CLOSE = (
    "IF(__st.cw = 0.0d, __st.cs, "
    "__st.cs || array(struct(__st.cm as m, __st.cw as w)))"
)


def _compress(grouped: DataFrame, delta: int) -> DataFrame:
    """Apply the sorted fold compress to a ``(pts, bw)`` grouped frame
    and explode the closed centroid list to ``(v, w)`` rows."""
    return (
        grouped.withColumn(
            "__st", F.expr(_compress_expr("pts", "cast(bw as double)", delta))
        )
        .select(F.explode(F.expr(_CLOSE)).alias("c"))
        .select(F.col("c.m").alias("v"), F.col("c.w").alias("w"))
    )


def tdigest_build(
    df: DataFrame,
    value_col: str,
    weight_col: str | None = None,
    delta: int = 200,
    n_buckets: int = 256,
) -> tuple[DataFrame, dict]:
    """Build a t-digest over a column: returns ``(centroids, params)``
    with ``centroids = (mean double, weight double)`` (≤ ~2δ rows,
    mean-ascending) and ``params = {"delta", "min", "max", "total"}``
    (exact extremes and total weight — mergeable via min/max/sum).
    NULL values are ignored; NULL weights count as 1; non-positive
    weights are rejected rows (filtered, like NULLs).

    Three deterministic stages (see module docstring): exact
    ``groupBy(value)``, per-hash-bucket sorted fold compress, final
    re-compress of the bucket centroids. ``n_buckets`` bounds the
    per-task array at ``distinct_values / n_buckets`` entries — size it
    so that fits task memory."""
    _check_delta(delta)
    if not 1 <= int(n_buckets) <= 1 << 20:
        raise DVConfigurationError("tdigest: n_buckets must be in [1, 2^20]")
    v = F.col(value_col).cast("double")
    w = (
        F.coalesce(F.col(weight_col).cast("double"), F.lit(1.0))
        if weight_col else F.lit(1.0)
    )
    # NaN weights must be rejected explicitly — Spark orders NaN above
    # every number, so `NaN > 0` alone would admit them into the sums
    # materialize the (value, weight) table once: both the stats row
    # below and the stage-2 compress consume it, and without the cut
    # each would re-run the corpus scan + groupBy. The checkpoint is
    # distinct-values-sized — exactly the table stage 2 buckets anyway.
    vw = (
        df.filter(v.isNotNull() & ~F.isnan(v) & ~F.isnan(w) & (w > 0))
        .select(v.alias("v"), w.alias("w"))
        .groupBy("v")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    stats = vw.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"),
        F.sum("w").alias("total"),
    ).first()
    if stats.total is None:
        empty = df.sparkSession.createDataFrame(
            [], "mean double, weight double"
        )
        return empty, {"delta": int(delta), "min": None, "max": None,
                       "total": 0.0}
    # stage 2: per-bucket sorted compress; the bucket's local weight sum
    # is the scale denominator (a valid digest OF THAT SUBSET)
    bucketed = _compress(
        vw.withColumn(
            "b",
            F.pmod(F.xxhash64(F.col("v").cast("string")),
                   F.lit(int(n_buckets))),
        )
        .groupBy("b")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("v"), F.col("w")))
            ).alias("pts"),
            F.sum("w").alias("bw"),
        ),
        delta,
    )
    # stage 3: one final compress of the (metadata-scale) centroid union
    final = _compress(
        bucketed.groupBy().agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("v"), F.col("w")))
            ).alias("pts"),
            F.sum("w").alias("bw"),
        ),
        delta,
    ).select(F.col("v").alias("mean"), F.col("w").alias("weight"))
    params = {"delta": int(delta), "min": float(stats.lo),
              "max": float(stats.hi), "total": float(stats.total)}
    return final, params


def tdigest_merge(
    digests: list[tuple[DataFrame, dict]], delta: int | None = None,
) -> tuple[DataFrame, dict]:
    """Merge digests: union centroid tables, re-compress once, combine
    the exact min/max/total. ``delta`` defaults to the first digest's.
    Weights ADD — merging a digest twice double-counts it (the
    count-min/histogram contract)."""
    if not digests:
        raise DVConfigurationError("tdigest_merge: need at least one digest")
    d = int(delta if delta is not None else digests[0][1]["delta"])
    _check_delta(d)
    live = [(c, p) for c, p in digests if p["total"] > 0]
    if not live:
        return digests[0][0].sparkSession.createDataFrame(
            [], "mean double, weight double"
        ), {"delta": d, "min": None, "max": None, "total": 0.0}
    out = live[0][0]
    for c, _ in live[1:]:
        out = out.unionByName(c)
    total = sum(p["total"] for _, p in live)
    merged = _compress(
        out.select(
            F.col("mean").alias("v"), F.col("weight").alias("w")
        ).groupBy().agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("v"), F.col("w")))
            ).alias("pts"),
            F.sum("w").alias("bw"),
        ),
        d,
    ).select(F.col("v").alias("mean"), F.col("w").alias("weight"))
    params = {
        "delta": d,
        "min": min(p["min"] for _, p in live),
        "max": max(p["max"] for _, p in live),
        "total": float(total),
    }
    return merged, params


def tdigest_quantiles(
    centroids: DataFrame, params: dict, probs: list[float],
) -> DataFrame:
    """Quantile estimates ``(p, est)`` from a digest: each centroid's
    midpoint sits at ``cum_before + weight/2``; the target rank
    ``p·total`` interpolates linearly between adjacent midpoints, with
    the exact stored min/max anchoring the extremes (ranks below the
    first midpoint interpolate min→first mean; above the last,
    last mean→max). The cumulative window runs over ≤ ~2δ rows —
    metadata-scale, the ``hist_quantiles`` precedent."""
    from pyspark.sql import Window

    from mallarddv_spark.functions.litframe import literal_frame

    spark = centroids.sparkSession
    for p in probs:
        if not 0.0 <= float(p) <= 1.0:
            raise DVConfigurationError("tdigest: probs must be in [0, 1]")
    if params["total"] <= 0:
        return spark.createDataFrame([], "p double, est double")
    total, lo, hi = params["total"], params["min"], params["max"]
    w = Window.orderBy("mean", "weight").rowsBetween(
        Window.unboundedPreceding, 0
    )
    mids = centroids.withColumn(
        "mid", F.sum("weight").over(w) - F.col("weight") / 2.0
    ).select("mean", "mid")
    pdf = literal_frame(spark, [(float(p),) for p in probs], "p double")
    r = F.col("p") * F.lit(float(total))
    below = (
        mids.crossJoin(F.broadcast(pdf))
        .filter(F.col("mid") <= r)
        .groupBy("p")
        .agg(F.max(F.struct("mid", "mean")).alias("lo_c"))
    )
    above = (
        mids.crossJoin(F.broadcast(pdf))
        .filter(F.col("mid") > r)
        .groupBy("p")
        .agg(F.min(F.struct("mid", "mean")).alias("hi_c"))
    )
    j = pdf.join(below, "p", "left").join(above, "p", "left")
    lo_mid = F.coalesce(F.col("lo_c.mid"), F.lit(0.0))
    lo_val = F.coalesce(F.col("lo_c.mean"), F.lit(float(lo)))
    hi_mid = F.coalesce(F.col("hi_c.mid"), F.lit(float(total)))
    hi_val = F.coalesce(F.col("hi_c.mean"), F.lit(float(hi)))
    frac = F.when(
        hi_mid > lo_mid, (r - lo_mid) / (hi_mid - lo_mid)
    ).otherwise(F.lit(0.0))
    est = lo_val + (hi_val - lo_val) * frac
    return j.select(
        "p",
        F.least(
            F.greatest(est, F.lit(float(lo))), F.lit(float(hi))
        ).alias("est"),
    )


# --- persistence (staged-rename, same contract as the sketch family) --------


def heal_tdigest(spark: SparkSession, path: str) -> str | None:
    """Resolve a torn :func:`tdigest_append` swap (the HLL/CM drain)."""
    from mallarddv_spark.functions.sketches import heal_hll

    return heal_hll(spark, path)


def save_tdigest(
    centroids: DataFrame, params: dict, path: str,
) -> None:
    """Persist a digest plus its exact stats (staged-rename when a live
    copy exists)."""
    spark = centroids.sparkSession
    heal_tdigest(spark, path)
    from mallarddv_spark.sources import layout

    out = (
        centroids.withColumn("__delta", F.lit(int(params["delta"])))
        .withColumn("__min", F.lit(params["min"]).cast("double"))
        .withColumn("__max", F.lit(params["max"]).cast("double"))
        .withColumn("__total", F.lit(float(params["total"])))
    )
    fs, live = layout.dir_fs(spark, path)
    if not fs.exists(live):
        out.coalesce(1).write.mode("overwrite").parquet(path)
        return
    out.coalesce(1).write.mode("overwrite").parquet(path + "__compact")
    layout.swap_dir_live(spark, path)


def load_tdigest(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Load a stored digest and its params; heals on open."""
    heal_tdigest(spark, path)
    df = spark.read.parquet(path)
    row = df.select("__delta", "__min", "__max", "__total").first()
    params = {
        "delta": int(row["__delta"]),
        "min": None if row["__min"] is None else float(row["__min"]),
        "max": None if row["__max"] is None else float(row["__max"]),
        "total": float(row["__total"]),
    }
    return df.drop("__delta", "__min", "__max", "__total"), params


def tdigest_append(
    new_values: DataFrame, path: str, value_col: str,
    weight_col: str | None = None, n_buckets: int = 256,
) -> None:
    """Fold a batch into a STORED digest (build + merge + staged
    rewrite). Weights ADD, so appends are NOT idempotent — fence
    replays upstream (the count-min/histogram contract)."""
    spark = new_values.sparkSession
    stored = load_tdigest(spark, path)
    batch = tdigest_build(
        new_values, value_col, weight_col=weight_col,
        delta=stored[1]["delta"], n_buckets=n_buckets,
    )
    merged, params = tdigest_merge([stored, batch])
    save_tdigest(merged, params, path)
