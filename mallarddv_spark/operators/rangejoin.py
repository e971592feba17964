"""Bin-bucketed range joins: point-in-interval and interval-overlap
joins WITHOUT an equi key, executed as equi-joins on bin ids.

Spark executes a pure range predicate (``a.start <= b.p AND b.p <=
a.end``) as BroadcastNestedLoopJoin — O(|A|·|B|) row comparisons, a
non-starter at corpus scale. The standard fix (the technique behind
engine-native range-join optimizations) is binning: quantize the domain
into fixed-width bins, explode each interval to the bins it covers,
and equi-join on the bin id — each candidate pair is then verified with
the exact predicate. The shuffle moves (bin, row) pairs, so cost is
linear in rows × bins-per-interval with a plain hash/sort-merge join.

Duplicate suppression is arithmetic, not a ``distinct``: a pair that
shares several bins is emitted only in the FIRST bin both sides cover
(``bin == greatest(floor(a_start/w), floor(b_start/w))``), so no
post-join dedup shuffle is needed.

Choosing ``bin_width``: ~the typical interval length. Too small →
intervals explode into many bins (bounded by ``max_bins``, enforced
with a plan-side ``raise_error`` rather than a silent blow-up); too
large → many false candidates per bin. An optional ``extra_key`` column
joins alongside the bin when the data has one.

Domains are numeric; timestamp callers pass e.g.
``unix_micros(ts)``-derived columns (the suite's gate does exactly
this). Both ops return inner-join semantics — compose with an anti-join
for the unmatched side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mallarddv_spark.exceptions import DVConfigurationError


def _bin(col, width) -> Column:
    return F.floor(F.col(col) / F.lit(width)).cast("long")


def _checked_bins(start_col: str, end_col: str, width, max_bins: int) -> Column:
    """Bin ids an interval covers; malformed (end < start) intervals
    yield an empty list (no matches) and oversized ones fail fast inside
    the evaluated expression, where the optimizer cannot prune the
    guard away. The size check is ARITHMETIC (last bin − first bin) and
    runs before ``sequence`` is built — measuring ``size(sequence(...))``
    would materialize the very array the guard exists to prevent."""
    span = _bin(end_col, width) - _bin(start_col, width)
    return F.when(
        F.col(end_col) < F.col(start_col),
        F.expr("cast(array() as array<bigint>)"),
    ).otherwise(
        F.when(
            span < max_bins,
            F.sequence(_bin(start_col, width), _bin(end_col, width)),
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"interval spans {max_bins} or more bins — raise "
                    f"bin_width"
                )
            )
        )
    )


def _check_width(bin_width) -> float:
    w = float(bin_width)
    if not w > 0:
        raise DVConfigurationError(f"bin_width must be > 0, got {bin_width}")
    return w


def _check_disjoint(a: DataFrame, b: DataFrame, extra_key: str | None) -> None:
    clash = (set(a.columns) & set(b.columns)) - {extra_key}
    if clash:
        raise DVConfigurationError(
            f"both sides carry columns {sorted(clash)} — rename one side; "
            f"ambiguous names would silently mis-resolve the range predicate"
        )
    reserved = {"__bin", "__bins"} & (set(a.columns) | set(b.columns))
    if reserved:
        raise DVConfigurationError(
            f"columns {sorted(reserved)} collide with this operator's "
            f"internal names — rename them"
        )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width,
    extra_key: str | None = None,
    max_bins: int = 10_000,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_col <= end_col`` (endpoints inclusive) — e.g.
    event-to-session assignment, IP-to-range lookup, reading-to-
    calibration-window matching.

    A point occupies exactly one bin and an interval covers that bin at
    most once, so each match surfaces exactly once — no dedup pass."""
    w = _check_width(bin_width)
    _check_disjoint(points, intervals, extra_key)
    p = points.withColumn("__bin", _bin(point_col, w))
    ivx = intervals.withColumn(
        "__bins", _checked_bins(start_col, end_col, w, max_bins)
    ).select(*intervals.columns, F.explode("__bins").alias("__bin"))
    keys = ["__bin"] + ([extra_key] if extra_key else [])
    exact = (F.col(start_col) <= F.col(point_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    return p.join(ivx, keys).filter(exact).drop("__bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width,
    extra_key: str | None = None,
    max_bins: int = 10_000,
) -> DataFrame:
    """All (left, right) pairs whose intervals overlap:
    ``left_start <= right_end AND right_start <= left_end`` (closed
    intervals) — e.g. session-vs-incident overlap, span conflicts.

    Pairs sharing several bins are emitted only in the first common bin
    (``bin == greatest(floor(left_start/w), floor(right_start/w))``) —
    duplicate-free by arithmetic, no distinct shuffle."""
    w = _check_width(bin_width)
    _check_disjoint(left, right, extra_key)

    def explode_bins(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__bins", _checked_bins(s, e, w, max_bins)
        ).select(*df.columns, F.explode("__bins").alias("__bin"))

    lx = explode_bins(left, left_start, left_end)
    rx = explode_bins(right, right_start, right_end)
    keys = ["__bin"] + ([extra_key] if extra_key else [])
    pairs = lx.join(rx, keys)
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    first_common = F.col("__bin") == F.greatest(
        _bin(left_start, w), _bin(right_start, w)
    )
    return pairs.filter(overlap & first_common).drop("__bin")
