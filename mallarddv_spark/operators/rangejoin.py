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


def _check_salt(salt: int) -> int:
    s = int(salt)
    if s < 1:
        raise DVConfigurationError(f"salt must be >= 1, got {salt}")
    return s


def _one_salt_per_row(df: DataFrame, n: int) -> DataFrame:
    """Assign each row ONE pseudo-random salt in [0, n): identical rows
    spread too (the id, not the values, is hashed), so a hot bin's rows
    fan across ``n`` join keys."""
    return df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n)),
    )


def _replicate_salts(df: DataFrame, n: int) -> DataFrame:
    """Replicate each row across ALL salts in [0, n) — the other join
    side must meet every salt the hot side may carry."""
    return df.withColumn(
        "__salt",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(n - 1).cast("long"))
        ),
    )


def _check_disjoint(a: DataFrame, b: DataFrame, extra_key: str | None) -> None:
    clash = (set(a.columns) & set(b.columns)) - {extra_key}
    if clash:
        raise DVConfigurationError(
            f"both sides carry columns {sorted(clash)} — rename one side; "
            f"ambiguous names would silently mis-resolve the range predicate"
        )
    reserved = {"__bin", "__bins", "__salt"} & (
        set(a.columns) | set(b.columns)
    )
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
    salt: int = 1,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_col <= end_col`` (endpoints inclusive) — e.g.
    event-to-session assignment, IP-to-range lookup, reading-to-
    calibration-window matching.

    A point occupies exactly one bin and an interval covers that bin at
    most once, so each match surfaces exactly once — no dedup pass.

    ``salt`` > 1 hardens against a HOT BIN (most points landing in one
    region, e.g. a burst hour, while a few wide intervals cover it —
    every candidate pair would land on the one task that owns that
    bin's hash). Each point gets one pseudo-random salt; each exploded
    interval bin is replicated across all ``salt`` values, so the hot
    bin's pairs spread over ``salt`` tasks. Exactly-once semantics are
    untouched (a point carries a single (bin, salt); the interval
    covers it once). Cost: interval-side shuffle rows × ``salt`` —
    keep it small (8–32) and prefer a larger ``bin_width`` first."""
    w = _check_width(bin_width)
    s = _check_salt(salt)
    _check_disjoint(points, intervals, extra_key)
    p = points.withColumn("__bin", _bin(point_col, w))
    ivx = intervals.withColumn(
        "__bins", _checked_bins(start_col, end_col, w, max_bins)
    ).select(*intervals.columns, F.explode("__bins").alias("__bin"))
    keys = ["__bin"] + ([extra_key] if extra_key else [])
    if s > 1:
        p = _one_salt_per_row(p, s)
        ivx = _replicate_salts(ivx, s)
        keys.append("__salt")
    exact = (F.col(start_col) <= F.col(point_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    return p.join(ivx, keys).filter(exact).drop("__bin", "__salt")


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
    salt: int = 1,
) -> DataFrame:
    """All (left, right) pairs whose intervals overlap:
    ``left_start <= right_end AND right_start <= left_end`` (closed
    intervals) — e.g. session-vs-incident overlap, span conflicts.

    Pairs sharing several bins are emitted only in the first common bin
    (``bin == greatest(floor(left_start/w), floor(right_start/w))``) —
    duplicate-free by arithmetic, no distinct shuffle.

    ``salt`` > 1 hardens against a HOT BIN (e.g. a global calibration
    window every left interval overlaps): left (bin, row) pairs each
    take one pseudo-random salt, right pairs replicate across all
    ``salt`` values, spreading the hot bin over ``salt`` tasks. A
    (left, right) pair still surfaces exactly once — the first-common-
    bin rule picks one bin, and within it left's single salt meets one
    right replica. Cost: right-side shuffle rows × ``salt`` — salt the
    join so the SMALLER side is ``right``, keep salt small (8–32), and
    prefer a larger ``bin_width`` first."""
    w = _check_width(bin_width)
    s = _check_salt(salt)
    _check_disjoint(left, right, extra_key)

    def explode_bins(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__bins", _checked_bins(s, e, w, max_bins)
        ).select(*df.columns, F.explode("__bins").alias("__bin"))

    lx = explode_bins(left, left_start, left_end)
    rx = explode_bins(right, right_start, right_end)
    keys = ["__bin"] + ([extra_key] if extra_key else [])
    if s > 1:
        lx = _one_salt_per_row(lx, s)
        rx = _replicate_salts(rx, s)
        keys.append("__salt")
    pairs = lx.join(rx, keys)
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    first_common = F.col("__bin") == F.greatest(
        _bin(left_start, w), _bin(right_start, w)
    )
    return pairs.filter(overlap & first_common).drop("__bin", "__salt")
