"""Bin-bucketed range joins vs a brute-force theta-join ground truth,
plus the dedup-free and fail-fast properties."""

import pytest
from pyspark.sql import Row, functions as F

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.operators import rangejoin as R

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ev(spark):
    from mallarddv_spark.suite import read_events

    return (
        read_events(spark, SF)
        .filter("user_id < 40")
        .select(
            "event_id", "user_id",
            F.expr(
                "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01', ts)"
            ).alias("t"),
        )
    )


def _sessions(ev):
    # synthetic intervals: one per user spanning their 2nd..4th event
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("t")
    ranked = ev.withColumn("rn", F.row_number().over(w))
    return (
        ranked.filter("rn in (2, 4)")
        .groupBy(F.col("user_id").alias("iv_user"))
        .agg(F.min("t").alias("iv_start"), F.max("t").alias("iv_end"))
        .withColumn("iv_id", F.col("iv_user"))
    )


def test_point_in_interval_matches_bruteforce(spark, ev):
    iv = _sessions(ev)
    for width in (3_600 * 10**6, 86_400 * 10**6, 10**13):  # 1h, 1d, oversized
        got = R.point_in_interval_join(
            ev, iv, "t", "iv_start", "iv_end", bin_width=width
        )
        brute = ev.crossJoin(iv).filter(
            "iv_start <= t AND t <= iv_end"
        )
        g = sorted((r.event_id, r.iv_id) for r in got.collect())
        b = sorted((r.event_id, r.iv_id) for r in brute.collect())
        assert g == b and len(g) > 0, width
        assert len(g) == len(set(g))  # no duplicates at any width


def test_point_in_interval_extra_key(spark, ev):
    iv = _sessions(ev).withColumnRenamed("iv_user", "user_id")
    got = R.point_in_interval_join(
        ev, iv, "t", "iv_start", "iv_end",
        bin_width=3_600 * 10**6, extra_key="user_id",
    )
    brute = (
        ev.join(iv, "user_id")
        .filter("iv_start <= t AND t <= iv_end")
    )
    assert sorted((r.event_id, r.iv_id) for r in got.collect()) == sorted(
        (r.event_id, r.iv_id) for r in brute.collect()
    )
    assert got.count() > 0


def test_interval_overlap_matches_bruteforce(spark, ev):
    iv = _sessions(ev)
    left = iv.select(
        F.col("iv_id").alias("l_id"),
        F.col("iv_start").alias("l_start"),
        F.col("iv_end").alias("l_end"),
    )
    right = iv.select(
        F.col("iv_id").alias("r_id"),
        (F.col("iv_start") + 1).alias("r_start"),
        (F.col("iv_end") + 10**8).alias("r_end"),
    )
    for width in (3_600 * 10**6, 86_400 * 10**6):
        got = R.interval_overlap_join(
            left, right, "l_start", "l_end", "r_start", "r_end",
            bin_width=width,
        )
        brute = left.crossJoin(right).filter(
            "l_start <= r_end AND r_start <= l_end"
        )
        g = sorted((r.l_id, r.r_id) for r in got.collect())
        b = sorted((r.l_id, r.r_id) for r in brute.collect())
        assert g == b and len(g) > 0, width
        assert len(g) == len(set(g))  # first-common-bin dedup works


def test_rangejoin_guards(spark, ev):
    iv = _sessions(ev)
    with pytest.raises(DVConfigurationError):
        R.point_in_interval_join(ev, iv, "t", "iv_start", "iv_end", 0)
    # column collision refused
    with pytest.raises(DVConfigurationError):
        R.point_in_interval_join(
            ev, iv.withColumn("t", F.lit(1)), "t", "iv_start", "iv_end", 10**6
        )
    # oversized interval fails fast instead of exploding
    with pytest.raises(Exception) as ei:
        R.point_in_interval_join(
            ev, iv, "t", "iv_start", "iv_end",
            bin_width=1000, max_bins=10,
        ).count()
    assert "raise bin_width" in str(ei.value)
    # malformed (end < start) intervals match nothing rather than raising
    bad = spark.createDataFrame([Row(iv_id=1, iv_start=100, iv_end=50)])
    assert R.point_in_interval_join(
        ev, bad, "t", "iv_start", "iv_end", 10**6
    ).count() == 0


def test_rangejoin_plan_is_equi_join(spark, ev):
    """The whole point: the plan must be a hash/sort-merge equi-join on
    the bin id, never BroadcastNestedLoopJoin."""
    iv = _sessions(ev)
    got = R.point_in_interval_join(
        ev, iv, "t", "iv_start", "iv_end", bin_width=3_600 * 10**6
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan or "BroadcastHashJoin" in plan
            or "ShuffledHashJoin" in plan), plan


from hypothesis import given, settings, strategies as st


@settings(max_examples=6, deadline=None)
@given(
    points=st.lists(st.integers(-1000, 1000), min_size=1, max_size=40),
    ivs=st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(0, 300)),
        min_size=1, max_size=15,
    ),
    width=st.sampled_from([1, 7, 50, 1000]),
)
def test_point_in_interval_property(spark, points, ivs, width):
    """Fuzzed equivalence with the brute-force theta join for arbitrary
    (negative-domain included) points, intervals, and bin widths."""
    p = spark.createDataFrame(
        [(i, v) for i, v in enumerate(points)], "pid int, t long"
    )
    iv = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(ivs)],
        "iv_id int, s long, e long",
    )
    got = sorted(
        (r.pid, r.iv_id)
        for r in R.point_in_interval_join(
            p, iv, "t", "s", "e", bin_width=width
        ).collect()
    )
    brute = sorted(
        (i, j)
        for i, v in enumerate(points)
        for j, (s, ln) in enumerate(ivs)
        if s <= v <= s + ln
    )
    assert got == brute


@settings(max_examples=6, deadline=None)
@given(
    lhs=st.lists(
        st.tuples(st.integers(-500, 500), st.integers(0, 200)),
        min_size=1, max_size=12,
    ),
    rhs=st.lists(
        st.tuples(st.integers(-500, 500), st.integers(0, 200)),
        min_size=1, max_size=12,
    ),
    width=st.sampled_from([3, 64, 500]),
)
def test_interval_overlap_property(spark, lhs, rhs, width):
    """Fuzzed: overlap pairs match brute force exactly AND are emitted
    once (the first-common-bin dedup under arbitrary geometry)."""
    l = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(lhs)],
        "l_id int, ls long, le long",
    )
    r = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(rhs)],
        "r_id int, rs long, re long",
    )
    got = sorted(
        (x.l_id, x.r_id)
        for x in R.interval_overlap_join(
            l, r, "ls", "le", "rs", "re", bin_width=width
        ).collect()
    )
    brute = sorted(
        (i, j)
        for i, (s1, n1) in enumerate(lhs)
        for j, (s2, n2) in enumerate(rhs)
        if s1 <= s2 + n2 and s2 <= s1 + n1
    )
    assert got == brute and len(got) == len(set(got))


def _hot_points(spark, n=4000):
    """90% of points in ONE bin (bin_width=100 → values 0..99), the rest
    spread over 100 other bins."""
    return spark.range(n).select(
        F.col("id").alias("pid"),
        F.when(F.col("id") % 10 < 9, F.pmod(F.xxhash64("id"), F.lit(100)))
        .otherwise(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) + 100
        )
        .cast("double")
        .alias("p"),
    )


def _hot_intervals(spark):
    """A few wide 'global calibration window' intervals covering the hot
    bin plus some narrow ones elsewhere."""
    rows = [Row(iid=0, s=0.0, e=10_099.0), Row(iid=1, s=0.0, e=99.0),
            Row(iid=2, s=50.0, e=150.0), Row(iid=3, s=5_000.0, e=5_100.0)]
    return spark.createDataFrame(rows)


def test_point_in_interval_salted_matches_unsalted(spark):
    """Hot-bin skew guard: with 90% of points in one bin, salt>1 must
    return exactly the brute-force pairs (exactly-once survives the salt
    replication) while spreading the hot bin's rows over `salt` distinct
    shuffle keys — the pairs no longer all hash to one task."""
    pts = _hot_points(spark)
    iv = _hot_intervals(spark)
    brute = sorted(
        (r.pid, r.iid)
        for r in pts.crossJoin(iv).filter("s <= p AND p <= e").collect()
    )
    for salt in (1, 8):
        got = R.point_in_interval_join(
            pts, iv, "p", "s", "e", bin_width=100, salt=salt
        )
        g = sorted((r.pid, r.iid) for r in got.collect())
        assert g == brute and len(g) > 0, salt
        assert len(g) == len(set(g))
    # the guard itself: the salted point side spreads the hot bin over
    # >1 shuffle key — measure rows per hash-partition of the join keys
    salted = R._one_salt_per_row(
        pts.withColumn("__bin", R._bin("p", 100.0)), 8
    )
    per_part = (
        salted.repartition(8, "__bin", "__salt")
        .withColumn("part", F.spark_partition_id())
        .groupBy("part").count().collect()
    )
    top = max(r["count"] for r in per_part)
    # unsalted: the hot bin (~3600 rows of 4000) lands on ONE partition;
    # salted: no partition should hold more than ~half the rows
    assert top < 2400, per_part
    unsalted_parts = (
        pts.withColumn("__bin", R._bin("p", 100.0))
        .repartition(8, "__bin")
        .withColumn("part", F.spark_partition_id())
        .groupBy("part").count().collect()
    )
    assert max(r["count"] for r in unsalted_parts) >= 3000  # the skew is real


def test_interval_overlap_salted_matches_unsalted(spark):
    """Same guard for interval-overlap: many left intervals inside the
    hot region, one global window on the right."""
    lefts = spark.range(2000).select(
        F.col("id").alias("lid"),
        F.pmod(F.xxhash64("id"), F.lit(90)).cast("double").alias("ls"),
    ).withColumn("le", F.col("ls") + 5.0)
    rights = _hot_intervals(spark).selectExpr(
        "iid AS rid", "s AS rs", "e AS re"
    )
    brute = sorted(
        (r.lid, r.rid)
        for r in lefts.crossJoin(rights)
        .filter("ls <= re AND rs <= le").collect()
    )
    for salt in (1, 8):
        got = R.interval_overlap_join(
            lefts, rights, "ls", "le", "rs", "re", bin_width=100, salt=salt
        )
        g = sorted((r.lid, r.rid) for r in got.collect())
        assert g == brute and len(g) > 0, salt
        assert len(g) == len(set(g))


def test_salt_validation(spark):
    pts = _hot_points(spark, 10)
    iv = _hot_intervals(spark)
    with pytest.raises(DVConfigurationError, match="salt"):
        R.point_in_interval_join(
            pts, iv, "p", "s", "e", bin_width=100, salt=0
        )
    # reserved-name guard covers __salt too
    with pytest.raises(DVConfigurationError, match="__salt"):
        R.point_in_interval_join(
            pts.withColumn("__salt", F.lit(1)), iv, "p", "s", "e",
            bin_width=100,
        )
