"""As-of join + PIT table tests (vs hand-computed expectations and the
DuckDB ASOF JOIN as a cross-check in the suite)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mallarddv_spark.operators import asof


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:05:00"), 101.0),
            ("A", _ts("2024-01-01 10:10:00"), 99.0),
            ("B", _ts("2024-01-01 10:03:00"), 50.0),
        ],
        ["sym", "qts", "price"],
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:02:00"), 10),
            ("A", _ts("2024-01-01 10:05:00"), 20),  # exact-ts match
            ("A", _ts("2024-01-01 10:30:00"), 30),
            ("B", _ts("2024-01-01 10:00:00"), 40),  # before any quote
            ("C", _ts("2024-01-01 10:00:00"), 50),  # key with no quotes
        ],
        ["sym", "tts", "qty"],
    )
    return quotes, trades


def test_asof_join_backward(spark, frames):
    quotes, trades = frames
    out = asof.asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        right_payload=["price"],
    )
    got = {(r.sym, r.qty): (r.price, r.qts) for r in out.collect()}
    assert len(got) == 5
    assert got[("A", 10)] == (100.0, _ts("2024-01-01 10:00:00"))
    assert got[("A", 20)] == (101.0, _ts("2024-01-01 10:05:00"))  # ties match
    assert got[("A", 30)] == (99.0, _ts("2024-01-01 10:10:00"))
    assert got[("B", 40)] == (None, None)  # no quote yet
    assert got[("C", 50)] == (None, None)  # no quotes at all


def test_pit_table(spark):
    sat_a = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01 00:00:00")),
            ("k1", _ts("2024-02-01 00:00:00")),
            ("k2", _ts("2024-01-15 00:00:00")),
        ],
        ["customer_hk", "load_dts"],
    )
    sat_b = spark.createDataFrame(
        [("k1", _ts("2024-01-20 00:00:00"))],
        ["customer_hk", "load_dts"],
    )
    snaps = spark.createDataFrame(
        [(_ts("2024-01-31 23:59:59"),), (_ts("2024-02-28 23:59:59"),)],
        ["snapshot_ts"],
    )
    pit = asof.pit_table(
        {"sat_a": sat_a, "sat_b": sat_b}, "customer_hk", snaps
    )
    rows = {(r.customer_hk, r.snapshot_ts): r for r in pit.collect()}
    assert len(rows) == 4  # 2 keys × 2 snapshots
    jan_k1 = rows[("k1", _ts("2024-01-31 23:59:59"))]
    assert jan_k1.sat_a_load_dts == _ts("2024-01-01 00:00:00")
    assert jan_k1.sat_b_load_dts == _ts("2024-01-20 00:00:00")
    feb_k1 = rows[("k1", _ts("2024-02-28 23:59:59"))]
    assert feb_k1.sat_a_load_dts == _ts("2024-02-01 00:00:00")
    jan_k2 = rows[("k2", _ts("2024-01-31 23:59:59"))]
    assert jan_k2.sat_a_load_dts == _ts("2024-01-15 00:00:00")
    assert jan_k2.sat_b_load_dts is None


def test_asof_directions_and_tolerance(spark):
    """merge_asof surface: forward = earliest >= , nearest = closer side
    with ties preferring backward, tolerance nulls far matches exactly
    (the single candidate per side makes post-filtering exact)."""
    from mallarddv_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u1", 10.0), ("u1", 25.0), ("u2", 5.0)], "uid string, t double")
    right = spark.createDataFrame(
        [("u1", 8.0, "a"), ("u1", 12.0, "b"), ("u1", 30.0, "c"),
         ("u2", 50.0, "d")],
        "uid string, rt double, tag string")

    back = {(r.uid, r.t): (r.tag, r.rt) for r in asof_join(
        left, right, "uid", "t", "rt").collect()}
    assert back[("u1", 10.0)] == ("a", 8.0)
    assert back[("u1", 25.0)] == ("b", 12.0)
    assert back[("u2", 5.0)] == (None, None)

    fwd = {(r.uid, r.t): (r.tag, r.rt) for r in asof_join(
        left, right, "uid", "t", "rt", direction="forward").collect()}
    assert fwd[("u1", 10.0)] == ("b", 12.0)
    assert fwd[("u1", 25.0)] == ("c", 30.0)
    assert fwd[("u2", 5.0)] == ("d", 50.0)

    near = {(r.uid, r.t): (r.tag, r.rt) for r in asof_join(
        left, right, "uid", "t", "rt", direction="nearest").collect()}
    assert near[("u1", 10.0)] == ("a", 8.0)   # tie (2 vs 2): backward
    assert near[("u1", 25.0)] == ("c", 30.0)  # 5 < 13
    assert near[("u2", 5.0)] == ("d", 50.0)   # only forward exists

    tol = {(r.uid, r.t): (r.tag, r.rt) for r in asof_join(
        left, right, "uid", "t", "rt", direction="nearest",
        tolerance=3.0).collect()}
    assert tol[("u1", 10.0)] == ("a", 8.0)
    assert tol[("u1", 25.0)] == (None, None)
    assert tol[("u2", 5.0)] == (None, None)

    import pytest as _pt
    with _pt.raises(ValueError, match="direction"):
        asof_join(left, right, "uid", "t", "rt", direction="sideways")


def test_asof_forward_tolerance_on_timestamps(spark):
    """Tolerance counts SECONDS on timestamp columns (timestampdiff —
    the NTZ-safe arithmetic)."""
    from mallarddv_spark.operators.asof import asof_join

    left = spark.sql(
        "SELECT 'u' AS uid, timestamp'2025-01-01 00:00:10' AS t"
    )
    right = spark.sql(
        "SELECT 'u' AS uid, timestamp'2025-01-01 00:00:25' AS rt, "
        "'x' AS tag"
    )
    hit = asof_join(left, right, "uid", "t", "rt",
                    direction="forward", tolerance=20.0).first()
    assert hit.tag == "x"
    miss = asof_join(left, right, "uid", "t", "rt",
                     direction="forward", tolerance=10.0).first()
    assert miss.tag is None
