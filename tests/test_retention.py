"""Satellite history retention: DuckDB differential on the retained set,
current-view invariance, tombstone preservation, and staged-swap reuse."""

import duckdb
import pytest

from mallarddv_spark.operators.retention import prune_sat_history

ROWS = [
    # hk, load_dts, del_flag, run_id, v
    ("a", "2025-01-01 00:00:00", False, 1, "a1"),
    ("a", "2025-01-02 00:00:00", False, 2, "a2"),
    ("a", "2025-01-03 00:00:00", False, 3, "a3"),
    ("a", "2025-01-04 00:00:00", False, 4, "a4"),
    ("b", "2025-01-01 00:00:00", False, 1, "b1"),
    ("b", "2025-01-02 00:00:00", True, 2, None),  # tombstoned key
    ("c", "2025-01-01 00:00:00", False, 1, "c1"),
    # same load_dts, run_id tiebreak
    ("d", "2025-01-01 00:00:00", False, 1, "d1"),
    ("d", "2025-01-01 00:00:00", False, 2, "d2"),
]


@pytest.fixture
def sat(spark, request):
    name = f"default.ret_sat_{request.function.__name__[-20:].strip('_')}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    df = spark.createDataFrame(
        [(h, d, f, r, v) for h, d, f, r, v in ROWS],
        "hk string, load_dts_s string, del_flag boolean, run_id int, v string",
    ).selectExpr("hk", "cast(load_dts_s as timestamp) as load_dts",
                 "del_flag", "run_id", "v")
    df.write.saveAsTable(name)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_prune_matches_duckdb_qualify(spark, sat):
    out = prune_sat_history(spark, sat, keep_versions=2)
    assert out == {"rows_before": 9, "rows_after": 7}
    got = sorted(
        (r.hk, str(r.load_dts), r.run_id) for r in spark.table(sat).collect()
    )
    exp = sorted(
        (h, d, r)
        for h, d, f, r, v in ROWS
        if duckdb.sql(f"""
            WITH t AS (SELECT * FROM (VALUES {','.join(
                f"('{h2}', timestamp '{d2}', {r2})" for h2, d2, _, r2, _ in ROWS
            )}) AS v(hk, load_dts, run_id))
            SELECT count(*) FROM (
              SELECT hk, load_dts, run_id,
                     row_number() OVER (PARTITION BY hk
                                        ORDER BY load_dts DESC, run_id DESC) AS rn
              FROM t) WHERE rn <= 2 AND hk = '{h}'
                AND load_dts = timestamp '{d}' AND run_id = {r}
        """).fetchone()[0] == 1
    )
    assert got == exp


def test_latest_per_key_invariant(spark, sat):
    before = {
        r.hk: (str(r.load_dts), r.run_id, r.del_flag, r.v)
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY hk "
            f"ORDER BY load_dts DESC, run_id DESC) AS rn FROM {sat}) "
            "WHERE rn = 1"
        ).drop("rn").collect()
    }
    prune_sat_history(spark, sat, keep_versions=1)
    after = {
        r.hk: (str(r.load_dts), r.run_id, r.del_flag, r.v)
        for r in spark.table(sat).collect()
    }
    assert after == before  # exactly the latest row per key, nothing else
    assert after["b"][2] is True  # the tombstone survived


def test_staged_swap_path(spark, sat):
    """max_checkpoint_bytes=0 forces the crash-safe rename swap."""
    out = prune_sat_history(spark, sat, keep_versions=3,
                            max_checkpoint_bytes=0)
    assert out["rows_after"] == 8
    assert not spark.catalog.tableExists(f"{sat}__compact")
    assert not spark.catalog.tableExists(f"{sat}__pre_compact")


def test_guards(spark, sat):
    from mallarddv_spark.exceptions import DVConfigurationError

    with pytest.raises(DVConfigurationError, match="keep_versions"):
        prune_sat_history(spark, sat, keep_versions=0)
    with pytest.raises(DVConfigurationError, match="lacks column"):
        prune_sat_history(spark, sat, hk_col="nope")
