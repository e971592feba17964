"""Materialized current-table maintenance: bootstrap refresh + incremental
upsert fold must always equal the logical current view."""

import datetime as dt

import pytest

from mallarddv_spark.operators import satellite


def _ts(s):
    return dt.datetime.fromisoformat(s)


COLS = ["customer_hk", "load_dts", "del_flag", "hash_diff", "record_source", "run_id", "name"]


@pytest.fixture()
def history(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS curtest")
    spark.sql("DROP TABLE IF EXISTS curtest.hsat_c")
    spark.sql("DROP TABLE IF EXISTS curtest.hsat_c_current")
    rows = [
        ("k1", _ts("2024-01-01"), False, "h1", "src", 1, "ann v1"),
        ("k1", _ts("2024-02-01"), False, "h2", "src", 2, "ann v2"),
        ("k2", _ts("2024-01-01"), False, "h3", "src", 1, "bob v1"),
    ]
    spark.createDataFrame(rows, COLS).write.saveAsTable("curtest.hsat_c")
    return rows


def test_refresh_and_upsert(spark, history):
    cur = satellite.refresh_current_table(spark, "curtest", "hsat_c", "customer_hk")
    got = {r.customer_hk: r.name for r in spark.table(cur).collect()}
    assert got == {"k1": "ann v2", "k2": "bob v1"}

    # new batch: k2 updated, k3 appears
    batch_rows = [
        ("k2", _ts("2024-03-01"), False, "h4", "src", 3, "bob v2"),
        ("k3", _ts("2024-03-01"), False, "h5", "src", 3, "cat v1"),
    ]
    batch = spark.createDataFrame(batch_rows, COLS)
    batch.write.mode("append").insertInto("curtest.hsat_c")
    satellite.upsert_current_table(spark, "curtest", "hsat_c", "customer_hk", batch)

    got = {r.customer_hk: r.name for r in spark.table(cur).collect()}
    assert got == {"k1": "ann v2", "k2": "bob v2", "k3": "cat v1"}

    # incremental result equals recompute-from-history
    full = satellite._latest_versions(spark.table("curtest.hsat_c"), "customer_hk")
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, spark.table(cur).collect())
    )
