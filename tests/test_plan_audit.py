"""The plan-audit utility: reports and guards over real plans."""

import pytest
from pyspark.sql import functions as F

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.plans.audit import assert_plan, plan_report

SF = "/root/testdata/sf0.001"


def test_report_counts_known_plan_features(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    df = (
        li.filter("l_quantity < 10")
        .join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .count()
    )
    df.collect()
    rep = plan_report(df)
    assert rep["broadcast_hash_joins"] == 1
    assert rep["nested_loop_joins"] == 0
    assert rep["python_stages"] == 0
    assert rep["pushed_filters"] is True
    assert rep["shuffle_exchanges"] >= 1  # the groupBy
    assert rep["codegen_spans"] >= 1


def test_assert_plan_flags_nested_loop(spark):
    a = spark.range(5)
    b = spark.range(5).withColumnRenamed("id", "id2")
    theta = a.crossJoin(b).filter("id < id2")
    with pytest.raises(DVConfigurationError) as ei:
        assert_plan(theta, no_nested_loop_joins=True)
    assert "nested-loop" in str(ei.value)


def test_assert_plan_flags_python_stage(spark):
    from pyspark.sql.functions import udf

    slow = udf(lambda x: x + 1, "bigint")
    df = spark.range(10).select(slow("id").alias("y"))
    with pytest.raises(DVConfigurationError) as ei:
        assert_plan(df, no_python_stages=True)
    assert "Python stage" in str(ei.value)


def test_assert_plan_max_shuffles_and_clean_pass(spark):
    df = spark.range(100).groupBy((F.col("id") % 3).alias("g")).count()
    rep = assert_plan(df, no_python_stages=True, no_nested_loop_joins=True,
                      max_shuffles=1)
    assert rep["shuffle_exchanges"] == 1
    with pytest.raises(DVConfigurationError):
        assert_plan(df, max_shuffles=0)


def test_rangejoin_passes_audit(spark):
    """The bin-bucketed range join is exactly what the audit exists to
    certify: no nested loop, bounded shuffles."""
    from mallarddv_spark.operators.rangejoin import point_in_interval_join

    ev = spark.range(1000).select(
        F.col("id").alias("eid"), (F.col("id") * 7 % 500).alias("t")
    )
    iv = spark.range(10).select(
        F.col("id").alias("iv_id"),
        (F.col("id") * 50).alias("s"),
        (F.col("id") * 50 + 49).alias("e"),
    )
    out = point_in_interval_join(ev, iv, "t", "s", "e", bin_width=50)
    out.collect()
    assert_plan(out, no_python_stages=True, no_nested_loop_joins=True)


def test_flow_plan_guard_blocks_planted_nested_loop(spark):
    """execute_flow(plan_guard=...) audits the hash view's plan before any
    vault write: a staging view hiding a nested-loop join fails the flow
    with the audit message, loads nothing, and records a 'failure' ledger
    row; a clean flow under the same guard passes."""
    from mallarddv_spark import MallardSparkVault

    dbs = dict(stg_db="pg_stg", dv_db="pg_dv", bv_db="pg_bv",
               metadata_db="pg_meta")
    for db in dbs.values():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    v = MallardSparkVault(spark, **dbs)
    assert v.init_vault("tests/fixtures/tables.csv",
                        "tests/fixtures/transitions.csv") == []

    # clean flow passes under a strict guard (hash view = pure projection)
    spark.sql(
        "INSERT OVERWRITE pg_stg.customer VALUES "
        "(1,'a','b','a@x.io',timestamp'2025-01-01',NULL,NULL)"
    )
    assert v.execute_flow(
        "customer", "pg",
        load_date_overwrite="2025-01-01 00:00:00",
        plan_guard={"no_nested_loop_joins": True, "no_python_stages": True,
                    "max_shuffles": 0},
    ) == []
    n_before = spark.table("pg_dv.hub_customer").count()

    # plant a nested-loop join UNDER the staging name: replace the table
    # with a theta-join view (the shape a hand-written user staging view
    # could smuggle in)
    spark.sql("DROP TABLE pg_stg.customer")
    spark.sql(
        """CREATE VIEW pg_stg.customer AS
           SELECT cast(a.id AS int) AS id, 'x' AS first_name,
                  'y' AS last_name, 'z@x.io' AS email,
                  timestamp'2025-01-01' AS created_date,
                  cast(NULL AS int) AS referenced_by,
                  cast(NULL AS string) AS reference_code
           FROM range(5) a JOIN range(5) b ON a.id <= b.id"""
    )
    errs = v.execute_flow(
        "customer", "pg", force_load=True,
        load_date_overwrite="2025-01-02 00:00:00",
        plan_guard={"no_nested_loop_joins": True},
    )
    assert len(errs) == 1 and errs[0][0] == "plan_guard"
    assert "nested-loop" in errs[0][1]
    # nothing loaded, failure recorded
    assert spark.table("pg_dv.hub_customer").count() == n_before
    last = (
        spark.table("pg_meta.runinfo")
        .orderBy(F.desc("run_id")).limit(2).collect()
    )
    assert {r.status for r in last} >= {"failure"}

    # an unknown guard option is surfaced, not swallowed
    errs = v.execute_flow(
        "customer", "pg", force_load=True,
        load_date_overwrite="2025-01-02 00:00:00",
        plan_guard={"no_such_option": True},
    )
    assert errs and errs[0][0] == "plan_guard"
    assert "bad plan_guard option" in errs[0][1]

    for db in dbs.values():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
