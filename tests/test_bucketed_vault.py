"""A vault initialized with dv_buckets: loads behave identically and the
hub anti-join reads the hub pre-partitioned (one Exchange, not two)."""

import os
import re

import pytest
from pyspark.sql import functions as F

from mallarddv_spark.api import MallardSparkVault
from mallarddv_spark.sources.catalog import drop_vault

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def vault(spark):
    drop_vault(spark)
    v = MallardSparkVault(spark, dv_buckets=8)
    assert v.init_vault(
        os.path.join(FIXTURES, "tables.csv"),
        os.path.join(FIXTURES, "transitions.csv"),
    ) == []
    spark.sql(
        "INSERT OVERWRITE stg.customer VALUES "
        "(1,'jhon','doe','j@x.com',timestamp'2025-03-25 15:16:33',NULL,NULL),"
        "(2,'jane','smith','s@x.com',timestamp'2025-03-25 15:17:24',1,352)"
    )
    errors = v.execute_flow("customer", "demo", load_date_overwrite="2025-01-01 00:00:00")
    assert errors == []
    return v


def test_bucketed_tables_load_correctly(vault, spark):
    assert spark.table("dv.hub_customer").count() == 3
    assert spark.table("dv.hsat_customer_details").count() == 2
    # idempotent reload still works on bucketed tables
    assert vault.execute_flow("customer", "demo",
                              load_date_overwrite="2025-01-02 00:00:00") == []
    assert spark.table("dv.hub_customer").count() == 3


def test_bucketed_hub_antijoin_single_exchange(vault, spark):
    from mallarddv_spark.functions.hashing import hash_col

    incoming = spark.range(100).select(
        hash_col(["id"]).alias("hk"), F.col("id").alias("bk")
    )
    existing = spark.table("dv.hub_customer").select(
        F.col("customer_hk").alias("hk")
    )
    new = incoming.join(existing, on="hk", how="left_anti")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = new._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "SelectedBucketsCount" in plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE)) == 1, plan
