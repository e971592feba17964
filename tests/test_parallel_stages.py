"""Opt-in parallel entity-load stages: hubs/links/sats run as concurrent
job groups. Final vault state must be IDENTICAL to the sequential
(reference-contract) ordering — the stages are data-independent: each
reads only the staging hash view and writes only its own targets."""

import os

import pytest

from mallarddv_spark.api import MallardSparkVault
from mallarddv_spark.sources.catalog import drop_vault

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

LOAD1 = "2025-01-01 00:00:00"
LOAD2 = "2025-01-02 00:00:00"

CUSTOMERS_V1 = (
    "INSERT OVERWRITE stg.customer VALUES "
    "(1,'jhon','doe','jhon.doe@example.com',timestamp'2025-03-25 15:16:33',NULL,NULL),"
    "(2,'jane','smith','jane.smith@example.com',timestamp'2025-03-25 15:17:24',1,352)"
)
CUSTOMERS_V2 = (
    "INSERT OVERWRITE stg.customer VALUES "
    "(1,'jhon','doe','j.doe@example.com',timestamp'2025-03-25 15:16:33',NULL,NULL),"
    "(3,'ann','lee','ann.lee@example.com',timestamp'2025-03-26 09:00:00',2,99)"
)

DV_TABLES = [
    "dv.hub_customer",
    "dv.hub_product",
    "dv.link_customer__referencer",
    "dv.hsat_customer_details",
    "dv.lsat_customer__referencer",
]


def _snapshot(spark):
    state = {}
    for t in DV_TABLES:
        df = spark.table(t)
        state[t] = sorted(
            tuple(str(v) for v in row) for row in df.collect()
        )
    return state


def _run_flows(spark, parallel: bool):
    drop_vault(spark)
    v = MallardSparkVault(spark, parallel_stages=parallel)
    assert v.init_vault(
        os.path.join(FIXTURES, "tables.csv"),
        os.path.join(FIXTURES, "transitions.csv"),
    ) == []
    spark.sql(CUSTOMERS_V1)
    assert v.execute_flow("customer", "demo", load_date_overwrite=LOAD1) == []
    spark.sql(CUSTOMERS_V2)
    assert v.execute_flow("customer", "demo", load_date_overwrite=LOAD2) == []
    return _snapshot(spark)


def test_parallel_stages_state_identical(spark):
    sequential = _run_flows(spark, parallel=False)
    parallel = _run_flows(spark, parallel=True)
    assert sequential.keys() == parallel.keys()
    for t in sequential:
        assert sequential[t] == parallel[t], f"{t} diverged under parallel stages"
    # sanity: the flows actually loaded data (incl. second-load delta rows)
    assert any(len(rows) > 2 for rows in sequential.values())


def test_parallel_stage_error_reports_all_failures(spark, tmp_path):
    """Collect-all error semantics: a failing stage reports its error and
    the flow ends in 'failure'; other stages may have committed (recover()
    cleans by run_id, crash tests cover that path)."""
    from unittest import mock

    from mallarddv_spark.operators import link

    drop_vault(spark)
    v = MallardSparkVault(spark, parallel_stages=True)
    assert v.init_vault(
        os.path.join(FIXTURES, "tables.csv"),
        os.path.join(FIXTURES, "transitions.csv"),
    ) == []
    spark.sql(CUSTOMERS_V1)

    def boom(*a, **k):
        raise RuntimeError("injected link failure")

    with mock.patch.object(link, "load_links", boom):
        errors = v.execute_flow("customer", "demo", load_date_overwrite=LOAD1)
    assert [e[0] for e in errors] == ["load_links"]
    status = [
        r.status
        for r in spark.table("metadata.runinfo").collect()
    ]
    assert "failure" in status


def test_concurrent_flows_serialize_run_ids(spark):
    """Two threads driving flows on the SAME vault must not share a
    run_id (global max+1 allocation would cross-delete on rollback);
    the per-executor flow lock serializes them."""
    import threading

    from mallarddv_spark import MallardSparkVault

    dbs = dict(stg_db="cf_stg", dv_db="cf_dv", bv_db="cf_bv",
               metadata_db="cf_meta")
    for db in dbs.values():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    v = MallardSparkVault(spark, **dbs)
    assert v.init_vault("tests/fixtures/tables.csv",
                        "tests/fixtures/transitions.csv") == []

    results = {}

    def run(i):
        results[i] = v.execute_flow(
            "customer", f"src{i}", file_path="tests/fixtures/customer.csv",
            load_date_overwrite="2025-01-01 00:00:00",
            force_load=True,
        )

    ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert results[0] == [] and results[1] == []
    run_ids = [
        r.run_id
        for r in spark.table("cf_meta.runinfo")
        .filter("status = 'success'")
        .collect()
    ]
    assert sorted(run_ids) == [1, 2]  # distinct ids, both succeeded
    for db in dbs.values():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
