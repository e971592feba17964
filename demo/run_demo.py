"""Runnable end-to-end demo of the metadata-driven Data Vault engine.

Mirrors the reference demo layout (tables.csv + transitions.csv metadata,
a 2-row customer CSV, one user-authored staging view script) but executes
on Spark:

    python demo/run_demo.py

Steps: init the vault from metadata (databases, staging tables, DV table
DDL, hash views, user view scripts) → ingest data/customer.csv through the
flow (staging load, hub/link/satellite loads, run ledger) → query the
business-vault current view.
"""

import os
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from mallarddv_spark import MallardSparkVault, get_spark  # noqa: E402


def main() -> None:
    # fresh throwaway warehouse: re-runs start from an empty catalog
    spark = get_spark(
        master="local[4]",
        shuffle_partitions=4,
        warehouse_dir=os.path.join(tempfile.mkdtemp(prefix="dv_demo_"), "wh"),
    )
    vault = MallardSparkVault(spark, scripts_path=os.path.join(HERE, "models"))

    errors = vault.init_vault(
        os.path.join(HERE, "tables.csv"),
        os.path.join(HERE, "transitions.csv"),
    )
    assert errors == [], errors

    # data contract: a violated expectation aborts the flow BEFORE any DV
    # load (nothing bad ever becomes immutable vault history)
    from mallarddv_spark.operators import expectations as E

    errors = vault.execute_flow(
        "customer",
        "demo",
        os.path.join(HERE, "data", "customer.csv"),
        load_date_overwrite="2025-01-01 00:00:00",
        expectations=[E.expect_not_null("id"), E.expect_unique("id")],
    )
    assert errors == [], errors

    print("\n-- business-vault current view: bv.hsat_customer_details_cv --")
    vault.sql(
        "SELECT * FROM bv.hsat_customer_details_cv ORDER BY customer_hk"
    ).show(truncate=False)
    print("-- link rows: dv.link_customer__referencer --")
    vault.sql(
        "SELECT customer_hk, referencer_hk, reference_code_dk "
        "FROM dv.link_customer__referencer"
    ).show(truncate=False)
    print("-- run ledger --")
    vault.sql(
        "SELECT source_table, run_id, status FROM metadata.runinfo ORDER BY run_id"
    ).show()
    spark.stop()


if __name__ == "__main__":
    main()
