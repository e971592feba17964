"""The shipped demo/ directory, end-to-end through the facade — the same
files a new user runs (`python demo/run_demo.py`), asserted."""

import os

import pytest

from mallarddv_spark.api import MallardSparkVault
from mallarddv_spark.sources.catalog import drop_vault

DEMO = os.path.join(os.path.dirname(__file__), os.pardir, "demo")


def test_demo_end_to_end(spark):
    drop_vault(spark)
    v = MallardSparkVault(spark, scripts_path=os.path.join(DEMO, "models"))
    assert v.init_vault(
        os.path.join(DEMO, "tables.csv"),
        os.path.join(DEMO, "transitions.csv"),
    ) == []

    # the user view script was applied
    assert spark.catalog.tableExists("stg.customer_vw")

    assert v.execute_flow(
        "customer",
        "demo",
        os.path.join(DEMO, "data", "customer.csv"),
        load_date_overwrite="2025-01-01 00:00:00",
    ) == []

    # two customers + the NULL-key row the referencer group loads for
    # customer 1's empty referenced_by (reference parity: hash of the
    # null business key is sha1(''))
    hub_rows = {r.id_bk for r in spark.table("dv.hub_customer").collect()}
    assert hub_rows == {1, 2, None}
    # link rows: customer 2 referenced_by 1 with code 352, plus customer
    # 1's NULL-referencer row (reference parity with the null-key probe)
    codes = sorted(
        (r.reference_code_dk for r in
         spark.table("dv.link_customer__referencer").collect()),
        key=lambda x: (x is None, x),
    )
    assert codes == [352, None]
    # current view: latest satellite version per hub key
    cv = {
        r.first_name: r.email
        for r in spark.sql("SELECT * FROM bv.hsat_customer_details_cv").collect()
    }
    assert cv == {
        "jhon": "jhon.doe@example.com",
        "jane": "jane.smith@example.com",
    }
    # replay is a no-op (ledger idempotence): runinfo row count stays put
    n_runs = spark.table("metadata.runinfo").count()
    assert v.execute_flow(
        "customer", "demo", os.path.join(DEMO, "data", "customer.csv")
    ) == []
    assert spark.table("metadata.runinfo").count() == n_runs


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="8+ minute subprocess demo; set SPARK_GRAFT_SLOW_TESTS=1 to run "
    "(a showcase, not a gate — the full suite must fit the CI/verify window)",
)
def test_curation_demo_runs():
    """The shipped curation-pipeline demo runs end-to-end as a user would
    (own subprocess and session) and prints every stage marker."""
    import subprocess
    import sys

    # Timeout sized to the measured host band, not the quiet-window
    # best case: the UNTOUCHED r13 tree measured 8m08s-8m56s on an idle
    # host in the round-14 window (NOTES.md "Round 14: demo timing"),
    # so 420 s failed on pure host variance. 900 s still catches a hang
    # while tolerating the documented ~2x host slowdown.
    proc = subprocess.run(
        [sys.executable, os.path.join(DEMO, "run_curation_demo.py")],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    for marker in ("-- profile", "-- clean:", "-- quality:", "-- dedup:",
                   "-- decontam:", "-- split --", "-- mix to",
                   "-- packed sequences"):
        assert marker in proc.stdout, f"missing {marker}"
