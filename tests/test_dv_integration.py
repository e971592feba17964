"""End-to-end Data Vault flow on the customer fixture.

Fixture metadata mirrors the reference's demo model
(``/root/reference/demo/tables.csv``/``transitions.csv``) because the golden
hash values (SURVEY.md §8.3, produced by executing the reference) are tied
to that model: self-referencing customer hub, link with two legs + degenerate
key, delta satellite, payload-less link satellite.
"""

import os

import pytest
from pyspark.sql import Row

from mallarddv_spark.api import MallardSparkVault
from mallarddv_spark.sources.catalog import drop_vault

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

SHA1_1 = "356a192b7913b04c54574d18c28d46e6395428ab"
SHA1_2 = "da4b9237bacccdf19c0760cab7aec4a8359010b0"
SHA1_EMPTY = "da39a3ee5e6b4b0d3255bfef95601890afd80709"
LINK_HK_ID1 = "0608f581ad01df70cb0a4a87cbd19319e9d1c23b"  # sha1('1||||')
HD_JANE = "9f7934d5f2a7b1c757c19e7cab74abf74866a129"

LOAD1 = "2025-01-01 00:00:00"
LOAD2 = "2025-01-02 00:00:00"


@pytest.fixture(scope="module")
def vault(spark):
    drop_vault(spark)
    v = MallardSparkVault(spark)
    errors = v.init_vault(
        os.path.join(FIXTURES, "tables.csv"),
        os.path.join(FIXTURES, "transitions.csv"),
    )
    assert errors == []
    # preload stg.customer with the 2 demo rows (SURVEY §8.3 setup)
    spark.sql(
        "INSERT OVERWRITE stg.customer VALUES "
        "(1,'jhon','doe','jhon.doe@example.com',timestamp'2025-03-25 15:16:33',NULL,NULL),"
        "(2,'jane','smith','jane.smith@example.com',timestamp'2025-03-25 15:17:24',1,352)"
    )
    errors = v.execute_flow("customer", "demo-customer", load_date_overwrite=LOAD1)
    assert errors == []
    return v


def test_metadata_tables_populated(vault, spark):
    assert spark.table("metadata.tables").count() == 26
    assert spark.table("metadata.transitions").count() == 15


def test_hash_view_columns(vault, spark):
    cols = spark.table("stg.customer_hash_vw").columns
    for expected in (
        "customer_hk",        # hub group 'customer'
        "referencer_hk",      # hub group 'referencer'
        "l_reference_hk",     # link group
        "customer_details_hashdiff",
        "id", "first_name", "last_name", "email", "referenced_by", "reference_code",
    ):
        assert expected in cols


def test_hub_rows_include_null_ghost(vault, spark):
    """NULL business keys are NOT filtered: id=2's referenced_by=NULL feeds
    the 'referencer' group and creates a ghost hub row with hk=sha1('')."""
    rows = {r.customer_hk: r.id_bk for r in spark.table("dv.hub_customer").collect()}
    assert rows == {SHA1_1: 1, SHA1_2: 2, SHA1_EMPTY: None}


def test_link_hash_expansion(vault, spark):
    """Link hash = hash over expanded business keys ('1||||'), while the link
    row stores the member hubs' hash keys."""
    rows = {r.customer__referencer_hk: r for r in spark.table(
        "dv.link_customer__referencer").collect()}
    assert LINK_HK_ID1 in rows
    r1 = rows[LINK_HK_ID1]
    assert r1.customer_hk == SHA1_1
    assert r1.referencer_hk == SHA1_EMPTY
    assert r1.reference_code_dk is None
    assert len(rows) == 2


def test_sat_hashdiff_and_payload(vault, spark):
    sat = {r.customer_hk: r for r in spark.table("dv.hsat_customer_details").collect()}
    assert len(sat) == 2
    jane = sat[SHA1_2]
    assert jane.hash_diff == HD_JANE
    assert jane.first_name == "jane"
    assert not jane.del_flag
    # declared-but-unfed column stays NULL
    assert jane.created_date is None


def test_payloadless_lsat_hashdiff_is_link_hk(vault, spark):
    """A satellite with no 'f' fields stores the parent hash key as its
    hash_diff (reference satellite_manager.py:271)."""
    rows = spark.table("dv.lsat_customer__referencer").collect()
    assert len(rows) == 2
    for r in rows:
        assert r.hash_diff == r.customer__referencer_hk


def test_current_view(vault, spark):
    cv = spark.table("bv.hsat_customer_details_cv")
    assert cv.count() == 2
    assert set(cv.columns) >= {"customer_hk", "load_dts", "del_flag", "hash_diff"}


def test_idempotent_reload(vault, spark):
    """Re-running the flow with a later load date inserts nothing anywhere."""
    before = {
        t: spark.table(t).count()
        for t in (
            "dv.hub_customer",
            "dv.link_customer__referencer",
            "dv.hsat_customer_details",
            "dv.lsat_customer__referencer",
        )
    }
    errors = vault.execute_flow("customer", "demo-customer", load_date_overwrite=LOAD2)
    assert errors == []
    for t, n in before.items():
        assert spark.table(t).count() == n, t


def test_runinfo_ledger(vault, spark):
    runs = spark.table("metadata.runinfo").orderBy("run_id", "log_date").collect()
    statuses = [r.status for r in runs]
    assert statuses.count("success") >= 2
    assert statuses.count("start") >= 2
    assert all(r.run_id >= 1 for r in runs)


def test_file_ingestion_and_skip(vault, spark):
    """CSV → staging with imposed schema; second call skips (already
    ingested); force_load re-runs."""
    csv = os.path.join(FIXTURES, "customer.csv")
    errors = vault.execute_flow("customer", "demo-customer", file_path=csv,
                                load_date_overwrite=LOAD2)
    assert errors == []
    assert spark.table("stg.customer").count() == 2
    # identical data → still no new DV rows
    assert spark.table("dv.hub_customer").count() == 3

    runs_before = spark.table("metadata.runinfo").count()
    errors = vault.execute_flow("customer", "demo-customer", file_path=csv)
    assert errors == []
    # skipped: no new runinfo rows
    assert spark.table("metadata.runinfo").count() == runs_before


def test_force_load_rereads_file(vault, spark):
    """force_load bypasses the already-ingested skip and re-runs the flow
    (idempotent loads make the re-run a no-op on DV tables)."""
    csv = os.path.join(FIXTURES, "customer.csv")
    runs_before = spark.table("metadata.runinfo").count()
    errors = vault.execute_flow(
        "customer", "demo-customer", file_path=csv, force_load=True,
        load_date_overwrite=LOAD2,
    )
    assert errors == []
    # flow actually ran: start + success rows appended
    assert spark.table("metadata.runinfo").count() == runs_before + 2
    assert spark.table("dv.hub_customer").count() == 3
