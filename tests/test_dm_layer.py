"""Data-mart layer: user SQL scripts build dm views over business-vault
current views (the reference's dm schema is populated only via scripts —
``schema_manager.py:114-170``)."""

import os

import pytest

from mallarddv_spark.api import MallardSparkVault
from mallarddv_spark.sources.catalog import drop_vault

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

DM_SCRIPT = """create or replace view dm.customer_directory as
select
    cv.customer_hk,
    hub.id_bk as customer_id,
    cv.first_name,
    cv.last_name,
    cv.email
from bv.hsat_customer_details_cv cv
join dv.hub_customer hub on cv.customer_hk = hub.customer_hk
where not cv.del_flag
"""

DM_TABLES_EXTRA = "customer_directory,stg_vw,dm,,0,vwdef\n"


@pytest.fixture(scope="module")
def vault(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dm_models")
    (tmp / "dm").mkdir()
    (tmp / "dm" / "customer_directory.sql").write_text(DM_SCRIPT)
    # extend the fixture metadata with the dm view pointer
    tables = tmp / "tables.csv"
    base = open(os.path.join(FIXTURES, "tables.csv")).read()
    tables.write_text(base + DM_TABLES_EXTRA)

    drop_vault(spark)
    v = MallardSparkVault(spark, scripts_path=str(tmp))
    # the customer_vw script the base fixture references is absent here;
    # that error is expected and isolated to that one script
    errors = v.init_vault(str(tables), os.path.join(FIXTURES, "transitions.csv"))
    assert all("customer_vw" in e[0] for e in errors)
    spark.sql(
        "INSERT OVERWRITE stg.customer VALUES "
        "(1,'ann','lee','a@x.com',NULL,NULL,NULL),(2,'bob','kim','b@x.com',NULL,1,7)"
    )
    assert v.execute_flow("customer", "crm", load_date_overwrite="2025-01-01 00:00:00") == []
    # re-applying scripts after loads exist must also succeed (dm views are
    # lazy — they resolve bv/dv objects at query time)
    errors = v.apply_script_from_metadata()
    assert all("customer_vw" in e[0] for e in errors)
    return v


def test_dm_view_over_current_state(vault, spark):
    rows = {r.customer_id: r for r in spark.table("dm.customer_directory").collect()}
    assert set(rows) == {1, 2}
    assert rows[1].first_name == "ann"
    assert len(rows[1].customer_hk) == 40
