"""Cross-source integration: two different staging tables feed the SAME hub
and the same satellite — the core Data Vault promise (integrate by business
key). Keys seen from either source dedupe against the shared hub; satellite
versions interleave by load date."""

import pytest

from mallarddv_spark.api import MallardSparkVault
from mallarddv_spark.sources.catalog import drop_vault

TABLES = """base_name,rel_type,column_name,column_type,column_position,mapping
crm_customer,stg,cid,INTEGER,1,c
crm_customer,stg,email,VARCHAR,2,c
web_signup,stg,customer_id,INTEGER,1,c
web_signup,stg,mail,VARCHAR,2,c
customer,hub,id,INTEGER,1,bk
customer_contact,hsat,customer,,0,hk
customer_contact,hsat,email,VARCHAR,1,f
"""

TRANSITIONS = """source_table,source_field,target_table,target_field,group_name,position,raw,transformation,transfer_type
crm_customer,cid,hub_customer,id_bk,customer,1,false,,bk
crm_customer,customer_hk,hsat_customer_contact,customer,customer_contact,0,false,,sat_delta
crm_customer,email,hsat_customer_contact,email,customer_contact,1,false,,f
web_signup,customer_id,hub_customer,id_bk,customer,1,false,,bk
web_signup,customer_hk,hsat_customer_contact,customer,customer_contact,0,false,,sat_delta
web_signup,mail,hsat_customer_contact,email,customer_contact,1,false,,f
"""


@pytest.fixture(scope="module")
def vault(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cross_source")
    (tmp / "tables.csv").write_text(TABLES)
    (tmp / "transitions.csv").write_text(TRANSITIONS)
    drop_vault(spark)
    v = MallardSparkVault(spark)
    assert v.init_vault(str(tmp / "tables.csv"), str(tmp / "transitions.csv")) == []
    return v


def test_two_sources_one_hub(vault, spark):
    # CRM knows customers 1, 2
    spark.sql("INSERT OVERWRITE stg.crm_customer VALUES (1,'a@x.com'),(2,'b@x.com')")
    assert vault.execute_flow("crm_customer", "crm",
                              load_date_overwrite="2025-01-01 00:00:00") == []
    assert spark.table("dv.hub_customer").count() == 2

    # web signups: customer 2 (already known) + customer 3 (new), and 2's
    # email changed on the web
    spark.sql("INSERT OVERWRITE stg.web_signup VALUES (2,'b@web.com'),(3,'c@web.com')")
    assert vault.execute_flow("web_signup", "web",
                              load_date_overwrite="2025-01-02 00:00:00") == []

    hub = {r.id_bk: r.record_source for r in spark.table("dv.hub_customer").collect()}
    assert len(hub) == 3                       # 2 deduped, 3 added
    assert hub[1] == "crm" and hub[3] == "web"  # first-seen source wins

    # hub hash keys are identical across sources for the same business key
    # (sha1 of the bk — source-independent), so the satellite integrates
    sat = spark.table("dv.hsat_customer_contact").orderBy("load_dts").collect()
    by_key = {}
    for r in sat:
        by_key.setdefault(r.customer_hk, []).append((r.email, r.record_source))
    assert len(by_key) == 3
    versions = [v for vs in by_key.values() for v in vs]
    assert ("b@x.com", "crm") in versions and ("b@web.com", "web") in versions

    cv = {r.email for r in spark.table("bv.hsat_customer_contact_cv").collect()}
    assert cv == {"a@x.com", "b@web.com", "c@web.com"}  # latest per key


def test_orc_and_tsv_sources_feed_same_vault(vault, spark, tmp_path):
    """S1 format dispatch: the same flow ingests CSV, ORC and TSV files —
    self-describing formats are projected+cast to the imposed staging
    schema, delimited ones are parsed with it."""
    import pandas as pd

    # crm batch as ORC (written via Spark: self-describing columnar file)
    crm = spark.createDataFrame(
        pd.DataFrame({"cid": [501, 502], "email": ["a@x.io", "b@x.io"]})
    )
    orc_path = str(tmp_path / "crm_batch")
    crm.coalesce(1).write.orc(orc_path)
    errs = vault.execute_flow(
        "crm_customer", "orc_src", file_path=orc_path, file_type="orc",
        load_date_overwrite="2025-07-01 00:00:00",
    )
    assert errs == []

    # web batch as TSV (tab-separated with header)
    tsv = tmp_path / "web.tsv"
    tsv.write_text("customer_id\tmail\n502\tb2@x.io\n503\tc@x.io\n")
    errs = vault.execute_flow(
        "web_signup", "tsv_src", file_path=str(tsv),
        load_date_overwrite="2025-07-02 00:00:00",
    )
    assert errs == []

    hub = {r.id_bk for r in spark.table("dv.hub_customer").collect()}
    assert {501, 502, 503} <= hub
    sat = spark.table("bv.hsat_customer_contact_cv")
    got = {r.email for r in sat.filter("customer_hk is not null").collect()}
    assert {"a@x.io", "b2@x.io", "c@x.io"} <= got
