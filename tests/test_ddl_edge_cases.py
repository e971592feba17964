"""DDL / metadata edge cases: non-historized links, quoted identifiers
(column names with spaces), user view scripts, raw SQL passthrough."""

import os

import pytest

from mallarddv_spark.api import MallardSparkVault
from mallarddv_spark.sources.catalog import drop_vault

TABLES_CSV = """base_name,rel_type,column_name,column_type,column_position,mapping
reading,stg,sensor_id,INTEGER,1,c
reading,stg,measured at,TIMESTAMP,2,c
reading,stg,val,DOUBLE,3,c
sensor,hub,sensor_id,INTEGER,1,bk
sensor__reading,nhl,sensor,,1,ll
sensor__reading,nhl,measured at,TIMESTAMP,2,dk
sensor__reading,nhl,val,DOUBLE,3,dk
reading_vw,stg_vw,stg,,0,vwdef
"""

TRANSITIONS_CSV = """source_table,source_field,target_table,target_field,group_name,position,raw,transformation,transfer_type
reading,sensor_id,hub_sensor,sensor_id_bk,sensor,1,false,,bk
reading,sensor,nhl_sensor__reading,sensor_hk,evt,1,false,,ll
reading,measured at,nhl_sensor__reading,measured_at_dk,evt,2,false,,dk
reading,val,nhl_sensor__reading,val_dk,evt,3,false,,dk
"""

VIEW_SQL = """create or replace view stg.reading_vw as
select sensor_id, `measured at` as measured_at, val from stg.reading
"""


@pytest.fixture(scope="module")
def vault(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("nhl_fixture")
    (tmp / "stg").mkdir()
    tables = tmp / "tables.csv"
    transitions = tmp / "transitions.csv"
    tables.write_text(TABLES_CSV)
    transitions.write_text(TRANSITIONS_CSV)
    (tmp / "stg" / "reading_vw.sql").write_text(VIEW_SQL)

    drop_vault(spark)
    v = MallardSparkVault(spark, scripts_path=str(tmp))
    assert v.init_vault(str(tables), str(transitions)) == []
    spark.sql(
        "INSERT OVERWRITE stg.reading VALUES "
        "(1, timestamp'2025-01-01 10:00:00', 1.5),"
        "(1, timestamp'2025-01-01 11:00:00', 2.5),"
        "(2, timestamp'2025-01-01 10:30:00', 9.0)"
    )
    assert v.execute_flow("reading", "iot", load_date_overwrite="2025-01-02 00:00:00") == []
    return v


def test_nhl_table_created_and_loaded(vault, spark):
    """Non-historized link: one row per distinct (leg, dk...) combination;
    hash key name strips the nhl_ prefix."""
    rows = spark.table("dv.nhl_sensor__reading").collect()
    assert len(rows) == 3
    cols = spark.table("dv.nhl_sensor__reading").columns
    assert "sensor__reading_hk" in cols  # nhl_ prefix stripped
    # DDL column names come from metadata.tables.column_name (reference
    # behavior: quoted verbatim, spaces preserved); loads align positionally
    assert "sensor_hk" in cols and "measured at_dk" in cols and "val_dk" in cols


def test_quoted_identifier_staging_column(vault, spark):
    """Column name with a space survives DDL, ingestion, and projection."""
    assert "measured at" in spark.table("stg.reading").columns


def test_view_script_applied(vault, spark):
    out = spark.table("stg.reading_vw").collect()
    assert len(out) == 3
    assert {r.sensor_id for r in out} == {1, 2}


def test_nhl_idempotent_reload(vault, spark):
    assert vault.execute_flow("reading", "iot", load_date_overwrite="2025-01-03 00:00:00") == []
    assert spark.table("dv.nhl_sensor__reading").count() == 3


def test_raw_sql_passthrough(vault):
    df = vault.sql(
        "SELECT h.sensor_id_bk, count(*) AS n FROM dv.nhl_sensor__reading l "
        "JOIN dv.hub_sensor h ON l.sensor_hk = h.sensor_hk GROUP BY 1"
    )
    got = {r.sensor_id_bk: r.n for r in df.collect()}
    assert got == {1: 2, 2: 1}


# --- hash-view DDL memo ------------------------------------------------------


class _SQLRecorder:
    """Duck-typed SparkSession stand-in: records issued SQL strings."""

    def __init__(self):
        self.calls = []

    def sql(self, s):
        self.calls.append(s)


def _tr(**kw):
    from mallarddv_spark.plans.model import TransitionRecord

    base = dict(
        source_table="customer", source_field="c_custkey",
        target_table="hub_customer", target_field="customer_bk",
        group_name="hk", position=1, raw=False, transformation=None,
        transfer_type="hub",
    )
    base.update(kw)
    return TransitionRecord(**base)


def test_hash_view_ddl_memo_skips_identical_reissue():
    from mallarddv_spark.operators.hashview import create_hash_view

    fake, issued = _SQLRecorder(), {}
    recs = [_tr()]
    sql1 = create_hash_view(fake, "stg", "customer", recs, issued=issued)
    sql2 = create_hash_view(fake, "stg", "customer", recs, issued=issued)
    assert sql1 == sql2
    assert len(fake.calls) == 1  # second call skipped the DDL round-trip
    # changed metadata (extra field ⇒ different view SQL) → re-issued
    recs2 = recs + [_tr(source_field="c_name", target_field="name", position=2)]
    assert create_hash_view(
        fake, "stg", "customer", recs2, issued=issued
    ) != sql1
    assert len(fake.calls) == 2
    # without a memo every call issues DDL (legacy behavior preserved)
    create_hash_view(fake, "stg", "customer", recs)
    assert len(fake.calls) == 3


def test_init_vault_clears_hash_view_memo(spark, tmp_path):
    """Re-initing the vault (catalog may be rebuilt) must re-issue view DDL
    even for byte-identical metadata."""
    import shutil

    from mallarddv_spark import MallardSparkVault

    fx = "tests/fixtures"
    dbs = dict(stg_db="hvm_stg", dv_db="hvm_dv", bv_db="hvm_bv",
               metadata_db="hvm_meta")
    for db in dbs.values():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    v = MallardSparkVault(spark, **dbs)
    assert v.init_vault(f"{fx}/tables.csv", f"{fx}/transitions.csv") == []
    assert v._executor.hashview_issued == {}
    assert v.execute_flow(
        "customer", "t", file_path=f"{fx}/customer.csv",
        load_date_overwrite="2025-01-01 00:00:00",
    ) == []
    assert "hvm_stg.customer" in v._executor.hashview_issued
    # re-init (drops nothing here, but contract: memo must reset)
    assert v.init_vault(f"{fx}/tables.csv", f"{fx}/transitions.csv") == []
    assert v._executor.hashview_issued == {}
    for db in dbs.values():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
