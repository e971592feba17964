"""sat_full lifecycle: change detection, tombstones, delete/reinsert cycles,
transformations and raw-literal business keys.

Reproduces the empirically verified reference behavior in SURVEY.md §8.4/§8.5:
v1 {widget, gadget} → v2 {widget2} (gadget deleted, widget renamed) →
v3 {widget2, gadget} (gadget reinstated identically).
"""

import os

import pytest

from mallarddv_spark.api import MallardSparkVault
from mallarddv_spark.sources.catalog import drop_vault

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

# sha1(upper('1||base_product')) — raw literal participates uppercased
HUB_PRODUCT_HK_1 = "ec1adced2ea12fe7222890d015d6cf5c5d06848e"

D1, D2, D3, D4 = (
    "2025-01-01 00:00:00",
    "2025-01-02 00:00:00",
    "2025-01-03 00:00:00",
    "2025-01-04 00:00:00",
)


def _set_products(spark, rows):
    values = ",".join(f"({i},'{n}','{d}')" for i, n, d in rows)
    spark.sql(f"INSERT OVERWRITE stg.product VALUES {values}")


@pytest.fixture(scope="module")
def vault(spark):
    drop_vault(spark)
    v = MallardSparkVault(spark)
    assert v.init_vault(
        os.path.join(FIXTURES, "tables.csv"),
        os.path.join(FIXTURES, "transitions.csv"),
    ) == []
    return v


def test_full_lifecycle(vault, spark):
    sat = "dv.hsat_product_details"

    # --- v1: two products; note trailing space on 'widget ' (trim transform)
    _set_products(spark, [(1, "widget ", "desc one"), (2, "gadget", "desc two")])
    assert vault.execute_flow("product", "erp", load_date_overwrite=D1) == []

    hub = {r.id_cbk: r for r in spark.table("dv.hub_product").collect()}
    assert hub[1].product_hk == HUB_PRODUCT_HK_1
    assert hub[1].product_type_cbk == "base_product"  # raw literal stored verbatim

    v1 = spark.table(sat).collect()
    assert len(v1) == 2
    stored = {r.name for r in v1}
    assert "widget" in stored  # trim applied to stored value, not just hash
    hd_gadget_v1 = next(r.hash_diff for r in v1 if r.name == "gadget")

    # --- v2: widget renamed, gadget gone → 1 new version + 1 tombstone
    _set_products(spark, [(1, "widget2", "desc one")])
    assert vault.execute_flow("product", "erp", load_date_overwrite=D2) == []
    v2 = spark.table(sat).filter(f"load_dts = timestamp'{D2}'").collect()
    assert len(v2) == 2
    tomb = next(r for r in v2 if r.del_flag)
    assert tomb.name == "gadget"          # tombstone carries forward payload
    assert tomb.hash_diff == hd_gadget_v1  # ...and the old hash_diff
    renamed = next(r for r in v2 if not r.del_flag)
    assert renamed.name == "widget2"

    # --- v3: gadget reinstated identically → re-inserted (latest was deleted)
    _set_products(spark, [(1, "widget2", "desc one"), (2, "gadget", "desc two")])
    assert vault.execute_flow("product", "erp", load_date_overwrite=D3) == []
    v3 = spark.table(sat).filter(f"load_dts = timestamp'{D3}'").collect()
    assert len(v3) == 1
    assert v3[0].name == "gadget" and not v3[0].del_flag
    assert v3[0].hash_diff == hd_gadget_v1  # same content, same diff

    # --- v4: unchanged reload → inserts nothing (idempotent)
    assert vault.execute_flow("product", "erp", load_date_overwrite=D4) == []
    assert spark.table(sat).filter(f"load_dts = timestamp'{D4}'").count() == 0

    # --- current view: latest version per key, tombstones excluded-if-superseded
    cv = {r.product_hk: r for r in spark.table("bv.hsat_product_details_cv").collect()}
    assert len(cv) == 2
    assert not cv[HUB_PRODUCT_HK_1].del_flag
    assert cv[HUB_PRODUCT_HK_1].name == "widget2"
