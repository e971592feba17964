"""The materialize_current scale mode must produce byte-identical satellite
history AND keep dv.{sat}_current equal to the logical current view through
the full lifecycle (updates, tombstones, resurrection)."""

import os

import pytest

from mallarddv_spark.api import MallardSparkVault
from mallarddv_spark.sources.catalog import drop_vault

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

D1, D2, D3 = (
    "2025-01-01 00:00:00",
    "2025-01-02 00:00:00",
    "2025-01-03 00:00:00",
)


def _set_products(spark, rows):
    values = ",".join(f"({i},'{n}','{d}')" for i, n, d in rows)
    spark.sql(f"INSERT OVERWRITE stg.product VALUES {values}")


def _assert_current_matches_cv(spark):
    cv = sorted(
        map(tuple, spark.table("bv.hsat_product_details_cv").collect())
    )
    cur = sorted(
        map(
            tuple,
            spark.table("dv.hsat_product_details_current")
            .select(spark.table("bv.hsat_product_details_cv").columns)
            .collect(),
        )
    )
    assert cv == cur


@pytest.fixture(scope="module")
def vault(spark):
    drop_vault(spark)
    v = MallardSparkVault(spark, materialize_current=True)
    assert v.init_vault(
        os.path.join(FIXTURES, "tables.csv"),
        os.path.join(FIXTURES, "transitions.csv"),
    ) == []
    return v


def test_lifecycle_with_materialized_current(vault, spark):
    sat = "dv.hsat_product_details"

    _set_products(spark, [(1, "widget ", "d1"), (2, "gadget", "d2")])
    assert vault.execute_flow("product", "erp", load_date_overwrite=D1) == []
    assert spark.table(sat).count() == 2
    _assert_current_matches_cv(spark)

    # update + delete
    _set_products(spark, [(1, "widget2", "d1")])
    assert vault.execute_flow("product", "erp", load_date_overwrite=D2) == []
    assert spark.table(sat).count() == 4  # new version + tombstone
    _assert_current_matches_cv(spark)
    cur = {r.product_hk: r for r in spark.table(sat + "_current").collect()}
    assert any(r.del_flag for r in cur.values())  # tombstone is current for gadget

    # resurrection: gadget returns identically → must re-insert (latest was
    # deleted), proving the current-table probe preserves del_flag semantics
    _set_products(spark, [(1, "widget2", "d1"), (2, "gadget", "d2")])
    assert vault.execute_flow("product", "erp", load_date_overwrite=D3) == []
    assert spark.table(sat).filter(f"load_dts = timestamp'{D3}'").count() == 1
    _assert_current_matches_cv(spark)
