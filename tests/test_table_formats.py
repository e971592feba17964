"""Lake table-format readiness: these tests light up automatically when the
container ships delta-spark / iceberg jars (same pattern as the PIL-gated
multimodal decode test). On plain parquet they skip, documenting exactly
what switches over:

* staging truncate-and-load overwrite becomes ACID;
* ``recover()`` / ``rollback_run`` become ``DELETE WHERE run_id`` instead
  of the parquet compensation pass (`flow/recovery.py`).
"""

import pytest


def _format_available(spark, fmt: str) -> bool:
    try:
        spark.sql(f"CREATE TABLE fmt_probe_{fmt} (i INT) USING {fmt}")
        spark.sql(f"DROP TABLE fmt_probe_{fmt}")
        return True
    except Exception:
        return False


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_vault_tables_on_lake_format(spark, fmt):
    if not _format_available(spark, fmt):
        pytest.skip(f"{fmt} datasource not on the classpath")
    # minimal vault-shaped lifecycle on the lake format: create, append
    # twice, delete one run's rows transactionally — the exact operations
    # recover()/rollback_run would issue
    t = f"default.lake_{fmt}_sat"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.sql(
        f"CREATE TABLE {t} (hk STRING, run_id INT, v STRING) USING {fmt}"
    )
    spark.sql(f"INSERT INTO {t} VALUES ('a', 1, 'x'), ('b', 1, 'y')")
    spark.sql(f"INSERT INTO {t} VALUES ('a', 2, 'x2')")
    spark.sql(f"DELETE FROM {t} WHERE run_id = 2")
    rows = {(r.hk, r.run_id) for r in spark.table(t).collect()}
    assert rows == {("a", 1), ("b", 1)}
    spark.sql(f"DROP TABLE {t}")
