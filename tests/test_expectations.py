"""Data-quality expectations: every rule kind differentially checked
against DuckDB on the sf0.001 tables, plus plan-shape guarantees (one scan
for all row-level rules; no Expand)."""

import duckdb
import pytest

from pyspark.sql import functions as F

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.operators import expectations as E

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


@pytest.fixture(scope="module")
def customer(spark):
    return spark.read.parquet(f"{SF}/customer.parquet")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def test_report_matches_duckdb(spark, orders, customer, duck):
    report = E.run_expectations(
        orders,
        [
            E.expect_not_null("o_orderkey"),
            E.expect_unique("o_orderkey"),
            E.expect_in_range("o_totalprice", 0, 100_000),
            E.expect_in_set("o_orderstatus", ["O", "F", "P"]),
            E.expect_matches("o_orderpriority", r"^\d-[A-Z ]+$"),
            E.expect_ref("o_custkey", customer, "c_custkey"),
            E.expect_that(F.col("o_totalprice") > 0, "positive_price"),
        ],
    )
    got = {r.rule: (r.violations, r.total, r.passed) for r in report.collect()}
    total = duck.sql("SELECT count(*) FROM orders").fetchone()[0]

    exp = {
        "not_null(o_orderkey)": duck.sql(
            "SELECT count(*) FROM orders WHERE o_orderkey IS NULL"
        ).fetchone()[0],
        "unique(o_orderkey)": duck.sql(
            "SELECT count(*) - count(DISTINCT o_orderkey) FROM orders"
        ).fetchone()[0],
        "in_range(o_totalprice,0,100000)": duck.sql(
            "SELECT count(*) FROM orders WHERE o_totalprice IS NOT NULL "
            "AND (o_totalprice < 0 OR o_totalprice > 100000)"
        ).fetchone()[0],
        "in_set(o_orderstatus)": duck.sql(
            "SELECT count(*) FROM orders WHERE o_orderstatus IS NOT NULL "
            "AND o_orderstatus NOT IN ('O','F','P')"
        ).fetchone()[0],
        "matches(o_orderpriority)": duck.sql(
            "SELECT count(*) FROM orders WHERE o_orderpriority IS NOT NULL "
            "AND NOT regexp_matches(o_orderpriority, '^\\d-[A-Z ]+$')"
        ).fetchone()[0],
        "ref(o_custkey)": duck.sql(
            "SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL AND "
            "o_custkey NOT IN (SELECT c_custkey FROM customer)"
        ).fetchone()[0],
        # NULL predicate → NULL fail flag → uncounted, same as the SQL filter
        "positive_price": duck.sql(
            "SELECT count(*) FROM orders WHERE NOT (o_totalprice > 0)"
        ).fetchone()[0],
    }
    for rule, expected_v in exp.items():
        v, t, passed = got[rule]
        assert t == total, rule
        assert v == expected_v, f"{rule}: {v} != {expected_v}"
        assert passed == (expected_v == 0), rule
    # sanity: the dataset must actually exercise both outcomes
    assert any(p for _, _, p in got.values())
    assert any(not p for _, _, p in got.values())


def test_duplicate_and_orphan_counting(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (None, 30)], "k int, v int"
    )
    ref = spark.createDataFrame([(10,), (20,)], "rk int")
    report = E.run_expectations(
        df,
        [
            E.expect_unique("k"),
            E.expect_ref("v", ref, "rk"),
            E.expect_not_null("k"),
        ],
    )
    got = {r.rule: r.violations for r in report.collect()}
    assert got["unique(k)"] == 2  # three k=1 rows → 2 duplicates
    assert got["ref(v)"] == 3  # 11, 12, 30 unmatched
    assert got["not_null(k)"] == 1


def test_row_rules_are_single_scan(spark, orders):
    """All row-level rules share ONE aggregate over ONE scan: no Expand,
    no join, exactly one parquet relation in the plan."""
    rules = [
        E.expect_not_null("o_orderkey"),
        E.expect_in_range("o_totalprice", 0, 100_000),
        E.expect_in_set("o_orderstatus", ["O", "F", "P"]),
    ]
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.sum(r.fail.cast("long")).alias(f"__v{i}") for i, r in enumerate(rules)
    ]
    plan = orders.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan and "Join" not in plan
    assert plan.count("FileScan parquet") == 1


def test_empty_rules_rejected(spark, orders):
    from mallarddv_spark.exceptions import DVConfigurationError

    with pytest.raises(DVConfigurationError):
        E.run_expectations(orders, [])


def test_flow_quality_gate_blocks_bad_batch(spark):
    """A violated data contract aborts the flow before any DV load: the
    hub stays empty, the ledger records a failure, and a clean batch with
    the same contract loads normally."""
    from mallarddv_spark import MallardSparkVault

    dbs = dict(stg_db="qg_stg", dv_db="qg_dv", bv_db="qg_bv",
               metadata_db="qg_meta")
    for db in dbs.values():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    v = MallardSparkVault(spark, **dbs)
    assert v.init_vault("tests/fixtures/tables.csv",
                        "tests/fixtures/transitions.csv") == []

    contract = [E.expect_not_null("id"), E.expect_unique("id")]

    import csv
    import tempfile

    with tempfile.NamedTemporaryFile(
        "w", suffix=".csv", delete=False
    ) as fh:
        w = csv.writer(fh)
        w.writerow(["id", "first_name", "last_name", "email",
                    "created_date", "referenced_by", "reference_code"])
        w.writerow([7, "dup", "row", "d@x.io", "2025-01-01 00:00:00", "", ""])
        w.writerow([7, "dup", "row2", "d2@x.io", "2025-01-01 00:00:00", "", ""])
        bad = fh.name

    errs = v.execute_flow("customer", "qg", file_path=bad,
                          load_date_overwrite="2025-01-01 00:00:00",
                          expectations=contract)
    assert errs and errs[0][0] == "quality_gate"
    assert "unique(id)" in errs[0][1]
    assert spark.table("qg_dv.hub_customer").count() == 0
    ri = spark.table("qg_meta.runinfo").filter("status = 'failure'")
    assert ri.count() == 1

    errs = v.execute_flow("customer", "qg",
                          file_path="tests/fixtures/customer.csv",
                          load_date_overwrite="2025-01-02 00:00:00",
                          expectations=contract)
    assert errs == []
    assert spark.table("qg_dv.hub_customer").count() > 0
    for db in dbs.values():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_split_by_expectations(spark):
    """Dead-letter split: good keeps the original schema, bad rows carry
    the violated rule names; unique keeps exactly one row per key."""
    df = spark.createDataFrame(
        [(1, 10, "x"), (1, 11, "y"), (2, None, "z"), (3, 99, "w"), (None, 20, "v")],
        "k int, fk int, payload string",
    )
    ref = spark.createDataFrame([(10,), (11,), (20,)], "rk int")
    rules = [
        E.expect_not_null("k"),
        E.expect_unique("k"),
        E.expect_ref("fk", ref, "rk"),
    ]
    good, bad = E.split_by_expectations(df, rules)
    assert good.columns == df.columns
    assert bad.columns == df.columns + ["violated_rules"]

    good_rows = {(r.k, r.fk) for r in good.collect()}
    bad_rows = {(r.k, r.fk): r.violated_rules for r in bad.collect()}
    # k=1 duplicated → first (by fk,payload order) kept, second tagged;
    # k=2 has fk NULL (ref passes on NULL); k=3 fk=99 unmatched; k NULL tagged
    assert (1, 10) in good_rows and (2, None) in good_rows
    assert bad_rows[(1, 11)] == "unique(k)"
    assert bad_rows[(3, 99)] == "ref(fk)"
    assert bad_rows[(None, 20)] == "not_null(k)"
    assert good.count() + bad.count() == df.count()


def test_split_multiple_violations_tagged(spark):
    df = spark.createDataFrame([(None, -5)], "k int, v int")
    good, bad = E.split_by_expectations(
        df, [E.expect_not_null("k"), E.expect_in_range("v", 0, 10)]
    )
    assert good.count() == 0
    row = bad.collect()[0]
    assert row.violated_rules == "not_null(k);in_range(v,0,10)"


from hypothesis import given, settings, strategies as st

_vals = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(_vals, _vals), min_size=1, max_size=25))
def test_report_and_split_agree(spark, rows):
    """Property: for any data, the report's violation counts equal the
    per-rule tag counts in the split's bad side, and good+bad partition
    the input."""
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id int, k int, v int"
    )
    rules = [
        E.expect_not_null("k"),
        E.expect_in_range("v", -2, 2),
        E.expect_unique("k"),
    ]
    report = {r.rule: r.violations for r in E.run_expectations(df, rules).collect()}
    good, bad = E.split_by_expectations(df, rules)
    bad_rows = bad.collect()
    assert good.count() + len(bad_rows) == len(rows)
    for rule in report:
        tagged = sum(1 for r in bad_rows if rule in r.violated_rules.split(";"))
        assert tagged == report[rule], (rule, tagged, report[rule])


def test_flow_quarantine_mode_loads_good_rows(spark):
    """quarantine_table mode: violating rows land in the dead-letter table
    (with violated_rules + run id), the clean remainder loads normally."""
    from mallarddv_spark import MallardSparkVault

    dbs = dict(stg_db="qr_stg", dv_db="qr_dv", bv_db="qr_bv",
               metadata_db="qr_meta")
    for db in dbs.values():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql("DROP TABLE IF EXISTS default.qr_deadletter")
    v = MallardSparkVault(spark, **dbs)
    assert v.init_vault("tests/fixtures/tables.csv",
                        "tests/fixtures/transitions.csv") == []

    import csv
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as fh:
        w = csv.writer(fh)
        w.writerow(["id", "first_name", "last_name", "email",
                    "created_date", "referenced_by", "reference_code"])
        w.writerow([1, "ok", "row", "a@x.io", "2025-01-01 00:00:00", "", ""])
        w.writerow(["", "bad", "null-key", "b@x.io",
                    "2025-01-01 00:00:00", "", ""])
        w.writerow([2, "ok", "row2", "c@x.io", "2025-01-01 00:00:00", "", ""])
        path = fh.name

    errs = v.execute_flow(
        "customer", "qr", file_path=path,
        load_date_overwrite="2025-01-01 00:00:00",
        expectations=[E.expect_not_null("id")],
        quarantine_table="default.qr_deadletter",
    )
    assert errs == []
    # both clean business keys reached the hub (+ NULL ghost row)
    hub_bks = {r.id_bk for r in spark.table("qr_dv.hub_customer").collect()}
    assert {1, 2} <= hub_bks
    dead = spark.table("default.qr_deadletter").collect()
    assert len(dead) == 1
    assert dead[0].violated_rules == "not_null(id)"
    assert dead[0].quarantined_run_id == 1
    assert dead[0].quarantined_source == "customer"
    assert dead[0].quarantined_file == path
    # staging holds only the clean rows now
    assert spark.table("qr_stg.customer").count() == 2

    # replaying the SAME file (force_load, e.g. a retry after a crash
    # between quarantine append and ledger row) must REPLACE the file's
    # dead-letter rows, not duplicate them
    errs = v.execute_flow(
        "customer", "qr", file_path=path,
        load_date_overwrite="2025-01-01 00:00:00",
        expectations=[E.expect_not_null("id")],
        quarantine_table="default.qr_deadletter",
        force_load=True,
    )
    assert errs == []
    dead = spark.table("default.qr_deadletter").collect()
    assert len(dead) == 1
    assert dead[0].quarantined_run_id == 2

    for db in dbs.values():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql("DROP TABLE IF EXISTS default.qr_deadletter")


def test_duplicate_rule_names_rejected(spark):
    """Two rules sharing a name would alias each other's report counts
    and violated_rules tags — both entry points fail fast instead."""
    df = spark.range(3).selectExpr("id AS a", "id AS b")
    rules = [E.expect_that(F.col("a") < 0, "r"),
             E.expect_that(F.col("b") < 0, "r")]
    for fn in (E.run_expectations, E.split_by_expectations):
        with pytest.raises(DVConfigurationError, match="duplicate"):
            fn(df, rules)


def test_quarantine_nonfile_then_file_and_legacy_upgrade(spark):
    """Two found-in-review crashers: (1) a non-file flow quarantining
    first must not pin quarantined_file as VOID (later file flows would
    fail the cast); (2) a legacy dead-letter table created without the
    identity columns must be widened, not break the append."""
    from mallarddv_spark import MallardSparkVault

    dbs = dict(stg_db="qr2_stg", dv_db="qr2_dv", bv_db="qr2_bv",
               metadata_db="qr2_meta")
    for db in dbs.values():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    for t in ("default.qr2_dl", "default.qr2_legacy"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    v = MallardSparkVault(spark, **dbs)
    assert v.init_vault("tests/fixtures/tables.csv",
                        "tests/fixtures/transitions.csv") == []

    import csv
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as fh:
        w = csv.writer(fh)
        w.writerow(["id", "first_name", "last_name", "email",
                    "created_date", "referenced_by", "reference_code"])
        w.writerow([1, "ok", "row", "a@x.io", "2025-01-01 00:00:00", "", ""])
        w.writerow(["", "bad", "nokey", "b@x.io",
                    "2025-01-01 00:00:00", "", ""])
        path = fh.name

    # (1) non-file flow first: stage bad rows directly, no file_path
    spark.sql(
        "INSERT OVERWRITE qr2_stg.customer VALUES "
        "(3,'ok','row','c@x.io',timestamp'2025-01-01',NULL,NULL),"
        "(NULL,'bad','nokey','d@x.io',timestamp'2025-01-01',NULL,NULL)"
    )
    assert v.execute_flow(
        "customer", "qr2",
        load_date_overwrite="2025-01-01 00:00:00",
        expectations=[E.expect_not_null("id")],
        quarantine_table="default.qr2_dl",
    ) == []
    assert dict(spark.table("default.qr2_dl").dtypes)[
        "quarantined_file"
    ] == "string"
    # then a FILE flow into the same table must append cleanly
    assert v.execute_flow(
        "customer", "qr2", file_path=path,
        load_date_overwrite="2025-01-02 00:00:00",
        expectations=[E.expect_not_null("id")],
        quarantine_table="default.qr2_dl",
    ) == []
    assert spark.table("default.qr2_dl").count() == 2

    # (2) legacy table: only the pre-upgrade columns
    stg_cols = spark.table("qr2_stg.customer")
    stg_cols.limit(0).selectExpr(
        "*", "'x' AS violated_rules", "0 AS quarantined_run_id"
    ).write.saveAsTable("default.qr2_legacy")
    assert v.execute_flow(
        "customer", "qr2", file_path=path, force_load=True,
        load_date_overwrite="2025-01-03 00:00:00",
        expectations=[E.expect_not_null("id")],
        quarantine_table="default.qr2_legacy",
    ) == []
    legacy = spark.table("default.qr2_legacy")
    assert "quarantined_file" in legacy.columns
    assert legacy.count() == 1

    for db in dbs.values():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    for t in ("default.qr2_dl", "default.qr2_legacy"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_purge_keeps_null_identity_rows(spark):
    """A file-replay purge must not touch dead-letter rows whose identity
    columns are NULL (legacy pre-widening rows, non-file flows): a plain
    `==` predicate evaluates NULL for them and `.filter(~mine)` would
    silently drop them — audit-history loss. The purge matches
    null-safely, so they survive."""
    from mallarddv_spark import MallardSparkVault

    dbs = dict(stg_db="qr3_stg", dv_db="qr3_dv", bv_db="qr3_bv",
               metadata_db="qr3_meta")
    for db in dbs.values():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql("DROP TABLE IF EXISTS default.qr3_dl")
    v = MallardSparkVault(spark, **dbs)
    assert v.init_vault("tests/fixtures/tables.csv",
                        "tests/fixtures/transitions.csv") == []

    import csv
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as fh:
        w = csv.writer(fh)
        w.writerow(["id", "first_name", "last_name", "email",
                    "created_date", "referenced_by", "reference_code"])
        w.writerow([1, "ok", "row", "a@x.io", "2025-01-01 00:00:00", "", ""])
        w.writerow(["", "bad", "nokey", "b@x.io",
                    "2025-01-01 00:00:00", "", ""])
        path = fh.name

    # non-file flow quarantines first → its dead-letter row carries
    # quarantined_file = NULL
    spark.sql(
        "INSERT OVERWRITE qr3_stg.customer VALUES "
        "(3,'ok','row','c@x.io',timestamp'2025-01-01',NULL,NULL),"
        "(NULL,'bad','nokey','d@x.io',timestamp'2025-01-01',NULL,NULL)"
    )
    assert v.execute_flow(
        "customer", "qr3",
        load_date_overwrite="2025-01-01 00:00:00",
        expectations=[E.expect_not_null("id")],
        quarantine_table="default.qr3_dl",
    ) == []
    # then a file flow, run twice (the retry purges the file's rows)
    for _ in range(2):
        assert v.execute_flow(
            "customer", "qr3", file_path=path, force_load=True,
            load_date_overwrite="2025-01-02 00:00:00",
            expectations=[E.expect_not_null("id")],
            quarantine_table="default.qr3_dl",
        ) == []
    dead = spark.table("default.qr3_dl").collect()
    # one NULL-file row (survived both purges) + ONE file row (replaced)
    assert len(dead) == 2
    by_file = {r.quarantined_file for r in dead}
    assert by_file == {None, path}
    null_row = [r for r in dead if r.quarantined_file is None][0]
    assert null_row.quarantined_run_id == 1

    for db in dbs.values():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql("DROP TABLE IF EXISTS default.qr3_dl")
