"""Driver-contract smoke: entry() runs and returns rows with a stable
schema; queries()/oracle_sql() keys line up."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"l_orderkey", "o_orderdate", "o_orderpriority", "revenue"}


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 46
    assert set(oracles) <= set(qs)
    # at least 85% of declared queries carry a full value-hash oracle
    assert len(oracles) / len(qs) >= 0.85
