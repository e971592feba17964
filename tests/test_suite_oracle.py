"""Differential test: every suite query vs its DuckDB oracle at sf0.001 —
a local replica of the driver's correctness gate (row count + schema-width +
order-insensitive canonical value comparison)."""

import math
import os

import duckdb
import pytest

from mallarddv_spark.suite import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canon(value):
    """Canonical cell representation shared by both engines."""
    if value is None:
        return "NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return repr(value)
    if isinstance(value, bool):
        return str(bool(value))
    if hasattr(value, "isoformat"):  # datetime/date
        return value.isoformat(sep=" ") if hasattr(value, "hour") else value.isoformat()
    return str(value)


def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


_TYPE_CANON = {
    "bigint": "i64",
    "long": "i64",
    "integer": "i32",
    "int": "i32",
    "smallint": "i16",
    "double": "f64",
    "float": "f32",
    "varchar": "str",
    "string": "str",
    "boolean": "bool",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "date": "date",
    "hugeint": "i128",
}


def type_canon(t: str) -> str:
    t = str(t).lower()
    if t.startswith("decimal"):
        return "dec"
    if t.startswith("array<") and t.endswith(">"):  # spark array spelling
        return f"arr[{type_canon(t[6:-1])}]"
    if t.endswith("[]"):  # duckdb array spelling
        return f"arr[{type_canon(t[:-2])}]"
    return _TYPE_CANON.get(t, t)


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    fn, oracle = REGISTRY[name]
    sdf = fn(spark, SF_DIR)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    if oracle is None:
        assert len(s_rows) >= 0  # weaker rows-only check
        return

    rel = duck.sql(oracle)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column sets differ"
    s_types = {c.lower(): type_canon(t) for c, t in sdf.dtypes}
    d_types = {
        c.lower(): type_canon(t) for c, t in zip(rel.columns, rel.types)
    }
    assert s_types == d_types, f"{name}: column types differ: {s_types} vs {d_types}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} (spark) != {len(d_rows)} (duckdb)"
    )
    sc = rows_canon(s_cols, s_rows)
    dc = rows_canon(d_cols, d_rows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
