"""Hash fidelity unit tests — golden SHA1 values verified by executing the
reference system (SURVEY.md §8.3 / BASELINE.md anchors)."""

from pyspark.sql import functions as F

from mallarddv_spark.functions.hashing import (
    apply_transformation,
    hash_col,
    hash_sql,
    quote_ident,
)

SHA1_1 = "356a192b7913b04c54574d18c28d46e6395428ab"  # sha1(upper('1'))
SHA1_EMPTY = "da39a3ee5e6b4b0d3255bfef95601890afd80709"  # sha1('')
SHA1_LINK = "0608f581ad01df70cb0a4a87cbd19319e9d1c23b"  # sha1('1||||')


def test_hash_sql_single_field(spark):
    df = spark.sql(f"SELECT {hash_sql(['v'], alias='hk')} FROM (SELECT '1' AS v)")
    assert df.collect()[0].hk == SHA1_1


def test_hash_null_coalesces_to_empty(spark):
    df = spark.sql(
        f"SELECT {hash_sql(['v'], alias='hk')} FROM (SELECT cast(NULL as string) AS v)"
    )
    assert df.collect()[0].hk == SHA1_EMPTY


def test_hash_multi_field_null_legs(spark):
    # link hash with NULL legs: sha1(upper('1||||'))
    df = spark.sql(
        f"SELECT {hash_sql(['a', 'b', 'c'], alias='hk')} "
        "FROM (SELECT 1 AS a, cast(NULL as int) AS b, cast(NULL as int) AS c)"
    )
    assert df.collect()[0].hk == SHA1_LINK


def test_hash_uppercases_input(spark):
    # sha1(upper('jane||smith||jane.smith@example.com'))
    df = spark.sql(
        f"SELECT {hash_sql(['f', 'l', 'e'], alias='hd')} FROM "
        "(SELECT 'jane' AS f, 'smith' AS l, 'jane.smith@example.com' AS e)"
    )
    assert df.collect()[0].hd == "9f7934d5f2a7b1c757c19e7cab74abf74866a129"


def test_hash_col_matches_hash_sql(spark):
    df = (
        spark.range(1)
        .select(F.lit("1").alias("v"))
        .select(hash_col(["v"]).alias("hk"))
    )
    assert df.collect()[0].hk == SHA1_1


def test_hash_col_md5_algo(spark):
    df = spark.range(1).select(F.lit("1").alias("v")).select(
        hash_col(["v"], algo="md5").alias("hk")
    )
    # md5(upper('1')) — 32-char hex
    assert len(df.collect()[0].hk) == 32


def test_apply_transformation():
    assert apply_transformation("name", "trim(#)") == "trim(name)"
    assert apply_transformation("name", None) == "name"
    assert apply_transformation("x", "upper(trim(#)) || '#'") == "upper(trim(x)) || 'x'"


def test_quote_ident():
    assert quote_ident("plain_name") == "plain_name"
    assert quote_ident("has space") == "`has space`"
    assert quote_ident("1leading") == "`1leading`"


def test_quote_ident_empty_and_keywords():
    """Empty names must not crash (ADVICE r1) and SQL keywords must be
    quoted so generated DDL/hash-view SQL stays parseable."""
    assert quote_ident("") == "``"
    assert quote_ident("order") == "`order`"
    assert quote_ident("FROM") == "`FROM`"
    assert quote_ident("select") == "`select`"
    # non-keyword plain names still pass through bare
    assert quote_ident("order_id") == "order_id"


def test_subsecond_timestamp_hash_fidelity(spark):
    """SURVEY §7 hard-part #1: `cast(ts as string)` must render identically
    to DuckDB's `::varchar` for EVERY fractional-second shape, or every
    hash key over a timestamp column diverges. Differential over the
    tricky shapes: full micros, trailing-zero trimming, whole seconds,
    single leading micro, and TIMESTAMP_NTZ."""
    import duckdb

    shapes = [
        "2023-01-01 10:00:00.123456",
        "2023-01-01 10:00:00.100000",
        "2023-01-01 10:00:00",
        "2023-01-01 10:00:00.000001",
        "2023-01-01 10:00:00.120000",
    ]
    from mallarddv_spark.functions.hashing import hash_sql

    expr = hash_sql(["ts"], algo="md5")
    for ntz in (False, True):
        t = "timestamp_ntz" if ntz else "timestamp"
        spark_rows = spark.sql(
            "SELECT " + expr + " AS h FROM VALUES "
            + ", ".join(f"({t} '{s}')" for s in shapes) + " AS v(ts)"
        ).collect()
        duck_rows = duckdb.sql(
            "SELECT md5(upper(concat_ws('||', coalesce(cast(ts as varchar), '')))) AS h "
            "FROM (VALUES " + ", ".join(f"(timestamp '{s}')" for s in shapes)
            + ") AS v(ts)"
        ).fetchall()
        assert [r.h for r in spark_rows] == [r[0] for r in duck_rows], (
            f"ntz={ntz}: timestamp cast rendering diverged"
        )


def test_scalar_cast_fidelity_matrix(spark):
    """Cross-engine `cast(x as string)` parity for every hashable scalar
    type — plus a canary pinning the KNOWN divergence (double >= 1e7
    renders scientific in Spark, plain in DuckDB; documented in
    functions/hashing.py: cast floats to decimal before hashing). If an
    engine upgrade changes either side, this test says so."""
    import duckdb

    exprs = [
        ("cast(42 as string)", "cast(42 as varchar)"),
        ("cast(true as string)", "cast(true as varchar)"),
        ("cast(false as string)", "cast(false as varchar)"),
        ("cast(cast(1.50 as decimal(10,2)) as string)",
         "cast(cast(1.50 as decimal(10,2)) as varchar)"),
        ("cast(cast(0.1 as double) as string)",
         "cast(cast(0.1 as double) as varchar)"),
        ("cast(cast(-0.0 as double) as string)",
         "cast(cast(-0.0 as double) as varchar)"),
        ("cast(date '2023-02-01' as string)",
         "cast(date '2023-02-01' as varchar)"),
        ("cast(cast(1.5 as float) as string)",
         "cast(cast(1.5 as float) as varchar)"),
    ]
    got_s = spark.sql(
        "SELECT " + ", ".join(f"{s} AS c{i}" for i, (s, _) in enumerate(exprs))
    ).collect()[0]
    got_d = duckdb.sql(
        "SELECT " + ", ".join(f"{d} AS c{i}" for i, (_, d) in enumerate(exprs))
    ).fetchone()
    assert list(got_s) == list(got_d)

    # canary: the double>=1e7 divergence must stay KNOWN, not silent
    s_big = spark.sql("SELECT cast(cast(1e7 as double) as string) AS v").first().v
    d_big = duckdb.sql("SELECT cast(cast(1e7 as double) as varchar)").fetchone()[0]
    assert s_big == "1.0E7" and d_big == "10000000.0"
