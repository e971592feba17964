"""Salting utilities must be exactly equivalent to their unsalted forms."""

from pyspark.sql import functions as F

from mallarddv_spark.operators import skew


def test_salted_aggregate_equivalence(spark):
    # zipfian: key 'hot' owns 90% of rows
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        (F.col("id") % 100).alias("v"),
    )
    plain = {
        (r.k,): (r.n, r.s, r.mx)
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k,): (r.n, r.s, r.mx)
        for r in skew.salted_aggregate(
            df,
            ["k"],
            {"n": F.count("*"), "s": F.sum("v"), "mx": F.max("v")},
        ).collect()
    }
    assert plain == salted


def test_salted_join_equivalence(spark):
    facts = spark.range(5_000).select(
        F.when(F.col("id") % 5 < 4, 1).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("label")
    )
    plain = sorted(
        (r.fact_id, r.label) for r in facts.join(dim, "k").collect()
    )
    salted = sorted(
        (r.fact_id, r.label)
        for r in skew.salted_join(facts, dim, on="k", salt=8).collect()
    )
    assert plain == salted


def test_salted_join_rejects_outer(spark):
    """Right/full outer would emit one null-extended row per salt replica
    for unmatched small-side rows — the API refuses them (ADVICE r1)."""
    import pytest
    from mallarddv_spark.operators.skew import salted_join

    df = spark.range(4).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(df, df, on="k", how=how)
    # left joins remain accepted (unmatched skewed rows are safe: the
    # skewed side is salted, not replicated)
    assert salted_join(df, df.filter("k < 2"), on="k", how="left").count() == 4
