"""literal_frame must be indistinguishable from createDataFrame for the
control-plane frames it replaces — same schema (incl. nullability), same
values — while never scheduling Python workers (it is pure Catalyst
literals over a 1-partition range)."""

import datetime

import pytest

from mallarddv_spark.functions.litframe import literal_frame


CASES = [
    (
        [([[1.0, 2.0], [3.0, 4.0]], 2, "x")],
        "cb array<array<double>>, m int, tag string",
    ),
    (
        [(1, None, "a", datetime.datetime(2025, 1, 1)), (2, 3.5, None, None)],
        "id bigint, x double, s string, ts timestamp",
    ),
    (
        [([1, 2, 9223372036854775807], True, 64)],
        "bits array<bigint>, flag boolean, m bigint",
    ),
    ([(0, [0.5]), (1, [-0.25])], "centroid_id bigint, centroid array<double>"),
]


@pytest.mark.parametrize("rows,schema", CASES)
def test_literal_frame_matches_create_dataframe(spark, rows, schema):
    lf = literal_frame(spark, rows, schema)
    ref = spark.createDataFrame(rows, schema)
    assert lf.schema == ref.schema
    assert sorted(map(tuple, lf.collect())) == sorted(map(tuple, ref.collect()))


def test_literal_frame_struct_type_schema(spark):
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType,
    )

    st = StructType(
        [StructField("a", IntegerType()), StructField("b", StringType())]
    )
    lf = literal_frame(spark, [(1, "x")], st)
    ref = spark.createDataFrame([(1, "x")], st)
    assert lf.schema == ref.schema and lf.collect() == ref.collect()


def test_literal_frame_no_python_stages(spark):
    from mallarddv_spark.plans.audit import plan_report

    lf = literal_frame(spark, [(1, [1.0, 2.0])], "id int, v array<double>")
    rep = plan_report(lf)
    assert rep["python_stages"] == 0


def test_literal_frame_width_mismatch(spark):
    with pytest.raises(ValueError, match="row width"):
        literal_frame(spark, [(1, 2, 3)], "a int, b int")
