"""Property-based hash fidelity: the engine's Catalyst hash expression must
equal a pure-Python reference (hashlib) for arbitrary inputs — including
NULLs, empties, unicode, and the '||' separator appearing *inside* values."""

import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql.types import StringType, StructField, StructType

from mallarddv_spark.functions.hashing import hash_col

# Exclude characters whose upper() mapping differs between the JVM's and
# Python's Unicode tables: newly-added cased scripts (e.g. U+10D70 Garay,
# Unicode 16) gain case mappings in one runtime before the other. Keep the
# full BMP minus surrogates — that still covers NULLs, empties, '||' inside
# values, CJK, combining marks, and every realistically-keyed script.
text = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",), max_codepoint=0xFFFF
        ),
        max_size=40,
    ),
)


def ref_hash(fields):
    joined = "||".join("" if f is None else f for f in fields)
    return hashlib.sha1(joined.upper().encode("utf-8")).hexdigest()


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(text, text, text), min_size=1, max_size=40))
def test_hash_matches_hashlib(spark, rows):
    schema = StructType([StructField(c, StringType()) for c in ("a", "b", "c")])
    df = spark.createDataFrame(rows, schema)
    got = [
        r.hk for r in df.select(hash_col(["a", "b", "c"]).alias("hk")).collect()
    ]
    expected = [ref_hash(row) for row in rows]
    # spark may reorder partitions; compare as multisets aligned by input
    assert sorted(got) == sorted(expected)
