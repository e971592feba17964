"""Expression-built Bloom filter primitives (functions/bloom.py):
membership guarantees, false-positive bound, persistence round-trip, and
the stored-filter decontamination path."""

import pytest
from pyspark.sql import Row, functions as F

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.functions import bloom as B


def test_bloom_membership_and_fpp(spark):
    members = spark.range(0, 2000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("v")
    )
    bloom = B.build_bloom(members, "v", fpp=1e-4)
    geo = bloom.first()
    probes = spark.range(0, 40000).select(
        F.when(F.col("id") < 2000, F.concat(F.lit("key_"), F.col("id")))
        .otherwise(F.concat(F.lit("other_"), F.col("id")))
        .alias("v")
    )
    got = probes.crossJoin(F.broadcast(bloom.select("__bloom"))).select(
        "v",
        B.bloom_contains(
            F.col("v"), F.col("__bloom"), int(geo.m), int(geo.n_hashes)
        ).alias("hit"),
    )
    # every member hits (no false negatives)
    assert got.filter("v like 'key_%' AND NOT hit").count() == 0
    # non-members false-positive well under 100x the target rate
    fp = got.filter("v like 'other_%' AND hit").count()
    assert fp <= 38000 * 1e-4 * 100, fp


def test_bloom_save_load_roundtrip(spark, tmp_path):
    members = spark.createDataFrame([Row(v="alpha"), Row(v="beta")])
    path = str(tmp_path / "bf")
    B.save_bloom(B.build_bloom(members, "v", fpp=1e-6), path)
    loaded, params = B.load_bloom(spark, path)
    assert params["n_items"] == 2 and params["m"] % 64 == 0
    probes = spark.createDataFrame(
        [Row(v="alpha"), Row(v="beta"), Row(v="gamma"), Row(v="delta")]
    )
    got = {
        r.v: r.hit
        for r in probes.crossJoin(F.broadcast(loaded))
        .select(
            "v",
            B.bloom_contains(
                F.col("v"), F.col("__bloom"), params["m"], params["n_hashes"]
            ).alias("hit"),
        )
        .collect()
    }
    assert got["alpha"] and got["beta"]
    assert not got["gamma"] and not got["delta"]


def test_bloom_param_validation(spark):
    with pytest.raises(DVConfigurationError):
        B.bloom_params(10, 0.0)
    with pytest.raises(DVConfigurationError):
        B.bloom_params(10, 1.0)
    p = B.bloom_params(0, 0.01)  # degenerate input still yields a filter
    assert p["n_words"] >= 1 and p["n_hashes"] >= 1


def test_bloom_merge_and_append(spark, tmp_path):
    """Same-geometry filters OR together; a stored filter absorbs new
    batches in place without losing old members."""
    a_vals = spark.range(0, 500).select(
        F.concat(F.lit("a_"), F.col("id")).alias("v")
    )
    b_vals = spark.range(0, 500).select(
        F.concat(F.lit("b_"), F.col("id")).alias("v")
    )
    # common geometry via expected_items (sized for the eventual union)
    a = B.build_bloom(a_vals, "v", fpp=1e-5, expected_items=1000)
    b = B.build_bloom(b_vals, "v", fpp=1e-5, expected_items=1000)
    merged = B.merge_blooms(a, b)
    g = merged.first()
    assert g.n_items == 2000  # upper bound: both sides' recorded counts
    probes = a_vals.unionByName(b_vals)
    hit = probes.crossJoin(F.broadcast(merged.select("__bloom"))).select(
        B.bloom_contains(
            F.col("v"), F.col("__bloom"), int(g.m), int(g.n_hashes)
        ).alias("hit")
    )
    assert hit.filter("NOT hit").count() == 0

    # geometry mismatch refuses rather than probing wrong bits
    import pytest as _pt
    tiny = B.build_bloom(b_vals, "v", fpp=1e-5, expected_items=10)
    with _pt.raises(DVConfigurationError):
        B.merge_blooms(a, tiny)

    # stored append: old and new members both present after the rewrite
    path = str(tmp_path / "grow")
    B.save_bloom(a, path)
    geo = B.bloom_append(spark, path, b_vals, "v")
    assert geo["n_items"] == 1500  # stored bound 1000 + 500 new distinct
    loaded, params = B.load_bloom(spark, path)
    hit2 = probes.crossJoin(F.broadcast(loaded)).select(
        B.bloom_contains(
            F.col("v"), F.col("__bloom"), params["m"], params["n_hashes"]
        ).alias("hit")
    )
    assert hit2.filter("NOT hit").count() == 0


def test_stored_bloom_decontamination_matches_inline(spark, tmp_path):
    """build once → save → reload → per-batch probe gives the same
    verdicts as the one-shot operator (the streaming-crawl shape)."""
    from mallarddv_spark.operators.curation import (
        build_benchmark_bloom,
        decontaminate_bloom,
        decontaminate_with_bloom,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train = docs.filter("doc_id < 200")
    bench = docs.filter("doc_id >= 450")
    path = str(tmp_path / "bench_bloom")
    B.save_bloom(
        build_benchmark_bloom(bench, "doc_id", "text", shingle_size=5), path
    )
    stored = decontaminate_with_bloom(
        train, spark.read.parquet(path), "doc_id", "text"
    )
    inline = decontaminate_bloom(
        train, bench, "doc_id", "text", shingle_size=5
    )
    s = {r.doc_id: r.n_hit_shingles for r in stored.collect()}
    i = {r.doc_id: r.n_hit_shingles for r in inline.collect()}
    assert s == i and any(v > 0 for v in s.values())


from hypothesis import given, settings, strategies as st

_val = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    min_size=0, max_size=40,
)


@settings(max_examples=6, deadline=None)
@given(
    members=st.lists(_val, min_size=1, max_size=60, unique=True),
    others=st.lists(_val, min_size=0, max_size=30, unique=True),
    fpp=st.sampled_from([1e-3, 1e-6]),
)
def test_bloom_never_false_negative_property(spark, members, others, fpp):
    """Fuzzed guarantee: EVERY inserted value probes true, for arbitrary
    unicode values and either fpp — a false negative at any geometry
    would silently pass contaminated documents through the gate."""
    mdf = spark.createDataFrame([(v,) for v in members], "v string")
    bloom = B.build_bloom(mdf, "v", fpp=fpp)
    geo = bloom.first()
    probes = spark.createDataFrame(
        [(v,) for v in members + [o for o in others if o not in members]],
        "v string",
    )
    got = {
        r.v: r.hit
        for r in probes.crossJoin(F.broadcast(bloom.select("__bloom")))
        .select("v", B.bloom_contains(
            F.col("v"), F.col("__bloom"), int(geo.m), int(geo.n_hashes)
        ).alias("hit"))
        .collect()
    }
    missed = [v for v in members if not got[v]]
    assert not missed, missed
