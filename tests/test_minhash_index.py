"""Persisted MinHash index: build → probe new batch → append, with parity
against the one-shot in-memory LSH pipeline at the same parameters."""

import pytest

from mallarddv_spark.operators import dedup

SF = "/root/testdata/sf0.001"
PARAMS = dict(num_perm=32, bands=8, shingle_size=3, hash_mode="xxhash64")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def index_path(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mh") / "idx")
    info = dedup.build_minhash_index(
        docs.filter("doc_id < 400"), path, **PARAMS
    )
    assert info["bands"] == 8
    return path


def test_probe_finds_known_neardups(spark, docs, index_path):
    """Batch docs probed against the index recover the pairs the one-shot
    LSH pipeline finds across the same split (signature-estimate vs exact
    rerank differ, so compare at the candidate level with a low bar)."""
    batch = docs.filter("doc_id >= 400")
    got = dedup.neardup_against_index(
        batch, index_path, threshold=0.5
    ).collect()
    got_pairs = {(r.new_id, r.index_id) for r in got}
    assert all(a >= 400 and b < 400 for a, b in got_pairs)

    # ground truth: full-corpus LSH pairs at the same params, restricted
    # to cross-split pairs with high exact jaccard — every such pair whose
    # signatures agree strongly must be recovered by the index probe
    full = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, **PARAMS
    ).collect()
    cross = {
        (max(r.doc_a, r.doc_b), min(r.doc_a, r.doc_b))
        for r in full
        if (r.doc_a < 400) != (r.doc_b < 400) and r.jaccard >= 0.8
    }
    assert cross, "fixture must contain cross-split near-dups"
    missed = cross - got_pairs
    assert len(missed) <= len(cross) * 0.2, f"missed {missed}"


def test_append_then_self_probe(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    dedup.build_minhash_index(docs.filter("doc_id < 100"), path, **PARAMS)
    n0 = spark.read.parquet(f"{path}/sigs").count()
    batch = docs.filter("doc_id >= 100 AND doc_id < 150")
    dedup.minhash_index_append(batch, path)
    assert spark.read.parquet(f"{path}/sigs").count() == n0 + batch.count()

    # a doc probed against an index that now CONTAINS it must match itself
    # ... except identical ids are filtered; use a shifted-id copy instead
    from pyspark.sql import functions as F

    clone = batch.withColumn("doc_id", F.col("doc_id") + 100000)
    got = dedup.neardup_against_index(clone, path, threshold=0.99)
    hits = {(r.new_id - 100000, r.index_id) for r in got.collect()}
    expected_self = {(r.doc_id, r.doc_id) for r in batch.select("doc_id").collect()}
    assert expected_self <= hits  # est_jaccard = 1.0 for identical text


def test_append_uses_stored_params(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    dedup.build_minhash_index(docs.filter("doc_id < 50"), path, **PARAMS)
    p = dedup._minhash_index_params(spark, path)
    assert p["num_perm"] == 32 and p["hash_mode"] == "xxhash64"
    # sig width of appended rows matches the index, not any caller default
    dedup.minhash_index_append(docs.filter("doc_id = 55"), path)
    cols = spark.read.parquet(f"{path}/sigs").columns
    assert "sig_31" in cols and "sig_32" not in cols


def test_probe_broadcasts_batch_not_history(spark, docs, index_path):
    """Scale shape: both probe joins must be BroadcastHashJoins with the
    (small) batch side broadcast — the stored index streams through with
    no shuffle Exchange on its branch."""
    batch = docs.filter("doc_id >= 450")
    out = dedup.neardup_against_index(batch, index_path, threshold=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # the only shuffle exchanges allowed are on batch-derived branches
    # (signature aggregation over the new batch, candidate-pair dedup) —
    # never a shuffle whose source is an index scan. Batch-derived
    # shuffles partition on doc_id / new_id; an index-side shuffle would
    # partition on bh or index_id alone.
    import re

    shuffles = [
        ln for ln in plan.splitlines()
        if re.search(r"\bExchange (hash|range|SinglePartition)", ln)
    ]
    for ln in shuffles:
        assert "doc_id" in ln or "new_id" in ln, f"index-side shuffle: {ln}"


def test_index_compact_dedupes_reappends(spark, docs, tmp_path):
    """Re-appending the same batch doubles the index; compaction collapses
    it back to one row per doc (per band) and probes are unchanged."""
    path = str(tmp_path / "idx")
    base = docs.filter("doc_id < 200")
    dedup.build_minhash_index(base, path, **PARAMS)
    batch = docs.filter("doc_id >= 100 AND doc_id < 200")
    dedup.minhash_index_append(batch, path)  # 100 docs now stored twice

    probe_q = docs.filter("doc_id >= 480")
    before_probe = sorted(map(tuple, dedup.neardup_against_index(
        probe_q, path, threshold=0.5).collect()))

    out = dedup.minhash_index_compact(spark, path)
    assert out["sigs"]["rows_before"] == 300
    assert out["sigs"]["rows_after"] == 200
    assert out["bands"]["rows_after"] == 200 * PARAMS["bands"]

    after_probe = sorted(map(tuple, dedup.neardup_against_index(
        probe_q, path, threshold=0.5).collect()))
    assert after_probe == before_probe
