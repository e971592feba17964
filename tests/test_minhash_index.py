"""Persisted MinHash index: build → probe new batch → append, with parity
against the one-shot in-memory LSH pipeline at the same parameters."""

import os

import pytest

from mallarddv_spark.operators import dedup

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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


CRASH_SCRIPT = """
import os, sys
sys.path.insert(0, {repo!r})
from mallarddv_spark import get_spark
from mallarddv_spark.operators import dedup

spark = get_spark(master="local[4]", shuffle_partitions=4,
                  warehouse_dir={wh!r})
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
dedup.build_minhash_index(
    docs.filter("doc_id < 200"), {path!r},
    num_perm=32, bands=8, shingle_size=3, hash_mode="xxhash64")
dedup.minhash_index_append(docs.filter("doc_id >= 100 AND doc_id < 200"),
                           {path!r})

# die right after the FIRST rename of the swap (live -> __pre_compact):
# the worst torn state — no live sigs directory at all. The fault is
# injected at layout.dir_fs, the single FS seam the shared swap protocol
# (swap_dir_live) and all its callers go through.
from mallarddv_spark.sources import layout
_real = layout.dir_fs
class _KillAfterRename:
    def __init__(self, fs):
        self._fs = fs
    def exists(self, p):
        return self._fs.exists(p)
    def delete(self, p, rec):
        return self._fs.delete(p, rec)
    def rename(self, a, b):
        ok = self._fs.rename(a, b)
        os._exit(137)
def _patched(path_str):
    fs, p = _real(spark, path_str)
    return _KillAfterRename(fs), p
layout.dir_fs = lambda sp, d: _patched(d)
dedup.minhash_index_compact(spark, {path!r})
"""


def test_index_compact_crash_midswap_heals(spark, docs, tmp_path):
    """Kill the driver between rename-out and rename-in (real process
    death, à la test_crash_recovery): recover(minhash_index_paths=...)
    must restore a probe-able index identical to the pre-compact one, and
    re-running the compaction must complete."""
    import subprocess
    import sys

    from mallarddv_spark.api import MallardSparkVault

    path = str(tmp_path / "idx")
    script = CRASH_SCRIPT.format(
        repo=REPO, wh=str(tmp_path / "wh"), path=path
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode == 137, proc.stderr[-2000:]

    assert not os.path.exists(f"{path}/sigs"), "rename-out must have fired"
    assert os.path.exists(f"{path}/sigs__pre_compact")
    assert os.path.exists(f"{path}/sigs__compact")

    vault = MallardSparkVault(spark)
    assert vault.init_vault(
        os.path.join(REPO, "tests/fixtures/tables.csv"),
        os.path.join(REPO, "tests/fixtures/transitions.csv"),
    ) == []
    healed = vault.recover(minhash_index_paths=[path])
    assert healed.get(f"{path}/sigs (index compaction)") == "restored_backup"

    # the restored index is the pre-compact one: 300 sig rows (100 dup)
    assert spark.read.parquet(f"{path}/sigs").count() == 300
    probe = dedup.neardup_against_index(
        docs.filter("doc_id >= 480"), path, threshold=0.5
    ).collect()
    assert {r.index_id for r in probe} <= set(range(200))

    # the probe's heal-on-open already dropped the leftover staged dir
    assert not os.path.exists(f"{path}/sigs__compact")
    # re-running the compaction completes the interrupted job cleanly
    out = dedup.minhash_index_compact(spark, path)
    assert out["healed"] == {}
    assert out["sigs"]["rows_after"] == 200


def test_index_heal_other_states(spark, docs, tmp_path):
    """The two cheaper torn states: backup+live (crash before backup
    drop) → dropped_backup keeps the live copy; live+staged (crash during
    staged write) → dropped_staged. Probes self-heal on open."""
    path = str(tmp_path / "idx")
    dedup.build_minhash_index(
        docs.filter("doc_id < 100"), path, **PARAMS
    )
    Path = spark._jvm.org.apache.hadoop.fs.Path
    from mallarddv_spark.sources.layout import dir_fs

    fs, _ = dir_fs(spark, f"{path}/sigs")

    # backup + live: copy live to backup (rename then rename back a copy
    # is awkward — write a stale backup instead)
    spark.read.parquet(f"{path}/sigs").limit(10).write.parquet(
        f"{path}/sigs__pre_compact"
    )
    # live + staged
    spark.read.parquet(f"{path}/bands").limit(5).write.parquet(
        f"{path}/bands__compact"
    )

    # probe path heals on open
    got = dedup.neardup_against_index(
        docs.filter("doc_id >= 480"), path, threshold=0.5
    )
    got.count()
    assert not fs.exists(Path(f"{path}/sigs__pre_compact"))
    assert not fs.exists(Path(f"{path}/bands__compact"))
    assert spark.read.parquet(f"{path}/sigs").count() == 100
