"""Margin-based alignment mining (operators/alignment): hand-computed
margins, mutual filtering, planted-correspondence recovery on the real
embeddings, ANN-kNN pluggability, 1:1 extraction, plan pins."""

import pytest
from pyspark.sql import functions as F

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.operators import alignment as al

SF = "/root/testdata/sf0.001"


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_margin_hand_computed(spark):
    """Two obvious pairs plus a hub vector: margins match the closed
    form and the hub pair scores ~1."""
    src = _vecs(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    tgt = _vecs(spark, [(10, [1.0, 0.1]), (20, [0.1, 1.0])])
    got = {(r.src_id, r.tgt_id): r for r in al.margin_knn_pairs(
        src, tgt, k=2, mutual=False).collect()}
    # every query sees both targets (k=2), so avg_fwd/avg_bwd are the
    # mean of the two cosines; the aligned pair's margin must beat 1,
    # the crossed pair's must sit below 1
    assert got[(1, 10)].margin > 1.0 > got[(1, 20)].margin
    assert got[(2, 20)].margin > 1.0 > got[(2, 10)].margin
    # closed form for (1, 10): cos=0.995037; afwd(1)=(0.995037+0.099504)/2
    # abwd(10)=(0.995037+0.099504)/2 -> margin = cos/0.547271
    assert abs(got[(1, 10)].margin - round(0.995037 / 0.5472705, 6)) < 1e-5


def test_mutual_filter_drops_asymmetric_hits(spark):
    """A target vector that is everyone's neighbor (hub) but whose own
    top-k points elsewhere is dropped by the mutual intersection."""
    src = _vecs(spark, [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])])
    tgt = _vecs(spark, [
        (10, [1.0, 0.05, 0.0]),   # true partner of 1
        (20, [0.05, 1.0, 0.0]),   # true partner of 2
        (30, [0.6, 0.6, 0.0]),    # hub: near both sources
    ])
    all_pairs = al.margin_knn_pairs(src, tgt, k=1, mutual=False)
    mut = al.margin_knn_pairs(src, tgt, k=1, mutual=True)
    # with k=1 the forward pass maps each src to its best target; the
    # mutual pass keeps only reciprocated bests
    assert {(r.src_id, r.tgt_id) for r in mut.collect()} <= {
        (r.src_id, r.tgt_id) for r in all_pairs.collect()
    }
    assert {(r.src_id, r.tgt_id) for r in mut.collect()} == {(1, 10), (2, 20)}


def test_planted_correspondence_recovered(spark):
    """The end-to-end mining claim on real embeddings: tgt = src copies
    under shifted ids; mutual margin mining + 1:1 extraction recovers
    the identity alignment exactly, with margins well above the
    paper's ~1.05 operating threshold."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        "vec_id < 40"
    ).select("vec_id", "embedding")
    tgt = emb.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    pairs = al.margin_knn_pairs(emb, tgt, k=4, mutual=True)
    best = al.best_alignment(pairs)
    got = {(r.src_id, r.tgt_id): r.margin for r in best.collect()}
    assert got.keys() == {(i, i + 1000) for i in range(40)}
    assert min(got.values()) > 1.05
    # 1:1: no id repeats
    assert len({s for s, _ in got}) == 40 and len({t for _, t in got}) == 40


def test_ann_knn_plugs_in(spark):
    """Any kNN with the (query_id, neighbor_id, rank, cosine) shape
    substitutes for the exact brute force — the corpus-scale path."""
    from mallarddv_spark.operators.similarity import hyperplane_lsh_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        "vec_id < 30"
    ).select("vec_id", "embedding")
    tgt = emb.select((F.col("vec_id") + 500).alias("vec_id"), "embedding")

    def ann(q, c, id_col="vec_id", vec_col="embedding", k=4):
        return hyperplane_lsh_topk(
            q, c, id_col=id_col, vec_col=vec_col, k=k, num_bits=16, bands=8
        )

    best = al.best_alignment(
        al.margin_knn_pairs(emb, tgt, k=4, knn=ann, mutual=True)
    )
    got = {(r.src_id, r.tgt_id) for r in best.collect()}
    # LSH recall is high on identical-copy pairs; require near-complete
    assert len(got & {(i, i + 500) for i in range(30)}) >= 27


def test_guards_and_plan(spark):
    from mallarddv_spark.plans.audit import plan_report

    src = _vecs(spark, [(1, [1.0, 0.0])])
    with pytest.raises(DVConfigurationError, match="k must be"):
        al.margin_knn_pairs(src, src, k=0)
    pairs = al.margin_knn_pairs(src, src, k=1, mutual=False)
    assert plan_report(pairs)["python_stages"] == 0
    assert plan_report(al.best_alignment(pairs))["python_stages"] == 0
