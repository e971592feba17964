"""Retrieval-quality metrics (operators/evaluation): recall@k against an
exact baseline on the real corpus (LSH vs brute-force cosine), missing
queries counted as zero, MRR semantics, result-set-sized plans."""

import pytest
from pyspark.sql import Row, functions as F

from mallarddv_spark.operators.evaluation import recall_at_k, reciprocal_rank

SF = "/root/testdata/sf0.001"


def test_recall_semantics(spark):
    exact = spark.createDataFrame(
        [Row(query_id="a", neighbor_id=i, rank=i) for i in (1, 2, 3)]
        + [Row(query_id="b", neighbor_id=i, rank=i) for i in (1, 2)]
        + [Row(query_id="c", neighbor_id=1, rank=1)]
    )
    approx = spark.createDataFrame(
        # a: 2 of 3; b: both but one past the k cut; c: absent entirely
        [Row(query_id="a", neighbor_id=1, rank=1),
         Row(query_id="a", neighbor_id=3, rank=2),
         Row(query_id="a", neighbor_id=99, rank=3),
         Row(query_id="b", neighbor_id=1, rank=1),
         Row(query_id="b", neighbor_id=2, rank=4)]
    )
    got = {r.query_id: (r.n_exact, r.n_hit, r.recall)
           for r in recall_at_k(approx, exact).collect()}
    assert got == {"a": (3, 2, round(2 / 3, 6)), "b": (2, 2, 1.0),
                   "c": (1, 0, 0.0)}
    cut = {r.query_id: r.recall
           for r in recall_at_k(approx, exact, k=2).collect()}
    assert cut == {"a": 0.5, "b": 0.5, "c": 0.0}


def test_reciprocal_rank(spark):
    truth = spark.createDataFrame(
        [Row(query_id="a", neighbor_id=7), Row(query_id="b", neighbor_id=9),
         Row(query_id="c", neighbor_id=5)]
    )
    approx = spark.createDataFrame(
        [Row(query_id="a", neighbor_id=3, rank=1),
         Row(query_id="a", neighbor_id=7, rank=2),
         Row(query_id="b", neighbor_id=9, rank=1),
         Row(query_id="c", neighbor_id=8, rank=1)]
    )
    got = {r.query_id: (r.first_rank, r.rr)
           for r in reciprocal_rank(approx, truth).collect()}
    assert got == {"a": (2, 0.5), "b": (1, 1.0), "c": (None, 0.0)}
    mrr = reciprocal_rank(approx, truth).agg(F.avg("rr")).first()[0]
    assert abs(mrr - 0.5) < 1e-9


def test_recall_on_real_ann_tiers(spark):
    """The intended workflow: measure hyperplane-LSH recall against the
    brute-force baseline on the real embeddings, end to end."""
    from mallarddv_spark.operators.similarity import (
        cosine_topk_bruteforce,
        hyperplane_lsh_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter("vec_id < 5")
    corpus = emb.filter("vec_id >= 5")
    exact = cosine_topk_bruteforce(queries, corpus, k=10)
    approx = hyperplane_lsh_topk(queries, corpus, k=10, num_bits=16, bands=8)
    rec = recall_at_k(approx, exact, k=10)
    rows = rec.collect()
    assert len(rows) == 5
    mean = rec.agg(F.avg("recall")).first()[0]
    assert 0.0 <= mean <= 1.0
    # 8 bands of 2 bits is a high-recall shape on 64-dim normals
    assert mean > 0.5


def test_plans_are_result_set_sized(spark):
    from mallarddv_spark.plans.audit import plan_report

    exact = spark.createDataFrame(
        [Row(query_id="a", neighbor_id=1, rank=1)]
    )
    rep = plan_report(recall_at_k(exact, exact, k=5))
    assert rep["python_stages"] == 0 and rep["nested_loop_joins"] == 0
