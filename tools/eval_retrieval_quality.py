"""Measured retrieval quality of every ranked tier against the
brute-force cosine baseline on the real corpus — recall@10, MRR, and
graded nDCG@10 via operators/evaluation. The point is honest numbers
for the NOTES deployment guidance: how much the hybrid rerank and the
rank-only RRF fusion actually buy over their single-tier inputs.

Setup: the first Q embedded documents are held out as queries (their
TEXT drives the lexical runs, their VECTOR the dense runs); the
remaining embedded documents are the corpus. Ground truth = exact
cosine top-k. Runs: BM25 (lexical only), hyperplane-LSH (approximate
dense), hybrid (BM25 top-50 shortlist -> cosine rerank), RRF
(rank-only fusion of the BM25 and LSH top-k lists).

Usage: python tools/eval_retrieval_quality.py [sf_dir] [k] [n_queries]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mallarddv_spark.operators.evaluation import (  # noqa: E402
    ndcg_at_k,
    recall_at_k,
    reciprocal_rank,
)
from mallarddv_spark.operators.retrieval import (  # noqa: E402
    bm25_topk,
    hybrid_rerank_topk,
    rrf_fuse,
)
from mallarddv_spark.operators.similarity import (  # noqa: E402
    cosine_topk_bruteforce,
    hyperplane_lsh_topk,
)
from mallarddv_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    nq = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    spark = get_spark(app_name="eval-retrieval")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q_vec = emb.filter(F.col("vec_id") < nq)
    c_vec = emb.filter(F.col("vec_id") >= nq).cache()
    q_txt = docs.filter(F.col("doc_id") < nq).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query")
    ).cache()
    # corpus = embedded docs only, so every tier ranks the same universe
    c_txt = docs.join(
        c_vec.select(F.col("vec_id").alias("doc_id")), "doc_id"
    ).select("doc_id", "text").cache()

    truths = {
        "cosine": cosine_topk_bruteforce(q_vec, c_vec, k=k).select(
            F.col("query_id"), F.col("neighbor_id"), F.col("rank")
        ).cache(),
        # the lexical ground truth: exact full-corpus BM25 — on THIS
        # synthetic corpus text and embeddings are independent, so the
        # two truths disagree almost completely; scoring every run
        # against both shows which modality each tier actually serves
        "bm25_exact": bm25_topk(c_txt, q_txt, k=k).select(
            "query_id", F.col("doc_id").alias("neighbor_id"),
            F.col("rnk").alias("rank"),
        ).cache(),
    }

    runs = {}
    runs["bm25"] = bm25_topk(c_txt, q_txt, k=k).select(
        "query_id", F.col("doc_id").alias("neighbor_id"),
        F.col("rnk").alias("rank"),
    )
    runs["lsh"] = hyperplane_lsh_topk(
        q_vec, c_vec, k=k, num_bits=16, bands=8
    ).select("query_id", "neighbor_id", "rank")
    shortlist = bm25_topk(c_txt, q_txt, k=50)
    runs["hybrid"] = hybrid_rerank_topk(
        shortlist,
        c_vec.select(F.col("vec_id").alias("doc_id"), "embedding"),
        q_vec.select(F.col("vec_id").alias("query_id"), "embedding"),
        k=k,
    ).select(
        "query_id", F.col("doc_id").alias("neighbor_id"),
        F.col("rnk").alias("rank"),
    )
    runs["rrf"] = rrf_fuse(
        [
            runs["bm25"].select(
                "query_id", F.col("neighbor_id").alias("doc_id"),
                F.col("rank").alias("rnk"),
            ),
            runs["lsh"].select(
                "query_id", F.col("neighbor_id").alias("doc_id"),
                F.col("rank").alias("rnk"),
            ),
        ],
        k=k,
    ).select(
        "query_id", F.col("doc_id").alias("neighbor_id"),
        F.col("rnk").alias("rank"),
    )

    for name, run in runs.items():
        run = run.cache()
        out = {"run": name}
        for tname, truth in truths.items():
            if (name, tname) == ("bm25", "bm25_exact"):
                continue  # the run IS this truth
            # graded relevance: the exact top-k, better ranks more relevant
            labels = truth.select(
                "query_id", "neighbor_id",
                (F.lit(k + 1) - F.col("rank")).cast("double").alias("rel"),
            )
            top1 = truth.filter(F.col("rank") == 1).select(
                "query_id", "neighbor_id"
            )
            rec = recall_at_k(run, truth, k=k).agg(
                F.round(F.avg("recall"), 3).alias("v")
            ).first().v
            mrr = reciprocal_rank(run, top1).agg(
                F.round(F.avg("rr"), 3).alias("v")
            ).first().v
            ndcg = ndcg_at_k(run, labels, rel_col="rel", k=k).agg(
                F.round(F.avg("ndcg"), 3).alias("v")
            ).first().v
            out[tname] = {
                f"recall@{k}": rec, "mrr": mrr, f"ndcg@{k}": ndcg,
            }
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
