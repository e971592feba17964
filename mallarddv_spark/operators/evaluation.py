"""Retrieval-quality evaluation: recall@k and MRR of an approximate
result set against an exact baseline.

Reference scope note: no evaluation tier exists in the reference engine
— this extends the training-data pipeline tier. Every approximate
retrieval path in this repo (hyperplane-LSH, IVF, PQ-ADC, IVF-PQ,
banded MinHash, BM25 with a stop list) trades recall for scan cost;
tuning that trade on a real corpus needs the recall measured
relationally, at corpus scale, not eyeballed on a sample.

Scale shape: both inputs are top-k result sets (queries × k rows —
small by construction, whatever the corpus size), so every join here is
result-set-sized. One groupBy on the query id; the summary is a single
driver row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["recall_at_k", "reciprocal_rank"]


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    qid_col: str = "query_id",
    id_col: str = "neighbor_id",
    k: int | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query recall of ``approx`` against the ``exact`` baseline:
    ``|approx ∩ exact| / |exact|`` over each query's result rows. With
    ``k`` given, both sides are first cut to ``rank_col <= k`` (pass
    ``k=None`` to compare the sets as-is). Queries present in ``exact``
    but absent from ``approx`` (the approximate tier found nothing —
    e.g. no shared LSH bucket) score recall 0.0 rather than vanishing:
    missing queries are exactly the failures a recall sweep must count.

    Returns ``({qid_col}, n_exact, n_hit, recall)``.
    """
    a = approx.select(qid_col, id_col)
    e = exact.select(qid_col, id_col)
    if k is not None:
        a = approx.filter(F.col(rank_col) <= int(k)).select(qid_col, id_col)
        e = exact.filter(F.col(rank_col) <= int(k)).select(qid_col, id_col)
    hits = e.join(a, [qid_col, id_col], "left_semi")
    per_q = (
        e.groupBy(qid_col)
        .agg(F.count("*").cast("bigint").alias("n_exact"))
        .join(
            hits.groupBy(qid_col).agg(
                F.count("*").cast("bigint").alias("n_hit")
            ),
            qid_col,
            "left",
        )
        .withColumn("n_hit", F.coalesce("n_hit", F.lit(0).cast("bigint")))
    )
    return per_q.select(
        qid_col,
        "n_exact",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_exact"), 6).alias("recall"),
    )


def reciprocal_rank(
    approx: DataFrame,
    truth: DataFrame,
    qid_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query reciprocal rank: 1/rank of the FIRST relevant result in
    ``approx`` (``truth`` is ``(qid, id)`` relevant pairs — typically
    the exact top-1, or labeled relevance). Queries whose results
    contain no relevant id score 0.0. Mean the ``rr`` column for MRR.

    Returns ``({qid_col}, first_rank, rr)`` with ``first_rank`` NULL
    when nothing relevant was retrieved.
    """
    relevant = approx.join(
        truth.select(qid_col, id_col), [qid_col, id_col], "left_semi"
    )
    first = relevant.groupBy(qid_col).agg(
        F.min(rank_col).cast("bigint").alias("first_rank")
    )
    base = truth.select(qid_col).distinct()
    return (
        base.join(first, qid_col, "left")
        .withColumn(
            "rr",
            F.round(
                F.when(
                    F.col("first_rank").isNotNull(),
                    F.lit(1.0) / F.col("first_rank"),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .select(qid_col, "first_rank", "rr")
    )
