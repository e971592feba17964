"""Margin-based embedding alignment mining (Artetxe & Schwenk 2019) —
the CCMatrix/LASER shape for harvesting aligned pairs (parallel
sentences, image-caption pairs, near-translations) from two embedded
corpora.

Reference scope note: the reference engine has no alignment tier —
this extends the similarity family for the multilingual-curation case:
a raw cosine threshold mines garbage because cosine scales differ by
region of the embedding space (hubness), so the standard fix scores
each candidate pair by its RATIO MARGIN — the pair's cosine divided by
the mean cosine of each side's k nearest neighbors:

``margin(x, y) = cos(x, y) / ((avg_fwd(x) + avg_bwd(y)) / 2)``

A pair that merely sits in a dense hub scores ~1; a pair that stands
out against both sides' neighborhoods scores well above it (the paper
thresholds around 1.04–1.06).

Scale shape: two kNN passes supply everything — forward (src→tgt) and
backward (tgt→src). The kNN is pluggable: the default exact
:func:`similarity.cosine_topk_bruteforce` broadcasts the query side
(right up to ~10^4 queries), and any ANN tier with the same output
shape (`hyperplane_lsh_topk`, the IVF/IVF-PQ probes) drops in for
corpus×corpus mining, where exact kNN is the quadratic wall. Every
aggregate after the kNN is result-set-sized (queries × k rows).

Determinism: the per-side neighborhood means sum the kNN's 6-dp
cosines on a 1e-6 integer grid before the one division, and margins
round to 6 dp with (margin desc, id asc) tie-breaks — the module-wide
replay discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mallarddv_spark.exceptions import DVConfigurationError

__all__ = ["margin_knn_pairs", "best_alignment", "hard_negative_mine"]


def margin_knn_pairs(
    src: DataFrame,
    tgt: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    knn=None,
    mutual: bool = True,
    min_margin: float | None = None,
) -> DataFrame:
    """Score candidate alignments between two embedded corpora by ratio
    margin. Returns ``(src_id, tgt_id, cosine, margin)``, one row per
    surviving forward-kNN pair.

    ``mutual=True`` keeps only pairs present in BOTH directions' top-k
    (the paper's intersection strategy — removes asymmetric hub hits);
    ``min_margin`` applies the threshold cut. ``knn`` is any callable
    ``(queries, corpus, id_col=..., vec_col=..., k=...) →
    (query_id, neighbor_id, rank, cosine)`` — defaults to the exact
    brute-force kNN; pass an ANN probe for corpus×corpus scale."""
    from mallarddv_spark.operators.similarity import cosine_topk_bruteforce

    if int(k) < 1:
        raise DVConfigurationError("margin_knn_pairs: k must be >= 1")
    knn = knn or cosine_topk_bruteforce
    fwd = knn(src, tgt, id_col=id_col, vec_col=vec_col, k=int(k))
    bwd = knn(tgt, src, id_col=id_col, vec_col=vec_col, k=int(k))
    # per-side neighborhood means on the 1e-6 grid: sum of the kNN's
    # 6-dp cosines is integer-exact; ONE division per side
    afwd = fwd.groupBy("query_id").agg(
        (
            F.sum(F.round(F.col("cosine") * 1e6).cast("bigint"))
            / (F.count("*") * F.lit(1e6))
        ).alias("__afwd")
    ).select(F.col("query_id").alias("__sx"), "__afwd")
    abwd = bwd.groupBy("query_id").agg(
        (
            F.sum(F.round(F.col("cosine") * 1e6).cast("bigint"))
            / (F.count("*") * F.lit(1e6))
        ).alias("__abwd")
    ).select(F.col("query_id").alias("__ty"), "__abwd")
    cand = fwd.select(
        F.col("query_id").alias("src_id"),
        F.col("neighbor_id").alias("tgt_id"),
        "cosine",
    )
    if mutual:
        rev = bwd.select(
            F.col("neighbor_id").alias("src_id"),
            F.col("query_id").alias("tgt_id"),
        )
        cand = cand.join(rev, ["src_id", "tgt_id"], "left_semi")
    scored = (
        cand.join(afwd, cand.src_id == F.col("__sx"))
        .join(abwd, cand.tgt_id == F.col("__ty"))
        .select(
            "src_id",
            "tgt_id",
            "cosine",
            F.round(
                F.col("cosine")
                / ((F.col("__afwd") + F.col("__abwd")) / F.lit(2.0)),
                6,
            ).alias("margin"),
        )
    )
    if min_margin is not None:
        scored = scored.filter(F.col("margin") >= float(min_margin))
    return scored


def hard_negative_mine(
    pairs: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    knn=None,
    fetch_k: int | None = None,
    denoise_ratio: float | None = None,
) -> DataFrame:
    """DPR-style hard-negative mining (Karpukhin et al. 2020): for each
    (query, positive) training pair, the ``k`` most similar corpus items
    that are NOT among that query's positives — the negatives that
    actually move a contrastive retriever, vs. random negatives a
    BM25/in-batch scheme would sample. Returns ``(query_id, neg_id,
    rank, cosine)``.

    ``pairs`` is ``(query_id, pos_id)`` (a query may carry several
    positives); ``queries``/``corpus`` hold embeddings under
    ``id_col``/``vec_col``. ``knn`` is pluggable exactly as in
    :func:`margin_knn_pairs` — exact brute force by default, any ANN
    tier for corpus-scale mining. ``fetch_k`` is the over-fetch depth
    before positives are dropped (default ``k`` + the max positives any
    query carries, a one-row metadata aggregate).

    ``denoise_ratio`` enables the RocketQA false-negative screen (Qu et
    al. 2021): candidates scoring ≥ ``ratio`` × the query's weakest
    positive cosine are discarded rather than mined — near-ties with a
    real positive are more likely unlabeled positives than useful
    negatives. The screen assumes positives score HIGH: for a query
    whose weakest positive cosine is ≤ 0 the threshold would be
    nonsensical (it would discard nearly everything), so the screen is
    DISABLED for that query and all its candidates stay eligible.
    Mining is a single pass over the fetched pool — there is no
    backfill: candidates the screen removes are not replaced from
    beyond ``fetch_k``, so a heavily-screened query can return fewer
    than ``k`` negatives. To compensate, the DEFAULT over-fetch doubles
    to ``2*k`` + max-positives when ``denoise_ratio`` is set; pass an
    explicit ``fetch_k`` to widen further.

    Scale shape: one kNN pass over queries that actually appear in
    ``pairs``; everything after is result-set-sized (queries × fetch_k):
    a broadcastable anti-join against the positive set, the optional
    per-query positive-floor join (≤ one row per query), and a
    WindowGroupLimit-protected top-k re-cut.
    """
    from pyspark.sql import Window

    from mallarddv_spark.operators.similarity import (
        _DOT,
        _normed,
        cosine_topk_bruteforce,
    )

    if int(k) < 1:
        raise DVConfigurationError("hard_negative_mine: k must be >= 1")
    if denoise_ratio is not None and not (0.0 < denoise_ratio <= 1.0):
        raise DVConfigurationError(
            "hard_negative_mine: denoise_ratio must be in (0, 1], "
            f"got {denoise_ratio}"
        )
    knn = knn or cosine_topk_bruteforce
    p = pairs.select(
        F.col(pairs.columns[0]).alias("query_id"),
        F.col(pairs.columns[1]).alias("pos_id"),
    ).distinct()
    if fetch_k is None:
        mp = (
            p.groupBy("query_id").count()
            .agg(F.max("count")).collect()[0][0]
        )
        # denoise removes candidates WITHOUT backfill — over-fetch twice
        # as deep so a screened query can still fill its k slots
        base = 2 * int(k) if denoise_ratio is not None else int(k)
        fetch_k = base + int(mp or 0)
    q_active = queries.join(
        p.select(F.col("query_id").alias(id_col)).distinct(),
        id_col, "left_semi",
    )
    cand = knn(q_active, corpus, id_col=id_col, vec_col=vec_col,
               k=int(fetch_k))
    cand = cand.join(
        p.select("query_id", F.col("pos_id").alias("neighbor_id")),
        ["query_id", "neighbor_id"], "left_anti",
    )
    if denoise_ratio is not None:
        qv = _normed(q_active, id_col, vec_col, "query_id")
        cv = _normed(corpus, id_col, vec_col, "pos_id")
        pos_cos = (
            p.join(qv, "query_id")
            .join(
                cv.withColumnRenamed("v", "pv").withColumnRenamed(
                    "norm", "pn"
                ),
                "pos_id",
            )
            .select(
                "query_id",
                F.expr(
                    f"round({_DOT.format(a='v', b='pv')} / (norm * pn), 6)"
                ).alias("__pc"),
            )
            .groupBy("query_id")
            .agg(F.min("__pc").alias("__floor"))
        )
        # floor ≤ 0 → the query's positives don't score high, the
        # RocketQA assumption doesn't hold — skip the screen for it
        cand = cand.join(F.broadcast(pos_cos), "query_id").filter(
            (F.col("__floor") <= 0)
            | (
                F.col("cosine")
                < F.lit(float(denoise_ratio)) * F.col("__floor")
            )
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= int(k))
        .select(
            "query_id",
            F.col("neighbor_id").alias("neg_id"),
            F.col("__r").alias("rank"),
            "cosine",
        )
    )


def best_alignment(pairs: DataFrame) -> DataFrame:
    """Greedy 1:1 alignment from a :func:`margin_knn_pairs` result —
    the paper's max-margin retrieval: keep each source's best-margin
    target, then each surviving target's best source, so no id appears
    twice. Adds nothing a threshold sweep needs; use it when the
    downstream consumer requires unique pairs (bitext corpora do).

    Both cuts are constant-1 ranks over result-set-sized frames —
    Partial+Final WindowGroupLimit, deterministic (margin desc, id
    asc)."""
    from pyspark.sql import Window

    w_src = Window.partitionBy("src_id").orderBy(
        F.desc("margin"), F.asc("tgt_id")
    )
    w_tgt = Window.partitionBy("tgt_id").orderBy(
        F.desc("margin"), F.asc("src_id")
    )
    return (
        pairs.withColumn("__r", F.row_number().over(w_src))
        .filter(F.col("__r") == 1)
        .withColumn("__r2", F.row_number().over(w_tgt))
        .filter(F.col("__r2") == 1)
        .drop("__r", "__r2")
    )
