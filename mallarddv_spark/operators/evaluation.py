"""Retrieval-quality evaluation: recall@k, MRR, and graded nDCG@k of a
ranked result set against an exact baseline or relevance labels.

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

import math

from pyspark.sql import DataFrame, Window, functions as F

from mallarddv_spark.exceptions import DVConfigurationError

__all__ = [
    "recall_at_k",
    "reciprocal_rank",
    "ndcg_at_k",
    "tokenizer_stats",
    "bootstrap_ci",
]


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


def ndcg_at_k(
    approx: DataFrame,
    truth: DataFrame,
    qid_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rank",
    rel_col: str | None = None,
    k: int = 10,
) -> DataFrame:
    """Per-query nDCG@k (Järvelin & Kekäläinen 2002) of a ranked run
    against graded relevance labels — the position-discounted complement
    to :func:`recall_at_k` (set overlap) and :func:`reciprocal_rank`
    (first hit only): a run that buries its relevant results at rank k
    scores below one that leads with them, and graded labels weight
    highly-relevant documents more via the standard exponential gain
    ``(2^rel - 1) / log2(rank + 1)``.

    ``truth`` holds ``(qid, id[, rel])`` relevance pairs; with
    ``rel_col=None`` every pair counts as binary relevance 1. IDCG is
    the DCG of the ideal ordering of each query's labels (rel desc, id
    asc, cut at ``k``), so ``ndcg`` is 1.0 exactly when the run leads
    with the best-labeled documents. Queries present in ``truth`` but
    absent from the run — and queries whose labels are all zero — score
    0.0 rather than vanishing (the :func:`recall_at_k` convention).

    Determinism: each gain term is snapped to the 1e-10 integer grid and
    summed as bigint (the BM25/bigram-LM discipline), so DCG/IDCG — and
    therefore nDCG — are independent of partitioning and replay exactly
    in a second engine. Returns ``({qid_col}, dcg, idcg, ndcg)``
    rounded to 6 dp.

    Scale shape: both inputs are result-set / label-set sized (queries ×
    k rows), so every join is tiny; the ideal-ordering ``row_number``
    with its constant-``k`` cut plans as Partial+Final WindowGroupLimit.
    """
    if int(k) < 1:
        raise ValueError("ndcg_at_k: k must be >= 1")
    rel = (
        F.col(rel_col).cast("double") if rel_col is not None else F.lit(1.0)
    )
    # a duplicated label pair must not double its gain (in both DCG and
    # the ideal ordering) — collapse to the strongest label
    t = (
        truth.select(qid_col, id_col, rel.alias("__rel"))
        .groupBy(qid_col, id_col)
        .agg(F.max("__rel").alias("__rel"))
    )

    def gain10(rank_expr):
        term = (F.pow(F.lit(2.0), F.col("__rel")) - F.lit(1.0)) / F.log2(
            rank_expr.cast("double") + F.lit(1.0)
        )
        return F.round(term * 1e10).cast("bigint")

    run = approx.filter(F.col(rank_col) <= int(k)).select(
        qid_col, id_col, F.col(rank_col).cast("bigint").alias("__rnk")
    )
    # non-relevant retrieved docs contribute zero gain — inner join keeps
    # exactly the scoring rows
    dcg = (
        run.join(t, [qid_col, id_col])
        .groupBy(qid_col)
        .agg(F.sum(gain10(F.col("__rnk"))).alias("__dcg10"))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("__rel"), F.asc(id_col)
    )
    idcg = (
        t.withColumn("__irnk", F.row_number().over(w))
        .filter(F.col("__irnk") <= int(k))
        .groupBy(qid_col)
        .agg(F.sum(gain10(F.col("__irnk"))).alias("__idcg10"))
    )
    base = t.select(qid_col).distinct()
    zero = F.lit(0).cast("bigint")
    return (
        base.join(dcg, qid_col, "left")
        .join(idcg, qid_col, "left")
        .withColumn("__dcg10", F.coalesce("__dcg10", zero))
        .withColumn("__idcg10", F.coalesce("__idcg10", zero))
        .select(
            qid_col,
            F.round(F.col("__dcg10") / 1e10, 6).alias("dcg"),
            F.round(F.col("__idcg10") / 1e10, 6).alias("idcg"),
            F.round(
                F.when(
                    F.col("__idcg10") > 0,
                    F.col("__dcg10").cast("double") / F.col("__idcg10"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg"),
        )
    )


def tokenizer_stats(
    df: DataFrame,
    encoded: DataFrame,
    id_col: str,
    text_col: str,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-level tokenizer quality numbers from an encoded corpus —
    the measurements a pipeline compares BPE / unigram-LM / WordPiece
    (or merge budgets of one of them) by before committing a vocabulary:

    * ``fertility`` = Σ n_tokens / Σ n_words (tokens per word; 1.0 is
      whole-word, higher = more fragmentation);
    * ``chars_per_token`` = Σ non-whitespace chars / Σ n_tokens
      (compression — how much text one token carries);
    * ``unk_rate`` = Σ n_unk / Σ n_tokens when the encoder reports an
      ``n_unk`` column (WordPiece's OOV signal; NULL otherwise —
      BPE/unigram segment everything, so no-evidence is not zero).

    ``encoded`` is the shared encoder output shape ``(id, n_words,
    n_tokens[, n_unk], …)`` of :func:`bpe.bpe_encode`,
    :func:`unigram.unigram_encode`, and
    :func:`wordpiece.wordpiece_encode`; ``df`` supplies the original
    text for the char counts (``lowercase`` must match the model —
    char totals are case-insensitive anyway, the flag only mirrors the
    encoder's normalization for exactness). Documents the encoder
    skipped (no tokens) contribute neither tokens nor chars.

    Returns ONE row ``(n_docs, n_words, n_tokens, fertility,
    chars_per_token, unk_rate)``, ratios at 6 dp. One join + one
    aggregate — result is a single row, never data-sized."""
    t = F.trim(F.col(text_col))
    if lowercase:
        t = F.lower(t)
    chars = df.select(
        F.col(id_col).alias("__cid"),
        F.length(F.regexp_replace(t, r"\s+", "")).cast("bigint").alias(
            "__chars"
        ),
    )
    enc = encoded.withColumn(
        "__unk",
        F.col("n_unk").cast("bigint")
        if "n_unk" in encoded.columns else F.lit(None).cast("bigint"),
    )
    joined = enc.join(chars, enc[id_col] == F.col("__cid"))
    return joined.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum("n_tokens").cast("double")
            / F.sum("n_words").cast("double"), 6
        ).alias("fertility"),
        F.round(
            F.sum("__chars").cast("double")
            / F.sum("n_tokens").cast("double"), 6
        ).alias("chars_per_token"),
        F.round(
            F.sum("__unk").cast("double")
            / F.sum("n_tokens").cast("double"), 6
        ).alias("unk_rate"),
    )


def _poisson1_case(u_sql: str, max_k: int = 8) -> str:
    """CASE expression drawing Poisson(1) by inverse CDF from a uniform
    ``u_sql`` — thresholds are Python-computed double literals, so the
    draw replays identically in any engine given the same uniform."""
    cum, acc = [], 0.0
    for k in range(max_k):
        acc += math.exp(-1.0) / math.factorial(k)
        cum.append((k, acc))
    branches = " ".join(
        f"WHEN {u_sql} < {thr!r} THEN {k}" for k, thr in cum
    )
    return f"CASE {branches} ELSE {max_k} END"


def bootstrap_ci(
    per_query: DataFrame,
    value_col: str,
    id_col: str,
    B: int = 1000,
    level: float = 0.95,
    salt: str = "boot-v1",
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean of a per-query
    metric (recall, MRR, nDCG — any ``(id, value)`` eval frame): is the
    recall difference between two ANN configurations real, or noise from
    this particular query sample? Returns ONE row
    ``(n, mean, lo, hi, level, b)``. Rows whose metric value is NULL
    are excluded up front — from ``n``, ``mean``, and the replicate
    weights alike — so a partially-NULL metric column yields the CI of
    its observed values, not a downward-biased one.

    The Poisson(1) bootstrap (Chamandy et al. 2012 — "Estimating
    uncertainty for massive data streams", the standard distributed
    form) replaces multinomial resampling with an independent
    Poisson(1) weight per (replicate, row): each replicate's statistic
    is the weighted mean, and the CI is the (1±level)/2 percentile pair
    over the ``B`` replicate means. Weights are drawn DETERMINISTICALLY
    from ``md5(salt ‖ b ‖ id)`` through a Python-literal inverse-CDF
    CASE — re-running reproduces the same interval, and ``salt``
    re-rolls it.

    Scale shape: eval frames are queries × 1 rows (small by this
    module's contract), and the explode to B·n (replicate, row) pairs
    stays result-set-sized; one groupBy(replicate) with map-side
    combine, then an exact percentile over the B replicate means (B
    rows). Empty replicates (all weights 0 — probability e^{-n} per
    replicate) are dropped.
    """
    if B < 10:
        raise DVConfigurationError(f"bootstrap_ci: B must be >= 10, got {B}")
    if not (0.0 < level < 1.0):
        raise DVConfigurationError(
            f"bootstrap_ci: level must be in (0, 1), got {level}"
        )
    u = (
        "conv(substring(md5(concat('{salt}', '|', cast(__b as string), '|', "
        "cast(__bid as string))), 1, 15), 16, 10) / 1152921504606846976.0"
    ).format(salt=salt)
    w = _poisson1_case(f"({u})")
    # NULL metric values are excluded EVERYWHERE (n, mean, and the
    # replicate weights alike) — without the up-front filter a NULL row
    # would add weight to each replicate's denominator sum(__w) while
    # contributing nothing to the numerator, biasing every replicate
    # mean (and the interval) downward
    base = per_query.filter(F.col(value_col).isNotNull()).select(
        F.col(id_col).alias("__bid"),
        F.col(value_col).cast("double").alias("__v"),
    )
    # empty replicates (all weights 0 — probability e^{-n}, certain to
    # occur at small n with B in the hundreds) are dropped BEFORE the
    # division: dividing first raises DIVIDE_BY_ZERO under ANSI mode
    # (regression-pinned at n=3)
    reps = (
        base.select(
            "__bid", "__v",
            F.explode(F.expr(f"sequence(1, {int(B)})")).alias("__b"),
        )
        .withColumn("__w", F.expr(w))
        .groupBy("__b")
        .agg(
            F.sum(F.col("__w") * F.col("__v")).alias("__num"),
            F.sum("__w").alias("__den"),
        )
        .filter(F.col("__den") > 0)
        .select("__b", (F.col("__num") / F.col("__den")).alias("__m"))
    )
    alpha = (1.0 - level) / 2.0
    stats = base.agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("__v"), 6).alias("mean"),
    )
    ci = reps.agg(
        F.round(F.expr(f"percentile(__m, {alpha!r})"), 6).alias("lo"),
        F.round(F.expr(f"percentile(__m, {1.0 - alpha!r})"), 6).alias("hi"),
        F.count("*").cast("bigint").alias("b"),
    )
    return stats.crossJoin(ci).select(
        "n", "mean", "lo", "hi", F.lit(float(level)).alias("level"), "b"
    )
