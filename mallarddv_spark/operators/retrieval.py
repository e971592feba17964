"""Lexical retrieval: BM25 scoring and a persisted, bucket-partitioned
inverted index.

Reference scope note: the reference engine (see
``/root/reference/mallarddv/mallarddv.py:31-404`` for its full facade)
has no retrieval tier — this extends the training-data curation family.
A 100 TB corpus needs *targeted inspection* (find the documents that
look like a benchmark, a contamination cluster, a quality probe) and
lexical BM25 is the standard complement to the embedding-ANN operators
in :mod:`mallarddv_spark.operators.similarity`: no model, exact terms,
explainable scores.

Scale shape, by stage:

* **postings build** — one explode + groupBy over the corpus (map-side
  partial aggregation; the same cost class as the vocabulary build).
  Document length rides ON the posting row, so scoring never joins the
  corpus a second time.
* **probe** — query terms are a broadcast (a query set is KBs); matched
  postings are the only rows that move. With the persisted index the
  term-hash bucket layout turns the scan into partition-pruned I/O:
  a probe touches ``#distinct-query-term-buckets`` partitions, not the
  corpus.
* **scoring** — per-posting BM25 contributions are snapped to a 1e-10
  integer grid and summed exactly (the bigram-LM discipline,
  ``operators/textops.score_bigram_logprob``), so scores and ranks are
  independent of partitioning/merge order and replay bit-for-bit in
  DuckDB.

IDF is the Lucene/Robertson variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``
— non-negative for every df, so a term in most documents contributes
~nothing instead of a negative surprise. Query term frequency is
ignored (each distinct query term counts once — the standard k3→0
simplification for short queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mallarddv_spark.exceptions import DVConfigurationError

__all__ = [
    "build_postings",
    "bm25_topk",
    "hybrid_rerank_topk",
    "rrf_fuse",
    "build_bm25_index",
    "bm25_index_append",
    "bm25_index_probe",
    "bm25_index_compact",
    "heal_bm25_index",
]


def _tokens(text_col, lowercase: bool):
    t = F.trim(F.col(text_col) if isinstance(text_col, str) else text_col)
    if lowercase:
        t = F.lower(t)
    # split(trim('')) yields [''] — drop empties so empty docs have no rows
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def build_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Inverted-index posting rows ``(term, {id_col}, tf, dl)`` — term
    frequency per (term, document) plus the document's total token count
    denormalized onto every posting (one groupBy instead of a second
    corpus-sized join at score time; dl repeats ~unique-terms times per
    doc, a few bytes against never re-shuffling the corpus)."""
    base = df.select(F.col(id_col), _tokens(text_col, lowercase).alias("__t"))
    return (
        base.select(id_col, F.size("__t").alias("dl"), F.explode("__t").alias("term"))
        .groupBy("term", id_col, "dl")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .select("term", id_col, "tf", F.col("dl").cast("bigint").alias("dl"))
    )


def _corpus_totals(df: DataFrame, id_col: str, text_col: str, lowercase: bool):
    # N counts documents with >= 1 token: empty docs have no postings, so
    # including them would make the stored totals drift from what
    # bm25_index_compact can recompute from the postings themselves
    r = (
        df.select(_tokens(text_col, lowercase).alias("__t"))
        .filter(F.size("__t") > 0)
        .agg(F.count("*").alias("n"), F.sum(F.size("__t")).alias("s"))
        .first()
    )
    return int(r.n or 0), int(r.s or 0)


def _query_terms(
    queries: DataFrame, qid_col: str, qtext_col: str, lowercase: bool
) -> DataFrame:
    return (
        queries.select(
            F.col(qid_col), F.explode(_tokens(qtext_col, lowercase)).alias("term")
        )
        .distinct()
    )


def bm25_topk(
    corpus: DataFrame | None,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "query",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
    postings: DataFrame | None = None,
    n_docs: int | None = None,
    total_len: int | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query under BM25.

    Inline mode (``corpus`` given) builds postings and corpus totals on
    the fly; index mode (``postings`` + ``n_docs`` + ``total_len`` given,
    as :func:`bm25_index_probe` does) scores stored postings without
    touching the corpus. Returns
    ``({qid_col}, {id_col}, n_terms, score, rnk)`` with ``rnk`` dense
    from 1 per query; ties break on ascending document id, so the
    ranking is fully deterministic.

    df(term) is computed over the *matched* postings only — each posting
    row is one distinct (term, doc), so a per-term ``groupBy`` count
    equals the document frequency without a separate corpus pass. It is
    deliberately NOT a count-over-window: a window partitioned by term
    must colocate every posting of that term in one task, so a stopword
    with 10^9 postings would serialize 10^9 rows into a single partition.
    The ``groupBy`` keeps every task bounded via map-side partial
    aggregation, and the resulting (term, df) table is at most one row
    per distinct query term — broadcast back onto the postings.

    The per-query top-k window is scale-safe: Catalyst rewrites the
    ``row_number() <= k`` filter into Partial + Final ``WindowGroupLimit``
    nodes, so every map task keeps only its local top-k per query BEFORE
    the shuffle — a stopword-heavy query matching a billion documents
    moves k rows per task, not a billion into one sort
    (plan-pinned in ``tests/test_retrieval.py``).

    ``broadcast=True`` (the default) HARD-REQUIRES the exploded query-
    term table — one row per distinct (query, term), ~40 bytes each —
    to fit Spark's 8 GB broadcast ceiling: comfortable for ~10^4
    queries × ~10 terms (~4 MB), gone well before ~10^8 rows. For a
    million-query batch job pass ``broadcast=False``: the query-term
    and df-table joins degrade to plain shuffled joins keyed on
    ``term`` — the postings then shuffle once, which is the correct
    trade when the probe side itself is corpus-scale.
    """
    _b = F.broadcast if broadcast else (lambda d: d)
    if postings is None:
        if corpus is None:
            raise DVConfigurationError("bm25_topk: need corpus or postings")
        postings = build_postings(corpus, id_col, text_col, lowercase)
        n_docs, total_len = _corpus_totals(corpus, id_col, text_col, lowercase)
    if not n_docs or not total_len:
        raise DVConfigurationError(
            "bm25_topk: empty corpus (n_docs/total_len are zero)"
        )
    qt = _query_terms(queries, qid_col, qtext_col, lowercase)
    # df(term) is counted on (term, doc) rows BEFORE the per-query
    # expansion — a term shared by two queries must not double-count
    matched = postings.join(_b(qt.select("term").distinct()), "term")
    # (term, df) via groupBy — map-side combine bounds every task even
    # for a stopword term; the result is <= #query-terms rows → broadcast
    dftab = matched.groupBy("term").agg(
        F.count("*").cast("bigint").alias("__df")
    )
    matched = matched.join(_b(dftab), "term")
    dfreq = F.col("__df")
    # avgdl enters as dl * n_docs / total_len — exact integers until the
    # one double division, same expression on the DuckDB side
    denom = F.col("tf") + F.lit(float(k1)) * (
        F.lit(1.0 - b)
        + F.lit(float(b))
        * F.col("dl").cast("double")
        * F.lit(float(n_docs))
        / F.lit(float(total_len))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
    )
    contrib = idf * F.col("tf").cast("double") * F.lit(1.0 + k1) / denom
    scored = matched.withColumn(
        "__c10", F.round(contrib * 1e10).cast("bigint")
    ).join(_b(qt), "term").select(qid_col, id_col, "__c10")
    agg = scored.groupBy(qid_col, id_col).agg(
        F.count("*").cast("bigint").alias("n_terms"),
        F.sum("__c10").alias("__s10"),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("__s10").desc(), F.col(id_col).asc()
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= int(k))
        .select(
            qid_col,
            id_col,
            "n_terms",
            F.round(F.col("__s10") / 1e10, 6).alias("score"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def hybrid_rerank_topk(
    bm25_hits: DataFrame,
    doc_vecs: DataFrame,
    query_vecs: DataFrame,
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    vec_col: str = "embedding",
    qvec_col: str = "embedding",
    k: int = 10,
    broadcast: bool = True,
) -> DataFrame:
    """Two-tier retrieval: rerank a BM25 shortlist by embedding cosine —
    the standard lexical-recall → semantic-precision search shape.

    ``bm25_hits`` is any :func:`bm25_topk` / :func:`bm25_index_probe`
    result (its ``rnk`` is the shortlist cut); ``doc_vecs`` maps
    ``id_col`` → ``vec_col``; ``query_vecs`` maps ``qid_col`` →
    ``qvec_col``. Shortlist rows without a document vector are kept and
    ranked below all vectored rows by their BM25 order (a missing
    embedding must not silently drop a lexical hit) — and symmetrically,
    a query with no vector keeps its whole shortlist in BM25 order
    (cosine NULL for every hit). Returns ``(qid, id, score, cosine,
    rnk)`` re-ranked by cosine (desc, NULLs last, id tie-break).

    Scale shape: ``doc_vecs`` is first pruned by a broadcast semi-join
    on the distinct shortlist ids — an inner broadcast-hash join, so the
    full embedding table is probed in place and never shuffled (Spark
    cannot broadcast the preserved side of a left-outer join, so joining
    the corpus-sized table directly as the left join's build side would
    plan a sort-merge join that shuffles every embedding). The pruned
    result is shortlist-sized and broadcasts back onto the hits to keep
    the vectorless-hit semantics. Query vectors ride a broadcast.

    ``broadcast=True`` (the default) HARD-REQUIRES the pruned vector
    table — one embedding per distinct shortlist doc, at most
    ``#queries × k`` rows × (8 bytes × dim) — under Spark's 8 GB
    broadcast ceiling: ~10^4 queries × k=100 × 1024-dim doubles is
    ~8 GB, the practical edge. For a million-query batch job pass
    ``broadcast=False``: all three joins degrade to plain shuffled
    joins (the shortlist and the pruned vectors shuffle on their keys;
    the corpus-sized ``doc_vecs`` still only streams through the inner
    prune join, now shuffled on ``id_col``).
    """
    dv = doc_vecs.select(
        F.col(id_col),
        F.expr(
            f"transform({vec_col}, x -> cast(x as double))"
        ).alias("__dv"),
    )
    qv = query_vecs.select(
        F.col(qid_col),
        F.expr(
            f"transform({qvec_col}, x -> cast(x as double))"
        ).alias("__qv"),
    )
    cos = F.expr(
        "aggregate(zip_with(__dv, __qv, (x, y) -> x * y), cast(0.0 as double),"
        " (a, x) -> a + x) / (sqrt(aggregate(__dv, cast(0.0 as double),"
        " (a, x) -> a + x * x)) * sqrt(aggregate(__qv, cast(0.0 as double),"
        " (a, x) -> a + x * x)))"
    )
    # prune the corpus-sized vector table to the shortlist FIRST (inner
    # broadcast join — dv never shuffles), then left-join the pruned,
    # now-shortlist-sized result back so vectorless hits survive
    _b = F.broadcast if broadcast else (lambda d: d)
    dv_pruned = dv.join(
        _b(bm25_hits.select(id_col).distinct()), id_col
    )
    scored = (
        bm25_hits.join(_b(dv_pruned), id_col, "left")
        .join(_b(qv), qid_col, "left")
        .withColumn(
            "cosine",
            F.when(
                F.col("__dv").isNotNull() & F.col("__qv").isNotNull(),
                F.round(cos, 6),
            ),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc_nulls_last("cosine"), F.asc("rnk"), F.asc(id_col)
    )
    return (
        scored.withColumn("new_rnk", F.row_number().over(w))
        .filter(F.col("new_rnk") <= int(k))
        .select(
            qid_col, id_col, "score", "cosine",
            F.col("new_rnk").cast("bigint").alias("rnk"),
        )
    )


def rrf_fuse(
    runs: list[DataFrame],
    qid_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    k_rrf: int = 60,
    k: int | None = 10,
    weights: list[float] | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    or more ranked runs: ``score(doc) = Σ_j w_j / (k_rrf + rank_j)``,
    summed over the runs that retrieved the doc. RRF is the standard
    score-free way to combine heterogeneous retrievers (BM25 + dense
    cosine + an ANN probe) — it needs only ranks, so incomparable score
    scales (log-idf grid vs cosine) never have to be calibrated.

    Each run must carry one row per ``(qid, doc)`` with a 1-based
    integer ``rank_col`` — exactly the output shape of
    :func:`bm25_topk` / :func:`bm25_index_probe` /
    :func:`hybrid_rerank_topk` and (after renames)
    ``similarity.cosine_topk_bruteforce`` and the ANN probes. ``k_rrf``
    is the standard dampening constant (60 in the original paper);
    ``weights`` defaults to 1.0 per run.

    Determinism: each per-run contribution is snapped to the 1e-10
    integer grid (``round(w_j * 1e10 / (k_rrf + rank))`` as bigint) and
    summed in integer space — the bigram-LM/BM25 discipline — so fused
    scores and tie-broken ranks (score desc, doc id asc) are
    independent of partitioning and replay bit-for-bit in a DuckDB
    oracle. Returns ``(qid, id, n_runs, rrf_score, rnk)``; ``n_runs``
    counts the runs that retrieved the pair. ``k=None`` keeps all fused
    rows.

    Scale shape: no run-vs-run join — the runs UNION (each is already
    a per-query top-k list, so the union is shortlist-sized even when
    the query set is huge) into ONE ``groupBy(qid, doc)`` with map-side
    combine, and the final per-query cut is a constant-``k``
    ``row_number`` that Catalyst rewrites to Partial+Final
    WindowGroupLimit — no query's candidate set ever serializes into
    one task beyond its own fused shortlist.
    """
    if len(runs) < 2:
        raise DVConfigurationError("rrf_fuse: need at least two runs")
    if weights is None:
        weights = [1.0] * len(runs)
    if len(weights) != len(runs):
        raise DVConfigurationError(
            "rrf_fuse: weights must match runs 1:1"
        )
    if int(k_rrf) < 1:
        raise DVConfigurationError("rrf_fuse: k_rrf must be >= 1")
    tagged = []
    for j, (run, wj) in enumerate(zip(runs, weights)):
        contrib = F.round(
            F.lit(float(wj)) * F.lit(1e10)
            / (F.lit(int(k_rrf)) + F.col(rank_col).cast("double"))
        ).cast("bigint")
        tagged.append(
            run.select(
                F.col(qid_col).alias("__qid"),
                F.col(id_col).alias("__id"),
                contrib.alias("__c10"),
            )
        )
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    agg = out.groupBy("__qid", "__id").agg(
        F.count("*").cast("bigint").alias("n_runs"),
        F.sum("__c10").alias("__s10"),
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("__s10").desc(), F.col("__id").asc()
    )
    fused = agg.withColumn("rnk", F.row_number().over(w))
    if k is not None:
        fused = fused.filter(F.col("rnk") <= int(k))
    return fused.select(
        F.col("__qid").alias(qid_col),
        F.col("__id").alias(id_col),
        "n_runs",
        F.round(F.col("__s10") / 1e10, 6).alias("rrf_score"),
        F.col("rnk").cast("bigint").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# persisted inverted index
# ---------------------------------------------------------------------------
#
# Layout under ``path``::
#
#     postings/tbucket=<n>/*.parquet   (term, doc_id, tf, dl)
#     params/*.parquet                 (n_docs, total_len, lowercase,
#                                       term_buckets, id_col) — one row
#
# ``tbucket = pmod(xxhash64(term), term_buckets)`` is a pure storage
# key: probes prune to the buckets their query terms hash into
# (partition pruning — I/O ∝ query terms, not corpus), and results
# never depend on it. Writes assume a SINGLE writer (the same contract
# as the MinHash/IVF indexes — serialize appends/compactions through
# one maintenance job); concurrent probes are safe throughout, because
# renames never delete data a reader already listed. ``params`` is
# written LAST on build (its presence marks the index complete) and
# rewritten via the staged-rename swap on
# append, so a crash at any point leaves a readable index:
# :func:`heal_bm25_index` resolves a torn swap on every open. A crash
# *between* the postings append and the params swap leaves extra
# postings under the old totals — readable, scores slightly stale, and
# :func:`bm25_index_compact` (dedup + recompute params from postings)
# repairs a replayed batch.


def _tbucket(term_buckets: int):
    return F.pmod(F.xxhash64("term"), F.lit(int(term_buckets))).cast("int")


def _write_params(
    spark: SparkSession,
    path: str,
    n_docs: int,
    total_len: int,
    lowercase: bool,
    term_buckets: int,
    id_col: str,
    staged: bool,
) -> None:
    from mallarddv_spark.functions.litframe import literal_frame

    target = f"{path}/params__compact" if staged else f"{path}/params"
    literal_frame(
        spark,
        [(int(n_docs), int(total_len), bool(lowercase), int(term_buckets), id_col)],
        "n_docs bigint, total_len bigint, lowercase boolean, "
        "term_buckets int, id_col string",
    ).coalesce(1).write.mode("overwrite").parquet(target)


def _totals_from_postings(postings: DataFrame, id_col: str):
    """Corpus totals derived from a posting table instead of a second
    corpus tokenization: N = distinct documents (exactly the docs with
    >= 1 token — empty docs have no posting rows), total_len = sum of
    the per-document ``dl`` (functionally dependent on the id, so the
    arbitrary row ``dropDuplicates`` keeps carries the right value).
    Identical to :func:`_corpus_totals` by construction."""
    r = (
        postings.dropDuplicates([id_col])
        .agg(F.count("*").alias("n"), F.sum("dl").alias("s"))
        .first()
    )
    return int(r.n or 0), int(r.s or 0)


def build_bm25_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    term_buckets: int = 64,
    max_df_frac: float | None = None,
    postings: DataFrame | None = None,
) -> dict:
    """Materialize a BM25 inverted index on disk so every future probe
    scores stored postings instead of re-tokenizing the corpus.

    ``max_df_frac`` is the classic stopword-pruning knob: terms whose
    document frequency exceeds ``max_df_frac * n_docs`` at build time
    are materialized into a static stop list (``{path}/stoplist``) and
    their postings are not stored — appends anti-join against the same
    list, so a dropped term stays dropped. At corpus scale the postings
    of ubiquitous terms dominate index bytes while BM25's non-negative
    idf gives them ~zero weight — e.g. at df = 0.8·N,
    idf = ln(1 + 0.2/0.8) ≈ 0.22 vs ~ln(N) for a rare term. The trade
    is explicit: probes score stop-listed terms as absent (their
    contribution is forfeited, a search engine's stop list); the list
    is frozen at build — rebuild to re-evaluate the cutoff.
    """
    from concurrent.futures import ThreadPoolExecutor

    if max_df_frac is not None and not 0.0 < max_df_frac <= 1.0:
        raise DVConfigurationError(
            "build_bm25_index: max_df_frac must be in (0, 1]"
        )
    spark = df.sparkSession
    # The totals job and the postings write are independent (two reads
    # of the same frame): the totals run from a single-worker pool so
    # the write's tasks back-fill the cluster while the totals job's
    # tail finishes (guide §2.6). Only the stop-list path must resolve
    # totals first (the cutoff needs n_docs before pruning decides what
    # gets written). The pool exit joins the worker, so no thread leaks.
    with ThreadPoolExecutor(max_workers=1) as pool:
        if postings is None:
            # two corpus passes (tokenize for postings + tokenize for
            # totals) only in the standalone path; a caller who already
            # holds the posting rows (e.g. a shared suite checkpoint)
            # passes them and the totals come from the postings
            totals = pool.submit(
                _corpus_totals, df, id_col, text_col, lowercase
            )
            postings = build_postings(df, id_col, text_col, lowercase)
        else:
            # BEFORE any stop-list pruning: totals must count every doc
            # with >= 1 token, exactly like _corpus_totals
            totals = pool.submit(_totals_from_postings, postings, id_col)
        if max_df_frac is not None:
            n_docs, _ = totals.result()
            # cutoff against the SAME N the stored totals use (docs with
            # >= 1 token) — evaluating the stopword threshold against a
            # count that included empty docs would shift it vs score-time
            # idf. df(term) via groupBy, NOT count-over-window: the build
            # is exactly where ubiquitous terms still exist, and a window
            # partitioned by term would serialize a stopword's entire
            # posting list into one task before the cutoff can drop it;
            # groupBy keeps tasks bounded through map-side partial counts.
            cutoff = float(max_df_frac) * n_docs
            postings.groupBy("term").agg(F.count("*").alias("__df")).filter(
                F.col("__df") > cutoff
            ).select("term").coalesce(1).write.mode("overwrite").parquet(
                f"{path}/stoplist"
            )
            # stop lists are small by construction (sum(df) over stopped
            # terms <= total_len / cutoff terms) — broadcast anti-join
            stoplist = spark.read.parquet(f"{path}/stoplist")
            postings = postings.join(
                F.broadcast(stoplist), "term", "left_anti"
            )
        postings.withColumn(
            "tbucket", _tbucket(term_buckets)
        ).write.partitionBy("tbucket").mode("overwrite").parquet(
            f"{path}/postings"
        )
        n_docs, total_len = totals.result()
    _write_params(
        spark, path, n_docs, total_len, lowercase, term_buckets, id_col,
        staged=False,
    )
    return {"path": path, "n_docs": n_docs, "total_len": total_len}


def heal_bm25_index(spark: SparkSession, path: str) -> dict[str, str]:
    """Resolve an append/compact interrupted mid-swap (same state machine
    as the MinHash/IVF indexes). Returns {subdir: action}; empty when
    clean. Runs automatically on every open."""
    from mallarddv_spark.sources import layout

    healed: dict[str, str] = {}
    for sub in ("params", "postings"):
        action = layout.heal_dir_swap(spark, f"{path}/{sub}")
        if action:
            healed[sub] = action
    return healed


def _index_params(spark: SparkSession, path: str) -> dict:
    heal_bm25_index(spark, path)
    return spark.read.parquet(f"{path}/params").first().asDict()


def bm25_index_append(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> None:
    """Add a new batch to the stored index without touching existing
    postings: append the batch's posting rows (anti-joined against the
    build-time stop list, if one exists — a term dropped at build stays
    dropped), then swap in updated corpus totals (staged-rename — the
    totals flip atomically). Caller dedups ids; tokenizer settings come
    from the index itself. ``postings`` short-circuits the batch
    tokenization when the caller already holds the batch's posting
    rows (the :func:`build_bm25_index` sharing hook); the totals delta
    then derives from those rows."""
    from concurrent.futures import ThreadPoolExecutor

    spark = df.sparkSession
    p = _index_params(spark, path)
    pre = postings
    if postings is None:
        postings = build_postings(df, p["id_col"], text_col, p["lowercase"])

    def _batch_totals():
        if pre is None:
            return _corpus_totals(df, p["id_col"], text_col, p["lowercase"])
        # pre-stoplist rows, like the totals the standalone path counts
        return _totals_from_postings(pre, p["id_col"])

    # totals delta and the postings append are independent reads of the
    # batch: overlap them (the build_bm25_index pattern, guide §2.6)
    with ThreadPoolExecutor(max_workers=1) as tp:
        f_tot = tp.submit(_batch_totals)
        Path = spark._jvm.org.apache.hadoop.fs.Path
        sl = Path(f"{path}/stoplist")
        if sl.getFileSystem(spark._jsc.hadoopConfiguration()).exists(sl):
            stoplist = spark.read.parquet(f"{path}/stoplist")
            postings = postings.join(
                F.broadcast(stoplist), "term", "left_anti"
            )
        postings.withColumn(
            "tbucket", _tbucket(p["term_buckets"])
        ).write.partitionBy("tbucket").mode("append").parquet(
            f"{path}/postings"
        )
        n_docs, total_len = f_tot.result()
    from mallarddv_spark.sources import layout

    _write_params(
        spark, path, p["n_docs"] + n_docs, p["total_len"] + total_len,
        p["lowercase"], p["term_buckets"], p["id_col"], staged=True,
    )
    layout.swap_dir_live(spark, f"{path}/params")


def bm25_index_probe(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    qid_col: str = "query_id",
    qtext_col: str = "query",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` per query against the stored index. Query terms are
    hashed to their buckets driver-side (a query set is tiny) and the
    postings scan carries an ``IN`` partition filter — the probe reads
    only the matching ``tbucket=`` directories."""
    p = _index_params(spark, path)
    qt = _query_terms(queries, qid_col, qtext_col, p["lowercase"])
    buckets = sorted(
        {r.tb for r in qt.select(_tbucket(p["term_buckets"]).alias("tb")).collect()}
    )
    postings = spark.read.parquet(f"{path}/postings")
    if buckets:
        postings = postings.filter(F.col("tbucket").isin(buckets))
    return bm25_topk(
        None, queries, id_col=p["id_col"], qid_col=qid_col, qtext_col=qtext_col,
        k=k, k1=k1, b=b, lowercase=p["lowercase"],
        postings=postings.drop("tbucket"),
        n_docs=p["n_docs"], total_len=p["total_len"],
    )


def bm25_index_compact(spark: SparkSession, path: str) -> dict:
    """Maintenance + repair: drop duplicate posting rows (a replayed
    append stores identical rows — see the append crash contract),
    coalesce append-accumulated small files, and recompute the stored
    totals from the postings themselves (the ground truth; N is docs
    with stored postings — consistent with build/append, which never
    count token-less docs, though a doc whose every term is
    stop-listed does drop out of N here). Crash-safe via the same
    staged-rename swap as the MinHash index."""
    import math

    from mallarddv_spark.sources import layout

    out: dict = {"healed": heal_bm25_index(spark, path)}
    p = spark.read.parquet(f"{path}/params").first().asDict()
    d = f"{path}/postings"
    df = spark.read.parquet(d)
    before = df.count()
    deduped = df.dropDuplicates(["term", p["id_col"]])
    n_parts = max(1, math.ceil(before / 4_000_000))
    # hash-partition on tbucket so each bucket directory lands in one
    # task → one file per bucket instead of n_parts small files each
    deduped.repartition(n_parts, "tbucket").write.partitionBy("tbucket").mode(
        "overwrite"
    ).parquet(f"{d}__compact")
    staged = spark.read.parquet(f"{d}__compact")
    after = staged.count()
    totals = staged.select(p["id_col"], "dl").dropDuplicates([p["id_col"]]).agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).first()
    layout.swap_dir_live(spark, d)
    _write_params(
        spark, path, int(totals.n or 0), int(totals.s or 0), p["lowercase"],
        p["term_buckets"], p["id_col"], staged=True,
    )
    layout.swap_dir_live(spark, f"{path}/params")
    out["postings"] = {"rows_before": before, "rows_after": after}
    return out
