"""Similarity search over embedding columns (``array<float>``).

Three tiers, trading recall for scale:

* :func:`cosine_topk_bruteforce` — exact; queries × corpus with the query
  side broadcast. Right answer whenever |queries|·|corpus| fits a shuffle
  (e.g. 1e3 queries × 1e8 corpus rows is fine on a cluster — the corpus
  never moves, queries are broadcast to it).
* :func:`hyperplane_lsh_topk` — random-hyperplane (sign) LSH: b-bit
  signatures, candidates share a signature band, exact rerank within
  candidates. Recall tunable via bands; corpus-side work is one narrow
  shuffle on (band, value).
* :func:`ivf_topk` — IVF: KMeans centroids (trained on a sample), probe
  the ``nprobe`` nearest centroids per query. The classic billion-scale
  layout: the corpus is partitioned (clustered) by centroid id, so a probe
  touches only matching partitions (partition pruning on a Delta/Iceberg
  table clustered by ``centroid_id``).
* :func:`pq_train` / :func:`pq_encode` / :func:`pq_topk_adc` /
  :func:`pq_topk_rerank` — product quantization (Jégou et al. 2011):
  per-subvector codebooks compress each vector to m code bytes (32x for
  64-dim float at m=8), ADC scans read only the codes, and the standard
  shortlist+exact-rerank recovers recall. Orthogonal to IVF (IVF-PQ =
  cluster by centroid, store codes) and to SQ8 below.

All dot products are Catalyst ``aggregate``/``zip_with`` expressions —
JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"
)


def _normed(df: DataFrame, id_col: str, vec_col: str, out_id: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(out_id),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    ).withColumn(
        "norm", F.expr("sqrt(aggregate(v, cast(0.0 as double), (a, x) -> a + x * x))")
    )


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    Returns (query_id, neighbor_id, rank, cosine). The query side is
    broadcast — the big corpus is scanned in place, never shuffled.
    """
    q = _normed(queries, id_col, vec_col, "query_id").withColumnRenamed(
        "v", "qv"
    ).withColumnRenamed("norm", "qn")
    c = _normed(corpus, id_col, vec_col, "neighbor_id").withColumnRenamed(
        "v", "cv"
    ).withColumnRenamed("norm", "cn")
    pairs = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        F.expr(f"round({_DOT.format(a='qv', b='cv')} / (qn * cn), 6)"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplane_matrix(num_bits: int, dim: int, seed: int = 42) -> list[list[float]]:
    """The deterministic ±1 hyperplane matrix behind
    :func:`hyperplane_signatures` — exposed so oracle/test harnesses can
    embed the exact same planes as literals in another engine's SQL."""
    import random

    rng = random.Random(seed)
    return [
        [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]
        for _ in range(num_bits)
    ]


def hyperplane_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    num_bits: int = 16,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Sign-random-projection signatures: bit_j = (v · h_j) > 0.

    Hyperplanes are a deterministic ±1 matrix (seeded PRNG) shipped as a
    *literal* array column, and the per-bit dots run through Catalyst
    higher-order functions — compact codegen regardless of dim × bits
    (an unrolled form is quadratic in expression size and dominates
    compile time).

    Driver-side cost matters here: the matrix is rendered as ONE SQL
    literal parsed in a single py4j call (building it from dim × bits
    nested ``F.lit``/``F.array`` calls costs ~1 s of py4j round-trips at
    32×64), and the ``dim`` probe is a Spark job — callers that know the
    dimension should pass it.
    """
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = int(first.d)
    planes = hyperplane_matrix(num_bits, dim, seed)
    planes_col = F.expr(
        "array(" + ", ".join(
            "array(" + ", ".join(f"{x}D" for x in row) + ")" for row in planes
        ) + ")"
    )
    e = df.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    ).withColumn("planes", planes_col)
    sig = F.expr(
        "aggregate(sequence(0, size(planes) - 1), 0L, (acc, j) -> "
        "  acc | (CASE WHEN aggregate(zip_with(v, planes[j], (x, y) -> x * y), "
        "                             cast(0.0 as double), (a, x) -> a + x) > 0 "
        "         THEN shiftleft(1L, j) ELSE 0L END))"
    )
    return e.select("vid", "v", sig.alias("sig"))


def hyperplane_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_bits: int = 16,
    bands: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 signature band with the query,
    then exact cosine rerank within candidates.

    Returns (query_id, neighbor_id, rank, cosine) — rank within retrieved
    candidates; recall < 1 by construction.
    """
    band_bits = num_bits // bands
    mask = (1 << band_bits) - 1

    def banded(sigs: DataFrame, out_id: str) -> DataFrame:
        chunks = [
            F.struct(
                F.lit(b).alias("band"),
                (
                    F.shiftrightunsigned("sig", b * band_bits) % F.lit(mask + 1)
                ).alias("bv"),
            )
            for b in range(bands)
        ]
        return sigs.select(
            F.col("vid").alias(out_id),
            "v",
            F.explode(F.array(*chunks)).alias("c"),
        ).select(out_id, "v", "c.band", "c.bv")

    if dim is None:
        dim = int(corpus.select(F.size(vec_col).alias("d")).first().d)
    qs = hyperplane_signatures(queries, id_col, vec_col, num_bits, seed, dim=dim)
    cs = hyperplane_signatures(corpus, id_col, vec_col, num_bits, seed, dim=dim)
    qb = banded(qs, "query_id").withColumnRenamed("v", "qv")
    cb = banded(cs, "neighbor_id").withColumnRenamed("v", "cv")

    cand = (
        qb.join(cb, ["band", "bv"])
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine",
        F.expr(
            f"round({_DOT.format(a='qv', b='cv')} / "
            f"(sqrt({_DOT.format(a='qv', b='qv')}) * sqrt({_DOT.format(a='cv', b='cv')})), 6)"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 3,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: KMeans-partitioned corpus, probe the nprobe
    nearest centroids per query, exact rerank within probed cells.

    Requires pyspark.ml (available in any Spark distribution). At lake
    scale the corpus table is written clustered by ``centroid_id`` so each
    probe is a partition-pruned scan.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("qv"),
    )

    # random init, not k-means||: the parallel init runs extra distributed
    # passes whose quality payoff is irrelevant for coarse IVF cells (any
    # balanced partition works — queries probe nprobe cells regardless),
    # and a couple of Lloyd iterations on the sample converge the cells.
    km = KMeans(
        k=n_centroids, seed=seed, maxIter=3, initMode="random",
        featuresCol="feat", predictionCol="centroid_id",
    )
    # Train on a bounded sample (coreset): KMeans quality needs only a few
    # hundred points per centroid, while fitting on the full corpus makes
    # training cost scale with corpus size — the classic IVF recipe trains
    # on a sample and assigns the full corpus. Deterministic via seed.
    feat = c.withColumn("feat", array_to_vector("cv"))
    target = n_centroids * 512
    # count the raw corpus (metadata-only on parquet sources), not the
    # vectorized projection — counting `feat` would materialize the
    # array→vector transform over the whole corpus just to size the sample
    n_corpus = corpus.count()
    train = (
        feat.sample(fraction=min(1.0, target / n_corpus), seed=seed)
        if n_corpus > target
        else feat
    )
    model = km.fit(train)
    assigned = model.transform(feat).select("neighbor_id", "cv", "centroid_id")

    centroids = [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())]
    spark = corpus.sparkSession
    from mallarddv_spark.functions.litframe import literal_frame

    cent_df = literal_frame(
        spark, centroids, "centroid_id bigint, centroid array<double>"
    )

    # nprobe nearest centroids per query (euclidean), via broadcast
    qc = q.crossJoin(F.broadcast(cent_df)).withColumn(
        "dist",
        F.expr(
            "aggregate(zip_with(qv, centroid, (x, y) -> (x - y) * (x - y)), "
            "cast(0.0 as double), (acc, x) -> acc + x)"
        ),
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("centroid_id"))
    probes = (
        qc.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )

    cand = probes.join(assigned, "centroid_id").withColumn(
        "cosine",
        F.expr(
            f"round({_DOT.format(a='qv', b='cv')} / "
            f"(sqrt({_DOT.format(a='qv', b='qv')}) * sqrt({_DOT.format(a='cv', b='cv')})), 6)"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
) -> dict:
    """Materialize an IVF index on disk: the corpus written **partitioned by
    centroid_id** plus a small centroid table, so probes become
    partition-pruned scans instead of full-corpus reads.

    Layout under ``path``::

        cells/centroid_id=<i>/*.parquet   (neighbor_id, cv: array<double>)
        centroids/*.parquet               (centroid_id, centroid)

    Training mirrors :func:`ivf_topk` exactly (same KMeans config, same
    bounded sample, same seed) so a probe over the stored index returns the
    same results as the in-memory variant. This is the lake-scale shape: at
    100 TB the ``cells`` write is one shuffle-free pass (each task writes
    its rows into per-cell files) and every later probe touches only
    ``nprobe × |queries|`` cells out of ``n_centroids``.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("cv"),
    )
    km = KMeans(
        k=n_centroids, seed=seed, maxIter=3, initMode="random",
        featuresCol="feat", predictionCol="centroid_id",
    )
    feat = c.withColumn("feat", array_to_vector("cv"))
    target = n_centroids * 512
    n_corpus = corpus.count()
    train = (
        feat.sample(fraction=min(1.0, target / n_corpus), seed=seed)
        if n_corpus > target
        else feat
    )
    model = km.fit(train)
    assigned = model.transform(feat).select("neighbor_id", "cv", "centroid_id")
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{path}/cells"
    )

    spark = corpus.sparkSession
    centroids = [
        (i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())
    ]
    from mallarddv_spark.functions.litframe import literal_frame

    literal_frame(
        spark, centroids, "centroid_id bigint, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return {"path": path, "n_centroids": n_centroids, "n_rows": n_corpus}


_IVF_SUBDIRS = ("cells", "centroids")


def heal_ivf_index(spark, path: str) -> dict[str, str]:
    """Resolve an :func:`ivf_index_compact` interrupted mid-swap (same
    staged-rename protocol and state machine as the MinHash index — see
    ``sources.layout.heal_dir_swap``). Invoked automatically whenever the
    index is opened (append / probe / compact) and on demand via the
    facade's ``recover(ivf_index_paths=...)``."""
    from mallarddv_spark.sources import layout

    healed: dict[str, str] = {}
    for sub in _IVF_SUBDIRS:
        action = layout.heal_dir_swap(spark, f"{path}/{sub}")
        if action:
            healed[sub] = action
    return healed


def _ivf_centroids(spark, path: str) -> DataFrame:
    """Open the stored centroid table, healing any torn compaction swap
    first so append/probe always resolve a complete index."""
    heal_ivf_index(spark, path)
    return spark.read.parquet(f"{path}/centroids")


def ivf_index_compact(spark, path: str, target_rows_per_file: int = 4_000_000) -> dict:
    """Maintenance for an append-heavy IVF index: every :func:`ivf_append`
    lands a handful of files per touched cell, and after N crawl batches a
    probe's partition-pruned scan is metadata-bound on thousands of tiny
    files. Rewrites ``cells`` with one file per cell (cells are
    independent, so the rewrite is one shuffle-free pass repartitioned on
    the partition column), swapped live via the crash-safe staged-rename
    protocol shared with table compaction and the MinHash index
    (``sources.layout.swap_dir_live``; torn swaps heal on next open or via
    ``recover(ivf_index_paths=...)``). Also drops duplicate
    ``neighbor_id`` rows a re-appended batch stored twice."""
    from mallarddv_spark.sources import layout

    out: dict = {"healed": heal_ivf_index(spark, path)}
    d = f"{path}/cells"
    cells = spark.read.parquet(d)
    before = cells.count()
    deduped = (
        cells.dropDuplicates(["neighbor_id", "centroid_id"])
        .repartition("centroid_id")
    )
    staged = f"{d}__compact"
    # one file per cell, unless a cell outgrows target_rows_per_file —
    # then the writer rolls to additional files to bound file size
    deduped.write.mode("overwrite").option(
        "maxRecordsPerFile", target_rows_per_file
    ).partitionBy("centroid_id").parquet(staged)
    after = spark.read.parquet(staged).count()
    layout.swap_dir_live(spark, d)
    out["cells"] = {"rows_before": before, "rows_after": after}
    return out


def ivf_append(
    new_rows: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally assign appended corpus rows against the *stored*
    centroids and append them to the matching cells — no retraining, no
    rewrite of existing cells. Nearest centroid by squared euclidean with
    centroid_id tiebreak (KMeans transform semantics up to exact ties)."""
    spark = new_rows.sparkSession
    cent = _ivf_centroids(spark, path)
    rows = new_rows.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("cv"),
    )
    dist = F.expr(
        "aggregate(zip_with(cv, centroid, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("neighbor_id").orderBy(F.asc("dist"), F.asc("centroid_id"))
    assigned = (
        rows.crossJoin(F.broadcast(cent))
        .withColumn("dist", dist)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("neighbor_id", "cv", "centroid_id")
    )
    assigned.write.mode("append").partitionBy("centroid_id").parquet(f"{path}/cells")


def ivf_probe_topk(
    queries: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """Probe a :func:`build_ivf_index` index: pick the ``nprobe`` nearest
    stored centroids per query, then scan ONLY those cells (a static
    ``centroid_id IN (...)`` filter on the partition column → partition
    pruning at the file-source level) and exact-rerank by cosine.

    The probed-cell set is collected to the driver first — it is bounded by
    ``n_centroids`` (control metadata, like the engine's transition-table
    reads), and turning it into a literal IN-filter is what makes the scan
    prunable without relying on runtime DPP.
    """
    spark = queries.sparkSession
    cent = _ivf_centroids(spark, path)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("qv"),
    )
    dist = F.expr(
        "aggregate(zip_with(qv, centroid, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("centroid_id"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("dist", dist)
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    probed_ids = sorted({r.centroid_id for r in probes.select("centroid_id").distinct().collect()})
    cells = spark.read.parquet(f"{path}/cells").filter(
        F.col("centroid_id").isin(probed_ids)
    )
    cand = probes.join(cells, "centroid_id").withColumn(
        "cosine",
        F.expr(
            f"round({_DOT.format(a='qv', b='cv')} / "
            f"(sqrt({_DOT.format(a='qv', b='qv')}) * sqrt({_DOT.format(a='cv', b='cv')})), 6)"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_topk_deterministic(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
    centroid_mod: int = 61,
    centroid_rem: int = 10,
) -> DataFrame:
    """IVF top-k with closed-form centroids: instead of KMeans, the cell
    centers are the corpus vectors whose id satisfies
    ``id % centroid_mod == centroid_rem`` — a deterministic arithmetic
    sample (~|corpus|/mod cells, no training pass, no global sort).

    Same probe/rerank shape as :func:`ivf_topk` — assign each corpus row to
    its nearest centroid, probe the ``nprobe`` nearest cells per query,
    exact cosine rerank within probed cells. Cells are slightly worse than
    Lloyd-refined ones, but every step (assignment, probing, rerank) is a
    deterministic expression: squared distances are computed as
    ``round(|a|² + |b|² − 2a·b, 6)`` with id tiebreaks, so any engine that
    reproduces the dot products reproduces the probe sets and results
    bit-for-bit — this is the variant the oracle-checked gate runs.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("qv"),
    )
    cent = corpus.filter(
        F.pmod(F.col(id_col), F.lit(centroid_mod)) == centroid_rem
    ).select(
        F.col(id_col).alias("centroid_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("centroid"),
    )

    def dist6(a: str, b: str) -> F.Column:
        return F.expr(
            f"round({_DOT.format(a=a, b=a)} + {_DOT.format(a=b, b=b)}"
            f" - 2 * {_DOT.format(a=a, b=b)}, 6)"
        )

    wa = Window.partitionBy("neighbor_id").orderBy(F.asc("d6"), F.asc("centroid_id"))
    assigned = (
        c.crossJoin(F.broadcast(cent))
        .withColumn("d6", dist6("cv", "centroid"))
        .withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .select("neighbor_id", "cv", "centroid_id")
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("d6"), F.asc("centroid_id"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("d6", dist6("qv", "centroid"))
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    cand = probes.join(assigned, "centroid_id").withColumn(
        "cosine",
        F.expr(
            f"round({_DOT.format(a='qv', b='cv')} / "
            f"(sqrt({_DOT.format(a='qv', b='qv')}) * sqrt({_DOT.format(a='cv', b='cv')})), 6)"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization — the 4x storage/bandwidth lever for a 100 TB
# embedding corpus (float32 -> int8 per component, per-vector scale)
# ---------------------------------------------------------------------------


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q_embedding",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization:
    ``q_i = round(v_i / s) with s = max(|v|)/127`` — the standard
    faiss-style SQ8 layout. Adds ``out_col: array<tinyint>`` and
    ``scale_col: double``; dequantization is ``q_i * s``.

    Pure array expressions (one projection, no shuffle, no Python). At
    lake scale the quantized corpus is what gets stored and scanned —
    4x less I/O per ANN probe — while reranking against the float
    source-of-truth stays available for the top candidates. Cosine
    rankings survive quantization well because the per-vector scale
    cancels in the similarity up to rounding; see
    :func:`cosine_topk_quantized` for the probe that consumes this.

    All-zero vectors get scale 0 and all-zero codes (dequantizes to the
    same zero vector rather than NaN).
    """
    v = f"transform({vec_col}, x -> cast(x as double))"
    s = f"aggregate({v}, cast(0.0 as double), (a, x) -> greatest(a, abs(x))) / 127.0d"
    return df.withColumn(scale_col, F.expr(s)).withColumn(
        out_col,
        F.expr(
            f"CASE WHEN {scale_col} = 0.0d THEN "
            f"transform({v}, x -> cast(0 as tinyint)) "
            f"ELSE transform({v}, x -> cast(round(x / {scale_col}) as tinyint)) END"
        ),
    )


def dequantize_embeddings(
    df: DataFrame,
    q_col: str = "q_embedding",
    scale_col: str = "q_scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``v_i ≈ q_i * s`` as
    ``array<double>``."""
    return df.withColumn(
        out_col,
        F.expr(f"transform({q_col}, x -> cast(x as double) * {scale_col})"),
    )


def cosine_topk_quantized(
    queries: DataFrame,
    corpus_q: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_col: str = "q_embedding",
    scale_col: str = "q_scale",
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k where the CORPUS side is int8-quantized
    (:func:`quantize_embeddings`) and only the queries are float: the
    int8 codes dequantize on the fly inside the dot product, so the scan
    reads 1/4 the bytes of the float corpus. Same shape as
    :func:`cosine_topk_bruteforce` — query side broadcast, corpus never
    shuffled. Rankings are approximate only up to int8 rounding."""
    q = _normed(queries, id_col, vec_col, "query_id").withColumnRenamed(
        "v", "qv"
    ).withColumnRenamed("norm", "qn")
    c = dequantize_embeddings(
        corpus_q, q_col, scale_col, "__cv"
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__cv").alias("cv"),
        F.expr(
            "sqrt(aggregate(__cv, cast(0.0 as double), (a, x) -> a + x * x))"
        ).alias("cn"),
    )
    pairs = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        F.expr(
            f"CASE WHEN cn = 0.0d OR qn = 0.0d THEN 0.0d "
            f"ELSE round({_DOT.format(a='qv', b='cv')} / (qn * cn), 6) END"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# product quantization (Jégou et al. 2011) — ANN memory-compression tier
# ---------------------------------------------------------------------------


def adc_table_expr(vec_expr: str, dsub: int) -> str:
    """SQL expression for a query's ADC distance table over the broadcast
    codebook column ``__cb``: ``table[s][j]`` = squared distance of the
    vector's s-th subvector to codebook entry j. ``vec_expr`` is the SQL
    for the (residual) query vector. Shared by :func:`pq_topk_adc`,
    :func:`ivfpq_probe_topk`, and the suite's oracle-checked gate parts,
    so the gate always validates the production arithmetic."""
    return (
        f"transform(__cb, (sub_cb, s) -> transform(sub_cb, c_arr -> "
        f"aggregate(zip_with(slice({vec_expr}, s * {dsub} + 1, {dsub}), c_arr, "
        f"(x, y) -> (x - y) * (x - y)), cast(0.0 as double), (a, x) -> a + x)))"
    )


def adc_dist_expr(codes_expr: str) -> str:
    """SQL expression for a candidate's ADC distance: its m code ids
    looked up in the in-scope table column ``__t`` and summed, rounded
    to 6 decimals (the cross-engine comparison precision)."""
    return (
        f"round(aggregate(transform({codes_expr}, (cd, s) -> "
        f"element_at(element_at(__t, s + 1), cd + 1)), "
        f"cast(0.0 as double), (a, x) -> a + x), 6)"
    )


def pq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    sample_per_code: int = 256,
) -> DataFrame:
    """Train product-quantization codebooks: the vector splits into ``m``
    subvectors, each sub-space gets its own ``n_codes``-centroid KMeans
    codebook (trained on a bounded sample — the classic recipe; training
    cost is independent of corpus size).

    Returns ONE row ``(cb array<array<array<double>>>, m, dsub, n_codes)``
    — codebooks are tiny (m·n_codes·dsub doubles), so they broadcast and
    persist as a single parquet row, the same shape as the stored Bloom
    filter and IVF centroid table. A 64-dim float corpus encoded at
    m=8, n_codes=256 stores 8 bytes per vector instead of 256 — the
    32x compression that makes a 100 TB embedding corpus scannable.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from mallarddv_spark.exceptions import DVConfigurationError

    first = corpus.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise DVConfigurationError("pq_train: empty corpus")
    dim = int(first.d)
    if dim % m != 0:
        raise DVConfigurationError(
            f"pq_train: dim {dim} not divisible by m={m}"
        )
    dsub = dim // m

    target = n_codes * sample_per_code
    n_corpus = corpus.count()
    base = corpus.select(
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v")
    )
    sample = (
        base.sample(fraction=min(1.0, target / n_corpus), seed=seed)
        if n_corpus > target
        else base
    )
    # one cached sample, m sequential small fits (m is 4-16; each fit
    # sees only the sample) — training never touches the full corpus
    sample = sample.localCheckpoint(eager=True)
    books = []
    for s in range(m):
        sub = sample.select(
            array_to_vector(
                F.expr(f"slice(v, {s * dsub + 1}, {dsub})")
            ).alias("feat")
        )
        km = KMeans(
            k=n_codes, seed=seed + s, maxIter=5, initMode="random",
            featuresCol="feat", predictionCol="c",
        )
        model = km.fit(sub)
        books.append([[float(x) for x in ctr] for ctr in model.clusterCenters()])

    from mallarddv_spark.functions.litframe import literal_frame

    spark = corpus.sparkSession
    return literal_frame(
        spark,
        [(books, m, dsub, n_codes)],
        "cb array<array<array<double>>>, m int, dsub int, n_codes int",
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
    geometry: tuple[int, int, int] | None = None,
) -> DataFrame:
    """Add ``codes_col array<int>`` — each vector's ``m`` nearest-
    centroid code ids — alongside the input's existing columns.

    Pure expression path: the codebook row cross-joins in as a broadcast
    and the argmin over codes is an array lambda — no explode, no
    shuffle, no Python; encoding 100 TB is one codegen projection.
    The argmin is ``array_min`` over (distance, code) structs, so every
    distance is computed ONCE and ties break to the lowest code id
    (struct ordering compares the code second).

    ``geometry`` lets a caller that already knows ``(m, dsub, n_codes)``
    — anyone who just built or trained the codebooks — skip the eager
    one-row ``.first()`` geometry fetch (a Spark job per call)."""
    if geometry is not None:
        m, dsub, n_codes = (int(v) for v in geometry)
    else:
        geo = codebooks.select("m", "dsub", "n_codes").first()
        m, dsub, n_codes = int(geo.m), int(geo.dsub), int(geo.n_codes)
    v = f"transform({vec_col}, x -> cast(x as double))"
    codes = (
        f"transform(sequence(0, {m - 1}), s -> "
        f"array_min(transform(sequence(0, {n_codes - 1}), j -> "
        f"  struct("
        f"    aggregate(zip_with(slice({v}, s * {dsub} + 1, {dsub}), "
        f"      element_at(element_at(__cb, s + 1), j + 1), "
        f"      (x, y) -> (x - y) * (x - y)), cast(0.0 as double), (a, x) -> a + x) AS d, "
        f"    j AS j))).j)"
    )
    return (
        corpus.crossJoin(F.broadcast(codebooks.select(F.col("cb").alias("__cb"))))
        .withColumn(codes_col, F.expr(codes))
        .drop("__cb")
    )


def pq_topk_adc(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
    k: int = 5,
    geometry: tuple[int, int] | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over a PQ-encoded corpus: each query
    precomputes an m×n_codes table of squared subvector distances to
    every codebook centroid, and a document's approximate distance is m
    table lookups summed — the corpus scan reads only the code bytes.

    Returns (query_id, neighbor_id, rank, adc_dist) ranked by ascending
    distance. Queries (with their tables) broadcast; the corpus never
    shuffles — only the final per-query top-k window moves candidate
    rows. Exact rerank of the winners against the float vectors is the
    standard follow-up when the source embeddings are retained.

    ``geometry`` = ``(m, dsub)`` skips the eager one-row geometry fetch
    (see :func:`pq_encode`)."""
    if geometry is not None:
        m, dsub = (int(v) for v in geometry)
    else:
        geo = codebooks.select("m", "dsub").first()
        m, dsub = int(geo.m), int(geo.dsub)
    qv = f"transform({vec_col}, x -> cast(x as double))"
    table = adc_table_expr(qv, dsub)
    q = (
        queries.crossJoin(F.broadcast(codebooks.select(F.col("cb").alias("__cb"))))
        .select(F.col(id_col).alias("query_id"), F.expr(table).alias("__t"))
    )
    c = codes.select(
        F.col(id_col).alias("neighbor_id"), F.col(codes_col).alias("__codes")
    )
    dist = adc_dist_expr("__codes")
    pairs = c.crossJoin(F.broadcast(q)).withColumn("adc_dist", F.expr(dist))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def pq_topk_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
    k: int = 5,
    shortlist: int = 50,
) -> DataFrame:
    """The standard PQ deployment: ADC over the code bytes builds a
    ``shortlist`` of candidates per query, then ONLY those rows' float
    vectors are read back for an exact L2 rerank — the full-precision
    corpus is touched for |queries|·shortlist rows, not |corpus|.
    Measured on the synthetic embeddings (random vectors, PQ's worst
    case): raw ADC recall@5 ≈ 0.46; shortlist=50 + rerank ≈ 0.90.

    Returns (query_id, neighbor_id, rank, l2_dist) by ascending exact
    distance. The candidate set (queries × shortlist) is broadcast to
    the corpus join, so the float side is a pruned scan, never shuffled."""
    cand = pq_topk_adc(
        queries, codes, codebooks, id_col, vec_col, codes_col, k=shortlist
    ).select("query_id", "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("qv"),
    )
    cand_q = cand.join(q, "query_id")  # small: |queries| * shortlist
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("cv"),
    )
    pairs = c.join(F.broadcast(cand_q), "neighbor_id").withColumn(
        "l2_dist",
        F.expr(
            "round(aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)), "
            "cast(0.0 as double), (a, x) -> a + x), 6)"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("l2_dist"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "l2_dist")
    )


def pq_codebooks_deterministic(
    spark, m: int = 8, dsub: int = 8, n_codes: int = 16
) -> DataFrame:
    """Fixed-grid PQ codebooks from a closed-form rule —
    ``centroid[s][j][d] = (((j·31 + d·7 + s·3) mod 17) − 8) / 8`` — the
    same row shape :func:`pq_train` produces, with no training step.

    Exists for cross-engine verification (the driver gate's DuckDB
    oracle replays the rule, the encode argmin, and the ADC sums in
    SQL), mirroring ``ivf_topk_deterministic``; recall of the arbitrary
    grid is far below trained codebooks, but every downstream code path
    (encode, ADC, rerank) is identical."""
    books = [
        [
            [float((((j * 31 + d * 7 + s * 3) % 17) - 8) / 8.0)
             for d in range(dsub)]
            for j in range(n_codes)
        ]
        for s in range(m)
    ]
    from mallarddv_spark.functions.litframe import literal_frame

    return literal_frame(
        spark,
        [(books, m, dsub, n_codes)],
        "cb array<array<array<double>>>, m int, dsub int, n_codes int",
    )


def _assign_residuals(rows: DataFrame, cent: DataFrame) -> DataFrame:
    """Assign each (neighbor_id, cv) row to its nearest stored centroid
    (squared euclidean, centroid_id tiebreak) and emit the residual:
    (neighbor_id, centroid_id, rv). The single assignment rule shared by
    :func:`build_ivfpq_index` (pre-trained-centroid path) and
    :func:`ivfpq_append`, so appended rows land exactly where a fresh
    build would put them."""
    dist = F.expr(
        "aggregate(zip_with(cv, centroid, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("neighbor_id").orderBy(
        F.asc("dist"), F.asc("centroid_id")
    )
    return (
        rows.crossJoin(F.broadcast(cent))
        .withColumn("dist", dist)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "neighbor_id", "centroid_id",
            F.expr("zip_with(cv, centroid, (x, y) -> x - y)").alias("rv"),
        )
    )


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    cell_files: int | None = None,
    geometry: tuple[int, int, int] | None = None,
) -> dict:
    """IVF-PQ: the billion-scale ANN layout — coarse KMeans cells for
    partition pruning, and inside each cell only the PQ codes of the
    RESIDUAL (vector − cell centroid) are stored. Residuals concentrate
    around zero, so one shared codebook serves every cell (the classic
    IVFADC arrangement); the stored bytes per vector are m code ids
    instead of the float vector — the difference between scanning 100 TB
    of floats and ~3 TB of codes.

    Layout under ``path``::

        cells/centroid_id=<i>/*.parquet   (neighbor_id, pq_codes)
        centroids/*.parquet               (centroid_id, centroid)
        codebooks/*.parquet               (cb, m, dsub, n_codes) — 1 row

    The float source-of-truth stays wherever the caller keeps it;
    :func:`ivfpq_probe_topk` accepts it for the exact-rerank tail.

    ``centroids`` / ``codebooks``: optionally bring PRE-TRAINED coarse
    centroids ((centroid_id, centroid) rows) and/or PQ codebooks (the
    one-row frame :func:`pq_train` / :func:`pq_codebooks_deterministic`
    produce) instead of training here — the standard large-corpus
    arrangement (train once offline on a sample, reuse across builds),
    and what lets the driver gate replay a stored build in closed-form
    SQL. With ``centroids`` given, assignment uses the same stored-
    centroid argmin as :func:`ivfpq_append`. ``geometry`` =
    ``(m, dsub, n_codes)`` of a passed-in ``codebooks`` frame skips the
    encode's eager geometry fetch (see :func:`pq_encode`)."""
    spark = corpus.sparkSession
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("cv"),
    )
    # the two bookkeeping counts are only consumed by the returned dict
    # on the pre-trained path — defer them into the overlapped job block
    # below; the KMeans path needs n_corpus up front (sample fraction).
    n_corpus = None
    if centroids is not None:
        cent_df = centroids.select(
            F.col("centroid_id").cast("int").alias("centroid_id"),
            F.expr(
                "transform(centroid, x -> cast(x as double))"
            ).alias("centroid"),
        )
        n_centroids = None
        resid = _assign_residuals(c, cent_df)
    else:
        n_corpus = corpus.count()
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        km = KMeans(
            k=n_centroids, seed=seed, maxIter=3, initMode="random",
            featuresCol="feat", predictionCol="centroid_id",
        )
        feat = c.withColumn("feat", array_to_vector("cv"))
        target = n_centroids * 512
        train = (
            feat.sample(fraction=min(1.0, target / n_corpus), seed=seed)
            if n_corpus > target
            else feat
        )
        model = km.fit(train)
        assigned = model.transform(feat).select(
            "neighbor_id", "cv", "centroid_id"
        )

        trained = [
            (i, [float(x) for x in ctr])
            for i, ctr in enumerate(model.clusterCenters())
        ]
        from mallarddv_spark.functions.litframe import literal_frame

        cent_df = literal_frame(
            spark, trained, "centroid_id bigint, centroid array<double>"
        )

        resid = assigned.join(F.broadcast(cent_df), "centroid_id").select(
            "neighbor_id", "centroid_id",
            F.expr("zip_with(cv, centroid, (x, y) -> x - y)").alias("rv"),
        )
    books = (
        codebooks
        if codebooks is not None
        else pq_train(resid, vec_col="rv", m=m, n_codes=n_codes, seed=seed)
    )
    enc = pq_encode(resid, books, vec_col="rv", geometry=geometry)
    out = enc.select("neighbor_id", "centroid_id", "pq_codes")
    if cell_files is not None:
        # one shuffle keyed on the cell → each cell lands in exactly one
        # task → one file per cell. Right for SMALL builds (a gate, a
        # pilot index) where the dynamic-partition commit of
        # tasks × cells tiny files dominates; leave None at scale — a
        # billion-row cell should NOT be forced through one task.
        out = out.repartition(int(cell_files), "centroid_id")
    # the three section writes (disjoint directories) and the two
    # bookkeeping counts are independent jobs that otherwise run back to
    # back on a mostly-idle scheduler — overlap them (small fixed pool;
    # each job's own tasks still fan out across the executor).
    from concurrent.futures import ThreadPoolExecutor

    def _w_cells():
        out.write.mode("overwrite").partitionBy("centroid_id").parquet(
            f"{path}/cells"
        )

    def _w_cent():
        cent_df.coalesce(1).write.mode("overwrite").parquet(
            f"{path}/centroids"
        )

    def _w_books():
        books.coalesce(1).write.mode("overwrite").parquet(
            f"{path}/codebooks"
        )

    with ThreadPoolExecutor(max_workers=5) as pool:
        futs = [pool.submit(f) for f in (_w_cells, _w_cent, _w_books)]
        f_nc = pool.submit(corpus.count) if n_corpus is None else None
        f_k = pool.submit(cent_df.count) if n_centroids is None else None
        for f in futs:
            f.result()
        if f_nc is not None:
            n_corpus = f_nc.result()
        if f_k is not None:
            n_centroids = f_k.result()
    return {
        "path": path, "n_centroids": n_centroids, "m": m,
        "n_codes": n_codes, "n_rows": n_corpus,
    }


def ivfpq_probe_topk(
    queries: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
    rerank_corpus: DataFrame | None = None,
    shortlist: int = 50,
) -> DataFrame:
    """Probe a :func:`build_ivfpq_index`: the ``nprobe`` nearest cells per
    query are read partition-pruned (static ``centroid_id IN`` filter,
    same mechanism as :func:`ivf_probe_topk`), each (query, cell) pair
    precomputes its RESIDUAL distance table (the query residual differs
    per cell), and candidate distances are m table lookups over the code
    bytes. With ``rerank_corpus`` (the float source) the top
    ``shortlist`` ADC candidates per query are exactly reranked and the
    result carries true L2 distances; without it, ADC distances rank.

    Returns (query_id, neighbor_id, rank, dist)."""
    spark = queries.sparkSession
    cent = spark.read.parquet(f"{path}/centroids")
    books = spark.read.parquet(f"{path}/codebooks")

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("qv"),
    )
    dist = F.expr(
        "aggregate(zip_with(qv, centroid, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("centroid_id"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("dist", dist)
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "qv", "centroid_id", "centroid")
    )
    # the geometry fetch and the cell-pruning collect are independent
    # eager jobs — overlap them instead of paying two serial round-trips
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_dsub = pool.submit(lambda: int(books.select("dsub").first().dsub))
        f_ids = pool.submit(
            lambda: sorted(
                {
                    r.centroid_id
                    for r in probes.select("centroid_id").distinct().collect()
                }
            )
        )
        dsub = f_dsub.result()
        probed_ids = f_ids.result()
    # per-(query, cell) residual distance table over the shared codebook
    table = adc_table_expr("zip_with(qv, centroid, (x, y) -> x - y)", dsub)
    probes_t = probes.crossJoin(
        F.broadcast(books.select(F.col("cb").alias("__cb")))
    ).select("query_id", "qv", "centroid_id", F.expr(table).alias("__t"))
    cells = spark.read.parquet(f"{path}/cells").filter(
        F.col("centroid_id").isin(probed_ids)
    )
    adc = adc_dist_expr("pq_codes")
    cand = cells.join(F.broadcast(probes_t), "centroid_id").withColumn(
        "adc_dist", F.expr(adc)
    )
    n_keep = shortlist if rerank_corpus is not None else k
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    top = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_keep)
    )
    if rerank_corpus is None:
        return top.select(
            "query_id", "neighbor_id", "rank",
            F.col("adc_dist").alias("dist"),
        )
    c = rerank_corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("cv"),
    )
    pairs = c.join(
        F.broadcast(top.select("query_id", "neighbor_id", "qv")), "neighbor_id"
    ).withColumn(
        "l2_dist",
        F.expr(
            "round(aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)), "
            "cast(0.0 as double), (a, x) -> a + x), 6)"
        ),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.asc("l2_dist"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.col("l2_dist").alias("dist"))
    )


def ivfpq_append(
    new_rows: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_files: int | None = None,
    geometry: tuple[int, int, int] | None = None,
) -> None:
    """Incrementally add vectors to a :func:`build_ivfpq_index`: assign
    each against the STORED centroids (nearest squared-euclidean,
    centroid_id tiebreak), encode its residual against the STORED
    codebooks, append the codes to the matching cells. No retraining —
    the continuous-ingest path; code quality for the new rows matches
    the original build because residual codebooks are cell-agnostic.
    Same at-least-once caveat as :func:`ivf_append`: replays append
    duplicate ids (probes then surface the duplicate; dedup on id
    downstream or compact)."""
    spark = new_rows.sparkSession
    cent = spark.read.parquet(f"{path}/centroids")
    books = spark.read.parquet(f"{path}/codebooks")
    rows = new_rows.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("cv"),
    )
    resid = _assign_residuals(rows, cent)
    enc = pq_encode(resid, books, vec_col="rv", geometry=geometry)
    out = enc.select("neighbor_id", "centroid_id", "pq_codes")
    if cell_files is not None:
        # see build_ivfpq_index: small-batch file-churn control
        out = out.repartition(int(cell_files), "centroid_id")
    out.write.mode("append").partitionBy("centroid_id").parquet(
        f"{path}/cells"
    )
