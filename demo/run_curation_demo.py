"""Runnable end-to-end demo of the training-data curation pipeline — the
LLM-corpus half of the engine, chained over the synthetic documents and
embeddings tables:

    python demo/run_curation_demo.py [sf_dir]       (default sf0.001)

Pipeline (each stage is a pure DataFrame transform; at lake scale the
same code runs over a 100 TB corpus):

1. profile    — per-doc quality/lang/token stats in ONE scan
   + URL gate — canonical-URL dedup (the cheapest crawl screen) before
                any content work
2. clean      — corpus-level boilerplate line removal (CCNet-style)
3. quality    — Gopher/C4-style threshold filter, then the HOST screen
                (per-source profile; whole sources below the bar drop
                — the C4-blocklist / RefinedWeb per-domain discipline),
                a seeded host-TrustRank pass over the inter-host link
                graph, and a trained Adagrad LR quality classifier
                scored with GPT-3's Pareto stochastic admission
4. dedup      — exact + MinHash-LSH near-dup, connected-components
                cluster verdicts (keep one doc per near-dup cluster),
                then a containment pass dropping fragments included in
                a larger surviving document
5. decontam   — n-gram overlap against a benchmark set
6. fluency    — Kneser-Ney LM scoring + CCNet head/middle/tail buckets
                (approximate percentile thresholds — the corpus-scale
                mode)
7. tokenize   — BPE tokenizer TRAINED on the surviving corpus; its
                real token counts drive everything downstream, plus a
                WordPiece bake-off scored by tokenizer_stats
                (fertility / compression / OOV)
8. split/mix  — deterministic train/val split + token-budget mixing,
                then the UniMax alternative (Chung et al. 2023):
                epoch-capped waterfilling allocation materialized into
                an epoch-expanded corpus
9. pack       — fixed-length training sequences
10. search    — BM25 inverted index over the final corpus (the
                targeted-inspection path for a 100 TB lake), hybrid
                cosine rerank, and rank-only RRF fusion of the lexical
                and dense runs
"""

import os
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from pyspark.sql import functions as F  # noqa: E402

from mallarddv_spark import get_spark  # noqa: E402
from mallarddv_spark.operators import curation, dedup, graph, textops  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        warehouse_dir=os.path.join(tempfile.mkdtemp(prefix="cur_demo_"), "wh"),
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()

    # 1. profile: one-scan per-doc stats
    profile = textops.text_profile(docs, "doc_id", "text")
    print(f"-- profile ({n0} docs) --")
    profile.select("doc_id", "n_tokens", "quality", "lang_guess").show(
        3, truncate=False
    )

    # 1a. trained language-ID (the CCNet/fastText stage): a softmax
    # classifier over hashed n-grams, trained on the corpus's own
    # labels, replaces the marker-word vote in the SAME profile column
    lang_model = curation.train_softmax_classifier(
        docs, "lang", "text", buckets=2048, iters=15, lr=2.0
    )
    trained_prof = textops.text_profile(
        docs, "doc_id", "text", lang_model=lang_model
    )
    agree = (
        trained_prof.select("doc_id", "lang_guess")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(F.avg((F.col("lang") == F.col("lang_guess"))
                      .cast("double")))
        .first()[0]
    )
    maj = (
        docs.groupBy("lang").count().agg(F.max("count")).first()[0] / n0
    )
    # the synthetic corpus's lang labels are text-INDEPENDENT, so the
    # achievable ceiling here is the majority share — the planted-corpus
    # >=99% accuracy check lives in tests/test_softmax_classifier.py
    print(f"-- trained lang-ID: {len(lang_model['classes'])} classes,"
          f" final loss {lang_model['loss_history'][-1]:.3f},"
          f" label agreement {agree:.3f}"
          f" (majority baseline {maj:.3f}; labels are synthetic) --")

    # 1b. URL gate: the cheapest dedup a crawl has — canonicalize and
    # keep one doc per address BEFORE any content work (the synthetic
    # corpus carries no URLs, so the demo synthesizes a realistic mess:
    # tracking params, www/port/case variants; doc_id % 3 == 2 rows
    # share an address with doc_id - 2)
    with_urls = docs.withColumn(
        "url",
        F.expr(
            "CASE WHEN doc_id % 3 = 2 THEN concat('https://WWW.crawl.example"
            ".com:443/d/', cast(doc_id - 2 AS string), '?utm_source=feed')"
            " ELSE concat('https://crawl.example.com/d/',"
            " cast(doc_id AS string)) END"
        ),
    )
    uv = curation.url_dedup(with_urls, "doc_id", "url")
    docs = docs.join(
        uv.filter("NOT keep").select(F.col("id").alias("doc_id")),
        "doc_id", "left_anti",
    )
    nu = docs.count()
    print(f"-- url gate: {n0} -> {nu} docs "
          f"({n0 - nu} refetched addresses dropped) --")

    # 2. clean: corpus-level boilerplate removal (3-token windows stand in
    # for lines in the single-line synthetic corpus)
    toks = F.split("text", " ")
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(3))
    lines = F.transform(starts, lambda s: F.concat_ws(" ", F.slice(toks, s, 3)))
    relined = docs.select("doc_id", F.array_join(lines, "\n").alias("text"))
    # min_dup_docs=5: boilerplate means MANY documents share the line;
    # a lower bar would also strip content shared by near-dup pairs,
    # which the fuzzy-dedup stage below exists to handle
    cleaned = curation.remove_duplicated_lines(
        relined, "doc_id", "text", min_dup_docs=5
    )
    dropped = cleaned.agg(F.sum("lines_dropped")).first()[0]
    print(f"-- clean: dropped {dropped} duplicated corpus lines --")
    # the cleaned corpus (boilerplate lines removed, newlines back to
    # spaces) is what every later stage consumes
    # cache the stage boundaries every later stage fans out from — the
    # demo's point is the pipeline shape, not recomputing a 10-stage
    # lineage per printed count (at 100 TB these would be materialized
    # parquet checkpoints between jobs, not .cache())
    docs = cleaned.select(
        F.col("id").alias("doc_id"),
        F.regexp_replace("text", "\n", " ").alias("text"),
    ).join(docs.select("doc_id", "lang", "source"), "doc_id").cache()

    # 3. quality filter (thresholds tuned to the synthetic corpus,
    # which has no stopwords — disable the fluency rule)
    kept_q = textops.quality_filter(
        docs, "text",
        rules={"min_tokens": 5, "min_stopword_ratio": None,
               "min_mean_token_len": None, "max_dup_token_ratio": None},
    ).filter("qf_keep").drop("qf_keep", "qf_reasons")
    nq = kept_q.count()
    print(f"-- quality: {nu} -> {nq} docs --")

    # 3b. host screen: per-source profile, then drop WHOLE sources whose
    # short-doc share is extreme (the decision unit is the host, not the
    # doc — C4 blocklists, RefinedWeb per-domain quality)
    stats = curation.source_stats(kept_q, short_tokens=40)
    print("-- host screen: worst 3 sources by short-doc share --")
    stats.orderBy(F.desc("short_frac")).select(
        "source", "n_docs", "short_frac", "mean_quality"
    ).show(3)
    kept_q = curation.source_filter(
        kept_q, short_tokens=40, max_short_frac=0.6
    ).drop("mean_quality", "short_frac").cache()
    nh = kept_q.count()
    print(f"-- host screen: {nq} -> {nh} docs --")

    # 3c. host PageRank: a TrustRank pass over the inter-host link graph
    # (synthesized here from doc-id arithmetic; a real crawl extracts it
    # from hrefs). Seeded at the host with the most docs — hosts
    # unreachable from trusted seeds decay toward zero rank, the signal
    # a pipeline weights or drops crawl sources by.
    hosts = kept_q.groupBy("source").count()
    hlinks = (
        kept_q.select(
            "source",
            F.concat(F.lit("src"),
                     (F.abs(F.xxhash64("doc_id")) % 20)
                     .cast("string")).alias("dst"),
        )
        .filter(F.col("source") != F.col("dst"))
        .distinct()
    )
    seed_host = hosts.orderBy(F.desc("count"), "source").limit(1).select(
        F.col("source").alias("node")
    )
    hranks = graph.pagerank(
        hlinks, src="source", dst="dst", tol=1e-8, max_iter=150,
        seeds=seed_host,
    )
    print("-- host TrustRank (seeded at the largest host) --")
    hranks.orderBy(F.desc("rank")).show(5)

    # 3d. trained quality classifier: an Adagrad LR model over hashed
    # n-grams (the fastText/GPT-3 shape) fit on weak labels — here the
    # rule-based screen's own verdicts on a labeled slice — then scored
    # over everything with the GPT-3 Pareto stochastic admission, which
    # keeps high scorers almost surely and low scorers with
    # heavy-tailed luck (corpus stays diverse).
    weak = docs.select(
        "doc_id", "text",
        (F.length("text") > 120).cast("int").alias("y"),
    )
    lr_model = curation.train_lr_classifier(
        weak, "y", "text", buckets=2048, iters=15
    )
    scored = curation.lr_classify(kept_q, "doc_id", "text", lr_model)
    admitted = scored.filter(
        curation.pareto_keep("score", "doc_id", alpha=9.0)
    )
    print(f"-- LR quality screen: loss {lr_model['loss_history'][0]:.3f}"
          f" -> {lr_model['loss_history'][-1]:.3f};"
          f" pareto admits {admitted.count()}/{scored.count()} --")

    # 4. near-dup dedup: LSH pairs -> connected components -> keep one per
    # cluster
    pairs = dedup.minhash_lsh_pairs(
        kept_q, "doc_id", "text", threshold=0.7, num_perm=32, bands=8
    )
    verdicts = graph.dedup_assign(kept_q, "doc_id", pairs)
    survivors = kept_q.join(
        verdicts.filter("NOT keep").select(F.col("id").alias("doc_id")),
        "doc_id",
        "left_anti",
    )
    nd = survivors.count()
    print(f"-- dedup: {nq} -> {nd} docs ({nq - nd} near-dups removed) --")

    # 4b. containment pass: fragments substantially INCLUDED in a larger
    # surviving document (quotes, partial copies) — the axis symmetric
    # Jaccard under-scores; drop the contained (smaller) side
    cont = dedup.containment_pairs(
        survivors, "doc_id", "text", shingle_size=3, threshold=0.8
    )
    contained = cont.selectExpr(
        "CASE WHEN sz_a <= sz_b THEN doc_a ELSE doc_b END AS doc_id"
    ).distinct()
    ncont = contained.count()
    survivors = survivors.join(contained, "doc_id", "left_anti").cache()
    print(f"-- containment: {ncont} contained fragments removed --")

    # 5. decontamination against a small "benchmark" (here: a sample of
    # the corpus itself, guaranteeing hits to show the mechanism).
    # 5a. FIRST the kilobyte-scale KMV overlap audit: sketch the 3-gram
    # shingle sets of corpus and benchmark, estimate their Jaccard /
    # intersection from the two sketches alone — at 100 TB this decides
    # whether the full decontamination pass is worth scheduling at all
    from mallarddv_spark.functions import sketches as sk

    bench = docs.orderBy("doc_id").limit(5)
    shingle = (
        "transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), "
        "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
    )
    corp_sh = survivors.selectExpr(f"explode({shingle}) AS sh")
    bench_sh = bench.selectExpr(f"explode({shingle}) AS sh")
    audit = sk.kmv_set_estimates(
        sk.kmv_sketch(corp_sh, "sh", k=512),
        sk.kmv_sketch(bench_sh, "sh", k=512),
        k=512,
    ).first()
    print(f"-- overlap audit (KMV k=512): est corpus∪bench shingles "
          f"{audit.est_union}, est shared {audit.est_intersection} "
          f"(J={audit.jaccard}) -> run the full pass --")
    contam = curation.decontaminate(survivors, bench, "doc_id", "text")
    nc = contam.filter("contaminated").count()
    print(f"-- decontam: {nc} docs flagged against the benchmark --")
    survivors = survivors.join(
        contam.filter("contaminated").select("doc_id"), "doc_id", "left_anti"
    )

    # 6. LM fluency (interpolated Kneser-Ney — the KenLM-family smoothing
    # CCNet uses) + CCNet head/middle/tail buckets per lang, in the
    # APPROXIMATE mode (percentile thresholds broadcast — the 100 TB
    # path; exact ntile stays available for small corpora)
    lm = textops.train_bigram_lm(survivors, "text")
    scored = textops.score_kn_logprob(
        survivors, "doc_id", "text", lm
    ).join(survivors.select(F.col("doc_id").alias("id"), "lang"), "id")
    buckets = textops.perplexity_buckets(scored, by="lang", exact=False)
    print("-- CCNet buckets (per lang, KN-scored, approx thresholds) --")
    buckets.groupBy("lang", "ppl_label").count().orderBy(
        "lang", "ppl_label"
    ).show(9)

    # 7. BPE tokenizer trained ON the surviving corpus; its token counts
    # (not the whitespace approximation) drive the budget/mix/pack below
    from mallarddv_spark.operators import bpe as bpe_ops

    # exact_rank=False is the realistic 32k-vocab trainer (batched
    # non-interacting merges — see operators/bpe.py and NOTES.md)
    bpe = bpe_ops.train_bpe(survivors, "text", num_merges=30,
                            exact_rank=False)
    encoded = bpe_ops.bpe_encode(survivors, "doc_id", "text", bpe).select(
        "doc_id", "n_tokens"
    )
    print(f"-- tokenize: {len(bpe['merges'])} BPE merges, "
          f"first 5 = {bpe['merges'][:5]} --")

    # 7a. byte-level (GPT-2) variant on the same corpus: space-carrying
    # tokens, no OOV, lossless byte round-trip
    bl = bpe_ops.train_bpe(survivors, "text", num_merges=30,
                           byte_level=True, lowercase=False,
                           exact_rank=False)
    probe = survivors.select("doc_id", "text").first()
    sample = bpe_ops.bpe_encode(
        survivors.filter(F.col("doc_id") == probe.doc_id),
        "doc_id", "text", bl,
    ).first()
    rt_ok = bpe_ops.decode_byte_tokens(sample.tokens) == probe.text
    print(f"-- byte-level BPE: first 5 merges = {bl['merges'][:5]}, "
          f"sample doc {sample.n_tokens} tokens, "
          f"byte round-trip {'ok' if rt_ok else 'FAILED'} --")

    # 7b. bake-off: WordPiece trained on the same corpus, both scored
    # by tokenizer_stats — the numbers a pipeline picks a vocabulary by
    from mallarddv_spark.operators.evaluation import tokenizer_stats
    from mallarddv_spark.operators.wordpiece import (
        train_wordpiece,
        wordpiece_encode,
    )

    wp = train_wordpiece(survivors, "text", num_merges=30)
    full_bpe = bpe_ops.bpe_encode(survivors, "doc_id", "text", bpe)
    full_wp = wordpiece_encode(survivors, "doc_id", "text", wp)
    print("-- tokenizer bake-off (30 merges each) --")
    for name, enc_df in (("bpe", full_bpe), ("wordpiece", full_wp)):
        s = tokenizer_stats(survivors, enc_df, "doc_id", "text").first()
        print(f"   {name}: fertility={s.fertility} "
              f"chars/token={s.chars_per_token} unk_rate={s.unk_rate}")

    # 8. deterministic split + token-budget mixing by language stratum.
    # Eager localCheckpoint: every stage from here on (split counts,
    # budget aggregate, mix, UniMax totals, epoch materialization,
    # packing) re-executes this join's lineage — which embeds the full
    # 30-merge BPE encode — once per action; materializing the ~330
    # small rows once pays that chain exactly once (guide §5: cut
    # lineage of reused intermediates).
    with_tokens = survivors.join(encoded, "doc_id").withColumn(
        "lang", F.coalesce("lang", F.lit("und"))
    ).localCheckpoint(eager=True)
    split = curation.split_assign(
        with_tokens, "doc_id", {"train": 0.9, "val": 0.1}
    )
    print("-- split --")
    split.groupBy("split").count().show()
    budget = int(
        with_tokens.agg(F.sum("n_tokens")).first()[0] * 0.5
    )
    mixed, report = curation.mix_to_token_budget(
        split.filter("split = 'train'"),
        "lang", "n_tokens", "doc_id", budget,
        weights={"en": 0.7, "de": 0.2, "fr": 0.1},
    )
    print(f"-- mix to {budget} tokens --")
    for stratum, r in sorted(report.items()):
        print(f"   {stratum}: actual={r['actual_tokens']} rate={r['rate']}")

    # 8b. the UniMax alternative: epoch-capped waterfilling over the
    # per-language token totals (pure-integer arithmetic), materialized
    # into the actual epoch-expanded corpus
    lt = with_tokens.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
    alloc = curation.unimax_allocation(lt, budget, max_epochs=2)
    print(f"-- UniMax allocation of the same {budget}-token budget --")
    alloc.orderBy("lang").show()
    materialized = curation.materialize_epochs(with_tokens, alloc)
    print("-- materialized epochs per language --")
    materialized.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("docs"),
        F.count("*").alias("rows"),
        F.max("epoch").alias("max_epoch"),
    ).orderBy("lang").show()

    # 9. pack into fixed-length training sequences
    packed = textops.pack_sequences(mixed, "doc_id", "text", token_budget=512)
    print("-- packed sequences (first bins) --")
    packed.groupBy("shard_id", "bin_id").agg(
        F.count("*").alias("docs"), F.sum("n_tokens").alias("tokens")
    ).orderBy("shard_id", "bin_id").show(5)

    # 10. BM25 search over the final corpus — targeted inspection
    from mallarddv_spark.operators import retrieval

    idx = os.path.join(tempfile.mkdtemp(prefix="cur_demo_"), "bm25")
    retrieval.build_bm25_index(survivors, idx)
    queries = spark.createDataFrame(
        [("q1", "hash join table")], ["query_id", "query"]
    )
    print("-- BM25 top-3 (partition-pruned probe of the stored index) --")
    retrieval.bm25_index_probe(spark, idx, queries, k=3).show(truncate=False)

    # hybrid: rerank the lexical shortlist by embedding cosine (doc
    # vectors from the embeddings table where ids overlap; the query
    # borrows vector 0 — a real pipeline embeds the query text)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    doc_vecs = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    q_vec = emb.filter("vec_id = 0").select(
        F.lit("q1").alias("query_id"), "embedding"
    )
    shortlist = retrieval.bm25_index_probe(spark, idx, queries, k=10)
    print("-- hybrid: cosine-reranked top-3 (vectorless hits sink) --")
    retrieval.hybrid_rerank_topk(shortlist, doc_vecs, q_vec, k=3).show(
        truncate=False
    )

    # RRF: blend the lexical and dense runs by rank alone — no score
    # calibration; consensus docs rise
    from mallarddv_spark.operators.similarity import cosine_topk_bruteforce

    dense = cosine_topk_bruteforce(
        q_vec.select(F.col("query_id").alias("vec_id"), "embedding"),
        emb, k=10,
    ).select(
        "query_id", F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("rnk"),
    )
    print("-- RRF fusion of the BM25 and dense top-10 runs --")
    retrieval.rrf_fuse([shortlist, dense], k=3).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
