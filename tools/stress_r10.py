"""sf1-scale stress for the round-10 tiers (the stress_sf1 discipline:
no baseline comparison — catch super-linear blowups, skew stragglers,
and shuffle cliffs one decade past the bench SF).

Covers: semantic_dedup (both keep policies, 20k x 64-d embeddings),
generic 5-gram KN train+score (50k docs), unigram target_vocab pruning,
and incremental_dedup under a deliberately mega-duplicated fingerprint
(2M-row batch, 5 distinct fingerprints — the exact skew shape the r10
groupBy rewrite exists for).

Usage: python tools/stress_r10.py [semdedup kn5 unigram incdedup]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mallarddv_spark.plans.audit import plan_report  # noqa: E402
from mallarddv_spark.session import get_spark  # noqa: E402

SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "_stress", "sf1")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def stress_semdedup(spark):
    from mallarddv_spark.operators.curation import semantic_dedup

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # plant 2 000 near-duplicates (ids 100000+x duplicate x with a tiny
    # jitter) so the pair/CC path carries real work — the raw corpus is
    # random vectors with no pairs at cosine >= 0.95
    dups = emb.filter("vec_id < 2000").select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x + 1e-4 * (i % 3))"
        ).alias("embedding"),
    )
    corpus = emb.unionByName(dups)
    for policy in ("min_id", "far_centroid"):
        t0 = time.monotonic()
        out = semantic_dedup(
            corpus, "vec_id", "embedding", n_clusters=128, eps=0.05,
            keep=policy, corpus_size_hint=22_000,
        )
        rows = out.count()
        kept = out.filter("keep").count()
        emit(op="semantic_dedup", policy=policy,
             sec=round(time.monotonic() - t0, 2), rows=rows, kept=kept,
             plan=plan_report(out))


def stress_kn5(spark):
    from mallarddv_spark.operators import textops

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    t0 = time.monotonic()
    lm = textops.train_ngram_lm(docs, "text", order=5)
    sizes = {k: lm["ngrams"][k].count() for k in (1, 3, 5)}
    t_train = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    out = textops.score_kn_ngram_logprob(docs, "doc_id", "text", lm)
    rows = out.count()
    emit(op="kn5_train", sec=t_train, type_counts=sizes)
    emit(op="kn5_score", sec=round(time.monotonic() - t0, 2), rows=rows,
         plan=plan_report(out))


def stress_unigram(spark):
    from mallarddv_spark.operators import unigram as ug

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    t0 = time.monotonic()
    seed = ug.unigram_seed_vocab(docs, "text", max_piece_len=6, top_k=4096)
    n_chars = seed.filter(F.length("piece") == 1).count()
    # the sf1 synthetic corpus has a tiny true vocabulary (EM's zero-mass
    # dropout alone lands ~260 pieces) — set the target low enough that
    # the loss-based prune stages actually engage
    target = n_chars + 64
    vocab, traj = ug.unigram_train(
        docs, "text", rounds=1, max_piece_len=6, top_k=4096,
        target_vocab=target,
    )
    emit(op="unigram_prune_train", sec=round(time.monotonic() - t0, 2),
         final_vocab=vocab.count(), target=target,
         n_em_rounds=len(traj), ll_trajectory=[round(x, 1) for x in traj])


def stress_incdedup(spark):
    from mallarddv_spark.operators.curation import incremental_dedup

    # 2M-row batch, 5 distinct fingerprints: pre-r10 this serialized
    # 400k copies per fingerprint into single window tasks
    batch = spark.range(2_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("boilerplate page "), (F.col("id") % 5)).alias("text"),
    )
    hist = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("hist doc "), F.col("id")).alias("text"),
    )
    t0 = time.monotonic()
    out = incremental_dedup(batch, hist, "doc_id", "text")
    agg = {r.verdict: r.c for r in
           out.groupBy("verdict").agg(F.count("*").alias("c")).collect()}
    emit(op="incremental_dedup_megadup", sec=round(time.monotonic() - t0, 2),
         verdicts=agg, plan=plan_report(out))


STAGES = {
    "semdedup": stress_semdedup,
    "kn5": stress_kn5,
    "unigram": stress_unigram,
    "incdedup": stress_incdedup,
}


def main() -> None:
    names = sys.argv[1:] or list(STAGES)
    spark = get_spark(app_name="stress-r10")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        STAGES[name](spark)




def stress_wordpiece(spark):
    from mallarddv_spark.operators.wordpiece import (
        train_wordpiece, wordpiece_encode,
    )

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    t0 = time.monotonic()
    model = train_wordpiece(docs, "text", num_merges=30)
    t_train = time.monotonic() - t0
    t0 = time.monotonic()
    enc = wordpiece_encode(docs, "doc_id", "text", model)
    agg = enc.agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("toks"),
        F.sum("n_unk").alias("unk"),
    ).first()
    emit(op="wordpiece", train_sec=round(t_train, 2),
         encode_sec=round(time.monotonic() - t0, 2),
         vocab=len(model["vocab"]), docs=agg.docs,
         tokens=int(agg.toks), unk=int(agg.unk),
         plan=plan_report(enc))


def stress_tdigest(spark):
    from mallarddv_spark.functions.tdigest import (
        tdigest_build, tdigest_merge, tdigest_quantiles,
    )

    li = spark.read.parquet(f"{SF1}/lineitem.parquet")
    t0 = time.monotonic()
    cents, params = tdigest_build(
        li, "l_extendedprice", weight_col="l_quantity", delta=200,
    )
    n_cents = cents.count()
    t_build = time.monotonic() - t0
    t0 = time.monotonic()
    qs = {r.p: round(r.est, 2) for r in tdigest_quantiles(
        cents, params, [0.001, 0.5, 0.999]).collect()}
    t_q = time.monotonic() - t0
    # split-merge: two half-digests merged vs the whole
    t0 = time.monotonic()
    merged = tdigest_merge([
        tdigest_build(li.filter("l_orderkey % 2 = 0"), "l_extendedprice",
                      weight_col="l_quantity", delta=200),
        tdigest_build(li.filter("l_orderkey % 2 = 1"), "l_extendedprice",
                      weight_col="l_quantity", delta=200),
    ])
    mq = {r.p: round(r.est, 2) for r in tdigest_quantiles(
        merged[0], merged[1], [0.5]).collect()}
    emit(op="tdigest", build_sec=round(t_build, 2),
         quantile_sec=round(t_q, 2),
         merge_sec=round(time.monotonic() - t0, 2),
         centroids=n_cents, total=params["total"], q=qs, merged_q=mq)


def stress_urldedup(spark):
    """2M-row batch where FIVE canonical URLs each repeat 400k times
    under rotating tracking-param noise — the mega-duplicated-key
    shape; the groupBy pick must absorb it with map-side combine."""
    from mallarddv_spark.operators.curation import url_dedup

    batch = spark.range(2_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://WWW.h"), (F.col("id") % 5).cast("string"),
            F.lit(".Example.com:443/page/"),
            (F.col("id") % 5).cast("string"),
            F.lit("/?utm_source=s"), (F.col("id") % 1000).cast("string"),
            F.lit("&x=1"),
        ).alias("url"),
    )
    t0 = time.monotonic()
    out = url_dedup(batch, "doc_id", "url")
    kept = out.filter("keep").count()
    rows = out.count()
    emit(op="url_dedup_megadup", sec=round(time.monotonic() - t0, 2),
         rows=rows, kept=kept, plan=plan_report(out))


STAGES.update({
    "wordpiece": stress_wordpiece,
    "tdigest": stress_tdigest,
    "urldedup": stress_urldedup,
})

def stress_ffd(spark):
    from mallarddv_spark.operators.textops import pack_bins_ffd

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    t0 = time.monotonic()
    out = pack_bins_ffd(docs, "doc_id", "text", token_budget=2048,
                        n_shards=16)
    bins = out.groupBy("shard_id", "bin_id").agg(
        F.sum("n_tokens").alias("load")
    )
    stats = bins.agg(
        F.count("*").alias("n_bins"),
        F.sum("load").alias("toks"),
        F.max("load").alias("max_load"),
    ).first()
    pad = 1.0 - stats.toks / (stats.n_bins * 2048.0)
    emit(op="pack_bins_ffd", sec=round(time.monotonic() - t0, 2),
         docs=out.count(), bins=stats.n_bins,
         padding_frac=round(pad, 4), max_load=stats.max_load,
         plan=plan_report(out))


def stress_arpa(spark):
    from mallarddv_spark.operators.textops import export_arpa, train_ngram_lm

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    lm = train_ngram_lm(docs, "text", order=5)
    t0 = time.monotonic()
    entries = export_arpa(lm)
    counts = {r.k: r.c for r in entries.groupBy("k").agg(
        F.count("*").alias("c")).collect()}
    emit(op="export_arpa", sec=round(time.monotonic() - t0, 2),
         entries_per_order=counts, total=sum(counts.values()),
         plan=plan_report(entries))


STAGES.update({"ffd": stress_ffd, "arpa": stress_arpa})

def stress_textproj(spark):
    """script_profile + html_to_text at sf1 — pure projections; the
    stress pins wall and Python-free plans at 50k docs."""
    from mallarddv_spark.operators.curation import html_to_text
    from mallarddv_spark.operators.textops import script_profile

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    t0 = time.monotonic()
    sp = script_profile(docs, "doc_id", "text")
    n1 = sp.count()
    t1 = time.monotonic() - t0
    t0 = time.monotonic()
    wrapped = docs.selectExpr(
        "doc_id",
        "concat('<html><body><h1>T</h1><p>', text, "
        "'</p><!-- c --></body></html>') AS html",
    )
    ext = wrapped.select("doc_id", html_to_text("html").alias("text"))
    n2 = ext.count()
    emit(op="script_and_html", docs=n1, script_sec=round(t1, 2),
         html_sec=round(time.monotonic() - t0, 2), extracted=n2,
         plan_script=plan_report(sp), plan_html=plan_report(ext))


def stress_fuzzy_decon(spark):
    """fuzzy_decontaminate at sf1: 50k train docs vs a 500-doc
    benchmark drawn FROM the corpus (guaranteed verbatim hits) + their
    one-word edits (paraphrase hits)."""
    from mallarddv_spark.operators.curation import fuzzy_decontaminate

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    bench = docs.filter("doc_id % 100 = 0").limit(500).select(
        F.col("doc_id").alias("qid"),
        F.regexp_replace("text", "^\\S+", "edited").alias("question"),
    )
    t0 = time.monotonic()
    out = fuzzy_decontaminate(docs, bench, "doc_id", "text",
                              bench_id_col="qid",
                              bench_text_col="question",
                              threshold=0.5)
    hits = out.filter("contaminated").count()
    emit(op="fuzzy_decontaminate", sec=round(time.monotonic() - t0, 2),
         train=out.count(), bench=500, contaminated=hits,
         plan=plan_report(out))


def stress_asof_dirs(spark):
    """forward/nearest as-of on the 1M-row sf1 events table."""
    from mallarddv_spark.operators.asof import asof_join

    ev = spark.read.parquet(f"{SF1}/events.parquet")
    clicks = ev.filter("event_type = 'click'").selectExpr(
        "user_id", "ts AS ct")
    buys = ev.filter("event_type = 'purchase'").selectExpr(
        "user_id", "ts AS pt", "event_id AS pid")
    for d in ("forward", "nearest"):
        t0 = time.monotonic()
        out = asof_join(clicks, buys, "user_id", "ct", "pt", direction=d)
        n = out.count()
        matched = out.filter("pid IS NOT NULL").count()
        emit(op=f"asof_{d}", sec=round(time.monotonic() - t0, 2),
             rows=n, matched=matched)


STAGES.update({
    "textproj": stress_textproj,
    "fuzzydecon": stress_fuzzy_decon,
    "asofdirs": stress_asof_dirs,
})


def stress_pagerank(spark):
    """2M-edge web-ish graph over 200k nodes with a deliberate hot hub
    (every 50th source ALSO links to node 0 — ~40k in-links) plus a
    dangling tier (~1/7 of nodes): the skew shape that breaks
    window-based rank accumulation; the groupBy contribution sum must
    absorb it in the partial aggregate."""
    from mallarddv_spark.operators.graph import pagerank

    n = 200_000
    base = spark.range(2_000_000).select(
        (F.col("id") % n).alias("src"),
        ((F.col("id") * 131 + 7) % n).alias("dst"),
    )
    hub = spark.range(0, n, 50).select(
        F.col("id").alias("src"), F.lit(0).alias("dst")
    )
    edges = (
        base.unionByName(hub)
        .filter("src % 7 != 0 AND src != dst")
        .distinct()
    )
    t0 = time.monotonic()
    pr = pagerank(edges, max_iter=8, tol=None)
    stats = pr.agg(
        F.count("*"), F.sum("rank"), F.max("rank")
    ).collect()[0]
    top = pr.orderBy(F.desc("rank")).limit(1).collect()[0]
    emit(op="pagerank_2m_edges_hub", sec=round(time.monotonic() - t0, 2),
         nodes=int(stats[0]), total_rank=round(float(stats[1]), 9),
         top_node=int(top.node), top_rank=round(float(top.rank), 6),
         plan=plan_report(pr))
    assert abs(float(stats[1]) - 1.0) < 1e-6
    assert int(top.node) == 0  # the hub must dominate


def stress_lr_classifier(spark):
    """Train the Adagrad LR quality classifier on 50k labeled sf1 docs
    (label = planted vocabulary class), score the full corpus, check
    separation; the per-iteration shape must stay 2 shuffles + one
    bounded bucket groupBy regardless of corpus size."""
    from mallarddv_spark.operators.curation import (
        lr_classify,
        train_lr_classifier,
    )

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    spam = (" click here buy now free winner prize casino cheap pills"
            " unsubscribe offer limited deal act fast")
    labeled = docs.select(
        "doc_id", "text", (F.col("doc_id") % 2).alias("y"),
        # make classes actually separable: odd docs get a spam sentence
        F.when(
            F.col("doc_id") % 2 == 1, F.concat("text", F.lit(spam))
        ).otherwise(F.col("text")).alias("txt"),
    )
    t0 = time.monotonic()
    model = train_lr_classifier(
        labeled, "y", "txt", buckets=8192, iters=30, lr=3.0
    )
    train_sec = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    scored = lr_classify(labeled, "doc_id", "txt", model)
    acc = scored.join(labeled, "doc_id").agg(
        F.avg((F.col("predicted") == (F.col("y") == 1)).cast("double"))
    ).collect()[0][0]
    emit(op="lr_classifier_50k", train_sec=train_sec,
         score_sec=round(time.monotonic() - t0, 2),
         loss0=round(model["loss_history"][0], 4),
         lossN=round(model["loss_history"][-1], 4),
         acc=round(float(acc), 4))
    assert acc > 0.99


def stress_bloom_semi_join(spark):
    """5M-row probe side reduced through a 500k-key bloom — the probe
    side must show zero exchanges before the filter."""
    from mallarddv_spark.functions.bloom import bloom_semi_join

    big = spark.range(5_000_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.col("id").alias("p")
    )
    keys = spark.range(500_000).select(
        F.concat(F.lit("k"), F.col("id") * 7).alias("k")
    )
    t0 = time.monotonic()
    out = bloom_semi_join(big, "k", keys, fpp=1e-3)
    n = out.count()
    sup_sec = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    n_exact = bloom_semi_join(big, "k", keys, fpp=1e-3, exact=True).count()
    # true matches: every key k(7i), i < 500k, has 7i < 5M -> 500k rows
    emit(op="bloom_semi_join_5m", superset_rows=n, exact_rows=n_exact,
         superset_sec=sup_sec, exact_sec=round(time.monotonic() - t0, 2),
         plan=plan_report(out))
    assert n_exact == 500_000
    assert n_exact <= n <= n_exact + int(4_500_000 * 1e-3 * 5)


def stress_hard_negatives(spark):
    """2k queries x 18k corpus hard-negative mining through the exact
    brute kNN (broadcast-query regime) with denoising."""
    from mallarddv_spark.operators.alignment import hard_negative_mine

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter("vec_id >= 18000 AND vec_id < 20000").select(
        (F.col("vec_id") - 18000).alias("vec_id"), "embedding"
    )
    # positives are perturbed copies of their query planted in the
    # corpus (ids 0..1999), so denoise floors sit near 1 and the screen
    # only rejects true near-positives — the realistic DPR shape
    pert = queries.select(
        "vec_id",
        F.expr(
            "transform(embedding, (x, i) -> x + 1e-3 * ((i % 5) - 2))"
        ).alias("embedding"),
    )
    corpus = emb.filter("vec_id >= 2000 AND vec_id < 18000").unionByName(pert)
    pairs = queries.select(
        F.col("vec_id").alias("query_id"), F.col("vec_id").alias("pos_id")
    )
    t0 = time.monotonic()
    out = hard_negative_mine(
        pairs, queries, corpus, k=5, denoise_ratio=0.98
    )
    n = out.count()
    per_q = out.groupBy("query_id").count().agg(
        F.min("count"), F.max("count")
    ).collect()[0]
    emit(op="hard_negatives_2k_x_20k", sec=round(time.monotonic() - t0, 2),
         rows=n, min_per_q=int(per_q[0]), max_per_q=int(per_q[1]),
         plan=plan_report(out))
    assert int(per_q[1]) <= 5


STAGES.update({
    "pagerank": stress_pagerank,
    "lrcls": stress_lr_classifier,
    "bloomsj": stress_bloom_semi_join,
    "hardneg": stress_hard_negatives,
})


if __name__ == "__main__":
    main()
