"""sf1 streaming crawl-gate stress with EVERY maintenance surface
attached: 49k docs through the five screens (already-ingested fence,
within-batch near-dup, minhash-index probe, Bloom decontamination,
NB quality) in three micro-batches across three separate stream
restarts (same checkpoint — batch ids must stay restart-stable), while
the processor maintains the minhash index, the BM25 inverted index,
the vocabulary HLL, and the document-length drift histogram, with
``compact_every_n_batches=2`` firing the crash-safe compactions
mid-run. Reports per-batch wall, docs/s, and the final state of every
stored artifact.

Usage: python tools/stress_stream_sf1.py
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mallarddv_spark.functions import sketches  # noqa: E402
from mallarddv_spark.functions.bloom import save_bloom  # noqa: E402
from mallarddv_spark.operators import dedup  # noqa: E402
from mallarddv_spark.operators.curation import (  # noqa: E402
    save_nb_classifier,
    train_nb_classifier,
)
from mallarddv_spark.operators.retrieval import (  # noqa: E402
    bm25_index_probe,
    build_bm25_index,
)
from mallarddv_spark.session import get_spark  # noqa: E402
from mallarddv_spark.streaming import ingest  # noqa: E402

SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "_stress", "sf1")
SEED_DOCS = 1000
N_BATCHES = 3


def main() -> None:
    td = tempfile.mkdtemp(prefix="stress_stream_")
    spark = get_spark(app_name="stress-stream-sf1",
                      warehouse_dir=os.path.join(td, "wh"))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF1, "documents.parquet")).select(
        "doc_id", "text", "lang"
    )
    seed = docs.filter(F.col("doc_id") < SEED_DOCS).select("doc_id", "text")
    rest = docs.filter(F.col("doc_id") >= SEED_DOCS)
    n_stream = rest.count()

    # --- seed every stored artifact the processor maintains ---
    mh_path = os.path.join(td, "mh_idx")
    dedup.build_minhash_index(seed, mh_path, num_perm=32, bands=8,
                              shingle_size=3)
    bm25_path = os.path.join(td, "bm25_idx")
    build_bm25_index(seed, bm25_path)
    # benchmark bloom: 500 docs FROM the stream range -> guaranteed hits
    bloom_path = os.path.join(td, "bloom")
    bench = docs.filter(
        (F.col("doc_id") >= SEED_DOCS) & (F.col("doc_id") < SEED_DOCS + 500)
    )
    from mallarddv_spark.operators.curation import build_benchmark_bloom

    save_bloom(build_benchmark_bloom(bench, "doc_id", "text",
                                     shingle_size=5), bloom_path)
    # NB quality screen: trained on lang, every label kept -> the full
    # classification cost is paid, nothing legitimately drops
    nb_train = docs.filter(F.col("doc_id") < 2000).select(
        "doc_id", "text", F.col("lang").alias("label")
    )
    nb = train_nb_classifier(nb_train, "label", "text", buckets=1024)
    nb_path = os.path.join(td, "nb_model")
    save_nb_classifier(nb, nb_path)
    keep_labels = [r.label for r in
                   nb_train.select("label").distinct().collect()]
    # vocabulary HLL + doc-length drift histogram seeded from the seed
    hll_path = os.path.join(td, "vocab_hll")
    toks = seed.select(F.explode(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    sketches.save_hll(sketches.hll_registers(toks, "tok", p=12), hll_path,
                      p=12, hash_mode="xxhash64")
    hist_path = os.path.join(td, "doclen_hist")
    lens = seed.select(F.size(F.split(F.trim(F.col("text")), r"\s+"))
                       .cast("double").alias("len"))
    sketches.save_hist(sketches.hist_counts(lens, "len", lo=0.0, hi=200.0,
                                            n_bins=50), hist_path,
                       lo=0.0, hi=200.0, n_bins=50)
    kmv_path = os.path.join(td, "doc_sample")
    sketches.save_kmv(sketches.kmv_sketch(seed, "doc_id", k=1024), kmv_path,
                      k=1024, hash_mode="md5")
    # r10 surfaces: range-free doc-length t-digest + canonical-URL store
    from mallarddv_spark.functions import tdigest as td_mod

    td_path = os.path.join(td, "doclen_td")
    td_mod.save_tdigest(*td_mod.tdigest_build(lens, "len", delta=100),
                        path=td_path)
    urls_path = os.path.join(td, "seen_urls")

    spark.sql("DROP TABLE IF EXISTS default.sf1_sink")
    spark.sql("DROP TABLE IF EXISTS default.sf1_dead")
    spark.sql("DROP TABLE IF EXISTS default.sf1_rejects")
    process = ingest.neardup_stream_processor(
        mh_path, "default.sf1_sink", threshold=0.7,
        contamination_bloom_path=bloom_path,
        contamination_table="default.sf1_dead",
        quality_model_path=nb_path,
        quality_keep_labels=keep_labels,
        quality_table="default.sf1_rejects",
        bm25_index_path=bm25_path,
        compact_every_n_batches=2,
        vocab_hll_path=hll_path,
        doclen_hist_path=hist_path,
        docsample_kmv_path=kmv_path,
        doclen_tdigest_path=td_path,
        url_col="url",
        seen_urls_path=urls_path,
    )

    rest = rest.withColumn(
        "url",
        F.concat(
            F.lit("https://WWW.h"), (F.col("doc_id") % 30000).cast("string"),
            F.lit(".Example.com:443/p/"),
            (F.col("doc_id") % 30000).cast("string"),
            F.lit("/?utm_batch="), F.col("doc_id").cast("string"),
        ),
    )
    src = os.path.join(td, "crawl")
    ck = os.path.join(td, "ck")
    schema = rest.select("doc_id", "text", "url").schema
    per = (n_stream + N_BATCHES - 1) // N_BATCHES
    t_all = time.monotonic()
    for i in range(N_BATCHES):
        lo = SEED_DOCS + i * per
        hi = SEED_DOCS + (i + 1) * per
        rest.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).select(
            "doc_id", "text", "url"
        ).coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
        t0 = time.monotonic()
        q = ingest.stream_files_to_staging(
            spark, f"{src}/*", schema, ck, process, file_format="parquet",
        )
        q.awaitTermination(600)
        assert q.exception() is None, q.exception()
        dt = time.monotonic() - t0
        files = len(glob.glob(f"{bm25_path}/postings/tbucket=*/*.parquet"))
        print(json.dumps({"batch": i, "sec": round(dt, 1),
                          "bm25_posting_files": files}), flush=True)
    total = time.monotonic() - t_all

    sink = spark.table("default.sf1_sink").count()
    dead = spark.table("default.sf1_dead").count()
    rejects = spark.table("default.sf1_rejects").count()
    postings = spark.read.parquet(f"{bm25_path}/postings").count()
    sample, kp = sketches.load_kmv(spark, kmv_path)
    sample_est = sketches.kmv_distinct(sample, k=kp["k"]).first().est_distinct
    regs, hp = sketches.load_hll(spark, hll_path)
    vocab = sketches.hll_estimate(regs, p=hp["p"]).first().est_distinct
    hist, hpar = sketches.load_hist(spark, hist_path)
    qs = {f"p{int(r.p * 100)}": r.est for r in sketches.hist_quantiles(
        hist, probs=[0.5, 0.95], **hpar).collect()}
    td_cents, td_params = td_mod.load_tdigest(spark, td_path)
    td_qs = {f"p{int(r.p * 100)}": round(r.est, 1)
             for r in td_mod.tdigest_quantiles(
                 td_cents, td_params, [0.5, 0.95]).collect()}
    seen_urls = spark.read.parquet(urls_path).distinct().count()
    probe = bm25_index_probe(
        spark, bm25_path,
        spark.createDataFrame([("q1", "stream join scan")],
                              "query_id string, query string"),
        k=3,
    ).count()
    print(json.dumps({
        "total_sec": round(total, 1),
        "docs_per_sec": round(n_stream / total, 0),
        "streamed": n_stream, "admitted": sink, "dead_lettered": dead,
        "quality_rejects": rejects, "bm25_postings": postings,
        "vocab_hll_estimate": vocab, "doclen_quantiles": qs,
        "doc_sample_kept": sample.count(),
        "doc_sample_est_admitted": sample_est,
        "doclen_tdigest_quantiles": td_qs,
        "doclen_tdigest_total": td_params["total"],
        "seen_urls_distinct": seen_urls,
        "probe_rows": probe,
    }), flush=True)
    spark.stop()
    shutil.rmtree(td, ignore_errors=True)


if __name__ == "__main__":
    main()
