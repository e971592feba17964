"""sf1-scale stress for the round-11 tiers (the stress_sf1 discipline:
no baseline comparison — catch super-linear blowups, skew stragglers,
and shuffle cliffs one decade past the bench SF).

Covers: softmax language-ID (4 planted classes over 50k sf1 docs,
train + full-corpus scoring), byte-level GPT-2 BPE (1 000 merges in
approx batching mode over the 50k-doc corpus, encode + lossless spot
check), the GPT-2 file-pair export/import round-trip at that vocab
size, and the bloom semi-join single-build timing (the r11 fix: the
filter fold must execute once, not 2-3 times).

Usage: python tools/stress_r11.py [softmax bytebpe gpt2files bloom1]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mallarddv_spark.session import get_spark  # noqa: E402

SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "_stress", "sf1")


def emit(**kw):
    print(json.dumps(kw), flush=True)


LANG_SENT = {
    0: " der und die das nicht mit für haus wasser arbeit zeit immer",
    1: " the and is not with for house water work time always of",
    2: " el la los y es no con casa agua trabajo tiempo siempre",
    3: " le la les et est pas avec maison eau travail temps toujours",
}


def stress_softmax(spark):
    """Train the 4-class softmax language-ID on 50k sf1 docs (planted
    per-class function-word sentence), score the full corpus; the
    per-iteration shape must stay: one broadcast weight join, one
    (doc, cls) groupBy, one doc groupBy (softmax fold), one bounded
    (bucket, cls) groupBy — K-row driver traffic."""
    from mallarddv_spark.operators.curation import (
        lang_classify,
        train_softmax_classifier,
    )

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    lab = F.lit(None)
    sent = F.lit(None)
    for k, s in LANG_SENT.items():
        cond = F.col("doc_id") % 4 == k
        lab = F.when(cond, F.lit(f"L{k}")).otherwise(lab)
        sent = F.when(cond, F.lit(s)).otherwise(sent)
    labeled = docs.select(
        "doc_id", lab.alias("lang"),
        F.concat("text", sent).alias("txt"),
    )
    n = labeled.count()
    t0 = time.monotonic()
    model = train_softmax_classifier(
        labeled, "lang", "txt", buckets=8192, iters=25, lr=3.0
    )
    train_sec = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    pred = lang_classify(labeled, "doc_id", "txt", model).select(
        "doc_id", F.col("lang").alias("p")
    )
    acc = pred.join(labeled, "doc_id").agg(
        F.avg((F.col("lang") == F.col("p")).cast("double"))
    ).collect()[0][0]
    emit(op="softmax_langid_50k", n_docs=n, classes=model["classes"],
         train_sec=train_sec,
         score_sec=round(time.monotonic() - t0, 2),
         loss0=round(model["loss_history"][0], 4),
         lossN=round(model["loss_history"][-1], 4),
         acc=round(float(acc), 4))
    assert acc > 0.99


def stress_bytebpe(spark):
    """1 000 byte-level merges in approx batching mode over the 50k-doc
    corpus; encode the corpus and spot-check lossless decode on 20
    documents. Training must stay vocabulary-sized per round."""
    from mallarddv_spark.operators.bpe import (
        bpe_encode,
        decode_byte_tokens,
        train_bpe,
    )

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    t0 = time.monotonic()
    model = train_bpe(docs, "text", num_merges=1000, byte_level=True,
                      lowercase=False, exact_rank=False,
                      min_pair_count=2)
    train_sec = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    enc = bpe_encode(docs, "doc_id", "text", model)
    stats = enc.agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_words").alias("pretokens"),
    ).collect()[0]
    enc_sec = round(time.monotonic() - t0, 2)
    probe = {r.doc_id: r.tokens
             for r in enc.filter("doc_id % 2500 = 0").collect()}
    orig = {r.doc_id: r.text
            for r in docs.filter("doc_id % 2500 = 0").collect()}
    bad = [d for d in probe if decode_byte_tokens(probe[d]) != orig[d]]
    emit(op="byte_bpe_1k_merges", merges=len(model["merges"]),
         train_sec=train_sec, encode_sec=enc_sec,
         docs=stats.docs, tokens=int(stats.tokens),
         pretokens=int(stats.pretokens),
         roundtrip_checked=len(probe), roundtrip_bad=len(bad))
    assert not bad
    _GPT2_MODEL[0] = model


_GPT2_MODEL = [None]


def stress_gpt2files(spark):
    """Export/import the 1 000-merge model as the GPT-2 file pair and
    re-encode a slice — identical tokens prove the pair is faithful at
    a realistic vocab size. Reuses the bytebpe stage's model when run
    in the same process; trains 200 merges standalone otherwise."""
    from mallarddv_spark.operators.bpe import (
        bpe_encode,
        export_gpt2_files,
        load_gpt2_files,
        train_bpe,
    )

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    model = _GPT2_MODEL[0]
    if model is None:
        model = train_bpe(docs, "text", num_merges=200, byte_level=True,
                          lowercase=False, exact_rank=False)
    path = tempfile.mkdtemp(prefix="gpt2_sf1_")
    t0 = time.monotonic()
    export_gpt2_files(model, path, specials=["<|endoftext|>"])
    loaded = load_gpt2_files(path)
    io_sec = round(time.monotonic() - t0, 2)
    sl = docs.filter("doc_id < 500")
    a = {r.doc_id: r.tokens
         for r in bpe_encode(sl, "doc_id", "text", model).collect()}
    b = {r.doc_id: r.tokens
         for r in bpe_encode(sl, "doc_id", "text", loaded).collect()}
    emit(op="gpt2_file_pair", merges=len(model["merges"]),
         vocab=256 + len({a2 + b2 for a2, b2 in model["merges"]}) + 1,
         io_sec=io_sec, reencoded=len(a), identical=a == b)
    assert a == b


def stress_bloom1(spark):
    """bloom_semi_join over 500k keys / 5M probe rows: times the whole
    call after the r11 single-build fix (the one-row filter is
    localCheckpointed before the geometry read, so the fold executes
    once instead of 2-3 times)."""
    from mallarddv_spark.functions.bloom import bloom_semi_join

    keys = spark.range(500_000).select(
        (F.col("id") * 7919 % 10_000_000).alias("k")
    )
    probe = spark.range(5_000_000).select(
        (F.col("id") % 10_000_000).alias("k")
    )
    t0 = time.monotonic()
    surv = bloom_semi_join(probe, "k", keys, fpp=1e-3,
                           expected_items=500_000)
    n = surv.count()
    emit(op="bloom_semi_join_single_build", probe_rows=5_000_000,
         keys=500_000, survivors=n,
         sec=round(time.monotonic() - t0, 2))


def stress_bigbpe(spark):
    """1 000 byte-level merges over the Zipf corpus
    (tools/gen_zipf_corpus.py — ~30k surface words WITH shared subword
    structure, unlike the ~60-word sf corpus that saturates at ~128
    merges): the realistic trainer shape. Approx batching; encode the
    corpus; lossless spot check; report counting rounds implicitly via
    train time."""
    from mallarddv_spark.operators.bpe import (
        bpe_encode,
        decode_byte_tokens,
        train_bpe,
    )

    zipf = os.path.join(os.path.dirname(SF1), "zipf")
    if not os.path.exists(f"{zipf}/documents.parquet"):
        emit(op="big_bpe_1k_merges", skipped="run tools/gen_zipf_corpus.py")
        return
    docs = spark.read.parquet(f"{zipf}/documents.parquet")
    t0 = time.monotonic()
    model = train_bpe(docs, "text", num_merges=1000, byte_level=True,
                      lowercase=False, exact_rank=False,
                      min_pair_count=2)
    train_sec = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    enc = bpe_encode(docs, "doc_id", "text", model)
    stats = enc.agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_words").alias("pretokens"),
    ).collect()[0]
    enc_sec = round(time.monotonic() - t0, 2)
    probe = {r.doc_id: r.tokens
             for r in enc.filter("doc_id % 2500 = 0").collect()}
    orig = {r.doc_id: r.text
            for r in docs.filter("doc_id % 2500 = 0").collect()}
    bad = [d for d in probe if decode_byte_tokens(probe[d]) != orig[d]]
    emit(op="big_bpe_1k_merges", merges=len(model["merges"]),
         train_sec=train_sec, encode_sec=enc_sec,
         docs=stats.docs, tokens=int(stats.tokens),
         pretokens=int(stats.pretokens),
         compression=round(float(stats.tokens) / float(stats.pretokens), 3),
         roundtrip_checked=len(probe), roundtrip_bad=len(bad))
    assert not bad
    assert len(model["merges"]) == 1000


STAGES = {
    "softmax": stress_softmax,
    "bytebpe": stress_bytebpe,
    "gpt2files": stress_gpt2files,
    "bloom1": stress_bloom1,
    "bigbpe": stress_bigbpe,
}


def main() -> None:
    names = sys.argv[1:] or list(STAGES)
    spark = get_spark(app_name="stress-r11")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        STAGES[name](spark)


if __name__ == "__main__":
    main()
