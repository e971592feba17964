"""Round-12 stress stages (the stress_sf1 discipline: no baseline
comparison — catch super-linear blowups, integration bugs between
individually-proven operators, and shuffle cliffs one decade past the
bench SF).

Stages:

* ``bigbpe4k`` — byte-level BPE at a REALISTIC vocabulary scale:
  4 096 merges over the deterministic Zipf corpus
  (``tools/gen_zipf_corpus.py``, seed 20260816 — regenerate with
  ``python tools/gen_zipf_corpus.py`` if ``_stress/zipf`` is absent;
  the sf corpora's ~60-word vocabulary saturates byte BPE at ~128
  merges and cannot exercise this). Approx batching train, fold-replay
  encode, lossless round-trip spot check, GPT-2 file-pair round-trip
  at that vocab size. Persists the model under ``_stress/zipf/bpe4k``
  so the ``pretrain`` stage can reuse it.
* ``pretrain`` — the END-TO-END pretraining materialization path
  (r11 verdict #3): encode (fold replay) → ``bpe_vocab`` +
  ``tokens_to_ids`` → ``textops.write_packed_shards`` (FFD pack with
  the budget in ENCODED IDS + manifest-certified id shards).
  Invariants, re-derived from the bytes on disk independently of the
  manifest: Σ ids across written shards == Σ encoded tokens (token
  conservation), zero NULL ids (closed byte-level vocab), every doc
  in exactly one bin, no non-oversize bin over budget. Per-stage
  timings + padding fraction.
* ``ccnet`` — the CCNet composition (Wenzek et al. 2020; r11 verdict
  #4): trained softmax language-ID routes a 4-language planted corpus,
  each language trains its OWN order-3 Kneser-Ney LM on its routed
  slice, docs score under their language's LM, and
  ``perplexity_buckets(by='lang', exact=False)`` cuts per-language
  head/middle/tail — the published pipeline shape, every stage
  in-engine. Plan-audited: zero Python stages in routing and scoring.

Usage: python tools/stress_r12.py [bigbpe4k pretrain ccnet]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mallarddv_spark.session import get_spark  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIPF = os.path.join(ROOT, "_stress", "zipf")
SF1 = os.path.join(ROOT, "_stress", "sf1")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def _zipf_docs(spark):
    path = f"{ZIPF}/documents.parquet"
    if not os.path.exists(path):
        raise SystemExit(
            "Zipf corpus missing — regenerate deterministically with: "
            "python tools/gen_zipf_corpus.py (seed 20260816 is in the "
            "script; same bytes every run)"
        )
    return spark.read.parquet(path)


def stress_bigbpe4k(spark):
    """4 096 byte-level merges (approx batching — the realistic-vocab
    path), fold-replay encode, lossless spot check, GPT-2 file pair
    round-trip. Training must stay vocabulary-sized per round; encode
    must stay ONE expression per pre-token regardless of merge count."""
    from mallarddv_spark.operators.bpe import (
        bpe_encode,
        decode_byte_tokens,
        export_gpt2_files,
        load_gpt2_files,
        save_bpe,
        train_bpe,
    )

    docs = _zipf_docs(spark)
    t0 = time.monotonic()
    model = train_bpe(docs, "text", num_merges=4096, byte_level=True,
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
    # GPT-2 file pair at this vocab size: identical re-encoding
    path = tempfile.mkdtemp(prefix="gpt2_4k_")
    export_gpt2_files(model, path, specials=["<|endoftext|>"])
    loaded = load_gpt2_files(path)
    sl = docs.filter("doc_id < 200")
    a = {r.doc_id: r.tokens
         for r in bpe_encode(sl, "doc_id", "text", model).collect()}
    b = {r.doc_id: r.tokens
         for r in bpe_encode(sl, "doc_id", "text", loaded).collect()}
    shutil.rmtree(path, ignore_errors=True)
    mp = f"{ZIPF}/bpe4k"
    shutil.rmtree(mp, ignore_errors=True)
    save_bpe(spark, model, mp)
    emit(op="big_bpe_4k_merges", merges=len(model["merges"]),
         train_sec=train_sec, encode_sec=enc_sec,
         docs=stats.docs, tokens=int(stats.tokens),
         pretokens=int(stats.pretokens),
         compression=round(float(stats.tokens) / float(stats.pretokens), 3),
         roundtrip_checked=len(probe), roundtrip_bad=len(bad),
         gpt2_pair_identical=a == b, model_path=mp)
    assert not bad
    assert a == b
    assert len(model["merges"]) == 4096


def stress_pretrain(spark):
    """docs → tokens → ids → write_packed_shards (FFD bins + manifest),
    one measured pipeline. The budget is in IDS — a whitespace budget
    would under-fill bins by the tokenizer's fertility ratio. The
    invariant Σ ids(shards on disk) == Σ tokens(encode) ==
    manifest.total_ids catches every drop/dup between the stages."""
    from mallarddv_spark.operators.bpe import (
        bpe_encode, bpe_vocab, load_bpe, tokens_to_ids, train_bpe,
    )
    from mallarddv_spark.operators.textops import write_packed_shards

    docs = _zipf_docs(spark)
    for cand in (f"{ZIPF}/bpe4k", f"{ZIPF}/bpe1k"):
        if os.path.exists(cand):
            model = load_bpe(spark, cand)
            model_src = cand
            break
    else:
        model = train_bpe(docs, "text", num_merges=256, byte_level=True,
                          lowercase=False, exact_rank=False)
        model_src = "trained-inline-256"

    budget, n_shards = 2048, 32  # ~1.5k docs/shard, the FFD shard contract
    timings = {}

    t0 = time.monotonic()
    enc = bpe_encode(docs, "doc_id", "text", model).localCheckpoint(
        eager=True
    )
    total_tokens = int(enc.agg(F.sum("n_tokens")).collect()[0][0])
    timings["encode_sec"] = round(time.monotonic() - t0, 2)
    emit(op="pretrain_progress", stage="encode", **timings)

    t0 = time.monotonic()
    vocab = bpe_vocab(model, specials=["<|endoftext|>"])
    ids = tokens_to_ids(enc, "tokens", vocab).select(
        "doc_id", "ids", F.size("ids").cast("bigint").alias("n_ids")
    ).localCheckpoint(eager=True)
    null_ids = ids.filter(
        F.exists("ids", lambda x: x.isNull())
    ).count()
    timings["ids_sec"] = round(time.monotonic() - t0, 2)
    emit(op="pretrain_progress", stage="ids", **timings)

    t0 = time.monotonic()
    shard_path = f"{ZIPF}/idshards"
    shutil.rmtree(shard_path, ignore_errors=True)
    manifest = write_packed_shards(
        ids, shard_path, "doc_id", "ids",
        token_budget=budget, n_shards=n_shards,
    )
    timings["pack_write_sec"] = round(time.monotonic() - t0, 2)
    emit(op="pretrain_progress", stage="pack_write", **timings)

    # invariants from the BYTES ON DISK, independently of the manifest
    t0 = time.monotonic()
    written = spark.read.parquet(f"{shard_path}/data")
    inv = written.agg(
        F.count("*").alias("docs"),
        F.sum(F.size("ids")).alias("ids_total"),
        F.countDistinct("id").alias("distinct_docs"),
    ).collect()[0]
    over = (
        written.groupBy("shard_id", "bin_id")
        .agg(F.sum(F.size("ids")).alias("load"),
             F.max("oversize").alias("ov"),
             F.count("*").alias("members"))
    )
    bad_bins = over.filter(
        (F.col("load") > budget) & ~(F.col("ov") & (F.col("members") == 1))
    ).count()
    timings["verify_sec"] = round(time.monotonic() - t0, 2)

    emit(op="pretrain_pipeline", model=model_src,
         merges=len(model["merges"]), vocab=len(vocab),
         docs=int(inv.docs), distinct_docs=int(inv.distinct_docs),
         tokens_encoded=total_tokens, ids_on_disk=int(inv.ids_total),
         manifest_ids=manifest["total_ids"], null_id_docs=null_ids,
         bins=manifest["total_bins"], budget=budget,
         shards=n_shards, bad_bins=bad_bins,
         padding_frac=manifest["padding_frac"], **timings)
    assert null_ids == 0, "closed byte-level vocab must resolve every token"
    assert int(inv.ids_total) == total_tokens == manifest["total_ids"], (
        "token conservation"
    )
    assert int(inv.docs) == int(inv.distinct_docs) == docs.count()
    assert bad_bins == 0


LANG_SENT = {
    "de": " der und die das nicht mit für haus wasser arbeit zeit immer",
    "en": " the and is not with for house water work time always of",
    "es": " el la los y es no con casa agua trabajo tiempo siempre",
    "fr": " le la les et est pas avec maison eau travail temps toujours",
}


def stress_ccnet(spark):
    """The CCNet shape end-to-end on 50k sf1 docs: trained softmax
    routing → per-language order-3 KN LM (trained on the ROUTED slice,
    the published bootstrap) → per-language head/middle/tail buckets in
    the corpus-scale (exact=False) mode. Asserts routing accuracy,
    per-language bucket balance, and Python-free routing/scoring plans."""
    from mallarddv_spark.operators.curation import (
        lang_classify, train_softmax_classifier,
    )
    from mallarddv_spark.operators.textops import (
        perplexity_buckets, score_kn_ngram_logprob, train_ngram_lm,
    )
    from mallarddv_spark.plans.audit import plan_report

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    langs = sorted(LANG_SENT)
    lab = F.lit(None)
    sent = F.lit(None)
    for k, lang in enumerate(langs):
        cond = F.col("doc_id") % 4 == k
        lab = F.when(cond, F.lit(lang)).otherwise(lab)
        sent = F.when(cond, F.lit(LANG_SENT[lang])).otherwise(sent)
    corpus = docs.select(
        "doc_id", lab.alias("true_lang"),
        F.concat("text", sent).alias("text"),
    ).localCheckpoint(eager=True)

    # stage 1: train the router on a 20% labeled sample (the trainer is
    # full-batch — labeled sets are curated subsets, per its docstring),
    # route the WHOLE corpus with the single-pass scorer
    t0 = time.monotonic()
    labeled = corpus.filter("doc_id % 5 = 0").select(
        "doc_id", F.col("true_lang").alias("lang"), "text"
    )
    router = train_softmax_classifier(labeled, "lang", "text",
                                      buckets=8192, iters=20, lr=3.0)
    train_sec = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    routed_df = lang_classify(corpus, "doc_id", "text", router)
    rep = plan_report(routed_df)
    assert rep["python_stages"] == 0
    routed = routed_df.select(
        "doc_id", F.col("lang").alias("route")
    ).join(corpus, "doc_id").localCheckpoint(eager=True)
    acc = routed.agg(
        F.avg((F.col("route") == F.col("true_lang")).cast("double"))
    ).collect()[0][0]
    route_sec = round(time.monotonic() - t0, 2)

    # stage 2: per-language KN LM on the routed slice + scoring.
    # K is metadata-sized (CCNet ships ~100 LMs), so the per-language
    # loop is driver-side control flow, never data.
    t0 = time.monotonic()
    scored_parts = []
    for lang in langs:
        slice_df = routed.filter(F.col("route") == lang)
        lm = train_ngram_lm(slice_df, "text", order=3)
        scored_parts.append(
            score_kn_ngram_logprob(slice_df, "doc_id", "text", lm)
            .select("id", "avg_logprob", F.lit(lang).alias("lang"))
        )
    scored = scored_parts[0]
    for p in scored_parts[1:]:
        scored = scored.unionByName(p)
    rep2 = plan_report(scored)
    assert rep2["python_stages"] == 0
    scored = scored.localCheckpoint(eager=True)
    lm_sec = round(time.monotonic() - t0, 2)

    # stage 3: per-language head/middle/tail in the corpus-scale mode
    t0 = time.monotonic()
    buckets = perplexity_buckets(scored, "avg_logprob", "id",
                                 by="lang", exact=False)
    dist = {
        (r.lang, r.ppl_label): r.n
        for r in buckets.groupBy("lang", "ppl_label")
        .agg(F.count("*").alias("n")).collect()
    }
    bucket_sec = round(time.monotonic() - t0, 2)
    per_lang = {
        lang: {lbl: dist.get((lang, lbl), 0)
               for lbl in ("head", "middle", "tail")}
        for lang in langs
    }
    emit(op="ccnet_pipeline", docs=corpus.count(),
         labeled=labeled.count(), routing_acc=round(float(acc), 4),
         train_sec=train_sec, route_sec=route_sec, lm_sec=lm_sec,
         bucket_sec=bucket_sec, buckets=per_lang)
    assert acc > 0.99
    for lang in langs:
        tot = sum(per_lang[lang].values())
        assert tot > 0
        for lbl, n in per_lang[lang].items():
            # approx tiles: within 20% of a third per language
            assert abs(n - tot / 3) < 0.2 * tot, (lang, lbl, n, tot)


STAGES = {
    "bigbpe4k": stress_bigbpe4k,
    "pretrain": stress_pretrain,
    "ccnet": stress_ccnet,
}


def main() -> None:
    names = sys.argv[1:] or list(STAGES)
    spark = get_spark(app_name="stress-r12")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        STAGES[name](spark)


if __name__ == "__main__":
    main()
