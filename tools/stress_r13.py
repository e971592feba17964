"""Round-13 stress stages (the stress_sf1 discipline: no baseline
comparison — catch super-linear blowups, integration bugs between
individually-proven operators, and shuffle cliffs one decade past the
bench SF).

Stages:

* ``pretrain1m`` — the END-TO-END pretraining materialization path ONE
  DECADE past round 12's 50k-doc drive (r12 verdict #5: "integration
  cost lives between stages"): a 1M-doc corpus derived in-engine from
  the deterministic Zipf corpus (20 rotated/sliced replicas per source
  doc — real subword structure, varied lengths for FFD), encode (fold
  replay, persisted 4k-merge byte-level model) → ``bpe_vocab`` +
  ``tokens_to_ids`` → ``textops.write_packed_shards``. The id frame is
  handed to write_packed_shards UN-checkpointed — exercising the
  operator's own single-materialization persist (r12 advice #1) and
  the in-plan NULL guard (r12 verdict #3: no separate validation
  scan). Invariants re-derived from the bytes on disk: Σ ids(shards)
  == Σ tokens(encode) == manifest.total_ids, every doc in exactly one
  bin, no non-oversize bin over budget, and the manifest carries the
  ``bpe.vocab_fingerprint`` provenance cell (r12 advice #2).
* ``packbench`` — ``pack_bins_ffd`` at 1M docs / 2048 shards with the
  r12-recorded length regime (deterministic pseudo-lengths, mean ~500,
  budget 2048): the before/after timing for the once-per-step
  first-fit binding (r12 verdict #4; r12 recorded 48 s with the fit
  expression interpolated 3× into the fold).
* ``fusion`` — the multi-tokenizer stream-fusion feature at scale:
  encode 200k Zipf docs under all THREE whitespace tokenizers (BPE,
  WordPiece, unigram), once with each encoder deriving its own word
  stream (three corpus explodes) and once through the shared
  ``whitespace_word_stream`` + ``stream=`` path (one explode,
  checkpointed). Token counts must be identical; the timing delta is
  the feature's value.

Usage: python tools/stress_r13.py [pretrain1m packbench fusion]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mallarddv_spark.session import get_spark  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIPF = os.path.join(ROOT, "_stress", "zipf")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def _corpus_1m(spark):
    """1M docs with genuine subword structure, derived in-engine from
    the 50k-doc deterministic Zipf corpus: replica k (k = 0..19) drops
    the first 5k words and re-ids at k*50_000 — content keeps the Zipf
    vocabulary (encode cost is real), lengths vary 25..120 words (FFD
    sees a spread, not a constant)."""
    src = f"{ZIPF}/documents.parquet"
    if not os.path.exists(src):
        raise SystemExit(
            "Zipf corpus missing — regenerate deterministically with: "
            "python tools/gen_zipf_corpus.py"
        )
    docs = spark.read.parquet(src)
    reps = spark.range(20).select(F.col("id").cast("int").alias("k"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("k").cast("bigint") * 50_000)
        .alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice(F.split("text", " "), F.col("k") * 5 + 1, F.lit(200)),
        ).alias("text"),
    )


def stress_pretrain1m(spark):
    from mallarddv_spark.operators.bpe import (
        bpe_encode, bpe_vocab, load_bpe, tokens_to_ids, train_bpe,
        vocab_fingerprint,
    )
    from mallarddv_spark.operators.textops import write_packed_shards

    t0 = time.monotonic()
    corpus = _corpus_1m(spark).localCheckpoint(eager=True)
    n_docs = corpus.count()
    timings = {"corpus_sec": round(time.monotonic() - t0, 2)}
    emit(op="pretrain1m_progress", stage="corpus", docs=n_docs, **timings)

    if os.path.exists(f"{ZIPF}/bpe4k"):
        model = load_bpe(spark, f"{ZIPF}/bpe4k")
        model_src = f"{ZIPF}/bpe4k"
    else:
        model = train_bpe(corpus, "text", num_merges=256, byte_level=True,
                          lowercase=False, exact_rank=False)
        model_src = "trained-inline-256"

    # encode is checkpointed ONCE (it is the expensive stage and two
    # consumers need it: the independent token count and the id hop);
    # everything after flows through write_packed_shards' own persist
    t0 = time.monotonic()
    enc = bpe_encode(corpus, "doc_id", "text", model).localCheckpoint(
        eager=True
    )
    total_tokens = int(enc.agg(F.sum("n_tokens")).collect()[0][0])
    timings["encode_sec"] = round(time.monotonic() - t0, 2)
    emit(op="pretrain1m_progress", stage="encode",
         tokens=total_tokens, **timings)

    vocab = bpe_vocab(model, specials=["<|endoftext|>"])
    ids = tokens_to_ids(enc, "tokens", vocab).select("doc_id", "ids")

    budget, n_shards = 2048, 2048  # ≈490 docs/shard: docs×bins ≪ 10⁶
    t0 = time.monotonic()
    shard_path = f"{ZIPF}/idshards_1m"
    shutil.rmtree(shard_path, ignore_errors=True)
    manifest = write_packed_shards(
        ids, shard_path, "doc_id", "ids",
        token_budget=budget, n_shards=n_shards,
        meta=vocab_fingerprint(vocab),
    )
    timings["pack_write_sec"] = round(time.monotonic() - t0, 2)
    emit(op="pretrain1m_progress", stage="pack_write", **timings)

    # invariants from the BYTES ON DISK, independently of the manifest;
    # entry is through read_packed_shards, so the provenance contract
    # (manifest presence, vocab fingerprint, totals-vs-disk) is also
    # exercised at this scale (reader added after the recorded 1M run,
    # whose verify read the parquet directly — same bytes, same checks
    # plus the fingerprint gate)
    t0 = time.monotonic()
    from mallarddv_spark.operators.textops import read_packed_shards

    written = read_packed_shards(spark, shard_path, expected_vocab=vocab)
    inv = written.agg(
        F.count("*").alias("docs"),
        F.sum(F.size("ids")).alias("ids_total"),
        F.countDistinct("id").alias("distinct_docs"),
        F.sum(F.exists("ids", lambda x: x.isNull()).cast("int"))
        .alias("null_docs"),
    ).collect()[0]
    bad_bins = (
        written.groupBy("shard_id", "bin_id")
        .agg(F.sum(F.size("ids")).alias("load"),
             F.max("oversize").alias("ov"),
             F.count("*").alias("members"))
        .filter((F.col("load") > budget)
                & ~(F.col("ov") & (F.col("members") == 1)))
        .count()
    )
    # decode probe: bytes on disk → ids_to_tokens → decode_byte_tokens
    # must reproduce the SOURCE text exactly (byte-level lossless
    # round-trip, end to end through the shard files)
    from mallarddv_spark.operators.bpe import (
        decode_byte_tokens, ids_to_tokens,
    )

    probe = {
        r.id: r.tokens for r in ids_to_tokens(
            written.filter("id % 50000 = 0"), "ids", vocab
        ).collect()
    }
    src = {r.doc_id: r.text
           for r in corpus.filter("doc_id % 50000 = 0").collect()}
    bad_decode = [i for i, toks in probe.items()
                  if decode_byte_tokens(toks) != src[i]]
    timings["verify_sec"] = round(time.monotonic() - t0, 2)

    emit(op="pretrain1m_pipeline", model=model_src,
         merges=len(model["merges"]), vocab=len(vocab),
         docs=int(inv.docs), distinct_docs=int(inv.distinct_docs),
         tokens_encoded=total_tokens, ids_on_disk=int(inv.ids_total),
         manifest_ids=manifest["total_ids"],
         null_id_docs=int(inv.null_docs),
         bins=manifest["total_bins"], budget=budget, shards=n_shards,
         bad_bins=bad_bins, padding_frac=manifest["padding_frac"],
         manifest_meta=manifest.get("meta"),
         decode_probe=len(probe), decode_bad=len(bad_decode), **timings)
    assert not bad_decode, "shard → ids → tokens → text must be lossless"
    assert int(inv.null_docs) == 0
    assert int(inv.ids_total) == total_tokens == manifest["total_ids"], (
        "token conservation"
    )
    assert int(inv.docs) == int(inv.distinct_docs) == n_docs
    assert bad_bins == 0
    assert manifest["meta"] == vocab_fingerprint(vocab)
    shutil.rmtree(shard_path, ignore_errors=True)


def stress_packbench(spark):
    """pack_bins_ffd at the r12-recorded regime: 1M docs, deterministic
    pseudo-lengths 100..900 (mean ~500), budget 2048, 2048 shards —
    one task per shard, docs × bins ≈ 490 × 120 ≪ 10⁶ per shard."""
    from mallarddv_spark.operators.textops import (
        pack_bins_ffd, packing_plan_report,
    )

    docs = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        (100 + (F.col("id") * 2654435761) % 801).cast("bigint")
        .alias("n_ids"),
    )
    emit(op="packing_plan_report", **packing_plan_report(
        docs, length_col="n_ids", token_budget=2048))
    t0 = time.monotonic()
    out = pack_bins_ffd(docs, "doc_id", length_col="n_ids",
                        token_budget=2048, n_shards=2048)
    agg = out.groupBy().agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.countDistinct("shard_id", "bin_id").alias("bins"),
        F.sum(F.col("oversize").cast("int")).alias("oversize"),
    ).collect()[0]
    sec = round(time.monotonic() - t0, 2)
    padding = round(1.0 - float(agg.tokens) / (int(agg.bins) * 2048), 4)
    emit(op="packbench_1m_2048shards", pack_sec=sec, docs=int(agg.docs),
         tokens=int(agg.tokens), bins=int(agg.bins),
         oversize=int(agg.oversize), padding_frac=padding)
    assert int(agg.docs) == 1_000_000
    assert int(agg.oversize) == 0


def stress_fusion(spark):
    """Three tokenizers over 200k docs: separate streams (each encoder
    pays its own corpus explode + distinct) vs ONE shared checkpointed
    stream. Same models both ways; per-encoder token sums must match
    exactly — only the corpus-pass count differs."""
    from mallarddv_spark.functions.litframe import literal_frame
    from mallarddv_spark.operators.bpe import (
        bpe_encode, whitespace_word_stream,
    )
    from mallarddv_spark.operators.unigram import unigram_encode
    from mallarddv_spark.operators.wordpiece import wordpiece_encode

    corpus = (
        _corpus_1m(spark).filter("doc_id < 200000")
        .localCheckpoint(eager=True)
    )
    bpe_model = {
        "merges": [("t", "h"), ("th", "e▁"), ("a", "n"), ("i", "n"),
                   ("e", "r"), ("o", "n"), ("s", "t"), ("r", "e")],
        "lowercase": True, "byte_level": False,
    }
    wp_model = {
        "vocab": ([c for c in "abcdefghijklmnopqrstuvwxyz"]
                  + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
                  + ["th", "##he", "an", "##nd", "in", "##ng", "er",
                     "st", "re", "##ed"]),
        "lowercase": True,
    }
    un_vocab = literal_frame(
        spark,
        [(c, -2.5) for c in "abcdefghijklmnopqrstuvwxyz0123456789'.,"]
        + [("th", -4.0), ("he", -4.5), ("an", -5.0), ("in", -4.25),
           ("er", -4.25), ("st", -4.25), ("re", -4.5), ("ed", -4.75)],
        "piece string, logp double",
    )

    def run(stream):
        sums = []
        for enc in (
            bpe_encode(corpus, "doc_id", "text", bpe_model,
                       stream=stream),
            wordpiece_encode(corpus, "doc_id", "text", wp_model,
                             stream=stream),
            unigram_encode(corpus, "doc_id", "text", un_vocab,
                           unk_logp=-20.0, stream=stream),
        ):
            sums.append(int(enc.agg(F.sum("n_tokens")).collect()[0][0]))
        return sums

    t0 = time.monotonic()
    separate = run(None)
    sep_sec = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    shared_stream = whitespace_word_stream(
        corpus, "doc_id", "text", lowercase=True
    ).localCheckpoint(eager=True)
    shared = run(shared_stream)
    fus_sec = round(time.monotonic() - t0, 2)
    emit(op="fusion_3tokenizers_200k", separate_sec=sep_sec,
         fused_sec=fus_sec,
         speedup=round(sep_sec / fus_sec, 2) if fus_sec else None,
         token_sums=separate, sums_identical=separate == shared)
    assert separate == shared, "fusion must not change any token count"


STAGES = {
    "pretrain1m": stress_pretrain1m,
    "packbench": stress_packbench,
    "fusion": stress_fusion,
}


def main() -> None:
    names = sys.argv[1:] or list(STAGES)
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    t0 = time.monotonic()
    for n in names:
        STAGES[n](spark)
    emit(op="stress_r13_done", stages=names,
         total_sec=round(time.monotonic() - t0, 2))
    spark.stop()


if __name__ == "__main__":
    main()
