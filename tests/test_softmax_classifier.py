"""Multiclass softmax classifier: planted 4-language identification
accuracy, an exact pure-Python full-batch Adagrad differential,
persistence round-trip, the bias-prior convention for featureless
documents, and the text_profile lang_model wiring."""

import math
import random

import pytest
from pyspark.sql import functions as F

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.operators.curation import (
    hashed_ngram_features,
    lang_classify,
    load_softmax_classifier,
    save_softmax_classifier,
    softmax_classify,
    train_softmax_classifier,
)
from mallarddv_spark.operators.textops import text_profile

# Distinct function-word inventories per language — what a langid
# classifier actually keys on.
LANG_VOCAB = {
    "de": ("der die das und ist nicht mit für aber auch wenn dann "
           "haus wasser arbeit zeit").split(),
    "en": ("the and is not with for but also when then house water "
           "work time of to").split(),
    "es": ("el la los y es no con para pero cuando entonces casa "
           "agua trabajo tiempo").split(),
    "fr": ("le la les et est pas avec pour mais aussi quand alors "
           "maison eau travail temps").split(),
}


def _lang_corpus(n, seed, words=25):
    rnd = random.Random(seed)
    langs = sorted(LANG_VOCAB)
    rows = []
    for i in range(n):
        lg = langs[i % len(langs)]
        rows.append(
            (i, " ".join(rnd.choice(LANG_VOCAB[lg]) for _ in range(words)),
             lg)
        )
    return rows


def test_softmax_separates_planted_languages(spark):
    train = spark.createDataFrame(
        _lang_corpus(160, 7), ["doc_id", "text", "lang"]
    )
    test = spark.createDataFrame(
        _lang_corpus(200, 99), ["doc_id", "text", "lang"]
    )
    model = train_softmax_classifier(
        train, "lang", "text", buckets=1024, iters=40, lr=2.0
    )
    assert model["classes"] == sorted(LANG_VOCAB)
    assert model["loss_history"][-1] < model["loss_history"][0] * 0.5
    scored = lang_classify(test, "doc_id", "text", model).select(
        "doc_id", F.col("lang").alias("pred")
    )
    joined = test.join(scored, "doc_id")
    acc = joined.select(
        F.avg((F.col("lang") == F.col("pred")).cast("double"))
    ).collect()[0][0]
    assert acc >= 0.99


def _py_softmax_adagrad(feats, labels, buckets, k_cls, iters, lr, reg,
                        eps=1e-8):
    """Reference full-batch Adagrad on L2-regularized cross-entropy,
    identical math to train_softmax_classifier (tf-normalized features,
    zero init, max-shifted softmax, z summed in class order)."""
    n = len(labels)
    w = [[0.0] * k_cls for _ in range(buckets)]
    gsq = [[0.0] * k_cls for _ in range(buckets)]
    b = [0.0] * k_cls
    b_gsq = [0.0] * k_cls
    by_doc = {}
    for d, bk, x in feats:
        by_doc.setdefault(d, []).append((bk, x))
    for _ in range(iters):
        errs = {}
        for d, y in labels.items():
            s = [sum(w[bk][c] * x for bk, x in by_doc[d]) + b[c]
                 for c in range(k_cls)]
            mx = max(s)
            e = [math.exp(v - mx) for v in s]
            z = 0.0
            for v in e:
                z += v
            p = [v / z for v in e]
            errs[d] = [p[c] - (1.0 if c == y else 0.0)
                       for c in range(k_cls)]
        gw = [[0.0] * k_cls for _ in range(buckets)]
        for d, ev in errs.items():
            for bk, x in by_doc[d]:
                for c in range(k_cls):
                    gw[bk][c] += x * ev[c]
        for bk in range(buckets):
            for c in range(k_cls):
                gt = gw[bk][c] / n + reg * w[bk][c]
                w[bk][c] -= lr * gt / math.sqrt(
                    gsq[bk][c] + gt * gt + eps
                )
                gsq[bk][c] += gt * gt
        for c in range(k_cls):
            gb = sum(ev[c] for ev in errs.values()) / n
            b_gsq[c] += gb * gb
            b[c] -= lr * gb / math.sqrt(b_gsq[c] + eps)
    return w, b


def test_softmax_matches_pure_python_gd(spark):
    buckets, iters, lr, reg = 32, 12, 1.5, 1e-3
    df = spark.createDataFrame(
        _lang_corpus(40, 3, words=12), ["doc_id", "text", "lang"]
    )
    model = train_softmax_classifier(
        df, "lang", "text", buckets=buckets, iters=iters, lr=lr, reg=reg
    )
    k_cls = len(model["classes"])
    cls_of = {c: i for i, c in enumerate(model["classes"])}
    feats = hashed_ngram_features(df, "doc_id", "text", buckets=buckets)
    tot = {r.doc_id: r.t for r in
           feats.groupBy("doc_id").agg(F.sum("cnt").alias("t")).collect()}
    triples = [(r.doc_id, r.bucket, r.cnt / tot[r.doc_id])
               for r in feats.collect()]
    labels = {r.doc_id: cls_of[r.lang]
              for r in df.select("doc_id", "lang").collect()
              if r.doc_id in tot}
    w_exp, b_exp = _py_softmax_adagrad(
        triples, labels, buckets, k_cls, iters, lr, reg
    )
    got = {(r.bucket, r.cls): r.w for r in model["weights"].collect()}
    for c in range(k_cls):
        assert model["biases"][c] == pytest.approx(b_exp[c], abs=1e-9)
    for bk in range(buckets):
        for c in range(k_cls):
            assert got[(bk, c)] == pytest.approx(w_exp[bk][c], abs=1e-9)


def test_softmax_loss_history_and_probs_sum_to_one(spark):
    iters = 5
    df = spark.createDataFrame(
        _lang_corpus(40, 11), ["doc_id", "text", "lang"]
    )
    model = train_softmax_classifier(
        df, "lang", "text", buckets=256, iters=iters, lr=1.5
    )
    assert len(model["loss_history"]) == iters + 1
    scored = softmax_classify(df, "doc_id", "text", model,
                              return_probs=True)
    for r in scored.collect():
        assert sum(r.probs) == pytest.approx(1.0, abs=1e-9)
        assert r.score == pytest.approx(max(r.probs), abs=1e-12)


def test_softmax_save_load_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        _lang_corpus(60, 13), ["doc_id", "text", "lang"]
    )
    model = train_softmax_classifier(
        df, "lang", "text", buckets=256, iters=15
    )
    path = str(tmp_path / "smmodel")
    save_softmax_classifier(model, path)
    loaded = load_softmax_classifier(spark, path)
    assert loaded["classes"] == model["classes"]
    a = {r.doc_id: (r.label, r.score)
         for r in softmax_classify(df, "doc_id", "text", model).collect()}
    b = {r.doc_id: (r.label, r.score)
         for r in softmax_classify(df, "doc_id", "text", loaded).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k][0] == b[k][0]
        assert a[k][1] == pytest.approx(b[k][1], abs=1e-12)


def test_softmax_empty_text_scores_bias_prior(spark):
    df = spark.createDataFrame(
        _lang_corpus(40, 5), ["doc_id", "text", "lang"]
    )
    model = train_softmax_classifier(
        df, "lang", "text", buckets=128, iters=10
    )
    probe = spark.createDataFrame([(900, "")], ["doc_id", "text"])
    got = softmax_classify(
        probe, "doc_id", "text", model, return_probs=True
    ).collect()[0]
    b = model["biases"]
    mx = max(b)
    e = [math.exp(v - mx) for v in b]
    z = sum(e)
    expected = [v / z for v in e]
    for c in range(len(b)):
        assert got.probs[c] == pytest.approx(expected[c], abs=1e-12)
    assert got.label == model["classes"][expected.index(max(expected))]


def test_text_profile_lang_model_overrides_guess(spark):
    df = spark.createDataFrame(
        _lang_corpus(80, 17), ["doc_id", "text", "lang"]
    )
    model = train_softmax_classifier(
        df, "lang", "text", buckets=512, iters=25, lr=2.0
    )
    prof = text_profile(df, "doc_id", "text", lang_model=model)
    assert "lang_guess" in prof.columns
    joined = df.join(prof.select("doc_id", "lang_guess"), "doc_id")
    acc = joined.select(
        F.avg((F.col("lang") == F.col("lang_guess")).cast("double"))
    ).collect()[0][0]
    assert acc >= 0.95
    # untrained call keeps the heuristic column intact
    heur = text_profile(df, "doc_id", "text")
    assert "lang_guess" in heur.columns


def test_softmax_guards(spark):
    df = spark.createDataFrame(
        [(1, "hello world", "en")], ["doc_id", "text", "lang"]
    )
    with pytest.raises(DVConfigurationError, match="buckets"):
        train_softmax_classifier(df, "lang", "text", buckets=0)
    with pytest.raises(DVConfigurationError, match="iters"):
        train_softmax_classifier(df, "lang", "text", iters=0)
    with pytest.raises(DVConfigurationError, match="distinct labels"):
        train_softmax_classifier(df, "lang", "text")


def test_softmax_classify_plan_has_no_python_stages(spark):
    from mallarddv_spark.plans.audit import plan_report

    df = spark.createDataFrame(
        _lang_corpus(20, 23), ["doc_id", "text", "lang"]
    )
    model = train_softmax_classifier(
        df, "lang", "text", buckets=64, iters=2
    )
    scored = softmax_classify(df, "doc_id", "text", model)
    assert plan_report(scored)["python_stages"] == 0
