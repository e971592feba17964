"""Logistic-regression quality classifier: planted-separation accuracy,
an exact pure-Python gradient-descent differential, persistence
round-trip, and the deterministic Pareto admission rule."""

import math
import random

import pytest
from pyspark.sql import functions as F

from mallarddv_spark.operators.curation import (
    hashed_ngram_features,
    lr_classify,
    load_lr_classifier,
    pareto_keep,
    save_lr_classifier,
    train_lr_classifier,
)

GOOD = ("the study measured reliable evidence across careful experiments "
        "with documented methods and clear results").split()
SPAM = ("click here buy now free winner prize casino cheap pills "
        "unsubscribe offer").split()


def _corpus(n, seed):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        quality = i % 2 == 0
        vocab = GOOD if quality else SPAM
        text = " ".join(rnd.choice(vocab) for _ in range(30))
        rows.append((i, text, 1 if quality else 0))
    return rows


def test_lr_separates_planted_quality(spark):
    train = spark.createDataFrame(_corpus(120, 7), ["doc_id", "text", "y"])
    test = spark.createDataFrame(_corpus(80, 99), ["doc_id", "text", "y"])
    model = train_lr_classifier(
        train, "y", "text", buckets=512, iters=40, lr=2.0
    )
    assert model["loss_history"][-1] < model["loss_history"][0] * 0.7
    scored = lr_classify(test, "doc_id", "text", model)
    joined = test.join(scored, "doc_id")
    acc = (
        joined.select(
            F.avg((F.col("predicted") == (F.col("y") == 1)).cast("double"))
        ).collect()[0][0]
    )
    assert acc >= 0.95


def _py_adagrad(feats, labels, buckets, iters, lr, reg, eps=1e-8):
    """Reference full-batch Adagrad on L2-regularized log-loss, identical
    math to train_lr_classifier (tf-normalized features, zero init)."""
    n = len(labels)
    w = [0.0] * buckets
    gsq = [0.0] * buckets
    b = 0.0
    b_gsq = 0.0
    by_doc = {}
    for d, bk, x in feats:
        by_doc.setdefault(d, []).append((bk, x))
    for _ in range(iters):
        errs = {}
        for d, y in labels.items():
            m = sum(w[bk] * x for bk, x in by_doc[d]) + b
            p = 1.0 / (1.0 + math.exp(-m))
            errs[d] = p - y
        gw = [0.0] * buckets
        for d, e in errs.items():
            for bk, x in by_doc[d]:
                gw[bk] += e * x
        for bk in range(buckets):
            gt = gw[bk] / n + reg * w[bk]
            w[bk] -= lr * gt / math.sqrt(gsq[bk] + gt * gt + eps)
            gsq[bk] += gt * gt
        gb = sum(errs.values()) / n
        b_gsq += gb * gb
        b -= lr * gb / math.sqrt(b_gsq + eps)
    return w, b


def test_lr_matches_pure_python_gd(spark):
    buckets, iters, lr, reg = 64, 15, 1.5, 1e-3
    df = spark.createDataFrame(_corpus(40, 3), ["doc_id", "text", "y"])
    model = train_lr_classifier(
        df, "y", "text", buckets=buckets, iters=iters, lr=lr, reg=reg
    )
    feats = hashed_ngram_features(df, "doc_id", "text", buckets=buckets)
    tot = {r.doc_id: r.t for r in
           feats.groupBy("doc_id").agg(F.sum("cnt").alias("t")).collect()}
    triples = [(r.doc_id, r.bucket, r.cnt / tot[r.doc_id])
               for r in feats.collect()]
    labels = {r.doc_id: float(r.y)
              for r in df.select("doc_id", "y").collect()
              if r.doc_id in tot}
    w_exp, b_exp = _py_adagrad(triples, labels, buckets, iters, lr, reg)
    got = {r.bucket: r.w for r in model["weights"].collect()}
    assert model["bias"] == pytest.approx(b_exp, abs=1e-9)
    for bk in range(buckets):
        assert got[bk] == pytest.approx(w_exp[bk], abs=1e-9)


def test_lr_loss_history_final_entry_measures_returned_model(spark):
    # loss_history has iters+1 entries and the LAST one is the log-loss
    # of the RETURNED weights: replay it from the model itself
    buckets, iters = 64, 5
    df = spark.createDataFrame(_corpus(40, 21), ["doc_id", "text", "y"])
    model = train_lr_classifier(df, "y", "text", buckets=buckets,
                                iters=iters, lr=1.5)
    assert len(model["loss_history"]) == iters + 1
    feats = hashed_ngram_features(df, "doc_id", "text", buckets=buckets)
    tot = {r.doc_id: r.t for r in
           feats.groupBy("doc_id").agg(F.sum("cnt").alias("t")).collect()}
    w = {r.bucket: r.w for r in model["weights"].collect()}
    labels = {r.doc_id: float(r.y)
              for r in df.select("doc_id", "y").collect()
              if r.doc_id in tot}
    margins = {d: model["bias"] for d in labels}
    for r in feats.collect():
        if r.doc_id in margins:
            margins[r.doc_id] += w.get(r.bucket, 0.0) * (
                r.cnt / tot[r.doc_id]
            )
    losses = []
    for d, y in labels.items():
        p = 1.0 / (1.0 + math.exp(-margins[d]))
        p = min(max(p, 1e-15), 1.0 - 1e-15)
        losses.append(-(y * math.log(p) + (1.0 - y) * math.log(1.0 - p)))
    assert model["loss_history"][-1] == pytest.approx(
        sum(losses) / len(losses), abs=1e-9
    )


def test_lr_save_load_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(_corpus(60, 11), ["doc_id", "text", "y"])
    model = train_lr_classifier(df, "y", "text", buckets=256, iters=20)
    path = str(tmp_path / "lrmodel")
    save_lr_classifier(model, path)
    loaded = load_lr_classifier(spark, path)
    a = {r.doc_id: r.score
         for r in lr_classify(df, "doc_id", "text", model).collect()}
    b = {r.doc_id: r.score
         for r in lr_classify(df, "doc_id", "text", loaded).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_lr_empty_text_scores_bias_prior(spark):
    df = spark.createDataFrame(_corpus(40, 5), ["doc_id", "text", "y"])
    model = train_lr_classifier(df, "y", "text", buckets=128, iters=10)
    probe = spark.createDataFrame([(900, "")], ["doc_id", "text"])
    got = lr_classify(probe, "doc_id", "text", model).collect()[0]
    expected = 1.0 / (1.0 + math.exp(-model["bias"]))
    assert got.score == pytest.approx(expected, abs=1e-12)


def test_lr_bad_params_raise(spark):
    from mallarddv_spark.exceptions import DVConfigurationError, DVETLError

    df = spark.createDataFrame([(1, "a b", 1)], ["doc_id", "text", "y"])
    with pytest.raises(DVConfigurationError):
        train_lr_classifier(df, "y", "text", buckets=0)
    with pytest.raises(DVConfigurationError):
        train_lr_classifier(df, "y", "text", iters=0)
    empty = spark.createDataFrame([], "doc_id int, text string, y int")
    with pytest.raises(DVETLError, match="no labeled"):
        train_lr_classifier(empty, "y", "text", iters=1)


def test_pareto_keep_deterministic_and_score_monotone(spark):
    n = 4000
    df = spark.createDataFrame(
        [(i, 0.9 if i % 2 == 0 else 0.1) for i in range(n)],
        ["doc_id", "score"],
    )
    kept = df.select(
        "doc_id", "score", pareto_keep("score", "doc_id").alias("keep")
    )
    again = df.select(
        "doc_id", pareto_keep("score", "doc_id").alias("keep")
    )
    a = {r.doc_id: r.keep for r in kept.collect()}
    b = {r.doc_id: r.keep for r in again.collect()}
    assert a == b, "same salt must replay identical verdicts"
    rates = {
        r.score: r.rate
        for r in kept.groupBy("score")
        .agg(F.avg(F.col("keep").cast("double")).alias("rate"))
        .collect()
    }
    assert rates[0.9] > rates[0.1]
    # closed form: P(keep) = P(Lomax(9) > 1-score) = (2-score)^-9;
    # 2000 docs per score give a binomial sd of ~0.011 at p=0.424
    assert rates[0.9] == pytest.approx((2 - 0.9) ** -9, abs=0.05)
    assert rates[0.1] == pytest.approx((2 - 0.1) ** -9, abs=0.02)
    # a different salt resamples: some verdicts flip among low scorers
    other = df.select(
        "doc_id",
        pareto_keep("score", "doc_id", salt="other").alias("keep"),
    )
    c = {r.doc_id: r.keep for r in other.collect()}
    assert c != a


def test_pareto_keep_bad_alpha_raises(spark):
    from mallarddv_spark.exceptions import DVConfigurationError

    with pytest.raises(DVConfigurationError):
        pareto_keep("s", "i", alpha=0.0)
