"""Retrieval-quality metrics (operators/evaluation): recall@k against an
exact baseline on the real corpus (LSH vs brute-force cosine), missing
queries counted as zero, MRR semantics, result-set-sized plans."""

import pytest
from pyspark.sql import Row, functions as F

from mallarddv_spark.operators import evaluation
from mallarddv_spark.operators.evaluation import (
    ndcg_at_k,
    recall_at_k,
    reciprocal_rank,
)

SF = "/root/testdata/sf0.001"


def test_recall_semantics(spark):
    exact = spark.createDataFrame(
        [Row(query_id="a", neighbor_id=i, rank=i) for i in (1, 2, 3)]
        + [Row(query_id="b", neighbor_id=i, rank=i) for i in (1, 2)]
        + [Row(query_id="c", neighbor_id=1, rank=1)]
    )
    approx = spark.createDataFrame(
        # a: 2 of 3; b: both but one past the k cut; c: absent entirely
        [Row(query_id="a", neighbor_id=1, rank=1),
         Row(query_id="a", neighbor_id=3, rank=2),
         Row(query_id="a", neighbor_id=99, rank=3),
         Row(query_id="b", neighbor_id=1, rank=1),
         Row(query_id="b", neighbor_id=2, rank=4)]
    )
    got = {r.query_id: (r.n_exact, r.n_hit, r.recall)
           for r in recall_at_k(approx, exact).collect()}
    assert got == {"a": (3, 2, round(2 / 3, 6)), "b": (2, 2, 1.0),
                   "c": (1, 0, 0.0)}
    cut = {r.query_id: r.recall
           for r in recall_at_k(approx, exact, k=2).collect()}
    assert cut == {"a": 0.5, "b": 0.5, "c": 0.0}


def test_reciprocal_rank(spark):
    truth = spark.createDataFrame(
        [Row(query_id="a", neighbor_id=7), Row(query_id="b", neighbor_id=9),
         Row(query_id="c", neighbor_id=5)]
    )
    approx = spark.createDataFrame(
        [Row(query_id="a", neighbor_id=3, rank=1),
         Row(query_id="a", neighbor_id=7, rank=2),
         Row(query_id="b", neighbor_id=9, rank=1),
         Row(query_id="c", neighbor_id=8, rank=1)]
    )
    got = {r.query_id: (r.first_rank, r.rr)
           for r in reciprocal_rank(approx, truth).collect()}
    assert got == {"a": (2, 0.5), "b": (1, 1.0), "c": (None, 0.0)}
    mrr = reciprocal_rank(approx, truth).agg(F.avg("rr")).first()[0]
    assert abs(mrr - 0.5) < 1e-9


def test_ndcg_semantics(spark):
    """Hand-computed graded nDCG: a perfect ordering scores 1.0, a
    buried relevant doc discounts, missing queries and all-zero labels
    score 0.0."""
    import math

    truth = spark.createDataFrame(
        # a: graded labels; b: binary; c: never retrieved; d: all-zero rels
        [Row(query_id="a", neighbor_id=1, rel=3.0),
         Row(query_id="a", neighbor_id=2, rel=1.0),
         Row(query_id="b", neighbor_id=9, rel=1.0),
         Row(query_id="c", neighbor_id=5, rel=2.0),
         Row(query_id="d", neighbor_id=4, rel=0.0)]
    )
    approx = spark.createDataFrame(
        # a retrieves its docs in the WRONG order; b leads with its doc
        [Row(query_id="a", neighbor_id=2, rank=1),
         Row(query_id="a", neighbor_id=1, rank=2),
         Row(query_id="b", neighbor_id=9, rank=1),
         Row(query_id="b", neighbor_id=8, rank=2),
         Row(query_id="d", neighbor_id=4, rank=1)]
    )
    got = {r.query_id: r for r in
           ndcg_at_k(approx, truth, rel_col="rel", k=10).collect()}
    # a: DCG = 1/log2(2) + 7/log2(3); IDCG = 7/log2(2) + 1/log2(3)
    dcg_a = 1.0 + 7.0 / math.log2(3)
    idcg_a = 7.0 + 1.0 / math.log2(3)
    assert abs(got["a"].ndcg - dcg_a / idcg_a) < 1e-5
    assert got["a"].ndcg < 1.0
    assert got["b"].ndcg == 1.0
    assert got["c"].ndcg == 0.0 and got["c"].dcg == 0.0
    assert got["d"].ndcg == 0.0  # IDCG 0 — defined as 0, not NULL/NaN
    # binary default: every truth pair counts as rel=1
    binary = {r.query_id: r.ndcg
              for r in ndcg_at_k(approx, truth, k=10).collect()}
    assert binary["b"] == 1.0 and binary["d"] == 1.0
    # the k cut drops a's rank-2 hit entirely
    at1 = {r.query_id: r.ndcg
           for r in ndcg_at_k(approx, truth, rel_col="rel", k=1).collect()}
    assert abs(at1["a"] - 1.0 / 7.0) < 1e-5


def test_ndcg_plan_is_result_set_sized(spark):
    from mallarddv_spark.plans.audit import plan_report

    run = spark.createDataFrame([Row(query_id="a", neighbor_id=1, rank=1)])
    truth = spark.createDataFrame([Row(query_id="a", neighbor_id=1)])
    df = ndcg_at_k(run, truth, k=5)
    rep = plan_report(df)
    assert rep["python_stages"] == 0 and rep["nested_loop_joins"] == 0
    # the ideal-ordering cut must be WindowGroupLimit-protected
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_recall_on_real_ann_tiers(spark):
    """The intended workflow: measure hyperplane-LSH recall against the
    brute-force baseline on the real embeddings, end to end."""
    from mallarddv_spark.operators.similarity import (
        cosine_topk_bruteforce,
        hyperplane_lsh_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter("vec_id < 5")
    corpus = emb.filter("vec_id >= 5")
    exact = cosine_topk_bruteforce(queries, corpus, k=10)
    approx = hyperplane_lsh_topk(queries, corpus, k=10, num_bits=16, bands=8)
    rec = recall_at_k(approx, exact, k=10)
    rows = rec.collect()
    assert len(rows) == 5
    mean = rec.agg(F.avg("recall")).first()[0]
    assert 0.0 <= mean <= 1.0
    # 8 bands of 2 bits is a high-recall shape on 64-dim normals
    assert mean > 0.5


def test_plans_are_result_set_sized(spark):
    from mallarddv_spark.plans.audit import plan_report

    exact = spark.createDataFrame(
        [Row(query_id="a", neighbor_id=1, rank=1)]
    )
    rep = plan_report(recall_at_k(exact, exact, k=5))
    assert rep["python_stages"] == 0 and rep["nested_loop_joins"] == 0


def test_ndcg_duplicate_labels_collapse(spark):
    """A duplicated truth pair must not double its gain: duplicates
    collapse to the strongest label on both the DCG and ideal sides."""
    truth = spark.createDataFrame(
        [Row(query_id="a", neighbor_id=1, rel=2.0),
         Row(query_id="a", neighbor_id=1, rel=3.0),  # duplicate, stronger
         Row(query_id="a", neighbor_id=2, rel=1.0)]
    )
    run = spark.createDataFrame(
        [Row(query_id="a", neighbor_id=1, rank=1),
         Row(query_id="a", neighbor_id=2, rank=2)]
    )
    got = ndcg_at_k(run, truth, rel_col="rel", k=10).first()
    assert got.ndcg == 1.0  # perfect order under the deduped labels
    # DCG = 7/log2(2) + 1/log2(3) — duplicate did NOT double-count
    import math
    assert abs(got.dcg - (7.0 + 1.0 / math.log2(3))) < 1e-5


def test_tokenizer_stats_across_the_triad(spark):
    """tokenizer_stats: hand-computed values on a fixture, plus the
    comparative properties a tokenizer bake-off relies on (fertility
    >= 1 and falling with merge budget; WordPiece unk_rate zero on its
    own training corpus, NULL where the encoder reports no n_unk)."""
    from mallarddv_spark.operators.bpe import bpe_encode, train_bpe
    from mallarddv_spark.operators.evaluation import tokenizer_stats
    from mallarddv_spark.operators.wordpiece import (
        train_wordpiece,
        wordpiece_encode,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the mat sat flat"), (3, "a cat sat")],
        ["doc_id", "text"],
    )
    wp = train_wordpiece(docs, "text", num_merges=6, min_pair_count=1)
    enc = wordpiece_encode(docs, "doc_id", "text", wp)
    row = tokenizer_stats(docs, enc, "doc_id", "text").first()
    # hand check: 10 words, 29 non-space chars; totals must reconcile
    n_chars = sum(len(t.replace(" ", ""))
                  for _, t in docs.collect())
    assert n_chars == 29
    assert row.n_docs == 3 and row.n_words == 10
    agg = enc.agg({"n_tokens": "sum"}).first()[0]
    assert row.n_tokens == agg
    assert row.fertility == round(agg / 10, 6)
    assert row.chars_per_token == round(n_chars / agg, 6)
    assert row.unk_rate == 0.0  # own training corpus, full coverage
    # BPE reports no n_unk -> NULL unk_rate; fertility falls with merges
    few = tokenizer_stats(
        docs, bpe_encode(docs, "doc_id", "text",
                         train_bpe(docs, "text", num_merges=2,
                                   min_pair_count=1)),
        "doc_id", "text",
    ).first()
    many = tokenizer_stats(
        docs, bpe_encode(docs, "doc_id", "text",
                         train_bpe(docs, "text", num_merges=25,
                                   min_pair_count=1)),
        "doc_id", "text",
    ).first()
    assert few.unk_rate is None and many.unk_rate is None
    assert few.fertility >= many.fertility >= 1.0
    assert many.chars_per_token >= few.chars_per_token


def _py_bootstrap(values, B, level, salt="boot-v1"):
    """Reference Poisson bootstrap replaying the exact hash->uniform->
    inverse-CDF draw chain of bootstrap_ci."""
    import hashlib
    import math as m

    cum, acc = [], 0.0
    for k in range(8):
        acc += m.exp(-1.0) / m.factorial(k)
        cum.append((k, acc))

    def pois(b, rid):
        h = hashlib.md5(f"{salt}|{b}|{rid}".encode()).hexdigest()[:15]
        u = int(h, 16) / float(16 ** 15)
        for k, thr in cum:
            if u < thr:
                return k
        return 8

    means = []
    for b in range(1, B + 1):
        num = den = 0.0
        for rid, v in values:
            w = pois(b, rid)
            num += w * v
            den += w
        if den > 0:
            means.append(num / den)
    means.sort()
    alpha = (1.0 - level) / 2.0

    def pct(p):
        # Spark/DuckDB percentile(): linear interpolation on sorted data
        idx = p * (len(means) - 1)
        lo_i, frac = int(idx), idx - int(idx)
        if lo_i + 1 < len(means):
            return means[lo_i] + frac * (means[lo_i + 1] - means[lo_i])
        return means[lo_i]

    return round(pct(alpha), 6), round(pct(1.0 - alpha), 6), len(means)


def test_bootstrap_ci_matches_python_reference(spark):
    import random

    rnd = random.Random(5)
    rows = [(i, round(rnd.uniform(0.2, 0.9), 3)) for i in range(40)]
    df = spark.createDataFrame(rows, "query_id int, recall double")
    got = evaluation.bootstrap_ci(
        df, "recall", "query_id", B=200, level=0.9
    ).collect()[0]
    lo, hi, b = _py_bootstrap(rows, B=200, level=0.9)
    assert got.n == 40
    assert got.b == b
    assert got.lo == pytest.approx(lo, abs=2e-6)
    assert got.hi == pytest.approx(hi, abs=2e-6)
    assert got.lo <= got.mean <= got.hi
    assert got.level == 0.9


def test_bootstrap_ci_null_values_fully_excluded(spark):
    # NULL metric rows must not appear in n, mean, or the replicate
    # weights: the interval over (values + NULLs) equals the interval
    # over the non-null values alone
    import random

    rnd = random.Random(13)
    vals = [(i, round(rnd.uniform(0.3, 0.8), 3)) for i in range(30)]
    with_nulls = vals + [(100 + i, None) for i in range(10)]
    clean = spark.createDataFrame(vals, "query_id int, v double")
    dirty = spark.createDataFrame(with_nulls, "query_id int, v double")
    a = evaluation.bootstrap_ci(clean, "v", "query_id", B=150).collect()[0]
    b = evaluation.bootstrap_ci(dirty, "v", "query_id", B=150).collect()[0]
    assert b.n == 30
    assert (b.mean, b.lo, b.hi, b.b) == (a.mean, a.lo, a.hi, a.b)


def test_bootstrap_ci_narrows_with_sample_size(spark):
    import random

    rnd = random.Random(9)
    small = spark.createDataFrame(
        [(i, rnd.gauss(0.5, 0.1)) for i in range(20)],
        "query_id int, v double",
    )
    rnd = random.Random(9)
    big = spark.createDataFrame(
        [(i, rnd.gauss(0.5, 0.1)) for i in range(500)],
        "query_id int, v double",
    )
    a = evaluation.bootstrap_ci(small, "v", "query_id", B=200).collect()[0]
    c = evaluation.bootstrap_ci(big, "v", "query_id", B=200).collect()[0]
    assert (c.hi - c.lo) < (a.hi - a.lo)


def test_bootstrap_ci_deterministic_and_salt_rerolls(spark):
    df = spark.createDataFrame(
        [(i, 0.1 * (i % 10)) for i in range(30)], "query_id int, v double"
    )
    a = evaluation.bootstrap_ci(df, "v", "query_id", B=100).collect()[0]
    b = evaluation.bootstrap_ci(df, "v", "query_id", B=100).collect()[0]
    assert (a.lo, a.hi) == (b.lo, b.hi)
    c = evaluation.bootstrap_ci(
        df, "v", "query_id", B=100, salt="other"
    ).collect()[0]
    assert (c.lo, c.hi) != (a.lo, a.hi)


def test_bootstrap_ci_small_n_empty_replicates(spark):
    """At n=3 an all-zero-weight replicate occurs with probability
    e^-3 ≈ 5% per replicate — near-certain somewhere in B=300.
    Regression: the division once ran BEFORE the empty-replicate drop
    and raised DIVIDE_BY_ZERO under ANSI mode; now empty replicates
    are filtered first and their absence shows in b < B."""
    df = spark.createDataFrame(
        [("a", 0.8), ("b", 0.9), ("c", 1.0)], "query_id string, v double"
    )
    r = evaluation.bootstrap_ci(df, "v", "query_id", B=300).collect()[0]
    assert r.n == 3
    assert r.b < 300  # some replicates were empty and dropped
    assert 0.8 <= r.lo <= r.hi <= 1.0


def test_bootstrap_ci_guards(spark):
    from mallarddv_spark.exceptions import DVConfigurationError

    df = spark.createDataFrame([(1, 0.5)], "query_id int, v double")
    with pytest.raises(DVConfigurationError, match="B must be"):
        evaluation.bootstrap_ci(df, "v", "query_id", B=5)
    with pytest.raises(DVConfigurationError, match="level"):
        evaluation.bootstrap_ci(df, "v", "query_id", level=1.5)
