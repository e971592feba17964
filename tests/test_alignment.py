"""Margin-based alignment mining (operators/alignment): hand-computed
margins, mutual filtering, planted-correspondence recovery on the real
embeddings, ANN-kNN pluggability, 1:1 extraction, plan pins."""

import pytest
from pyspark.sql import functions as F

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.operators import alignment as al

SF = "/root/testdata/sf0.001"


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_margin_hand_computed(spark):
    """Two obvious pairs plus a hub vector: margins match the closed
    form and the hub pair scores ~1."""
    src = _vecs(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    tgt = _vecs(spark, [(10, [1.0, 0.1]), (20, [0.1, 1.0])])
    got = {(r.src_id, r.tgt_id): r for r in al.margin_knn_pairs(
        src, tgt, k=2, mutual=False).collect()}
    # every query sees both targets (k=2), so avg_fwd/avg_bwd are the
    # mean of the two cosines; the aligned pair's margin must beat 1,
    # the crossed pair's must sit below 1
    assert got[(1, 10)].margin > 1.0 > got[(1, 20)].margin
    assert got[(2, 20)].margin > 1.0 > got[(2, 10)].margin
    # closed form for (1, 10): cos=0.995037; afwd(1)=(0.995037+0.099504)/2
    # abwd(10)=(0.995037+0.099504)/2 -> margin = cos/0.547271
    assert abs(got[(1, 10)].margin - round(0.995037 / 0.5472705, 6)) < 1e-5


def test_mutual_filter_drops_asymmetric_hits(spark):
    """A target vector that is everyone's neighbor (hub) but whose own
    top-k points elsewhere is dropped by the mutual intersection."""
    src = _vecs(spark, [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])])
    tgt = _vecs(spark, [
        (10, [1.0, 0.05, 0.0]),   # true partner of 1
        (20, [0.05, 1.0, 0.0]),   # true partner of 2
        (30, [0.6, 0.6, 0.0]),    # hub: near both sources
    ])
    all_pairs = al.margin_knn_pairs(src, tgt, k=1, mutual=False)
    mut = al.margin_knn_pairs(src, tgt, k=1, mutual=True)
    # with k=1 the forward pass maps each src to its best target; the
    # mutual pass keeps only reciprocated bests
    assert {(r.src_id, r.tgt_id) for r in mut.collect()} <= {
        (r.src_id, r.tgt_id) for r in all_pairs.collect()
    }
    assert {(r.src_id, r.tgt_id) for r in mut.collect()} == {(1, 10), (2, 20)}


def test_planted_correspondence_recovered(spark):
    """The end-to-end mining claim on real embeddings: tgt = src copies
    under shifted ids; mutual margin mining + 1:1 extraction recovers
    the identity alignment exactly, with margins well above the
    paper's ~1.05 operating threshold."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        "vec_id < 40"
    ).select("vec_id", "embedding")
    tgt = emb.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    pairs = al.margin_knn_pairs(emb, tgt, k=4, mutual=True)
    best = al.best_alignment(pairs)
    got = {(r.src_id, r.tgt_id): r.margin for r in best.collect()}
    assert got.keys() == {(i, i + 1000) for i in range(40)}
    assert min(got.values()) > 1.05
    # 1:1: no id repeats
    assert len({s for s, _ in got}) == 40 and len({t for _, t in got}) == 40


def test_ann_knn_plugs_in(spark):
    """Any kNN with the (query_id, neighbor_id, rank, cosine) shape
    substitutes for the exact brute force — the corpus-scale path."""
    from mallarddv_spark.operators.similarity import hyperplane_lsh_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        "vec_id < 30"
    ).select("vec_id", "embedding")
    tgt = emb.select((F.col("vec_id") + 500).alias("vec_id"), "embedding")

    def ann(q, c, id_col="vec_id", vec_col="embedding", k=4):
        return hyperplane_lsh_topk(
            q, c, id_col=id_col, vec_col=vec_col, k=k, num_bits=16, bands=8
        )

    best = al.best_alignment(
        al.margin_knn_pairs(emb, tgt, k=4, knn=ann, mutual=True)
    )
    got = {(r.src_id, r.tgt_id) for r in best.collect()}
    # LSH recall is high on identical-copy pairs; require near-complete
    assert len(got & {(i, i + 500) for i in range(30)}) >= 27


def test_guards_and_plan(spark):
    from mallarddv_spark.plans.audit import plan_report

    src = _vecs(spark, [(1, [1.0, 0.0])])
    with pytest.raises(DVConfigurationError, match="k must be"):
        al.margin_knn_pairs(src, src, k=0)
    pairs = al.margin_knn_pairs(src, src, k=1, mutual=False)
    assert plan_report(pairs)["python_stages"] == 0
    assert plan_report(al.best_alignment(pairs))["python_stages"] == 0


def _py_hard_negatives(vecs_q, vecs_c, pairs, k, denoise_ratio=None):
    """Full-corpus reference: rank all non-positive corpus items per
    query by round(cosine, 6) desc, id asc; optional RocketQA screen
    (disabled per-query when the weakest positive cosine is <= 0,
    matching the operator's floor guard)."""
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    pos_by_q = {}
    for q, p in pairs:
        pos_by_q.setdefault(q, set()).add(p)
    out = {}
    for q, qv in vecs_q.items():
        if q not in pos_by_q:
            continue
        floor = min(cos(qv, vecs_c[p]) for p in pos_by_q[q])
        cands = []
        for c, cv in vecs_c.items():
            if c in pos_by_q[q]:
                continue
            s = cos(qv, cv)
            if (
                denoise_ratio is not None
                and floor > 0
                and s >= denoise_ratio * floor
            ):
                continue
            cands.append((c, s))
        cands.sort(key=lambda t: (-t[1], t[0]))
        out[q] = [(c, r + 1, s) for r, (c, s) in enumerate(cands[:k])]
    return out


def _rand_emb(rnd, dim=8):
    return [rnd.uniform(-1, 1) for _ in range(dim)]


def test_hard_negatives_match_reference(spark):
    import random

    rnd = random.Random(41)
    vecs_q = {i: _rand_emb(rnd) for i in range(5)}
    vecs_c = {100 + i: _rand_emb(rnd) for i in range(30)}
    pairs = []
    for q in range(4):  # query 4 has no pairs -> excluded entirely
        for p in rnd.sample(sorted(vecs_c), rnd.randint(1, 3)):
            pairs.append((q, p))
    qdf = _vecs(spark, sorted(vecs_q.items()))
    cdf = _vecs(spark, sorted(vecs_c.items()))
    pdf = spark.createDataFrame(pairs, "query_id bigint, pos_id bigint")
    got = al.hard_negative_mine(pdf, qdf, cdf, k=4)
    exp = _py_hard_negatives(vecs_q, vecs_c, pairs, k=4)
    got_by_q = {}
    for r in got.collect():
        got_by_q.setdefault(r.query_id, []).append(
            (r.neg_id, r.rank, r.cosine)
        )
    for q in got_by_q:
        got_by_q[q].sort(key=lambda t: t[1])
    assert set(got_by_q) == set(exp)
    for q in exp:
        assert got_by_q[q] == [
            (c, r, pytest.approx(s, abs=1e-9)) for c, r, s in exp[q]
        ]
        assert all(
            (q, c) not in {(a, b) for a, b in pairs}
            for c, _, _ in got_by_q[q]
        )


def test_hard_negatives_denoise_screen(spark):
    import random

    rnd = random.Random(17)
    vecs_q = {i: _rand_emb(rnd) for i in range(3)}
    vecs_c = {100 + i: _rand_emb(rnd) for i in range(25)}
    # positives are perturbed copies of their query (floor ~= 1), and a
    # planted near-duplicate of each positive must then be screened
    pairs = [(q, 100 + q) for q in range(3)]
    for q in range(3):
        vecs_c[100 + q] = [x + rnd.uniform(-0.01, 0.01) for x in vecs_q[q]]
        vecs_c[200 + q] = [x * 1.001 + 1e-4 for x in vecs_c[100 + q]]
    qdf = _vecs(spark, sorted(vecs_q.items()))
    cdf = _vecs(spark, sorted(vecs_c.items()))
    pdf = spark.createDataFrame(pairs, "query_id bigint, pos_id bigint")
    got = al.hard_negative_mine(
        pdf, qdf, cdf, k=5, fetch_k=len(vecs_c), denoise_ratio=0.98
    )
    exp = _py_hard_negatives(vecs_q, vecs_c, pairs, k=5, denoise_ratio=0.98)
    got_ids = {}
    for r in got.collect():
        got_ids.setdefault(r.query_id, []).append((r.neg_id, r.rank, r.cosine))
    for q in got_ids:
        got_ids[q].sort(key=lambda t: t[1])
    assert set(got_ids) == set(exp)
    for q in exp:
        assert [c for c, _, _ in got_ids[q]] == [c for c, _, _ in exp[q]]
        # the planted near-positive must have been screened out
        assert 200 + q not in {c for c, _, _ in got_ids[q]}


def test_hard_negatives_denoise_negative_floor_disables_screen(spark):
    # query 0's only positive points AWAY from it (floor < 0): the
    # RocketQA assumption fails, so the screen must be a no-op for it —
    # without the guard, threshold = ratio * floor < 0 would discard
    # nearly every candidate
    vecs_q = {0: [1.0, 0.0, 0.0]}
    vecs_c = {
        100: [-1.0, 0.1, 0.0],  # the (bad) positive, cosine ~ -0.995
        200: [0.9, 0.1, 0.0],
        201: [0.8, 0.3, 0.0],
        202: [0.1, 0.9, 0.0],
    }
    pairs = [(0, 100)]
    qdf = _vecs(spark, sorted(vecs_q.items()))
    cdf = _vecs(spark, sorted(vecs_c.items()))
    pdf = spark.createDataFrame(pairs, "query_id bigint, pos_id bigint")
    got = al.hard_negative_mine(
        pdf, qdf, cdf, k=3, fetch_k=len(vecs_c), denoise_ratio=0.9
    )
    rows = sorted(got.collect(), key=lambda r: r.rank)
    assert [r.neg_id for r in rows] == [200, 201, 202]
    exp = _py_hard_negatives(vecs_q, vecs_c, pairs, k=3, denoise_ratio=0.9)
    assert [c for c, _, _ in exp[0]] == [200, 201, 202]


def test_hard_negatives_denoise_widens_default_overfetch(spark):
    # 3 planted near-positives occupy the slots right after the positive
    # and get screened; with the narrow fetch_k = k + max_pos = 4 the
    # true negatives ranked 5..7 would never be fetched and the query
    # would come back EMPTY — the widened 2k + max_pos = 7 default
    # fills all k slots
    vecs_q = {0: [1.0, 0.0, 0.0, 0.0]}
    vecs_c = {100: [1.0, 0.001, 0.0, 0.0]}  # the positive
    for i in range(3):  # near-duplicates of the positive (screened)
        vecs_c[150 + i] = [1.0, 0.002 + 0.0001 * i, 0.0, 0.0]
    for i in range(3):  # true negatives, farther away
        vecs_c[200 + i] = [1.0, 0.3 + 0.05 * i, 0.1, 0.0]
    pairs = [(0, 100)]
    qdf = _vecs(spark, sorted(vecs_q.items()))
    cdf = _vecs(spark, sorted(vecs_c.items()))
    pdf = spark.createDataFrame(pairs, "query_id bigint, pos_id bigint")
    got = al.hard_negative_mine(pdf, qdf, cdf, k=3, denoise_ratio=0.98)
    rows = sorted(got.collect(), key=lambda r: r.rank)
    assert [r.neg_id for r in rows] == [200, 201, 202]


def test_hard_negatives_overfetch_covers_positive_heavy_queries(spark):
    # one query whose 3 positives ARE its top-3 neighbors; default
    # fetch_k = k + max_pos must still return k true negatives
    base = [1.0, 0.0, 0.0, 0.0]
    vecs_q = {0: base}
    vecs_c = {}
    for i in range(3):  # positives: nearly identical to the query
        vecs_c[100 + i] = [1.0, 0.001 * (i + 1), 0.0, 0.0]
    for i in range(6):  # negatives: farther away
        vecs_c[200 + i] = [1.0, 0.2 + 0.05 * i, 0.1, 0.0]
    pairs = [(0, 100), (0, 101), (0, 102)]
    qdf = _vecs(spark, sorted(vecs_q.items()))
    cdf = _vecs(spark, sorted(vecs_c.items()))
    pdf = spark.createDataFrame(pairs, "query_id bigint, pos_id bigint")
    got = al.hard_negative_mine(pdf, qdf, cdf, k=3)
    rows = sorted(got.collect(), key=lambda r: r.rank)
    assert [r.neg_id for r in rows] == [200, 201, 202]


def test_hard_negatives_guards(spark):
    src = _vecs(spark, [(1, [1.0, 0.0])])
    pdf = spark.createDataFrame([(1, 1)], "query_id bigint, pos_id bigint")
    with pytest.raises(DVConfigurationError, match="k must be"):
        al.hard_negative_mine(pdf, src, src, k=0)
    with pytest.raises(DVConfigurationError, match="denoise_ratio"):
        al.hard_negative_mine(pdf, src, src, k=1, denoise_ratio=1.5)
