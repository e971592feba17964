"""Connected components vs a pure-Python union-find oracle, the
pair-list → dedup-verdict composition, and PageRank vs a pure-Python
power-iteration reference."""

import random

import pytest
from pyspark.sql import functions as F

from mallarddv_spark.operators.graph import (
    connected_components,
    dedup_assign,
    pagerank,
)


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min node per component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(members) for r, members in comp.items() for n in members}


def test_cc_matches_union_find_random_graphs(spark):
    rnd = random.Random(11)
    for trial in range(3):
        n = 120
        edges = sorted(
            {
                tuple(sorted(rnd.sample(range(n), 2)))
                for _ in range(90 + 40 * trial)
            }
        )
        nodes = sorted({x for e in edges for x in e})
        df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        got = {
            r.node: r.component for r in connected_components(df).collect()
        }
        expected = _uf_components(edges, nodes)
        assert got == expected


def test_cc_long_chain_propagates(spark):
    """A 40-node path graph (diameter 39) must converge well inside the
    default round budget — exercises the pointer-jumping compression, not
    just one-hop neighbor propagation."""
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_cc_nonconvergence_raises(spark):
    from mallarddv_spark.exceptions import DVETLError

    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    with pytest.raises(DVETLError, match="converge"):
        connected_components(df, max_iter=2)


def _py_pagerank(edges, damping=0.85, iters=200, weights=None, seeds=None):
    """Standard power iteration with uniform dangling redistribution —
    the textbook reference (Page et al. 1999), dependency-free; a seed
    set switches to the personalized/TrustRank teleport vector."""
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for idx, (a, b) in enumerate(edges):
        w = 1.0 if weights is None else weights[idx]
        out.setdefault(a, {})
        out[a][b] = out[a].get(b, 0.0) + w
    if seeds is None:
        tele = {v: 1.0 / n for v in nodes}
    else:
        s = sorted(set(seeds) & set(nodes))
        tele = {v: (1.0 / len(s) if v in s else 0.0) for v in nodes}
    rank = dict(tele)
    for _ in range(iters):
        dm = sum(rank[v] for v in nodes if v not in out)
        nxt = {
            v: (1.0 - damping) * tele[v] + damping * dm * tele[v]
            for v in nodes
        }
        for a, tgts in out.items():
            tot = sum(tgts.values())
            for b, w in tgts.items():
                nxt[b] += damping * rank[a] * w / tot
        rank = nxt
    return rank


def test_pagerank_matches_python_reference_random_digraph(spark):
    rnd = random.Random(23)
    n = 40
    edges = sorted(
        {(rnd.randrange(n), rnd.randrange(n)) for _ in range(120)}
    )
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(df, max_iter=30, tol=None).collect()}
    exp = _py_pagerank(edges, iters=30)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_with_dangling_nodes_conserves_mass(spark):
    # 0->1->2, 2 dangling; 3->0
    edges = [(0, 1), (1, 2), (3, 0)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(df, tol=1e-12, max_iter=100).collect()}
    exp = _py_pagerank(edges, iters=400)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_directed_cycle_is_uniform(spark):
    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(df, tol=1e-12, max_iter=100).collect()}
    for v in range(n):
        assert got[v] == pytest.approx(1.0 / n, abs=1e-10)


def test_pagerank_weighted_edges(spark):
    edges = [(0, 1), (0, 2), (2, 0), (1, 0)]
    weights = [3.0, 1.0, 1.0, 1.0]
    df = spark.createDataFrame(
        [(a, b, w) for (a, b), w in zip(edges, weights)],
        ["src", "dst", "w"],
    )
    got = {
        r.node: r.rank
        for r in pagerank(df, weight="w", tol=1e-12, max_iter=200).collect()
    }
    exp = _py_pagerank(edges, iters=400, weights=weights)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-9)
    # node 1 gets 3x node 2's share of node 0's mass
    assert got[1] > got[2]


def test_pagerank_trustrank_seeds_demote_unreachable_spam(spark):
    # trusted cluster 0-1-2 (seed 0) + a densely interlinked spam farm
    # 10..13 with a link INTO the trusted cluster but none back
    edges = [(0, 1), (1, 2), (2, 0)]
    edges += [(a, b) for a in range(10, 14) for b in range(10, 14) if a != b]
    edges += [(10, 0)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {
        r.node: r.rank
        for r in pagerank(df, tol=1e-12, max_iter=200, seeds=seeds).collect()
    }
    exp = _py_pagerank(edges, iters=500, seeds=[0])
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the farm holds no teleport mass and is unreachable from the seed:
    # its rank decays to ~0 despite maximal interlinking
    assert max(got[v] for v in range(10, 14)) < 1e-9
    assert got[0] > 0.3


def test_pagerank_seeds_ignore_foreign_ids_and_guard_empty(spark):
    from mallarddv_spark.exceptions import DVETLError

    edges = [(0, 1), (1, 0)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (999,)], ["node"])
    got = {
        r.node: r.rank
        for r in pagerank(df, tol=1e-12, max_iter=250, seeds=seeds).collect()
    }
    exp = _py_pagerank(edges, iters=400, seeds=[0, 999])
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-9)
    only_foreign = spark.createDataFrame([(999,)], ["node"])
    with pytest.raises(DVETLError, match="seeds"):
        pagerank(df, seeds=only_foreign)


def test_pagerank_nonconvergence_raises(spark):
    from mallarddv_spark.exceptions import DVETLError

    edges = [(i, (i + 1) % 10) for i in range(10)] + [(0, 5), (7, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    with pytest.raises(DVETLError, match="converge"):
        pagerank(df, tol=1e-15, max_iter=2)


def test_pagerank_bad_damping_raises(spark):
    from mallarddv_spark.exceptions import DVETLError

    df = spark.createDataFrame([(0, 1)], ["src", "dst"])
    with pytest.raises(DVETLError, match="damping"):
        pagerank(df, damping=1.0)


def test_dedup_assign_composes_with_pairs(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], ["doc_id", "text"]
    )
    # clusters {0,1,2} (path) and {5,6}; 3,4,7 singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], ["doc_a", "doc_b"]
    )
    v = {r.id: (r.cluster_id, r.keep) for r in dedup_assign(docs, "doc_id", pairs).collect()}
    assert v == {
        0: (0, True), 1: (0, False), 2: (0, False),
        3: (3, True), 4: (4, True),
        5: (5, True), 6: (5, False),
        7: (7, True),
    }
    kept = docs.join(
        dedup_assign(docs, "doc_id", pairs).filter("keep").select(F.col("id").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    assert kept.count() == 5


def test_pagerank_lazy_exact_mode_matches_checkpointed(spark):
    """checkpoint_every=None builds all exact-step rounds as one lazy
    plan; the math must be identical to the per-round-checkpoint path."""
    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (3, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = {r.node: r.rank
         for r in pagerank(df, max_iter=6, tol=None).collect()}
    b = {r.node: r.rank
         for r in pagerank(df, max_iter=6, tol=None,
                           checkpoint_every=None).collect()}
    assert a == b


def test_pagerank_rank_order_stable_across_partition_layouts(spark):
    """At web scale the per-round groupBy(node).agg(sum) reduces floats
    in a partition-dependent order, so rank VALUES are only guaranteed
    on the rounded grid — but the rank ORDERING (what curation
    pipelines consume) must not depend on layout. Heavy-tailed
    in-degree graph (everyone links to a small hub set), three layouts."""
    rnd = random.Random(41)
    n = 3000
    edges = []
    for s in range(n):
        # hub-heavy: ~half of all links land on nodes 0..9
        for _ in range(3):
            d = rnd.randrange(10) if rnd.random() < 0.5 else rnd.randrange(n)
            if d != s:
                edges.append((s, d))
    edges = sorted(set(edges))
    base = spark.createDataFrame(edges, "src bigint, dst bigint")
    rankings = []
    for layout in (base.coalesce(1), base.repartition(7),
                   base.repartition(32, "dst")):
        pr = pagerank(layout, damping=0.85, max_iter=6, tol=None,
                      checkpoint_every=None)
        rows = pr.orderBy(F.desc("rank"), F.asc("node")).collect()
        rankings.append([r.node for r in rows])
        # mass conservation regardless of layout
        total = sum(r.rank for r in rows)
        assert total == pytest.approx(1.0, abs=1e-9)
    assert rankings[0] == rankings[1] == rankings[2]
    # the hubs must dominate the top ranks
    assert set(range(10)) <= set(rankings[0][:20])
