"""Connected components vs a pure-Python union-find oracle, and the
pair-list → dedup-verdict composition."""

import random

import pytest
from pyspark.sql import functions as F

from mallarddv_spark.operators.graph import connected_components, dedup_assign


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
