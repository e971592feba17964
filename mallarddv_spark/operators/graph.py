"""Distributed connected components — the step that turns near-duplicate
PAIRS (minhash_lsh_pairs / simhash_pairs / embedding_neardup_pairs output)
into per-document CLUSTER assignments, so a corpus dedup can actually drop
rows ("keep one doc per component").

Algorithm: iterative min-label propagation expressed as DataFrame joins —
every node starts labeled with itself; each round every node takes the min
label among itself and its neighbors; converged when no label changes.
Rounds needed = graph diameter, and duplicate clusters are shallow (a dup
cluster's diameter is small even when its size is large), so a handful of
rounds suffices. Each round is one shuffle on the node id; lineage is cut
with ``localCheckpoint`` per round so the plan does not grow exponentially.

At 100 TB: near-dup edge lists are tiny relative to the corpus (pairs only
exist for candidates), labels are (id, label) longs/strings, and every
round's shuffle is on uniformly distributed ids. GraphFrames/GraphX do the
same thing with the large-star/small-star optimization for extreme
diameters; this dependency-free version is the right shape for dedup
graphs. (Public-literature reference: Kiveris et al., "Connected
Components in MapReduce and Beyond".)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mallarddv_spark.exceptions import DVETLError


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the minimum node id in the component.

    Raises :class:`DVETLError` if ``max_iter`` rounds do not converge
    (diameter larger than max_iter — raise the bound for pathological
    chain graphs; duplicate clusters converge in a few rounds).
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("label"))
            .groupBy("node")
            .agg(F.min("label").alias("nmin"))
        )
        propagated = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nmin", "label")).alias("label"),
        )
        # pointer jumping (path compression): follow the label chain one
        # hop — label <- label(label). Combined with neighbor propagation
        # this converges in O(log diameter) rounds instead of O(diameter),
        # which is what makes long chain-shaped components tractable.
        hop = propagated.select(
            F.col("node").alias("l"), F.col("label").alias("ll")
        )
        # keep the pre-round label alongside so convergence is a filter on
        # the checkpointed frame, not another labels join
        with_old = (
            labels.select("node", F.col("label").alias("old"))
            .join(
                propagated.join(hop, propagated.label == hop.l, "left").select(
                    "node",
                    F.least(F.col("label"), F.coalesce("ll", "label")).alias("label"),
                ),
                "node",
            )
            .localCheckpoint(eager=True)
        )
        changed = with_old.filter(F.col("label") != F.col("old")).limit(1).count()
        labels = with_old.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise DVETLError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter)"
    )


def dedup_assign(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """Per-document dedup verdicts from a near-dup pair list:
    (id, cluster_id, keep) — ``cluster_id`` is the component's min id,
    singletons are their own cluster, ``keep`` marks the one row per
    cluster that survives (min id, the standard deterministic policy).

    Compose with any pair producer::

        pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
        verdicts = dedup_assign(docs, "doc_id", pairs)
        kept = docs.join(verdicts.filter("keep"), docs.doc_id == verdicts.id,
                         "left_semi")
    """
    comp = connected_components(pairs, pair_a, pair_b)
    out = (
        df.select(F.col(id_col).alias("id"))
        .join(comp, F.col("id") == F.col("node"), "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("cluster_id")
        )
    )
    return out.withColumn("keep", F.col("id") == F.col("cluster_id"))
