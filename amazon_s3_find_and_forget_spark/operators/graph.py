"""Iterative graph operators over DataFrames (no GraphX/GraphFrames).

``connected_components`` turns near-duplicate PAIRS into duplicate
CLUSTERS — the transitive closure the pairwise dedup operators stop
short of (a~b and b~c put a,c in one cluster even when a~c was never
emitted). The survivor-per-cluster rule (keep min id) then deduplicates
whole clusters, not just direct pairs.

Algorithm: min-label propagation with pointer jumping (the standard
shared-nothing CC recipe — label propagation is Θ(diameter) rounds
alone; the pointer-jumping step l <- l[l] after each propagation round
compresses label chains, giving O(log n) convergence like the
large-star/small-star family). Each round is two shuffles (neighbor-min
groupBy + label self-join), the iterate is ``localCheckpoint``-ed so
lineage stays flat, and convergence is detected by the monotone label
sum (labels only ever decrease) — one cheap scalar action per round.

At 100 TB: the edge relation partitions by node id; every round's state
is one (node, label) row per node — never materialized on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    ``edges`` is an undirected pair list; direction and duplicates are
    normalized away. Isolated nodes don't appear (join the result back
    to the node set with a coalesce-to-self for them).
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    e = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = e.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("comp")
    )
    prev_sum = None
    for _ in range(max_iter):
        # neighbor-min: the smallest label among each node's neighbors
        nbr = (
            e.join(labels, e.v == labels.node)
            .groupBy("u")
            .agg(F.min("comp").alias("nc"))
        )
        prop = (
            labels.join(nbr, labels.node == nbr.u, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nc"), F.col("comp"))
                ).alias("comp"),
            )
        )
        # pointer jumping: comp <- label(comp), compressing chains
        ptr = prop.select(
            F.col("node").alias("cnode"), F.col("comp").alias("ccomp")
        )
        jumped = (
            prop.join(ptr, prop.comp == ptr.cnode, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ccomp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        # labels only decrease -> the sum is a monotone convergence metric
        cur_sum = jumped.agg(F.sum("comp")).collect()[0][0]
        labels = jumped
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """(doc_id, cluster) for every doc in a near-dup pair, cluster =
    min doc id reachable through the pair graph (transitive closure of
    the pairwise dedup output)."""
    return connected_components(pairs, src=id_a, dst=id_b).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("cluster")
    )
