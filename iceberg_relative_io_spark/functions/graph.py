"""Distributed connected components over a DataFrame edge list.

The scale path for dedup survivorship (operators/northstar.py
q_dedup_survivors uses driver-side union-find, which is right while the
LSH-pruned edge set is small; this is what replaces it when edges no
longer fit one machine).

Algorithm: iterative minimum-label propagation — each node repeatedly
adopts the smallest label in its closed neighborhood until fixpoint.
Each round is one shuffle (join + min-aggregate); rounds needed equal the
graph diameter, which is tiny for dedup clusters (they're near-cliques —
docs similar to each other are similar to the same things). For
adversarial long-chain graphs, the O(log n)-round large-star/small-star
variant would replace the loop body; the iteration/convergence harness
stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """edges(src, dst) -> (node, component) where component = min node id
    reachable. Nodes appearing in no edge are absent (caller left-joins
    and coalesces to self, as q_dedup_survivors does)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    for _ in range(max_iter):
        # smallest label among each node's neighbors
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint()  # cut the growing lineage
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
