"""Connected components over an edge list — the cluster step of a
near-dup pipeline (pairs → groups → one canonical doc per group).

Iterative min-label propagation on DataFrames: every node adopts the
smallest label among itself and its neighbors until fixpoint. O(graph
diameter) rounds; dup clusters are near-cliques, so 1–2 rounds in
practice. Per round: one join + one groupBy (both shuffle on node id —
co-partitioned, AQE-coalesced), and a localCheckpoint to cut the
iterative lineage (without it the plan doubles every round and the
driver OOMs planning round ~20 at scale).

The fixpoint test (`changed == 0`) is one count over the label join —
aggregate-sized driver traffic only, never the labels themselves.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is undirected input (each pair once is fine).
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionAll(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und.a == labels.node)
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # exhausted max_iter without fixpoint: labels are partially
        # propagated — one true component may still read as several
        logger.warning(
            "connected_components did not converge in %d rounds "
            "(%d labels still changing); raise max_iter (graph diameter "
            "exceeds the round budget)",
            max_iter,
            changed,
        )
    return labels.select("node", F.col("label").alias("component"))
