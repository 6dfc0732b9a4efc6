"""Connected components over near-duplicate pairs → duplicate CLUSTERS.

Pair detection (minhash/ngram/simhash) yields edges; dedup needs the
transitive closure: if A≈B and B≈C, all three are one group with one
canonical representative. This is min-label propagation (Pregel-style)
expressed as DataFrame joins:

    label(n) ← min(label(n), min over neighbors' label)

iterated to fixpoint. Each round is one join + one aggregate (both
shuffle on the node key); rounds needed = graph diameter, and near-dup
graphs are shallow (small cliques/chains), so a handful of rounds
suffices. The driver loop only evaluates a scalar convergence count per
round — no data is collected.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 15,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns (node, component) with component = min node id reachable —
    a deterministic canonical label. Nodes appearing in no edge are not
    emitted (callers union singletons if needed).
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = und.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    changed = -1
    for _ in range(max_iterations):
        msgs = (
            und.join(labels, und.a == labels.node)
            .select(F.col("b").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # graph diameter exceeded the round budget: labels are still a
        # valid partition refinement but long chains may be SPLIT into
        # multiple components — silent wrong answers are worse than noise
        warnings.warn(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing); components of "
            "long duplicate chains may be split — raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels
