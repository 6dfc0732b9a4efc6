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
    # edges feeds und TWICE (forward + swapped); persist it so an
    # expensive upstream pair pipeline (ngram/minhash join) runs once,
    # not once per union branch
    edges = edges.persist()
    edges.count()  # materialize BEFORE the 2-branch union reads it
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    # seed with min(node, min neighbor) — one propagation step fused into
    # initialization, saving a full round on shallow graphs
    labels = (
        und.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("_min_nb"))
        .select("node", F.least("node", "_min_nb").alias("component"))
        .persist()
    )
    # Integral labels only ever DECREASE under min-propagation, so the
    # total label sum strictly decreases until fixpoint — convergence
    # needs one scalar aggregate per round, not a join against the
    # previous labels. Non-integral node ids (e.g. string doc hashes)
    # keep the join-based changed-count check, which is type-generic.
    integral = dict(labels.dtypes)["component"] in {
        "tinyint", "smallint", "int", "bigint",
    }

    def _label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("component").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _label_sum(labels) if integral else None
    changed = -1
    for it in range(max_iterations):
        msgs = (
            und.join(labels, und.a == labels.node)
            .select(F.col("b").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # persist caches DATA but keeps the LOGICAL plan, which nests one
        # join+union level per round — unbounded lineage that makes
        # planning (and even the per-action plan-string generation) grow
        # with round count until it OOMs the driver on high-diameter
        # graphs (observed: heap exhaustion inside generateTreeString on
        # a hypothesis-generated long-chain graph). Truncate with a
        # localCheckpoint every third round: lineage depth stays ≤ 3 for
        # ANY round count — the required shape for iterative DataFrame
        # algorithms — while fast-converging graphs (near-dup cliques,
        # diameter ≤ 3) keep the cheaper columnar cache. A long-lived
        # production job would point sc.setCheckpointDir at reliable
        # storage and use checkpoint() instead of the executor-local form.
        if it % 3 == 2:
            new_labels = new_labels.localCheckpoint(eager=False)
        else:
            new_labels = new_labels.persist()
        if integral:
            new_sum = _label_sum(new_labels)
            changed = 0 if new_sum == prev_sum else 1
            prev_sum = new_sum
        else:
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
    und.unpersist()
    edges.unpersist()
    if changed != 0:
        # graph diameter exceeded the round budget: labels are still a
        # valid partition refinement but long chains may be SPLIT into
        # multiple components — silent wrong answers are worse than noise
        warnings.warn(
            f"connected_components did not converge in {max_iterations} "
            "iterations (labels still changing); components of "
            "long duplicate chains may be split — raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels
