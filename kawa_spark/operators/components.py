"""Connected components via label propagation — the dedup-cluster
merger: near-dup PAIRS (from minhash/simhash/embedding blocking) form
a graph; components are the duplicate clusters; one keeper survives
per cluster.

Algorithm: every node starts labeled with its own id; each round a
node takes the min label in its neighborhood; converges in
O(diameter) rounds. Near-dup graphs have tiny diameters (dup clusters
are near-cliques), so 3-5 rounds suffice at any corpus size.

Scale notes: each round is one join + one aggregate (shuffle on node
id). localCheckpoint() truncates the growing lineage each round —
without it, round N replans rounds 1..N-1. The loop is driver-side
CONTROL only; all data stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    strict: bool = True,
) -> DataFrame:
    """edges(src, dst) → (node, component) with component = min node
    id reachable. Deterministic.

    Convergence contract: if the loop exhausts ``max_iterations``
    before fixpoint (component diameter > max_iterations — possible
    for chain-shaped graphs), ``strict=True`` (default) raises
    rather than silently returning split components; ``strict=False``
    returns the partial labels (every label is still a valid member
    of its true component, just possibly not the global min)."""
    # materialize the edge set FIRST: `edges` may itself be an
    # expensive pipeline (e.g. LSH candidate generation), and the
    # symmetric union below references it twice — without this
    # checkpoint the candidate pipeline executes twice before the
    # loop even starts (measured 2× the whole operator's cost)
    edges = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=True)
    sym = (
        edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # Convergence probe: labels move MONOTONICALLY down (new =
    # least(old, min neighbor)), so Σ component strictly decreases
    # until fixpoint and equal sums ⇔ no label changed. One cheap
    # aggregate per round replaces a full old⋈new join probe.
    # DECIMAL(38,0): exact and overflow-safe for 64-bit ids at any
    # node count the sum could meet.
    def _label_sum(df: DataFrame) -> int:
        return df.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["node2"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        cur_sum = _label_sum(new_labels)
        labels = new_labels
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged and strict:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (component diameter exceeds the budget); raise "
            "max_iterations or pass strict=False for partial labels"
        )
    return labels


def dedup_clusters(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id, is_keeper). Keeper = min
    doc_id per cluster, derived as a per-cluster window min rather
    than ``node == component`` — with partial labels a split cluster
    could otherwise have zero keepers, and downstream "keep keepers
    only" would drop every doc in it. The window min guarantees
    exactly one keeper per emitted cluster_id unconditionally."""
    comp = connected_components(pairs, src=id_a, dst=id_b)
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.min("node").over(w)).alias("is_keeper"),
    )
