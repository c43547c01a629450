"""Duplicate-cluster resolution: connected components over near-dup pairs.

MinHash/LSH emits *pairs*; dedup needs *clusters* (keep one doc per
connected component). This is the canonical iterative DataFrame algorithm:
label propagation to fixpoint — each doc repeatedly adopts the minimum label
among itself and its neighbors. Converges in O(diameter) rounds; real dup
clusters are small/star-shaped, so typically 2-3 rounds.

Scale notes: each round is one join + one aggregate on (edge list ⋈ labels),
both shuffling on doc_id. Labels are checkpointed per round (localCheckpoint)
to cut the growing lineage — without it, round N recomputes rounds 1..N-1
and the plan explodes exponentially. The driver-side loop only reads a 1-row
convergence count per round (no data collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """pairs: (doc_a, doc_b) undirected edges. Returns (doc_id, component)
    where component = min doc_id reachable (deterministic canonical label).
    Only docs appearing in at least one pair are returned."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("src").alias("doc_id")).distinct().select(
        "doc_id", F.col("doc_id").alias("component")
    )

    for _ in range(max_rounds):
        # each node adopts min(own label, neighbors' labels)
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()  # truncate lineage: round N must not replay 1..N-1
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Cluster near-dup pairs and pick each cluster's keeper (min doc_id).
    Returns (doc_id, component, is_keeper)."""
    comp = connected_components(pairs)
    return comp.select(
        "doc_id", "component", (F.col("doc_id") == F.col("component")).alias("is_keeper")
    )
