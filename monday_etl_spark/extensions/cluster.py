"""Duplicate-cluster resolution: connected components over near-dup pairs.

MinHash/LSH emits *pairs*; dedup needs *clusters* (keep one doc per
connected component). This is the canonical iterative DataFrame algorithm:
label propagation to fixpoint — each doc repeatedly adopts the minimum label
among itself and its neighbors. Converges in O(diameter) rounds; real dup
clusters are small/star-shaped, so typically 2-3 rounds.

Scale notes: the edge list carries explicit self-loops, folding "own label"
into the neighbor minimum — each round is then exactly ONE join + ONE
aggregate (no join-back onto the previous labels, which was a third shuffle).
The checkpointed edge list is re-shuffled by the join each round
(localCheckpoint does not carry output partitioning into the SQL planner —
verified via explain), but the join-back's two exchanges are gone. Labels
are checkpointed per round (localCheckpoint) to cut the growing lineage —
without it, round N recomputes rounds 1..N-1 and the plan explodes
exponentially.

Convergence costs nothing extra: min-propagation only ever DECREASES labels,
so sum(component) is a sufficient fixpoint statistic — it strictly drops
until converged and is observed (df.observe) on the same job that
materializes the checkpoint. One Spark job per round; the old shape added a
labels⋈labels diff-count job (join + shuffle) every round just to ask
"did anything change" (~2× the runtime at sf0.1). Non-numeric doc ids fall
back to the diff-count path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def connected_components(pairs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """pairs: (doc_a, doc_b) undirected edges. Returns (doc_id, component)
    where component = min doc_id reachable (deterministic canonical label).
    Only docs appearing in at least one pair are returned."""
    # ONE pass over pairs: both directions + self-loops (making each node its
    # own neighbor lets min-over-neighbors subsume min(own, neighbors) with
    # no join back onto the old labels) via a 4-struct explode. The r01/early
    # r02 union-of-3-branches shape re-evaluated the candidate-pair plan once
    # per branch — no CSE across union branches, same trap as self-joins.
    a, b = F.col("doc_a"), F.col("doc_b")
    edge = lambda s, d: F.struct(s.alias("src"), d.alias("dst"))  # noqa: E731
    edges = (
        pairs.select(
            F.explode(F.array(edge(a, b), edge(b, a), edge(a, a), edge(b, b))).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint()
    )
    numeric = isinstance(edges.schema["src"].dataType, NumericType)
    labels = edges.select(
        F.col("src").alias("doc_id"), F.col("src").alias("component")
    ).distinct()
    # no initial fixpoint job: round 1 always changes labels when any real
    # edge exists, so the first useful convergence test is round2 == round1
    prev_sum = None

    for rnd in range(max_rounds):
        # each node adopts min(own label, neighbors' labels) — the self-loop
        # carries "own" through the same aggregate
        new_labels = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("component"))
            .select(F.col("src").alias("doc_id"), "component")
        )
        if numeric:
            obs = Observation(f"cc_round_{rnd + 1}")
            new_labels = new_labels.observe(
                obs, F.sum("component").alias("s")
            ).localCheckpoint()  # truncate lineage; observe rides the same job
            s = obs.get["s"]
            labels = new_labels
            if s == prev_sum:
                break
            prev_sum = s
        else:
            new_labels = new_labels.localCheckpoint()
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
