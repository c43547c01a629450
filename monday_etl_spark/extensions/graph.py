"""Integer-exact PageRank over a DataFrame edge list.

Complements connected_components (cluster.py): where CC answers "which rows
are the same entity", PageRank answers "which entities matter most" —
influence scoring over interaction graphs (customer<->supplier here; the
same shape ranks domains in a crawl frontier or documents in a citation
graph when curating training data).

All arithmetic is int64: ranks are parts-per-million of the uniform score,
per-edge contributions use integer division (truncation — identical in
Spark's ``div`` and DuckDB's ``//`` for non-negative operands), and the sum
over in-edges is an exact integer aggregate, so the result is
bit-deterministic at ANY parallelism AND reproducible by a SQL oracle —
the same trick as the 1e6-quantized IVF trainer (ivf.py).

Scale notes (100 TB graph): the per-iteration cost is exactly ONE shuffle —
edges pre-joined with out-degrees once up front (persisted), then each round
is edges⋈ranks (hash join on src) + groupBy(dst). Ranks are checkpointed
per round to truncate lineage, same as cluster.py's label propagation.
Dangling nodes are the caller's concern: pass a symmetrized edge list (every
node then has out-degree >= 1) or pre-filter sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIFORM_PPM = 1_000_000


def pagerank_int(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    checkpoint: bool = True,
) -> DataFrame:
    """edges: (src, dst) directed. Returns (node, rank_ppm) after
    ``iterations`` rounds of r' = (1-d) * 1e6 + d * sum(r_u / outdeg_u),
    evaluated entirely in int64 (per-edge floor division).

    Nodes are the distinct ``src`` values — with a symmetrized edge list
    that is every node in the graph."""
    base = (100 - damping_pct) * (UNIFORM_PPM // 100)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # one-time pre-join: each edge carries its source's out-degree so the
    # iteration loop never touches the degree table again
    ed = edges.join(deg, "src").select("src", "dst", "outdeg")
    ed = ed.localCheckpoint() if checkpoint else ed.persist()

    ranks = deg.select("src", F.lit(UNIFORM_PPM).cast("long").alias("rank_ppm"))
    for _ in range(iterations):
        contrib = ed.join(ranks, "src").select(
            F.col("dst").alias("src"),
            F.expr(f"(rank_ppm * {damping_pct}) div (100 * outdeg)").alias("c"),
        )
        ranks = contrib.groupBy("src").agg(
            (F.lit(base) + F.sum("c")).cast("long").alias("rank_ppm")
        )
        if checkpoint:
            ranks = ranks.localCheckpoint()
    return ranks.select(F.col("src").alias("node"), "rank_ppm")
