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
    # materialize the edge list ONCE: nodes, degrees, and the joined edge
    # frame all derive from it, and without this cut the upstream edge
    # derivation (e.g. a lineitem distinct) re-executes for each
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    e = edges.join(deg, "src").localCheckpoint()
    ranks = None
    for i in range(iters):
        if ranks is None:
            # Round 1 folded into the init (optimization r13, guide §2.4,
            # the CC round-1 fold pattern): with every rank == SCALE, the
            # first round's contribution is SCALE DIV out_deg — a pure
            # projection of the degree-joined edge list, no rank join.
            # Identical integers by construction (the join would attach
            # the constant SCALE to every src).
            contrib = e.select(
                F.col("dst").alias("node"),
                F.expr(f"{SCALE}L DIV out_deg").alias("c"),
            )
        else:
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
    if ranks is None:
        ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("rank"))
    return ranks


def cooccurrence_edges(
    pairs: DataFrame, item: str, entity: str, max_df: int = 64
) -> DataFrame:
    """Undirected co-occurrence edges (x < y): two entities are linked
    when they share at least one item. The item posting-list self-join is
    df-capped like every pair generator in this repo: an item shared by
    more than ``max_df`` entities would emit O(df^2) pairs (the skewed-key
    quadratic), and such hub items carry no co-occurrence signal anyway.

    Returns (x, y, n_shared) — the shared-item count is the edge weight
    (callers threshold or top-N it to sparsify dense graphs).
    """
    from .dedup import cap_hot_keys

    # materialize the distinct posting list once: the two-phase cap scans
    # its input twice (count pass + anti-join probe), and re-running the
    # distinct exchange both times measurably dominates the edge build
    base = (
        pairs.select(F.col(item).alias("i"), F.col(entity).alias("e"))
        .distinct()
        .localCheckpoint()
    )
    kept = cap_hot_keys(base, ["i"], max_df)
    # the self-join broadcasts the build side, so the PROBE side's
    # partition count is the parallelism of the whole pair-generation +
    # partial-aggregate stage; the checkpointed distinct comes back
    # AQE-coalesced to a handful of partitions at local fixture sizes
    # (measured: the 17M-pair probe ran on 5 of 32 cores). spread() is a
    # no-op at cluster scale where the frame is already wide.
    from ..io import spread

    a = spread(kept).select("i", F.col("e").alias("x"))
    b = kept.select("i", F.col("e").alias("y"))
    return (
        a.join(b, "i")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over undirected ``edges`` (x < y,
    pre-deduplicated) — the degree-oriented wedge-closure algorithm:

    orient every edge from its lower-(degree, id) endpoint to the higher
    one; enumerate wedges only from each node's OUT-neighbors; close
    them with a join back onto the oriented edge set. The orientation
    bounds every out-degree by O(sqrt(|E|)) — a celebrity node of degree
    d contributes d wedges as a DESTINATION but only ~sqrt-bounded
    wedges as a source, which is what keeps the wedge join from going
    quadratic on skewed graphs (the naive a<b<c 3-way join the oracle
    uses has no such bound). Each triangle is found exactly once.

    Returns (node, n_triangles) for nodes in at least one triangle.

    The degree aggregate and the oriented ranking both scan ``edges``;
    the doubled upstream is recovered by Spark's ReusedExchange (the
    subplans are identical — measured: an explicit localCheckpoint here
    changed nothing at sf0.1), so no materialization is forced on the
    caller's plan.
    """
    deg = (
        edges.select(F.col("x").alias("node"))
        .union(edges.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    dx = deg.select(F.col("node").alias("x"), F.col("deg").alias("dx"))
    dy = deg.select(F.col("node").alias("y"), F.col("deg").alias("dy"))
    ranked = edges.join(dx, "x").join(dy, "y")
    # identical field names in both rank structs — CASE branches must agree
    rx = F.struct(F.col("dx").alias("d"), F.col("x").alias("n"))
    ry = F.struct(F.col("dy").alias("d"), F.col("y").alias("n"))
    fwd = rx < ry
    oriented = ranked.select(
        F.when(fwd, F.col("x")).otherwise(F.col("y")).alias("u"),
        F.when(fwd, F.col("y")).otherwise(F.col("x")).alias("v"),
        F.when(fwd, ry).otherwise(rx).alias("vr"),
    ).localCheckpoint()
    e1 = oriented.select("u", F.col("v").alias("v1"), F.col("vr").alias("r1"))
    e2 = oriented.select("u", F.col("v").alias("v2"), F.col("vr").alias("r2"))
    # unordered out-neighbor pairs, ordered by the same rank the
    # orientation uses so the closing edge (v1 -> v2) is oriented
    wedges = e1.join(e2, "u").where(F.col("r1") < F.col("r2"))
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tri = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    members = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v1").alias("node")))
        .unionAll(tri.select(F.col("v2").alias("node")))
    )
    return members.groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles")
    )
