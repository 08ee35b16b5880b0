"""Graph analytics over edge DataFrames — iterative algorithms expressed
as statically-unrolled join/aggregate rounds, the Spark-idiomatic shape
for a bounded iteration count: every round is one shuffle on the edge
source key, Catalyst sees the whole unrolled plan, and AQE sizes each
round's exchanges independently. The reference has no graph surface
(its pipeline is single-table ETL); this module exists for the
north-star pipeline ops — duplicate-cluster analysis (dedup_clusters in
operators/dedup.py holds the connected-components twin) and
entity-importance ranking over interaction graphs.

At 100 TB the per-round cost is one hash-partitioned join of the rank
vector (|V| rows) against the edge list (|E| rows) plus a groupBy on the
destination — no driver collect, no broadcast of anything graph-sized.
A persisted/checkpointed rank vector bounds lineage growth; iteration
counts here are small fixed constants (ranking quality plateaus in a few
rounds on bounded-diameter interaction graphs), which is what makes the
static unroll the right call versus a driver-side convergence loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame, src: str = "src",
               dst: str = "dst") -> DataFrame:
    """Undirected view of a directed edge list: both orientations,
    distinct. PageRank on a symmetrized graph has no dangling nodes
    (every node with an in-edge has an out-edge), which removes the
    dangling-mass redistribution term from the update."""
    return (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .unionByName(edges.select(F.col(dst).alias("src"),
                                      F.col(src).alias("dst")))
            .distinct())


def pagerank(edges: DataFrame, iterations: int = 3,
             damping: float = 0.85, src: str = "src",
             dst: str = "dst") -> DataFrame:
    """PageRank with a FIXED iteration count, statically unrolled:
    ``r₀(v) = 1/N``; ``r_{k+1}(v) = (1−d)/N + d·Σ_{u→v} r_k(u)/outdeg(u)``.

    Every node must have at least one out-edge (use :func:`symmetrize`
    first, or pre-drop dangling nodes) — asserted via a loud count check
    at plan-build time on the degree frame, not silently mis-ranked.

    Each iteration is one equi-join of the (node, rank) vector with the
    edge list on the source key followed by a groupBy on the destination
    — the rank vector is hash-partitioned by node, so consecutive rounds
    reuse the partitioning. Cross-engine parity: per-node contributions
    are plain-double divisions of the 6-rounded previous rank by the
    integer out-degree, folded in decimal(28,12) (partition-order
    independent), damped, and re-rounded to 6 — every iteration's vector
    is bit-identical across engines, so the fixpoint trajectory is too.
    The rank vector localCheckpoints every few rounds (deep loops
    only) to bound lineage; shallow unrolls run as one pipelined job."""
    if iterations < 1:
        raise ValueError("pagerank needs at least 1 iteration")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .persist())
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    dangling = (nodes.join(deg.withColumnRenamed("src", "node"),
                           "node", "left_anti").limit(1).count())
    if dangling:
        raise ValueError(
            "graph has nodes without out-edges; symmetrize() the edge "
            "list or drop dangling nodes before pagerank()")
    n_nodes = nodes.select(F.count("*").alias("__n"))
    # 1−d as the 6-rounded literal, NOT the raw float subtraction:
    # Python's 1.0−0.85 and a SQL engine's CAST(0.15 AS DOUBLE) are
    # different doubles; round(·, 6) lands both on the same bits
    base = F.round(F.lit(round(1.0 - damping, 6)) / F.col("__n"), 12)
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", F.round(F.lit(1.0) / F.col("__n"), 6).alias("rank"))
    # Checkpoint PERIODICALLY, not per round: an eager localCheckpoint
    # is a synchronous job, so per-iteration checkpointing serializes
    # k+1 jobs and pays per-stage task overhead k+1 times (measured
    # ~3× wall at sf0.1 for 3 iterations — SCALE.md round-8c triage).
    # A shallow unroll (≤ checkpoint_every rounds) stays ONE pipelined
    # job that AQE coalesces end to end; only deep loops need the
    # lineage cut, and they get it every checkpoint_every rounds.
    checkpoint_every = 5
    for i in range(iterations):
        contrib = (e.join(ranks.withColumnRenamed("node", "src"), "src")
                   .join(deg, "src")
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") / F.col("outdeg"))
                           .cast("decimal(28,12)").alias("c")))
        summed = contrib.groupBy("node").agg(
            F.sum("c").cast("double").alias("__in"))
        ranks = (summed.crossJoin(F.broadcast(n_nodes))
                 .select("node",
                         F.round(base + damping * F.col("__in"), 6)
                         .alias("rank")))
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    # NOTE: e stays persisted until the caller's action consumes the
    # returned plan; unpersisting here would evict the cache before the
    # (now lazy) iterations ever run. Spark drops it with the session,
    # and repeated fits re-persist their own edge frames.
    return ranks
