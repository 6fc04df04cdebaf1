"""Iterative link analysis: integer-exact PageRank over a weighted
edge list.

The training-data use case is crawl-quality weighting: link-graph
centrality as a document-quality prior (the classic complement to the
content-based quality gates in operators/quality_filter). The engine
ships it in an INTEGER-EXACT variant so even a multi-iteration
fixpoint loop is value-checkable bit-for-bit against a DuckDB oracle
(SURVEY §8 house rules — no float ever enters the state):

* ranks live as BIGINT micro-mass ``rank_q`` on a fixed total scale
  (default 10^12 split evenly across nodes);
* an edge's contribution is ``(rank_q(u) * w) div outw(u)`` — integer
  multiply-then-floor-divide, deterministic in any summation order;
* the damping update is ``base + (d_num * inflow) div d_den`` with
  ``base = ((d_den - d_num) * (scale div n)) div d_den``.

Divergences from textbook float PageRank, both deliberate and
documented: (1) per-edge floor division loses < 1 unit of micro-mass
per edge per iteration (bounded drift, irrelevant at scale 10^12);
(2) dangling-node mass is DROPPED, not redistributed — rankings are
unaffected for the hub-scoring use, and the oracle stays a pure
unrolled join/aggregate chain. All operands are non-negative, so
Spark ``div`` (truncate) and DuckDB ``//`` (floor) agree exactly.

Scale shape: edges+out-weights are pinned once (localCheckpoint) —
every iteration re-joins them, and without the pin each round would
re-run the edge-building lineage. Per iteration: ONE equi-join of the
edge table with the node-sized rank table on ``src`` and ONE hash
aggregate on ``dst`` (map-side combinable integer sum). Rank state is
checkpointed per round, so plans stay flat at any iteration count —
the same lineage-control discipline as operators/dedup.dedup_clusters
(pointer-doubling CC). Hot destination nodes are absorbed by partial
aggregation; hot sources ride the join's hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: total integer mass distributed across the graph (micro-mass units).
PAGERANK_SCALE = 10**12


def pagerank_integer(
    edges: DataFrame,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = PAGERANK_SCALE,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Integer PageRank over a weighted directed edge list.

    ``edges``: (src, dst, w) with positive integer weights (rows with
    w <= 0 or NULL endpoints are dropped). Returns (node, rank_q) for
    every node that appears as an endpoint; ``rank_q`` is BIGINT
    micro-mass — rank order and relative magnitude without a single
    float.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0 < damping_num < damping_den:
        raise ValueError(
            f"need 0 < damping_num < damping_den, got {damping_num}/{damping_den}"
        )
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    ).where(
        F.col("src").isNotNull() & F.col("dst").isNotNull() & (F.col("w") > 0)
    )
    outw = e.groupBy("src").agg(F.sum("w").cast("long").alias("outw"))
    # pinned: re-joined every iteration (house rule — see module doc)
    ew = e.join(outw, on="src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError(
            "pagerank_integer: edge list is empty after dropping "
            "NULL-endpoint and non-positive-weight rows"
        )
    init = scale // n
    base = ((damping_den - damping_num) * init) // damping_den

    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank_q"))
    for _ in range(iters):
        contrib = ew.join(ranks, ew["src"] == ranks["node"]).select(
            F.col("dst").alias("node"),
            F.expr("(rank_q * w) div outw").alias("c"),
        )
        inflow = contrib.groupBy("node").agg(
            F.sum("c").cast("long").alias("inflow")
        )
        ranks = (
            nodes.join(inflow, on="node", how="left")
            .na.fill({"inflow": 0})
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_num} * inflow) div {damping_den}")
                ).cast("long").alias("rank_q"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
