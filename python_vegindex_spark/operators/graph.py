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


def cooccurrence_edges(
    df: DataFrame,
    node_col: str,
    bucket_cols: list[str] | tuple[str, ...],
    max_bucket_nodes: int = 50,
) -> DataFrame:
    """Undirected co-occurrence edges: nodes sharing a bucket.

    The projection step that turns event/interaction data into a
    unipartite graph (users active in the same (event_type, hour),
    docs sharing a shingle, ...). Projections are QUADRATIC per
    bucket — b nodes make b(b-1)/2 pairs on one shuffle key — so
    ``max_bucket_nodes`` drops hot buckets BEFORE the self-join, the
    same blowup guard as cosine's max_df / MinHash's banding: a bucket
    shared by half the graph says nothing about affinity anyway.

    Output: (src, dst) distinct with src < dst (string order).
    """
    if max_bucket_nodes < 2:
        raise ValueError(
            f"max_bucket_nodes must be >= 2, got {max_bucket_nodes}"
        )
    b = [F.col(c) for c in bucket_cols]
    members = (
        df.where(F.col(node_col).isNotNull())
        .select(F.col(node_col).cast("string").alias("node"), *b)
        .distinct()
    )
    sizes = members.groupBy(*bucket_cols).agg(
        F.count(F.lit(1)).alias("_bn")
    ).where(F.col("_bn") <= int(max_bucket_nodes)).select(*bucket_cols)
    cool = members.join(sizes, on=list(bucket_cols))
    a, c = cool.alias("a"), cool.alias("c")
    cond = F.col("a.node") < F.col("c.node")
    for col in bucket_cols:
        cond = cond & (F.col(f"a.{col}") == F.col(f"c.{col}"))
    return (
        a.join(c, on=cond)
        .select(F.col("a.node").alias("src"), F.col("c.node").alias("dst"))
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Exact per-node triangle counts over an undirected edge list.

    The standard degree-ordered orientation (Schank/Wagner, the
    MapReduce classic): orient every edge from the endpoint with the
    SMALLER (degree, node) key to the larger, so each triangle is
    found exactly once as a wedge (u->v, u->w) closed by (v->w), and —
    the scale point — per-node out-degree after orientation is bounded
    by O(sqrt(m)) on any graph: the wedge self-join's fan-out is
    skew-immune even around celebrity nodes, which is precisely why
    one orients before joining instead of joining the raw edges.

    Input: (src, dst) undirected pairs (dedup'd and de-self-looped
    here). Output: (node, triangles) for every node incident to at
    least one edge — all-integer.
    """
    e = (
        edges.select(
            F.col("src").cast("string").alias("a"),
            F.col("dst").cast("string").alias("b"),
        )
        .where(F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b")))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)  # consumed by degrees AND both join sides
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    # orient by the total order (deg, node): lower key -> higher key
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("_db"))
    ed = e.join(da, on="a").join(db, on="b")
    lower_is_a = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).localCheckpoint(eager=True)  # wedge join uses it twice + closure probe

    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    wedges = w1.join(
        w2,
        on=(F.col("w1.src") == F.col("w2.src"))
        & (F.col("w1.dst") < F.col("w2.dst")),
    ).select(
        F.col("w1.src").alias("u"),
        F.col("w1.dst").alias("v"),
        F.col("w2.dst").alias("w"),
    )
    # close the wedge: (v, w) with v < w must be a canonical edge —
    # e is already (min, max)-canonical, so probe it directly
    closure = e.select(F.col("a").alias("cv"), F.col("b").alias("cw"))
    tris = wedges.join(
        closure,
        on=(wedges["v"] == closure["cv"]) & (wedges["w"] == closure["cw"]),
    ).select("u", "v", "w")
    per_node = (
        tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    nodes = deg.select("node")
    return (
        nodes.join(per_node, on="node", how="left")
        .na.fill({"triangles": 0})
        .select("node", "triangles")
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 3,
) -> DataFrame:
    """Multi-source BFS: exact hop distance (<= max_depth) from a seed
    set over an undirected edge list — the blast-radius query
    (contamination spread through a near-dup graph, influence radius
    through a co-occurrence graph).

    ``edges``: (src, dst) undirected pairs. ``seeds``: one column of
    node ids. Output: (node, dist) for every node within ``max_depth``
    hops of any seed (seeds at dist 0; seeds not present in the edge
    list still appear). Distances are exact BIGINTs: round r relaxes
    ``dist(v) = min(dist(v), min over neighbors dist(u) + 1)``, and
    after r rounds every node at true distance <= r is final — so with
    a fixed round count the result is EXACT for the radius it reports,
    not an approximation.

    Scale shape: edges symmetrized and pinned once; each round is ONE
    equi-join of the current frontier table with the edge list and ONE
    min-aggregate — the same per-round shape and lineage discipline
    (localCheckpoint per round) as pagerank_integer/dedup_clusters.
    State stays (node, dist) pairs; payloads never enter the loop.
    """
    if max_depth < 0:
        raise ValueError(f"max_depth must be >= 0, got {max_depth}")
    e0 = edges.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    sym = (
        e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seed_col = seeds.columns[0]
    dist = (
        seeds.select(F.col(seed_col).cast("string").alias("node"))
        .where(F.col("node").isNotNull())
        .distinct()
        .select("node", F.lit(0).cast("long").alias("dist"))
    )
    for _ in range(max_depth):
        relaxed = (
            sym.join(dist, sym["src"] == dist["node"])
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .union(dist)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
            .localCheckpoint(eager=True)
        )
        dist = relaxed
    return dist
