"""Integer-exact PageRank (operators/graph)."""

from __future__ import annotations

import pytest

from python_vegindex_spark.operators.graph import (
    PAGERANK_SCALE,
    pagerank_integer,
)


def _ref(edges, iters, scale=PAGERANK_SCALE, dn=85, dd=100):
    """Independent pure-Python mirror of the integer fixpoint."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    outw: dict[str, int] = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    n = len(nodes)
    init = scale // n
    base = ((dd - dn) * init) // dd
    r = {v: init for v in nodes}
    for _ in range(iters):
        inflow = {v: 0 for v in nodes}
        for s, d, w in edges:
            inflow[d] += (r[s] * w) // outw[s]
        r = {v: base + (dn * inflow[v]) // dd for v in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    return {
        r.node: r.rank_q for r in pagerank_integer(df, **kw).collect()
    }


def test_pagerank_matches_reference_chain(spark):
    edges = [("A", "B", 1), ("B", "C", 1)]
    for iters in (1, 3):
        assert _run(spark, edges, iters=iters) == _ref(edges, iters)


def test_pagerank_weighted_split_and_cycle(spark):
    # weighted fan-out (3:1 floor split) feeding a cycle back to A
    edges = [("A", "B", 3), ("A", "C", 1), ("B", "A", 1), ("C", "A", 2)]
    got = _run(spark, edges, iters=4)
    want = _ref(edges, 4)
    assert got == want
    # B receives 3/4 of A's mass, C 1/4: order must reflect it
    assert got["B"] > got["C"]


def test_pagerank_dangling_and_isolated_source(spark):
    # C dangles (mass dropped); A has no in-edges -> settles at base
    edges = [("A", "B", 1), ("B", "C", 1)]
    got = _run(spark, edges, iters=3)
    ref = _ref(edges, 3)
    assert got == ref
    init = PAGERANK_SCALE // 3
    assert got["A"] == (15 * init) // 100  # pure teleport mass


def test_pagerank_drops_bad_edges_and_validates(spark):
    edges_df = [("A", "B", 1), ("A", "C", 0), (None, "B", 5), ("B", None, 5)]
    got = _run(spark, edges_df, iters=1)
    # zero-weight and NULL-endpoint edges ignored entirely: C never
    # becomes a node, B's inflow is A's whole mass
    assert set(got) == {"A", "B"}
    assert got == _ref([("A", "B", 1)], 1, scale=PAGERANK_SCALE)
    with pytest.raises(ValueError, match="iters"):
        pagerank_integer(
            spark.createDataFrame([("A", "B", 1)], "src string, dst string, w long"),
            iters=0,
        )
    with pytest.raises(ValueError, match="damping"):
        pagerank_integer(
            spark.createDataFrame([("A", "B", 1)], "src string, dst string, w long"),
            damping_num=100,
        )


def test_pagerank_plan_python_free(spark):
    df = spark.createDataFrame(
        [("A", "B", 1), ("B", "A", 2)], "src string, dst string, w long"
    )
    out = pagerank_integer(df, iters=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "mapInPandas"):
        assert marker not in plan, f"{marker} in pagerank plan"


def test_triangle_counts_k4_plus_pendant(spark):
    from python_vegindex_spark.operators.graph import triangle_counts

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    edges = k4 + [("d", "e"), ("b", "a"), ("a", "a")]  # dup reversed + self loop
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    # K4 has C(4,3)=4 triangles; each member sits in 3; pendant e in 0
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0}


def test_triangle_counts_property_vs_bruteforce(spark):
    import itertools
    import random

    from python_vegindex_spark.operators.graph import triangle_counts

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(12)]
    edges = sorted(
        {tuple(sorted(p)) for p in itertools.combinations(nodes, 2) if rng.random() < 0.35}
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    es = set(edges)
    want = {n: 0 for n in {x for e in edges for x in e}}
    for x, y, z in itertools.combinations(sorted(want), 3):
        if (
            tuple(sorted((x, y))) in es
            and tuple(sorted((x, z))) in es
            and tuple(sorted((y, z))) in es
        ):
            want[x] += 1
            want[y] += 1
            want[z] += 1
    assert got == want


def test_cooccurrence_edges_hot_bucket_guard(spark):
    from python_vegindex_spark.operators.graph import cooccurrence_edges

    rows = (
        [("u%d" % i, "hot") for i in range(5)]      # hot bucket: dropped
        + [("a", "cool"), ("b", "cool"), ("c", "cool")]
        + [("a", "cool")]                            # dup membership
        + [(None, "cool")]
    )
    df = spark.createDataFrame(rows, "user string, bucket string")
    got = sorted(
        (r.src, r.dst)
        for r in cooccurrence_edges(
            df, "user", ("bucket",), max_bucket_nodes=4
        ).collect()
    )
    assert got == [("a", "b"), ("a", "c"), ("b", "c")]
    import pytest as _pt

    with _pt.raises(ValueError, match="max_bucket_nodes"):
        cooccurrence_edges(df, "user", ("bucket",), max_bucket_nodes=1)


def test_bfs_distances_hand_graph(spark):
    from python_vegindex_spark.operators.graph import bfs_distances

    # path a-b-c-d-e plus isolated seed z (keeps dist 0, no edges)
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("z",)], "node string")
    got = {r.node: r.dist for r in bfs_distances(df, seeds, max_depth=2).collect()}
    # depth 2: e (dist 4) and d (dist 3) not yet reached
    assert got == {"a": 0, "z": 0, "b": 1, "c": 2}
    # depth 0: seeds only
    got0 = {r.node: r.dist for r in bfs_distances(df, seeds, max_depth=0).collect()}
    assert got0 == {"a": 0, "z": 0}
    # two seeds meeting in the middle take the MIN distance
    seeds2 = spark.createDataFrame([("a",), ("e",)], "node string")
    got2 = {r.node: r.dist for r in bfs_distances(df, seeds2, max_depth=3).collect()}
    assert got2 == {"a": 0, "e": 0, "b": 1, "d": 1, "c": 2}
    import pytest as _pt

    with _pt.raises(ValueError, match="max_depth"):
        bfs_distances(df, seeds, max_depth=-1)
