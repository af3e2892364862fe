"""Integer-exact PageRank: pure-Python differential, partition invariance,
dangling honesty, and the overflow guard."""

from __future__ import annotations

import pytest

from table_extractor_spark.operators.graph import BASE_PPM, DAMPING_PPM, PPM, pagerank

EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a")]


def py_pagerank(edges, iters):
    """Independent replay of the exact integer arithmetic."""
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = {n for e in edges for n in e}
    ranks = {n: PPM for n in nodes}
    for _ in range(iters):
        sums = {n: 0 for n in nodes}
        for s, d in edges:
            sums[d] += ranks[s] // outdeg[s]
        ranks = {n: BASE_PPM + DAMPING_PPM * sums[n] // PPM for n in nodes}
    return ranks


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rank_ppm"] for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_python_replay(spark):
    for iters in (1, 3):
        assert _run(spark, EDGES, iters=iters) == py_pagerank(EDGES, iters)


def test_pagerank_partition_invariant(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = {r["node"]: r["rank_ppm"] for r in pagerank(df.repartition(1), iters=3).collect()}
    b = {r["node"]: r["rank_ppm"] for r in pagerank(df.repartition(7), iters=3).collect()}
    assert a == b


def test_pagerank_dangling_drops_mass(spark):
    """b has no out-edges: after one round its incoming mass vanishes from
    the system (the documented simplification) — every rank then derives
    from the base term only."""
    got = _run(spark, [("a", "b")], iters=2)
    # round 1: a = base (no in-edges), b = base + 0.85 * 1.0
    # round 2: a = base, b = base + 0.85 * rank(a) = base + 0.85 * base
    assert got["a"] == BASE_PPM
    assert got["b"] == BASE_PPM + DAMPING_PPM * BASE_PPM // PPM


def test_pagerank_deep_run_with_checkpointing(spark):
    """checkpoint_every below iters exercises the lineage truncation path;
    values must be identical to the unchunked plan."""
    plain = _run(spark, EDGES, iters=5)
    chunked = _run(spark, EDGES, iters=5, checkpoint_every=2)
    assert plain == chunked == py_pagerank(EDGES, 5)


def test_pagerank_overflow_guard_fails_loudly(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(Exception, match="damping budget"):
        pagerank(df, iters=1, sum_budget=10).collect()


def test_pagerank_rejects_zero_iters(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, iters=0)


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------

from itertools import combinations

from table_extractor_spark.operators.graph import k_hop_distances, triangle_counts


def py_triangles(edges):
    """Brute-force per-node triangle counts (the O(n^3) oracle)."""
    adj = set()
    nodes = set()
    for u, v in edges:
        adj.add((u, v))
        adj.add((v, u))
        nodes.update((u, v))
    counts: dict = {}
    for a, b, c in combinations(sorted(nodes), 3):
        if (a, b) in adj and (a, c) in adj and (b, c) in adj:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }


def test_triangle_counts_match_brute_force(spark):
    # two triangles sharing the edge (b, c), plus a pendant edge
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"),
        ("b", "d"), ("c", "d"),
        ("d", "e"),
    ]
    assert _tri(spark, edges) == py_triangles(edges)


def test_triangle_counts_complete_k4(spark):
    """K4: every node sits in C(3,2) = 3 triangles."""
    nodes = ["a", "b", "c", "d"]
    edges = [(u, v) for u, v in combinations(nodes, 2)]
    assert _tri(spark, edges) == {n: 3 for n in nodes}


def test_triangle_counts_no_triangles_empty(spark):
    # a 4-cycle has no triangle
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
    assert _tri(spark, edges) == {}


def test_triangle_counts_skewed_hub_matches(spark):
    """A hub star plus one rim edge: degree orientation must point the rim
    pair AT the hub, and exactly one triangle results no matter how big
    the star is."""
    edges = [("hub", f"r{i:02d}") for i in range(12)] + [("r00", "r01")]
    got = _tri(spark, edges)
    assert got == {"hub": 1, "r00": 1, "r01": 1}
    assert got == py_triangles(edges)


def test_triangle_counts_partition_invariant(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"),
        ("b", "d"), ("c", "d"), ("a", "d"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    one = {r["node"]: r["n_triangles"] for r in triangle_counts(df.repartition(1)).collect()}
    many = {r["node"]: r["n_triangles"] for r in triangle_counts(df.repartition(7)).collect()}
    assert one == many == py_triangles(edges)


# ---------------------------------------------------------------------------
# k_hop_distances
# ---------------------------------------------------------------------------


def _khop(spark, edges, seeds, k):
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return {r["node"]: r["hop"] for r in k_hop_distances(e, s, k).collect()}


def test_k_hop_shortest_distance_wins(spark):
    """Two routes to d: a->d direct and a->b->c->d; hop must be 1."""
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
    assert _khop(spark, edges, ["a"], 3) == {"a": 0, "b": 1, "c": 2, "d": 1}


def test_k_hop_truncates_at_k(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    assert _khop(spark, edges, ["a"], 2) == {"a": 0, "b": 1, "c": 2}


def test_k_hop_multi_seed_min(spark):
    """c is 2 hops from a but 1 hop from z: the seed set minimum wins."""
    edges = [("a", "b"), ("b", "c"), ("z", "c")]
    assert _khop(spark, edges, ["a", "z"], 3) == {
        "a": 0, "z": 0, "b": 1, "c": 1,
    }


def test_k_hop_directed_edges_not_symmetric(spark):
    edges = [("a", "b")]
    assert _khop(spark, edges, ["b"], 2) == {"b": 0}


def test_k_hop_zero_k_is_seeds_only(spark):
    edges = [("a", "b")]
    assert _khop(spark, edges, ["a"], 0) == {"a": 0}


def test_k_hop_cycle_terminates(spark):
    edges = [("a", "b"), ("b", "a")]
    assert _khop(spark, edges, ["a"], 5) == {"a": 0, "b": 1}


def test_k_hop_rejects_negative_k(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    s = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError):
        k_hop_distances(e, s, -1)


def test_k_hop_deep_run_with_checkpointing(spark):
    """A 10-node chain walked with checkpoint_every=2 still yields exact
    hops — lineage truncation is physical only."""
    chain = [(f"n{i}", f"n{i+1}") for i in range(10)]
    e = spark.createDataFrame(chain, "src string, dst string")
    s = spark.createDataFrame([("n0",)], "node string")
    got = {
        r["node"]: r["hop"]
        for r in k_hop_distances(e, s, 10, checkpoint_every=2).collect()
    }
    assert got == {f"n{i}": i for i in range(11)}


def test_k_hop_rejects_bad_checkpoint_every(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    s = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError):
        k_hop_distances(e, s, 2, checkpoint_every=0)


def test_k_hop_early_exit_on_drained_frontier(spark):
    """k far beyond the component diameter: the walk must stop when the
    frontier drains and still return exact distances."""
    edges = [("a", "b"), ("b", "c")]
    assert _khop(spark, edges, ["a"], 50) == {"a": 0, "b": 1, "c": 2}
