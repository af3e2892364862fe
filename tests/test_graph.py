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
