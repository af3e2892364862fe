"""Bucketized range join: equivalence with the exact theta join + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from table_extractor_spark.operators.rangejoin import bucketed_range_join


def _frames(spark):
    points = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 5.0, 9.99, 10.0, 49.9, 120.0, -3.0])],
        "pid int, v double",
    )
    intervals = spark.createDataFrame(
        [
            (0, 0.0, 10.0),     # covers 0, 5, 9.99 (10.0 excluded)
            (1, 5.0, 50.0),     # covers 5, 9.99, 10.0, 49.9
            (2, 100.0, 100.0),  # degenerate [x, x): matches nothing
            (3, -10.0, 0.0),    # negative range: covers -3 only
        ],
        "iid int, lo double, hi double",
    )
    return points, intervals


def pairs(df):
    return sorted((r["pid"], r["iid"]) for r in df.collect())


def test_matches_exact_theta_join(spark):
    points, intervals = _frames(spark)
    exact = points.join(
        intervals, (points.v >= intervals.lo) & (points.v < intervals.hi)
    )
    for w in (1.0, 7.0, 50.0, 1000.0):
        got = bucketed_range_join(
            points, intervals, point="v", lo="lo", hi="hi", bucket_width=w
        )
        assert pairs(got) == pairs(exact), f"bucket_width={w}"
    assert pairs(exact) == [(0, 0), (1, 0), (1, 1), (2, 0), (2, 1), (3, 1),
                            (4, 1), (6, 3)]


def test_plans_as_hash_join(spark):
    points, intervals = _frames(spark)
    got = bucketed_range_join(
        points, intervals, point="v", lo="lo", hi="hi", bucket_width=10.0
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan


def test_left_join_keeps_unmatched_and_refine_failed_rows(spark):
    """how='left': left rows with no interval AND rows that bucket-matched
    but failed the exact refine must survive with NULL right columns (the
    r01 version silently degraded left to inner — ADVICE finding)."""
    from table_extractor_spark.operators.rangejoin import bucketed_range_join

    left = spark.createDataFrame(
        [(1, 5.0), (2, 55.0), (3, 999.0)], ["id", "v"]
    )
    # interval [0,10) matches v=5; [50,52) shares bucket 1 (w=50) with v=55
    # but fails the refine; nothing near 999
    right = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 50.0, 52.0)], ["rid", "lo", "hi"]
    )
    out = bucketed_range_join(
        left, right, point="v", lo="lo", hi="hi", bucket_width=50.0, how="left"
    ).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.id, []).append(r.rid)
    assert by_id == {1: [10], 2: [None], 3: [None]}


def test_unsupported_join_type_raises(spark):
    from table_extractor_spark.operators.rangejoin import bucketed_range_join
    import pytest

    left = spark.createDataFrame([(1, 5.0)], ["id", "v"])
    right = spark.createDataFrame([(10, 0.0, 10.0)], ["rid", "lo", "hi"])
    with pytest.raises(ValueError):
        bucketed_range_join(
            left, right, point="v", lo="lo", hi="hi",
            bucket_width=50.0, how="right",
        )


def test_matches_theta_join_randomized(spark):
    """Seeded random intervals (including degenerate, overlapping, negative,
    and bucket-straddling ones) at several bucket widths — inner AND left —
    against Spark's own theta join as the oracle."""
    import random

    rng = random.Random(20240816)
    pts = [(i, round(rng.uniform(-100, 100), 3)) for i in range(300)]
    ivs = []
    for j in range(60):
        lo = round(rng.uniform(-120, 120), 3)
        length = rng.choice([0.0, 0.001, 0.5, 3.7, 25.0, 80.0])
        ivs.append((j, lo, round(lo + length, 3)))
    points = spark.createDataFrame(pts, ["pid", "v"])
    intervals = spark.createDataFrame(ivs, ["iid", "lo", "hi"])

    exact_inner = sorted(
        (r.pid, r.iid)
        for r in points.join(
            intervals, (points.v >= intervals.lo) & (points.v < intervals.hi)
        ).collect()
    )
    matched = {p for p, _ in exact_inner}
    exact_left = sorted(
        exact_inner + [(p, None) for p, _ in pts if p not in matched]
    )
    for w in (0.9, 10.0, 64.0):
        got_inner = sorted(
            (r.pid, r.iid)
            for r in bucketed_range_join(
                points, intervals, point="v", lo="lo", hi="hi", bucket_width=w
            ).collect()
        )
        assert got_inner == exact_inner, f"inner bucket_width={w}"
        got_left = sorted(
            (r.pid, r.iid)
            for r in bucketed_range_join(
                points, intervals, point="v", lo="lo", hi="hi",
                bucket_width=w, how="left",
            ).collect()
        )
        assert got_left == exact_left, f"left bucket_width={w}"
