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
