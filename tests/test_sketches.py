"""Count-min sketch semantics: overestimate-only, exactness when the
sketch is collision-free, determinism across partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from table_extractor_spark.operators.sketches import (
    countmin_estimate,
    countmin_sketch,
)


def _keys(spark, rows):
    return spark.createDataFrame([(k,) for k in rows], ["key"])


def test_countmin_never_underestimates(spark):
    stream = (["apple"] * 7) + (["banana"] * 3) + ["cherry"] + (
        [f"noise{i}" for i in range(50)]
    )
    keys = _keys(spark, stream)
    sk = countmin_sketch(keys, depth=4, width=16)  # narrow: force collisions
    q = _keys(spark, ["apple", "banana", "cherry"]).distinct()
    est = {r.key: r.est_cnt for r in countmin_estimate(
        sk, q, depth=4, width=16
    ).collect()}
    assert est["apple"] >= 7
    assert est["banana"] >= 3
    assert est["cherry"] >= 1


def test_countmin_exact_when_wide_enough(spark):
    stream = (["a"] * 5) + (["b"] * 2) + ["c"]
    keys = _keys(spark, stream)
    # 3 distinct keys in a 4x256 sketch: collision-free with near certainty
    sk = countmin_sketch(keys)
    q = _keys(spark, ["a", "b", "c"])
    est = {r.key: r.est_cnt for r in countmin_estimate(sk, q).collect()}
    assert est == {"a": 5, "b": 2, "c": 1}


def test_countmin_sketch_is_partition_invariant(spark):
    stream = [f"w{i % 17}" for i in range(300)]
    one = countmin_sketch(_keys(spark, stream).coalesce(1))
    many = countmin_sketch(_keys(spark, stream).repartition(13))
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, many.collect())
    )


def test_countmin_sketch_size_is_bounded(spark):
    # 500 distinct keys, d=4 w=32: the sketch can never exceed d*w cells
    keys = _keys(spark, [f"k{i}" for i in range(500)])
    sk = countmin_sketch(keys, depth=4, width=32)
    assert sk.count() <= 4 * 32
    assert sk.agg(F.sum("cnt")).collect()[0][0] == 500 * 4
