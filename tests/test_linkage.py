"""Blocked record linkage: pair semantics and the degenerate-block guard."""

from __future__ import annotations

from table_extractor_spark.operators.linkage import (
    blocked_match_pairs,
    oversized_blocks,
)


def _records(spark, rows):
    return spark.createDataFrame(rows, "rid long, blk string, name string")


FIX = [
    (1, "A", "small ring"),
    (2, "A", "small bolt"),   # dist 4 from #1
    (3, "A", "red widget"),   # far from both
    (4, "B", "small ring"),   # same name as #1 but OTHER block: no pair
    (5, "B", "small rings"),  # dist 1 from #4
]


def _pairs(spark, df, **kw):
    out = blocked_match_pairs(
        df, id_col="rid", text_col="name", block_cols=("blk",),
        max_distance=4, **kw,
    )
    return sorted((r["a_id"], r["b_id"], r["dist"]) for r in out.collect())


def test_pairs_only_within_blocks_each_once(spark):
    got = _pairs(spark, _records(spark, FIX))
    assert got == [(1, 2, 4), (4, 5, 1)]
    # identical text across blocks produced NO pair (blocking is the recall
    # trade, stated, not hidden) and every pair appears once with a_id<b_id


def test_exact_duplicates_match_at_distance_zero(spark):
    got = _pairs(spark, _records(spark, FIX + [(6, "A", "small ring")]))
    assert (1, 6, 0) in got


def test_block_cap_drops_the_hot_block_and_reports_it(spark):
    hot = [(100 + i, "HOT", f"name {i}") for i in range(10)]
    df = _records(spark, FIX + hot)
    capped = _pairs(spark, df, max_block_size=5)
    assert capped == [(1, 2, 4), (4, 5, 1)]  # HOT contributed nothing
    rep = oversized_blocks(df, ("blk",), max_block_size=5).collect()
    assert [(r["blk"], r["n_records"]) for r in rep] == [("HOT", 10)]


def test_partition_invariance(spark):
    df = _records(spark, FIX)
    assert _pairs(spark, df) == _pairs(spark, df.repartition(13))
