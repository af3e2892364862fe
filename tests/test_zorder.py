"""zorder: Morton keys, envelope stats, and the pruning claim itself."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from table_extractor_spark.operators.zorder import (
    layout_stats,
    prunable_fraction,
    zorder_key,
)


def _interleave_py(x: int, y: int, bits: int) -> int:
    k = 0
    for i in range(bits):
        k |= ((x >> i) & 1) << (2 * i)
        k |= ((y >> i) & 1) << (2 * i + 1)
    return k


def _grid(spark, nx=32, ny=32):
    rows = [(x, y) for x in range(nx) for y in range(ny)]
    return spark.createDataFrame(rows, "x long, y long")


def test_key_matches_reference_interleave(spark):
    df = _grid(spark, 16, 16).withColumn("k", zorder_key("x", "y", bits=8))
    for r in df.collect():
        assert r["k"] == _interleave_py(r["x"], r["y"], 8), (r["x"], r["y"])


def test_key_is_bijective_on_the_domain(spark):
    df = _grid(spark).withColumn("k", zorder_key("x", "y", bits=5))
    keys = [r["k"] for r in df.collect()]
    assert len(set(keys)) == len(keys) == 1024
    assert min(keys) == 0 and max(keys) == 1023


def test_bits_validation():
    with pytest.raises(ValueError, match="bits"):
        zorder_key("x", "y", bits=0)
    with pytest.raises(ValueError, match="bits"):
        zorder_key("x", "y", bits=32)


def test_layout_stats_envelopes_are_exact(spark):
    df = _grid(spark).withColumn("k", zorder_key("x", "y", bits=5))
    stats = {
        r["file_id"]: r
        for r in layout_stats(
            df, "k", dims={"x": "x", "y": "y"}, file_bits=2, total_bits=10
        ).collect()
    }
    rows = [(r["x"], r["y"], _interleave_py(r["x"], r["y"], 5))
            for r in df.collect()]
    for fid, s in stats.items():
        mine = [(x, y) for x, y, k in rows if (k >> 8) == fid]
        assert s["n_rows"] == len(mine)
        assert s["min_x"] == min(x for x, _ in mine)
        assert s["max_x"] == max(x for x, _ in mine)
        assert s["min_y"] == min(y for _, y in mine)
        assert s["max_y"] == max(y for _, y in mine)


def test_zorder_prunes_both_dimensions_where_a_sort_prunes_one(spark):
    """The reason the operator exists: same data, same file count — the
    single-column (x-sorted) layout prunes NOTHING for a y-range scan,
    the z-order layout prunes most files for BOTH axis scans."""
    df = _grid(spark).persist()
    z = df.withColumn("k", zorder_key("x", "y", bits=5))
    z_stats = layout_stats(
        z, "k", dims={"x": "x", "y": "y"}, file_bits=4, total_bits=10
    ).persist()
    # x-sorted layout with the same 16 files: bucket by x's top 4 of 5 bits
    s = df.withColumn("k", F.shiftleft(F.col("x"), 5) + F.col("y"))
    s_stats = layout_stats(
        s, "k", dims={"x": "x", "y": "y"}, file_bits=4, total_bits=10
    ).persist()
    assert z_stats.count() == s_stats.count() == 16

    # narrow y scan: sorted-by-x cannot skip anything, z-order skips half
    z_y = prunable_fraction(z_stats, "y", 0, 7)
    s_y = prunable_fraction(s_stats, "y", 0, 7)
    assert s_y == 0.0
    assert z_y >= 0.5
    # narrow x scan: both layouts prune well; z-order still prunes half
    z_x = prunable_fraction(z_stats, "x", 0, 7)
    s_x = prunable_fraction(s_stats, "x", 0, 7)
    assert s_x >= z_x >= 0.5
    for fr in (z_stats, s_stats, df):
        fr.unpersist()
