"""Incremental rollup maintenance: N increments must equal one full
recompute, touched buckets merge, untouched buckets stay byte-stable."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from table_extractor_spark.operators.rollup_maintenance import (
    read_rollup,
    rollup_increment,
    update_time_rollup,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(T0 + dt.timedelta(hours=h), et, float(v)) for h, et, v in rows],
        "ts timestamp, event_type string, value double",
    )


def _snap(df):
    return {
        (r.bucket_start_us, r.event_type): (r.n, float(r.sum_value))
        for r in df.collect()
    }


def test_increments_equal_full_recompute(spark, tmp_path):
    rd = str(tmp_path / "rollup")
    inc1 = _events(spark, [(1, "click", 1.0), (2, "view", 2.0), (26, "click", 4.0)])
    inc2 = _events(spark, [(3, "click", 8.0), (27, "view", 16.0), (50, "click", 32.0)])

    update_time_rollup(spark, rd, inc1)
    update_time_rollup(spark, rd, inc2)
    got = _snap(read_rollup(spark, rd))

    full = _snap(rollup_increment(inc1.unionByName(inc2)))
    assert got == full
    # 3 distinct days present
    assert len({k[0] for k in got}) == 3


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    rd = str(tmp_path / "rollup")
    update_time_rollup(spark, rd, _events(spark, [(1, "click", 1.0)]))
    day1_dir = next(
        os.path.join(rd, d) for d in os.listdir(rd) if d.startswith("bucket_")
    )
    files_before = sorted(os.listdir(day1_dir))
    mtimes = {f: os.path.getmtime(os.path.join(day1_dir, f)) for f in files_before}

    # second increment touches only day 2
    update_time_rollup(spark, rd, _events(spark, [(30, "view", 5.0)]))
    assert sorted(os.listdir(day1_dir)) == files_before
    assert all(
        os.path.getmtime(os.path.join(day1_dir, f)) == mtimes[f]
        for f in files_before
    )
    assert len(_snap(read_rollup(spark, rd))) == 2
