"""Incrementally-maintained time rollup (continuous-aggregate shape).

A daily/hourly aggregate over an append-only event stream should never be
recomputed from all history: each increment touches only the time buckets
it contains.  ``update_time_rollup`` merges an increment into a persisted
rollup table by

1. aggregating the increment per (bucket, key) — cost O(|increment|);
2. reading ONLY the affected bucket partitions of the existing rollup
   (partition-pruned scan: the rollup table is partitioned by bucket);
3. merging old + delta with sum/count semantics;
4. dynamic-partition-overwriting just those buckets.

Mergeable aggregates only (count, sum — and mean as sum/count at read
time).  The same pattern holds on Iceberg via ``overwritePartitions``.

Idempotence note: re-running the SAME increment double-counts — dedup the
increment first (streaming ``dedup_stream`` or the manifest anti-join in
``sources/incremental``) exactly like every delta-merge system requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

ROLLUP_COLS = ("bucket_start_us", "event_type", "n", "sum_value")


def rollup_increment(events: DataFrame, bucket: str = "1 day") -> DataFrame:
    """Per-(bucket, event_type) mergeable aggregate of an increment."""
    return (
        events.groupBy(
            F.unix_micros(
                F.window(F.col("ts").cast("timestamp"), bucket).start
            ).alias("bucket_start_us"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("sum_value"),
        )
    )


def update_time_rollup(
    spark: SparkSession,
    rollup_dir: str,
    increment: DataFrame,
    bucket: str = "1 day",
) -> None:
    """Merge ``increment`` into the rollup table at ``rollup_dir``."""
    delta = rollup_increment(increment, bucket)
    affected = [r[0] for r in delta.select("bucket_start_us").distinct().collect()]
    if not affected:
        return
    try:
        existing = (
            spark.read.parquet(rollup_dir)
            # partition pruning: only the buckets this increment touches
            .filter(F.col("bucket_start_us").isin(affected))
        )
    except Exception:  # first increment: nothing on disk yet
        existing = None
    if existing is not None:
        merged = (
            existing.unionByName(delta)
            .groupBy("bucket_start_us", "event_type")
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_value").cast("decimal(28,2)").alias("sum_value"),
            )
        )
    else:
        merged = delta
    from ..sources.writers import dynamic_partition_overwrite

    dynamic_partition_overwrite(
        merged.select(*ROLLUP_COLS), rollup_dir, "bucket_start_us"
    )


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    return spark.read.parquet(rollup_dir).select(*ROLLUP_COLS)
