"""Shared parquet write helpers.

``dynamic_partition_overwrite`` is the engine's one idempotent-sink
primitive: overwrite ONLY the partition values present in the frame
(a retried micro-batch/wave replaces its own ``batch_id=``/``bucket=``
partition instead of appending a duplicate or clobbering siblings).

The dynamic mode is scoped to the single writer via the per-write
option, which takes precedence over the session conf — unlike the
set/try/finally session-conf toggle this replaces, a concurrent
overwrite write on the same SparkSession can never be silently flipped
to dynamic while this write is in flight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dynamic_partition_overwrite(
    df: DataFrame, path: str, partition_col: str = "batch_id"
) -> None:
    df.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(partition_col).parquet(path)
