"""Bucketed-table layout: pre-shuffled storage for shuffle-free joins.

At 10^12 documents the expensive recurring joins (docs x extraction
metrics, docs x dedup verdicts, codes x assignments) repeat on the SAME
key run after run.  Hive-style bucketing moves that shuffle from every
query into the write: a table written with ``bucketBy(n, key)`` (and
``sortBy`` for merge-join readiness) is stored pre-partitioned by
``hash(key) % n``, and Spark's planner joins two tables bucketed on the
same key with the same bucket count WITHOUT any Exchange — each task
reads bucket i of both sides.  This module is the engine's canonical
recipe for that layout; ``tests/test_plan_quality.py`` pins the
zero-Exchange plan.

Rules that make bucketing actually work (easy to get silently wrong):

* both sides must use the SAME bucket count and the SAME key;
* ``spark.sql.sources.bucketing.enabled`` must be true (default);
* the join degenerates to shuffle again if one side is re-partitioned or
  wrapped in a bucketing-destroying transform before the join;
* pick ``n_buckets`` so a bucket of the BIG table fits an executor core's
  working set at target scale (same sizing rule as shuffle partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and by default
    sorted) by ``key`` — the write-side half of a shuffle-free join."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
