"""Streaming sketch maintenance: a standing HyperLogLog register table
kept current on ingest.

The 100-TB question this answers: "how many distinct keys (URLs,
vocabulary words, doc ids) has the corpus accumulated so far?" asked
continuously, without ever re-scanning the corpus and without a
COUNT(DISTINCT) keyspace shuffle.  Each micro-batch sketches itself
into m registers (operators/sketches.hll_sketch — map-side partial
MAX, m rows out) and appends them as its own ``batch_id=N`` partition;
the standing estimate is a bucket-wise MAX over all partitions —
m * B rows in, m out, independent of corpus size.

Exactly-once the same way the near-dup index gets it: foreachBatch is
at-least-once on retry, so the per-batch register partition is written
with dynamic-partition OVERWRITE — a retried batch replaces its own
``batch_id=`` partition.  MAX-merge is additionally idempotent and
order-insensitive, so even interleaved retries can never inflate the
estimate (a property exact counters do NOT have — the reason a sketch,
not a counter table, is the right standing aggregate under retry
semantics).

``compact_hll_registers`` folds the accreted per-batch partitions into
one — the same small-files answer as ``compact_near_dup_index``, but
here compaction is also LOSSLESS by construction: bucket-wise MAX of
the partitions equals the whole-stream sketch exactly, so the estimate
is pinned unchanged across compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.sketches import hll_estimate, hll_sketch
from ..sources.writers import dynamic_partition_overwrite


def _word_keys(batch: DataFrame) -> DataFrame:
    """Default key stream: the batch's word occurrences (vocabulary
    tracking).  MAX makes duplicates invisible, so no distinct() here."""
    return batch.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("key")
    ).filter(F.col("key") != "")


def start_stream_distinct_count(
    spark: SparkSession,
    input_dir: str,
    registers_dir: str,
    checkpoint_dir: str,
    *,
    key_fn=_word_keys,
    buckets: int = 256,
    rho_cap: int = 40,
):
    """Maintain a standing HLL register table over a (doc_id, text)
    landing directory; returns the StreamingQuery (AvailableNow).

    Per micro-batch: ``key_fn(batch)`` -> (key) stream -> m-register
    sketch -> overwrite the batch's own ``batch_id=`` partition under
    ``registers_dir``."""
    docs = (
        spark.readStream.schema("doc_id string, text string")
        .parquet(input_dir)
    )

    def sketch_batch(batch_df, batch_id: int) -> None:
        reg = hll_sketch(
            key_fn(batch_df), buckets=buckets, rho_cap=rho_cap
        ).withColumn("batch_id", F.lit(int(batch_id)))
        dynamic_partition_overwrite(reg, registers_dir)

    return (
        docs.writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def standing_hll_registers(
    spark: SparkSession, registers_dir: str
) -> DataFrame:
    """(bucket, rho): the merged standing sketch — bucket-wise MAX over
    every batch partition.  Every batch writes all m buckets (rho = 0
    for empty), so the merge needs no spine."""
    return (
        spark.read.parquet(registers_dir)
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def standing_hll_estimate(
    spark: SparkSession,
    registers_dir: str,
    *,
    buckets: int = 256,
    rho_cap: int = 40,
) -> DataFrame:
    """One row (m, v_empty, s_scaled, est_distinct) for the stream so
    far — operators/sketches.hll_estimate over the merged registers."""
    return hll_estimate(
        standing_hll_registers(spark, registers_dir),
        buckets=buckets,
        rho_cap=rho_cap,
    )


def start_stream_frequency_sketch(
    spark: SparkSession,
    input_dir: str,
    cells_dir: str,
    checkpoint_dir: str,
    *,
    key_fn=_word_keys,
    depth: int = 4,
    width: int = 1024,
):
    """Maintain a standing count-min table over a (doc_id, text) landing
    directory; returns the StreamingQuery (AvailableNow).

    The merge law is the difference from the HLL stream: count cells
    ADD across batches (SUM), they don't MAX — so re-delivering a batch
    WOULD double-count.  Idempotence therefore rests entirely on the
    ``batch_id=`` dynamic-partition OVERWRITE (a retried batch replaces
    its own cells), not on the merge law itself.  The general rule the
    pair documents: max-merged sketches are doubly retry-safe, additive
    sketches are retry-safe exactly as long as each batch's contribution
    lives in its own replaceable partition."""
    from ..operators.sketches import countmin_sketch

    docs = (
        spark.readStream.schema("doc_id string, text string")
        .parquet(input_dir)
    )

    def sketch_batch(batch_df, batch_id: int) -> None:
        cells = countmin_sketch(
            key_fn(batch_df), depth=depth, width=width
        ).withColumn("batch_id", F.lit(int(batch_id)))
        dynamic_partition_overwrite(cells, cells_dir)

    return (
        docs.writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def standing_countmin_cells(spark: SparkSession, cells_dir: str) -> DataFrame:
    """(row, cell, cnt): the merged standing sketch — SUM over every
    batch partition's cells (additive merge law)."""
    return (
        spark.read.parquet(cells_dir)
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )


def standing_countmin_estimate(
    spark: SparkSession,
    cells_dir: str,
    queries: DataFrame,
    key_col: str = "key",
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(key, est_cnt) for the queried keys against the stream so far —
    operators/sketches.countmin_estimate over the merged cells."""
    from ..operators.sketches import countmin_estimate

    return countmin_estimate(
        standing_countmin_cells(spark, cells_dir),
        queries,
        key_col=key_col,
        depth=depth,
        width=width,
    )


def compact_hll_registers(
    spark: SparkSession, registers_dir: str
) -> None:
    """Fold all batch partitions into a single ``batch_id=-1`` partition
    holding the merged m registers.  The sentinel matters: streaming
    batch ids are always >= 0, so a later stream into the same
    directory (fresh checkpoint, ids restarting at 0) can never
    dynamic-overwrite the merged history — folding into batch_id=0
    would hand the whole compacted sketch to whichever future batch 0
    comes along.  localCheckpoint() materializes the merge BEFORE the
    overwrite of the path being read (the same read-then-overwrite
    safety rule as ``compact_near_dup_index``); MAX-merge makes the
    fold lossless, so the standing estimate is identical before and
    after."""
    merged = (
        standing_hll_registers(spark, registers_dir)
        .withColumn("batch_id", F.lit(-1))
        .coalesce(1)
        .localCheckpoint()
    )
    merged.write.mode("overwrite").partitionBy("batch_id").parquet(
        registers_dir
    )
