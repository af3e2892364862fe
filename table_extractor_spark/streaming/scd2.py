"""Streaming SCD2 maintenance: a change-event stream keeps the type-2
dimension current, micro-batch by micro-batch.

The batch operator (``operators/scd.scd2_build``) rebuilds the dimension
from the full log; at 10^12 accumulated events that rebuild is the wrong
unit of work for a stream that touches a few million entities per batch.
The maintainer instead treats the dimension store itself as a collapsed
change log: every episode row keeps the ``event_id`` of the event that
OPENED it, so (episodes of the affected entities) ∪ (batch events),
deduplicated on the unique event id, is exactly the per-entity change
history scd2_build needs — collapsed repeats never affect later episodes,
so dropping them loses nothing.

Idempotence (foreachBatch is at-least-once): the merge is a pure function
of (store ∪ batch) with event-id dedup, so re-applying the same batch —
even over a store a crashed attempt half-updated — converges to the same
rows: merge(merge(S, B), B) = merge(S, B).  Writes go through dynamic
partition overwrite of ONLY the hash buckets containing affected
entities; untouched buckets are never rewritten.

Assumption (standard for CDC dimension feeds): per-entity event time is
monotone ACROSS batches — an event older than an entity's current open
episode would need the repeats the store intentionally collapsed.  Such
rows are counted and EXCLUDED (visible in the returned stats), not
silently merged wrong; stored openers are exempt (a retry re-delivering
them dedups losslessly), and a re-delivered collapsed repeat lands in
the counter but its exclusion is lossless by construction.

Scale shape per batch: one scan of the affected buckets (bucket-pruned),
one entity-key shuffle for the episode rebuild, one bucket-partitioned
write.  Batch size bounds state touched; the store itself is never read
in full.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.scd import scd2_build
from ..sources.writers import dynamic_partition_overwrite

DIM_SCHEMA = (
    "entity long, state string, valid_from timestamp, valid_to timestamp, "
    "is_current boolean, start_event_id long, bucket int"
)


def _bucket(col, n_buckets: int):
    return F.pmod(F.hash(col, F.lit(0x5CD2)), F.lit(n_buckets)).cast("int")


def merge_scd2_batch(
    spark: SparkSession,
    batch: DataFrame,
    dim_dir: str,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    event_id_col: str = "event_id",
    n_buckets: int = 16,
) -> dict:
    """Merge one micro-batch of change events into the dimension store at
    ``dim_dir``.  Returns {'late_dropped': n, 'episodes_written': n,
    'buckets_touched': n}.  Pure function of (store, batch) — safe to
    re-apply on retry."""
    ev = batch.select(
        F.col(entity_col).cast("long").alias("entity"),
        F.col(ts_col).alias("ts"),
        F.col(state_col).alias("state"),
        F.col(event_id_col).cast("long").alias("event_id"),
    )
    touched = ev.select(
        _bucket(F.col("entity"), n_buckets).alias("bucket")
    ).distinct()
    # detect the store by READING it, never by local-FS listing — an
    # os.listdir probe answers False for hdfs://-style paths and a
    # falsely-absent store would overwrite affected buckets losing their
    # history.  A missing path is the one legitimate bootstrap case.
    try:
        # the parquet read lists the path eagerly — a missing store
        # throws HERE, not at first action
        store = spark.read.schema(DIM_SCHEMA).parquet(dim_dir)
        affected = store.join(F.broadcast(touched), "bucket", "inner")
    except Exception as exc:  # AnalysisException: PATH_NOT_FOUND
        if (
            "PATH_NOT_FOUND" not in str(exc)
            and "Path does not exist" not in str(exc)
        ):
            raise
        affected = spark.createDataFrame([], DIM_SCHEMA)

    # monotonicity guard: an event strictly below its entity's open episode
    # cannot be situated against the collapsed history — EXCLUDE and report
    # rather than merge wrong.  Exempt events whose id is a stored opener
    # (a retry re-delivering them dedups losslessly); a re-delivered
    # collapsed REPEAT is indistinguishable from new late information, so
    # it lands in the counter too — excluding it is lossless by
    # construction (a repeat carries no state change later episodes need).
    open_eps = affected.filter(F.col("is_current")).select(
        "entity", F.col("valid_from").alias("__open_from")
    )
    known = affected.select(
        "entity", F.col("start_event_id").alias("event_id"),
        F.lit(1).alias("__known"),
    )
    ev_g = ev.join(open_eps, "entity", "left").join(
        known, ["entity", "event_id"], "left"
    )
    is_late = (
        F.col("__open_from").isNotNull()
        & (F.col("ts") < F.col("__open_from"))
        & F.col("__known").isNull()
    )
    n_late = ev_g.filter(is_late).count()
    fresh = ev_g.filter(~is_late).drop("__open_from", "__known")

    # store episodes ARE the collapsed change log (start event kept)
    pseudo = affected.select(
        "entity",
        F.col("valid_from").alias("ts"),
        "state",
        F.col("start_event_id").alias("event_id"),
    )
    log = pseudo.unionByName(fresh).dropDuplicates(["entity", "event_id"])
    rebuilt = scd2_build(
        log,
        entity_col="entity",
        ts_col="ts",
        state_col="state",
        tiebreak="event_id",
        keep_opener=True,
    )
    out = (
        rebuilt.withColumn("bucket", _bucket(F.col("entity"), n_buckets))
        .select(
            "entity", "state", "valid_from", "valid_to", "is_current",
            F.col("opener_event_id").alias("start_event_id"), "bucket",
        )
    )
    out = out.persist()
    n_eps = out.count()
    n_buckets_touched = touched.count()
    if n_eps:
        dynamic_partition_overwrite(out, dim_dir, partition_col="bucket")
    out.unpersist()
    return {
        "late_dropped": n_late,
        "episodes_written": n_eps,
        "buckets_touched": n_buckets_touched,
    }


def start_stream_scd2(
    spark: SparkSession,
    input_dir: str,
    dim_dir: str,
    checkpoint_dir: str,
    *,
    events_schema: str = "event_id long, ts timestamp, user_id long, "
    "event_type string",
    n_buckets: int = 16,
    available_now: bool = True,
):
    """Tail a landing directory of change-event parquet and keep the SCD2
    dimension store current.  Same AvailableNow / checkpoint semantics as
    the other streaming sinks; retries converge by construction (see
    module docstring)."""
    stream = spark.readStream.schema(events_schema).parquet(input_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_scd2_batch(
            batch_df.sparkSession, batch_df, dim_dir, n_buckets=n_buckets
        )

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
