"""Structured Streaming ingest: continuous/incremental extraction.

The reference is a batch crawler with no streaming semantics (SURVEY §2.8),
so nothing here is required for parity — but the engine's incremental story
has an idiomatic Structured Streaming form: a file-source stream over the
documents directory, the SAME extraction plan (the kernel stage is
stateless, so mapInPandas composes with streaming unchanged), and
``Trigger.AvailableNow`` — process everything new since the last checkpoint,
then stop.  Re-invoking resumes from the stream checkpoint: file-level
exactly-once without the manifest table (``sources/incremental``) or the
bucket lineage (``streaming/checkpoint``); pick per deployment:

* bucket lineage  — restartable mid-corpus, per-partition metrics (10^12 docs)
* manifest        — doc-level replan, works with any table layout
* stream+AvailableNow — hands-off incremental tail-processing of a landing dir

On Iceberg the file source is replaced by the Iceberg streaming source and
the parquet sink by ``toTable`` — same plan, same checkpoint semantics.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..plans.extract import INPUT_SCHEMA, extract_pipeline
from ..sources.writers import dynamic_partition_overwrite


def stream_docs(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of (doc_id, spans) parquet landing in input_dir."""
    return spark.readStream.schema(INPUT_SCHEMA).parquet(input_dir)


def start_stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    num_partitions: Optional[int] = None,
    available_now: bool = True,
):
    """Start the streaming extraction; returns the StreamingQuery.

    ``available_now=True`` drains all currently-available files and stops —
    the incremental batch idiom; ``False`` keeps tailing the directory."""
    docs = stream_docs(spark, input_dir)
    out, _metrics = extract_pipeline(docs, num_partitions=num_partitions)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_stream_extract_with_metrics(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    *,
    num_partitions: Optional[int] = None,
):
    """Streaming extraction writing BOTH sinks (spans + per-doc metrics)
    from ONE parse per micro-batch — the canonical foreachBatch multi-sink
    pattern.  A second independent writeStream would re-run the kernel per
    sink; here the batch is persisted, both outputs write, then unpersist.

    Exactly-once: foreachBatch is only at-least-once on retry, so each sink
    is PARTITIONED BY the micro-batch id and written with dynamic partition
    OVERWRITE — a retried batch replaces its own ``batch_id=`` partition
    instead of appending a duplicate (the standard idempotent-foreachBatch
    recipe).  Readers just read the directory; ``batch_id`` rides along as
    provenance."""
    from pyspark.sql import functions as F

    from ..operators.repartition import salted_repartition
    from ..plans.extract import (
        METRIC_FIELDS,
        OUT_COLUMNS,
        parse_stage,
        table_prefilter,
    )

    docs = stream_docs(spark, input_dir)

    def write_both(batch_df, batch_id: int) -> None:
        # persist the PARSED frame (the shared upstream of both outputs) —
        # persisting either branch alone would re-run the kernel for the
        # other (same write-then-branch rule as streaming/checkpoint.py)
        filtered = batch_df.filter(table_prefilter())
        spread = salted_repartition(
            filtered.select("doc_id", "spans"),
            num_partitions=num_partitions,
        )
        parsed = parse_stage(spread).withColumn(
            "batch_id", F.lit(int(batch_id))
        ).persist()
        try:
            dynamic_partition_overwrite(
                parsed.filter(F.col("kind").isNotNull()).select(
                    *OUT_COLUMNS, "batch_id"
                ),
                output_dir,
            )
            dynamic_partition_overwrite(
                parsed.filter(F.col("kind").isNull()).select(
                    "doc_id", *METRIC_FIELDS, "batch_id"
                ),
                metrics_dir,
            )
        finally:
            parsed.unpersist()

    return (
        docs.writeStream.foreachBatch(write_both)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    metrics_dir: Optional[str] = None,
    num_partitions: Optional[int] = None,
    timeout_sec: int = 600,
) -> None:
    """Process-all-new-then-stop, blocking until drained.

    With ``metrics_dir`` the per-document metrics rows are written too,
    from the same single parse (foreachBatch two-sink path)."""
    if metrics_dir is not None:
        q = start_stream_extract_with_metrics(
            spark, input_dir, output_dir, metrics_dir, checkpoint_dir,
            num_partitions=num_partitions,
        )
    else:
        q = start_stream_extract(
            spark, input_dir, output_dir, checkpoint_dir,
            num_partitions=num_partitions, available_now=True,
        )
    q.awaitTermination(timeout_sec)
    if q.isActive:  # pragma: no cover - defensive
        q.stop()


def start_stream_near_dup_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    *,
    near_dup_jaccard: float = 0.8,
    timeout_sec: int = 600,
):
    """Streaming near-dup dedup against a STANDING index — the daily-crawl
    shape (operators/dedup.lsh_incremental_candidate_pairs) wired into
    Structured Streaming.

    Per micro-batch of (doc_id, text):

    1. minhash/LSH-bucket the batch;
    2. candidates = batch x standing-index buckets + batch x batch
       (increment x occupancy — never corpus x corpus);
    3. exact-Jaccard verify against the index's stored texts;
    4. drop batch docs that verify as dups of the corpus; collapse
       batch-internal dup clusters to one survivor (connected components,
       min id);
    5. append survivors (docs to ``output_dir``, their buckets to
       ``index_dir``/buckets and their texts — ONCE per doc — to
       ``index_dir``/texts), all PARTITIONED BY batch_id with
       dynamic-partition OVERWRITE — a retried micro-batch replaces its
       own partitions, so the at-least-once foreachBatch becomes
       effectively exactly-once and the index never double-counts a batch.

    The standing index grows by survivors only, so the verify set stays
    duplicate-free; at 10^12 docs the index is the big side and is only
    ever equi-joined on (band, bucket) — the batch side is the small one.
    The per-batch verify cost is O(|candidates|), not O(|index|): texts
    live in their own table (one row per doc — no per-batch ``distinct()``
    over band-multiplied rows), and ``ngram_jaccard`` semi-joins the
    candidate id set into its text side before computing any shingles, so
    the index-side scan of the verify stage reads only docs that LSH
    actually paired with this batch.  Scan I/O follows suit at corpus
    scale: Spark's runtime Bloom-filter injection
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by default)
    pushes a filter built from the broadcast id side into parquet scans
    larger than its 10 GiB application-side threshold — i.e. exactly the
    standing-index texts table at 10^12 docs — so row groups without
    candidates are skipped, not just left unshingled.
    """
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    from ..operators.dedup import (
        connected_components,
        lsh_buckets,
        lsh_candidate_pairs,
        lsh_incremental_candidate_pairs,
        minhash_signatures,
        ngram_jaccard,
    )

    buckets_dir = index_dir + "/buckets"
    texts_dir = index_dir + "/texts"

    docs = (
        spark.readStream.schema("doc_id string, text string")
        .parquet(input_dir)
    )

    def read_index_part(spark_, path, batch_id):
        """One index side, minus this batch's own partition (a RETRIED
        micro-batch must not verify against its own prior partial write —
        self-id pairs are filtered anyway; this makes the retry idempotence
        explicit rather than incidental).  Only a missing path means
        'first batch'; any other reader error must FAIL the batch so the
        streaming retry re-runs it — swallowing, say, a transient
        filesystem fault here would silently skip corpus dedup for the
        batch and permanently admit its duplicates."""
        try:
            df = spark_.read.parquet(path)
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
                return None
            raise
        return df.filter(F.col("batch_id") != int(batch_id))

    def dedup_batch(batch_df, batch_id: int) -> None:
        spark_ = batch_df.sparkSession
        batch = batch_df.select("doc_id", "text").persist()
        try:
            new_buckets = lsh_buckets(minhash_signatures(batch)).persist()
            idx_buckets = read_index_part(spark_, buckets_dir, batch_id)
            idx_texts = read_index_part(spark_, texts_dir, batch_id)
            if (idx_buckets is None) != (idx_texts is None):
                # one side missing: legal only when the present side is
                # empty after excluding this batch's own partition (a
                # batch-1 retry that crashed between the two index
                # writes); anything else is a genuinely torn index and
                # must fail the batch rather than silently skip dedup
                present = idx_buckets if idx_buckets is not None else idx_texts
                if present.limit(1).count() > 0:
                    raise RuntimeError(
                        f"standing index torn: exactly one of "
                        f"{buckets_dir} / {texts_dir} has rows outside "
                        f"batch {batch_id}"
                    )
                idx_buckets = idx_texts = None

            # candidate pairs: batch x index + batch x batch.  Persisted:
            # the pair list feeds the verify joins AND the candidate-id
            # semi-join pruning the shingle side — unpersisted, the LSH
            # pipeline would be recomputed three times per micro-batch.
            within = lsh_candidate_pairs(new_buckets)
            if idx_buckets is not None and idx_texts is not None:
                corpus_b = idx_buckets.select("doc_id", "band", "bucket")
                cross = (
                    lsh_incremental_candidate_pairs(new_buckets, corpus_b)
                    .unionByName(within)
                    .distinct()
                    .persist()
                )
                # one row per doc on both sides — ngram_jaccard's internal
                # candidate semi-join prunes this to the pair working set
                # before any shingle is computed
                texts = batch.unionByName(idx_texts.select("doc_id", "text"))
            else:
                cross = within.persist()
                texts = batch

            verified = ngram_jaccard(texts, cross).filter(
                F.col("jaccard") >= near_dup_jaccard
            )
            # side-tag each pair endpoint by batch membership — joins, not
            # driver collects: the batch can be arbitrarily large
            bids = batch.select("doc_id").distinct()
            a_in = bids.select(
                F.col("doc_id").alias("a"), F.lit(True).alias("__a_in")
            )
            b_in = bids.select(
                F.col("doc_id").alias("b"), F.lit(True).alias("__b_in")
            )
            v = (
                verified.select("a", "b")
                .join(a_in, "a", "left")
                .join(b_in, "b", "left")
            )
            # batch doc paired with a CORPUS member -> dropped outright
            drop_corpus = (
                v.filter(F.col("__a_in") & F.col("__b_in").isNull())
                .select(F.col("a").alias("doc_id"))
                .unionByName(
                    v.filter(F.col("__b_in") & F.col("__a_in").isNull())
                    .select(F.col("b").alias("doc_id"))
                )
            )
            # batch-internal dup clusters -> keep one per component
            batch_pairs = v.filter(
                F.col("__a_in") & F.col("__b_in")
            ).select("a", "b")
            drop_cc = (
                connected_components(batch_pairs)
                .filter(F.col("node") != F.col("component"))
                .select(F.col("node").alias("doc_id"))
            )
            survivors = batch.join(
                drop_corpus.unionByName(drop_cc).distinct(),
                "doc_id",
                "left_anti",
            )
            out = survivors.withColumn("batch_id", F.lit(int(batch_id)))
            idx_bucket_rows = (
                new_buckets.join(survivors.select("doc_id"), "doc_id", "leftsemi")
                .withColumn("batch_id", F.lit(int(batch_id)))
            )
            idx_text_rows = survivors.select("doc_id", "text").withColumn(
                "batch_id", F.lit(int(batch_id))
            )
            try:
                dynamic_partition_overwrite(out, output_dir)
                dynamic_partition_overwrite(idx_bucket_rows, buckets_dir)
                dynamic_partition_overwrite(idx_text_rows, texts_dir)
            finally:
                cross.unpersist()
                new_buckets.unpersist()
        finally:
            batch.unpersist()

    q = (
        docs.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:  # pragma: no cover - defensive
        q.stop()
    return q


def compact_near_dup_index(
    spark: SparkSession, index_dir: str, batch_ids=None
) -> None:
    """Small-file maintenance for the standing near-dup index.

    Every micro-batch appends its own ``batch_id=N`` partition with one
    file per write task; at 10^12 docs and thousands of batches the index
    becomes a per-file-open tax on every verify read.  This rewrites each
    index table with ONE file per batch partition — rows verbatim, same
    layout, same dynamic-partition overwrite the ingest itself uses, so
    the retry-idempotence contract is untouched (a batch retry still
    replaces its whole partition; compaction is just an earlier writer of
    identical content).  Run it from the maintenance schedule between
    drains — not concurrently with an active writer of the same
    partitions (the usual single-writer rule for table maintenance).

    The pass materializes its working set (``localCheckpoint``) before
    overwriting the same path — required for read-then-overwrite safety.
    ``batch_ids`` bounds that working set: at corpus scale, compact a
    sliding window of recent batches per pass (older partitions are
    already one file from earlier passes) instead of the whole index.
    """
    from pyspark.sql import functions as F

    for part in ("buckets", "texts"):
        path = f"{index_dir}/{part}"
        df = spark.read.parquet(path)
        if batch_ids is not None:
            df = df.filter(F.col("batch_id").isin([int(b) for b in batch_ids]))
        # repartition BY the partition column: each batch's rows collapse
        # into the task owning that hash -> exactly one file per partition
        compacted = df.repartition(F.col("batch_id")).localCheckpoint()
        dynamic_partition_overwrite(compacted, path)


def start_stream_decontamination(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    quarantine_dir: str,
    bench_docs,
    checkpoint_dir: str,
    *,
    k: int = 3,
    timeout_sec: int = 600,
):
    """Streaming benchmark decontamination — the ingest hygiene gate: per
    micro-batch of (doc_id, text), flag every doc sharing a word ``k``-gram
    with the (static) benchmark set, route clean docs to ``output_dir`` and
    flagged docs — WITH their collision counts — to ``quarantine_dir``.
    Quarantine-not-drop keeps the decision auditable, the same policy as
    the batch ``contamination_report`` and the LSH giant-bucket guard.

    The benchmark gram set is computed ONCE before the stream starts and
    persisted: eval sets are MBs at any corpus scale, so every batch pays
    one broadcast hash-join on the gram hash and one per-doc aggregation —
    the batch side is never shuffled.  Both sinks are PARTITIONED BY
    batch_id and written with dynamic-partition overwrite, so a retried
    micro-batch replaces its own partitions (the same effectively-
    exactly-once shape as ``start_stream_near_dup_dedup``)."""
    from pyspark.sql import functions as F

    from ..operators.contamination import benchmark_ngrams, contamination_report

    grams = benchmark_ngrams(bench_docs, k=k).persist()
    grams.count()  # materialize once, outside the per-batch path

    docs = (
        spark.readStream.schema("doc_id string, text string")
        .parquet(input_dir)
    )

    def decontaminate_batch(batch_df, batch_id: int) -> None:
        batch = batch_df.select("doc_id", "text").persist()
        try:
            report = contamination_report(batch, grams, k=k)
            flagged = report.filter(F.col("contaminated"))
            quarantined = (
                batch.join(flagged, "doc_id")
                .select("doc_id", "text", "n_collisions")
                .withColumn("batch_id", F.lit(int(batch_id)))
            )
            clean = batch.join(
                flagged.select("doc_id"), "doc_id", "left_anti"
            ).withColumn("batch_id", F.lit(int(batch_id)))
            dynamic_partition_overwrite(clean, output_dir)
            dynamic_partition_overwrite(quarantined, quarantine_dir)
        finally:
            batch.unpersist()

    q = (
        docs.writeStream.foreachBatch(decontaminate_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        grams.unpersist()
    if q.isActive:  # pragma: no cover - defensive
        q.stop()
    return q


def start_stream_dim_enrich(
    spark: SparkSession,
    input_dir: str,
    dim_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    key: str = "user_id",
    event_schema: str = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ),
    available_now: bool = True,
):
    """Stream-static dimension enrichment: the event stream LEFT-joins a
    broadcast batch dimension on ``key`` — the lookup-table pattern every
    ingest pipeline needs (user segment, domain reputation, language
    default).

    Two semantics worth being precise about, both pinned in
    tests/test_streaming_ingest.py:

    * The static side is re-resolved EVERY micro-batch — Spark re-reads
      the dimension path per batch, so an overwritten dimension takes
      effect at the next trigger with no restart.  This is
      latest-value-wins enrichment; events already written keep the
      value that was current at THEIR batch.  When the business needs
      as-of-event-time attribution instead, that is the SCD2 store
      (streaming/scd2 + scd2_point_in_time), not a bigger lookup table.
    * LEFT join: unmatched keys survive with a NULL attribute — the
      unknown bucket stays visible (the null_safe_device_join rule),
      never silently dropped by an inner join.

    At scale the dimension must stay broadcast-sized; a fact-sized
    "dimension" belongs in a stream-stream or pre-bucketed batch join.
    Returns the StreamingQuery."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(event_schema).parquet(input_dir)
    dim = spark.read.parquet(dim_dir)
    enriched = stream.join(F.broadcast(dim), key, "left")
    writer = (
        enriched.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
