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


def run_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    num_partitions: Optional[int] = None,
    timeout_sec: int = 600,
) -> None:
    """Process-all-new-then-stop, blocking until drained."""
    q = start_stream_extract(
        spark, input_dir, output_dir, checkpoint_dir,
        num_partitions=num_partitions, available_now=True,
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:  # pragma: no cover - defensive
        q.stop()
