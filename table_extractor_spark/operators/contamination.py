"""Benchmark decontamination: n-gram collision detection between a training
corpus and an evaluation/benchmark set.

The standard LLM-training hygiene step (the GPT-3 appendix-C / Llama
decontamination method, public): collect the benchmark's word n-grams,
flag every training document that shares one.  Shapes for 100 TB:

* the benchmark side is tiny by construction (eval sets are MBs) — its
  distinct n-gram hash set BROADCASTS; the corpus side is scanned once,
  exploded per n-gram, and hash-joined map-side with zero corpus shuffle
  before the per-doc aggregation;
* hashes reuse the engine-wide ``shingle_hashes`` arithmetic
  (md5-prefix mod MINHASH_P), so a SQL oracle replays them bit-for-bit
  and the same sketches feed dedup and decontamination;
* the report is per-doc (collision count + flag), never a filtered copy
  of the corpus — callers anti-join on it, keeping the decision auditable
  (no-silent-drops, same policy as the LSH giant-bucket guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingle_hashes


def benchmark_ngrams(
    bench: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Distinct k-gram hashes of the benchmark set — the broadcast side."""
    return (
        bench.select(F.explode(shingle_hashes(F.col(text_col), k)).alias("h"))
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    bench_grams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """(doc_id, n_collisions, contaminated): distinct benchmark k-grams each
    training doc shares.  One broadcast hash-join on the n-gram hash + one
    per-doc aggregation; docs with zero overlap keep a row (count 0)."""
    grams = docs.select(
        F.col(id_col), F.explode(shingle_hashes(F.col(text_col), k)).alias("h")
    )
    hits = (
        grams.join(F.broadcast(bench_grams), "h")
        .groupBy(id_col)
        .agg(F.count_distinct("h").alias("n_collisions"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_collisions", F.lit(0)).alias("n_collisions"),
            (F.coalesce("n_collisions", F.lit(0)) > 0).alias("contaminated"),
        )
    )
