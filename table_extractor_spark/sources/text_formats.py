"""JSONL / CSV document sources with AUDITABLE corrupt-record handling.

Web-scale corpora rarely arrive as clean parquet: crawl processors emit
JSON-lines (one document per line) and tabular exports emit CSV.  At
10^12 documents some fraction of lines is always malformed (truncated
writes, encoding damage, schema drift), and the two failure modes to
avoid are silently DROPPING them (mode=DROPMALFORMED — coverage loss
nobody sees) and failing the whole job on one bad line (mode=FAILFAST).

These readers use PERMISSIVE mode with an explicit corrupt-record
column and return ``(good_df, bad_df)``: well-formed rows with the
enforced schema, plus the raw text of every malformed line for the run's
metrics/quarantine sink — the same no-silent-drop principle as the LSH
giant-bucket report (``lsh_oversized_buckets``).

Schema is always enforced explicitly (never inferred): at corpus scale
schema inference is an extra full scan AND a correctness hazard (a batch
whose sample happens to be all-numeric flips a column's type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

# the engine's canonical flat document schema (documents.parquet shape)
DOCUMENTS_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"

_CORRUPT = "_corrupt_record"


def _split_good_bad(
    df: DataFrame, columns: list, storage_level: StorageLevel
) -> tuple:
    # Spark refuses to query ONLY the corrupt-record column of an
    # un-cached PERMISSIVE read (internal raw-record restriction) —
    # persist the parsed frame once, then branch.  The storage level is
    # the caller's scale dial: MEMORY_AND_DISK is right at fixture scale,
    # but a 100 TB quarantine read should pass DISK_ONLY — a full-corpus
    # memory cache for one pass is pure executor-memory pressure (it
    # evicts shuffle/agg working memory and buys nothing once each
    # partition has been read by both branches).
    df = df.persist(storage_level)
    good = df.filter(F.col(_CORRUPT).isNull()).select(*columns)
    bad = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_record")
    )
    return good, bad


def load_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema_ddl: str = DOCUMENTS_DDL,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> tuple:
    """(good_df, bad_df) from JSON-lines: one document object per line,
    schema ENFORCED, malformed lines preserved verbatim for quarantine.

    ``storage_level`` sizes the one-pass persist backing both branches;
    pass ``StorageLevel.DISK_ONLY`` for corpus-scale reads (see
    ``_split_good_bad``)."""
    full = f"{schema_ddl}, {_CORRUPT} string"
    cols = [c.strip().split()[0] for c in schema_ddl.split(",")]
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    return _split_good_bad(df, cols, storage_level)


def load_documents_csv(
    spark: SparkSession,
    path: str,
    schema_ddl: str = DOCUMENTS_DDL,
    header: bool = True,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> tuple:
    """(good_df, bad_df) from CSV with the same contract; quoted fields
    and embedded newlines handled by the multiLine parser; same
    ``storage_level`` scale dial as the JSONL reader."""
    full = f"{schema_ddl}, {_CORRUPT} string"
    cols = [c.strip().split()[0] for c in schema_ddl.split(",")]
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", "true" if header else "false")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
    return _split_good_bad(df, cols, storage_level)


def write_jsonl_sharded(
    df: DataFrame,
    path: str,
    *,
    max_records_per_file: int = 100_000,
    partition_cols: tuple = (),
) -> None:
    """Export a corpus as JSON-lines shards with a BOUNDED per-file record
    count — the handoff format a training loader consumes (one document
    object per line, many similarly-sized files so loader workers
    parallelize evenly; a single giant file serializes the consumer, and
    per-file skew starves some workers).

    ``maxRecordsPerFile`` splits each task's output at the bound without
    an extra shuffle (file count adapts to data volume — no hand-tuned
    repartition to go stale as the corpus grows); ``partition_cols``
    (e.g. ("split",) or ("lang",)) adds directory partitioning for
    pruned downstream reads.  Overwrite mode is scoped to the writer.
    """
    w = df.write.option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.mode("overwrite").json(path)


def load_documents_orc(
    spark: SparkSession,
    path: str,
    schema_ddl: str = DOCUMENTS_DDL,
) -> DataFrame:
    """ORC corpus reader (schema enforced, same no-inference policy).

    ORC is columnar like parquet — predicate pushdown and column pruning
    work the same way, so there is no corrupt-record quarantine channel
    here (a torn columnar file fails its split, unlike a torn text line);
    this exists for warehouses standardized on ORC.  Writer counterpart:
    ``df.write.orc(path)`` (round-trip pinned in tests)."""
    return spark.read.schema(schema_ddl).orc(path)
