"""Iceberg table IO, gated behind runtime availability.

The production deployment (north rule) reads the 10^12-document corpus from
an Iceberg table and writes outputs/lineage back as Iceberg tables; this
sandbox has no iceberg-spark-runtime jar, so every entry point checks
availability and the rest of the engine runs on the parquet stand-ins with
the same plan shapes:

| Iceberg form                                    | parquet stand-in |
|-------------------------------------------------|------------------|
| ``spark.read.table(t)``                         | ``spark.read.parquet(dir)`` |
| snapshot-range incremental read                 | ``sources.incremental`` manifest anti-join |
| ``df.writeTo(t).append()``                      | ``df.write.mode("append").parquet(dir)`` |
| ``df.writeTo(t).overwritePartitions()``         | dynamic partition overwrite (``streaming.checkpoint``) |

Cluster setup (spark-submit --conf):

    spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions
    spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.lake.type=hive   (or hadoop/rest/glue)
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class IcebergUnavailable(RuntimeError):
    pass


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the session's classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _require(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise IcebergUnavailable(
            "iceberg-spark-runtime is not on the classpath; use the parquet "
            "stand-ins (sources.tables / sources.incremental / "
            "streaming.checkpoint) — same plan shapes, see module docstring"
        )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    _require(spark)
    return spark.read.table(table)


def read_incremental(
    spark: SparkSession,
    table: str,
    start_snapshot_id: int,
    end_snapshot_id: Optional[int] = None,
) -> DataFrame:
    """Snapshot-range incremental read: exactly the rows appended after
    ``start_snapshot_id`` — the metadata-only replacement for the manifest
    anti-join (``sources.incremental``)."""
    _require(spark)
    reader = spark.read.format("iceberg").option(
        "start-snapshot-id", str(start_snapshot_id)
    )
    if end_snapshot_id is not None:
        reader = reader.option("end-snapshot-id", str(end_snapshot_id))
    return reader.load(table)


def current_snapshot_id(spark: SparkSession, table: str) -> Optional[int]:
    """High-watermark for the next incremental read (from the snapshots
    metadata table)."""
    _require(spark)
    row = (
        spark.read.table(f"{table}.snapshots")
        .orderBy("committed_at", ascending=False)
        .select("snapshot_id")
        .first()
    )
    return row["snapshot_id"] if row else None


def append(df: DataFrame, table: str) -> None:
    _require(df.sparkSession)
    df.writeTo(table).append()


def overwrite_partitions(df: DataFrame, table: str) -> None:
    """Idempotent wave commit (streaming.checkpoint semantics) on Iceberg:
    replaces exactly the partitions present in ``df``."""
    _require(df.sparkSession)
    df.writeTo(table).overwritePartitions()
