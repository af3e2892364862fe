"""Salted repartitioning (north rule: defuse mega-article skew).

doc_ids are unique, so key-frequency skew cannot occur — the skew that hurts
is *size* skew (one mega-article per partition bucket).  Salting the hash
decorrelates the doc_id->partition mapping from any unlucky clustering in the
input files and lets a retry (salt+1) re-spread a pathological batch.  AQE
handles residual post-shuffle imbalance (SURVEY §4).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def bucket_expr(num_partitions: int, salt: int = 0, key: str = "doc_id"):
    """Deterministic bucket id: pmod(hash(key, salt), n).

    Also the unit of checkpoint/lineage bookkeeping (streaming.checkpoint):
    given (num_partitions, salt) every doc maps to a stable bucket, so a
    resume can anti-join completed buckets without per-doc state.
    """
    return F.pmod(F.hash(F.col(key), F.lit(salt)), F.lit(num_partitions))


def salted_repartition(
    df: DataFrame,
    *,
    num_partitions: Optional[int] = None,
    salt: int = 0,
    key: str = "doc_id",
) -> DataFrame:
    """Repartition by the salted doc_id hash (explicit, plan-visible).

    NB: repartition on the FINE-GRAINED ``hash(key, salt)`` — never on
    ``bucket_expr`` itself.  ``repartition(n, expr)`` re-hashes the
    expression value, so pre-coarsening to n bucket values would throw n
    balls into n bins (measured: 640 docs over 8 partitions landed in 5,
    worst 3x the mean).  ``bucket_expr`` remains the stable doc->bucket map
    for checkpoint/lineage bookkeeping; the physical partition spread comes
    from the raw salted hash."""
    if num_partitions is None:
        num_partitions = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        num_partitions = int(num_partitions)
    return df.repartition(num_partitions, F.hash(F.col(key), F.lit(salt)))
