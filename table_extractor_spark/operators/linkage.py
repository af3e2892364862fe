"""Record linkage: blocked fuzzy-match candidate pairs + edit-distance verify.

Entity resolution's scale problem is the quadratic candidate space; the
classical fix is BLOCKING: records only compare within equal values of a
cheap blocking key (brand+size, zip code, soundex, first-3-chars...), so
the all-pairs O(n^2) collapses to sum-of-squared-block-sizes — a plain
equi-self-join Catalyst executes as a hash join.  The expensive verifier
(Levenshtein here — JVM built-in, also in every warehouse, so oracles
replay it exactly) runs only inside blocks, inside the join projection.

Same family as the LSH dedup path (`operators/dedup`): blocking ≈ LSH
banding for structured records, with the same failure mode — a degenerate
block (one brand covering half the catalog) re-creates the quadratic
blowup.  Mirror guard: ``max_block_size`` drops oversized blocks into an
auditable report instead of letting one hot block own the stage.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, functions as F


def blocked_match_pairs(
    records: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    max_distance: int,
    max_block_size: int | None = None,
) -> DataFrame:
    """(a_id, b_id, dist): unordered within-block pairs with
    ``levenshtein(text_a, text_b) <= max_distance``, each pair once
    (a_id < b_id).  With ``max_block_size``, records in blocks larger than
    the cap are excluded (see ``oversized_blocks`` for the audit)."""
    base = records.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__text"),
    )
    if max_block_size is not None:
        # Broadcast the OVERSIZED block list as a LEFT ANTI join, never the
        # under-cap list as a semi join: the under-cap key set is
        # corpus-linear (>= n/max_block_size keys when blocks are full — a
        # 10^12-record corpus would OOM the broadcast in exactly the guard
        # path built for huge data), while the oversized list is bounded by
        # the number of HOT blocks, tiny by definition (it is the same
        # frame ``oversized_blocks`` reports).  Guide §3.1: broadcast the
        # side that is small by construction, not by luck.
        over = (
            base.groupBy(*block_cols)
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_block_size)
            .drop("__n")
        )
        base = base.join(F.broadcast(over), list(block_cols), "left_anti")
    a = base.select(
        *block_cols,
        F.col("__id").alias("a_id"),
        F.col("__text").alias("__a_text"),
    )
    b = base.select(
        *block_cols,
        F.col("__id").alias("b_id"),
        F.col("__text").alias("__b_text"),
    )
    dist = F.levenshtein(F.col("__a_text"), F.col("__b_text"))
    return (
        a.join(b, list(block_cols), "inner")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("dist", dist.cast("long"))
        .filter(F.col("dist") <= max_distance)
        .select("a_id", "b_id", "dist")
    )


def oversized_blocks(
    records: DataFrame,
    block_cols: Sequence[str],
    max_block_size: int,
) -> DataFrame:
    """(block_cols..., n_records): the blocks the cap excluded — the audit
    that makes the drop observable instead of silent (same contract as the
    LSH `lsh_oversized_buckets` report)."""
    return (
        records.groupBy(*block_cols)
        .agg(F.count("*").cast("long").alias("n_records"))
        .filter(F.col("n_records") > max_block_size)
    )
