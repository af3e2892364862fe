"""Z-order (Morton) layout keys + the file-pruning audit that justifies them.

Sorting a table by ONE column gives perfect min/max file pruning on that
column and none on any other.  Interleaving the bits of two columns into a
Morton key and laying files out by key ranges gives ~sqrt pruning on BOTH
dimensions — the standard multi-dimensional clustering move (Delta/Iceberg
``ZORDER BY``) for fact tables queried by more than one axis.

Everything here is plain integer arithmetic (shift/mask/or), JVM-side and
exactly replayable in any SQL engine — no UDF, no float.  The audit is the
honest part: rather than claiming locality, ``layout_stats`` computes the
per-file min/max envelope per dimension (exactly the statistics a parquet
footer/Iceberg manifest stores), from which a predicate's prunable-file
fraction is directly measurable — and comparable against a single-column
sort of the same data.

Scale shape: the key is a projection (zero shuffle); the audit is one
groupBy on the file id.  At 10^12 rows the real layout step is a
range-repartition by key — the key computation itself is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def zorder_key(x, y, bits: int = 16):
    """Morton-interleave the low ``bits`` of non-negative ints ``x`` (even
    positions) and ``y`` (odd positions) into one long.  Inputs must already
    be normalized to [0, 2^bits); values beyond that range would silently
    alias buckets, so normalize (rank, scale, or clamp) FIRST — the caller
    owns that mapping because it is what gives each dimension equal weight."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + F.shiftleft(
            F.shiftright(xc.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        key = key + F.shiftleft(
            F.shiftright(yc.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return key


def layout_stats(
    df: DataFrame,
    key,
    dims: dict,
    file_bits: int,
    total_bits: int = 32,
) -> DataFrame:
    """Per-file statistics for a layout that writes one file per
    ``key >> (total_bits - file_bits)`` prefix bucket: (file_id, n_rows,
    min_<d>, max_<d> for every named dimension expression).

    These are the envelopes a scan planner prunes with: a file is skipped
    for predicate ``d BETWEEN a AND b`` iff ``max_d < a OR min_d > b``.
    Prefix bucketing is map-side (no global sort); production layouts
    range-partition by the full key instead, which only tightens the
    envelopes — this audit is the conservative bound."""
    kc = (F.col(key) if isinstance(key, str) else key).cast("long")
    return (
        df.select(
            F.shiftright(kc, total_bits - file_bits).alias("file_id"),
            *[
                (F.col(e) if isinstance(e, str) else e).alias(f"__{n}")
                for n, e in dims.items()
            ],
        )
        .groupBy("file_id")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            *[
                agg(F.col(f"__{n}")).alias(f"{pre}_{n}")
                for n in dims
                for pre, agg in (("min", F.min), ("max", F.max))
            ],
        )
    )


def prunable_fraction(stats: DataFrame, dim: str, lo, hi) -> float:
    """Fraction of files a ``dim BETWEEN lo AND hi`` scan skips, from the
    ``layout_stats`` envelope table.  Driver-side over the (bounded,
    file-count-sized) stats frame — this is an audit, not a query path."""
    total = stats.count()
    if total == 0:
        return 0.0
    kept = stats.filter(
        ~((F.col(f"max_{dim}") < lo) | (F.col(f"min_{dim}") > hi))
    ).count()
    return (total - kept) / total
