"""As-of join: for each left row, the latest right row at-or-before it.

Spark has no native ASOF JOIN (DuckDB/Pandas do).  The build rule for custom
operators is: (a) compose existing DataFrame ops when semantics allow, else
(b) applyInPandas.  As-of joins satisfy (a): union both sides tagged, order
by (key, time, side) with the right side FIRST at equal timestamps (>=
semantics), and forward-fill the right columns with
``last(..., ignorenulls)`` — one shuffle on the partition key, wholly
JVM-side, no ``pd.merge_asof`` grouped-map needed.

Scale: equivalent to one window over the unioned inputs — shuffles
|left|+|right| rows once on ``by``; skewed keys are AQE's problem like any
window.  The per-group pandas ``merge_asof`` alternative would cross into
Python and materialize whole groups; this stays in Tungsten.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join, inclusive: every left row keeps its columns plus,
    for each ``c`` in ``value_cols``, the value from the matched right row
    within the same ``by`` group (NULL when none exists):

    * ``direction='backward'`` (default): the LATEST right row with
      ``right[on] <= left[on]`` — DuckDB ``ASOF LEFT JOIN`` on
      ``l.by = r.by AND l.on >= r.on``;
    * ``direction='forward'``: the EARLIEST right row with
      ``right[on] >= left[on]`` — the mirror window (descending time,
      right-before-left at ties), same single shuffle.

    ``right`` must be unique per (by, on); pre-aggregate it otherwise (an
    as-of match against duplicate timestamps is ill-defined).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    # the fill-down carrier is ONE struct built only on right rows: a matched
    # right row whose value column is NULL then yields NULL (row identity is
    # the struct, never the individual columns), instead of last(ignorenulls)
    # per column reaching past it to an older non-null value — DuckDB ASOF
    # LEFT JOIN semantics
    tagged_left = left.withColumn("__side", F.lit(1)).withColumn(
        "__r", F.lit(None)
    )
    tagged_right = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right, allowMissingColumns=True)

    # right rows sort BEFORE left rows at the same timestamp => inclusive
    # match in both directions; forward simply walks time descending so the
    # "last right seen" is the earliest at-or-after
    order = F.col(on) if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(by)
        .orderBy(order, F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__f", F.last("__r", ignorenulls=True).over(w))
    out_cols = [c for c in left.columns] + [
        F.col(f"__f.{c}").alias(f"right_{c}") for c in value_cols
    ]
    return filled.filter(F.col("__side") == 1).select(*out_cols)
