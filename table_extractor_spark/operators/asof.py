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
    """Left as-of join (``direction='backward'``, inclusive): every left row
    keeps its columns plus, for each ``c`` in ``value_cols``, the value from
    the latest right row with ``right[on] <= left[on]`` within the same
    ``by`` group (NULL when none exists) — DuckDB ``ASOF LEFT JOIN`` on
    ``l.by = r.by AND l.on >= r.on`` semantics.

    ``right`` must be unique per (by, on); pre-aggregate it otherwise (an
    as-of match against duplicate timestamps is ill-defined).
    """
    if direction != "backward":
        raise NotImplementedError("only backward (latest at-or-before) as-of")

    tagged_left = left.withColumn("__side", F.lit(1))
    for c in value_cols:
        tagged_left = tagged_left.withColumn(f"__r_{c}", F.lit(None))
    tagged_right = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right, allowMissingColumns=True)

    # right rows sort BEFORE left rows at the same timestamp => inclusive <=
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for c in value_cols:
        filled = filled.withColumn(
            f"__f_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    out_cols = [c for c in left.columns] + [
        F.col(f"__f_{c}").alias(f"right_{c}") for c in value_cols
    ]
    return filled.filter(F.col("__side") == 1).select(*out_cols)
