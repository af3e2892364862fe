"""Range join: point-in-interval equi-bucketized (the scale path).

A naive ``l.v BETWEEN r.lo AND r.hi`` theta-join plans as a (broadcast)
nested-loop — fine when one side is tiny, quadratic otherwise.  The
standard scale rewrite buckets the domain with width ``w``:

* each right interval explodes to every bucket it overlaps
  (``floor(lo/w) .. floor(hi/w)`` — cheap when intervals are short
  relative to ``w``);
* each left point maps to exactly one bucket;
* equi-join on the bucket (hash join, one shuffle each side), then refine
  with the exact predicate.

Same results as the theta-join, hash-join economics.  Pick ``w`` around
the typical interval length: smaller buckets = fewer false candidates but
more interval duplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    point: str,
    lo: str,
    hi: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right rows where ``lo <= point < hi``.

    Column names must be disjoint between the two frames apart from the
    join machinery; the output carries all columns of both.

    ``how``: 'inner' or 'left'.  A left join CANNOT be pushed through the
    bucket join directly — the exact refine filter after an outer join would
    drop NULL-extended and bucket-matched-but-refine-failed left rows,
    silently degrading to inner — so left semantics refine the inner matches
    first, then union back the unmatched left rows with NULL right columns
    (anti-join on a per-row id)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"bucketed_range_join supports how='inner'|'left', got {how!r}"
        )
    w = float(bucket_width)
    r_exploded = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / w).cast("long"),
                # hi is exclusive: a degenerate [x, x) interval still lands
                # in x's bucket; otherwise stop at the bucket containing the
                # last included point
                F.greatest(
                    F.floor(F.col(lo) / w),
                    F.ceil(F.col(hi) / w) - 1,
                ).cast("long"),
            )
        ),
    )
    l_bucketed = left.withColumn("__bucket", F.floor(F.col(point) / w).cast("long"))
    if how == "left":
        # per-row identity for the anti-join; lives only inside this plan
        l_bucketed = l_bucketed.withColumn("__lid", F.monotonically_increasing_id())
    inner = l_bucketed.join(r_exploded, on="__bucket", how="inner").filter(
        (F.col(point) >= F.col(lo)) & (F.col(point) < F.col(hi))
    )
    if how == "inner":
        return inner.drop("__bucket")
    unmatched = l_bucketed.join(
        inner.select("__lid"), on="__lid", how="left_anti"
    ).drop("__bucket", "__lid")
    return inner.drop("__bucket", "__lid").unionByName(
        unmatched, allowMissingColumns=True
    )
