"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and an LSH-bucketed
variant as the scale path.  All float math is done in DOUBLE after an explicit
element cast so Spark and the DuckDB oracle produce bit-identical results
(float32 -> float64 is exact; both engines then do sequential IEEE-double
accumulation over the same element order).

Scale notes (100 TB / 10^9 vectors):
* brute-force is broadcast(queries) x corpus — linear scans, no shuffle of the
  corpus; right for small query sets and exact evaluation;
* the sign-LSH variant buckets vectors by hyperplane sign bits so candidate
  generation is one shuffle on the bucket key; recall is tunable via bits;
* for real ANN at that scale you would persist an IVF index table
  (centroid_id -> vectors) — the bucketing here is the same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def as_double(vec_col) -> F.Column:
    return F.transform(vec_col, lambda x: x.cast("double"))


def dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                              lambda acc, v: acc + v))


def cosine(a, b) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the corpus.

    Returns (query_id, neighbor_id, cos_sim, rank); rounded to 6 dp with a
    deterministic (rounded-sim desc, neighbor asc) tie-break."""
    # norms are per-ROW quantities: stage them on each side so the pair loop
    # does one dot product + one multiply, not two extra norm scans per pair
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).select("query_id", "qv", norm(F.col("qv")).alias("qn"))
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("nv")
    ).select("neighbor_id", "nv", norm(F.col("nv")).alias("nn"))
    sims = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def sign_lsh_bucket(vec_col, planes: int = 8) -> F.Column:
    """Sign-LSH bucket id from ``planes`` pseudo-random hyperplanes.

    Hyperplane p's weight for dimension i is a deterministic +-1 derived from
    (p, i) — engine-reproducible without any stored model: sign of
    ((1 + (2p+3)*(i+7)) mod 13) - 6.

    ``vec_col`` should be a BOUND double-array column (stage ``as_double``
    in its own projection first): the vector is referenced twice per plane
    and higher-order functions get no CSE."""
    v = vec_col

    def plane_bit(p: int) -> F.Column:
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, i: x
                * (
                    (((F.lit(1) + F.lit(2 * p + 3) * (i + 7)) % 13 - 6) >= 0)
                    .cast("double") * 2.0 - 1.0
                ),
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        return F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))

    out = plane_bit(0)
    for p in range(1, planes):
        out = out + plane_bit(p)
    return out


def lsh_bucketed_neighbors(
    vectors: DataFrame, k: int = 3, planes: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k inside sign-LSH buckets: one shuffle on bucket."""
    # stage the double cast, then bucket + norm FROM the staged column —
    # each is per-row work done once, not once per plane / per pair
    b = (
        vectors.select(
            F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")
        )
        .select(
            "vid",
            "v",
            sign_lsh_bucket(F.col("v"), planes).alias("bucket"),
            norm(F.col("v")).alias("vn"),
        )
    )
    left = b.select(F.col("vid").alias("query_id"), F.col("v").alias("qv"),
                    F.col("vn").alias("qn"), "bucket")
    right = b.select(F.col("vid").alias("neighbor_id"), F.col("v").alias("nv"),
                     F.col("vn").alias("nn"), "bucket")
    sims = (
        left.join(right, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
