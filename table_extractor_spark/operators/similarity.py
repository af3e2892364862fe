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


from .repartition import spread_for_compute  # noqa: E402  (shared defusal)


def cosine(a, b) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def quantized(vec_col, quantize: int) -> F.Column:
    """Integer-valued double copy of the vector: round(x * quantize).

    Every cross-ROW float reduction in ANN training (k-means cluster
    means) is order-nondeterministic in the last ulp under partial
    aggregation — and the driver's oracle gate compares ``repr(float)``.
    On integer-valued doubles those sums are IEEE-exact in ANY order (the
    magnitudes here are far below 2^53), so training, assignment, and
    probe selection become bit-reproducible across engines and partition
    counts; the ~1e-3-relative quantization error is noise next to the
    approximation the ANN structure itself introduces (recall pinned in
    tests either way)."""
    return F.transform(vec_col, lambda x: F.round(x * quantize))


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
    # the corpus side carries ALL the scoring work (|corpus| x |queries|
    # interpreted-HOF dot products): spread the RAW (id, float-vec) rows off
    # the scan's row-group partitioning before any per-row transform, so the
    # double cast / norm staging and the pair loop all run wide and the
    # exchange ships float32 payloads, not the widened doubles
    v = spread_for_compute(
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
        "neighbor_id",
    ).select(
        "neighbor_id", as_double(F.col(vec_col)).alias("nv")
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


def _assign_to_centroids(v: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vid, v, vn, q, qn, centroid_id): per-row argmax cosine of the
    TRAINING-space vector ``q`` against the broadcast centroid set — no
    shuffle of the vectors.  ``q``/``qn`` equal ``v``/``vn`` when no
    quantization is in play; the raw columns ride along untouched for the
    final exact scoring."""
    scored = v.crossJoin(F.broadcast(centroids)).select(
        "vid", "v", "vn", "q", "qn", "centroid_id",
        (dot(F.col("q"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("sim"),
    )
    w = Window.partitionBy("vid").orderBy(F.col("sim").desc(), "centroid_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vid", "v", "vn", "q", "qn", "centroid_id")
    )


def ivf_index(
    vectors: DataFrame, n_centroids: int = 16, kmeans_iters: int = 3,
    train_sample_mod: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
    quantize: int | None = None,
) -> tuple:
    """Build an IVF index: ``(centroids_df, assignments_df)``.

    Centroids are trained with ``kmeans_iters`` spherical-k-means (Lloyd)
    rounds: assign -> per-cluster element-wise mean -> iterate.  Seeding is
    deterministic (the ``n_centroids`` lowest ids).  Each round is pure
    DataFrame aggregation — assignment broadcasts the centroids (no corpus
    shuffle); the mean update posexplodes the TRAINING vectors (dim x rows)
    and aggregates per (centroid, position).  At 10^9 vectors train on a
    hash-sample via ``train_sample_mod`` (keep vid where
    pmod(hash(vid), mod) = 0 — the FAISS practice: a sample fixes the
    centroids, the full corpus is assigned exactly once at the end).  Only
    the k centroid arrays ever reach the driver between rounds (O(k*dim),
    truncates the iterative lineage like MLlib's k-means).

    Empty clusters keep their previous centroid.  Persist ``assignments`` as
    the index table, clustered by ``centroid_id`` so a probe reads only its
    lists.

    ``quantize`` switches training + assignment to the integer-valued
    vector copy (see ``quantized``), with the centroid update floored to
    integers — every reduction is then IEEE-exact regardless of engine,
    partition count, or summation order, which is what lets the driver's
    DuckDB oracle replay the whole training run hash-identically.  The
    ``assignments``' raw ``v``/``vn`` columns are untouched: final search
    scoring stays full-precision either way.
    """
    spark = vectors.sparkSession
    v = vectors.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")
    )
    qcol = quantized(F.col("v"), quantize) if quantize else F.col("v")
    v = v.select("vid", "v", qcol.alias("q")).select(
        "vid", "v", norm(F.col("v")).alias("vn"),
        "q", norm(F.col("q")).alias("qn"),
    )

    train = v
    if train_sample_mod > 1:
        train = v.filter(
            F.pmod(F.xxhash64("vid"), F.lit(train_sample_mod)) == 0
        )
    train = train.persist()

    centroids = (
        train.orderBy("vid").limit(n_centroids)
        .select(F.col("vid").alias("centroid_id"), F.col("q").alias("cv"))
    )
    cent_rows = centroids.select("centroid_id", "cv").collect()
    # floor(avg) over integer-valued doubles is exact (integer sum, one
    # deterministic division, one floor); plain avg keeps legacy behavior
    mean_expr = (
        F.floor(F.avg("x")).cast("double") if quantize else F.avg("x")
    )
    for _ in range(max(kmeans_iters, 0)):
        cent_df = spark.createDataFrame(
            [(r.centroid_id, r.cv) for r in cent_rows],
            "centroid_id long, cv array<double>",
        ).select("centroid_id", "cv", norm(F.col("cv")).alias("cn"))
        assigned = _assign_to_centroids(train, cent_df)
        means = (
            assigned.select("centroid_id", F.posexplode("q").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(mean_expr.alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.m,
                ).alias("cv")
            )
        )
        new_by_id = {r.centroid_id: r.cv for r in means.collect()}
        # empty cluster -> previous centroid survives
        cent_rows = [
            type(r)(centroid_id=r.centroid_id,
                    cv=new_by_id.get(r.centroid_id, r.cv))
            for r in cent_rows
        ]
    train.unpersist()

    centroids = spark.createDataFrame(
        [(r.centroid_id, r.cv) for r in cent_rows],
        "centroid_id long, cv array<double>",
    ).select("centroid_id", "cv", norm(F.col("cv")).alias("cn"))
    assigned = _assign_to_centroids(v, centroids)
    assignments = assigned.select("centroid_id", "vid", "v", "vn")
    return centroids, assignments


def ivf_probe_lists(
    centroids: DataFrame, queries: DataFrame, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    quantize: int | None = None,
) -> DataFrame:
    """(query_id, qv, qn, centroid_id): each query's ``nprobe`` nearest lists.

    nprobe x |queries| rows — broadcast-tiny by construction.  This is the
    coarse-quantizer output shared by ``ivf_search`` and IVF-PQ candidate
    pruning: anything keyed by ``centroid_id`` (assignments, clustered PQ
    codes) can be list-pruned with a broadcast join against this frame
    BEFORE any shuffle of the big side.

    With ``quantize``, list selection scores the integer-valued query copy
    against the (integer-valued) trained centroids — probe choice is a
    DISCRETE decision, so it gets the exact arithmetic; the returned
    ``qv``/``qn`` stay raw for the final scoring."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    qq = quantized(F.col("qv"), quantize) if quantize else F.col("qv")
    q = q.select("query_id", "qv", qq.alias("qq")).select(
        "query_id", "qv", norm(F.col("qv")).alias("qn"),
        "qq", norm(F.col("qq")).alias("qqn"),
    )
    probe_scored = q.crossJoin(F.broadcast(centroids)).select(
        "query_id", "qv", "qn", "centroid_id",
        (dot(F.col("qq"), F.col("cv")) / (F.col("qqn") * F.col("cn"))).alias("csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), "centroid_id")
    return (
        probe_scored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= nprobe)
        .select("query_id", "qv", "qn", "centroid_id")
    )


def ivf_search(
    centroids: DataFrame, assignments: DataFrame, queries: DataFrame,
    k: int = 3, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    quantize: int | None = None,
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest centroid lists only.

    Join order at scale: queries x centroids is broadcast-tiny; the candidate
    join hits only ~nprobe/n_centroids of the index.  ``quantize`` must
    match the value the index was built with (it controls probe-selection
    arithmetic only — final cosines are always computed on the raw
    vectors, rounded to 6 dp)."""
    probes = ivf_probe_lists(centroids, queries, nprobe, id_col, vec_col,
                             quantize)
    # broadcast the PROBES (|queries| x nprobe rows — small by construction),
    # never shuffle the index: the assignments table is the 10^9-vector side
    # and must stay where it is, list-pruned by the centroid filter
    cands = F.broadcast(probes).join(assignments, "centroid_id").filter(
        F.col("query_id") != F.col("vid")
    )
    sims = cands.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        F.round(
            dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("vn")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def sign_lsh_bucket(vec_col, planes: int = 8, table: int = 0) -> F.Column:
    """Sign-LSH bucket id from ``planes`` pseudo-random hyperplanes.

    Hyperplane p's weight for dimension i is a deterministic +-1 derived from
    (table, p, i) — engine-reproducible without any stored model: sign of
    ((1 + (2p+3+17*table)*(i+7)) mod 13) - 6.  Different ``table`` values
    give independent hash tables for multi-table LSH.

    ``vec_col`` should be a BOUND double-array column (stage ``as_double``
    in its own projection first): the vector is referenced twice per plane
    and higher-order functions get no CSE."""
    v = vec_col

    def plane_bit(p: int) -> F.Column:
        mult = 2 * p + 3 + 17 * table
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, i: x
                * (
                    (((F.lit(1) + F.lit(mult) * (i + 7)) % 13 - 6) >= 0)
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
    vectors: DataFrame, k: int = 3, planes: int = 4, tables: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    quantize: int | None = None,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE sign-LSH.

    A single hash table recalls only neighbors agreeing on every plane
    (measured 14% recall@3 at 8 planes on the test embeddings); ``tables``
    independent tables union their candidate sets — recall ~ 1-(1-p^planes)^L
    — while each table's buckets keep candidate generation far from the cross
    product.  One shuffle on (table, bucket); candidate pairs are deduped
    before the (single) cosine evaluation per pair.

    Tuning: fewer planes = bigger buckets = higher recall & more candidates;
    more tables = higher recall at linear candidate cost.  At the defaults
    the measured recall@3 on the test embeddings (mean top-3 cosine only
    0.30 — weak neighbor structure) is ~0.55, vs ~0.68 for IDEAL Gaussian
    hyperplanes at the same parameters.

    ``quantize`` computes the bucket ids on the integer-valued vector copy
    (exact projections -> engine-reproducible buckets; the DuckDB oracle
    replays them bit-for-bit); final cosines always use the raw vectors."""
    # stage the double cast, then buckets + norm FROM the staged column —
    # each is per-row work done once, not once per plane / per pair
    bucket_arr = F.array(
        *[sign_lsh_bucket(F.col("bv"), planes, table=t) for t in range(tables)]
    )
    staged = vectors.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")
    )
    bcol = quantized(F.col("v"), quantize) if quantize else F.col("v")
    b = (
        staged.select("vid", "v", bcol.alias("bv"))
        .select("vid", "v", bucket_arr.alias("buckets"), norm(F.col("v")).alias("vn"))
        .select(
            "vid", "v", "vn", F.posexplode("buckets").alias("tbl", "bucket")
        )
    )
    left = b.select(F.col("vid").alias("query_id"), "tbl", "bucket")
    right = b.select(F.col("vid").alias("neighbor_id"), "tbl", "bucket")
    pairs = (
        left.join(right, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    side = vectors.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")
    ).select("vid", "v", norm(F.col("v")).alias("vn"))
    sims = (
        pairs.join(
            side.select(F.col("vid").alias("query_id"), F.col("v").alias("qv"),
                        F.col("vn").alias("qn")),
            "query_id",
        )
        .join(
            side.select(F.col("vid").alias("neighbor_id"), F.col("v").alias("nv"),
                        F.col("vn").alias("nn")),
            "neighbor_id",
        )
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
