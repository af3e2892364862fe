"""Product quantization (PQ) for embedding columns — the memory layer of
billion-vector ANN (FAISS's IVF-PQ shape, rebuilt DataFrame-native).

A D-dim float vector becomes ``m`` small integer codes: split the vector
into ``m`` subspaces, k-means each subspace to ``k`` centroids, store the
per-subspace nearest-centroid ids.  At D=64 float32 -> m=8 uint8 codes the
index shrinks 32x; search uses asymmetric distance computation (ADC): per
query, a (subspace, code) -> squared-distance lookup table, so scoring a
candidate is m table lookups + a sum — never a full-dimension dot product.

Spark shapes (all DataFrame ops, no Python in the scoring path):

* training collects only the m*k codebook vectors to the driver per Lloyd
  round (like MLlib k-means; lineage stays flat);
* encoding broadcasts the codebooks and argmins per subspace — one shuffle
  on the vector id to assemble the code array;
* ADC search broadcasts the per-query distance TABLES (|queries| * m * k
  rows — tiny), joins them to the exploded codes, and aggregates — the
  codes table (the big side) is never shuffled; at scale, cluster it by a
  coarse IVF centroid and the probe prunes before the ADC join.

Citation: Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search" (TPAMI 2011) — public method, independent implementation.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .similarity import as_double, quantized


def _subvecs(
    vectors: DataFrame, m: int, id_col: str, vec_col: str,
    quantize: int | None = None,
) -> DataFrame:
    """(vid, subspace, sv): the vector split into m contiguous chunks.

    ``quantize`` splits the integer-valued copy instead (see
    ``similarity.quantized``): squared distances over it are sums of exact
    integers — reproducible in any engine / summation order, which is what
    the driver's DuckDB replay of PQ training and ADC scoring needs."""
    v = vectors.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")
    )
    if quantize:
        v = v.select("vid", quantized(F.col("v"), quantize).alias("v"))
    dim_chunk = (F.size("v") / m).cast("int")
    return v.select(
        "vid",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(F.col("v"), s * dim_chunk + 1, dim_chunk),
            )
        ).alias("subspace", "sv"),
    )


def _l2sq(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def pq_train(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    kmeans_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample_mod: int = 1,
    quantize: int | None = None,
) -> DataFrame:
    """Train codebooks: (subspace, code, cv array<double>).

    Per-subspace Lloyd; seeding is deterministic (lowest vids').  Only the
    m*k centroid arrays reach the driver between rounds.  With
    ``quantize``, training runs on the integer-valued vector copy and the
    centroid update floors to integers — every reduction becomes
    IEEE-exact in any order, so the driver's DuckDB oracle can replay the
    full training run hash-identically (same convention as
    ``similarity.ivf_index``).

    ``train_sample_mod`` > 1 trains on the deterministic hash-sample
    pmod(xxhash64(vid), mod) = 0 — same convention as ``ivf_index``.  At
    corpus scale codebooks converge on a fraction of the data (the FAISS
    practice: train on ~{thousands}·k vectors, encode the full corpus), so
    every Lloyd round scans |corpus|/mod rows instead of the corpus."""
    spark = vectors.sparkSession
    train = vectors
    if train_sample_mod > 1:
        train = vectors.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(train_sample_mod)) == 0
        )
    sub = _subvecs(train, m, id_col, vec_col, quantize).persist()
    mean_expr = (
        F.floor(F.avg("x")).cast("double") if quantize else F.avg("x")
    )

    seed = (
        sub.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("subspace").orderBy("vid")),
        )
        .filter(F.col("rk") <= k)
        .select("subspace", (F.col("rk") - 1).alias("code"), F.col("sv").alias("cv"))
    )
    rows: List[Tuple[int, int, list]] = [
        (r.subspace, r.code, r.cv) for r in seed.collect()
    ]
    for _ in range(max(kmeans_iters, 0)):
        cb = spark.createDataFrame(
            rows, "subspace int, code int, cv array<double>"
        )
        assigned = (
            sub.join(F.broadcast(cb), "subspace")
            .withColumn("d", _l2sq(F.col("sv"), F.col("cv")))
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("vid", "subspace").orderBy("d", "code")
                ),
            )
            .filter(F.col("rk") == 1)
        )
        means = (
            assigned.select("subspace", "code", F.posexplode("sv").alias("pos", "x"))
            .groupBy("subspace", "code", "pos")
            .agg(mean_expr.alias("mx"))
            .groupBy("subspace", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mx"))),
                    lambda s: s.mx,
                ).alias("cv")
            )
        )
        new = {(r.subspace, r.code): r.cv for r in means.collect()}
        rows = [(s, c, new.get((s, c), cv)) for s, c, cv in rows]
    sub.unpersist()
    return spark.createDataFrame(rows, "subspace int, code int, cv array<double>")


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = None,
) -> DataFrame:
    """(vid, codes array<int>): per-subspace nearest codebook centroid.
    ``quantize`` must match the value the codebooks were trained with."""
    sub = _subvecs(vectors, m, id_col, vec_col, quantize)
    best = (
        sub.join(F.broadcast(codebooks), "subspace")
        .withColumn("d", _l2sq(F.col("sv"), F.col("cv")))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("vid", "subspace").orderBy("d", "code")
            ),
        )
        .filter(F.col("rk") == 1)
        .select("vid", "subspace", "code")
    )
    return best.groupBy("vid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda s: s.code,
        ).alias("codes")
    )


def pq_search(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    topk: int = 3,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = None,
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, adc_dist, rank), smaller = closer.

    The per-query distance tables (queries x codebooks) broadcast; the codes
    table contributes one row per (vid, subspace) to the join and is never
    re-shuffled on anything but its own id for the final sum.  With
    ``quantize`` (matching the codebooks' training), distances are in
    quantized units — exact integers whose m-way sum is order-insensitive,
    making the ranking engine-reproducible."""
    qsub = _subvecs(queries, m, id_col, vec_col, quantize).withColumnRenamed(
        "vid", "query_id"
    )
    dist_tables = (
        qsub.join(F.broadcast(codebooks), "subspace")
        .select(
            "query_id", "subspace", "code",
            _l2sq(F.col("sv"), F.col("cv")).alias("d"),
        )
    )
    code_rows = codes.select(
        F.col("vid").alias("neighbor_id"),
        F.posexplode("codes").alias("subspace", "code"),
    )
    scored = (
        code_rows.join(F.broadcast(dist_tables), ["subspace", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("d"), 9).alias("adc_dist"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )
