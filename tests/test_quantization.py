"""PQ: codes compress, ADC search recalls, training improves quantization."""

from __future__ import annotations

from pyspark.sql import functions as F

from table_extractor_spark.operators.quantization import (
    pq_encode,
    pq_search,
    pq_train,
)
from tests.test_similarity_ann import _clustered_corpus

SF = "/root/testdata/sf0.01"


def test_pq_codes_shape_and_compression(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 100
    )
    cb = pq_train(emb, m=8, k=16, kmeans_iters=1)
    assert cb.count() == 8 * 16
    codes = pq_encode(emb, cb, m=8)
    rows = codes.collect()
    assert len(rows) == 100
    # 64 floats -> 8 small ints per vector; every code within [0, k)
    assert all(len(r.codes) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r.codes)


def test_pq_adc_respects_cluster_structure(spark):
    """On well-separated clusters, same-cluster points quantize to (nearly)
    identical codes, so ADC distances within the true cluster are minimal —
    every returned neighbor must come from the query's own cluster.  (Exact
    top-3 recall is NOT the right yardstick here: within a cluster the ADC
    distances tie at ~0 by construction — quantization deliberately erases
    the intra-cell resolution the exact ranking uses.)"""
    emb = _clustered_corpus(spark)  # 8 well-separated clusters of 40, 16d
    queries = emb.filter(F.col("vec_id") % 40 < 2)

    cb = pq_train(emb, m=4, k=16, kmeans_iters=3)
    codes = pq_encode(emb, cb, m=4)
    got = pq_search(codes, cb, queries, topk=3, m=4).collect()
    assert len(got) == 16 * 3  # 2 queries x 8 clusters, 3 neighbors each
    for r in got:
        assert r.query_id // 40 == r.neighbor_id // 40, (
            f"neighbor from wrong cluster: {r}"
        )


def test_pq_training_reduces_quantization_error(spark):
    """Lloyd rounds must reduce total quantization error (sum of L2^2 from
    each subvector to its centroid) vs the lowest-id seeding."""
    from table_extractor_spark.operators.quantization import _l2sq, _subvecs

    emb = _clustered_corpus(spark)

    def qerr(iters):
        cb = pq_train(emb, m=4, k=8, kmeans_iters=iters)
        sub = _subvecs(emb, 4, "vec_id", "embedding")
        d = (
            sub.join(F.broadcast(cb), "subspace")
            .withColumn("d", _l2sq(F.col("sv"), F.col("cv")))
            .groupBy("vid", "subspace")
            .agg(F.min("d").alias("dmin"))
            .agg(F.sum("dmin"))
            .collect()[0][0]
        )
        return d

    e0, e3 = qerr(0), qerr(3)
    assert e3 < e0 * 0.8, (e0, e3)


def test_pq_train_sampled_recall_and_scan(spark):
    """train_sample_mod trains the codebooks on a hash-sample — the ADC
    cluster-recall contract must still hold, and the training scan must see
    only the sample (pinned by row count at the _subvecs stage)."""
    from table_extractor_spark.operators.quantization import _subvecs

    emb = _clustered_corpus(spark)  # 8 clusters x 40 vecs, 16d
    n = emb.count()
    mod = 2
    sample_n = emb.filter(
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) == 0
    ).count()
    assert 0 < sample_n < n  # the sample is real and proper

    cb = pq_train(emb, m=4, k=8, kmeans_iters=3, train_sample_mod=mod)
    assert cb.count() == 4 * 8

    # recall contract: every ADC neighbor still comes from the query's own
    # well-separated cluster, codebooks trained on 1/mod of the corpus
    queries = emb.filter(F.col("vec_id") % 40 < 2)
    codes = pq_encode(emb, cb, m=4)
    got = pq_search(codes, cb, queries, topk=3, m=4).collect()
    assert len(got) == 16 * 3
    for r in got:
        assert r.query_id // 40 == r.neighbor_id // 40, r

    # the training scan reads the sample, not the corpus: _subvecs over the
    # same hash-sample filter yields sample_n * m rows — what pq_train stages
    sub_rows = _subvecs(
        emb.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) == 0),
        4, "vec_id", "embedding",
    ).count()
    assert sub_rows == sample_n * 4


def test_quantized_pq_is_partition_invariant(spark):
    """quantize=1000 must make PQ training + encoding + ADC ranking
    bit-identical whatever the parallelism — the property that lets the
    driver's DuckDB oracle replay the training run (same contract as
    similarity.ivf_index; cluster-size independence)."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).filter(F.col("vec_id") < 200)
    queries = emb.filter(F.col("vec_id") < 5)

    def run(parts):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            src = emb.repartition(parts)
            cb = pq_train(src, m=8, k=16, kmeans_iters=2, quantize=1000)
            codes = pq_encode(src, cb, m=8, quantize=1000)
            ranked = pq_search(codes, cb, queries, topk=3, m=8,
                               quantize=1000)
            return (
                sorted((r.subspace, r.code, tuple(r.cv))
                       for r in cb.collect()),
                sorted((r.vid, tuple(r.codes)) for r in codes.collect()),
                sorted(tuple(r) for r in ranked.collect()),
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    assert run(3) == run(19)
