"""ANN recall tests: the approximate paths must actually approximate."""

from __future__ import annotations

from pyspark.sql import functions as F

from table_extractor_spark.operators import similarity as S

SF = "/root/testdata/sf0.01"


def topk_sets(df):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def recall(approx: dict, exact: dict) -> float:
    hits = total = 0
    for q, exp in exact.items():
        got = approx.get(q, set())
        hits += len(got & exp)
        total += len(exp)
    return hits / total


def test_ivf_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = topk_sets(S.brute_force_topk(emb, queries, k=3))

    centroids, assignments = S.ivf_index(emb, n_centroids=16)
    approx = topk_sets(S.ivf_search(centroids, assignments, queries, k=3, nprobe=4))
    r = recall(approx, exact)
    assert r >= 0.5, f"IVF recall@3 too low: {r}"

    # probing everything must reproduce the exact result
    full = topk_sets(
        S.ivf_search(centroids, assignments, queries, k=3, nprobe=16)
    )
    assert full == exact


def test_ivf_assignments_partition_the_corpus(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _, assignments = S.ivf_index(emb, n_centroids=16)
    # every vector in exactly one list
    assert assignments.count() == emb.count()
    assert assignments.select("vid").distinct().count() == emb.count()


def test_sign_lsh_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    exact = topk_sets(S.brute_force_topk(emb, emb, k=3))
    approx = topk_sets(S.lsh_bucketed_neighbors(emb, k=3))
    r = recall(approx, exact)
    # these embeddings have weak neighbor structure (mean top-3 cosine 0.30);
    # ideal Gaussian hyperplanes reach ~0.68 at the same parameters
    assert r >= 0.4, f"sign-LSH recall@3 too low: {r}"


def _clustered_corpus(spark, D=16, K=8, N=40):
    """Deterministic well-separated clusters (no RNG: sin-derived centers
    and noise), where k-means training has a measurable effect."""
    import math

    rows = []
    for j in range(K):
        center = [math.sin(0.7 * j + 0.3 * i) for i in range(D)]
        for n in range(N):
            noise = [
                0.05 * math.sin(1.3 * j + 2.1 * n + 0.9 * i) for i in range(D)
            ]
            rows.append((j * N + n, [c + e for c, e in zip(center, noise)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_training_improves_ivf(spark):
    """Lloyd rounds must move the seed centroids (lowest-id picks, all from
    one cluster here) onto the real cluster structure: recall@3 at nprobe=1
    goes 0.875 -> 1.0 and the biggest inverted list shrinks (probe-cost
    bound — the actual 10^9-vector win)."""
    emb = _clustered_corpus(spark)
    queries = emb.filter(F.col("vec_id") % 40 < 2)
    exact = topk_sets(S.brute_force_topk(emb, queries, k=3))

    def run(iters):
        c, a = S.ivf_index(emb, n_centroids=8, kmeans_iters=iters)
        r = recall(topk_sets(S.ivf_search(c, a, queries, k=3, nprobe=1)), exact)
        max_list = (
            a.groupBy("centroid_id").count().agg(F.max("count")).collect()[0][0]
        )
        return r, max_list

    r0, ml0 = run(0)
    r3, ml3 = run(3)
    assert r3 == 1.0 and r3 > r0, (r0, r3)
    assert ml3 < ml0, (ml0, ml3)


def test_kmeans_balances_lists_on_weak_structure(spark):
    """On the near-random test embeddings k-means buys BALANCE (bounded list
    sizes -> bounded probe cost), not recall — pin that honestly."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _, a0 = S.ivf_index(emb, n_centroids=32, kmeans_iters=0)
    _, a3 = S.ivf_index(emb, n_centroids=32, kmeans_iters=3)
    m0 = a0.groupBy("centroid_id").count().agg(F.max("count")).collect()[0][0]
    m3 = a3.groupBy("centroid_id").count().agg(F.max("count")).collect()[0][0]
    assert m3 <= m0, (m0, m3)


def test_hash_sampled_training_matches_index_contract(spark):
    """train_sample_mod trains on a hash-sample but the FULL corpus is
    assigned: every vector still lands in exactly one list."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _, a = S.ivf_index(emb, n_centroids=16, kmeans_iters=2, train_sample_mod=4)
    assert a.count() == emb.count()
    assert a.select("vid").distinct().count() == emb.count()


def test_quantized_ivf_keeps_recall(spark):
    """The driver-oracled path (quantize=1000) must approximate as well as
    the float path — quantization error is ~1e-3 relative, far below the
    ANN structure's own approximation."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = topk_sets(S.brute_force_topk(emb, queries, k=3))
    c, a = S.ivf_index(emb, n_centroids=16, quantize=1000)
    approx = topk_sets(
        S.ivf_search(c, a, queries, k=3, nprobe=4, quantize=1000)
    )
    r = recall(approx, exact)
    assert r >= 0.5, f"quantized IVF recall@3 too low: {r}"


def test_quantized_lsh_keeps_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    exact = topk_sets(S.brute_force_topk(emb, emb, k=3))
    approx = topk_sets(S.lsh_bucketed_neighbors(emb, k=3, quantize=1000))
    r = recall(approx, exact)
    assert r >= 0.4, f"quantized sign-LSH recall@3 too low: {r}"


def test_quantized_ivf_is_partition_invariant(spark):
    """The point of quantize: training + assignment must be bit-identical
    whatever the parallelism (cluster-size independence — the same property
    the extraction bench pins via content hashes)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    def run(parts):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            c, a = S.ivf_index(emb.repartition(parts), n_centroids=16,
                               kmeans_iters=2, quantize=1000)
            cents = sorted(
                (r.centroid_id, tuple(r.cv)) for r in c.collect()
            )
            assign = sorted((r.vid, r.centroid_id) for r in a.collect())
            return cents, assign
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    assert run(2) == run(17)


def test_filtered_topk_prefilter_beats_postfilter(spark):
    """The pin that justifies the operator: on vectors where the true
    top-k are mostly OUTSIDE the filter, post-filtering the unfiltered
    top-k returns fewer than k matches while pre-filtering still returns
    a full k — and every pre-filtered neighbor satisfies the predicate."""
    from pyspark.sql import functions as F

    from table_extractor_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("label") == 1)
    pre = brute_force_topk(corpus, queries, k=3).collect()
    assert len(pre) == 10 * 3
    allowed = {
        r["vec_id"] for r in corpus.select("vec_id").collect()
    }
    assert all(r["neighbor_id"] in allowed for r in pre)
    # post-filter comparison: unfiltered top-3 then drop non-label-1 rows
    post = (
        brute_force_topk(emb, queries, k=3)
        .join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "label"),
            "neighbor_id",
        )
        .filter(F.col("label") == 1)
        .collect()
    )
    # ~10% of vectors carry label 1, so the unfiltered top-3 rarely does:
    # the post-filter result set must be strictly smaller (the recall bug)
    assert len(post) < len(pre)


def test_embedding_outlier_scores_plants_surface_first(spark, tmp_path):
    """A planted vector pointing AWAY from every cluster must rank as the
    #1 outlier.  The fixture keeps all 16 centroids BUSY (16 dense
    clusters, one seed vid in each — ids 0-15 are one point per cluster),
    because with free centroids k-means rightfully dedicates one to a
    singleton and its cosine-to-own-centroid becomes 1.0: the
    centroid-distance signal finds outliers only when k is small
    relative to the data's modes, which is the operator's documented
    regime."""
    import random

    rng = random.Random(7)
    rows = []
    # ids 0-15: one anchor per cluster (the deterministic seeds), then 14
    # more members per cluster
    for c in range(16):
        base = [0.0] * 16
        base[c] = 10.0
        rows.append((c, [v + rng.random() * 0.1 for v in base], c))
    nid = 16
    for c in range(16):
        base = [0.0] * 16
        base[c] = 10.0
        for _ in range(14):
            rows.append(
                (nid, [v + rng.random() * 0.1 for v in base], c)
            )
            nid += 1
    # the plant: opposite direction to every cluster axis
    rows.append((999, [-10.0] * 16, 99))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    d = str(tmp_path / "sf")
    emb.coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    from table_extractor_spark.plans import queries as Q

    out = Q.queries()["embedding_outlier_scores"](spark, d).collect()
    assert out[0]["vec_id"] == 999
    assert out[0]["rank"] == 1
    assert out[0]["cos_to_centroid"] < 0  # genuinely anti-aligned
    # every reported score is a valid cosine and ascending in rank
    scores = [r["cos_to_centroid"] for r in sorted(out, key=lambda r: r["rank"])]
    assert all(-1.0 <= s <= 1.0 for s in scores)
    assert scores == sorted(scores)
