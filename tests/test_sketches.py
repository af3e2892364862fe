"""Sketch semantics: count-min (overestimate-only, exactness when the
sketch is collision-free, determinism across partitioning) and
HyperLogLog (accuracy bound, shard-merge identity, saturation guard)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from table_extractor_spark.operators.sketches import (
    countmin_estimate,
    countmin_sketch,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _keys(spark, rows):
    return spark.createDataFrame([(k,) for k in rows], ["key"])


def test_countmin_never_underestimates(spark):
    stream = (["apple"] * 7) + (["banana"] * 3) + ["cherry"] + (
        [f"noise{i}" for i in range(50)]
    )
    keys = _keys(spark, stream)
    sk = countmin_sketch(keys, depth=4, width=16)  # narrow: force collisions
    q = _keys(spark, ["apple", "banana", "cherry"]).distinct()
    est = {r.key: r.est_cnt for r in countmin_estimate(
        sk, q, depth=4, width=16
    ).collect()}
    assert est["apple"] >= 7
    assert est["banana"] >= 3
    assert est["cherry"] >= 1


def test_countmin_exact_when_wide_enough(spark):
    stream = (["a"] * 5) + (["b"] * 2) + ["c"]
    keys = _keys(spark, stream)
    # 3 distinct keys in a 4x256 sketch: collision-free with near certainty
    sk = countmin_sketch(keys)
    q = _keys(spark, ["a", "b", "c"])
    est = {r.key: r.est_cnt for r in countmin_estimate(sk, q).collect()}
    assert est == {"a": 5, "b": 2, "c": 1}


def test_countmin_sketch_is_partition_invariant(spark):
    stream = [f"w{i % 17}" for i in range(300)]
    one = countmin_sketch(_keys(spark, stream).coalesce(1))
    many = countmin_sketch(_keys(spark, stream).repartition(13))
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, many.collect())
    )


def test_countmin_sketch_size_is_bounded(spark):
    # 500 distinct keys, d=4 w=32: the sketch can never exceed d*w cells
    keys = _keys(spark, [f"k{i}" for i in range(500)])
    sk = countmin_sketch(keys, depth=4, width=32)
    assert sk.count() <= 4 * 32
    assert sk.agg(F.sum("cnt")).collect()[0][0] == 500 * 4


def _dup_keys(spark, n_distinct, reps=3):
    return spark.range(n_distinct * reps).select(
        F.concat(
            F.lit("key_"), (F.col("id") % n_distinct).cast("string")
        ).alias("key")
    )


def test_hll_estimate_within_error_bound(spark):
    # m=256 -> sigma ~ 1.04/sqrt(256) = 6.5%; 2000 distinct keys (with
    # duplicates, which MAX makes invisible) must estimate within 3 sigma
    est = hll_estimate(hll_sketch(_dup_keys(spark, 2000))).collect()[0]
    assert est.m == 256
    assert abs(est.est_distinct - 2000) / 2000 < 0.20
    # deterministic: this exact corpus always yields this exact estimate
    assert est.est_distinct == 2017


def test_hll_sketch_is_partition_invariant(spark):
    keys = _dup_keys(spark, 500)
    one = hll_sketch(keys.coalesce(1)).orderBy("bucket").collect()
    many = hll_sketch(keys.repartition(13)).orderBy("bucket").collect()
    assert one == many


def test_hll_shard_merge_equals_whole_corpus_sketch(spark):
    # the 100-TB shape: each shard sketches independently; bucket-wise
    # max over the m-row tables must equal the whole-corpus sketch
    keys = _dup_keys(spark, 1200)
    shards = [
        hll_sketch(keys.filter(F.pmod(F.crc32(F.col("key")), F.lit(3)) == i))
        for i in range(3)
    ]
    merged = hll_merge(*shards).orderBy("bucket").collect()
    whole = hll_sketch(keys).orderBy("bucket").collect()
    assert merged == whole


def test_hll_empty_stream_estimates_zero(spark):
    keys = _keys(spark, ["x"]).filter(F.lit(False))
    est = hll_estimate(hll_sketch(keys)).collect()[0]
    assert (est.v_empty, est.est_distinct) == (256, 0)


def test_hll_grouped_matches_per_group_ungrouped(spark):
    # grouped sketch/estimate == running the ungrouped pipeline on each
    # group's slice — and a constant group reproduces the global numbers
    from table_extractor_spark.operators.sketches import (
        hll_estimate_grouped,
        hll_sketch_grouped,
    )

    keys = _dup_keys(spark, 900).withColumn(
        "grp", F.pmod(F.crc32(F.col("key")), F.lit(2)).cast("string")
    )
    grouped = {
        r.grp: (r.s_scaled, r.v_empty, r.est_distinct)
        for r in hll_estimate_grouped(
            hll_sketch_grouped(keys, "grp"), "grp"
        ).collect()
    }
    assert set(grouped) == {"0", "1"}
    for g in ("0", "1"):
        solo = hll_estimate(
            hll_sketch(keys.filter(F.col("grp") == g))
        ).collect()[0]
        assert grouped[g] == (solo.s_scaled, solo.v_empty, solo.est_distinct)


def test_hll_estimate_guards_int64_alpha_budget(spark):
    # registers saturated at the cap == cardinality ~2^40 * m: the alpha
    # multiply would leave int64, so the job must FAIL, never wrap
    saturated = spark.range(256).select(
        F.col("id").alias("bucket"), F.lit(40).alias("rho")
    )
    with pytest.raises(Exception, match="alpha budget"):
        hll_estimate(saturated, buckets=256, rho_cap=40).collect()


# --- Bloom membership --------------------------------------------------------


def test_bloom_has_no_false_negatives(spark):
    from table_extractor_spark.operators.sketches import bloom_bits, bloom_probe

    members = _keys(spark, [f"m{i}" for i in range(200)])
    # narrow filter: plenty of collisions, yet every member must hit
    bloom = bloom_bits(members, bits=256, hashes=3)
    hits = bloom_probe(bloom, members, bits=256, hashes=3)
    assert hits.filter(F.col("bloom_hit") == 0).count() == 0


def test_bloom_miss_proves_novelty_and_fp_rate_is_bounded(spark):
    from table_extractor_spark.operators.sketches import bloom_bits, bloom_probe

    members = _keys(spark, [f"m{i}" for i in range(200)])
    outsiders = _keys(spark, [f"x{i}" for i in range(400)])
    bloom = bloom_bits(members, bits=4096, hashes=3)
    hits = bloom_probe(bloom, outsiders, bits=4096, hashes=3)
    fp = hits.filter(F.col("bloom_hit") == 1).count()
    # fill ratio 1-e^(-600/4096) ~ 13.6% -> FP ~ 0.25%; 3 sigma headroom
    assert fp <= 12
    # and a miss is a PROOF of absence: nothing in members may miss
    assert bloom_probe(bloom, members, bits=4096, hashes=3).filter(
        F.col("bloom_hit") == 0
    ).count() == 0


def test_bloom_bits_bounded_and_partition_invariant(spark):
    from table_extractor_spark.operators.sketches import bloom_bits

    members = _keys(spark, [f"m{i}" for i in range(3000)])
    one = bloom_bits(members.coalesce(1), bits=512, hashes=4)
    many = bloom_bits(members.repartition(13), bits=512, hashes=4)
    assert one.count() <= 512
    assert sorted(r.bit for r in one.collect()) == sorted(
        r.bit for r in many.collect()
    )


# --- Histogram quantile brackets ---------------------------------------------


def test_histogram_brackets_contain_the_exact_quantile(spark):
    from table_extractor_spark.operators.sketches import (
        histogram_quantile_brackets,
        histogram_sketch,
    )

    vals = spark.range(1, 1001).select(F.col("id").alias("val"))  # 1..1000
    hist = histogram_sketch(vals, bin_width=8)
    probs = (250_000, 500_000, 750_000, 990_000)
    br = {
        r.p_ppm: (r.est_lo, r.est_hi)
        for r in histogram_quantile_brackets(hist, probs).collect()
    }
    # exact p-quantile of 1..1000 = ceil(p * 1000)
    for p in probs:
        exact = -(-p * 1000 // 1_000_000)
        lo, hi = br[p]
        assert lo <= exact <= hi, (p, lo, exact, hi)
        assert hi - lo == 7  # one bin wide: a hard bracket


def test_histogram_sketch_bounded_and_partition_invariant(spark):
    from table_extractor_spark.operators.sketches import histogram_sketch

    vals = spark.range(100_000).select((F.col("id") % 97).alias("val"))
    one = histogram_sketch(vals.coalesce(1), bin_width=8)
    many = histogram_sketch(vals.repartition(17), bin_width=8)
    assert one.count() <= 97 // 8 + 1
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, many.collect())
    )


# --- Count-min screened heavy hitters ---------------------------------------


def test_heavy_hitters_complete_and_exact_under_collisions(spark):
    from table_extractor_spark.operators.sketches import countmin_heavy_hitters

    stream = (
        (["hot1"] * 20) + (["hot2"] * 12) + (["warm"] * 5)
        + [f"cold{i}" for i in range(300)]
    )
    keys = _keys(spark, stream)
    # deliberately narrow: heavy collision noise in the screen — yet no
    # true hitter may be lost (est >= true) and every reported count is
    # EXACT (the second pass), with est_cnt >= cnt visible per row
    got = {
        r.key: (r.est_cnt, r.cnt)
        for r in countmin_heavy_hitters(
            keys, threshold=10, depth=4, width=32
        ).collect()
    }
    assert set(got) == {"hot1", "hot2"}
    assert got["hot1"][1] == 20 and got["hot2"][1] == 12
    assert all(est >= cnt for est, cnt in got.values())


def test_heavy_hitters_empty_when_nothing_is_hot(spark):
    from table_extractor_spark.operators.sketches import countmin_heavy_hitters

    keys = _keys(spark, [f"k{i}" for i in range(100)])
    assert countmin_heavy_hitters(keys, threshold=2).count() == 0


def test_grouped_histogram_matches_per_group_ungrouped(spark):
    from table_extractor_spark.operators.sketches import (
        histogram_quantile_brackets,
        histogram_quantile_brackets_grouped,
        histogram_sketch,
        histogram_sketch_grouped,
    )

    vals = spark.range(1, 2001).select(
        F.col("id").alias("val"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("grp"),
    )
    probs = (250_000, 500_000, 750_000)
    grouped = {
        (r.grp, r.p_ppm): (r.est_lo, r.est_hi)
        for r in histogram_quantile_brackets_grouped(
            histogram_sketch_grouped(vals, "grp"), "grp", probs
        ).collect()
    }
    for g in ("even", "odd"):
        solo = {
            r.p_ppm: (r.est_lo, r.est_hi)
            for r in histogram_quantile_brackets(
                histogram_sketch(vals.filter(F.col("grp") == g)), probs
            ).collect()
        }
        for p in probs:
            assert grouped[(g, p)] == solo[p]


def test_hll_grouped_handles_null_group(spark):
    # a NULL group is a group like any other: its registers must not be
    # zeroed by a null-unsafe spine join
    from table_extractor_spark.operators.sketches import (
        hll_estimate_grouped,
        hll_sketch_grouped,
    )

    keys = _dup_keys(spark, 300).withColumn(
        "grp",
        F.when(F.crc32(F.col("key")) % 2 == 0, "a").otherwise(F.lit(None)),
    )
    grouped = {
        r.grp: r.est_distinct
        for r in hll_estimate_grouped(
            hll_sketch_grouped(keys, "grp"), "grp"
        ).collect()
    }
    assert set(grouped) == {"a", None}
    solo_null = hll_estimate(
        hll_sketch(keys.filter(F.col("grp").isNull()))
    ).collect()[0]
    assert grouped[None] == solo_null.est_distinct
    assert grouped[None] > 0


def test_countmin_estimate_returns_zero_for_never_seen_keys(spark):
    # a never-touched cell is a ZERO counter: probing keys outside the
    # stream must yield est_cnt = 0 rows, not dropped rows or a MIN over
    # only the cells that happen to exist
    stream = _keys(spark, ["a", "b", "c"])
    sk = countmin_sketch(stream)
    probes = _keys(spark, ["a", "ghost1", "ghost2"])
    got = {r.key: r.est_cnt for r in countmin_estimate(sk, probes).collect()}
    assert set(got) == {"a", "ghost1", "ghost2"}
    assert got["a"] >= 1
    assert got["ghost1"] == 0 and got["ghost2"] == 0


def test_hll_inclusion_exclusion_intersection(spark):
    """|A∩B| ≈ est(A)+est(B)-est(merge): identical slices recover the
    slice estimate exactly; disjoint slices give a union at least as
    large as either side and a small (possibly negative) intersection."""
    a = _keys(spark, [f"w{i}" for i in range(300)])
    est = lambda sk: hll_estimate(sk).collect()[0].est_distinct  # noqa: E731

    sa = hll_sketch(a, key_col="key")
    # identical slices: merge == each sketch, intersection == estimate
    assert est(hll_merge(sa, sa)) == est(sa)
    assert est(sa) + est(sa) - est(hll_merge(sa, sa)) == est(sa)

    b = _keys(spark, [f"x{i}" for i in range(300)])  # disjoint key space
    sb = hll_sketch(b, key_col="key")
    ea, eb, eu = est(sa), est(sb), est(hll_merge(sa, sb))
    assert eu >= max(ea, eb)
    # disjoint truth is 0; the signed estimate must sit inside a few
    # compounded sigmas (3 * 1.04/sqrt(256) per sketch, ~20% of 600)
    assert abs(ea + eb - eu) <= 0.2 * (ea + eb)


# --- count-min join-size estimate --------------------------------------------


def test_join_size_estimate_upper_bounds_truth(spark):
    from table_extractor_spark.operators.sketches import countmin_join_size

    a = _keys(spark, ["x"] * 5 + ["y"] * 3 + ["z"])
    b = _keys(spark, ["x"] * 2 + ["y"] * 4 + ["w"] * 7)
    true_size = 5 * 2 + 3 * 4  # x pairs + y pairs; z/w match nothing
    est = countmin_join_size(a, b).collect()[0]["est_join_rows"]
    assert est >= true_size
    # 3 keys in 256 cells: no collisions at this scale -> exact
    assert est == true_size


def test_join_size_estimate_selfjoin_and_empty_overlap(spark):
    from table_extractor_spark.operators.sketches import countmin_join_size

    a = _keys(spark, ["a"] * 4 + ["b"] * 2)
    self_est = countmin_join_size(a, a).collect()[0]["est_join_rows"]
    assert self_est == 4 * 4 + 2 * 2  # sum of squares, collision-free here

    disjoint = countmin_join_size(
        a, _keys(spark, ["c", "d"])
    ).collect()[0]["est_join_rows"]
    assert disjoint == 0


def test_join_size_estimate_guard_fails_loudly(spark):
    from table_extractor_spark.operators.sketches import countmin_join_size

    a = _keys(spark, ["k"] * 10)
    with pytest.raises(Exception, match="int64 budget"):
        countmin_join_size(a, a, sum_budget=5).collect()
