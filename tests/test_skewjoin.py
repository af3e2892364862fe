"""salted_join: the answer is the plain join, only the partitioning moves."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from table_extractor_spark.operators.skewjoin import salted_join


def _fixture(spark):
    # 'hot' carries 80% of the rows — the shape salting exists for
    rows = [(i, "hot" if i % 10 < 8 else ("warm" if i % 10 == 8 else "rare"), i * 3)
            for i in range(200)]
    big = spark.createDataFrame(rows, "rid long, k string, v long")
    small = spark.createDataFrame(
        [("hot", "H"), ("warm", "W"), ("cold", "C")], "k string, tag string"
    )
    return big, small


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_salted_equals_plain_join(spark):
    big, small = _fixture(spark)
    salted = salted_join(big, small, on="k", row_key="rid", n_salts=4)
    plain = big.join(small, "k", "inner")
    assert _rows(salted.select("rid", "k", "v", "tag")) == _rows(
        plain.select("rid", "k", "v", "tag")
    )


def test_left_salted_equals_plain_join(spark):
    big, small = _fixture(spark)
    salted = salted_join(big, small, on="k", row_key="rid", how="left", n_salts=4)
    plain = big.join(small, "k", "left")
    # 'rare' rows have no dim match and must survive exactly once with null
    assert _rows(salted.select("rid", "k", "v", "tag")) == _rows(
        plain.select("rid", "k", "v", "tag")
    )


def test_salt_reaches_the_shuffle_keys(spark):
    """With broadcast off, the exchange must hash on (key, salt) — that IS
    the skew mitigation; a salt dropped before the exchange is a no-op."""
    big, small = _fixture(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        plan = salted_join(
            big, small, on="k", row_key="rid", n_salts=4
        )._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert "__salt" in plan and "hashpartitioning" in plan
    exchanges = [
        ln for ln in plan.splitlines() if "hashpartitioning" in ln
    ]
    assert any("__salt" in ln for ln in exchanges), exchanges


def test_salts_are_deterministic_and_spread(spark):
    big, _ = _fixture(spark)
    salted = big.withColumn(
        "s", F.pmod(F.hash(F.col("rid"), F.lit(0x5A17)), F.lit(4))
    )
    a = {r["rid"]: r["s"] for r in salted.collect()}
    b = {r["rid"]: r["s"] for r in salted.repartition(13).collect()}
    assert a == b  # retries / repartitioning cannot re-salt
    assert len(set(a.values())) == 4  # the hot key actually spreads


def test_rejects_unsupported_shapes(spark):
    big, small = _fixture(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, on="k", row_key="rid", how="full")
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(big, small, on="k", row_key="rid", n_salts=0)
    with pytest.raises(ValueError, match="reserved"):
        salted_join(
            big.withColumn("__salt", F.lit(1)), small, on="k", row_key="rid"
        )


def _bloom_fixture(spark):
    big = spark.createDataFrame(
        [(i, i % 50, f"p{i}") for i in range(400)], "rid long, k long, pay string"
    )
    small = spark.createDataFrame(
        [(j,) for j in range(5)], "sk long"  # 10% of keys match
    )
    return big, small


def test_bloom_reduced_join_equals_plain_join_under_smj(spark):
    from table_extractor_spark.operators.skewjoin import bloom_reduced_join

    big, small = _bloom_fixture(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        reduced = bloom_reduced_join(big, small, big_key="k", small_key="sk")
        got = sorted(
            (r["rid"], r["k"], r["pay"], r["sk"]) for r in reduced.collect()
        )
        plan = reduced._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    plain = big.join(small, big.k == small.sk, "inner")
    want = sorted((r["rid"], r["k"], r["pay"], r["sk"]) for r in plain.collect())
    assert got == want  # no false negatives, FPs dropped by the exact join
    # the map-side screen is in the plan (the point of the operator)
    assert "array_contains" in plan


def test_bloom_screen_actually_reduces_the_shuffled_side(spark):
    from table_extractor_spark.operators.sketches import bloom_bits, bloom_probe
    from pyspark.sql import functions as F

    big, small = _bloom_fixture(spark)
    bloom = bloom_bits(
        small.select(F.col("sk").cast("string").alias("key")),
        key_col="key", bits=4096, hashes=3,
    )
    screened = bloom_probe(
        bloom, big.withColumn("__bk", F.col("k").cast("string")),
        key_col="__bk", bits=4096, hashes=3,
    ).filter(F.col("bloom_hit") == 1)
    n_big, n_screened = big.count(), screened.count()
    n_true = big.join(small, big.k == small.sk, "left_semi").count()
    assert n_true <= n_screened < n_big  # superset of matches, real cut
    assert n_screened <= n_true * 2  # FP rate sane at these parameters
