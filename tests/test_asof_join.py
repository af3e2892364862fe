"""As-of join semantics: inclusive backward match, per-group, NULL before."""

from __future__ import annotations

from table_extractor_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            ("u1", 5, "a"),   # before any right -> NULL
            ("u1", 10, "b"),  # equal ts -> inclusive match r10
            ("u1", 17, "c"),  # between r10 and r20 -> r10
            ("u1", 25, "d"),  # after r20 -> r20
            ("u2", 30, "e"),  # other group: only r7 before -> r7
        ],
        "user string, t long, name string",
    )
    right = spark.createDataFrame(
        [("u1", 10, 100), ("u1", 20, 200), ("u2", 7, 700), ("u3", 1, 999)],
        "user string, t long, rv long",
    )
    got = {
        r["name"]: r["right_rv"]
        for r in asof_join(
            left, right, on="t", by="user", value_cols=["rv"]
        ).collect()
    }
    assert got == {"a": None, "b": 100, "c": 100, "d": 200, "e": 700}


def test_asof_matches_exact_semantics_random(spark):
    """Randomized check vs an exact reimplementation (greatest right ts <=
    left ts per group), seeded and deterministic."""
    import random

    rng = random.Random(42)
    groups = ["g0", "g1", "g2"]
    left_rows = [
        (rng.choice(groups), rng.randint(0, 50), i) for i in range(60)
    ]
    right_rows = {}
    for _ in range(25):
        key = (rng.choice(groups), rng.randint(0, 50))
        right_rows[key] = rng.randint(100, 999)  # unique per (group, ts)
    left = spark.createDataFrame(left_rows, "g string, t long, lid long")
    right = spark.createDataFrame(
        [(g, t, v) for (g, t), v in right_rows.items()],
        "g string, t long, rv long",
    )

    got = {
        r["lid"]: r["right_rv"]
        for r in asof_join(left, right, on="t", by="g", value_cols=["rv"]).collect()
    }
    for g, t, lid in left_rows:
        candidates = [
            (rt, v) for (rg, rt), v in right_rows.items() if rg == g and rt <= t
        ]
        expected = max(candidates)[1] if candidates else None
        assert got[lid] == expected, (g, t, lid)


def test_asof_bad_direction_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        asof_join(
            spark.range(1), spark.range(1), on="id", by="id",
            value_cols=[], direction="nearest",
        )


def test_asof_forward_semantics(spark):
    """Forward = earliest right at-or-after, inclusive at ties, per-group."""
    left = spark.createDataFrame(
        [
            ("u1", 5, "a"),   # before r10 -> r10
            ("u1", 10, "b"),  # equal ts -> inclusive match r10
            ("u1", 17, "c"),  # between r10 and r20 -> r20
            ("u1", 25, "d"),  # after last right -> NULL
            ("u2", 3, "e"),   # other group: r7 after -> r7
        ],
        "user string, t long, name string",
    )
    right = spark.createDataFrame(
        [("u1", 10, 100), ("u1", 20, 200), ("u2", 7, 700), ("u3", 1, 999)],
        "user string, t long, rv long",
    )
    got = {
        r["name"]: r["right_rv"]
        for r in asof_join(
            left, right, on="t", by="user", value_cols=["rv"],
            direction="forward",
        ).collect()
    }
    assert got == {"a": 100, "b": 100, "c": 200, "d": None, "e": 700}


def test_asof_forward_matches_exact_semantics_random(spark):
    """Randomized check vs an exact reimplementation (least right ts >=
    left ts per group), seeded and deterministic."""
    import random

    rng = random.Random(43)
    groups = ["g0", "g1", "g2"]
    left_rows = [
        (rng.choice(groups), rng.randint(0, 50), i) for i in range(60)
    ]
    right_rows = {}
    for _ in range(25):
        key = (rng.choice(groups), rng.randint(0, 50))
        right_rows[key] = rng.randint(100, 999)
    left = spark.createDataFrame(left_rows, "g string, t long, lid long")
    right = spark.createDataFrame(
        [(g, t, v) for (g, t), v in right_rows.items()],
        "g string, t long, rv long",
    )
    got = {
        r["lid"]: r["right_rv"]
        for r in asof_join(
            left, right, on="t", by="g", value_cols=["rv"],
            direction="forward",
        ).collect()
    }
    for g, t, lid in left_rows:
        candidates = [
            (rt, v) for (rg, rt), v in right_rows.items() if rg == g and rt >= t
        ]
        expected = min(candidates)[1] if candidates else None
        assert got[lid] == expected, (g, t, lid)


def test_asof_forward_null_valued_right_row_matched(spark):
    """The struct-carrier NULL semantics hold in the forward direction too."""
    left = spark.createDataFrame(
        [("k", 5), ("k", 15), ("k", 25)], ["by", "t"]
    )
    right = spark.createDataFrame(
        [("k", 30, "late"), ("k", 20, None), ("k", 10, "early")],
        ["by", "t", "v"],
    )
    got = {
        r.t: r.right_v
        for r in asof_join(
            left, right, on="t", by="by", value_cols=["v"],
            direction="forward",
        ).collect()
    }
    assert got == {5: "early", 15: None, 25: "late"}


def test_null_valued_right_row_is_matched_not_skipped(spark):
    """A right row whose value column is NULL is still THE match for later
    left rows — last(ignorenulls) per column would reach past it to an older
    non-null value (ADVICE finding); the struct carrier must not."""
    from table_extractor_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 5), ("k", 15), ("k", 25)], ["by", "t"]
    )
    right = spark.createDataFrame(
        [("k", 0, "old"), ("k", 10, None), ("k", 20, "new")],
        ["by", "t", "v"],
    )
    got = {
        r.t: r.right_v
        for r in asof_join(
            left, right, on="t", by="by", value_cols=["v"]
        ).collect()
    }
    assert got == {5: "old", 15: None, 25: "new"}


def test_no_right_row_yields_null(spark):
    from table_extractor_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 1), ("q", 9)], ["by", "t"])
    right = spark.createDataFrame([("k", 5, 1.0)], ["by", "t", "v"])
    got = {
        (r.by, r.t): r.right_v
        for r in asof_join(
            left, right, on="t", by="by", value_cols=["v"]
        ).collect()
    }
    assert got == {("k", 1): None, ("q", 9): None}
