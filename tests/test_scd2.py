"""scd2_build: change-log -> type-2 dimension episodes."""

from __future__ import annotations

from datetime import datetime

from table_extractor_spark.operators.scd import scd2_build


def _events(spark, rows):
    return spark.createDataFrame(
        [(e, datetime(2024, 1, d), u, s) for e, d, u, s in rows],
        "event_id long, ts timestamp, user_id long, state string",
    )


def _build(spark, rows):
    df = scd2_build(
        _events(spark, rows),
        entity_col="user_id",
        ts_col="ts",
        state_col="state",
        tiebreak="event_id",
    )
    return sorted(
        (r["user_id"], r["state"], r["valid_from"].day,
         r["valid_to"].day if r["valid_to"] else None, r["is_current"])
        for r in df.collect()
    )


def test_consecutive_repeats_collapse_into_episodes(spark):
    rows = [
        (1, 1, 7, "trial"),
        (2, 3, 7, "trial"),      # repeat: same episode
        (3, 5, 7, "paid"),
        (4, 9, 7, "paid"),       # repeat
        (5, 12, 7, "churned"),
    ]
    assert _build(spark, rows) == [
        (7, "churned", 12, None, True),
        (7, "paid", 5, 12, False),
        (7, "trial", 1, 5, False),
    ]


def test_state_flapping_yields_separate_episodes(spark):
    rows = [(1, 1, 7, "a"), (2, 2, 7, "b"), (3, 3, 7, "a")]
    assert _build(spark, rows) == [
        (7, "a", 1, 2, False),
        (7, "a", 3, None, True),
        (7, "b", 2, 3, False),
    ]


def test_intervals_tile_each_entity_timeline(spark):
    rows = [(i, i + 1, 7, s) for i, s in enumerate("aabbacbbca")] + [
        (100 + i, i + 1, 8, s) for i, s in enumerate("zzzyyx")
    ]
    eps = _build(spark, rows)
    for uid in (7, 8):
        mine = sorted(e for e in eps if e[0] == uid)
        by_from = sorted(mine, key=lambda e: e[2])
        # half-open intervals chain with no gap or overlap; one current
        for a, b in zip(by_from, by_from[1:]):
            assert a[3] == b[2]
        assert [e[4] for e in by_from] == [False] * (len(by_from) - 1) + [True]


def test_same_timestamp_ties_break_on_event_id(spark):
    # two changes at the identical ts: event_id order decides the episode
    # sequence, so the earlier event's state gets a zero-width interval
    rows = [(1, 1, 7, "a"), (2, 2, 7, "b"), (3, 2, 7, "c")]
    assert _build(spark, rows) == [
        (7, "a", 1, 2, False),
        (7, "b", 2, 2, False),
        (7, "c", 2, None, True),
    ]


def test_partition_invariance(spark):
    rows = [(i, (i * 7) % 28 + 1, i % 5, "s" + str(i % 3)) for i in range(60)]
    base = _build(spark, rows)
    df = _events(spark, rows).repartition(17)
    alt = scd2_build(df, "user_id", "ts", "state", "event_id")
    got = sorted(
        (r["user_id"], r["state"], r["valid_from"].day,
         r["valid_to"].day if r["valid_to"] else None, r["is_current"])
        for r in alt.collect()
    )
    assert got == base
