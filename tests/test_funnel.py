"""Sequential funnel semantics: strict ordering, ties, attrition."""

from __future__ import annotations

from datetime import datetime

import pytest

from table_extractor_spark.operators.funnel import funnel_counts


def _ts(minute):
    return datetime(2024, 1, 1, 12, minute)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, t, _ts(m)) for u, t, m in rows],
        "user_id string, event_type string, ts timestamp",
    )


def test_funnel_attrition_and_strict_order(spark):
    """u1 completes; u2 clicked BEFORE viewing (click must not count) and
    never clicks again; u3 views only; u4 does steps out of order entirely;
    u5 never views (excluded from step 1 even though they purchase)."""
    ev = _events(spark, [
        ("u1", "view", 1), ("u1", "click", 2), ("u1", "purchase", 3),
        ("u2", "click", 1), ("u2", "view", 2),
        ("u3", "view", 1),
        ("u4", "purchase", 1), ("u4", "click", 2), ("u4", "view", 3),
        ("u5", "purchase", 1), ("u5", "click", 2),
    ])
    got = {
        r["step"]: (r["step_idx"], r["n_users"], r["conversion_ppm"])
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert got["(all)"] == (0, 5, None)
    assert got["view"] == (1, 4, 800000)       # u1 u2 u3 u4
    assert got["click"] == (2, 1, 250000)      # only u1 clicks after viewing
    assert got["purchase"] == (3, 1, 1000000)  # u1 completes


def test_funnel_same_instant_tie_does_not_advance(spark):
    """A click at the SAME timestamp as the earliest view does not advance
    the funnel (strict >); a later click does."""
    ev = _events(spark, [
        ("a", "view", 1), ("a", "click", 1),
        ("b", "view", 1), ("b", "click", 1), ("b", "click", 2),
    ])
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(ev, ["view", "click"]).collect()
    }
    assert got["view"] == 2
    assert got["click"] == 1  # only b, via the minute-2 click


def test_funnel_earliest_qualifying_time_carries_forward(spark):
    """The step-k anchor is the EARLIEST qualifying event, so a later
    purchase between two clicks still counts (anchor = first valid click,
    not the last)."""
    ev = _events(spark, [
        ("x", "view", 1), ("x", "click", 2), ("x", "purchase", 3),
        ("x", "click", 4),
    ])
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert got["purchase"] == 1


def test_funnel_zero_survivor_step_reports_null_not_error(spark):
    """A step that kills everyone is a legitimate result: downstream rows
    report 0 users with NULL conversion (undefined from an empty base),
    never an ANSI divide-by-zero abort."""
    ev = _events(spark, [("u1", "view", 1), ("u2", "view", 2)])
    got = {
        r["step"]: (r["n_users"], r["conversion_ppm"])
        for r in funnel_counts(ev, ["view", "signup", "purchase"]).collect()
    }
    assert got["view"] == (2, 1_000_000)
    assert got["signup"] == (0, 0)
    assert got["purchase"] == (0, None)  # conversion from nobody: undefined


def test_funnel_validates_steps(spark):
    ev = _events(spark, [("u", "view", 1)])
    with pytest.raises(ValueError):
        funnel_counts(ev, [])
    with pytest.raises(ValueError):
        funnel_counts(ev, ["view", "view"])


# --- cohort retention ---------------------------------------------------


def test_cohort_retention_matrix(spark):
    """Two cohorts: a+b first active in period 0 (a returns in period 1,
    both active period 0); c first active in period 1 and returns in
    period 2.  Periods here are 1-minute buckets for fixture brevity."""
    from table_extractor_spark.operators.funnel import cohort_retention

    minute_us = 60 * 1_000_000
    ev = _events(spark, [
        ("a", "view", 0), ("a", "click", 1),
        ("b", "view", 0),
        ("c", "view", 1), ("c", "view", 2), ("c", "click", 2),
    ])
    got = {
        (r["cohort_period"] % 10_000_000, r["period_offset"]):
            (r["n_users"], r["cohort_size"], r["retention_ppm"])
        for r in cohort_retention(ev, period_us=minute_us).collect()
    }
    # normalize cohort ids relative to the smallest
    base = min(k[0] for k in got)
    got = {(k[0] - base, k[1]): v for k, v in got.items()}
    assert got == {
        (0, 0): (2, 2, 1_000_000),  # a, b active in their own period
        (0, 1): (1, 2, 500_000),    # only a returns
        (1, 0): (1, 1, 1_000_000),  # c's own period
        (1, 1): (1, 1, 1_000_000),  # c returns next period
    }


def test_cohort_retention_offset_zero_is_always_full(spark):
    from table_extractor_spark.operators.funnel import cohort_retention

    ev = _events(spark, [("u%d" % i, "view", i % 7) for i in range(20)])
    for r in cohort_retention(ev, period_us=60 * 1_000_000).collect():
        if r["period_offset"] == 0:
            assert r["retention_ppm"] == 1_000_000
        assert 0 <= r["retention_ppm"] <= 1_000_000
        assert r["n_users"] <= r["cohort_size"]


def test_cohort_retention_validates_period(spark):
    from table_extractor_spark.operators.funnel import cohort_retention

    ev = _events(spark, [("u", "view", 1)])
    with pytest.raises(ValueError):
        cohort_retention(ev, period_us=0)


def test_cohort_retention_floor_divides_pre_epoch_timestamps(spark):
    """Pre-1970 timestamps have NEGATIVE epoch micros; the period bucket
    must FLOOR (DuckDB's // semantics), not truncate toward zero (Spark's
    div) — otherwise the two engines disagree and offsets can go negative.
    One user first seen a day before the epoch, active again 8 days later:
    with weekly periods the cohort is period -1 and the offset is +2
    (floor), never 0/-something (truncate)."""
    from datetime import datetime

    from table_extractor_spark.operators.funnel import cohort_retention

    ev = spark.createDataFrame(
        [
            ("u", "view", datetime(1969, 12, 31)),
            ("u", "view", datetime(1970, 1, 8)),
        ],
        "user_id string, event_type string, ts timestamp",
    )
    rows = {
        (r.cohort_period, r.period_offset): (r.n_users, r.retention_ppm)
        for r in cohort_retention(ev).collect()
    }
    # floor(-86400e6 / week) = -1; floor(7*86400e6 / week) = 1 -> offset 2
    assert rows == {(-1, 0): (1, 1000000), (-1, 2): (1, 1000000)}
