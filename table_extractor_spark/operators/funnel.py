"""Sequential funnel analysis over an event stream.

The classic product/ops question — of the users who did step 1, how many
went ON to do step 2, then step 3 — under STRICT ordering semantics:
step k+1 counts only events strictly after the user's earliest
qualifying step-k event (the standard funnel definition, e.g. ClickHouse
``windowFunnel`` / BigQuery funnel patterns; ties at the same timestamp
do NOT advance the funnel, so the result is deterministic under any
event order).

Scale shape: one filtered aggregation per step over the event table,
each joined to the (user, earliest-qualifying-time) table of the
PREVIOUS step — the per-step user table shrinks monotonically, the join
key is always the user id (partitioning reused across steps, AQE picks
broadcast when a step's survivors fit), and no window function ever runs
over the raw event table.  The final report is one row per step — the
only driver-sized object.  Each step re-scans the event table, but every
scan is column-pruned to (user, type, ts) and predicate-pushed on the
step's type; callers running many funnels over a hot event table should
persist that 3-column projection once upstream instead of asking this
operator to cache 10^12 raw events.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

PPM = 1_000_000
WEEK_US = 7 * 86_400 * 1_000_000


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = WEEK_US,
) -> DataFrame:
    """(cohort_period, period_offset, n_users, cohort_size, retention_ppm):
    the classic cohort-retention matrix — users bucketed by the period of
    their FIRST event, each later period reporting how many of them were
    active again.  Periods are integer FLOOR divisions of epoch
    microseconds (the engine's timestamp-parity convention), so both
    engines bucket identically with no calendar/timezone functions
    involved.  Floor semantics matter for pre-1970 timestamps: Spark's
    ``div`` truncates toward zero while DuckDB's ``//`` floors, so the
    bucket expression subtracts ``pmod`` first — the dividend becomes
    exactly divisible and the two semantics coincide for any sign.

    Shape: one per-user min (partial-agg'd), one user-key join back to
    the events (co-partitioned with the groupBys that follow), one
    distinct over (user, cohort, offset) — bounded by active user-periods,
    not events — then two bounded-key aggregations.  retention_ppm is the
    integer ppm share of the cohort active at that offset; offset 0 is
    1_000_000 by construction (every user is active in their own first
    period)."""
    if period_us < 1:
        raise ValueError(f"period_us must be >= 1, got {period_us}")
    # parquet timestamps load as TIMESTAMP_NTZ; the session runs UTC, so
    # the cast is the engine's standard parity-safe epoch path
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cohorts = (
        events.groupBy(user_col)
        .agg(F.min(us).alias("__first_us"))
        .select(
            user_col,
            F.expr(
                f"(__first_us - pmod(__first_us, {period_us}))"
                f" div {period_us}"
            )
            .cast("long")
            .alias("cohort_period"),
        )
    )
    cells = (
        events.select(F.col(user_col), us.alias("__us"))
        .join(cohorts, user_col)
        .select(
            user_col,
            "cohort_period",
            (
                F.expr(
                    f"(__us - pmod(__us, {period_us})) div {period_us}"
                )
                - F.col("cohort_period")
            )
            .cast("long")
            .alias("period_offset"),
        )
        .distinct()
    )
    counts = cells.groupBy("cohort_period", "period_offset").agg(
        F.count("*").cast("long").alias("n_users")
    )
    sizes = cohorts.groupBy("cohort_period").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    return (
        counts.join(F.broadcast(sizes), "cohort_period")
        .withColumn(
            "retention_ppm",
            F.expr(f"CAST({PPM} * n_users div cohort_size AS BIGINT)"),
        )
        .select(
            "cohort_period", "period_offset", "n_users",
            "cohort_size", "retention_ppm",
        )
    )


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(step_idx, step, n_users, conversion_ppm): users surviving each
    funnel step under strict temporal ordering, plus the integer ppm
    conversion rate from the previous step.  step_idx 0 is the ``(all)``
    base row — every distinct user — whose conversion_ppm is NULL."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    base = (
        events.select(user_col)
        .distinct()
        .agg(F.count("*").cast("long").alias("n_users"))
        .select(
            F.lit(0).cast("long").alias("step_idx"),
            F.lit("(all)").alias("step"),
            "n_users",
        )
    )
    tiers = [base]
    cur = None
    for i, step in enumerate(steps):
        filt = events.filter(F.col(type_col) == step)
        if cur is None:
            cur = filt.groupBy(user_col).agg(F.min(ts_col).alias("__t"))
        else:
            cur = (
                filt.withColumnRenamed(ts_col, "__ts")
                .join(cur, user_col)
                .filter(F.col("__ts") > F.col("__t"))
                .groupBy(user_col)
                .agg(F.min("__ts").alias("__t"))
            )
        tiers.append(
            cur.agg(F.count("*").cast("long").alias("n_users")).select(
                F.lit(i + 1).cast("long").alias("step_idx"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
    out = tiers[0]
    for t in tiers[1:]:
        out = out.unionByName(t)
    # the report is len(steps)+1 rows — a single-partition window here is
    # bounded by construction, same as skew_report's rank stage
    w = Window.orderBy("step_idx")
    # conversion from an empty previous step is undefined — NULL, not an
    # ANSI divide-by-zero abort (a funnel step that killed everyone is a
    # legitimate result the report must survive)
    return (
        out.withColumn("__prev", F.lag("n_users").over(w))
        .withColumn(
            "conversion_ppm",
            F.expr(
                f"CAST(CASE WHEN step_idx > 0 AND __prev > 0 "
                f"THEN {PPM} * n_users div __prev END AS BIGINT)"
            ),
        )
        .select("step_idx", "step", "n_users", "conversion_ppm")
    )
