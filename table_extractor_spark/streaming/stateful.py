"""Custom stateful streaming operators (SURVEY §2.8 extension).

The reference is a batch crawler; these are the engine-side streaming
counterparts a continuous ingestion deployment needs:

* ``windowed_event_counts`` — tumbling event-time windows with a watermark:
  late data inside the watermark updates its window, older data is dropped
  and the window state is reclaimed (bounded state at 10^12 events — an
  unwatermarked streaming agg grows without bound).
* ``sessionize_stateful`` — gap-based sessionization as a CUSTOM stateful
  operator via ``applyInPandasWithState``: per-user state (session start,
  last event time, count) lives in the state store, survives micro-batch
  boundaries AND query restarts (checkpointed), and closed sessions are
  emitted exactly once.

Scale notes: both operators shuffle once on their key (window/user); state
is per-key and O(1) per user for the sessionizer.  The batch `sessionization`
query (plans/queries.py) is the oracle-checked equivalent on bounded data —
the streaming form exists for unbounded ingestion where a batch window over
"all history" is impossible.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", IntegerType()),
    ]
)


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "10 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Tumbling watermarked counts per (window, event_type).

    Works on a STREAMING events frame (ts, event_type, value): append-mode
    sinks emit each window once, after the watermark passes its end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            F.unix_micros(F.col("w.end")).alias("window_end_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: Tuple[str, ...] = ("event_id",),
    *,
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming ingest dedup: drop re-deliveries of the same key arriving
    within the watermark (at-least-once sources — Kafka redeliveries,
    crawler retries — become exactly-once rows downstream).

    ``dropDuplicatesWithinWatermark`` keys the state store on ``keys`` and
    EXPIRES entries once the watermark passes them — bounded state, unlike
    a plain ``dropDuplicates`` on a stream which retains every key forever.
    A duplicate arriving later than the watermark is NOT caught here; that
    is the (deliberate) state-size trade — catch stragglers downstream with
    the batch ``exact_dedup``."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def _session_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Gap sessionizer for one user: state = (start_us, last_us, n).

    Deterministic within a micro-batch (events sorted by ts); a gap larger
    than the configured threshold closes the current session and emits it.
    The still-open session stays in state for the next batch / restart."""
    gap_us = 30 * 60 * 1_000_000  # 30-minute gap, matching the batch query
    (user_id,) = key
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = -1
        n = 0
    closed = []
    for pdf in pdfs:
        ts_us = pdf["ts_us"].sort_values()
        for t in ts_us:
            t = int(t)
            if start_us < 0:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us = t
                n += 1
    state.update((start_us, last_us, n))
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "session_end_us", "n_events"],
        )


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """Streaming gap-based sessionization over (user_id, ts).

    Emits CLOSED sessions (a newer event arrived more than the gap after the
    session's last event).  State is one tuple per user in the state store —
    checkpointed, so a restarted query resumes with open sessions intact.

    Production note: this emits on the next event only; add
    ``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.setTimeoutDuration``
    to also flush sessions for users who never return (kept event-driven
    here so the test corpus is fully deterministic)."""
    prepared = events.select(
        F.col("user_id").cast("string").alias("user_id"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_DONE_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("completed_at_us", LongType()),
    ]
)

_FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("step_idx", IntegerType()),
        StructField("anchor_us", LongType()),
    ]
)


def funnel_stateful(events: DataFrame, steps) -> DataFrame:
    """Streaming sequential funnel: a per-user state machine advancing
    through ``steps`` under the batch ``event_funnel`` semantics — step
    k+1 requires an event strictly after the step-k anchor, and the
    anchor is always the EARLIEST qualifying event.  Emits one
    (user_id, completed_at_us) row when a user finishes the last step;
    state is two fields per user (step index + anchor), survives
    micro-batch boundaries and query restarts, and a completed user is
    never re-emitted.

    Equivalence to the batch funnel holds when each user's events arrive
    in event-time order ACROSS micro-batches (within a batch they are
    sorted here); a straggler older than the current anchor can delay a
    conversion but can never create a false one — the conservative
    failure mode for an ingest-time metric, with the batch query as the
    exact end-of-day reconciliation."""
    steps = list(steps)
    if len(steps) < 1 or len(set(steps)) != len(steps):
        raise ValueError(f"steps must be non-empty and distinct: {steps!r}")
    n_steps = len(steps)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        step_idx, anchor_us = state.get if state.exists else (0, -1)
        done = []
        if step_idx < n_steps:
            # one group's micro-batch rows arrive as MULTIPLE Arrow chunks
            # in shuffle order — sort the WHOLE batch once, not per chunk,
            # or a later-chunk 'view' is evaluated after an earlier-chunk
            # 'click' and the conversion is silently missed
            batch = pd.concat(list(pdfs), ignore_index=True)
            for _, row in batch.sort_values("ts_us").iterrows():
                if step_idx >= n_steps:
                    break
                if row["event_type"] == steps[step_idx] and (
                    step_idx == 0 or int(row["ts_us"]) > anchor_us
                ):
                    anchor_us = int(row["ts_us"])
                    step_idx += 1
                    if step_idx == n_steps:
                        done.append((user_id, anchor_us))
                        break
        state.update((step_idx, anchor_us))
        if done:
            yield pd.DataFrame(
                done, columns=["user_id", "completed_at_us"]
            )

    prepared = events.select(
        F.col("user_id").cast("string").alias("user_id"),
        F.col("event_type"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_DONE_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "vts",
    left_watermark: str = "20 minutes",
    right_watermark: str = "40 minutes",
    max_delay: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream watermarked INTERVAL join: each left row pairs with
    right rows for the same ``key`` whose timestamp lands in
    [left_ts, left_ts + max_delay] — the enrich-events-with-late-verdicts
    shape (a crawl event joined to a moderation/quality verdict that
    arrives minutes later on its own stream).

    Both sides carry watermarks and the join predicate bounds the time
    range, which is exactly what lets Spark EXPIRE join state: a buffered
    left row is dropped once the right watermark passes
    left_ts + max_delay, and vice versa — bounded state at 10^12 events,
    where an unconstrained stream-stream join would buffer both streams
    forever.  ``how="leftOuter"`` additionally emits unmatched left rows
    (NULL right columns) — but only after the watermark proves no match
    can still arrive, so outer results trail the data by the watermark
    delay (the two-drain test pins this).

    One shuffle per side on ``key``; state is per-key and
    watermark-bounded.  The batch as-of join (operators/asof) is the
    bounded-data analogue; this form exists for unbounded ingestion.
    """
    lw = left.withWatermark(left_ts, left_watermark).alias("l")
    rw = right.withWatermark(right_ts, right_watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} AND r.{right_ts} >= l.{left_ts} "
        f"AND r.{right_ts} <= l.{left_ts} + interval {max_delay}"
    )
    return lw.join(rw, cond, how).drop(F.col(f"r.{key}"))


TRANSITION_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("prev_event", StringType()),
        StructField("next_event", StringType()),
        StructField("ts_us", LongType()),
    ]
)

_TRANSITION_STATE_SCHEMA = StructType(
    [
        StructField("last_type", StringType()),
        StructField("last_us", LongType()),
        StructField("last_id", LongType()),
    ]
)


def transitions_stateful(events: DataFrame) -> DataFrame:
    """Streaming first-order transitions: the incremental feed of the
    batch `event_transition_matrix` — one (user, prev, next, ts) row per
    adjacent event pair in each user's stream, with the pair that
    STRADDLES a micro-batch boundary stitched from per-user state (last
    event type + timestamp + id, three fields per user, checkpointed).

    Within a batch, a group's rows arrive as multiple Arrow chunks in
    shuffle order, so the WHOLE batch sorts once on (ts, event_id) — the
    same chunk-split lesson the streaming funnel pins; the event-id
    tie-break matches the batch query, so same-timestamp events sequence
    identically.  Equivalence to the batch LAG holds when each user's
    events arrive in (event-time, event-id) order ACROSS batches (the
    funnel's contract, sharpened by the id tie-break).  A row that sorts
    BEFORE the stored last event — a late straggler, or a same-timestamp
    twin whose lower id arrives in a later batch — is DROPPED from the
    stitch rather than emitted backwards: the state's (ts, id) fields
    gate every boundary transition, so the stream can under-count
    relative to the batch LAG but never fabricates a reversed pair the
    batch query would not contain (the funnel's conservative failure
    mode; the batch query is the end-of-day reconciliation).
    Downstream, the standing matrix is one streaming groupBy over these
    rows — the pair key space is |types|^2-bounded, so the aggregation
    state is tiny at any corpus size."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_type, last_us, last_id = (
            state.get if state.exists else (None, -1, -1)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        out = []
        for _, row in batch.sort_values(["ts_us", "event_id"]).iterrows():
            ts_us, eid = int(row["ts_us"]), int(row["event_id"])
            if last_type is not None and (ts_us, eid) <= (last_us, last_id):
                # sorts at-or-before the stored last event: emitting here
                # would stitch a pair the batch LAG orders the other way
                continue
            if last_type is not None:
                out.append(
                    (user_id, last_type, row["event_type"], ts_us)
                )
            last_type = row["event_type"]
            last_us = ts_us
            last_id = eid
        state.update((last_type, last_us, last_id))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "prev_event", "next_event", "ts_us"],
            )

    prepared = events.select(
        F.col("user_id").cast("string").alias("user_id"),
        F.col("event_type"),
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=_TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
