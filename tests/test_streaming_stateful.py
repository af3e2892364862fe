"""Watermarked windowed aggregation + applyInPandasWithState sessionization:
state must survive micro-batch boundaries AND query restarts, and watermarks
must both admit in-watermark late data and bound state.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from table_extractor_spark.streaming.stateful import (
    sessionize_stateful,
    windowed_event_counts,
)

EVENT_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user_id", StringType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, inp, out, ckpt, build):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(inp)
    q = (
        build(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_windowed_counts_watermark_closes_windows(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    # batch 1: two events in window [12:00,12:10), one in [12:10,12:20)
    _write_batch(
        spark,
        inp,
        [
            (_mins(1), "u1", "click", 1.0),
            (_mins(2), "u1", "click", 2.0),
            (_mins(11), "u2", "view", 5.0),
        ],
    )
    _drain(spark, inp, out, ckpt, windowed_event_counts)

    # batch 2: event far ahead (12:50) advances the watermark past the first
    # windows' end + 15min ...
    _write_batch(spark, inp, [(_mins(50), "u3", "view", 1.0)])
    _drain(spark, inp, out, ckpt, windowed_event_counts)
    # ... so append mode has now EMITTED the closed windows
    rows = {
        (r.window_start_us, r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    w0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    ten_min = 10 * 60 * 1_000_000
    assert rows[(w0, "click")] == (2, 3.0)
    assert rows[(w0 + ten_min, "view")] == (1, 5.0)

    # batch 3: a LATE event for the already-closed first window is dropped
    # (older than the watermark), not double-emitted
    _write_batch(spark, inp, [(_mins(3), "u1", "click", 99.0)])
    _drain(spark, inp, out, ckpt, windowed_event_counts)
    rows_after = [
        r
        for r in spark.read.parquet(out).collect()
        if r.window_start_us == w0 and r.event_type == "click"
    ]
    assert len(rows_after) == 1 and rows_after[0].n == 2


def test_stateful_sessionization_survives_restart(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    # batch 1: an open session for u1 (2 events, 5 min apart) — nothing
    # closes, nothing is emitted; state holds the open session
    _write_batch(
        spark,
        inp,
        [(_mins(0), "u1", "click", 1.0), (_mins(5), "u1", "click", 1.0)],
    )
    _drain(spark, inp, out, ckpt, sessionize_stateful)
    try:
        emitted = spark.read.parquet(out).count()
    except Exception:
        emitted = 0
    assert emitted == 0

    # batch 2 (a SEPARATE query restarted from the checkpoint): an event 60
    # min later closes the session carried in restored state
    _write_batch(spark, inp, [(_mins(65), "u1", "click", 1.0)])
    _drain(spark, inp, out, ckpt, sessionize_stateful)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    s = rows[0]
    t0us = int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert (s.user_id, s.n_events) == ("u1", 2)
    assert s.session_start_us == t0us
    assert s.session_end_us == t0us + 5 * 60 * 1_000_000

    # batch 3: gap smaller than 30 min -> still open, nothing new emitted
    _write_batch(spark, inp, [(_mins(80), "u1", "click", 1.0)])
    _drain(spark, inp, out, ckpt, sessionize_stateful)
    assert spark.read.parquet(out).count() == 1


def test_stream_dedup_drops_redeliveries(spark, tmp_path):
    """Re-delivered event_ids within the watermark are emitted once, across
    micro-batch boundaries; state survives the availableNow restart."""
    from table_extractor_spark.streaming.stateful import dedup_stream

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # batch 1: e1 twice in-batch, e2 once
    _write_batch(
        spark,
        inp,
        [
            (_mins(0), "e1", "click", 1.0),
            (_mins(1), "e1", "click", 1.0),
            (_mins(2), "e2", "view", 2.0),
        ],
    )
    _drain(spark, inp, out, ckpt,
           lambda s: dedup_stream(s, ("user_id",)))
    # batch 2: e1 re-delivered across the batch boundary + a new e3
    _write_batch(
        spark,
        inp,
        [(_mins(3), "e1", "click", 1.0), (_mins(4), "e3", "view", 3.0)],
    )
    _drain(spark, inp, out, ckpt,
           lambda s: dedup_stream(s, ("user_id",)))
    ids = sorted(r.user_id for r in spark.read.parquet(out).collect())
    assert ids == ["e1", "e2", "e3"]


VERDICT_SCHEMA = StructType(
    [
        StructField("vts", TimestampType()),
        StructField("doc_id", StringType()),
        StructField("verdict", StringType()),
    ]
)

EVENT_DOC_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("doc_id", StringType()),
        StructField("event_type", StringType()),
    ]
)


def _drain_join(spark, ein, vin, out, ckpt, how):
    from table_extractor_spark.streaming.stateful import interval_join_stream

    es = spark.readStream.schema(EVENT_DOC_SCHEMA).parquet(ein)
    vs = spark.readStream.schema(VERDICT_SCHEMA).parquet(vin)
    q = (
        interval_join_stream(es, vs, "doc_id", how=how)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_interval_join_matches_within_delay_only(spark, tmp_path):
    ein, vin, out, ckpt = (
        str(tmp_path / d) for d in ("ein", "vin", "out", "ckpt")
    )
    spark.createDataFrame(
        [(_mins(0), "d1", "crawl"), (_mins(5), "d2", "crawl")],
        EVENT_DOC_SCHEMA,
    ).write.mode("append").parquet(ein)
    spark.createDataFrame(
        [
            (_mins(10), "d1", "ok"),         # +10 min: inside 30-min delay
            (_mins(50), "d2", "too-late"),   # +45 min: outside -> no match
            (_mins(12), "d3", "orphan"),     # verdict without event
        ],
        VERDICT_SCHEMA,
    ).write.mode("append").parquet(vin)
    _drain_join(spark, ein, vin, out, ckpt, "inner")
    rows = spark.read.parquet(out).collect()
    assert sorted((r.doc_id, r.verdict) for r in rows) == [("d1", "ok")]


def test_interval_join_left_outer_emits_unmatched_after_watermark(
    spark, tmp_path
):
    ein, vin, out, ckpt = (
        str(tmp_path / d) for d in ("ein", "vin", "out", "ckpt")
    )
    spark.createDataFrame(
        [(_mins(0), "d1", "crawl"), (_mins(5), "d2", "crawl")],
        EVENT_DOC_SCHEMA,
    ).write.mode("append").parquet(ein)
    spark.createDataFrame(
        [(_mins(10), "d1", "ok")], VERDICT_SCHEMA
    ).write.mode("append").parquet(vin)
    _drain_join(spark, ein, vin, out, ckpt, "leftOuter")
    got1 = {(r.doc_id, r.verdict) for r in spark.read.parquet(out).collect()}
    # d2 is unmatched but its join window [5, 35] is NOT yet past both
    # watermarks -> the outer row must NOT have been emitted yet
    assert got1 == {("d1", "ok")}

    # a far-future row on each stream advances both watermarks past d2's
    # window; the next drain must emit d2 exactly once, with NULL verdict
    spark.createDataFrame(
        [(_mins(300), "dx", "crawl")], EVENT_DOC_SCHEMA
    ).write.mode("append").parquet(ein)
    spark.createDataFrame(
        [(_mins(300), "dx", "ok")], VERDICT_SCHEMA
    ).write.mode("append").parquet(vin)
    _drain_join(spark, ein, vin, out, ckpt, "leftOuter")
    rows = spark.read.parquet(out).collect()
    d2 = [r for r in rows if r.doc_id == "d2"]
    assert len(d2) == 1 and d2[0].verdict is None
    # and the matched row did not duplicate across drains
    assert len([r for r in rows if r.doc_id == "d1"]) == 1


def test_stream_funnel_matches_batch_and_survives_restart(spark, tmp_path):
    """The streaming funnel's completions across two drains (state carried
    over the micro-batch boundary) must equal the batch event_funnel's
    final-step survivors on the same bounded data, one row per user."""
    from table_extractor_spark.operators.funnel import funnel_counts
    from table_extractor_spark.streaming.stateful import funnel_stateful

    inp, out, ckpt = (str(tmp_path / d) for d in ("fin", "fout", "fckpt"))
    steps = ["view", "click", "purchase"]

    # batch 1: u1 views+clicks; u2 clicks before viewing (must not count);
    # u3 completes everything in one batch
    _write_batch(spark, inp, [
        (_mins(1), "u1", "view", 1.0),
        (_mins(2), "u1", "click", 1.0),
        (_mins(1), "u2", "click", 1.0),
        (_mins(2), "u2", "view", 1.0),
        (_mins(1), "u3", "view", 1.0),
        (_mins(2), "u3", "click", 1.0),
        (_mins(3), "u3", "purchase", 1.0),
    ])
    _drain(spark, inp, out, ckpt, lambda s: funnel_stateful(s, steps))
    first = {r["user_id"]: r["completed_at_us"]
             for r in spark.read.parquet(out).collect()}
    assert first == {"u3": 1704110580000000}  # 12:03 in epoch us

    # batch 2 (fresh query, resumed state): u1 purchases -> completes;
    # u2's purchase must NOT complete (still stuck: click never counted);
    # u3 purchases again -> must NOT re-emit
    _write_batch(spark, inp, [
        (_mins(10), "u1", "purchase", 1.0),
        (_mins(10), "u2", "purchase", 1.0),
        (_mins(10), "u3", "purchase", 1.0),
    ])
    _drain(spark, inp, out, ckpt, lambda s: funnel_stateful(s, steps))
    got = {r["user_id"]: r["completed_at_us"]
           for r in spark.read.parquet(out).collect()}
    assert set(got) == {"u1", "u3"}

    # batch-funnel differential on the full bounded data
    all_events = spark.read.parquet(inp).select("user_id", "event_type", "ts")
    batch = {r["step"]: r["n_users"]
             for r in funnel_counts(all_events, steps).collect()}
    assert batch["purchase"] == len(got) == 2

    import pytest
    with pytest.raises(ValueError):
        funnel_stateful(all_events, [])


def test_stream_funnel_sorts_across_arrow_chunks(spark, tmp_path):
    """The review-found bug scenario: a user's micro-batch events split
    across MULTIPLE Arrow chunks with a later step's event arriving in an
    EARLIER chunk.  Per-chunk sorting would consume the click before ever
    seeing the view and silently miss the conversion; the whole-batch
    sort must complete it."""
    from table_extractor_spark.streaming.stateful import funnel_stateful

    inp, out, ckpt = (str(tmp_path / d) for d in ("cin", "cout", "cckpt"))
    saved = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
        # file order: click BEFORE view -> with 1-row Arrow chunks the
        # click's chunk is delivered first
        _write_batch(spark, inp, [
            (_mins(6), "u1", "click", 1.0),
            (_mins(5), "u1", "view", 1.0),
        ])
        _drain(spark, inp, out, ckpt,
               lambda s: funnel_stateful(s, ["view", "click"]))
        got = spark.read.parquet(out).collect()
        assert [(r["user_id"],) for r in got] == [("u1",)]
        assert got[0]["completed_at_us"] == 1704110760000000  # 12:06
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", saved
        )


# ---------------------------------------------------------------------------
# transitions_stateful
# ---------------------------------------------------------------------------

from pyspark.sql.types import LongType

from table_extractor_spark.streaming.stateful import transitions_stateful

TEVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", StringType()),
        StructField("event_type", StringType()),
    ]
)


def _drain_transitions(spark, inp, out, ckpt):
    stream = spark.readStream.schema(TEVENT_SCHEMA).parquet(inp)
    q = (
        transitions_stateful(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_transitions_stateful_stitches_batch_boundary(spark, tmp_path):
    """Two drains: the pair straddling the micro-batch boundary must be
    stitched from state, a same-timestamp pair must tie-break on
    event_id, and the full pair multiset must equal the batch LAG."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    b1 = [
        (1, _mins(0), "u1", "view"),
        (2, _mins(1), "u1", "click"),
        # same-ts pair: event_id must order 3 before 4
        (3, _mins(2), "u1", "add"),
        (4, _mins(2), "u1", "buy"),
        (5, _mins(0), "u2", "view"),
    ]
    b2 = [
        (6, _mins(5), "u1", "view"),   # stitches buy -> view across batches
        (7, _mins(3), "u2", "click"),  # stitches view -> click
    ]

    def _write(rows):
        spark.createDataFrame(rows, TEVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(inp)

    _write(b1)
    _drain_transitions(spark, inp, out, ckpt)
    _write(b2)
    _drain_transitions(spark, inp, out, ckpt)

    got = {
        (r["user_id"], r["prev_event"], r["next_event"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        ("u1", "view", "click"),
        ("u1", "click", "add"),
        ("u1", "add", "buy"),
        ("u1", "buy", "view"),
        ("u2", "view", "click"),
    }

    # batch replay over the union of both batches must yield the same pairs
    from pyspark.sql import Window

    all_ev = spark.read.parquet(inp)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        all_ev.select(
            "user_id", "event_type",
            F.lag("event_type").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
        .collect()
    )
    assert {
        (r["user_id"], r["prev"], r["event_type"]) for r in batch
    } == got


def test_transitions_stateful_restart_does_not_duplicate(spark, tmp_path):
    """Draining with NO new data must emit nothing: state-only restarts
    never re-emit already-observed transitions."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, _mins(0), "u1", "a"), (2, _mins(1), "u1", "b")], TEVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(inp)
    _drain_transitions(spark, inp, out, ckpt)
    n1 = spark.read.parquet(out).count()
    _drain_transitions(spark, inp, out, ckpt)  # no new files
    n2 = spark.read.parquet(out).count()
    assert (n1, n2) == (1, 1)


def test_transitions_stateful_drops_backward_boundary_stitch(spark, tmp_path):
    """A same-timestamp twin whose LOWER event id arrives in a LATER
    batch sorts before the stored last event: the stitch must drop it
    (conservative under-count) instead of emitting the reversed pair the
    batch LAG would never contain."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def _write(rows):
        spark.createDataFrame(rows, TEVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(inp)

    _write([(1, _mins(0), "u1", "view"), (5, _mins(2), "u1", "click")])
    _drain_transitions(spark, inp, out, ckpt)
    # id 4 shares ts with the stored last (id 5) but sorts before it
    _write([(4, _mins(2), "u1", "add"), (6, _mins(3), "u1", "buy")])
    _drain_transitions(spark, inp, out, ckpt)

    got = {
        (r["prev_event"], r["next_event"])
        for r in spark.read.parquet(out).collect()
    }
    # NO ('click','add') and NO ('add', anything): the straggler is
    # dropped; the in-order 'buy' stitches from the stored 'click'
    assert got == {("view", "click"), ("click", "buy")}
