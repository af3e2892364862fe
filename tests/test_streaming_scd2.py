"""Streaming SCD2 maintenance: incremental == batch, retries converge."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from table_extractor_spark.operators.scd import scd2_build
from table_extractor_spark.streaming.scd2 import (
    merge_scd2_batch,
    start_stream_scd2,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(e, datetime(2024, 1, d, h), u, s) for e, d, h, u, s in rows], SCHEMA
    )


def _store_rows(spark, dim_dir):
    df = spark.read.parquet(dim_dir)
    return sorted(
        (r["entity"], r["state"], r["valid_from"], r["valid_to"],
         r["is_current"], r["start_event_id"])
        for r in df.collect()
    )


def _batch_reference(spark, all_rows):
    ref = scd2_build(
        _ev(spark, all_rows), "user_id", "ts", "event_type", "event_id",
        keep_opener=True,
    )
    return sorted(
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
         r["is_current"], r["opener_event_id"])
        for r in ref.collect()
    )


B1 = [
    (1, 1, 0, 7, "trial"),
    (2, 2, 0, 7, "trial"),   # collapsed repeat
    (3, 3, 0, 7, "paid"),
    (4, 1, 0, 8, "trial"),
]
B2 = [
    (5, 5, 0, 7, "paid"),    # repeats the OPEN state across the batch line
    (6, 6, 0, 7, "churned"),
    (7, 4, 0, 8, "paid"),
    (8, 2, 0, 9, "trial"),   # brand-new entity
]


def test_incremental_merges_equal_one_batch_rebuild(spark, tmp_path):
    dim = str(tmp_path / "dim")
    merge_scd2_batch(spark, _ev(spark, B1), dim)
    merge_scd2_batch(spark, _ev(spark, B2), dim)
    assert _store_rows(spark, dim) == _batch_reference(spark, B1 + B2)


def test_merge_is_idempotent_on_retry(spark, tmp_path):
    dim = str(tmp_path / "dim")
    merge_scd2_batch(spark, _ev(spark, B1), dim)
    once = _store_rows(spark, dim)
    stats = merge_scd2_batch(spark, _ev(spark, B1), dim)  # the retry
    assert _store_rows(spark, dim) == once
    # e1/e3/e4 are stored openers (exempt); e2 was a collapsed repeat,
    # indistinguishable from late news — counted, excluded, lossless
    assert stats["late_dropped"] == 1


def test_cross_batch_repeat_collapses(spark, tmp_path):
    dim = str(tmp_path / "dim")
    merge_scd2_batch(spark, _ev(spark, B1), dim)
    merge_scd2_batch(spark, _ev(spark, [(9, 9, 0, 7, "paid")]), dim)
    rows = [r for r in _store_rows(spark, dim) if r[0] == 7]
    # still trial->paid: the repeat extended the open episode, no new row
    assert [(s, cur) for _, s, _, _, cur, _ in rows] == [
        ("paid", True), ("trial", False)
    ] or [(s, cur) for _, s, _, _, cur, _ in rows] == [
        ("trial", False), ("paid", True)
    ]
    assert len(rows) == 2


def test_late_event_is_counted_and_excluded(spark, tmp_path):
    dim = str(tmp_path / "dim")
    merge_scd2_batch(spark, _ev(spark, B1), dim)
    before = _store_rows(spark, dim)
    stats = merge_scd2_batch(
        spark, _ev(spark, [(10, 2, 1, 7, "ghost")]), dim  # before open 'paid'
    )
    assert stats["late_dropped"] == 1
    assert _store_rows(spark, dim) == before


def test_same_instant_flapping_survives_the_store_roundtrip(spark, tmp_path):
    dim = str(tmp_path / "dim")
    flap = [
        (1, 1, 0, 7, "a"),
        (2, 1, 0, 7, "b"),  # same instant
        (3, 1, 0, 7, "a"),  # same instant again — open state must be 'a'
    ]
    merge_scd2_batch(spark, _ev(spark, flap), dim)
    # a later unrelated event forces a rebuild THROUGH the stored log
    merge_scd2_batch(spark, _ev(spark, [(4, 2, 0, 7, "b")]), dim)
    rows = [r for r in _store_rows(spark, dim) if r[0] == 7]
    assert _store_rows(spark, dim) == _batch_reference(
        spark, flap + [(4, 2, 0, 7, "b")]
    )
    open_states = [s for _, s, _, _, cur, _ in rows if cur]
    assert open_states == ["b"]


def test_untouched_buckets_are_not_rewritten(spark, tmp_path):
    import os

    dim = str(tmp_path / "dim")
    merge_scd2_batch(spark, _ev(spark, B1), dim, n_buckets=4)
    parts_before = {
        p: sorted(os.listdir(os.path.join(dim, p)))
        for p in os.listdir(dim) if p.startswith("bucket=")
    }
    # entity 99 hashes to SOME bucket; merging it must leave every other
    # bucket's files byte-identical (same names, untouched)
    merge_scd2_batch(
        spark, _ev(spark, [(20, 1, 0, 99, "x")]), dim, n_buckets=4
    )
    parts_after = {
        p: sorted(os.listdir(os.path.join(dim, p)))
        for p in os.listdir(dim) if p.startswith("bucket=")
    }
    changed = [
        p for p in parts_before
        if parts_after.get(p) != parts_before[p]
    ]
    assert len(changed) <= 1  # at most entity-99's own bucket


def test_streaming_available_now_drains_and_resumes(spark, tmp_path):
    land = tmp_path / "land"
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    land.mkdir()
    _ev(spark, B1).write.parquet(str(land / "f1"))
    q = start_stream_scd2(spark, str(land) + "/*", dim, ckpt)
    q.awaitTermination(120)
    assert _store_rows(spark, dim) == _batch_reference(spark, B1)
    _ev(spark, B2).write.parquet(str(land / "f2"))
    q2 = start_stream_scd2(spark, str(land) + "/*", dim, ckpt)
    q2.awaitTermination(120)
    assert _store_rows(spark, dim) == _batch_reference(spark, B1 + B2)
