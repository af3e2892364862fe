"""Survivor-policy operators: quality-aware keep-best and the
leakage-safe (cluster-representative) split."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from table_extractor_spark.operators.dedup import (
    keep_best_per_component,
    leakage_safe_split,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _comps(spark, pairs):
    return spark.createDataFrame(pairs, "node long, component long")


def test_keep_best_keeps_highest_score_not_first(spark):
    """A 3-member chain cluster {1,2,3} where doc 3 scores highest must
    keep 3 (first-occurrence semantics would keep 1); ties break to the
    smaller id; singletons (doc 9) never appear — they were never in a
    component."""
    docs = _docs(spark, [
        (1, "low"), (2, "low"), (3, "high high high"),
        (5, "tie"), (6, "tie"),
        (9, "alone"),
    ])
    comps = _comps(spark, [
        (1, 1), (2, 1), (3, 1),
        (5, 5), (6, 5),
    ])
    # deterministic integer score: doc 3 gets 30, others their id
    score = (
        F.when(F.col("doc_id") == 3, 30)
        .when(F.col("doc_id").isin(5, 6), 7)  # exact tie
        .otherwise(F.col("doc_id"))
        .cast("long")
    )
    got = {
        r.component: (r.kept_doc, r.kept_score, r.n_members)
        for r in keep_best_per_component(docs, comps, score).collect()
    }
    assert got == {1: (3, 30, 3), 5: (5, 7, 2)}


def test_keep_best_is_partition_invariant(spark):
    docs = _docs(spark, [(i, f"t{i}") for i in range(1, 9)])
    comps = _comps(spark, [(i, 1 if i < 5 else 5) for i in range(1, 9)])
    score = (F.col("doc_id") % 3).cast("long")
    a = sorted(
        map(tuple, keep_best_per_component(docs, comps, score).collect())
    )
    b = sorted(
        map(
            tuple,
            keep_best_per_component(
                docs.repartition(7), comps.repartition(3), score
            ).collect(),
        )
    )
    assert a == b


def test_leakage_safe_split_never_splits_a_cluster(spark):
    """Every member of a component gets the representative's split, and
    the assignment equals the pure-python replay of the engine hash;
    singletons keep the deterministic_split assignment exactly."""
    docs = _docs(spark, [(i, f"d{i}") for i in range(1, 21)])
    comps = _comps(
        spark,
        [(3, 3), (7, 3), (11, 3), (4, 4), (15, 4)],
    )
    rows = {r.doc_id: (r.cluster_rep, r.split)
            for r in leakage_safe_split(docs, comps).collect()}

    def expected_split(rep):
        slot = _h60(f"split:{rep}") % 100
        return "train" if slot < 90 else ("val" if slot < 95 else "test")

    # cluster members share rep + split
    assert rows[3] == rows[7] == rows[11] == (3, expected_split(3))
    assert rows[4] == rows[15] == (4, expected_split(4))
    # singletons: rep = own id, split = the deterministic_split assignment
    for i in set(range(1, 21)) - {3, 7, 11, 4, 15}:
        assert rows[i] == (i, expected_split(i))


def test_leakage_safe_split_validates_percentages(spark):
    docs = _docs(spark, [(1, "x")])
    comps = _comps(spark, [])
    with pytest.raises(ValueError):
        leakage_safe_split(docs, comps, train_pct=96, val_pct=5)
    with pytest.raises(ValueError):
        leakage_safe_split(docs, comps, train_pct=0, val_pct=5)
