"""Pins for the round-2 relational additions that cannot (or should not)
hash-match a DuckDB oracle: approx_percentile's t-digest is engine-specific
(bounded error vs exact is the contract), and containment's asymmetry is
easiest to see on a constructed doc-inside-doc pair."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_percentile_error_bound(spark):
    """approx_percentile (mergeable sketch — the >executor-memory-group
    path) must land within its accuracy contract of the exact percentile."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    v = "CAST(value AS DOUBLE)"
    row = ev.agg(
        F.expr(f"percentile({v}, 0.5)").alias("exact"),
        F.expr(f"approx_percentile({v}, 0.5, 10000)").alias("approx"),
        F.expr(f"min({v})").alias("lo"),
        F.expr(f"max({v})").alias("hi"),
    ).collect()[0]
    spread = row.hi - row.lo
    assert abs(row.approx - row.exact) <= 0.01 * spread, row


def test_containment_catches_embedded_doc(spark):
    """A small doc fully embedded in a big one: containment(a in b) = 1.0
    while Jaccard is far below any near-dup threshold."""
    from table_extractor_spark.operators.dedup import (
        ngram_containment,
        ngram_jaccard,
    )

    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"filler{i} pad{i} body{i}" for i in range(30))
    docs = spark.createDataFrame(
        [("small", small), ("big", big)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([("big", "small")], ["a", "b"])

    cont = ngram_containment(docs, pairs).collect()[0]
    jac = ngram_jaccard(docs, pairs).collect()[0]
    assert cont.containment_b_in_a == 1.0  # small fully inside big
    assert cont.containment_a_in_b < 0.1
    assert jac.jaccard < 0.1  # symmetric measure misses the embedding
