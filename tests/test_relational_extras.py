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


def test_repetition_filters_hand_values(spark):
    """Hand-computed repetition ratios, including the no-bigrams edge (a
    one-word doc has zero repetition, not 100%)."""
    from table_extractor_spark.functions.text import (
        dup_ngram_char_ratio,
        dup_word_ratio,
    )

    docs = spark.createDataFrame(
        [
            ("clean", "alpha beta gamma delta"),
            ("spam", "buy buy buy buy"),
            ("loop", "a b a b a b"),
            ("single", "word"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: (r.dw, r.dg)
        for r in docs.select(
            "doc_id",
            F.round(dup_word_ratio(F.col("text")), 6).alias("dw"),
            F.round(dup_ngram_char_ratio(F.col("text"), 2), 6).alias("dg"),
        ).collect()
    }
    assert rows["clean"] == (0.0, 0.0)
    # spam: 4 occurrences, 1 distinct -> 0.75; bigrams all 'buy buy' -> 2/3 chars repeated
    assert rows["spam"] == (0.75, round(1 - 7 / 21, 6))
    # loop: 6 words, 2 distinct -> 2/3; bigrams {'a b','b a'} 2 distinct of 5
    assert rows["loop"] == (round(1 - 2 / 6, 6), round(1 - 6 / 15, 6))
    assert rows["single"] == (0.0, 0.0)


def test_normalize_url_hand_cases(spark):
    from table_extractor_spark.functions.url import normalize_url

    cases = {
        "HTTP://Example.COM/Path/Page/?utm_source=x&id=3#frag":
            "http://example.com/Path/Page?id=3",
        "https://example.com/a/b/": "https://example.com/a/b",
        "https://example.com/": "https://example.com/",  # root slash kept
        "https://example.com": "https://example.com",
        "http://example.com/p?fbclid=abc": "http://example.com/p",
        "http://example.com/p?id=1&utm_campaign=z&q=2":
            "http://example.com/p?id=1&q=2",
        "not a url at all": "not a url at all",  # pass-through, never raise
        "ftp://Host.Net/File": "ftp://host.net/File",  # path case preserved
        "https://example.com/p?ref=home&x=1": "https://example.com/p?x=1",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["u"])
    got = {r.u: r.n for r in df.select("u", normalize_url(F.col("u")).alias("n")).collect()}
    assert got == cases


def test_approx_count_distinct_error_bound(spark):
    """approx_count_distinct (HLL++, mergeable — the distributed
    cardinality path) must land within its rsd contract of the exact
    count; like approx_percentile, its sketch is engine-specific so it is
    pinned here rather than oracle-hashed."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= 3 * 0.02 * row.exact, row


def test_redact_pii_hand_cases(spark):
    from table_extractor_spark.functions.text import redact_pii

    cases = {
        "mail bob.smith+x@sub.example.co.uk now":
            "mail <EMAIL> now",
        "server at 192.168.001.1 and 8.8.8.8":
            "server at 192.168.001.1 and <IP>",  # 001 octet: not valid IPv4
        "call +1 (555) 010-2345 today": "call <PHONE> today",
        "year 2024 price 10.99 ok": "year 2024 price 10.99 ok",  # no false hits
        "a@b.io vs 10.0.0.1": "<EMAIL> vs <IP>",
    }
    df = spark.createDataFrame([(t,) for t in cases], ["t"])
    got = {r.t: r.red for r in df.select(
        "t", redact_pii(F.col("t")).alias("red")).collect()}
    assert got == cases


def test_count_min_sketch_heavy_hitter_bound(spark):
    """count_min_sketch (mergeable, fixed memory — the sketch path when the
    exact per-key agg is too wide): estimates never undercount and stay
    within eps*N of exact for the top keys."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sk = ev.agg(
        F.expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").alias("sk")
    ).collect()[0].sk
    exact = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(exact.values())
    # query the sketch via the JVM reader (no SQL estimator fn in this build)
    jvm = ev.sparkSession._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(sk))
    )
    for uid, n in sorted(exact.items(), key=lambda kv: -kv[1])[:10]:
        est = cms.estimateCount(uid)
        assert est >= n  # CMS never undercounts
        assert est - n <= 0.001 * n_total + 1
