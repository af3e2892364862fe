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


# ---------------------------------------------------------------------------
# round-6 batch: trend slope, RANGE frames, salted two-phase sampling
# ---------------------------------------------------------------------------


def _events_dir(spark, tmp_path, rows):
    """Write a minimal events.parquet a registered query can load."""
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{d}/events.parquet")
    return d


def test_daily_trend_slope_exact_lines(spark, tmp_path):
    """A perfectly linear decline (10, 8, 6, 4 events on days 0..3) must
    yield slope exactly -2,000,000 ppm; a single-day type has zero
    variance and yields NULL."""
    from datetime import datetime

    rows = []
    eid = 0
    for day, n in enumerate([10, 8, 6, 4]):
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, datetime(2024, 3, 1 + day, 12, 0, 0), 1, "down", 0.0, "{}")
            )
    for _ in range(5):
        eid += 1
        rows.append((eid, datetime(2024, 3, 1, 9, 0, 0), 1, "flat1d", 0.0, "{}"))
    d = _events_dir(spark, tmp_path, rows)
    from table_extractor_spark.plans import queries as Q

    got = {
        r["event_type"]: (r["n_days"], r["slope_ppm"])
        for r in Q.queries()["daily_trend_slope"](spark, d).collect()
    }
    assert got["down"] == (4, -2_000_000)
    assert got["flat1d"] == (1, None)


def test_daily_trend_slope_negative_truncates_like_duckdb(spark, tmp_path):
    """A non-divisible negative quotient must truncate toward zero (both
    engines' integer-division semantics), pinned against an independent
    Python replay."""
    from datetime import datetime

    counts = [7, 5, 4]  # slope = -3/2 exactly -> num/den non-divisible
    rows = []
    eid = 0
    for day, n in enumerate(counts):
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, datetime(2024, 3, 1 + day, 12), 1, "t", 0.0, "{}")
            )
    d = _events_dir(spark, tmp_path, rows)
    n_days = len(counts)
    xs = list(range(n_days))
    sx, sy = sum(xs), sum(counts)
    sxy = sum(x * y for x, y in zip(xs, counts))
    sxx = sum(x * x for x in xs)
    num = 1_000_000 * (n_days * sxy - sx * sy)
    den = n_days * sxx - sx * sx
    expected = -((-num) // den) if num < 0 else num // den  # truncate
    assert expected == -1_500_000
    from table_extractor_spark.plans import queries as Q

    row = Q.queries()["daily_trend_slope"](spark, d).collect()[0]
    assert row["slope_ppm"] == expected


def test_range_frame_differs_from_rows_over_gaps(spark, tmp_path):
    """Busy hours at 0, 1, then a quiet gap, then 9: the RANGE frame for
    hour 9 must contain ONLY hour 9 (hours 0/1 are outside the trailing
    6-hour clock window), where a ROWS frame would have leapt the gap and
    summed all three."""
    from datetime import datetime, timedelta

    base = datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    for hour, n in [(0, 4), (1, 3), (9, 5)]:
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, base + timedelta(hours=hour), 1, "t", 0.0, "{}")
            )
    d = _events_dir(spark, tmp_path, rows)
    from table_extractor_spark.plans import queries as Q

    out = {
        int(r["hour_idx"]) % 24: r["rolling_6h"]
        for r in Q.queries()["range_frame_hourly_load"](spark, d).collect()
    }
    assert out[0] == 4
    assert out[1] == 7  # hours 0+1 inside the trailing window
    assert out[9] == 5  # gap: hours 0/1 beyond 5 PRECEDING by VALUE


def test_salted_sample_equals_single_window_sample(spark):
    """The two-phase salted top-k must select EXACTLY the rows of the
    single-window formulation — the rewrite is physical, not semantic."""
    from table_extractor_spark.plans import queries as Q

    q = Q.queries()
    sf = "/root/testdata/sf0.001"
    plain = {
        (r["lang"], r["doc_id"], r["rk"])
        for r in q["stratified_sample"](spark, sf).collect()
    }
    salted = {
        (r["lang"], r["doc_id"], r["rk"])
        for r in q["stratified_sample_salted"](spark, sf).collect()
    }
    assert plain == salted and len(plain) == 100


def _lineitem_dir(spark, tmp_path, rows):
    """Write minimal lineitem/supplier parquet for the Q15-shape tests."""
    li = spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )
    supp = spark.createDataFrame(
        [(s, f"Supplier#{s}", 0, 0.0) for s in {r[2] for r in rows}],
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    )
    d = str(tmp_path / "sf")
    li.coalesce(1).write.parquet(f"{d}/lineitem.parquet")
    supp.coalesce(1).write.parquet(f"{d}/supplier.parquet")
    return d


def test_q15_keeps_all_tied_maximum_suppliers(spark, tmp_path):
    """Two suppliers with EXACTLY equal quarterly revenue must both
    survive — the reason Q15 is max-equality, not LIMIT 1 — and the tie
    is tested on the exact DECIMAL sums, not rounded doubles."""
    from datetime import datetime

    mk = lambda sk, price, disc: (  # noqa: E731
        1, 1, sk, 1, 1.0, price, disc, 0.0, "N", "O",
        datetime(1996, 2, 1),
    )
    rows = [
        mk(1, 100.00, 0.0),
        mk(1, 50.00, 0.0),
        # supplier 2 reaches the same 150.00 via a discounted line
        mk(2, 200.00, 0.25),
        # supplier 3 is strictly below
        mk(3, 149.99, 0.0),
        # out-of-window line for supplier 3 must not count
        (1, 1, 3, 2, 1.0, 1000.0, 0.0, 0.0, "N", "O", datetime(1995, 6, 1)),
    ]
    d = _lineitem_dir(spark, tmp_path, rows)
    from table_extractor_spark.plans import queries as Q

    got = {
        (r["s_suppkey"], r["total_revenue"])
        for r in Q.queries()["q15_top_revenue_supplier"](spark, d).collect()
    }
    assert got == {(1, 150.0), (2, 150.0)}


def test_cheapest_supplier_argmin_partial_aggregates(spark):
    """The argmin-per-group rewrite must be an aggregate (map-side
    partial_min before the exchange), never a window sort of the fact."""
    from table_extractor_spark.plans import queries as Q

    df = Q.queries()["cheapest_supplier_per_part"](
        spark, "/root/testdata/sf0.001"
    )
    qe = df._jdf.queryExecution()
    plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        qe, "formatted"
    )
    assert "partial_min" in plan, plan
    assert "Window" not in plan, plan


def test_cheapest_supplier_tie_breaks_on_suppkey(spark, tmp_path):
    from datetime import datetime

    rows = [
        (1, 7, 9, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(1996, 2, 1)),
        (2, 7, 4, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(1996, 2, 1)),
        (3, 7, 5, 1, 1.0, 11.0, 0.0, 0.0, "N", "O", datetime(1996, 2, 1)),
    ]
    d = _lineitem_dir(spark, tmp_path, rows)
    from table_extractor_spark.plans import queries as Q

    row = Q.queries()["cheapest_supplier_per_part"](spark, d).collect()[0]
    assert (row["l_partkey"], row["best_price"], row["best_suppkey"]) == (
        7, 10.0, 4,
    )


def test_bigram_fluency_edge_docs(spark, tmp_path):
    """Zero- and one-token docs emit no bigrams (absent from the output);
    doubled spaces do not mint empty-token bigrams; and the score is the
    truncated integer mean of corpus bigram counts."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat", "en", "s", 11),
            (2, "the cat  sat", "en", "s", 12),  # doubled space, same bigrams
            (3, "single", "en", "s", 6),
            (4, "", "en", "s", 0),
            (5, "the dog", "en", "s", 7),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = str(tmp_path / "sf")
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
    from table_extractor_spark.plans import queries as Q

    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_bigram_freq"])
        for r in Q.queries()["bigram_fluency_score"](spark, d).collect()
    }
    # corpus counts: 'the cat'=2, 'cat sat'=2, 'the dog'=1
    assert got == {1: (2, 2), 2: (2, 2), 5: (1, 1)}


def test_hourly_gap_fill_carries_forward_over_gaps(spark, tmp_path):
    """Hours 0, 1, 4 observed: the spine must mint hours 2-3 as gaps
    carrying hour 1's count forward, and stop at the observed max."""
    from datetime import datetime, timedelta

    base = datetime(2024, 3, 1, 0, 30, 0)
    rows = []
    eid = 0
    for hour, n in [(0, 2), (1, 7), (4, 3)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, base + timedelta(hours=hour), 1, "t", 0.0, "{}"))
    d = _events_dir(spark, tmp_path, rows)
    from table_extractor_spark.plans import queries as Q

    got = {
        int(r["hour_idx"]) % 24: (r["was_gap"], r["n_filled"])
        for r in Q.queries()["hourly_gap_fill"](spark, d).collect()
    }
    assert got == {
        0: (False, 2),
        1: (False, 7),
        2: (True, 7),
        3: (True, 7),
        4: (False, 3),
    }


def test_null_safe_join_keeps_unknown_bucket(spark, tmp_path):
    """A plain equi-join drops every NULL-keyed event; the null-safe join
    must keep them as the 'unknown' row with the exact count."""
    rows = []
    for i in range(12):
        k = i % 10  # k<3 -> NULL device in the query's derivation
        rows.append((i, __import__("datetime").datetime(2024, 3, 1, 1), 1,
                     "t", 0.0, '{"k": %d}' % k))
    d = _events_dir(spark, tmp_path, rows)
    from table_extractor_spark.plans import queries as Q

    got = {
        r["device_label"]: r["n_events"]
        for r in Q.queries()["null_safe_device_join"](spark, d).collect()
    }
    # k in {0,1,2} twice for i<10 plus i=10(k=0),11(k=1): 0,1 twice; 2 once
    assert got["unknown"] == 5
    assert sum(got.values()) == 12
    assert got["device-5"] == 1


def test_event_transition_matrix_hand_sequence(spark, tmp_path):
    """One user's stream a->b->a->b plus a same-timestamp tie broken by
    event_id: exact transition counts and ppm row shares."""
    from datetime import datetime

    base = datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (1, base.replace(minute=1), 7, "a", 0.0, "{}"),
        (2, base.replace(minute=2), 7, "b", 0.0, "{}"),
        (3, base.replace(minute=3), 7, "a", 0.0, "{}"),
        # same-ts tie: event_id orders 4 ('b') before 5 ('c')
        (4, base.replace(minute=4), 7, "b", 0.0, "{}"),
        (5, base.replace(minute=4), 7, "c", 0.0, "{}"),
        # second user contributes one a->c transition
        (6, base.replace(minute=1), 8, "a", 0.0, "{}"),
        (7, base.replace(minute=2), 8, "c", 0.0, "{}"),
    ]
    d = _events_dir(spark, tmp_path, rows)
    from table_extractor_spark.plans import queries as Q

    got = {
        (r["prev_event"], r["next_event"]): (r["n_transitions"], r["share_ppm"])
        for r in Q.queries()["event_transition_matrix"](spark, d).collect()
    }
    assert got == {
        ("a", "b"): (2, 666666),  # a -> {b:2, c:1}
        ("a", "c"): (1, 333333),
        ("b", "a"): (1, 500000),  # b -> {a:1, c:1}
        ("b", "c"): (1, 500000),
    }


def test_cumulative_unique_users_rewrite_hand_case(spark, tmp_path):
    """Users {a} day0, {a,b} day1 (a returns: no new), {c} day3: new
    counts 1,1,1 with a zero-new day absent (day2 has no events so no
    spine row) and the cumulative curve 1,2,3."""
    from datetime import datetime, timedelta

    base = datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (1, base, 100, "t", 0.0, "{}"),
        (2, base + timedelta(days=1), 100, "t", 0.0, "{}"),
        (3, base + timedelta(days=1), 200, "t", 0.0, "{}"),
        (4, base + timedelta(days=3), 300, "t", 0.0, "{}"),
    ]
    d = _events_dir(spark, tmp_path, rows)
    from table_extractor_spark.plans import queries as Q

    got = [
        (r["n_new"], r["cum_users"])
        for r in sorted(
            Q.queries()["cumulative_unique_users"](spark, d).collect(),
            key=lambda r: r["day_idx"],
        )
    ]
    assert got == [(1, 1), (1, 2), (1, 3)]


def test_cumulative_unique_users_zero_new_day_present(spark, tmp_path):
    """A day with events but only RETURNING users must appear with
    n_new = 0 and an unchanged cumulative count."""
    from datetime import datetime, timedelta

    base = datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (1, base, 100, "t", 0.0, "{}"),
        (2, base + timedelta(days=1), 100, "t", 0.0, "{}"),  # returning only
        (3, base + timedelta(days=2), 200, "t", 0.0, "{}"),
    ]
    d = _events_dir(spark, tmp_path, rows)
    from table_extractor_spark.plans import queries as Q

    got = [
        (r["n_new"], r["cum_users"])
        for r in sorted(
            Q.queries()["cumulative_unique_users"](spark, d).collect(),
            key=lambda r: r["day_idx"],
        )
    ]
    assert got == [(1, 1), (0, 1), (1, 2)]


def _docs_dir(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_zero_token_docs_survive_explode_outer(spark, tmp_path):
    """Docs with no long token (incl. empty, whitespace-only, and NULL
    text) must appear with n_tokens = 0 — and a plain explode provably
    drops them (the row-loss this query exists to pin)."""
    from pyspark.sql import functions as F

    d = _docs_dir(spark, tmp_path, [
        (1, "tiny words but longenough appears", "en", "s", 30),
        (2, "", "en", "s", 0),
        (3, "   ", "en", "s", 3),
        (4, "all short toks here", "en", "s", 19),
        (5, None, "en", "s", 0),
    ])
    from table_extractor_spark.plans import queries as Q

    got = {
        r["doc_id"]: (r["n_tokens"], r["is_empty"])
        for r in Q.queries()["zero_token_docs_audit"](spark, d).collect()
    }
    assert got == {
        1: (1, False),
        2: (0, True),
        3: (0, True),
        4: (0, True),
        5: (0, True),
    }
    # the contrast: plain explode keeps ONLY the doc with a long token
    docs = spark.read.parquet(f"{d}/documents.parquet")
    plain = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "filter(split(coalesce(text, ''), ' '),"
                    " x -> length(x) >= 8)"
                )
            ),
        )
        .select("doc_id")
        .distinct()
        .count()
    )
    assert plain == 1


def test_cume_dist_ppm_tie_handling(spark, tmp_path):
    """Lengths 5, 5, 10: both ties get cume 2/3 (RANGE frame includes
    the whole tie group), the max gets 3/3."""
    d = _docs_dir(spark, tmp_path, [
        (1, "x", "en", "s", 5),
        (2, "y", "en", "s", 5),
        (3, "z", "en", "s", 10),
    ])
    from table_extractor_spark.plans import queries as Q

    got = {
        r["doc_id"]: r["cume_ppm"]
        for r in Q.queries()["cume_dist_doc_length"](spark, d).collect()
    }
    assert got == {1: 666666, 2: 666666, 3: 1000000}


def test_url_policy_longest_prefix_nested_reallow(spark, tmp_path):
    """Robots semantics: /item/s* denies, /item/sa* re-allows — the
    LONGEST match must win, and every path matches at least '/'-level."""
    parts = spark.createDataFrame(
        [
            (1, "salmon widget", "Brand#1", "t", 1, 1.0),
            (2, "steel bolt", "Brand#1", "t", 1, 1.0),
            (3, "brass nut", "Brand#1", "t", 1, 1.0),
            (4, "copper pipe", "Brand#1", "t", 1, 1.0),
        ],
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    d = str(tmp_path / "sf")
    parts.coalesce(1).write.parquet(f"{d}/part.parquet")
    from table_extractor_spark.plans import queries as Q

    got = {
        r["p_partkey"]: (r["matched_prefix"], r["action"])
        for r in Q.queries()["url_policy_longest_prefix"](spark, d).collect()
    }
    assert got == {
        1: ("/item/sa", "allow"),   # re-allowed under the deny subtree
        2: ("/item/s", "deny"),
        3: ("/item/b", "deny"),
        4: ("/item/", "allow"),
    }


def test_url_policy_oracle_table_matches_source(spark):
    """The oracle's inline VALUES policy table must stay in lockstep with
    the Spark-side _URL_POLICIES tuple."""
    import re

    from table_extractor_spark.plans import battery_relational as BR
    from table_extractor_spark.plans import queries as Q

    sql = Q.oracle_sql()["url_policy_longest_prefix"]
    pairs = re.findall(r"\('([^']*)', '(allow|deny)'\)", sql)
    assert tuple(pairs) == BR._URL_POLICIES
