"""Decontamination + frequency-rank scoring semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from table_extractor_spark.operators.contamination import (
    benchmark_ngrams,
    contamination_report,
)
from table_extractor_spark.functions.text import (
    with_rare_word_score,
    word_rank_table,
)


def test_contamination_flags_exact_ngram_overlap(spark):
    bench = spark.createDataFrame(
        [("b1", "the quick brown fox jumps")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [
            ("d1", "said the quick brown fox ran away"),  # shares 3-grams
            ("d2", "entirely different words here now"),   # clean
            ("d3", "quick brown fox"),                     # exactly one 3-gram
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_collisions, r.contaminated)
        for r in contamination_report(docs, benchmark_ngrams(bench)).collect()
    }
    # d1 shares 'the quick brown', 'quick brown fox', 'brown fox jumps'? no —
    # d1 lacks 'jumps' after fox; shares the first two
    assert got["d1"] == (2, True)
    assert got["d2"] == (0, False)
    assert got["d3"] == (1, True)


def test_contamination_every_doc_has_a_row(spark):
    docs = spark.createDataFrame(
        [("a", "x y z w"), ("b", "p q r s")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([("bb", "m n o p")], ["doc_id", "text"])
    rep = contamination_report(docs, benchmark_ngrams(bench))
    assert rep.count() == 2
    assert rep.filter(F.col("contaminated")).count() == 0


def test_word_rank_table_orders_by_frequency_then_word(spark):
    docs = spark.createDataFrame(
        [("a", "cat cat cat dog dog bird")], ["doc_id", "text"]
    )
    ranks = {r.word: (r.n, r.rank) for r in word_rank_table(docs).collect()}
    assert ranks["cat"] == (3, 1)
    assert ranks["dog"] == (2, 2)
    assert ranks["bird"] == (1, 3)


def test_rare_word_score_mean_rank_exact(spark):
    docs = spark.createDataFrame(
        [("a", "cat cat dog"), ("b", "dog bird bird")], ["doc_id", "text"]
    )
    # corpus counts: cat 2, dog 2, bird 2 -> ranks by word: bird 1, cat 2, dog 3
    ranks = word_rank_table(docs)
    got = {
        r.doc_id: (r.n_words, r.mean_rank)
        for r in with_rare_word_score(docs, ranks).collect()
    }
    assert got["a"] == (3, (2 + 2 + 3) / 3)
    assert got["b"] == (3, (3 + 1 + 1) / 3)


def test_sequence_packing_offsets_contiguous(spark):
    """Within each shard, canonical-order offsets tile the token stream
    exactly (no gaps/overlaps) and bin_id = offset // seq_len."""
    from table_extractor_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + i % 7))) for i in range(40)],
        ["doc_id", "text"],
    )
    out = pack_sequences(docs, seq_len=16, n_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert sum(len(v) for v in by_shard.values()) == 40
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.start_offset)
        expect = 0
        for r in rows:
            assert r.start_offset == expect, (shard, r)
            assert r.bin_id == r.start_offset // 16
            expect += r.n_tokens


def test_domain_mix_rates_hit_target_share(spark, tmp_path):
    """The ppm rates reproduce the target mix: a domain over its target is
    downsampled toward it; zh (target 0) drops out entirely."""
    import json
    import __spark_entry__ as e

    q = e.queries()["domain_mix_sample"]
    out = q(spark, "/root/testdata/sf0.001").collect()
    langs = {r.lang for r in out}
    assert "zh" not in langs
    assert all(0 <= r.keep_ppm <= 1_000_000 for r in out)


def test_paragraph_dedup_first_occurrence_wins(spark):
    """A paragraph repeated across docs survives only at its min (doc, pos)
    occurrence; docs reassemble in order; counts are honest."""
    from table_extractor_spark.operators.dedup import paragraph_dedup

    p1 = " ".join(f"a{i}" for i in range(10))
    p2 = " ".join(f"b{i}" for i in range(10))
    p3 = " ".join(f"c{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, f"{p1} {p2}"),        # first occurrences of p1, p2
            (2, f"{p2} {p3}"),        # p2 repeated -> dropped; p3 kept
            (3, f"{p1} {p2}"),        # everything repeated -> empty
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.text, r.n_kept, r.n_total)
        for r in paragraph_dedup(docs).collect()
    }
    assert got[1] == (f"{p1} {p2}", 2, 2)
    assert got[2] == (p3, 1, 2)
    assert got[3] == ("", 0, 2)


def test_fuzzy_contamination_flags_near_duplicate_of_benchmark(spark):
    from table_extractor_spark.operators.contamination import (
        fuzzy_contamination_report,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    near = base.replace("theta", "thetaX", 1)  # light paraphrase of b1
    docs = spark.createDataFrame(
        [
            ("b1", base),
            ("t1", near),
            ("t2", "completely unrelated words about something else entirely"),
        ],
        ["doc_id", "text"],
    )
    bench = docs.filter(F.col("doc_id") == "b1")
    got = {
        r.a: r
        for r in fuzzy_contamination_report(docs, bench).collect()
    }
    # the near-copy collides in LSH and clears the estimate threshold
    assert "t1" in got and got["t1"].contaminated
    assert got["t1"].bench_id == "b1"
    assert got["t1"].n_sig_match >= 8
    assert got["t1"].est_jaccard == got["t1"].n_sig_match / 16.0
    # the unrelated doc never becomes a candidate
    assert "t2" not in got
    # benchmark docs are not reported as training hits
    assert "b1" not in got


def test_fuzzy_contamination_identical_doc_matches_all_components(spark):
    from table_extractor_spark.operators.contamination import (
        fuzzy_contamination_report,
    )

    txt = "one two three four five six seven eight nine ten " * 3
    docs = spark.createDataFrame(
        [("b1", txt), ("t1", txt)], ["doc_id", "text"]
    )
    bench = docs.filter(F.col("doc_id") == "b1")
    rows = fuzzy_contamination_report(docs, bench).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.a, r.bench_id, r.n_sig_match, r.contaminated) == (
        "t1", "b1", 16, True
    )


def test_tfidf_top_terms_exact_quantized_scores(spark):
    from table_extractor_spark.functions.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            ("d1", "apple apple banana shared"),
            ("d2", "banana shared shared"),
            ("d3", "shared cherry"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.doc_id, r.rk): (r.word, r.tf, r.score)
        for r in tfidf_top_terms(docs).collect()
    }
    # N=3; df: apple 1, banana 2, cherry 1, shared 3
    # idf_ppm: apple/cherry 3_000_000, banana 1_500_000, shared 1_000_000
    assert out[("d1", 1)] == ("apple", 2, 6_000_000)
    assert out[("d1", 2)] == ("banana", 1, 1_500_000)
    assert out[("d1", 3)] == ("shared", 1, 1_000_000)
    assert out[("d2", 1)] == ("shared", 2, 2_000_000)
    assert out[("d2", 2)] == ("banana", 1, 1_500_000)
    assert out[("d3", 1)] == ("cherry", 1, 3_000_000)
    # d3 has only two distinct words -> exactly two ranked rows
    assert ("d3", 3) not in out and out[("d3", 2)][0] == "shared"


def test_tfidf_ties_break_on_word(spark):
    from table_extractor_spark.functions.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [("d1", "zebra apple"), ("d2", "zebra apple")], ["doc_id", "text"]
    )
    rows = tfidf_top_terms(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.rk, r.word))
    for doc in ("d1", "d2"):
        assert sorted(by_doc[doc]) == [(1, "apple"), (2, "zebra")]


def _bm25_reference(corpus, query_terms, k=10):
    """Pure-Python replica of the integer BM25 spec (k1=6/5, b=3/4 reduced
    to 22*T*tf // (10*T*tf + 3*T + 9*dl*N) ppm arithmetic)."""
    from collections import Counter

    tfs = {d: Counter(w for w in t.lower().split() if w) for d, t in corpus}
    dls = {d: sum(c.values()) for d, c in tfs.items() if c}
    N, T = len(dls), sum(dls.values())
    dfq = {
        q: sum(1 for c in tfs.values() if q in c) for q in query_terms
    }
    scores = {}
    for d, c in tfs.items():
        hit = [q for q in query_terms if q in c]
        if not hit:
            continue
        s = 0
        for q in hit:
            idf_ppm = (1_000_000 * N) // dfq[q]
            ratio_ppm = (22 * T * c[q] * 1_000_000) // (
                10 * T * c[q] + 3 * T + 9 * dls[d] * N
            )
            s += (idf_ppm * ratio_ppm) // 1_000_000
        scores[d] = (len(hit), s)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:k]
    return [(d, n, s) for d, (n, s) in ranked]


def test_bm25_topk_matches_integer_reference(spark):
    from table_extractor_spark.functions.text import bm25_topk

    corpus = [
        ("d1", "apple banana apple"),
        ("d2", "apple cherry"),
        ("d3", "banana banana banana cherry"),
        ("d4", "durian fig grape"),           # no query term: must not rank
        ("d5", "apple apple apple apple"),    # high tf, saturation visible
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = [
        (r.doc_id, r.n_terms, r.score)
        for r in bm25_topk(docs, ["apple", "cherry"]).collect()
    ]
    want = _bm25_reference(corpus, ["apple", "cherry"])
    assert got == want
    assert all(d != "d4" for d, _, _ in got)
    # multi-term match must outrank the equal-idf single-term docs
    assert got[0][0] == "d2" and got[0][1] == 2


def test_bm25_topk_tf_saturation_and_length_normalization(spark):
    from table_extractor_spark.functions.text import bm25_topk

    # same tf for 'apple' but a much longer doc -> lower score (b-norm);
    # quadrupled tf in d5 must score less than 4x d1 (k1 saturation)
    corpus = [
        ("d1", "apple filler"),
        ("d2", "apple " + " ".join(["filler"] * 30)),
        ("d5", "apple apple apple apple filler"),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    s = {r.doc_id: r.score for r in bm25_topk(docs, ["apple"]).collect()}
    assert s["d1"] > s["d2"]
    assert s["d1"] < s["d5"] < 4 * s["d1"]


def test_bm25_topk_plan_is_takeordered_with_broadcast_terms(spark):
    from table_extractor_spark.functions.text import bm25_topk

    docs = spark.createDataFrame(
        [(str(i), f"apple w{i % 5}") for i in range(50)], ["doc_id", "text"]
    )
    plan = (
        bm25_topk(docs, ["apple"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # global top-k is per-partition heads + driver merge, never a full sort
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def _unimax_reference(counts, budget, epochs):
    """True-greedy UniMax (Chung et al. 2023 Alg. 1) with the integer
    remainder spec: uncapped groups consume their fair share immediately,
    so the capped set is a prefix of the ascending-count order."""
    from fractions import Fraction

    s = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    L, rem, i, alloc = len(s), Fraction(budget), 0, {}
    for g, c in s:
        if Fraction(c * epochs) < rem / (L - i):
            alloc[g] = c * epochs
            rem -= c * epochs
            i += 1
        else:
            break
    unc = [g for g, _ in s[i:]]
    if unc:
        q, r = divmod(budget - sum(alloc.values()), len(unc))
        for j, g in enumerate(unc):
            alloc[g] = q + (1 if j < r else 0)
    return alloc


def test_unimax_allocation_matches_greedy_reference(spark):
    from table_extractor_spark.operators.packing import unimax_allocation

    cases = [
        ({"en": 1000, "de": 100, "zh": 50, "fr": 7}, 1200, 2),
        ({"en": 1000, "de": 100}, 5000, 2),   # every group capped: underspend
        ({"a": 3, "b": 3, "c": 3}, 7, 1),     # remainder goes to sort-firsts
        ({"x": 10}, 100, 3),
        ({"en": 500, "de": 500, "fr": 123}, 1000, 2),
        ({"a": 1, "b": 10, "c": 100, "d": 1000}, 600, 3),  # mixed prefix
    ]
    for counts, budget, epochs in cases:
        df = spark.createDataFrame(
            list(counts.items()), ["lang", "n_tokens"]
        )
        out = unimax_allocation(df, budget, epochs).collect()
        got = {r.lang: r.alloc_tokens for r in out}
        want = _unimax_reference(counts, budget, epochs)
        assert got == want, (counts, budget, epochs, got, want)
        # cap invariant: nobody beyond max_epochs passes
        for r in out:
            assert r.alloc_tokens <= epochs * counts[r.lang]
            assert r.epochs_ppm == (1_000_000 * r.alloc_tokens) // counts[r.lang]
        # full spend unless everyone is capped
        if not all(r.capped for r in out):
            assert sum(got.values()) == budget


def test_unimax_allocation_validates_inputs(spark):
    import pytest
    from table_extractor_spark.operators.packing import unimax_allocation

    df = spark.createDataFrame([("en", 10)], ["lang", "n_tokens"])
    with pytest.raises(ValueError):
        unimax_allocation(df, -1, 2)
    with pytest.raises(ValueError):
        unimax_allocation(df, 10, 0)


def test_unimax_allocation_zero_count_group_is_null_ppm(spark):
    from table_extractor_spark.operators.packing import unimax_allocation

    zc = spark.createDataFrame([("a", 0), ("b", 10)], ["lang", "n_tokens"])
    out = {r.lang: (r.alloc_tokens, r.epochs_ppm)
           for r in unimax_allocation(zc, 15, 2).collect()}
    # a zero-count group allocates its (zero) cap; ppm audit is NULL, not
    # an ANSI divide-by-zero
    assert out["a"] == (0, None)
    assert out["b"] == (15, 1_500_000)


# --- sliding-window chunking ---------------------------------------------


def test_chunk_documents_covers_every_token_with_overlap(spark):
    """seq_len=4, stride=3 over 10 tokens -> starts 0,3,6; the tail window
    is short-capped, every token is inside >=1 chunk, consecutive chunks
    overlap by seq_len - stride, and hashes pin the exact chunk payloads."""
    import hashlib

    from table_extractor_spark.operators.packing import chunk_documents

    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame(
        [("d1", " ".join(words)), ("d2", "a b"), ("d3", "solo")],
        "doc_id string, text string",
    )
    rows = sorted(
        (r.doc_id, r.chunk_idx, r.start_token, r.n_tokens, r.chunk_hash)
        for r in chunk_documents(df, seq_len=4, stride=3).collect()
    )

    def h(ws):
        return hashlib.md5(" ".join(ws).encode()).hexdigest()

    assert rows == [
        ("d1", 0, 0, 4, h(words[0:4])),
        ("d1", 1, 3, 4, h(words[3:7])),
        ("d1", 2, 6, 4, h(words[6:10])),
        ("d2", 0, 0, 2, h(["a", "b"])),
        ("d3", 0, 0, 1, h(["solo"])),
    ]
    # coverage + overlap invariants, computed from the emitted index
    d1 = [r for r in rows if r[0] == "d1"]
    covered = set()
    for _, _, start, n, _ in d1:
        covered |= set(range(start, start + n))
    assert covered == set(range(10))
    for a, b in zip(d1, d1[1:]):
        assert a[2] + a[3] - b[2] == 4 - 3 + 0  # overlap = seq_len - stride


def test_chunk_documents_is_shuffle_free_and_validated(spark):
    import pytest

    from table_extractor_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([("d", "a b c")], "doc_id string, text string")
    plan = (
        chunk_documents(df, seq_len=4, stride=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    with pytest.raises(ValueError):
        chunk_documents(df, seq_len=4, stride=5)  # would skip tokens
    with pytest.raises(ValueError):
        chunk_documents(df, seq_len=0, stride=1)


def test_chunk_documents_ignores_empty_tokens(spark):
    """Doubled/trailing spaces must not count as tokens — chunk n_tokens
    follows the same non-empty-token accounting as dedup/BM25/UniMax, and
    the chunk payload hash is over the FILTERED token slice."""
    import hashlib

    from table_extractor_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [("d", "a  b   c "), ("clean", "a b c")],
        "doc_id string, text string",
    )
    rows = {
        r.doc_id: (r.chunk_idx, r.start_token, r.n_tokens, r.chunk_hash)
        for r in chunk_documents(df, seq_len=4, stride=3).collect()
    }
    h = hashlib.md5(b"a b c").hexdigest()
    assert rows["d"] == (0, 0, 3, h)
    # whitespace-normalized text chunks identically to clean text
    assert rows["d"] == rows["clean"]


def test_bm25_topk_rejects_empty_query(spark):
    import pytest

    from table_extractor_spark.functions.text import bm25_topk

    df = spark.createDataFrame([("d", "a b c")], "doc_id string, text string")
    with pytest.raises(ValueError, match="query term"):
        bm25_topk(df, [])
