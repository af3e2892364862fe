"""Property tests: the JVM-side column functions must agree with trivially
correct pure-Python models on arbitrary word-soup inputs, and the LSH chain
must respect its set-theoretic invariants on constructed corpora.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

pytestmark = pytest.mark.skipif(
    not HAVE_HYPOTHESIS, reason="hypothesis not installed"
)

_WORDS = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=30
)


def _py_dup_word_ratio(words):
    lw = [w.lower() for w in words]
    return 1.0 - len(set(lw)) / max(len(lw), 1)


def _py_dup_bigram_ratio(words):
    lw = [w.lower() for w in words]
    grams = [" ".join(lw[i : i + 2]) for i in range(len(lw) - 1)]
    if not grams:
        return 0.0
    total = sum(len(g) for g in grams)
    distinct = sum(len(g) for g in dict.fromkeys(grams))
    return 0.0 if total == 0 else 1.0 - distinct / total


@given(st.lists(_WORDS, min_size=1, max_size=8))
@settings(max_examples=25, deadline=None)
def test_repetition_ratios_match_python_model(docs):
    import table_extractor_spark  # noqa: F401  (repo on path via conftest)
    from tests.conftest import make_spark
    from pyspark.sql import functions as F
    from table_extractor_spark.functions.text import (
        dup_ngram_char_ratio,
        dup_word_ratio,
    )

    spark = make_spark()  # session reuse via getOrCreate
    rows = [(str(i), " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.dw, r.dg)
        for r in df.select(
            "doc_id",
            F.round(dup_word_ratio(F.col("text")), 9).alias("dw"),
            F.round(dup_ngram_char_ratio(F.col("text"), 2), 9).alias("dg"),
        ).collect()
    }
    for i, ws in enumerate(docs):
        dw, dg = got[str(i)]
        assert abs(dw - _py_dup_word_ratio(ws)) < 1e-9, ws
        assert abs(dg - _py_dup_bigram_ratio(ws)) < 1e-9, ws


@given(st.lists(_WORDS, min_size=2, max_size=6))
@settings(max_examples=10, deadline=None)
def test_lsh_chain_invariants(docs):
    """(1) candidate pairs are a SUBSET of all pairs; (2) byte-identical
    docs are ALWAYS candidates; (3) verified jaccard equals the python
    set-model exactly."""
    from tests.conftest import make_spark
    from table_extractor_spark.operators.dedup import (
        lsh_buckets,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard,
        word_shingles,  # noqa: F401
    )

    spark = make_spark()
    rows = [(f"d{i}", " ".join(ws)) for i, ws in enumerate(docs)]
    # plant one guaranteed duplicate pair
    rows.append(("dup_x", rows[0][1]))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    buckets = lsh_buckets(minhash_signatures(df))
    pairs = {(r.a, r.b) for r in lsh_candidate_pairs(buckets).collect()}
    ids = [r[0] for r in rows]
    all_pairs = {(a, b) for a in ids for b in ids if a < b}
    assert pairs <= all_pairs
    assert (min("d0", "dup_x"), max("d0", "dup_x")) in pairs

    if pairs:
        pairs_df = spark.createDataFrame(sorted(pairs), ["a", "b"])
        texts = dict(rows)

        def shingles(t):
            ws = t.split(" ")
            k = 3
            if len(ws) >= k:
                return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}
            return {" ".join(ws)}

        for r in ngram_jaccard(df, pairs_df).collect():
            sa, sb = shingles(texts[r.a]), shingles(texts[r.b])
            expect = len(sa & sb) / len(sa | sb)
            assert abs(r.jaccard - expect) < 1e-12, (r.a, r.b)
