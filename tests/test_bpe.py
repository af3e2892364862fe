"""Distributed BPE vs a pure-Python textbook reference, plus determinism
and scale-shape pins."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from table_extractor_spark.operators import bpe as B

SF = "/root/testdata/sf0.001"


def _py_bpe(word_counts: dict, n_merges: int, min_pair_count: int = 2):
    """Textbook BPE (Sennrich et al. 2016 pseudo-code shape): greedy
    left-to-right non-overlapping merges, most-frequent pair first, ties
    (count desc, left asc, right asc)."""
    vocab = {
        tuple(list(w) + [B.END_OF_WORD]): n for w, n in word_counts.items()
    }
    rules = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        rules.append((rank, a, b, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return rules


def _word_counts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return {r.w: r.n for r in rows}


def test_bpe_train_matches_textbook_reference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = B.bpe_train(docs, n_merges=12)
    want = _py_bpe(_word_counts(spark), n_merges=12)
    assert got == want


def test_bpe_greedy_merge_nonoverlap(spark):
    """'aaa' + (a,a) must become [aa, a] — the left-to-right greedy scan,
    not all-overlapping-pairs."""
    df = spark.createDataFrame([(["a", "a", "a", "a", "a"],)], "syms array<string>")
    out = df.select(B.apply_merge(F.col("syms"), "a", "a").alias("m")).collect()
    assert out[0].m == ["aa", "aa", "a"]


def test_bpe_train_partition_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    r1 = B.bpe_train(docs.repartition(2), n_merges=6)
    r2 = B.bpe_train(docs.repartition(13), n_merges=6)
    assert r1 == r2 and len(r1) == 6


def test_bpe_encode_roundtrip(spark):
    """Encoding rebuilds each document exactly: concatenating the subword
    tokens (markers stripped) gives back the whitespace-joined words."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    rules = B.bpe_train(docs, n_merges=8)
    enc = B.bpe_encode(docs, rules)
    rows = enc.select("text", "bpe_tokens").collect()
    assert rows
    for r in rows:
        rebuilt = "".join(r.bpe_tokens).replace(B.END_OF_WORD, " ").rstrip()
        assert rebuilt == " ".join(w for w in r.text.split(" ") if w != "")
    # the learned merges actually compress: fewer tokens than the INITIAL
    # symbol count (characters + one end-of-word marker per word)
    n_tok = enc.select(F.sum(F.size("bpe_tokens"))).collect()[0][0]
    n_char = enc.select(
        F.sum(F.size(F.split(F.regexp_replace("text", " ", ""), "")))
    ).collect()[0][0]
    n_words = enc.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda w: w != "")))
    ).collect()[0][0]
    assert n_tok < n_char + n_words


def test_bpe_encode_arrow_matches_expr(spark):
    """The Arrow (mapInPandas) encoder — the production path for 32k+
    vocabularies — must produce exactly the expression path's tokens."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(80)
    rules = B.bpe_train(docs, n_merges=8)

    def snap(method):
        return sorted(
            (r.doc_id, tuple(r.bpe_tokens))
            for r in B.bpe_encode(docs, rules, method=method)
            .select("doc_id", "bpe_tokens").collect()
        )

    assert snap("arrow") == snap("expr")
    # auto dispatches by rule count
    big = rules * 20  # fake >64 rules to exercise the dispatch threshold
    assert len(big) > B.EXPR_ENCODE_MAX_RULES
    out = B.bpe_encode(docs, big, method="auto")
    assert "mapInPandas" in out._jdf.queryExecution().logical().toString() \
        or "MapInPandas" in out._jdf.queryExecution().logical().toString()


def test_bpe_decode_inverts_encode(spark):
    """bpe_decode is the rank-independent inverse of bpe_encode: the
    distributed decoder reconstructs each document's normalized text
    (nonempty words joined by single spaces) for any learned vocabulary,
    entirely in JVM column ops."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    rules = B.bpe_train(docs, n_merges=8)
    dec = B.bpe_decode(B.bpe_encode(docs, rules), out_col="decoded")
    rows = dec.select("text", "decoded").collect()
    assert rows
    for r in rows:
        normalized = " ".join(w for w in r.text.split(" ") if w != "")
        assert r.decoded == normalized
    # also holds with zero rules (pure char vocabulary)
    dec0 = B.bpe_decode(B.bpe_encode(docs, []), out_col="decoded")
    bad = dec0.filter(
        F.col("decoded")
        != F.array_join(
            F.filter(F.split("text", " "), lambda w: w != ""), " "
        )
    ).count()
    assert bad == 0


def test_bpe_fertility_matches_pure_python(spark):
    """Per-lang fertility ppm recomputed from the textbook reference's
    symbol tables: encode each word type, weight by per-lang occurrence."""
    from table_extractor_spark.plans import queries as Q

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    wc = _word_counts(spark)
    rules = _py_bpe(wc, 6)

    def encode(word):
        syms = list(word) + [B.END_OF_WORD]
        for _, a, b, _c in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    want = {}
    for r in docs.select("lang", "text").collect():
        ws = [w for w in r.text.split(" ") if w]
        nw, nb = want.get(r.lang, (0, 0))
        want[r.lang] = (nw + len(ws), nb + sum(encode(w) for w in ws))

    got = {
        r.lang: (r.n_words, r.n_bpe_tokens, r.fertility_ppm)
        for r in Q.queries()["bpe_fertility_by_lang"](spark, SF).collect()
    }
    assert set(got) == {k for k, v in want.items() if v[0] > 0}
    for lang, (nw, nb) in want.items():
        if nw == 0:
            continue
        assert got[lang] == (nw, nb, (1_000_000 * nb) // nw), lang
