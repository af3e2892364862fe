"""C2. Training-data pipeline queries: mixing, sampling, retrieval, sketches, ANN.

Split out of plans/queries.py in round 6 — same registrations, same
oracle pairing, same engine-parity rules (see the plans/queries.py
module docstring); the @register calls execute when plans/queries.py
imports this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import text as T
from ..operators import similarity as S
from ..sources.tables import load_table
from .registry import DUCK_HASH, register, spark_hash
from .battery_dedup_text import _DUCK_SHINGLES, _DUCK_SIGS_CTE

# target pre-training language mix (parts-per-million); zh deliberately 0
# to exercise the drop-a-domain path end to end
_MIX_PPM = {"en": 500_000, "de": 200_000, "fr": 200_000, "es": 100_000, "zh": 0}


@register(
    "domain_mix_sample",
    oracle=f"""
WITH t AS (
  SELECT unnest(['en','de','fr','es','zh']) AS lang,
         unnest([500000, 200000, 200000, 100000, 0]) AS target_ppm
), c AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
), total AS (SELECT COUNT(*) AS n_total FROM documents),
rates AS (
  SELECT c.lang,
         least(1000000,
               CAST(floor(t.target_ppm * total.n_total / c.n) AS BIGINT))
           AS keep_ppm
  FROM c JOIN t ON c.lang = t.lang CROSS JOIN total
)
SELECT d.doc_id, d.lang, r.keep_ppm
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE {DUCK_HASH.format("'mix:' || CAST(d.doc_id AS VARCHAR)")} % 1000000
      < r.keep_ppm
""",
)
def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/language mixing: per-lang deterministic downsampling toward a
    target mix.  keep rate (ppm, integer arithmetic so every engine agrees)
    = target_share * corpus_total / domain_count, capped at 1; a doc keeps
    iff H('mix:'||id) %% 1e6 < rate — reproducible, no RNG state.  Counts
    are one groupBy; the rate table is broadcast-tiny."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n"))
    n_total = docs.count()
    targets = spark.createDataFrame(
        [(k, v) for k, v in _MIX_PPM.items()], ["lang", "target_ppm"]
    )
    rates = (
        counts.join(F.broadcast(targets), "lang")
        .select(
            "lang",
            F.least(
                F.lit(1_000_000),
                F.floor(
                    F.col("target_ppm") * F.lit(n_total) / F.col("n")
                ).cast("long"),
            ).alias("keep_ppm"),
        )
    )
    h = spark_hash(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(h % 1_000_000 < F.col("keep_ppm"))
        .select("doc_id", "lang", "keep_ppm")
    )


@register(
    "domain_mix_temperature",
    oracle=f"""
WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
mn AS (SELECT MIN(n) AS n_min FROM c),
rates AS (
  SELECT lang,
         CAST(floor(1000000 * sqrt(CAST(mn.n_min AS DOUBLE) / n)) AS BIGINT)
           AS keep_ppm
  FROM c, mn
)
SELECT d.doc_id, d.lang, r.keep_ppm
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE {DUCK_HASH.format("'mixt:' || CAST(d.doc_id AS VARCHAR)")} % 1000000
      < r.keep_ppm
""",
)
def domain_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (the multilingual-pretraining
    alternative to fixed target shares): sampled counts ∝ n^alpha with
    alpha = 1/2, i.e. keep rate (n_min/n)^(1/2) with the rarest language
    kept whole.  alpha = 1/2 specifically so the rate is a single sqrt —
    IEEE-correctly-rounded, unlike general pow — times one division and a
    floor: bit-deterministic in every engine, same integer-ppm hash-
    threshold mechanism as ``domain_mix_sample``."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n"))
    n_min = counts.agg(F.min("n")).collect()[0][0]
    rates = counts.select(
        "lang",
        F.floor(
            F.lit(1_000_000) * F.sqrt(F.lit(n_min).cast("double") / F.col("n"))
        ).cast("long").alias("keep_ppm"),
    )
    h = spark_hash(F.concat(F.lit("mixt:"), F.col("doc_id").cast("string")))
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(h % 1_000_000 < F.col("keep_ppm"))
        .select("doc_id", "lang", "keep_ppm")
    )


@register(
    "unimax_allocation",
    oracle="""
WITH tok AS (
  SELECT lang,
         CAST(SUM(len(list_filter(string_split(lower(text), ' '),
                                  w -> w <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT CAST(3 * SUM(n_tokens) // 2 AS BIGINT) AS budget FROM tok),
pos AS (
  SELECT lang, n_tokens, 2 * n_tokens AS cap,
         row_number() OVER (ORDER BY n_tokens, lang) AS pos,
         COALESCE(CAST(SUM(2 * n_tokens) OVER (
             ORDER BY n_tokens, lang
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS BIGINT), 0) AS cumprev,
         COUNT(*) OVER () AS L
  FROM tok
),
flg AS (
  SELECT p.*, t.budget,
         (t.budget - cumprev) > cap * (L - pos + 1) AS capped
  FROM pos p CROSS JOIN tot t
),
tots AS (
  SELECT CAST(COUNT(*) FILTER (capped) AS BIGINT) AS k,
         COALESCE(CAST(SUM(cap) FILTER (capped) AS BIGINT), 0) AS capsum
  FROM flg
),
alloc AS (
  SELECT f.lang, f.n_tokens, f.capped,
         CAST(CASE WHEN f.capped THEN f.cap
              ELSE (f.budget - t.capsum) // (f.L - t.k)
                   + CASE WHEN f.pos - t.k
                               <= (f.budget - t.capsum) % (f.L - t.k)
                          THEN 1 ELSE 0 END
              END AS BIGINT) AS alloc_tokens
  FROM flg f CROSS JOIN tots t
)
SELECT lang, n_tokens, capped, alloc_tokens,
       CAST((1000000 * alloc_tokens) // n_tokens AS BIGINT) AS epochs_ppm
FROM alloc
""",
)
def unimax_allocation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-capped per-language token-budget allocation (operators/packing
    ``unimax_allocation``; integer-exact UniMax, Chung et al. NeurIPS
    2023): budget = 1.5x the corpus token count, cap = 2 epochs — small
    languages are upsampled toward uniform but never beyond two passes
    (the repeat cap plain temperature mixing lacks), so at this corpus's
    skew both branches run: the small languages hit their caps and the
    dominant language absorbs the remainder.  The corpus-sized work
    is one partial-agg'd per-lang token count; the allocation itself runs
    on the bounded group table (one ordering window + a 1-row broadcast
    of the capped-prefix totals).  The budget scalar is a single
    collect()ed row — the sanctioned bounded-driver-traffic shape."""
    from ..operators.packing import unimax_allocation

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "lang",
            F.size(
                F.filter(
                    F.split(F.lower(F.col("text")), " "),
                    lambda w: w != "",
                )
            ).alias("__n"),
        )
        .groupBy("lang")
        .agg(F.sum("__n").cast("long").alias("n_tokens"))
        .persist()  # the budget collect and the allocation share one scan
    )
    total = int(tok.agg(F.sum("n_tokens")).collect()[0][0])
    return unimax_allocation(tok, 3 * total // 2, max_epochs=2)


@register(
    "deterministic_split",
    oracle=f"""
WITH s AS (
  SELECT doc_id, lang,
         {DUCK_HASH.format("'split:' || CAST(doc_id AS VARCHAR)")} % 100
           AS slot
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN slot < 90 THEN 'train'
            WHEN slot < 95 THEN 'val' ELSE 'test' END AS split
FROM s
""",
)
def deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment: content-independent hash of
    the doc id into 100 slots (never rand() — resuming, re-running, or
    re-partitioning must not move documents between splits; the salt prefix
    decouples this hash from every other doc_id hash in the pipeline).
    Zero shuffle — the split is a projection, and a partitionBy('split')
    write gives downstream jobs split-pruned scans."""
    docs = load_table(spark, sf_dir, "documents")
    slot = spark_hash(
        F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
    ) % 100
    return docs.select(
        "doc_id",
        "lang",
        F.when(slot < 90, "train").when(slot < 95, "val").otherwise("test")
        .alias("split"),
    )


@register(
    "stratified_sample",
    oracle=f"""
SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {DUCK_HASH.format("'sample:' || CAST(doc_id AS VARCHAR)")},
                    doc_id) AS rk
  FROM documents
) WHERE rk <= 20
""",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sampling: exactly k docs per language, chosen
    by deterministic hash order (never rand()/TABLESAMPLE — the sample must
    not move under re-runs or repartitioning, and hash order is unbiased
    w.r.t. any data attribute).  One shuffle on the stratum key; for
    k << stratum size at 10^12 docs, pre-filter with a hash-threshold
    (keep slot < c*k/stratum_estimate) before the window to avoid sorting
    whole strata."""
    docs = load_table(spark, sf_dir, "documents")
    h = spark_hash(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 20)
    )


@register(
    "token_count",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
         AS re_tokens
FROM documents
""",
)
def token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.whitespace_token_count(F.col("text")).alias("ws_tokens"),
        T.token_count(F.col("text")).alias("re_tokens"),
    )


@register(
    "decontamination_report",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
h AS (SELECT doc_id, {_DUCK_SHINGLES} AS hs FROM w),
bench AS (SELECT DISTINCT unnest(hs) AS bh FROM h WHERE doc_id % 97 = 0),
x AS (SELECT doc_id, unnest(hs) AS g FROM h),
hits AS (
  SELECT doc_id, COUNT(DISTINCT g) AS n
  FROM x JOIN bench ON x.g = bench.bh GROUP BY doc_id
)
SELECT h.doc_id, CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_collisions,
       COALESCE(hits.n, 0) > 0 AS contaminated
FROM h LEFT JOIN hits ON h.doc_id = hits.doc_id
""",
)
def decontamination_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/contamination): the synthetic
    'benchmark' is every 97th doc; every training doc sharing a word 3-gram
    with it gets flagged with its distinct collision count.  Benchmark
    n-gram set broadcasts (eval sets are MBs at any corpus scale); the
    corpus is never shuffled before the per-doc aggregation."""
    from ..operators.contamination import benchmark_ngrams, contamination_report

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return contamination_report(docs, benchmark_ngrams(bench))


@register(
    "fuzzy_decontamination",
    oracle=_DUCK_SIGS_CTE + """
, bench AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
bb AS (
  SELECT b.doc_id AS bench_id, band, bucket
  FROM buckets b JOIN bench ON b.doc_id = bench.doc_id
),
cand AS (
  SELECT DISTINCT t.doc_id AS a, bb.bench_id
  FROM buckets t JOIN bb ON t.band = bb.band AND t.bucket = bb.bucket
   AND t.doc_id <> bb.bench_id
  WHERE t.doc_id NOT IN (SELECT doc_id FROM bench)
),
su AS (
  SELECT doc_id, i, sig[i] AS v
  FROM sigs, generate_series(1, 16) g(i)
),
m AS (
  SELECT c.a, c.bench_id,
         CAST(SUM(CASE WHEN ta.v = tb.v THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sig_match
  FROM cand c
  JOIN su ta ON ta.doc_id = c.a
  JOIN su tb ON tb.doc_id = c.bench_id AND tb.i = ta.i
  GROUP BY c.a, c.bench_id
)
SELECT a, bench_id, n_sig_match,
       CAST(n_sig_match AS DOUBLE) / 16 AS est_jaccard,
       n_sig_match >= 8 AS contaminated
FROM m
""",
)
def fuzzy_decontamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination (operators/contamination
    ``fuzzy_contamination_report``): MinHash-estimated Jaccard of each
    training doc against the synthetic benchmark (every 5th doc — denser
    than the exact report's every-97th so sub-threshold candidates appear), LSH-pruned so only band-colliding pairs are
    scored.  Benchmark buckets and signatures broadcast; the corpus bucket
    table is probed map-side — no corpus self-join.  The oracle replays the
    shared signature CTE and counts agreeing components via a
    position-unnest join (no list lambdas on the comparison path)."""
    from ..operators.contamination import fuzzy_contamination_report

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 5 == 0)
    return fuzzy_contamination_report(docs, bench)


@register(
    "tfidf_top_terms",
    oracle="""
WITH wds AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents
),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM wds WHERE word <> ''
  GROUP BY doc_id, word
),
df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf,
         tf.tf * ((1000000 * nd.n_docs) // df.df) AS score
  FROM tf JOIN df ON tf.word = df.word CROSS JOIN nd
),
ranked AS (
  SELECT doc_id, word, tf, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word)
           AS rk
  FROM scored
)
SELECT doc_id, word, CAST(tf AS BIGINT) AS tf,
       CAST(score AS BIGINT) AS score, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
""",
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 terms by quantized tf-idf (functions/text
    ``tfidf_top_terms``): idf as the integer parts-per-million weight
    1e6*N div df, so the whole score stays exact int64 — no ln(), no float
    sum, bit-identical ranking on any engine (the transcendental-free
    policy ``rare_word_rank_score`` pins).  Corpus work is one explode +
    one (doc, word) partial-agg'd groupBy; df reuses the tf table
    (vocabulary-sized); the per-doc ranking window is the only other
    corpus-keyed shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return T.tfidf_top_terms(docs)


@register(
    "bm25_topk",
    oracle="""
WITH wds AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents
),
tok AS (SELECT doc_id, word FROM wds WHERE word <> ''),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_tokens
  FROM dl
),
qt AS (SELECT unnest(['spark', 'merge', 'vector', 'customer']) AS word),
m AS (SELECT tf.doc_id, tf.word, tf.tf FROM tf JOIN qt USING (word)),
dfq AS (SELECT word, COUNT(*) AS df FROM m GROUP BY 1),
term AS (
  SELECT m.doc_id,
         (((1000000 * s.n_docs) // dfq.df)
          * ((22 * s.total_tokens * m.tf * 1000000)
             // (10 * s.total_tokens * m.tf + 3 * s.total_tokens
                 + 9 * dl.dl * s.n_docs))) // 1000000 AS term_score
  FROM m JOIN dfq USING (word) JOIN dl USING (doc_id) CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(term_score) AS BIGINT) AS score
  FROM term GROUP BY 1
)
SELECT doc_id, n_terms, score FROM agg ORDER BY score DESC, doc_id LIMIT 10
""",
)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents for a 4-term bag-of-words query under quantized
    BM25 (functions/text ``bm25_topk``; Robertson & Walker SIGIR 1994,
    k1=1.2 b=0.75 reduced to the rational integer form — no ln(), no
    float division, bit-identical ranking on any engine).  The retrieval
    layer for topical slicing / leak audits over the curated corpus: the
    query-term join broadcasts a handful of literals so scoring touches
    only matching postings, corpus stats are a 1-row broadcast, and the
    top-k is TakeOrderedAndProject — never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    return T.bm25_topk(docs, ["spark", "merge", "vector", "customer"])


@register(
    "countmin_frequency_estimates",
    oracle="""
WITH wds AS (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
),
occ AS (SELECT word FROM wds WHERE word <> ''),
wf AS (SELECT word, COUNT(*) AS exact_cnt FROM occ GROUP BY word),
cells AS (
  SELECT t.r AS row,
         (('0x' || substr(md5(CAST(t.r AS VARCHAR) || '|' || occ.word), 1, 15))::bigint
          % 256) AS cell,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM occ, generate_series(0, 3) t(r)
  GROUP BY 1, 2
),
topw AS (SELECT word, exact_cnt FROM wf ORDER BY exact_cnt DESC, word LIMIT 20),
qc AS (
  SELECT topw.word, topw.exact_cnt, t.r AS row,
         (('0x' || substr(md5(CAST(t.r AS VARCHAR) || '|' || topw.word), 1, 15))::bigint
          % 256) AS cell
  FROM topw, generate_series(0, 3) t(r)
)
SELECT qc.word, CAST(MIN(qc.exact_cnt) AS BIGINT) AS exact_cnt,
       CAST(MIN(c.cnt) AS BIGINT) AS est_cnt
FROM qc JOIN cells c ON qc.row = c.row AND qc.cell = c.cell
GROUP BY qc.word
""",
)
def countmin_frequency_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation (operators/sketches, Cormode &
    Muthukrishnan 2005): build the d=4 x w=256 sketch over the corpus word
    stream — the aggregation key space is d*w cells REGARDLESS of corpus
    size, so the sketch partial-combines map-side into a broadcastable
    table — then estimate the exact top-20 words and pair estimate with
    truth (est >= exact by construction; the gap is the collision noise).
    Row-salted md5 hashing makes every cell and estimate bit-reproducible,
    so the oracle replays the whole sketch."""
    from ..operators import sketches as SK

    docs = load_table(spark, sf_dir, "documents")
    wds = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).filter(F.col("word") != "")
    sk = SK.countmin_sketch(wds, key_col="word")
    wf = wds.groupBy("word").agg(F.count("*").alias("exact_cnt"))
    top = wf.orderBy(F.col("exact_cnt").desc(), "word").limit(20)
    est = SK.countmin_estimate(sk, top.select("word"), key_col="word")
    return top.join(est, "word").select("word", "exact_cnt", "est_cnt")


from ..operators.sketches import _hll_alpha_ppm as _hll_alpha

_HLL_ALPHA_PPM_256 = _hll_alpha(256)  # = 718272, one shared constant
_HLL_M2C_256 = 256 * 256 * (1 << 40)  # m^2 * 2^rho_cap

_HLL_REG_CTE = """
wds AS (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
),
occ AS (SELECT word FROM wds WHERE word <> ''),
hv AS (
  SELECT word,
         (('0x' || substr(md5('b|' || word), 1, 15))::BIGINT % 256) AS bucket,
         ('0x' || substr(md5('r|' || word), 1, 15))::BIGINT AS hr
  FROM occ
),
rh AS (SELECT bucket, LEAST(40, 61 - length(bin(hr))) AS rho FROM hv),
reg AS (
  SELECT gs.b AS bucket, CAST(COALESCE(MAX(rh.rho), 0) AS BIGINT) AS rho
  FROM generate_series(0, 255) gs(b) LEFT JOIN rh ON rh.bucket = gs.b
  GROUP BY gs.b
)"""


@register(
    "hll_registers",
    oracle=f"""
WITH {_HLL_REG_CTE}
SELECT bucket, rho FROM reg
""",
)
def hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full m=256 HyperLogLog register table over the corpus word
    stream (operators/sketches.hll_sketch, Flajolet et al. 2007):
    bucket = md5-salted hash % m, rho = leading-rank of a second salted
    hash via minimal-width bin() length — identical arithmetic in both
    engines, so the oracle replays every register.  The aggregation key
    space is m regardless of corpus size (map-side partial MAX, no
    distinct pass needed — MAX is idempotent under duplicates)."""
    from ..operators import sketches as SK

    docs = load_table(spark, sf_dir, "documents")
    wds = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).filter(F.col("word") != "")
    sk = SK.hll_sketch(wds, key_col="word")
    return sk.select("bucket", F.col("rho").cast("long").alias("rho"))


@register(
    "hll_distinct_estimate",
    oracle=f"""
WITH {_HLL_REG_CTE},
agg AS (
  SELECT CAST(SUM(1::BIGINT << (40 - rho)) AS BIGINT) AS s_scaled,
         CAST(SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_empty,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM reg
)
SELECT m, v_empty, s_scaled,
       CAST(CASE WHEN v_empty = m THEN 0
            ELSE ({_HLL_ALPHA_PPM_256}
                  * (CAST({_HLL_M2C_256} AS BIGINT) // s_scaled)) // 1000000
            END AS BIGINT) AS est_distinct,
       (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) FROM occ)
         AS exact_distinct
FROM agg
""",
)
def hll_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact HyperLogLog cardinality estimate over the corpus
    vocabulary, paired with the exact distinct count for audit (the gap
    is the sketch error; sigma ~ 1.04/sqrt(256) = 6.5%).  S, the
    harmonic term, and the ppm-alpha multiply are all int64-exact (no
    transcendentals, overflow guarded by assert_true), so the DuckDB
    oracle replays the ESTIMATE itself, not just the registers.  At
    100 TB the exact column is the thing you can no longer afford — the
    sketch side is one m-row table per shard plus a bucket-wise max."""
    from ..operators import sketches as SK

    docs = load_table(spark, sf_dir, "documents")
    wds = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).filter(F.col("word") != "")
    est = SK.hll_estimate(SK.hll_sketch(wds, key_col="word"))
    exact = wds.agg(
        F.count_distinct("word").cast("long").alias("exact_distinct")
    )
    return est.crossJoin(exact)


@register(
    "hll_vocab_by_lang",
    oracle=f"""
WITH wds AS (
  SELECT lang, unnest(string_split(lower(text), ' ')) AS word FROM documents
),
occ AS (SELECT lang, word FROM wds WHERE word <> ''),
hv AS (
  SELECT lang,
         (('0x' || substr(md5('b|' || word), 1, 15))::BIGINT % 256) AS bucket,
         ('0x' || substr(md5('r|' || word), 1, 15))::BIGINT AS hr
  FROM occ
),
rh AS (SELECT lang, bucket, LEAST(40, 61 - length(bin(hr))) AS rho FROM hv),
langs AS (SELECT DISTINCT lang FROM occ),
reg AS (
  SELECT langs.lang, gs.b AS bucket,
         CAST(COALESCE(MAX(rh.rho), 0) AS BIGINT) AS rho
  FROM langs CROSS JOIN generate_series(0, 255) gs(b)
  LEFT JOIN rh ON rh.lang IS NOT DISTINCT FROM langs.lang
              AND rh.bucket = gs.b
  GROUP BY langs.lang, gs.b
),
agg AS (
  SELECT lang,
         CAST(SUM(1::BIGINT << (40 - rho)) AS BIGINT) AS s_scaled,
         CAST(SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_empty,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM reg GROUP BY lang
),
ex AS (
  SELECT lang, CAST(COUNT(DISTINCT word) AS BIGINT) AS exact_distinct
  FROM occ GROUP BY lang
)
SELECT agg.lang, m, v_empty, s_scaled,
       CAST(CASE WHEN v_empty = m THEN 0
            ELSE ({_HLL_ALPHA_PPM_256}
                  * (CAST({_HLL_M2C_256} AS BIGINT) // s_scaled)) // 1000000
            END AS BIGINT) AS est_distinct,
       ex.exact_distinct
FROM agg JOIN ex ON agg.lang = ex.lang
""",
)
def hll_vocab_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary cardinality via grouped HyperLogLog
    (operators/sketches.hll_sketch_grouped): G*m aggregation keys
    regardless of corpus size — the per-domain/per-language richness
    profile that would otherwise cost a per-group COUNT(DISTINCT)
    keyspace shuffle at 100 TB.  Same integer-exact estimator as
    ``hll_distinct_estimate``, replayed per group by the oracle; exact
    counts joined in for audit."""
    from ..operators import sketches as SK

    docs = load_table(spark, sf_dir, "documents")
    wds = docs.select(
        "lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).filter(F.col("word") != "")
    reg = SK.hll_sketch_grouped(wds, "lang", key_col="word")
    est = SK.hll_estimate_grouped(reg, "lang")
    exact = wds.groupBy("lang").agg(
        F.count_distinct("word").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "lang")


_HLL_SLICE_EST = """
  SELECT CAST(CASE WHEN SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) = 256
              THEN 0
              ELSE ({alpha}
                    * (CAST({m2c} AS BIGINT)
                       // CAST(SUM(1::BIGINT << (40 - rho)) AS BIGINT)))
                   // 1000000
              END AS BIGINT)
  FROM reg_{slice}
"""


@register(
    "hll_intersection_estimate",
    oracle=f"""
WITH wds AS (
  SELECT lang, unnest(string_split(lower(text), ' ')) AS word FROM documents
),
occ AS (SELECT lang, word FROM wds WHERE word <> ''),
hv AS (
  SELECT lang,
         (('0x' || substr(md5('b|' || word), 1, 15))::BIGINT % 256) AS bucket,
         ('0x' || substr(md5('r|' || word), 1, 15))::BIGINT AS hr
  FROM occ WHERE lang IN ('en', 'de')
),
rh AS (SELECT lang, bucket, LEAST(40, 61 - length(bin(hr))) AS rho FROM hv),
reg_a AS (
  SELECT gs.b AS bucket, CAST(COALESCE(MAX(rh.rho), 0) AS BIGINT) AS rho
  FROM generate_series(0, 255) gs(b)
  LEFT JOIN rh ON rh.bucket = gs.b AND rh.lang = 'en' GROUP BY gs.b
),
reg_b AS (
  SELECT gs.b AS bucket, CAST(COALESCE(MAX(rh.rho), 0) AS BIGINT) AS rho
  FROM generate_series(0, 255) gs(b)
  LEFT JOIN rh ON rh.bucket = gs.b AND rh.lang = 'de' GROUP BY gs.b
),
reg_u AS (
  SELECT gs.b AS bucket, CAST(COALESCE(MAX(rh.rho), 0) AS BIGINT) AS rho
  FROM generate_series(0, 255) gs(b)
  LEFT JOIN rh ON rh.bucket = gs.b GROUP BY gs.b
),
est AS (
  SELECT ({_HLL_SLICE_EST.format(alpha=_HLL_ALPHA_PPM_256,
                                 m2c=_HLL_M2C_256, slice='a')}) AS est_a,
         ({_HLL_SLICE_EST.format(alpha=_HLL_ALPHA_PPM_256,
                                 m2c=_HLL_M2C_256, slice='b')}) AS est_b,
         ({_HLL_SLICE_EST.format(alpha=_HLL_ALPHA_PPM_256,
                                 m2c=_HLL_M2C_256, slice='u')}) AS est_union
),
ex AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection FROM (
    SELECT word FROM occ WHERE lang = 'en'
    INTERSECT
    SELECT word FROM occ WHERE lang = 'de'
  )
)
SELECT est_a, est_b, est_union,
       est_a + est_b - est_union AS est_intersection,
       ex.exact_intersection
FROM est CROSS JOIN ex
""",
)
def hll_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-vocabulary estimate between two language slices via HLL
    inclusion-exclusion: |A∩B| ≈ est(A) + est(B) - est(A∪B), where the
    union sketch is the bucket-wise MAX merge (``hll_merge``) — the
    cross-shard set-overlap question (vocabulary overlap, shared-user
    audiences, key-space collision between corpus drops) answered from
    three m-row register tables instead of a distinct-join over the full
    key space.  The estimate can undershoot or even go negative at small
    overlaps (inclusion-exclusion compounds the per-sketch sigma; the
    signed value is reported honestly, not clamped) — the exact
    intersection rides along for audit.  Same integer-exact estimator
    as ``hll_distinct_estimate``, so the oracle replays all three
    estimates bit-for-bit.  Note the estimator is the RAW HLL form (no
    ln-based linear-counting small-range correction — the integer-exact
    policy), so absolute values at this fixture's tiny vocabulary sit in
    the raw estimator's known small-n bias regime; the driver row pins
    the inclusion-exclusion ALGEBRA (here A=B=A∪B, so the intersection
    estimate equals the slice estimate exactly), and the test-suite pin
    covers the >m/2-scale error bound where raw HLL is accurate."""
    from ..operators import sketches as SK

    docs = load_table(spark, sf_dir, "documents")
    wds = docs.select(
        "lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).filter((F.col("word") != "") & F.col("lang").isin("en", "de"))
    a = wds.filter(F.col("lang") == "en").select("word")
    b = wds.filter(F.col("lang") == "de").select("word")
    # the two register tables feed their own estimate AND the union merge
    sa = SK.hll_sketch(a, key_col="word").persist()
    sb = SK.hll_sketch(b, key_col="word").persist()
    est_a = SK.hll_estimate(sa).select(F.col("est_distinct").alias("est_a"))
    est_b = SK.hll_estimate(sb).select(F.col("est_distinct").alias("est_b"))
    est_u = SK.hll_estimate(SK.hll_merge(sa, sb)).select(
        F.col("est_distinct").alias("est_union")
    )
    exact = a.intersect(b).agg(
        F.count("*").cast("long").alias("exact_intersection")
    )
    return (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .withColumn(
            "est_intersection",
            F.col("est_a") + F.col("est_b") - F.col("est_union"),
        )
        .crossJoin(exact)
    )


@register(
    "bloom_dedup_prefilter",
    oracle="""
WITH ids AS (SELECT doc_id FROM documents),
mem AS (SELECT doc_id FROM ids WHERE doc_id % 3 <> 0),
mbits AS (
  SELECT DISTINCT
         (('0x' || substr(md5(CAST(t.h AS VARCHAR) || '|'
                              || CAST(mem.doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 1024) AS bit
  FROM mem, generate_series(0, 2) t(h)
),
pbits AS (
  SELECT ids.doc_id,
         (('0x' || substr(md5(CAST(t.h AS VARCHAR) || '|'
                              || CAST(ids.doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 1024) AS bit
  FROM ids, generate_series(0, 2) t(h)
)
SELECT p.doc_id,
       CAST(MIN(CASE WHEN mb.bit IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS bloom_hit,
       CAST(CASE WHEN p.doc_id % 3 <> 0 THEN 1 ELSE 0 END AS BIGINT)
         AS exact_member
FROM pbits p LEFT JOIN mbits mb ON p.bit = mb.bit
GROUP BY p.doc_id
""",
)
def bloom_dedup_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter standing-corpus membership screen (operators/
    sketches.bloom_bits/bloom_probe, Bloom CACM 1970): the doc ids with
    doc_id % 3 != 0 play the already-ingested corpus; every doc id plays
    the incoming batch.  The set-bit table is <= 1024 rows no matter how
    many members, broadcasts, and each probe resolves map-side —
    bloom_hit = 0 PROVES novelty (skip the standing-index join),
    bloom_hit = 1 routes to the exact path; exact_member ships alongside
    so the driver hash pins both the no-false-negative invariant and the
    exact false-positive tail at these parameters."""
    from ..operators import sketches as SK

    ids = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("doc_id").cast("string").alias("key")
    )
    bloom = SK.bloom_bits(
        ids.filter(F.col("doc_id") % 3 != 0), bits=1024, hashes=3
    )
    # the probe side stays shuffle-free: one broadcast bit array, verdict
    # computed map-side, exact_member derived in the same projection
    return SK.bloom_probe(bloom, ids, bits=1024, hashes=3).select(
        "doc_id",
        "bloom_hit",
        (F.col("doc_id") % 3 != 0).cast("long").alias("exact_member"),
    )


@register(
    "doc_length_quantiles_by_lang",
    oracle="""
WITH tc AS (
  SELECT lang,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              w -> w <> '')) AS BIGINT) AS n
  FROM documents
),
hist AS (SELECT lang, n // 8 AS bin, COUNT(*) AS cnt FROM tc GROUP BY 1, 2),
cum AS (
  SELECT lang, bin,
         SUM(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY lang) AS n_total
  FROM hist
),
probs AS (SELECT * FROM (VALUES (500000), (900000)) p(p_ppm)),
br AS (
  SELECT c.lang, p.p_ppm, MIN(c.bin) AS qbin
  FROM probs p JOIN cum c ON c.cum * 1000000 >= p.p_ppm * c.n_total
  GROUP BY c.lang, p.p_ppm
),
vc AS (SELECT lang, n, COUNT(*) AS cnt FROM tc GROUP BY 1, 2),
vcum AS (
  SELECT lang, n,
         SUM(cnt) OVER (PARTITION BY lang ORDER BY n) AS cum,
         SUM(cnt) OVER (PARTITION BY lang) AS n_total
  FROM vc
),
ex AS (
  SELECT v.lang, p.p_ppm, MIN(v.n) AS exact_q
  FROM probs p JOIN vcum v ON v.cum * 1000000 >= p.p_ppm * v.n_total
  GROUP BY v.lang, p.p_ppm
)
SELECT br.lang, CAST(br.p_ppm AS BIGINT) AS p_ppm,
       CAST(br.qbin * 8 AS BIGINT) AS est_lo,
       CAST(br.qbin * 8 + 7 AS BIGINT) AS est_hi,
       CAST(ex.exact_q AS BIGINT) AS exact_q
FROM br JOIN ex ON br.lang = ex.lang AND br.p_ppm = ex.p_ppm
""",
)
def doc_length_quantiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length profile via grouped histogram quantile
    brackets (operators/sketches.histogram_sketch_grouped): G * bins
    aggregation keys, the cumsum window partitioned by group (no
    single-partition stage at any G), and the exact per-group quantile
    rides along at bin_width = 1 so one driver hash pins per-group
    bracket containment — the per-domain doc-length audit a curation
    pipeline wants at 100 TB without per-group sorts."""
    from ..operators import sketches as SK

    probs = (500_000, 900_000)
    docs = load_table(spark, sf_dir, "documents")
    tc = docs.select(
        "lang",
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), " "), lambda w: w != ""
            )
        )
        .cast("long")
        .alias("n"),
    )
    br = SK.histogram_quantile_brackets_grouped(
        SK.histogram_sketch_grouped(tc, "lang", val_col="n", bin_width=8),
        "lang",
        probs,
        bin_width=8,
    )
    ex = SK.histogram_quantile_brackets_grouped(
        SK.histogram_sketch_grouped(tc, "lang", val_col="n", bin_width=1),
        "lang",
        probs,
        bin_width=1,
    ).select("lang", "p_ppm", F.col("est_lo").alias("exact_q"))
    return br.join(F.broadcast(ex), ["lang", "p_ppm"]).select(
        "lang", "p_ppm", "est_lo", "est_hi", "exact_q"
    )


@register(
    "frequent_trigrams_screen",
    oracle="""
WITH dd AS (SELECT string_split(lower(text), ' ') AS w FROM documents),
pos AS (
  SELECT w, unnest(generate_series(1, len(w) - 2)) AS i
  FROM dd WHERE len(w) >= 3
),
g AS (SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS key FROM pos),
cells AS (
  SELECT t.r AS row,
         (('0x' || substr(md5(CAST(t.r AS VARCHAR) || '|' || g.key),
                          1, 15))::BIGINT % 4096) AS cell,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM g, generate_series(0, 3) t(r)
  GROUP BY 1, 2
),
dk AS (SELECT DISTINCT key FROM g),
est AS (
  SELECT dk.key, CAST(MIN(c.cnt) AS BIGINT) AS est_cnt
  FROM dk CROSS JOIN generate_series(0, 3) t(r)
  JOIN cells c
    ON c.row = t.r
   AND c.cell = (('0x' || substr(md5(CAST(t.r AS VARCHAR) || '|' || dk.key),
                                 1, 15))::BIGINT % 4096)
  GROUP BY dk.key
),
cand AS (SELECT * FROM est WHERE est_cnt >= 5),
exact AS (
  SELECT g.key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM g JOIN cand ON g.key = cand.key
  GROUP BY g.key
)
SELECT cand.key, cand.est_cnt, exact.cnt
FROM cand JOIN exact ON cand.key = exact.key
WHERE exact.cnt >= 5
""",
)
def frequent_trigrams_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-screened heavy hitters (operators/sketches.
    countmin_heavy_hitters) over word trigrams: the sketch collapses to
    one broadcast map row, every occurrence computes its own estimate
    map-side and is filtered BEFORE any shuffle (est >= true ALWAYS, so
    no true hitter can be dropped), and the exact groupBy that follows
    runs only on surviving occurrences, removing collision noise —
    exact, provably complete hot-gram mining whose only corpus-keyed
    shuffle is over candidate occurrences.  The oracle replays sketch,
    screen, and exact pass."""
    from ..operators import sketches as SK

    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select(F.split(F.lower(F.col("text")), " ").alias("w"))
        .filter(F.size("w") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 3), "
                    "i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
                )
            ).alias("key")
        )
    )
    return SK.countmin_heavy_hitters(grams, threshold=5)


@register(
    "doc_length_quantile_sketch",
    oracle="""
WITH tc AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              w -> w <> '')) AS BIGINT) AS n
  FROM documents
),
hist AS (SELECT n // 8 AS bin, COUNT(*) AS cnt FROM tc GROUP BY 1),
cum AS (
  SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum,
         SUM(cnt) OVER () AS n_total
  FROM hist
),
probs AS (
  SELECT * FROM (VALUES (250000), (500000), (750000), (990000)) p(p_ppm)
),
br AS (
  SELECT p.p_ppm, MIN(c.bin) AS qbin
  FROM probs p JOIN cum c ON c.cum * 1000000 >= p.p_ppm * c.n_total
  GROUP BY p.p_ppm
),
vc AS (SELECT n, COUNT(*) AS cnt FROM tc GROUP BY n),
vcum AS (
  SELECT n, SUM(cnt) OVER (ORDER BY n) AS cum,
         SUM(cnt) OVER () AS n_total
  FROM vc
),
ex AS (
  SELECT p.p_ppm, MIN(v.n) AS exact_q
  FROM probs p JOIN vcum v ON v.cum * 1000000 >= p.p_ppm * v.n_total
  GROUP BY p.p_ppm
)
SELECT CAST(br.p_ppm AS BIGINT) AS p_ppm,
       CAST(br.qbin * 8 AS BIGINT) AS est_lo,
       CAST(br.qbin * 8 + 7 AS BIGINT) AS est_hi,
       CAST(ex.exact_q AS BIGINT) AS exact_q
FROM br JOIN ex ON br.p_ppm = ex.p_ppm
""",
)
def doc_length_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram quantile brackets (operators/sketches.
    histogram_sketch/histogram_quantile_brackets) over per-doc token
    counts: one bounded-key groupBy (range/8 bins regardless of corpus
    size, map-side partial combine) replaces the full-sort exact
    percentile at 100 TB, and the selected bin HARD-brackets the true
    quantile.  The exact quantile rides along via the same operator at
    bin_width = 1 (bins = distinct values — still bounded for length-
    capped docs), so the driver hash pins bracket containment."""
    from ..operators import sketches as SK

    probs = (250_000, 500_000, 750_000, 990_000)
    docs = load_table(spark, sf_dir, "documents")
    tc = docs.select(
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), " "), lambda w: w != ""
            )
        )
        .cast("long")
        .alias("n")
    )
    br = SK.histogram_quantile_brackets(
        SK.histogram_sketch(tc, val_col="n", bin_width=8), probs, bin_width=8
    )
    ex = SK.histogram_quantile_brackets(
        SK.histogram_sketch(tc, val_col="n", bin_width=1), probs, bin_width=1
    ).select("p_ppm", F.col("est_lo").alias("exact_q"))
    return br.join(F.broadcast(ex), "p_ppm").select(
        "p_ppm", "est_lo", "est_hi", "exact_q"
    )


@register(
    "rare_word_rank_score",
    oracle="""
WITH wds AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents
),
vocab AS (SELECT word, COUNT(*) AS n FROM wds GROUP BY word),
ranked AS (
  SELECT word, row_number() OVER (ORDER BY n DESC, word) AS rank FROM vocab
)
SELECT doc_id, COUNT(*) AS n_words,
       CAST(SUM(rank) AS DOUBLE) / COUNT(*) AS mean_rank
FROM wds JOIN ranked USING (word)
GROUP BY doc_id
""",
)
def rare_word_rank_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-rank quality scoring (functions/text.word_rank_table +
    with_rare_word_score): per-doc mean corpus-frequency rank — the
    integer-exact unigram-surprisal stand-in (no transcendentals, so the
    double reproduces bit-for-bit on any engine).  Vocab rank is the only
    single-partition window and it runs on the DIMENSION, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    ranks = T.word_rank_table(docs)
    return T.with_rare_word_score(docs, ranks)


# --- driver-checkable ANN oracles ------------------------------------------
#
# The ANN family runs with quantize=ANN_Q (operators/similarity.quantized):
# training, assignment, bucket, and probe arithmetic all happen on
# integer-valued doubles, where every reduction is IEEE-exact in ANY
# summation order — so the full k-means training run, the probe-list
# choices, and the ADC ranking are bit-reproducible across engines and the
# DuckDB oracle can REPLAY them (chained CTEs, one per Lloyd round) instead
# of settling for a rows-only check.  Final cosines are computed on the raw
# vectors and rounded to 6 dp (the construct the driver-green
# embedding_cosine_topk oracle already pins).  Only version-robust SQL:
# zipped unnest + plain GROUP BY / window functions on the comparison path.

ANN_Q = 1000


def _duck_ivf_cte(rounds: int, n_centroids: int = 16) -> str:
    """CTE chain replaying similarity.ivf_index(quantize=ANN_Q): exploded
    (vec_id, pos, x) integer vectors, seed = lowest-vid vectors, then per
    round assign (argmax exact cosine, ties -> lower centroid id) and
    update (floor(sum/count) — exact).  Ends with centroid table ``c{r}``
    and full-corpus assignment ``afinal(vec_id, cid)``."""
    parts = [f"""
ve AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       FROM embeddings),
vq AS (SELECT vec_id,
              unnest(list_transform(e, x -> round(x * {ANN_Q}))) AS x,
              unnest(generate_series(1, len(e))) AS pos
       FROM ve),
vqn AS (SELECT vec_id, sqrt(SUM(x * x)) AS n FROM vq GROUP BY vec_id),
c0 AS (SELECT vq.vec_id AS cid, pos, x FROM vq
       WHERE vec_id IN (SELECT vec_id FROM ve ORDER BY vec_id
                        LIMIT {n_centroids}))"""]
    for r in range(rounds):
        parts.append(f"""
c{r}n AS (SELECT cid, sqrt(SUM(x * x)) AS n FROM c{r} GROUP BY cid),
sim{r} AS (
  SELECT vq.vec_id, c.cid, SUM(vq.x * c.x) AS d
  FROM vq JOIN c{r} c USING (pos) GROUP BY vq.vec_id, c.cid
),
a{r} AS (
  SELECT vec_id, cid FROM (
    SELECT s.vec_id, s.cid,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id
             ORDER BY s.d / (q.n * c.n) DESC, s.cid) AS rk
    FROM sim{r} s JOIN vqn q ON s.vec_id = q.vec_id
                  JOIN c{r}n c ON s.cid = c.cid
  ) WHERE rk = 1
),
m{r} AS (
  SELECT a.cid, vq.pos,
         CAST(floor(SUM(vq.x) / COUNT(*)) AS DOUBLE) AS x
  FROM a{r} a JOIN vq ON a.vec_id = vq.vec_id GROUP BY a.cid, vq.pos
),
c{r + 1} AS (
  SELECT p.cid, p.pos, COALESCE(m.x, p.x) AS x
  FROM c{r} p LEFT JOIN m{r} m ON p.cid = m.cid AND p.pos = m.pos
)""")
    parts.append(f"""
cfn AS (SELECT cid, sqrt(SUM(x * x)) AS n FROM c{rounds} GROUP BY cid),
simf AS (
  SELECT vq.vec_id, c.cid, SUM(vq.x * c.x) AS d
  FROM vq JOIN c{rounds} c USING (pos) GROUP BY vq.vec_id, c.cid
),
afinal AS (
  SELECT vec_id, cid FROM (
    SELECT s.vec_id, s.cid,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id
             ORDER BY s.d / (q.n * c.n) DESC, s.cid) AS rk
    FROM simf s JOIN vqn q ON s.vec_id = q.vec_id
                JOIN cfn c ON s.cid = c.cid
  ) WHERE rk = 1
)""")
    return ",".join(parts)


# probe-list selection shared by the two IVF oracles: the nprobe nearest
# (exact-arithmetic) centroid lists per query id below ``qmax``
def _duck_ivf_probes(nprobe: int, qmax: int) -> str:
    return f"""
probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT s.vec_id, s.cid,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id
             ORDER BY s.d / (q.n * c.n) DESC, s.cid) AS rk
    FROM simf s JOIN vqn q ON s.vec_id = q.vec_id
                JOIN cfn c ON s.cid = c.cid
    WHERE s.vec_id < {qmax}
  ) WHERE rk <= {nprobe}
)"""


_DUCK_ANN_COS = """
round(
  list_sum(list_transform(generate_series(1, len(va.e)), i -> va.e[i] * vb.e[i]))
  / (sqrt(list_sum(list_transform(va.e, x -> x * x)))
     * sqrt(list_sum(list_transform(vb.e, x -> x * x)))), 6)
"""

_DUCK_ANN_TOPK = """
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
  FROM sims
) WHERE rank <= {k}
"""


def _duck_ann_lsh_bucket() -> str:
    """DuckDB replica of similarity.sign_lsh_bucket over the quantized
    vector ``q`` (planes=4; same hyperplane arithmetic the driver-green
    embedding_near_dup_pairs oracle pins, 0-based dim i -> 1-based j)."""
    terms = []
    for p in range(4):
        terms.append(
            f"(CASE WHEN list_sum(list_transform(generate_series(1, len(q)), "
            f"j -> q[j] * (CASE WHEN ((1 + (2*{p}+3+17*t.t)*(j+6)) % 13) - 6 >= 0 "
            f"THEN 1.0 ELSE -1.0 END))) >= 0 THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


@register(
    "ann_lsh_bucketed",
    oracle=f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           FROM embeddings WHERE vec_id < 200),
qv AS (SELECT vec_id, e, list_transform(e, x -> round(x * {ANN_Q})) AS q
       FROM v),
b AS (SELECT vec_id, t.t AS tbl, {_duck_ann_lsh_bucket()} AS bucket
      FROM qv, generate_series(0, 7) t(t)),
pairs AS (
  SELECT DISTINCT l.vec_id AS query_id, r.vec_id AS neighbor_id
  FROM b l JOIN b r ON l.tbl = r.tbl AND l.bucket = r.bucket
                   AND l.vec_id <> r.vec_id
),
sims AS (
  SELECT p.query_id, p.neighbor_id, {_DUCK_ANN_COS} AS cos_sim
  FROM pairs p JOIN v va ON p.query_id = va.vec_id
               JOIN v vb ON p.neighbor_id = vb.vec_id
)
{_DUCK_ANN_TOPK.format(k=3)}
""",
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via multi-table sign-LSH, bucketed on the quantized
    vector copy (engine-exact projections) — the DuckDB oracle replays
    bucket generation, candidate pairing, and the exact-cosine top-k; the
    recall-vs-exact contract stays in tests/test_similarity_ann.py."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return S.lsh_bucketed_neighbors(emb, k=3, quantize=ANN_Q)


@register(
    "ann_ivf_probed",
    oracle="WITH " + _duck_ivf_cte(rounds=3) + ","
    + _duck_ivf_probes(nprobe=4, qmax=20)
    + f""",
cands AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN afinal a ON p.cid = a.cid
  WHERE p.query_id <> a.vec_id
),
sims AS (
  SELECT c.query_id, c.neighbor_id, {_DUCK_ANN_COS} AS cos_sim
  FROM cands c JOIN ve va ON c.query_id = va.vec_id
               JOIN ve vb ON c.neighbor_id = vb.vec_id
)
{_DUCK_ANN_TOPK.format(k=3)}
""",
)
def ann_ivf_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed ANN, driver-replayable end to end: the oracle re-runs the
    full deterministic training (3 Lloyd rounds over integer-quantized
    vectors, floor-mean updates, lowest-vid seeding) as chained CTEs, then
    the probe pruning and the raw-vector cosine top-k.  Recall vs the
    exact top-k stays pinned in tests/test_similarity_ann.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids, assignments = S.ivf_index(emb, n_centroids=16, quantize=ANN_Q)
    queries_df = emb.filter(F.col("vec_id") < 20)
    return S.ivf_search(
        centroids, assignments, queries_df, k=3, nprobe=4, quantize=ANN_Q
    )


def _duck_pq_cte(rounds: int, m: int = 8, k: int = 16) -> str:
    """CTE chain replaying quantization.pq_train(quantize=ANN_Q) +
    pq_encode over the IVF-pruned candidates: subspace = (pos-1) / subdim
    over the SAME exploded quantized vectors ``vq`` as the IVF chain
    (dim/m inferred per row), seeds = the k lowest vids' subvectors with
    code = vid rank - 1, per-round assign by exact squared distance (ties
    -> lower code) and floor-mean update.  Ends with codebook ``pc{r}``
    (subspace, code, pos, x)."""
    parts = [f"""
dims AS (SELECT CAST(MAX(pos) AS INT) AS d FROM vq),
sv AS (SELECT vec_id,
              CAST(floor((pos - 1) / floor(d / {m})) AS INT) AS subspace,
              pos, x
       FROM vq, dims),
pseed AS (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code
  FROM (SELECT DISTINCT vec_id FROM sv) ORDER BY vec_id LIMIT {k}
),
pc0 AS (
  SELECT s.subspace, p.code, s.pos, s.x
  FROM sv s JOIN pseed p ON s.vec_id = p.vec_id
)"""]
    for r in range(rounds):
        parts.append(f"""
pd{r} AS (
  SELECT s.vec_id, s.subspace, c.code,
         SUM((s.x - c.x) * (s.x - c.x)) AS d
  FROM sv s JOIN pc{r} c ON s.subspace = c.subspace AND s.pos = c.pos
  GROUP BY s.vec_id, s.subspace, c.code
),
pa{r} AS (
  SELECT vec_id, subspace, code FROM (
    SELECT vec_id, subspace, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                              ORDER BY d, code) AS rk
    FROM pd{r}
  ) WHERE rk = 1
),
pm{r} AS (
  SELECT a.subspace, a.code, s.pos,
         CAST(floor(SUM(s.x) / COUNT(*)) AS DOUBLE) AS x
  FROM pa{r} a JOIN sv s ON a.vec_id = s.vec_id AND a.subspace = s.subspace
  GROUP BY a.subspace, a.code, s.pos
),
pc{r + 1} AS (
  SELECT p.subspace, p.code, p.pos, COALESCE(m.x, p.x) AS x
  FROM pc{r} p LEFT JOIN pm{r} m
    ON p.subspace = m.subspace AND p.code = m.code AND p.pos = m.pos
)""")
    return ",".join(parts)


@register(
    "ann_ivf_pq",
    oracle="WITH " + _duck_ivf_cte(rounds=2) + ","
    + _duck_ivf_probes(nprobe=4, qmax=10) + ","
    + _duck_pq_cte(rounds=2) + f""",
plists AS (SELECT DISTINCT cid FROM probes),
pcands AS (
  SELECT a.vec_id FROM afinal a JOIN plists p ON a.cid = p.cid
),
codes AS (
  SELECT vec_id, subspace, code FROM (
    SELECT vec_id, subspace, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                              ORDER BY d, code) AS rk
    FROM (
      SELECT s.vec_id, s.subspace, c.code,
             SUM((s.x - c.x) * (s.x - c.x)) AS d
      FROM sv s
      JOIN pcands pc ON s.vec_id = pc.vec_id
      JOIN pc2 c ON s.subspace = c.subspace AND s.pos = c.pos
      GROUP BY s.vec_id, s.subspace, c.code
    )
  ) WHERE rk = 1
),
dist_tables AS (
  SELECT s.vec_id AS query_id, s.subspace, c.code,
         SUM((s.x - c.x) * (s.x - c.x)) AS d
  FROM sv s JOIN pc2 c ON s.subspace = c.subspace AND s.pos = c.pos
  WHERE s.vec_id < 10
  GROUP BY s.vec_id, s.subspace, c.code
),
sims AS (
  SELECT t.query_id, cd.vec_id AS neighbor_id, round(SUM(t.d), 9) AS adc_dist
  FROM codes cd JOIN dist_tables t
    ON cd.subspace = t.subspace AND cd.code = t.code
  GROUP BY t.query_id, cd.vec_id
  HAVING t.query_id <> cd.vec_id
)
SELECT query_id, neighbor_id, adc_dist, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY adc_dist, neighbor_id) AS INT) AS rank
  FROM sims
) WHERE rank <= 3
""",
)
def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ, driver-replayable end to end: coarse probe prunes to the
    nearest centroid lists, ADC scores only those candidates against PQ
    codes.  The oracle replays BOTH deterministic training runs (IVF: 2
    Lloyd rounds; PQ: per-subspace k-means, 2 rounds) over the quantized
    vectors, the candidate pruning, the encoding of the pruned set, and
    the integer-exact ADC ranking.  Memory-layer behavior stays pinned in
    tests/test_quantization.py."""
    from ..operators.quantization import pq_encode, pq_search, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    centroids, assignments = S.ivf_index(
        emb, n_centroids=16, kmeans_iters=2, quantize=ANN_Q
    )
    queries_df = emb.filter(F.col("vec_id") < 10)
    # coarse probe: the queries' nprobe nearest LIST IDS (nprobe x |queries|
    # rows — broadcast-tiny).  Candidate pruning happens on the assignments
    # table, which is keyed by centroid_id, via a broadcast semi-join BEFORE
    # anything touches the codes — the corpus side is never shuffled for
    # pruning (the r2 version semi-joined full-corpus codes on vid, a
    # big-side SortMergeJoin; same candidate set, wrong side shuffled).
    probed_lists = (
        S.ivf_probe_lists(centroids, queries_df, nprobe=4, quantize=ANN_Q)
        .select("centroid_id").distinct()
    )
    cands = assignments.join(
        F.broadcast(probed_lists), "centroid_id", "leftsemi"
    )
    cb = pq_train(emb, m=8, k=16, kmeans_iters=2, quantize=ANN_Q)
    # encode only the pruned candidates: one groupBy over the survivors
    codes = pq_encode(cands, cb, m=8, id_col="vid", vec_col="v",
                      quantize=ANN_Q)
    return pq_search(codes, cb, queries_df, topk=3, m=8, quantize=ANN_Q)




@register(
    "importance_resample",
    oracle=f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
  FROM documents
), s AS (
  SELECT doc_id,
         CAST(SUM(({DUCK_HASH.format("word")} % 17) - 8) AS BIGINT) AS score
  FROM w GROUP BY doc_id
), wt AS (
  SELECT d.doc_id, d.lang,
         CAST(LEAST(990000, GREATEST(10000, 500000 + s.score * 1000))
              AS BIGINT) AS weight_ppm
  FROM documents d JOIN s USING (doc_id)
)
SELECT doc_id, lang, weight_ppm
FROM wt
WHERE {DUCK_HASH.format("'resample:' || CAST(doc_id AS VARCHAR)")}
        % 1000000 < weight_ppm
""",
)
def importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance resampling — the DCLM/FineWeb-style
    curation move where each document's keep probability follows a model
    score rather than a uniform coin.  The classifier score (the same
    hashing-trick model quality_classifier ledgers, int64-exact) maps to an
    integer keep weight in ppm, clamped to [1%, 99%] so no doc is
    deterministically immortal or unsampleable; a doc survives iff the
    salted hash of its id falls below its weight.  Entirely map-side: score,
    weight, and verdict are projections — zero shuffle at any corpus size,
    and re-runs / repartitioning cannot change the sample (hash, never
    rand()).  Upsampling (weight > 1) composes by taking the hash mod k*1e6
    and emitting floor + bernoulli-tail copies; the downsample path here is
    the oracle-checked core."""
    docs = load_table(spark, sf_dir, "documents")
    score = T.linear_classifier_score(F.col("text"))
    weight = F.least(
        F.lit(990000),
        F.greatest(F.lit(10000), F.lit(500000) + score * 1000),
    ).cast("long")
    keep_hash = spark_hash(
        F.concat(F.lit("resample:"), F.col("doc_id").cast("string"))
    ) % 1000000
    return (
        docs.select(
            "doc_id", "lang", weight.alias("weight_ppm"),
            keep_hash.alias("__h"),
        )
        .filter(F.col("__h") < F.col("weight_ppm"))
        .drop("__h")
    )


@register(
    "stratified_sample_salted",
    oracle=f"""
SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {DUCK_HASH.format("'sample:' || CAST(doc_id AS VARCHAR)")},
                    doc_id) AS rk
  FROM documents
) WHERE rk <= 20
""",
)
def stratified_sample_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKEW-PROOF rewrite of `stratified_sample`, same answer by
    construction (the oracle IS the single-window formulation): exact
    top-k-by-hash per language via TWO phases — rank within (lang,
    salt-bucket) sub-partitions first and keep k locally, then rank the
    <= k*64 survivors per language.  Single-window group top-k is the
    classic low-cardinality trap: with 5 languages over 10^12 docs, one
    window drags a fifth of the corpus through one partition's sort.
    Phase 1 splits every language across 64 salt buckets (the sub-sorts
    parallelize and each emits at most k rows), so phase 2 sorts a
    bounded candidate table — the distributed-TopK rewrite engines apply
    to ORDER BY/LIMIT, expressed for grouped sampling.  Correct because
    the global top-k of a union is contained in the union of per-bucket
    top-ks.  Salt = pmod(doc hash, 64): deterministic, so reruns and
    repartitions keep the identical sample."""
    docs = load_table(spark, sf_dir, "documents")
    h = spark_hash(
        F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))
    )
    base = docs.select("doc_id", "lang", h.alias("__h"))
    local = Window.partitionBy(
        "lang", F.pmod(F.col("__h"), F.lit(64))
    ).orderBy("__h", "doc_id")
    survivors = base.withColumn(
        "__lrk", F.row_number().over(local)
    ).filter(F.col("__lrk") <= 20)
    final = Window.partitionBy("lang").orderBy("__h", "doc_id")
    return (
        survivors.withColumn("rk", F.row_number().over(final).cast("int"))
        .filter(F.col("rk") <= 20)
        .select("doc_id", "lang", "rk")
    )


@register(
    "bigram_fluency_score",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
), bgs AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg
  FROM toks, UNNEST(range(1, len(t))) AS r(i)
), cnt AS (
  SELECT bg, CAST(COUNT(*) AS BIGINT) AS c FROM bgs GROUP BY bg
)
SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(c.c) // COUNT(*) AS BIGINT) AS mean_bigram_freq
FROM bgs b JOIN cnt c USING (bg)
GROUP BY b.doc_id
""",
)
def bigram_fluency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistic join-back scoring — the LM-free fluency proxy:
    each document's mean corpus frequency of its own bigrams (texts made
    of conventional word transitions score high; gibberish, boilerplate
    keyboard-mash, and wrong-language fragments score low — the cheap
    stand-in for perplexity filtering when no LM is in the loop, cf. the
    heuristic tier of CCNet/Gopher-style pipelines).  Integer-exact end
    to end: frequencies are corpus COUNTS, the score their truncated
    integer mean, so both engines agree bit-for-bit — no logs, no floats.
    Shape: one explode -> one bigram groupBy (vocab-bounded, partial
    map-side combine) -> one equi-join of occurrences onto their own
    frequency table -> one per-doc groupBy.  The bigram table is the only
    wide shuffle, and a hot bigram ('of the') is a broadcast-side skew
    problem only if the frequency table is force-broadcast — it is not;
    AQE's skew-join handles the join at scale.  Tokenization matches the
    engine-wide rule: whitespace split, empty tokens filtered."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x <> '')").alias("t"),
    )
    bgs = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(zip_with(t, slice(t, 2, greatest(size(t) - 1, 0)),"
                " (a, b) -> concat(a, ' ', b)), x -> x IS NOT NULL)"
            )
        ).alias("bg"),
    )
    cnt = bgs.groupBy("bg").agg(F.count("*").cast("long").alias("c"))
    return (
        bgs.join(cnt, "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.expr("CAST(sum(c) div count(*) AS BIGINT)").alias(
                "mean_bigram_freq"
            ),
        )
    )


@register(
    "embedding_outlier_scores",
    oracle="WITH " + _duck_ivf_cte(rounds=3) + """
SELECT vec_id, centroid_id, cos_to_centroid, rank FROM (
  SELECT a.vec_id, a.cid AS centroid_id,
         round(s.d / (q.n * c.n), 6) AS cos_to_centroid,
         CAST(ROW_NUMBER() OVER (
           ORDER BY round(s.d / (q.n * c.n), 6) ASC, a.vec_id) AS INT)
           AS rank
  FROM afinal a
  JOIN simf s ON s.vec_id = a.vec_id AND s.cid = a.cid
  JOIN vqn q ON q.vec_id = a.vec_id
  JOIN cfn c ON c.cid = a.cid
) t WHERE rank <= 20
""",
)
def embedding_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier mining — the DataComp/SemDedup-family
    pruning signal in reverse: after the SAME deterministic IVF training
    the ANN queries replay (quantized spherical k-means, 16 centroids, 3
    Lloyd rounds), every vector scores its cosine to its OWN assigned
    centroid, and the 20 LEAST-central vectors surface — junk embeddings,
    encoder failures, and out-of-distribution documents live in that
    tail (a vector far from every centroid is by construction far from
    its nearest one).  Regime caveat, stated not discovered: the signal
    assumes k is SMALL relative to the data's modes — with centroids to
    spare, k-means rightfully dedicates one to an isolated vector and
    its cosine-to-own-centroid becomes 1.0 (pinned in the busy-centroid
    fixture of tests/test_similarity_ann.py).  Scale shape: the centroid
    table broadcasts, the
    score is map-side arithmetic over integer-valued doubles (IEEE-exact
    sums, so the oracle replays training AND scores bit-for-bit), and
    the bottom-20 is TakeOrderedAndProject — the corpus never shuffles.
    Composes with ann_ivf_probed off one shared index build."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids, assignments = S.ivf_index(
        emb, n_centroids=16, quantize=ANN_Q
    )
    a = assignments.select(
        F.col("vid").alias("vec_id"),
        "centroid_id",
        S.quantized(F.col("v"), ANN_Q).alias("q"),
    ).select("vec_id", "centroid_id", "q", S.norm(F.col("q")).alias("qn"))
    scored = a.join(F.broadcast(centroids), "centroid_id").select(
        "vec_id",
        "centroid_id",
        F.round(
            S.dot(F.col("q"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
        ).alias("cos_to_centroid"),
    )
    w = Window.orderBy(F.col("cos_to_centroid").asc(), F.col("vec_id"))
    return (
        scored.orderBy(F.col("cos_to_centroid").asc(), "vec_id")
        .limit(20)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


@register(
    "cume_dist_doc_length",
    oracle="""
WITH d AS (
  SELECT doc_id, lang, n_chars,
         CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_total,
         CAST(COUNT(*) OVER (PARTITION BY lang ORDER BY n_chars
                             RANGE BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS n_le
  FROM documents
)
SELECT doc_id, lang, n_chars,
       CAST((1000000 * n_le) // n_total AS BIGINT) AS cume_ppm
FROM d
""",
)
def cume_dist_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language cumulative length distribution — the percentile-of-
    this-document signal behind length-curriculum ordering and truncation
    policy — as EXACT integer ppm rather than the built-in CUME_DIST
    (whose double output is engine/rounding sensitive): n_le = the
    VALUE-ordered RANGE frame count (rows with length <= mine, ties
    inclusive — exactly CUME_DIST's numerator), over the per-language
    total.  Both engines compute the identical int64 quotient, so the
    driver hash pins tie handling too.  One shuffle on lang; the windows
    share the single (lang, n_chars) sort order at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    by_lang = Window.partitionBy("lang")
    le = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return (
        docs.select("doc_id", "lang", "n_chars")
        .withColumn("n_total", F.count("*").over(by_lang).cast("long"))
        .withColumn("n_le", F.count("*").over(le).cast("long"))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.expr("CAST((1000000 * n_le) div n_total AS BIGINT)").alias(
                "cume_ppm"
            ),
        )
    )


@register(
    "zero_token_docs_audit",
    oracle="""
SELECT doc_id,
       CAST(len(list_filter(string_split(COALESCE(text, ''), ' '),
                            x -> length(x) >= 8)) AS BIGINT) AS n_tokens,
       len(list_filter(string_split(COALESCE(text, ''), ' '),
                       x -> length(x) >= 8)) = 0 AS is_empty
FROM documents
""",
)
def zero_token_docs_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explode-row-loss pin: per-doc counts of LONG (>= 8 char)
    tokens, where documents with none must SURVIVE — the post-cleaning
    emptiness audit (an aggressive filter step can empty a document, and
    those are exactly the rows curation must see, not lose).  A plain
    `explode` silently drops zero-element rows; Spark uses
    `explode_outer` (the NULL placeholder row keeps the doc) with a
    null-aware count, and the oracle counts tokens directly WITHOUT
    unnesting, so the driver hash fails if explode semantics ever eat a
    row.  The >= 8 floor is what makes the pin non-vacuous on the gate
    fixtures: ~20% of docs at both SFs have no long token (an unfiltered
    split leaves zero empty docs and the hash could never catch the
    regression); NULL text coalesces to '' on both sides (Spark's
    explode_outer(NULL) and DuckDB's len(NULL) would otherwise disagree).
    The count-vs-count formulation also documents the cheaper path: when
    ONLY counts are needed, `size(filter(...))` is a map-side projection
    with no explode at all — the explode_outer here exists to pin the
    row-preserving shape the per-token operators rely on."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode_outer(
            F.expr(
                "filter(split(coalesce(text, ''), ' '),"
                " x -> length(x) >= 8)"
            )
        ).alias("tok"),
    )
    return toks.groupBy("doc_id").agg(
        F.count("tok").cast("long").alias("n_tokens"),
        (F.count("tok") == 0).alias("is_empty"),
    )


@register(
    "lang_id_confusion",
    oracle="""
WITH g AS (
  SELECT CASE WHEN CAST(len(list_filter(string_split(lower(text), ' '),
              x -> list_contains(['the','a','of','and','to','in'], x)))
              AS DOUBLE) / len(string_split(lower(text), ' ')) > 0.05
         THEN 'en' ELSE 'und' END AS lang_guess,
         lang AS lang_label
  FROM documents
)
SELECT lang_label, lang_guess, CAST(COUNT(*) AS BIGINT) AS n,
       CAST((1000000 * COUNT(*)) //
            SUM(COUNT(*)) OVER (PARTITION BY lang_label) AS BIGINT)
         AS row_share_ppm
FROM g GROUP BY lang_label, lang_guess
""",
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-evaluation primitive — the confusion matrix: the lang-id
    heuristic's predictions crossed with the gold `lang` labels, counts
    plus row-normalized shares in exact integer ppm (the diagonal share
    IS per-class recall).  This is the eval table every classifier in
    the curation stack reports against; computing it in-engine means the
    10^12-doc eval never leaves the cluster.  Shape: one groupBy on the
    (gold, predicted) pair — at most |labels|^2 keys, partial-combined
    map-side — and the normalizing window runs over that bounded matrix.
    The heuristic itself is the driver-green `lang_id` rule, so the
    oracle replays prediction AND evaluation end to end."""
    docs = load_table(spark, sf_dir, "documents")
    g = T.with_lang_id(docs).select(
        F.col("lang").alias("lang_label"), "lang_guess"
    )
    m = g.groupBy("lang_label", "lang_guess").agg(
        F.count("*").cast("long").alias("n")
    )
    return m.select(
        "lang_label",
        "lang_guess",
        "n",
        F.expr(
            "CAST((1000000 * n) div"
            " (sum(n) OVER (PARTITION BY lang_label)) AS BIGINT)"
        ).alias("row_share_ppm"),
    )
