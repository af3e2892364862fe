"""Operator query battery: every SURVEY.md §2 operator as a (Spark, oracle-SQL)
pair, plus the training-data-pipeline operators (dedup, similarity, text
analysis) the engine adds on top of the reference.

Each entry is registered as ``(name, spark_callable, duckdb_sql)``; the driver
runs both at sf=0.01 and compares row-count + schema + order-insensitive
value hash (see ``/root/repo/__spark_entry__.py``).  Design rules that keep
the two engines hash-identical:

* money/quantity aggregates go through DECIMAL casts (exact), ratios through
  double division of exact operands — never compare raw floating sums;
* the shared deterministic hash is H(s) = bigint(first 15 hex chars of
  md5(s)): Spark ``conv(substr(md5(s),1,15),16,10)``, DuckDB
  ``('0x'||substr(md5(s),1,15))::bigint``;
* timestamps are compared as epoch microseconds (``unix_micros`` /
  ``epoch_us``) to dodge session-timezone skew;
* every computed column is aliased identically on both sides (driver hashes
  sort columns by NAME).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table, synthesize_docs_from_testdata

_REGISTRY: List[Tuple[str, Callable, Optional[str]]] = []

# shared minhash parameters (deterministic, engine-agnostic)
MINHASH_P = 2147483647  # 2^31 - 1
MINHASH_PERMS = 16
LSH_BANDS = 4  # 4 rows per band
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def register(name: str, oracle: Optional[str] = None):
    def deco(fn: Callable):
        _REGISTRY.append((name, fn, oracle))
        return fn

    return deco


# The driver checks at most the FIRST 50 entries of queries() per round.
# Round-6 window policy (pure presentation ordering — registration order and
# query semantics are untouched):
#   1. _R6_QUEUE: the 11 queries registered in r5 past the full window —
#      locally green in both gate modes at two SFs but with no driver row
#      yet (VERDICT r5 next #1).  q5/q17 enter only after the forced
#      broadcasts of their linearly-growing sides were dropped (VERDICT r5
#      next #2) so their first ledger rows land green-and-right at once.
#   2. the 37 rows whose latest driver green is the r3 ledger (VERDICT r5
#      next #3) — by r7 nothing should be older than r4.
#   3. two flagship extraction rows (extract_synthetic, emit_triples) fill
#      the remaining slots so the core kernel path gets a fresh row.
# Everything else follows stale-first (r4-ledgered before r5-ledgered) so
# the r7 rotation is already sequenced.  CORRECTNESS_r05 came back 50/50
# green, so the probe battery vacates the window (stays registered as the
# bisection tool).
_R6_QUEUE = (
    "quality_classifier",
    "supplier_pagerank",
    "chunk_documents",
    "event_funnel",
    "cohort_retention",
    "corpus_datasheet",
    "join_size_estimate",
    "event_rate_spikes",
    "q5_local_supplier_volume",
    "q17_small_quantity_revenue",
    "curriculum_buckets",
)

# Queries whose latest driver green is the r3 ledger (three rounds stale
# by r6) — computed from CORRECTNESS_r01..r05: green in r3, absent from
# the r4 and r5 windows.
_R3_STALE = (
    "order_preservation", "scalar_text_cleanup", "float_typing",
    "uri_tail_split", "dedup_exact", "lsh_buckets", "lsh_candidate_pairs",
    "dedup_simhash", "embedding_cosine_topk", "embedding_near_dup_pairs",
    "lang_id", "quality_score", "token_count", "media_metadata",
    "media_byte_histogram", "emit_triples_probed", "asof_join_next_error",
    "url_canonical_dedup", "resource_list", "minhash_signatures",
    "lsh_incremental_pairs", "doc_fingerprint", "repetition_filters",
    "boilerplate_strip", "pii_redaction", "curation_filter", "top_ngrams",
    "sequence_packing", "domain_mix_sample", "deterministic_split",
    "stratified_sample", "decontamination_report", "rare_word_rank_score",
    "media_resize_plan", "media_frame_sample", "pdf_page_extract",
    "media_embedding_topk",
)

_R6_FRONT = _R6_QUEUE + _R3_STALE + ("extract_synthetic", "emit_triples")

# Round-5 window policy (superseded by _R6_FRONT; kept because the r5
# ledger documents exactly this ordering):
#   1. _R5_FRONT: (a) the four r4-red queries, re-oracled with the HUGEINT
#      root-cause fix (CAST integer-sum outputs to BIGINT — see the note at
#      _PARA_DEDUP_ORACLE); (b) the new bpe_encode query; (c) the probe
#      battery that bisects each formerly-red pipeline so a surviving red
#      names its divergent stage; (d) the 13 rows whose latest green is
#      still the r2 ledger (VERDICT r4 next #3);
#   2. then the r3-ledgered rows (two rounds stale) to keep rotating;
#   3. the r4-ledgered rows (freshest green) last.
_R5_FRONT = (
    # (a) fixed r4 reds
    "bpe_pair_counts",
    "bpe_merges",
    "shard_assembly",
    "paragraph_dedup",
    # (b) new queries closing the BPE loop (encode + decode round-trip)
    # and the substring-level dedup addition
    "bpe_encode",
    "bpe_roundtrip",
    "duplicate_passages",
    "cut_duplicate_passages",
    "fuzzy_decontamination",
    "tfidf_top_terms",
    "winnowing_fingerprints",
    "winnowing_overlap_pairs",
    "countmin_frequency_estimates",
    "hll_registers",
    "hll_distinct_estimate",
    "hll_vocab_by_lang",
    "bloom_dedup_prefilter",
    "doc_length_quantile_sketch",
    "doc_length_quantiles_by_lang",
    "frequent_trigrams_screen",
    "simhash_hamming_pairs",
    "bm25_topk",
    "unimax_allocation",
    "hll_intersection_estimate",
    "bpe_fertility_by_lang",
    "table_linearize",
    "packing_efficiency",
    "skew_report",
    # (c) divergence probes (green-expected; see the battery's comment)
    "probe_literal_specials",
    "probe_corpus_sums",
    "probe_word_tokens",
    "probe_char_split",
    "probe_chunk_hash",
    "probe_first_occurrence",
    "probe_para_reassembly",
    "probe_packing_order",
    "probe_shard_payload_hash",
    # (d) the 13 rows whose latest driver green is the r2 ledger
    "zip_join_positional",
    "section_fill_down",
    "header_latch",
    "running_column_sums",
    "summary_row_filter",
    "distinct_header_inventory",
    "section_fuzzy_merge",
    "ontology_label_probe",
    "pivot_event_types",
    "top_k_per_group",
    "range_join_value_bands",
    "asof_join_latest_error",
    "sessionization",
    # (e) r6 queue: registered after the 50-slot window filled — ordered
    # here (past slot 50) so they lead the next round's rotation and the
    # registry contract records that they await their first driver row.
    "quality_classifier",
    "supplier_pagerank",
    "chunk_documents",
    "event_funnel",
    "cohort_retention",
    "corpus_datasheet",
    "join_size_estimate",
    "event_rate_spikes",
    "q5_local_supplier_volume",
    "q17_small_quantity_revenue",
    "curriculum_buckets",
)

# Queries hash-green in the driver's CORRECTNESS_r04.json ledger (the
# freshest rows — ordered LAST so the stalest r3 rows rotate through the
# remaining window slots first).
_DRIVER_LEDGERED_R04 = frozenset(
    {
        "ann_ivf_pq", "ann_ivf_probed", "ann_lsh_bucketed",
        "curation_survivors", "domain_mix_temperature",
        "effectiveness_ratio", "emit_triples", "emit_triples_media",
        "entity_probe_semi", "extract_accent_fallback",
        "extract_colspan_collapse", "extract_error_metrics",
        "extract_header_cleanup", "extract_link_spans",
        "extract_media_linkage", "extract_metrics_report",
        "extract_summary_row_filter", "extract_supersub_headers",
        "extract_synthetic", "extract_totale_skip",
        "extract_vertical_table", "full_outer_reconciliation",
        "header_inventory", "heavy_hitters", "min_rows_filter",
        "near_dup_components", "ngram_containment_dedup",
        "ngram_jaccard_dedup", "percentile_summary", "q1_pricing_summary",
        "q3_shipping_priority", "reification_index", "resource_count",
        "rollup_event_stats", "rule_lookup_cascade", "rules_merge",
        "section_grouping", "section_rule_gate", "semantic_dedup_clusters",
        "settings_inventory", "time_rollup_daily", "totale_filter",
        "ttl_lines", "ttl_lines_media", "window_moving_avg",
        "windowed_event_counts",
    }
)

# Queries hash-green in the driver's CORRECTNESS_r05.json ledger (the
# freshest rows — ordered LAST by the r6 policy so r4 rows rotate first).
_DRIVER_LEDGERED_R05 = frozenset(
    {
        "asof_join_latest_error", "bloom_dedup_prefilter", "bm25_topk",
        "bpe_encode", "bpe_fertility_by_lang", "bpe_merges",
        "bpe_pair_counts", "bpe_roundtrip", "countmin_frequency_estimates",
        "cut_duplicate_passages", "distinct_header_inventory",
        "doc_length_quantile_sketch", "doc_length_quantiles_by_lang",
        "duplicate_passages", "frequent_trigrams_screen",
        "fuzzy_decontamination", "header_latch", "hll_distinct_estimate",
        "hll_intersection_estimate", "hll_registers", "hll_vocab_by_lang",
        "ontology_label_probe", "packing_efficiency", "paragraph_dedup",
        "pivot_event_types", "probe_char_split", "probe_chunk_hash",
        "probe_corpus_sums", "probe_first_occurrence",
        "probe_literal_specials", "probe_packing_order",
        "probe_para_reassembly", "probe_shard_payload_hash",
        "probe_word_tokens", "range_join_value_bands",
        "running_column_sums", "section_fill_down", "section_fuzzy_merge",
        "sessionization", "shard_assembly", "simhash_hamming_pairs",
        "skew_report", "summary_row_filter", "table_linearize",
        "tfidf_top_terms", "top_k_per_group", "unimax_allocation",
        "winnowing_fingerprints", "winnowing_overlap_pairs",
        "zip_join_positional",
    }
)

# Queries hash-green in the driver's CORRECTNESS_r02.json ledger.
_DRIVER_LEDGERED_R02 = frozenset(
    {
        "extract_synthetic", "extract_media_linkage", "extract_link_spans",
        "extract_colspan_collapse", "extract_vertical_table",
        "extract_totale_skip", "extract_summary_row_filter",
        "extract_supersub_headers", "extract_accent_fallback",
        "extract_header_cleanup", "extract_error_metrics",
        "extract_metrics_report", "header_inventory", "emit_triples",
        "emit_triples_media", "ttl_lines_media", "ttl_lines",
        "settings_inventory", "q1_pricing_summary", "q3_shipping_priority",
        "rollup_event_stats", "window_moving_avg", "percentile_summary",
        "windowed_event_counts", "time_rollup_daily",
        "full_outer_reconciliation", "heavy_hitters", "resource_count",
        "effectiveness_ratio", "min_rows_filter", "totale_filter",
        "rule_lookup_cascade", "section_rule_gate", "entity_probe_semi",
        "rules_merge", "zip_join_positional", "reification_index",
        "section_fill_down", "header_latch", "running_column_sums",
        "summary_row_filter", "distinct_header_inventory", "section_grouping",
        "section_fuzzy_merge", "ontology_label_probe", "pivot_event_types",
        "top_k_per_group", "range_join_value_bands", "asof_join_latest_error",
        "sessionization",
    }
)


def _ordered_registry() -> List[Tuple[str, Callable, Optional[str]]]:
    front_set = set(_R6_FRONT)
    by_name = {e[0]: e for e in _REGISTRY}
    front = [by_name[n] for n in _R6_FRONT if n in by_name]
    rest = [e for e in _REGISTRY if e[0] not in front_set]
    # stale-first behind the window: r4-ledgered rows (two rounds stale by
    # r7) rotate before r5-fresh ones
    stale4 = [e for e in rest if e[0] not in _DRIVER_LEDGERED_R05]
    fresh5 = [e for e in rest if e[0] in _DRIVER_LEDGERED_R05]
    return front + stale4 + fresh5


def queries() -> Dict[str, Callable]:
    return {name: fn for name, fn, _ in _ordered_registry()}


def oracle_sql() -> Dict[str, str]:
    return {name: sql for name, _, sql in _ordered_registry() if sql is not None}


def spark_hash(col) -> F.Column:
    """H(s): 60-bit deterministic hash shared with the DuckDB oracle."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


DUCK_HASH = "(('0x' || substr(md5({0}), 1, 15))::bigint)"


# ===========================================================================
# A. flagship extraction (the kernel itself, oracle-checked end to end)
# ===========================================================================


@register(
    "extract_synthetic",
    oracle=f"""
WITH d AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id, lang,
         (string_split(text, ' '))[1:6] AS words
  FROM documents
), g AS (SELECT i FROM generate_series(0, 5) t(i))
SELECT doc_id, kind, text, media_ref, "order" FROM (
  SELECT doc_id, 'section' AS kind, 'Profile ' || lang AS text,
         '' AS media_ref, 0 AS "order" FROM d
  UNION ALL SELECT doc_id, 'header', 'Idx', '', 1 FROM d
  UNION ALL SELECT doc_id, 'header', 'Word', '', 2 FROM d
  UNION ALL SELECT doc_id, 'cell', 'w' || CAST(i AS VARCHAR), '',
         3 + 2 * i FROM d, g
  UNION ALL SELECT doc_id, 'cell', words[i + 1], '', 4 + 2 * i FROM d, g
)
""",
)
def extract_synthetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full kernel pipeline on a corpus synthesized (deterministically, in
    pure SQL) from the ``documents`` table — which is exactly what lets the
    DuckDB oracle recompute the expected per-document span sequence
    independently.  This is the strongest end-to-end check of the engine."""
    from .extract import extract_pipeline

    docs = synthesize_docs_from_testdata(spark, sf_dir)
    out, _ = extract_pipeline(docs, num_partitions=32, salt=1)
    return out.select("doc_id", "kind", "text", "media_ref", "order")


@register(
    "table_linearize",
    oracle="""
WITH d AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id,
         (string_split(text, ' '))[1:6] AS words
  FROM documents
), g AS (SELECT i FROM generate_series(1, 6) t(i)),
rws AS (
  SELECT d.doc_id, g.i,
         'Idx: w' || CAST(g.i - 1 AS VARCHAR)
           || ' | Word: ' || d.words[g.i] AS row_text
  FROM d, g
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       md5(string_agg(row_text, chr(10) ORDER BY i)) AS linearized_md5
FROM rws GROUP BY doc_id
""",
)
def table_linearize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction output serialized into pretraining text
    (plans/triples.linearize_tables): every mined table row becomes
    "Header: value | Header: value" and rows join in table order — the
    table-to-text step that turns this engine's span output into corpus
    documents (the WDC/TaBERT-style linearization).  The header↔cell
    pairing is the Mapper's positional zip (J5) at the DataFrame layer;
    the oracle recomputes every linearized document from the synthetic
    corpus definition, md5-compacted (the probe-battery rule for
    text-heavy driver outputs)."""
    from .extract import extract_pipeline
    from .triples import linearize_tables

    docs = synthesize_docs_from_testdata(spark, sf_dir)
    out, _ = extract_pipeline(docs, num_partitions=32)
    lin = linearize_tables(out)
    return lin.select(
        "doc_id", "n_rows", F.md5("linearized").alias("linearized_md5")
    )


@register(
    "extract_media_linkage",
    oracle="""
WITH d AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id, lang,
         (string_split(text, ' '))[1:6] AS words
  FROM documents WHERE doc_id < 300
), g AS (SELECT i FROM generate_series(0, 5) t(i))
SELECT doc_id, kind, text, media_ref, "order" FROM (
  SELECT doc_id, 'section' AS kind, 'Profile ' || lang AS text,
         '' AS media_ref, 0 AS "order" FROM d
  UNION ALL SELECT doc_id, 'header', 'Idx', '', 1 FROM d
  UNION ALL SELECT doc_id, 'header', 'Word', '', 2 FROM d
  UNION ALL SELECT doc_id, 'cell', 'w' || CAST(i AS VARCHAR), '',
         3 + 3 * i FROM d, g
  UNION ALL SELECT doc_id, 'cell', words[i + 1],
         'img://' || doc_id || '/r' || CAST(i AS VARCHAR) || '.jpg',
         4 + 3 * i FROM d, g
  UNION ALL SELECT doc_id, 'media', '',
         'img://' || doc_id || '/r' || CAST(i AS VARCHAR) || '.jpg',
         5 + 3 * i FROM d, g
)
""",
)
def extract_media_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north star's media linkage, oracle-checked end to end: every word
    cell embeds an image anchor; the kernel must attach the href as the
    cell's media_ref AND emit the trailing 'media' span — the DuckDB oracle
    recomputes the exact (kind, text, media_ref, order) sequence."""
    from .extract import extract_pipeline

    docs = synthesize_docs_from_testdata(
        spark, sf_dir, media_anchors=True
    ).filter(F.col("doc_id").substr(F.lit(5), F.lit(10)).cast("int") < 300)
    out, _ = extract_pipeline(docs, num_partitions=16)
    return out.select("doc_id", "kind", "text", "media_ref", "order")


@register(
    "extract_link_spans",
    oracle="""
WITH d AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id, lang,
         (string_split(text, ' '))[1:6] AS words
  FROM documents WHERE doc_id < 300
), g AS (SELECT i FROM generate_series(0, 5) t(i))
SELECT doc_id, kind, text, media_ref, "order" FROM (
  SELECT doc_id, 'section' AS kind, 'Profile ' || lang AS text,
         '' AS media_ref, 0 AS "order" FROM d
  UNION ALL SELECT doc_id, 'header', 'Idx', '', 1 FROM d
  UNION ALL SELECT doc_id, 'header', 'Word', '', 2 FROM d
  UNION ALL SELECT doc_id, 'cell', 'w' || CAST(i AS VARCHAR), '',
         3 + 3 * i FROM d, g
  UNION ALL SELECT doc_id, 'link',
         'lnk_' || doc_id || '_r' || CAST(i AS VARCHAR), '',
         4 + 3 * i FROM d, g
  UNION ALL SELECT doc_id, 'cell', words[i + 1], '', 5 + 3 * i FROM d, g
)
""",
)
def extract_link_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blue-link cells oracle-checked: the anchor's resolved target (title
    attr, spaces underscored — HtmlTableParser.py:674-714 + reference
    resolve_data_type) emits as a 'link' span before the cell's text value
    (F13 two-rule extraction) — previously only golden-pinned
    (actor_anchors)."""
    from .extract import extract_pipeline

    docs = synthesize_docs_from_testdata(
        spark, sf_dir, link_anchors=True
    ).filter(F.col("doc_id").substr(F.lit(5), F.lit(10)).cast("int") < 300)
    out, _ = extract_pipeline(docs, num_partitions=16)
    return out.select("doc_id", "kind", "text", "media_ref", "order")


@register(
    "extract_colspan_collapse",
    oracle="""
WITH d AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id, lang,
         (string_split(text, ' '))[1:6] AS words
  FROM documents WHERE doc_id < 300
), g AS (SELECT i FROM generate_series(0, 5) t(i))
SELECT doc_id, kind, text, media_ref, "order" FROM (
  SELECT doc_id, 'section' AS kind, 'Profile ' || lang AS text,
         '' AS media_ref, 0 AS "order" FROM d
  UNION ALL SELECT doc_id, 'header', 'Pair', '', 1 FROM d
  UNION ALL SELECT doc_id, 'header', 'Pair', '', 2 FROM d
  UNION ALL SELECT doc_id, 'header', 'Sing', '', 3 FROM d
  -- the quirk: the FIRST data cell under the duplicated header vanishes
  -- (row dict keyed by header text, last value wins)
  UNION ALL SELECT doc_id, 'cell', words[i + 1], '', 4 + 2 * i FROM d, g
  UNION ALL SELECT doc_id, 'cell', 'z' || CAST(i AS VARCHAR), '',
         5 + 2 * i FROM d, g
)
""",
)
def extract_colspan_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The signature colspan quirk oracle-checked end to end: a colspan-2
    header expands to the SAME dict twice (HtmlTableParser.py:802-850), and
    the positional join keyed by header TEXT then collapses the first data
    cell under it (last value wins, :914-963) — previously pinned only by
    goldens and the py2 differential."""
    from .extract import extract_pipeline

    docs = synthesize_docs_from_testdata(
        spark, sf_dir, header_colspan=True
    ).filter(F.col("doc_id").substr(F.lit(5), F.lit(10)).cast("int") < 300)
    out, _ = extract_pipeline(docs, num_partitions=16)
    return out.select("doc_id", "kind", "text", "media_ref", "order")


@register(
    "extract_vertical_table",
    oracle="""
WITH d AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id, lang,
         (string_split(text, ' '))[1:6] AS words
  FROM documents WHERE doc_id < 300
), g AS (SELECT i FROM generate_series(0, 5) t(i))
SELECT doc_id, kind, text, media_ref, "order" FROM (
  SELECT doc_id, 'section' AS kind, 'Profile ' || lang AS text,
         '' AS media_ref, 0 AS "order" FROM d
  UNION ALL SELECT doc_id, 'header', 'K' || CAST(i AS VARCHAR), '',
         1 + i FROM d, g
  -- vertical quirk: n_headers = len(first header ROW) = 1, so each row's
  -- th and td become TWO single-value cells in sequence
  UNION ALL SELECT doc_id, 'cell', 'K' || CAST(i AS VARCHAR), '',
         7 + 2 * i FROM d, g
  UNION ALL SELECT doc_id, 'cell', words[i + 1], '', 8 + 2 * i FROM d, g
)
""",
)
def extract_vertical_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3's vertical-table quirk oracle-checked: a th+td row marks the table
    vertical (HtmlTableParser.py:278-314); refined headers are each header
    row's FIRST cell, and the positional join's width is len(first header
    row) = 1, so every cell lands in its own single-value row-dict —
    previously golden/differential only."""
    from .extract import extract_pipeline

    docs = synthesize_docs_from_testdata(
        spark, sf_dir, vertical=True
    ).filter(F.col("doc_id").substr(F.lit(5), F.lit(10)).cast("int") < 300)
    out, _ = extract_pipeline(docs, num_partitions=16)
    return out.select("doc_id", "kind", "text", "media_ref", "order")


@register(
    "extract_totale_skip",
    oracle="""
WITH d AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id, lang,
         (string_split(text, ' '))[1:2] AS words
  FROM documents WHERE doc_id < 300
)
SELECT doc_id, kind, text, media_ref, "order" FROM (
  SELECT doc_id, 'section' AS kind, 'Profile ' || lang AS text,
         '' AS media_ref, 0 AS "order" FROM d
  UNION ALL SELECT doc_id, 'header', 'Idx', '', 1 FROM d
  UNION ALL SELECT doc_id, 'header', 'Word', '', 2 FROM d
  UNION ALL SELECT doc_id, 'cell', 'w0', '', 3 FROM d
  UNION ALL SELECT doc_id, 'cell', words[1], '', 4 FROM d
  -- the SECOND adjacent Totale row survives the remove-while-iterating
  -- filter (the first is deleted, the cursor skips the one that shifted in)
  UNION ALL SELECT doc_id, 'cell', 'Totale', '', 5 FROM d
  UNION ALL SELECT doc_id, 'cell', 'sumB', '', 6 FROM d
  UNION ALL SELECT doc_id, 'cell', 'w1', '', 7 FROM d
  UNION ALL SELECT doc_id, 'cell', words[2], '', 8 FROM d
)
""",
)
def extract_totale_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4's remove-while-iterating quirk oracle-checked: of two ADJACENT
    'Totale' rows the reference deletes only the first — the cursor skips
    the row that shifted into the deleted slot (HtmlTableParser.py:783-800;
    CPython list-iterator semantics)."""
    from .extract import extract_pipeline

    docs = synthesize_docs_from_testdata(
        spark, sf_dir, totale_rows=True
    ).filter(F.col("doc_id").substr(F.lit(5), F.lit(10)).cast("int") < 300)
    out, _ = extract_pipeline(docs, num_partitions=16)
    return out.select("doc_id", "kind", "text", "media_ref", "order")


@register(
    "extract_summary_row_filter",
    oracle="""
WITH d AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id, lang,
         (string_split(text, ' '))[1:2] AS words
  FROM documents WHERE doc_id < 300
)
SELECT doc_id, kind, text, media_ref, "order" FROM (
  SELECT doc_id, 'section' AS kind, 'Profile ' || lang AS text,
         '' AS media_ref, 0 AS "order" FROM d
  UNION ALL SELECT doc_id, 'header', 'Season', '', 1 FROM d
  UNION ALL SELECT doc_id, 'header', 'Goals', '', 2 FROM d
  UNION ALL SELECT doc_id, 'header', 'Apps', '', 3 FROM d
  -- the career-summary row (both numeric cells = running column sums,
  -- text cell >=7 unique chars from the previous row's) is DROPPED;
  -- numerics render via the py2 float path ('10' -> '10.0')
  UNION ALL SELECT doc_id, 'cell', words[1], '', 4 FROM d
  UNION ALL SELECT doc_id, 'cell', '10.0', '', 5 FROM d
  UNION ALL SELECT doc_id, 'cell', '1.0', '', 6 FROM d
  UNION ALL SELECT doc_id, 'cell', words[2], '', 7 FROM d
  UNION ALL SELECT doc_id, 'cell', '20.0', '', 8 FROM d
  UNION ALL SELECT doc_id, 'cell', '2.0', '', 9 FROM d
)
""",
)
def extract_summary_row_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5's career-summary filter oracle-checked on real markup: the row
    whose numeric cells equal the running column sums of prior rows (and
    whose text cell is >=7 unique chars from the previous row's) never
    reaches the output (MapperTools.py:211-254); verified zero survivors
    across the full sf corpus before pinning."""
    from .extract import extract_pipeline

    docs = synthesize_docs_from_testdata(
        spark, sf_dir, summary_row=True
    ).filter(F.col("doc_id").substr(F.lit(5), F.lit(10)).cast("int") < 300)
    out, _ = extract_pipeline(docs, num_partitions=16)
    return out.select("doc_id", "kind", "text", "media_ref", "order")


@register(
    "extract_supersub_headers",
    oracle="""
WITH d AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id, lang,
         (string_split(text, ' '))[1:6] AS words
  FROM documents WHERE doc_id < 300
), g AS (SELECT i FROM generate_series(0, 5) t(i))
SELECT doc_id, kind, text, media_ref, "order" FROM (
  SELECT doc_id, 'section' AS kind, 'Profile ' || lang AS text,
         '' AS media_ref, 0 AS "order" FROM d
  -- 'P' (colspan 2) absorbs A and B; 'Y' (rowspan 2) fills a blank copy
  -- down, so the flatten keeps the super text alone
  UNION ALL SELECT doc_id, 'header', 'P - A', '', 1 FROM d
  UNION ALL SELECT doc_id, 'header', 'P - B', '', 2 FROM d
  UNION ALL SELECT doc_id, 'header', 'Y', '', 3 FROM d
  UNION ALL SELECT doc_id, 'cell', 'w' || CAST(i AS VARCHAR), '',
         4 + 3 * i FROM d, g
  UNION ALL SELECT doc_id, 'cell', words[i + 1], '', 5 + 3 * i FROM d, g
  UNION ALL SELECT doc_id, 'cell', 'z' || CAST(i AS VARCHAR), '',
         6 + 3 * i FROM d, g
)
""",
)
def extract_supersub_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9's multi-row header flatten + W3's blank rowspan fill-down,
    oracle-checked on real markup: colspan-2 'P' absorbs its two
    sub-headers as 'P - A'/'P - B', rowspan-2 'Y' fills a BLANK copy into
    the sub row so the flatten keeps the super text alone
    (HtmlTableParser.py:439-472, :520-587)."""
    from .extract import extract_pipeline

    docs = synthesize_docs_from_testdata(
        spark, sf_dir, supersub=True
    ).filter(F.col("doc_id").substr(F.lit(5), F.lit(10)).cast("int") < 300)
    out, _ = extract_pipeline(docs, num_partitions=16)
    return out.select("doc_id", "kind", "text", "media_ref", "order")


@register(
    "extract_accent_fallback",
    oracle="""
WITH d AS (
  SELECT 'Pelé_' || CAST(doc_id AS VARCHAR) AS doc_id,
         strip_accents('Pelé ' || CAST(doc_id AS VARCHAR)) AS section,
         (string_split(text, ' '))[1:6] AS words
  FROM documents WHERE doc_id < 300
), g AS (SELECT i FROM generate_series(0, 5) t(i))
SELECT doc_id, kind, text, media_ref, "order" FROM (
  -- heading-less doc: the section falls back to the doc_id, which is a
  -- py2 BYTE string there and so IS accent-folded — while the doc_id
  -- column itself stays unfolded (F6's asymmetry)
  SELECT doc_id, 'section' AS kind, section AS text,
         '' AS media_ref, 0 AS "order" FROM d
  UNION ALL SELECT doc_id, 'header', 'Idx', '', 1 FROM d
  UNION ALL SELECT doc_id, 'header', 'Word', '', 2 FROM d
  UNION ALL SELECT doc_id, 'cell', 'w' || CAST(i AS VARCHAR), '',
         3 + 2 * i FROM d, g
  UNION ALL SELECT doc_id, 'cell', words[i + 1], '', 4 + 2 * i FROM d, g
)
""",
)
def extract_accent_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6's asymmetric accent folding oracle-checked: a heading-less page
    takes its section from the doc_id — a byte string in the reference, so
    delete_accented_characters FOLDS it (Utilities.py:451-464, :262-268),
    while heading-derived sections stay unfolded (unicode hits the
    TypeError quirk).  Restricted to NFKD-decomposable accents, where the
    kernel's py2-faithful fold and DuckDB's strip_accents agree."""
    from .extract import extract_pipeline

    docs = synthesize_docs_from_testdata(
        spark, sf_dir, accent_fallback=True
    ).filter(F.col("doc_id").substr(F.lit(6), F.lit(10)).cast("int") < 300)
    out, _ = extract_pipeline(docs, num_partitions=16)
    return out.select("doc_id", "kind", "text", "media_ref", "order")


@register(
    "extract_header_cleanup",
    oracle="""
WITH d AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id, lang,
         (string_split(text, ' '))[1:6] AS words
  FROM documents WHERE doc_id < 300
), g AS (SELECT i FROM generate_series(0, 5) t(i))
SELECT doc_id, kind, text, media_ref, "order" FROM (
  SELECT doc_id, 'section' AS kind, 'Profile ' || lang AS text,
         '' AS media_ref, 0 AS "order" FROM d
  -- header cleanup: nbsp DELETED, ' -> '.', citation stripped
  UNION ALL SELECT doc_id, 'header', 'Idx', '', 1 FROM d
  UNION ALL SELECT doc_id, 'header', 'Wo.rd', '', 2 FROM d
  -- data cleanup asymmetry: nbsp -> ' ', citation KEPT
  UNION ALL SELECT doc_id, 'cell', 'a ' || CAST(i AS VARCHAR), '',
         3 + 2 * i FROM d, g
  UNION ALL SELECT doc_id, 'cell', words[i + 1] || '[2]', '',
         4 + 2 * i FROM d, g
)
""",
)
def extract_header_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F3/F4's header-vs-data cleanup asymmetry oracle-checked: nbsp
    is DELETED from headers but becomes ' ' in data cells; citations are
    stripped from headers but KEPT in data; single quotes become '.' in
    headers only (HtmlTableParser.py:359-367, :474-489, :716-755)."""
    from .extract import extract_pipeline

    docs = synthesize_docs_from_testdata(
        spark, sf_dir, header_quirks=True
    ).filter(F.col("doc_id").substr(F.lit(5), F.lit(10)).cast("int") < 300)
    out, _ = extract_pipeline(docs, num_partitions=16)
    return out.select("doc_id", "kind", "text", "media_ref", "order")


@register(
    "extract_error_metrics",
    oracle="""
SELECT COUNT(*) AS docs, 2 * COUNT(*) AS tot_tables,
       2 * COUNT(*) AS tables_analyzed,
       COUNT(*) AS no_headers, COUNT(*) AS no_data,
       0 AS rows_extracted, 0 AS triples_row, 0 AS kernel_errors
FROM documents WHERE doc_id < 300
""",
)
def extract_error_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/E3 accounting oracle-checked: a headerless table counts
    no_headers, a dataless one counts no_data; both are analyzed, neither
    emits spans, and neither is a kernel ERROR (the reference's expected
    per-table outcomes, HtmlTableParser.py:197-211)."""
    from .extract import extract_pipeline

    docs = synthesize_docs_from_testdata(
        spark, sf_dir, error_tables=True
    ).filter(F.col("doc_id").substr(F.lit(5), F.lit(10)).cast("int") < 300)
    out, metrics = extract_pipeline(docs, num_partitions=16)
    assert out is not None
    return metrics.agg(
        F.count("*").alias("docs"),
        F.sum("tables_num").alias("tot_tables"),
        F.sum("tables_analyzed").alias("tables_analyzed"),
        F.sum("no_headers").alias("no_headers"),
        F.sum("no_data").alias("no_data"),
        F.sum("rows_extracted").alias("rows_extracted"),
        F.sum("triples_row").alias("triples_row"),
        F.sum("kernel_errors").alias("kernel_errors"),
    )


@register(
    "extract_metrics_report",
    oracle="""
SELECT COUNT(*) AS docs, COUNT(*) AS tot_tables, COUNT(*) AS tables_analyzed,
       6 * COUNT(*) AS rows_extracted, 12 * COUNT(*) AS data_extracted,
       6 * COUNT(*) AS triples_row, 0 AS kernel_errors
FROM documents
""",
)
def extract_metrics_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/A1: the reference's final report as one aggregation over the
    per-document metrics table (Utilities.py:384-449)."""
    from .extract import extract_pipeline

    docs = synthesize_docs_from_testdata(spark, sf_dir)
    _, metrics = extract_pipeline(docs, num_partitions=32)
    return metrics.agg(
        F.count("*").alias("docs"),
        F.sum("tables_num").alias("tot_tables"),
        F.sum("tables_analyzed").alias("tables_analyzed"),
        F.sum("rows_extracted").alias("rows_extracted"),
        F.sum("data_extracted").alias("data_extracted"),
        F.sum("triples_row").alias("triples_row"),
        F.sum("kernel_errors").alias("kernel_errors"),
    )


@register(
    "header_inventory",
    # version-robust construct only (the r3 paragraph_dedup incident):
    # top-3 examples via a ROW_NUMBER window + string_agg ORDER BY, not
    # list_sort + list-slice
    oracle="""
WITH hx AS (
  SELECT h.header, 'doc_' || CAST(d.doc_id AS VARCHAR) AS name
  FROM documents d, (SELECT UNNEST(['Idx', 'Word']) AS header) h
), rk AS (
  SELECT header, name,
         ROW_NUMBER() OVER (PARTITION BY header ORDER BY name) AS rn
  FROM hx
), ex AS (
  SELECT header, string_agg(name, ',' ORDER BY name) AS examples
  FROM rk WHERE rn <= 3 GROUP BY header
)
SELECT rk.header, COUNT(*) AS n_tables, ex.examples
FROM rk JOIN ex ON rk.header = ex.header
GROUP BY rk.header, ex.examples
""",
)
def header_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pyDomainExplorer inventory path (SURVEY §3.2 / A5 / A6 / O4):
    distinct headers with table counts and <=3 example pages."""
    from .extract import extract_pipeline

    docs = synthesize_docs_from_testdata(spark, sf_dir)
    out, _ = extract_pipeline(docs, num_partitions=32)
    return (
        out.filter(F.col("kind") == "header")
        .groupBy(F.col("text").alias("header"))
        .agg(
            F.count("*").alias("n_tables"),
            # serialized (not array-typed) so the driver canonicalizer can
            # hash it — arrays are unhashable in its pandas path
            F.array_join(
                F.slice(F.sort_array(F.collect_set("doc_id")), 1, 3), ","
            ).alias("examples"),
        )
    )


_DUCK_TRIPLES_CTE = """
WITH d AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id, lang,
         (string_split(text, ' '))[1:6] AS words
  FROM documents WHERE lang <> 'zh'
), g AS (SELECT i FROM generate_series(1, 6) t(i)),
base AS (SELECT d.doc_id, d.lang, d.words, g.i FROM d, g),
triples AS (
  SELECT doc_id, doc_id AS subject,
         'dbo:' || lang || 'Profile' AS predicate,
         doc_id || '__' || CAST(i AS VARCHAR) AS object,
         'resource' AS object_kind, i * 1000 AS t_order FROM base
  UNION ALL
  SELECT doc_id, doc_id || '__' || CAST(i AS VARCHAR), 'dbo:idx',
         'w' || CAST(i - 1 AS VARCHAR), 'string', i * 1000 + 1 FROM base
  UNION ALL
  SELECT doc_id, doc_id || '__' || CAST(i AS VARCHAR),
         CASE WHEN lang = 'en' THEN 'dbo:word_en' ELSE 'dbo:word' END,
         words[i], 'string', i * 1000 + 2 FROM base
)
"""


def _triples_df(
    spark: SparkSession, sf_dir: str, entities: Optional[DataFrame] = None
) -> DataFrame:
    from .extract import extract_pipeline
    from .triples import emit_triples

    docs = synthesize_docs_from_testdata(spark, sf_dir)
    out, _ = extract_pipeline(docs, num_partitions=32)
    # emit_triples fans the extraction out into four consumers (tables,
    # cells, row triples, cell triples); without the persist the kernel
    # stage re-executes once per consumer (4x MapInArrow in the audit —
    # scripts/scale_audit.py).  Production writes the parse to a table and
    # branches from it (write-then-branch); persist is the query-surface
    # equivalent.
    out = out.persist()
    rules = spark.createDataFrame(
        [
            ("SECTION_Profile en", "dbo:enProfile"),
            ("SECTION_Profile de", "dbo:deProfile"),
            ("SECTION_Profile es", "dbo:esProfile"),
            ("SECTION_Profile fr", "dbo:frProfile"),
            # deliberately NO rule for zh -> the section gate (J2) drops
            # those tables entirely, like the reference's unmapped sections
            ("Profile en_Word", "dbo:word_en"),  # strict beats loose for en
            ("Word", "dbo:word"),  # loose fallback for de/es/fr
            ("Idx", "dbo:idx"),
        ],
        ["key", "property"],
    )
    return emit_triples(out, rules, entities=entities)


@register(
    "emit_triples",
    oracle=_DUCK_TRIPLES_CTE
    + "SELECT doc_id, subject, predicate, object, object_kind, t_order FROM triples",
)
def emit_triples_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference Mapper's full output path (J1 strict/loose cascade, J2
    section gate, J5 positional header join, A9 reification, F10 typing) as
    DataFrame ops over the extraction output (plans/triples.py)."""
    return _triples_df(spark, sf_dir)


def _probed_triples_oracle() -> str:
    """The emit_triples oracle with an ``ents`` vocabulary-quarter CTE and
    the two cell branches' kind switched to a probe CASE — built by string
    surgery on `_DUCK_TRIPLES_CTE` so the two oracles can never drift."""
    ents = f"""ents AS (
  SELECT DISTINCT w AS entity
  FROM (SELECT unnest((string_split(text, ' '))[1:6]) AS w FROM documents)
  WHERE {DUCK_HASH.format('w')} % 4 = 0
), """
    sql = _DUCK_TRIPLES_CTE.replace("WITH d AS", "WITH " + ents + "d AS", 1)
    sql = sql.replace(
        "'w' || CAST(i - 1 AS VARCHAR), 'string', i * 1000 + 1 FROM base",
        "'w' || CAST(i - 1 AS VARCHAR),\n"
        "         CASE WHEN 'w' || CAST(i - 1 AS VARCHAR) IN "
        "(SELECT entity FROM ents)\n"
        "              THEN 'resource' ELSE 'string' END,\n"
        "         i * 1000 + 1 FROM base",
    )
    sql = sql.replace(
        "words[i], 'string', i * 1000 + 2 FROM base",
        "words[i],\n"
        "         CASE WHEN words[i] IN (SELECT entity FROM ents)\n"
        "              THEN 'resource' ELSE 'string' END,\n"
        "         i * 1000 + 2 FROM base",
    )
    return (
        sql
        + "SELECT doc_id, subject, predicate, object, object_kind, t_order"
        " FROM triples"
    )


@register("emit_triples_probed", oracle=_probed_triples_oracle())
def emit_triples_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """emit_triples with the entity-existence probe enabled
    (Mapper.check_value_type -> check_if_is_resource): the entity dimension
    is a deterministic quarter of the corpus vocabulary (60-bit hash % 4),
    so the output mixes probe hits ('resource' cells carrying the adjusted
    name) and misses ('string') — J3's semi-join probe running INSIDE the
    emission path, broadcast like every rules join."""
    docs = load_table(spark, sf_dir, "documents")
    ents = (
        docs.select(
            F.explode(F.slice(F.split("text", " "), 1, 6)).alias("entity")
        )
        .distinct()
        .filter(spark_hash(F.col("entity")) % 4 == 0)
    )
    return _triples_df(spark, sf_dir, entities=ents)


@register(
    "emit_triples_media",
    oracle="""
WITH d AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id, lang
  FROM documents WHERE lang <> 'zh' AND doc_id < 300
), g AS (SELECT i FROM generate_series(1, 6) t(i)),
base AS (SELECT d.doc_id, d.lang, g.i FROM d, g)
SELECT doc_id, subject, predicate, object, object_kind, t_order FROM (
  SELECT doc_id, doc_id AS subject,
         'dbo:' || lang || 'Profile' AS predicate,
         doc_id || '__' || CAST(i AS VARCHAR) AS object,
         'resource' AS object_kind, i * 1000 AS t_order FROM base
  UNION ALL
  SELECT doc_id, doc_id || '__' || CAST(i AS VARCHAR), 'dbo:idx',
         'w' || CAST(i - 1 AS VARCHAR), 'string', i * 1000 + 1 FROM base
  UNION ALL
  -- the media-anchored word cell: object = the image href, kind 'uri'
  SELECT doc_id, doc_id || '__' || CAST(i AS VARCHAR),
         CASE WHEN lang = 'en' THEN 'dbo:word_en' ELSE 'dbo:word' END,
         'img://' || doc_id || '/r' || CAST(i - 1 AS VARCHAR) || '.jpg',
         'uri', i * 1000 + 2 FROM base
)
""",
)
def emit_triples_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Mapper's media path oracle-checked: a cell whose value carries a
    media link emits its triple with the HREF as the object and
    object_kind='uri' (the reference's image-anchor handling,
    HtmlTableParser.py:674-714 + Mapper object typing) — previously this
    branch was only golden-pinned."""
    from .extract import extract_pipeline
    from .triples import emit_triples

    docs = synthesize_docs_from_testdata(
        spark, sf_dir, media_anchors=True
    ).filter(F.col("doc_id").substr(F.lit(5), F.lit(10)).cast("int") < 300)
    out, _ = extract_pipeline(docs, num_partitions=16)
    out = out.persist()
    rules = spark.createDataFrame(
        [
            ("SECTION_Profile en", "dbo:enProfile"),
            ("SECTION_Profile de", "dbo:deProfile"),
            ("SECTION_Profile es", "dbo:esProfile"),
            ("SECTION_Profile fr", "dbo:frProfile"),
            ("Profile en_Word", "dbo:word_en"),
            ("Word", "dbo:word"),
            ("Idx", "dbo:idx"),
        ],
        ["key", "property"],
    )
    return emit_triples(out, rules)


@register(
    "ttl_lines_media",
    oracle="""
WITH d AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id, lang
  FROM documents WHERE lang <> 'zh' AND doc_id < 300
), g AS (SELECT i FROM generate_series(1, 6) t(i)),
base AS (SELECT d.doc_id, d.lang, g.i FROM d, g)
SELECT doc_id, i * 1000 + 2 AS t_order,
       '<http://dbpedia.org/resource/' || doc_id || '__'
         || CAST(i AS VARCHAR) || '> '
       || '<http://dbpedia.org/ontology/'
         || CASE WHEN lang = 'en' THEN 'dbo:word_en' ELSE 'dbo:word' END
         || '> '
       || '<img://' || doc_id || '/r' || CAST(i - 1 AS VARCHAR) || '.jpg>'
       || ' .' AS line
FROM base
""",
)
def ttl_lines_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5's <uri> object serialization oracle-checked: media-valued cells
    must come out as bare IRI terms, not quoted literals (rdflib URIRef
    behavior, Analyzer.py:198-245)."""
    from .triples import ttl_lines

    triples = emit_triples_media(spark, sf_dir).filter(
        F.col("object_kind") == "uri"
    )
    return ttl_lines(triples)


@register(
    "ttl_lines",
    oracle=_DUCK_TRIPLES_CTE
    + """
SELECT doc_id, t_order,
       '<http://dbpedia.org/resource/' || subject || '> '
       || '<http://dbpedia.org/ontology/' || predicate || '> '
       || CASE WHEN object_kind = 'resource'
               THEN '<http://dbpedia.org/resource/' || object || '>'
               ELSE '"' || object
                    || '"^^<http://www.w3.org/2001/XMLSchema#string>' END
       || ' .' AS line
FROM triples
""",
)
def ttl_lines_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: the TTL sink — turtle serialization as a text column
    (plans/triples.ttl_lines; write with df.write.text)."""
    from .triples import ttl_lines

    return ttl_lines(_triples_df(spark, sf_dir))


# ===========================================================================
# B. core relational operators over the TPC-H-ish tables
# ===========================================================================


@register(
    "settings_inventory",
    oracle="""
WITH d AS (
  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_id,
         'Profile ' || lang AS section
  FROM documents
), sh AS (
  SELECT section, h.header, doc_id
  FROM d, (SELECT UNNEST(['Idx', 'Word']) AS header) h
), rk AS (
  SELECT section, header, doc_id,
         ROW_NUMBER() OVER (PARTITION BY section, header
                            ORDER BY doc_id) AS rn
  FROM sh
), ex AS (
  SELECT section, header,
         string_agg(doc_id, ',' ORDER BY doc_id) AS examples
  FROM rk WHERE rn <= 3 GROUP BY section, header
)
SELECT rk.section, rk.header, COUNT(*) AS n_tables, ex.examples,
       CASE WHEN rk.header = 'Word' THEN 'dbo:word' ELSE '' END AS property
FROM rk JOIN ex ON rk.section = ex.section AND rk.header = ex.header
GROUP BY rk.section, rk.header, ex.examples
""",
)
def settings_inventory_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/A5/A6/O4/J4: the full pyDomainExplorer inventory path — sections x
    headers with <=3 example pages and ontology-prefilled properties
    (plans/explorer.py); 'Idx' has no ontology label, so its property is the
    blank the user fills in."""
    from .explorer import settings_inventory
    from .extract import extract_pipeline

    docs = synthesize_docs_from_testdata(spark, sf_dir)
    out, _ = extract_pipeline(docs, num_partitions=32)
    # table_inventory joins the sections and headers branches of the same
    # extraction — persist so the kernel stage runs once, not per branch
    out = out.persist()
    ontology = spark.createDataFrame(
        [("word", "dbo:word"), ("unused", "dbo:unused")], ["label", "property"]
    )
    # serialize the examples array so the driver canonicalizer can hash it
    return settings_inventory(out, ontology).withColumn(
        "examples", F.array_join("examples", ",")
    )


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_base_price,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_disc_value,
       COUNT(*) AS count_order,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 6) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship relational aggregate (TPC-H Q1 shape): map-side partial aggs,
    two-key groupBy, decimal-exact sums (A1/A2 pattern at warehouse scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # sums accumulate DECIMAL-exact; the returned columns are rounded
            # doubles so Spark and DuckDB stringify identically for the hash
            F.round(F.sum(dec("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")).cast("double"), 2).alias(
                "sum_base_price"
            ),
            F.round(
                F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double"), 2
            ).alias("sum_disc_value"),
            F.count("*").alias("count_order"),
            F.round(
                F.sum(dec("l_quantity")).cast("double") / F.count("*"), 6
            ).alias("avg_qty"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
         AS revenue,
       epoch_us(o_orderdate) AS orderdate_us,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> two joins -> agg -> top-10.
    The customer side is filter-reduced and broadcast; only lineitem (the
    fact) shuffles for the aggregation — the join order Catalyst should and
    does pick once the filters are pushed into the scans."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).cast(
                    "double"
                ),
                2,
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_us"
            ),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
         AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the six-table join: revenue by nation where the
    CUSTOMER and the SUPPLIER sit in the same nation of one region, over a
    two-year order window (the date filter prunes ORDERS, map-side).  The
    multi-join planning showcase: region, nation, and supplier are truly
    dimension-sized (bounded / sub-linear in scale factor) and carry
    explicit broadcast hints; CUSTOMER grows linearly with the fact
    (~2.5% of lineitem rows in TPC-H), so it gets NO forced hint — AQE +
    autoBroadcastJoinThreshold picks a broadcast join at small SF and
    degrades gracefully to a shuffle join at the 100-TB target, where a
    forced broadcast would OOM the driver.  The same-nation predicate
    rides INSIDE the supplier join condition, never as a post-join filter
    over a wider cross product.  Decimal-exact revenue per the engine's
    money policy, rounded double at the surface."""
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).cast(
                    "double"
                ),
                2,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH pp AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 2) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small_orders
FROM lineitem JOIN pp USING (l_partkey)
WHERE 5 * CAST(l_quantity AS DECIMAL(18,2)) * c < s
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — the DECORRELATED scalar subquery: "lineitems
    whose quantity is below 20% of their part's average".  The naive form
    re-computes a correlated per-part average per row; the scale form
    computes the per-part (sum, count) ONCE (partial-agg'd, part-table
    sized) and joins it back onto the fact, so the threshold filter runs
    right at the join.  The aggregate is part-table sized — LINEAR in
    scale factor (~3% of lineitem rows in TPC-H) — so it carries NO
    forced broadcast hint: AQE picks a broadcast join while it fits and a
    sort-merge join at the 100-TB target, where forcing the hint would
    OOM.  The 0.2x-average compare is kept EXACT by clearing the
    division: 5*qty*cnt < sum in DECIMAL — no float threshold, no
    per-row divide.  One fact shuffle (the per-part agg); the revenue
    total is a single-row aggregate."""
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity")).alias("s"),
        F.count("*").cast("long").alias("c"),
    )
    return (
        li.join(per_part, "l_partkey")
        .filter(5 * dec("l_quantity") * F.col("c") < F.col("s"))
        .agg(
            F.round(
                F.sum(dec("l_extendedprice")).cast("double") / 7.0, 2
            ).alias("avg_yearly"),
            F.count("*").cast("long").alias("n_small_orders"),
        )
    )


@register(
    "rollup_event_stats",
    oracle="""
SELECT event_type, user_id, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       CAST(GROUPING(user_id) AS INT) AS g_user
FROM events
GROUP BY ROLLUP(event_type, user_id)
""",
)
def rollup_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 at multiple granularities in ONE pass: ROLLUP computes
    (type,user), (type), and grand-total rows in a single shuffle — the
    alternative of three groupBys scans the fact table three times."""
    ev = load_table(spark, sf_dir, "events")
    return ev.rollup("event_type", "user_id").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_value"),
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("user_id").cast("int").alias("g_user"),
    ).select("event_type", "user_id", "n", "sum_value", "g_type", "g_user")


@register(
    "window_moving_avg",
    oracle="""
SELECT event_id, user_id,
       ROUND(CAST(AVG(CAST(value AS DECIMAL(18,2)))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
         AS mavg
FROM events
""",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-frame moving average: a ROWS frame keeps the window operator
    streaming (constant memory per partition) — never an unbounded RANGE
    frame where a bounded one answers the question."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.avg(F.col("value").cast("decimal(18,2)")).over(w).cast("double"),
            6,
        ).alias("mavg"),
    )


@register(
    "percentile_summary",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50,
       ROUND(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90,
       ROUND(quantile_cont(CAST(value AS DOUBLE), 0.99), 6) AS p99
FROM events GROUP BY event_type
""",
)
def percentile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group.  Exact percentile
    needs the group's values sorted, so it is the right tool up to groups
    that fit an executor; beyond that switch to approx_percentile (t-digest,
    mergeable map-side) — pinned separately in pytest because its sketch is
    engine-specific and can never hash-match a DuckDB oracle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.99)"), 6).alias("p99"),
    )


@register(
    "windowed_event_counts",
    oracle="""
SELECT epoch_us(time_bucket(INTERVAL '10 minutes', ts)) AS window_start_us,
       epoch_us(time_bucket(INTERVAL '10 minutes', ts)
                + INTERVAL '10 minutes') AS window_end_us,
       event_type, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM events GROUP BY 1, 2, 3
""",
)
def windowed_event_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming windowed-aggregation operator (streaming/stateful.py)
    run in batch mode — identical plan minus the watermark state; the
    streaming form (watermark closes windows, late data dropped, restart
    resumes) is pinned in tests/test_streaming_stateful.py."""
    from ..streaming.stateful import windowed_event_counts

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return windowed_event_counts(ev)


@register(
    "time_rollup_daily",
    oracle="""
SELECT epoch_us(time_bucket(INTERVAL '1 day', ts)) AS bucket_start_us,
       event_type, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_value
FROM events GROUP BY 1, 2
""",
)
def time_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-aggregate rollup view (operators/rollup_maintenance)
    computed in batch; the incremental-merge path (N increments == full
    recompute, untouched partitions byte-stable) is pinned in
    tests/test_rollup_maintenance.py."""
    from ..operators.rollup_maintenance import rollup_increment

    ev = load_table(spark, sf_dir, "events")
    r = rollup_increment(ev, "1 day")
    return r.select(
        "bucket_start_us",
        "event_type",
        "n",
        F.round(F.col("sum_value").cast("double"), 2).alias("sum_value"),
    )


@register(
    "full_outer_reconciliation",
    oracle="""
WITH o AS (
  SELECT o_orderkey AS k,
         ROUND(CAST(o_totalprice AS DOUBLE), 2) AS total
  FROM orders WHERE o_orderkey < 2000
), l AS (
  SELECT l_orderkey AS k,
         ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
           AS line_sum
  FROM lineitem WHERE l_orderkey < 1500 GROUP BY l_orderkey
)
SELECT coalesce(o.k, l.k) AS orderkey, o.total, l.line_sum,
       CASE WHEN o.k IS NULL THEN 'lines_without_order'
            WHEN l.k IS NULL THEN 'order_without_lines'
            ELSE 'both' END AS status
FROM o FULL OUTER JOIN l ON o.k = l.k
""",
)
def full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source reconciliation (the warehouse orphan audit): FULL OUTER join
    of two feeds with asymmetric slices, classifying every key as matched
    or orphaned on either side.  Full outer cannot broadcast — it plans as
    a sort-merge join on the key, which is the right shape here."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            F.col("o_orderkey").alias("ok"),
            F.round(F.col("o_totalprice").cast("double"), 2).alias("total"),
        )
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 1500)
        .groupBy(F.col("l_orderkey").alias("lk"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("line_sum")
        )
    )
    j = o.join(li, o.ok == li.lk, "full_outer")
    return j.select(
        F.coalesce("ok", "lk").alias("orderkey"),
        "total",
        "line_sum",
        F.when(F.col("ok").isNull(), "lines_without_order")
        .when(F.col("lk").isNull(), "order_without_lines")
        .otherwise("both")
        .alias("status"),
    )


@register(
    "heavy_hitters",
    oracle="""
SELECT user_id, n, CAST(rk AS INT) AS rk FROM (
  SELECT user_id, COUNT(*) AS n,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS rk
  FROM events GROUP BY user_id
) WHERE rk <= 10
""",
)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (hot keys — the skew-detection input): one
    partial-aggregated groupBy then a top-10.  The mergeable-sketch variant
    (count_min_sketch, for when even the per-key agg is too wide) is
    error-bound-pinned in pytest — its binary is engine-specific."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy(F.col("n").desc(), "user_id")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
    )


@register(
    "skew_report",
    oracle="""
WITH per AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt FROM documents GROUP BY lang
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS __total FROM documents
), top AS (
  SELECT lang, cnt FROM per ORDER BY cnt DESC, lang LIMIT 20
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, lang) AS BIGINT) AS rank,
       lang, cnt,
       CAST((1000000 * cnt) // __total AS BIGINT) AS share_ppm
FROM top, tot
""",
)
def skew_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-shuffle skew diagnostic (operators/repartition.skew_report):
    the hot-key profile of a join/aggregation key, run BEFORE committing a
    plan to a big shuffle — it decides broadcast-vs-salt-vs-AQE while the
    decision is still cheap.  share_ppm is each key's integer ppm share of
    all rows; a key at ~1e6/P ppm (P = shuffle partitions) already owns an
    entire partition, which is exactly the mega-article skew the corpus's
    ``lang`` column exhibits (en ≈ 44%).  The per-key count is map-side
    partial-agg'd; the global top-k is TakeOrderedAndProject (never a full
    sort of the key table); the rank window runs over the already-LIMITed
    top_k rows — a bounded single-partition stage by construction."""
    from ..operators.repartition import skew_report

    docs = load_table(spark, sf_dir, "documents")
    return skew_report(docs, "lang", top_k=20)


def _duck_pagerank_round(prev: str, out: str) -> str:
    """One exact-integer PageRank CTE: rank' = 150000 + 850000 *
    sum(rank div outdeg) div 1e6 (DuckDB SUM promotes to int128; the
    final CAST lands every round back on BIGINT like the Spark side)."""
    return f"""{out} AS (
  SELECT n.node,
         CAST(150000 + 850000 * COALESCE(SUM(r.rank_ppm // d.deg), 0)
              // 1000000 AS BIGINT) AS rank_ppm
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN outdeg d ON d.src = e.src
  LEFT JOIN {prev} r ON r.node = e.src
  GROUP BY n.node
)"""


@register(
    "supplier_pagerank",
    oracle=f"""
WITH pairs AS (
  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS c,
                  's:' || CAST(l_suppkey AS VARCHAR) AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION
  SELECT s AS src, c AS dst FROM pairs
), outdeg AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), r0 AS (
  SELECT node, CAST(1000000 AS BIGINT) AS rank_ppm FROM nodes
), {_duck_pagerank_round("r0", "r1")},
{_duck_pagerank_round("r1", "r2")},
{_duck_pagerank_round("r2", "r3")}
SELECT node, rank_ppm,
       CAST(ROW_NUMBER() OVER (ORDER BY rank_ppm DESC, node) AS BIGINT) AS rk
FROM r3 ORDER BY rank_ppm DESC, node LIMIT 20
""",
)
def supplier_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph ranking (operators/graph.pagerank): 3 exact-integer
    PageRank rounds over the customer<->supplier interaction graph mined
    from orders x lineitem (both directions, so the graph is cyclic and
    mass actually circulates), then the top-20 nodes.  The iteration is
    the Pregel-ish DataFrame shape — one join + one partial-agg'd groupBy
    per round, ZERO driver traffic inside the loop — and the ppm integer
    arithmetic is order-invariant, so the oracle replays all three rounds
    as chained CTEs bit-for-bit.  Top-20 is TakeOrderedAndProject, never
    a full sort of the node table."""
    from ..operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank(edges, iters=3)
    w = Window.orderBy(F.col("rank_ppm").desc(), F.col("node"))
    return (
        ranks.orderBy(F.col("rank_ppm").desc(), F.col("node"))
        .limit(20)
        .withColumn("rk", F.row_number().over(w).cast("long"))
    )


@register(
    "event_funnel",
    oracle="""
WITH u0 AS (SELECT DISTINCT user_id FROM events),
s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id
),
tiers AS (
      SELECT 0 AS i, '(all)' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM u0
  UNION ALL SELECT 1, 'view', CAST(COUNT(*) AS BIGINT) FROM s1
  UNION ALL SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM s2
  UNION ALL SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
)
SELECT CAST(i AS BIGINT) AS step_idx, step, n_users,
       CAST(CASE WHEN i > 0 AND lag(n_users) OVER (ORDER BY i) > 0
                 THEN 1000000 * n_users
                      // lag(n_users) OVER (ORDER BY i) END AS BIGINT)
         AS conversion_ppm
FROM tiers
""",
)
def event_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel analysis (operators/funnel.funnel_counts): users
    surviving view -> click -> purchase under STRICT temporal ordering
    (step k+1 counts only events strictly after the user's earliest
    qualifying step-k event; same-instant ties do not advance).  One
    filtered per-user aggregation per step, each joined to the shrinking
    survivor table of the previous step on the user key — partitioning
    reused across steps, no window over the raw event table; the k+1-row
    report is the only bounded-window stage.  Integer ppm conversions,
    replayed by chained CTEs."""
    from ..operators.funnel import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(ev, ["view", "click", "purchase"])


@register(
    "join_size_estimate",
    oracle=f"""
WITH k AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
cells AS (
  SELECT t.r AS row,
         ({DUCK_HASH.format("CAST(t.r AS VARCHAR) || '|' || k.key")} % 256)
           AS cell,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM k, generate_series(0, 3) t(r)
  GROUP BY 1, 2
),
per_row AS (
  SELECT row, CAST(SUM(cnt * cnt) AS BIGINT) AS s FROM cells GROUP BY row
),
exact AS (
  SELECT CAST(SUM(n * n) AS BIGINT) AS exact_join_rows FROM (
    SELECT COUNT(*) AS n FROM events GROUP BY user_id
  )
)
SELECT CAST(MIN(s) AS BIGINT) AS est_join_rows, exact_join_rows
FROM per_row, exact GROUP BY exact_join_rows
""",
)
def join_size_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based join-size pre-flight (operators/sketches.
    countmin_join_size): estimate |events self-join on user_id| — the
    quadratic-blowup question behind every pair-generation stage — from
    the count-min inner product (Cormode & Muthukrishnan 2005), paired
    with the exact sum-of-squares for audit.  est >= exact always; the
    whole answer comes from two d*w cell tables, never a key shuffle of
    the event table.  Complements skew_report: that names the hot keys,
    this prices the join they would produce."""
    from ..operators import sketches as SK

    ev = load_table(spark, sf_dir, "events")
    keys = ev.select(F.col("user_id").cast("string").alias("key"))
    est = SK.countmin_join_size(keys, keys)
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .agg(
            F.sum(F.col("n") * F.col("n"))
            .cast("long")
            .alias("exact_join_rows")
        )
    )
    return est.crossJoin(F.broadcast(exact))


@register(
    "event_rate_spikes",
    oracle="""
WITH b AS (
  SELECT epoch_us(ts) // 3600000000 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), r AS (
  SELECT bucket, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt, bucket) AS rn,
         COUNT(*) OVER () AS tot
  FROM b
), m AS (SELECT cnt AS med FROM r WHERE rn = (tot + 1) // 2)
SELECT CAST(r.bucket AS BIGINT) AS bucket, r.cnt,
       CAST(m.med AS BIGINT) AS med,
       CAST(CASE WHEN 2 * r.cnt > 3 * m.med THEN 1 ELSE 0 END AS BIGINT)
         AS is_spike
FROM r, m
""",
)
def event_rate_spikes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-rate anomaly report: hourly event counts flagged against the
    EXACT low-median baseline (cnt > 1.5x median, all-integer compare —
    2*cnt > 3*med — no float thresholds).  The crawler-ops question "did
    an hour spike" answered deterministically: the hour bucket is integer
    epoch-microsecond division (timestamp-parity convention), the median
    is the rank-(n+1)/2 element of the BUCKET table — bounded by elapsed
    hours, not events, so its single-partition rank window is bounded by
    construction (same rule as skew_report's rank stage); the corpus-
    sized work is one partial-agg'd groupBy."""
    ev = load_table(spark, sf_dir, "events")
    buckets = (
        ev.select(
            # floor-div (not div's truncate-toward-zero) so pre-1970
            # timestamps bucket identically to DuckDB's `//`
            F.expr(
                "(unix_micros(cast(ts as timestamp))"
                " - pmod(unix_micros(cast(ts as timestamp)), 3600000000))"
                " div 3600000000"
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = Window.orderBy("cnt", "bucket")
    ranked = buckets.withColumn(
        "rn", F.row_number().over(w)
    ).withColumn("tot", F.count("*").over(Window.partitionBy()))
    med = (
        ranked.filter(F.col("rn") == F.expr("(tot + 1) div 2"))
        .select(F.col("cnt").cast("long").alias("med"))
    )
    return (
        buckets.crossJoin(F.broadcast(med))
        .withColumn(
            "is_spike",
            F.when(2 * F.col("cnt") > 3 * F.col("med"), 1)
            .otherwise(0)
            .cast("long"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "cnt", "med", "is_spike",
        )
    )


@register(
    "curriculum_buckets",
    oracle="""
WITH h AS (
  SELECT n_chars // 8 AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1
), c AS (
  SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin) AS cum,
         SUM(cnt) OVER () AS n_total
  FROM h
), p AS (
  SELECT unnest([100000, 200000, 300000, 400000, 500000,
                 600000, 700000, 800000, 900000]) AS p_ppm
), br AS (
  SELECT p_ppm, MIN(bin) * 8 + 7 AS est_hi
  FROM c, p
  WHERE cum * 1000000 >= p_ppm * n_total
  GROUP BY p_ppm
), a AS (
  SELECT d.doc_id, d.n_chars,
         1 + (SELECT COUNT(*) FROM br WHERE br.est_hi < d.n_chars)
           AS bucket
  FROM documents d
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM a GROUP BY bucket
""",
)
def curriculum_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum bucketing WITHOUT a global sort: docs assigned to ~decile
    length buckets by comparing n_chars to boundaries derived from the
    bounded histogram sketch — the range-partitioner pattern (boundaries
    from a summary, assignment map-side), where the naive NTILE form
    would drag the whole corpus through one ordering partition.  The nine
    decile boundaries broadcast as ONE array row; each doc's bucket is
    1 + count(boundaries < n_chars) via a map-side array filter.  Bucket
    populations are decile-approximate (bracket-rounded — the honest
    sketch trade, bounded by bin_width); boundaries and assignment are
    bit-deterministic, so the oracle replays histogram, brackets, and
    every assignment."""
    from ..operators.sketches import histogram_quantile_brackets, histogram_sketch

    docs = load_table(spark, sf_dir, "documents")
    hist = histogram_sketch(
        docs.select(F.col("n_chars").alias("val")), bin_width=8
    )
    probs = [p * 100_000 for p in range(1, 10)]
    bounds = (
        histogram_quantile_brackets(hist, probs, bin_width=8)
        .agg(F.array_sort(F.collect_list("est_hi")).alias("bs"))
    )
    return (
        docs.crossJoin(F.broadcast(bounds))
        .select(
            (
                1
                + F.size(
                    F.filter("bs", lambda b: b < F.col("n_chars"))
                )
            )
            .cast("long")
            .alias("bucket"),
            "n_chars",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


@register(
    "corpus_datasheet",
    oracle="""
SELECT 'n_docs' AS metric, CAST(COUNT(*) AS BIGINT) AS val FROM documents
UNION ALL SELECT 'n_tokens',
  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) FROM documents
UNION ALL SELECT 'n_langs',
  CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents
UNION ALL SELECT 'n_sources',
  CAST(COUNT(DISTINCT source) AS BIGINT) FROM documents
UNION ALL SELECT 'n_exact_dup_docs',
  CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) FROM documents
UNION ALL SELECT 'max_doc_tokens',
  CAST(MAX(len(string_split(text, ' '))) AS BIGINT) FROM documents
UNION ALL SELECT 'min_doc_tokens',
  CAST(MIN(len(string_split(text, ' '))) AS BIGINT) FROM documents
""",
)
def corpus_datasheet_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card stat block (Gebru et al. 2021, "Datasheets for
    Datasets"): the headline numbers a corpus release publishes — doc and
    token totals, language/source breadth, the exact-duplicate count, and
    the doc-length envelope — as ONE single-scan aggregate row stacked
    into (metric, val).  All counts exact int64 (the exact-dup figure
    needs a distinct over text: an honest full-corpus distinct; at
    10^12 docs swap in the HLL estimate from hll_distinct_estimate when
    approximate is acceptable)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    agg = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        (F.count("*") - F.countDistinct("text"))
        .cast("long")
        .alias("n_exact_dup_docs"),
        F.max(toks).cast("long").alias("max_doc_tokens"),
        F.min(toks).cast("long").alias("min_doc_tokens"),
    )
    return agg.selectExpr(
        "stack(7, "
        "'n_docs', n_docs, 'n_tokens', n_tokens, 'n_langs', n_langs, "
        "'n_sources', n_sources, 'n_exact_dup_docs', n_exact_dup_docs, "
        "'max_doc_tokens', max_doc_tokens, 'min_doc_tokens', min_doc_tokens"
        ") AS (metric, val)"
    )


@register(
    "cohort_retention",
    oracle="""
WITH c AS (
  SELECT user_id,
         MIN(epoch_us(ts)) // 604800000000 AS cohort_period
  FROM events GROUP BY user_id
), a AS (
  SELECT DISTINCT e.user_id, c.cohort_period,
         epoch_us(e.ts) // 604800000000 - c.cohort_period AS period_offset
  FROM events e JOIN c ON e.user_id = c.user_id
), n AS (
  SELECT cohort_period, period_offset,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM a GROUP BY cohort_period, period_offset
), s AS (
  SELECT cohort_period, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM c GROUP BY cohort_period
)
SELECT CAST(n.cohort_period AS BIGINT) AS cohort_period,
       CAST(period_offset AS BIGINT) AS period_offset,
       n_users, cohort_size,
       CAST(1000000 * n_users // cohort_size AS BIGINT) AS retention_ppm
FROM n JOIN s ON n.cohort_period = s.cohort_period
""",
)
def cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (operators/funnel.cohort_retention): users
    bucketed by the WEEK of their first event (integer division of epoch
    microseconds — the timestamp-parity convention, no calendar/timezone
    functions), each later week reporting how many came back, in exact
    ppm of the cohort.  One per-user min, one co-partitioned user-key
    join, a (user, cohort, offset) distinct bounded by active
    user-periods, two bounded-key aggregations, cohort sizes broadcast."""
    from ..operators.funnel import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev)


@register(
    "resource_count",
    oracle="SELECT COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders FROM orders",
)
def resource_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: SPARQL count(distinct ?s) -> countDistinct."""
    return load_table(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@register(
    "effectiveness_ratio",
    oracle="""
SELECT ROUND(CAST(SUM(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS effectiveness
FROM lineitem
""",
)
def effectiveness_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: mapped/extractable ratio as a single agg (Utilities.py:445-449)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(
            F.sum(F.when(F.col("l_discount") > 0, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("effectiveness")
    )


@register(
    "min_rows_filter",
    oracle="""
SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1
""",
)
def min_rows_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: n_rows > 1 gate (pyDomainExplorer.py:79-81) as HAVING."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


@register(
    "totale_filter",
    oracle="""
SELECT event_type, COUNT(*) AS n FROM events
WHERE event_type <> 'error' GROUP BY event_type
""",
)
def totale_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: drop marker rows (HtmlTableParser.py:783-800) as a NOT-filter."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") != "error")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "rule_lookup_cascade",
    oracle="""
WITH strict_rules AS (
  SELECT n_nationkey AS key, 'nation:' || n_name AS property
  FROM nation WHERE n_nationkey % 2 = 0
), loose_rules AS (
  SELECT r_regionkey AS key, 'region:' || r_name AS property FROM region
)
SELECT COALESCE(s.property, l.property, 'UNMAPPED') AS property,
       COUNT(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN strict_rules s ON c.c_nationkey = s.key
LEFT JOIN loose_rules l ON n.n_regionkey = l.key
GROUP BY 1
""",
)
def rule_lookup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: the strict-then-loose mapping-rule cascade (Mapper.py:134-191) as
    two BROADCAST left joins + coalesce — the Spark-native replacement for the
    reference's per-cell dict probes."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    strict = nation.filter(F.col("n_nationkey") % 2 == 0).select(
        F.col("n_nationkey").alias("skey"),
        F.concat(F.lit("nation:"), "n_name").alias("sprop"),
    )
    loose = region.select(
        F.col("r_regionkey").alias("lkey"),
        F.concat(F.lit("region:"), "r_name").alias("lprop"),
    )
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(strict), F.col("c_nationkey") == F.col("skey"), "left")
        .join(F.broadcast(loose), F.col("n_regionkey") == F.col("lkey"), "left")
        .select(
            F.coalesce("sprop", "lprop", F.lit("UNMAPPED")).alias("property")
        )
        .groupBy("property")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "section_rule_gate",
    oracle="""
WITH section_rules AS (
  SELECT UNNEST(['1-URGENT', '2-HIGH']) AS key,
         UNNEST(['urgent', 'high']) AS property
)
SELECT r.property, COUNT(*) AS n FROM orders o
JOIN section_rules r ON o.o_orderpriority = r.key
GROUP BY r.property
""",
)
def section_rule_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: SECTION_ rule gate (Mapper.py:147-155) — unmapped sections drop the
    whole table; here an inner broadcast join drops unmapped orders."""
    orders = load_table(spark, sf_dir, "orders")
    rules = spark.createDataFrame(
        [("1-URGENT", "urgent"), ("2-HIGH", "high")], ["key", "property"]
    )
    return (
        orders.join(F.broadcast(rules), orders.o_orderpriority == rules.key)
        .groupBy("property")
        .agg(F.count("*").alias("n"))
    )


@register(
    "entity_probe_semi",
    oracle="""
SELECT c_nationkey, COUNT(*) AS n FROM customer
WHERE c_nationkey IN (SELECT s_nationkey FROM supplier)
GROUP BY c_nationkey
""",
)
def entity_probe_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: the resource-existence ASK probe (Mapper.py:216-237) as a broadcast
    LEFT SEMI join against the known-entities table."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.join(
            F.broadcast(supplier.select(F.col("s_nationkey").alias("c_nationkey"))),
            on="c_nationkey",
            how="leftsemi",
        )
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
    )


@register(
    "rules_merge",
    oracle="""
WITH old_rules AS (
  SELECT n_name AS key, 'old:' || CAST(n_nationkey AS VARCHAR) AS property,
         0 AS version FROM nation
), new_rules AS (
  SELECT n_name AS key, 'new:' || CAST(n_nationkey AS VARCHAR) AS property,
         1 AS version FROM nation WHERE n_nationkey % 3 = 0
), unioned AS (
  SELECT * FROM old_rules UNION ALL SELECT * FROM new_rules
)
SELECT key, arg_max(property, version) AS property FROM unioned GROUP BY key
""",
)
def rules_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6/J7: old ∪ new rules, last-wins (MapperTools.py:130-147) via
    unionByName + max_by on a version column."""
    nation = load_table(spark, sf_dir, "nation")
    old = nation.select(
        F.col("n_name").alias("key"),
        F.concat(F.lit("old:"), F.col("n_nationkey").cast("string")).alias("property"),
        F.lit(0).alias("version"),
    )
    new = nation.filter(F.col("n_nationkey") % 3 == 0).select(
        F.col("n_name").alias("key"),
        F.concat(F.lit("new:"), F.col("n_nationkey").cast("string")).alias("property"),
        F.lit(1).alias("version"),
    )
    return (
        old.unionByName(new)
        .groupBy("key")
        .agg(F.expr("max_by(property, version)").alias("property"))
    )


@register(
    "zip_join_positional",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
           FROM documents WHERE doc_id < 20)
SELECT doc_id, CAST(t.i - 1 AS INT) AS pos, words[t.i] AS word
FROM w, UNNEST(generate_series(1, len(words))) t(i)
""",
)
def zip_join_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: the header<->cell positional zip join (HtmlTableParser.py:914-963)
    as posexplode — an index join, not a hash join."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )


@register(
    "reification_index",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROW_NUMBER() OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber) AS reif_index
FROM lineitem WHERE l_orderkey < 100
""",
)
def reification_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/W5: the per-resource monotone row counter (Mapper.py:97-98) as
    row_number over (doc, table order, row order)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey", "l_linenumber", F.row_number().over(w).alias("reif_index")
    )


@register(
    "section_fill_down",
    oracle="""
SELECT event_id, user_id,
       LAST_VALUE(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS last_error_event
FROM events
""",
)
def section_fill_down(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: section context = forward-fill of the latest heading
    (HtmlTableParser.py:220-268) — last_value(... ignore nulls) over rows
    unbounded preceding."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marker = F.when(F.col("event_type") == "error", F.col("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        F.last(marker, ignorenulls=True).over(w).alias("last_error_event"),
    )


@register(
    "header_latch",
    oracle="""
SELECT event_id, user_id,
       MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS started_data
FROM events
""",
)
def header_latch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: the started_data latch (HtmlTableParser.py:287-309) as a running
    max over the partition."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0))
        .over(w)
        .alias("started_data"),
    )


@register(
    "running_column_sums",
    oracle="""
SELECT event_id, user_id,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2)))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         AS DOUBLE), 2) AS prior_sum
FROM events
""",
)
def running_column_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/P5: per-column running sums of PRIOR rows (MapperTools.py:217-235)
    — the summary-row filter's window shape."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return ev.select(
        "event_id",
        "user_id",
        # the sum itself stays DECIMAL-exact; only the *returned* column is
        # rendered as rounded double so both engines stringify identically
        # ('136991.00' vs '136991.0' was the only r01 mismatch here)
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double"), 2
        ).alias("prior_sum"),
    )


@register(
    "summary_row_filter",
    oracle="""
WITH sums AS (
  SELECT event_id, CAST(value AS DECIMAL(18,2)) AS v,
         SUM(CAST(value AS DECIMAL(18,2)))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_sum
  FROM events
)
SELECT COUNT(*) AS n_summary_rows FROM sums WHERE v = prior_sum
""",
)
def summary_row_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 analogue in pure SQL: rows equal to the running sum of prior rows."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    v = F.col("value").cast("decimal(18,2)")
    return (
        ev.select(v.alias("v"), F.sum(v).over(w).alias("prior_sum"))
        .filter(F.col("v") == F.col("prior_sum"))
        .agg(F.count("*").alias("n_summary_rows"))
    )


@register(
    "distinct_header_inventory",
    oracle="""
SELECT event_type, MIN(user_id) AS first_user, COUNT(*) AS n
FROM events GROUP BY event_type
""",
)
def distinct_header_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: distinct header inventory, first-seen example (pyDomainExplorer)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.min("user_id").alias("first_user"), F.count("*").alias("n"))
    )


@register(
    "section_grouping",
    oracle="""
WITH cnt AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type),
du AS (SELECT DISTINCT event_type, user_id FROM events),
rk AS (
  SELECT event_type, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY user_id) AS rn
  FROM du
), ex AS (
  SELECT event_type, string_agg(user_id, ',' ORDER BY user_id) AS examples
  FROM rk WHERE rn <= 3 GROUP BY event_type
)
SELECT c.event_type, c.n, ex.examples
FROM cnt c JOIN ex ON c.event_type = ex.event_type
""",
)
def section_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/O4: section grouping with <=3 example pages
    (pyDomainExplorer.py:84-158)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.array_join(
                F.slice(F.sort_array(F.collect_set("user_id")), 1, 3), ","
            ).alias("examples"),
        )
    )


@register(
    "section_fuzzy_merge",
    oracle="""
WITH sections AS (
  SELECT DISTINCT p_type AS section FROM part
  UNION
  SELECT DISTINCT split_part(p_type, ' ', 1) FROM part
),
pairs AS (
  SELECT s.section, t.section AS candidate
  FROM sections s JOIN sections t
    ON s.section LIKE '%' || t.section || '%'
)
SELECT section, MIN(candidate ORDER BY length(candidate), candidate) AS group_key
FROM pairs GROUP BY section
""",
)
def section_fuzzy_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: the explorer's substring-based section merge ('College' absorbs
    'College statistics', pyDomainExplorer.py:119-139) — rebuilt
    order-independently as a self-join on substring containment with a
    deterministic canonical key (shortest contained section).  The section
    vocabulary is tiny (it is GROUPed output), so the self-join broadcasts."""
    part = load_table(spark, sf_dir, "part")
    sections = (
        part.select(F.col("p_type").alias("section"))
        .union(part.select(F.split("p_type", " ")[0].alias("section")))
        .distinct()
    )
    cand = sections.select(F.col("section").alias("candidate"))
    pairs = sections.join(
        F.broadcast(cand), F.col("section").contains(F.col("candidate"))
    )
    return pairs.groupBy("section").agg(
        F.expr(
            "min_by(candidate, struct(length(candidate), candidate))"
        ).alias("group_key")
    )


@register(
    "ontology_label_probe",
    oracle="""
WITH ontology AS (
  SELECT DISTINCT lower(n_name) AS label,
         'dbo:' || replace(lower(n_name), ' ', '_') AS property
  FROM nation
)
SELECT COALESCE(o.property, 'NO_PROPERTY') AS property, COUNT(*) AS n
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN ontology o ON lower(n.n_name) = o.label AND n.n_nationkey % 2 = 0
GROUP BY 1
""",
)
def ontology_label_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: the explorer's DBpedia-ontology label lookup
    (pyDomainExplorer.py:206-230) as a broadcast left join against an
    ontology(label -> property) table; misses become the settings-file
    blanks the user fills in."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    ontology = nation.select(
        F.lower("n_name").alias("label"),
        F.concat(
            F.lit("dbo:"), F.replace(F.lower("n_name"), F.lit(" "), F.lit("_"))
        ).alias("property"),
    ).distinct()
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(ontology),
            (F.lower("n_name") == F.col("label"))
            & (F.col("n_nationkey") % 2 == 0),
            "left",
        )
        .select(F.coalesce("property", F.lit("NO_PROPERTY")).alias("property"))
        .groupBy("property")
        .agg(F.count("*").alias("n"))
    )


@register(
    "pivot_event_types",
    oracle="""
SELECT user_id,
       ROUND(CAST(SUM(CASE WHEN event_type = 'click'
                      THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2)
         AS click_value,
       ROUND(CAST(SUM(CASE WHEN event_type = 'view'
                      THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2)
         AS view_value,
       ROUND(CAST(SUM(CASE WHEN event_type = 'error'
                      THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 2)
         AS error_value
FROM events GROUP BY user_id
""",
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): explicit pivot values keep the plan a single
    groupBy with conditional aggregates — never let pivot() scan for distinct
    keys at scale (that is an extra job over the full input)."""
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "error"])
        .agg(F.sum(dec))
    )
    return piv.select(
        "user_id",
        F.round(F.col("click").cast("double"), 2).alias("click_value"),
        F.round(F.col("view").cast("double"), 2).alias("view_value"),
        F.round(F.col("error").cast("double"), 2).alias("error_value"),
    )


@register(
    "top_k_per_group",
    oracle="""
SELECT user_id, event_id, CAST(rk AS INT) AS rk FROM (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(value AS DECIMAL(18,2)) DESC,
                                     event_id) AS rk
  FROM events
) WHERE rk <= 3
""",
)
def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: row_number over a per-group ordering + filter — the
    canonical pattern; deterministic tie-break on event_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").cast("decimal(18,2)").desc(), "event_id"
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", "rk")
    )


@register(
    "range_join_value_bands",
    oracle="""
WITH bands AS (
  SELECT n_nationkey AS band_id,
         CAST(n_nationkey * 40 AS DOUBLE) AS lo,
         CAST(n_nationkey * 40 + 60 AS DOUBLE) AS hi
  FROM nation
)
SELECT b.band_id, COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_value
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band_id
""",
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/rangejoin): events matched into overlapping
    value bands via domain bucketization — equi hash join on the bucket plus
    an exact refine, instead of a nested-loop theta join."""
    from ..operators.rangejoin import bucketed_range_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    bands = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("band_id"),
        (F.col("n_nationkey") * 40).cast("double").alias("lo"),
        (F.col("n_nationkey") * 40 + 60).cast("double").alias("hi"),
    )
    joined = bucketed_range_join(
        ev, bands, point="value", lo="lo", hi="hi", bucket_width=50.0
    )
    return joined.groupBy("band_id").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_value"),
    )


@register(
    "asof_join_latest_error",
    oracle="""
WITH lhs AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type <> 'error'
), rhs AS (
  SELECT user_id, ts, MAX(event_id) AS err_event
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
)
SELECT l.user_id, l.event_id, epoch_us(l.ts) AS ts_us,
       r.err_event AS right_err_event
FROM lhs l ASOF LEFT JOIN rhs r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def asof_join_latest_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof): each non-error event picks up the latest
    at-or-before error event of the same user — union + ordered fill-down,
    one shuffle, no Python; the oracle is DuckDB's native ASOF LEFT JOIN."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    lhs = ev.filter(F.col("event_type") != "error").select(
        "user_id", "event_id", "ts"
    )
    rhs = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("err_event"))
    )
    joined = asof_join(lhs, rhs, on="ts", by="user_id", value_cols=["err_event"])
    return joined.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "right_err_event",
    )


@register(
    "asof_join_next_error",
    oracle="""
WITH lhs AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type <> 'error'
), rhs AS (
  SELECT user_id, ts, MAX(event_id) AS err_event
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
)
SELECT l.user_id, l.event_id, epoch_us(l.ts) AS ts_us,
       r.err_event AS right_err_event
FROM lhs l ASOF LEFT JOIN rhs r
  ON l.user_id = r.user_id AND l.ts <= r.ts
""",
)
def asof_join_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each non-error event picks up the EARLIEST
    at-or-after error of the same user (alerting/root-cause direction) —
    the mirror window of `asof_join_latest_error`, still one shuffle and no
    Python; oracle is DuckDB ASOF LEFT JOIN with the <= inequality."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    lhs = ev.filter(F.col("event_type") != "error").select(
        "user_id", "event_id", "ts"
    )
    rhs = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("err_event"))
    )
    joined = asof_join(
        lhs, rhs, on="ts", by="user_id", value_cols=["err_event"],
        direction="forward",
    )
    return joined.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "right_err_event",
    )


@register(
    "sessionization",
    oracle="""
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, event_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM gaps
)
SELECT user_id, CAST(session_no AS INT) AS session_no,
       COUNT(*) AS n_events,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) AS session_end_us
FROM sessions GROUP BY user_id, session_no
""",
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (training-pipeline staple): lag + cumulative
    sum of session-break flags, then per-session aggregates.  Timestamps are
    compared as epoch microseconds (UTC session, see session.py)."""
    ev = load_table(spark, sf_dir, "events")
    # parquet stores timestamp_ntz; with the UTC session (session.py) the
    # ntz -> instant cast is deterministic and unix_micros applies
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = ev.withColumn("__us", us)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "new_session",
        F.when(
            F.lag("__us").over(w).isNull()
            | (F.col("__us") - F.lag("__us").over(w) > 30 * 60 * 1_000_000),
            1,
        ).otherwise(0),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = gaps.withColumn(
        "session_no", F.sum("new_session").over(wrun).cast("int")
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("__us").alias("session_start_us"),
        F.max("__us").alias("session_end_us"),
    )


@register(
    "order_preservation",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
WHERE l_orderkey < 40 ORDER BY l_orderkey, l_linenumber
""",
)
def order_preservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: explicit order columns carried as data (order-as-schema)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 40)
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "scalar_text_cleanup",
    oracle="""
SELECT p_partkey,
       regexp_replace(p_name || ' [12]', '\\[\\d+\\]', '', 'g') AS no_citation,
       replace(p_name || CHR(160) || 'x', CHR(160), ' ') AS nbsp_to_space,
       replace(p_name || CHR(160) || 'x', CHR(160), '') AS nbsp_deleted,
       replace('it''s ' || p_name, '''', '.') AS quote_mangled,
       replace(p_name || CHR(10) || 'y', CHR(10), '/') AS newline_data,
       CASE WHEN p_name <> '' AND substr(p_name, 1, 1) = ' '
            THEN substr(p_name, 2) ELSE p_name END AS lstrip_one
FROM part WHERE p_partkey < 200
""",
)
def scalar_text_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F8: the reference's string cleanups as built-in JVM functions
    (citations, nbsp asymmetry, quote mangling, newline rules)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    nbsp = F.lit("\xa0")
    return p.select(
        "p_partkey",
        F.regexp_replace(F.concat("p_name", F.lit(" [12]")), r"\[\d+\]", "").alias(
            "no_citation"
        ),
        F.replace(F.concat("p_name", nbsp, F.lit("x")), nbsp, F.lit(" ")).alias(
            "nbsp_to_space"
        ),
        F.replace(F.concat("p_name", nbsp, F.lit("x")), nbsp, F.lit("")).alias(
            "nbsp_deleted"
        ),
        F.replace(F.concat(F.lit("it's "), "p_name"), F.lit("'"), F.lit(".")).alias(
            "quote_mangled"
        ),
        F.replace(
            F.concat("p_name", F.lit("\n"), F.lit("y")), F.lit("\n"), F.lit("/")
        ).alias("newline_data"),
        F.when(
            (F.col("p_name") != "") & (F.substring("p_name", 1, 1) == " "),
            F.expr("substring(p_name, 2)"),
        )
        .otherwise(F.col("p_name"))
        .alias("lstrip_one"),
    )


def _py2_float_oracle_sql() -> str:
    from ..functions.typing import PY2_FLOAT_RE

    # the SAME regex string runs in both engines (Java regex / RE2)
    return f"""
WITH s AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         CAST(l_quantity AS VARCHAR)
           || CASE WHEN l_linenumber % 3 = 0 THEN 'D'
                   WHEN l_linenumber % 3 = 1 THEN ''
                   ELSE 'e2' END AS cell
  FROM lineitem WHERE l_orderkey < 100
)
SELECT l_orderkey, l_linenumber, cell,
       regexp_matches(cell, '{PY2_FLOAT_RE}') AS is_py2_float,
       TRY_CAST(l_returnflag AS DOUBLE) AS flag_typed
FROM s
"""


@register("float_typing", oracle=_py2_float_oracle_sql())
def float_typing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: numeric typing via the py2 float() grammar (MapperTools.py:
    183-195) as a shared-regex JVM predicate — NOT try_cast, whose grammar
    differs (a 'D'-suffixed cell casts in Spark but raises in py2; the
    crafted cells here pin that divergence on every third row)."""
    from ..functions.typing import py2_float_matches

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    cell = F.concat(
        F.col("l_quantity").cast("string"),
        F.when(F.col("l_linenumber") % 3 == 0, F.lit("D"))
        .when(F.col("l_linenumber") % 3 == 1, F.lit(""))
        .otherwise(F.lit("e2")),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        cell.alias("cell"),
        py2_float_matches(cell).alias("is_py2_float"),
        F.col("l_returnflag").try_cast("double").alias("flag_typed"),
    )


@register(
    "uri_tail_split",
    oracle="""
SELECT p_partkey,
       split_part('http://dbpedia.org/resource/' || replace(p_name, ' ', '_'),
                  '/', -1) AS resource_tail
FROM part WHERE p_partkey < 200
""",
)
def uri_tail_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: URI tail extraction (ExplorerTools.py:188-198) via
    substring_index."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    uri = F.concat(
        F.lit("http://dbpedia.org/resource/"), F.replace("p_name", F.lit(" "), F.lit("_"))
    )
    return p.select(
        "p_partkey", F.substring_index(uri, "/", -1).alias("resource_tail")
    )


@register(
    "url_canonical_dedup",
    oracle="""
WITH u AS (
  SELECT p_partkey,
         'HTTP://Example' || CAST(p_partkey % 7 AS VARCHAR)
           || '.COM/item/' || replace(p_name, ' ', '-')
           || CASE WHEN p_partkey % 3 = 0 THEN '/?utm_source=x&id='
                     || CAST(p_partkey % 50 AS VARCHAR)
                   WHEN p_partkey % 3 = 1 THEN '?id='
                     || CAST(p_partkey % 50 AS VARCHAR) || '#frag'
                   ELSE '/' END AS url
  FROM part WHERE p_partkey < 400
), norm AS (
  SELECT p_partkey,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
                  || url[length(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) + 1:],
                '#.*$', ''),
              '([?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*', '\\1'),
            '\\?&+', '?'),
          '&&+', '&'),
        '[?&]$', ''),
      '(://[^/?#]+/.+?)/(\\?|$)', '\\1\\2') AS canon
  FROM u
)
SELECT canon, COUNT(*) AS n, MIN(p_partkey) AS keeper
FROM norm GROUP BY canon
""",
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup (functions/url.py): lowercase authority,
    drop fragment + tracking params, strip the redundant trailing slash,
    then group by the canonical form — the first dedup pass of every web
    pipeline, all JVM-side; URLs synthesized deterministically from part so
    the oracle replays the identical rule chain."""
    from ..functions.url import normalize_url

    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 400)
    url = F.concat(
        F.lit("HTTP://Example"),
        (F.col("p_partkey") % 7).cast("string"),
        F.lit(".COM/item/"),
        F.replace("p_name", F.lit(" "), F.lit("-")),
        F.when(
            F.col("p_partkey") % 3 == 0,
            F.concat(
                F.lit("/?utm_source=x&id="),
                (F.col("p_partkey") % 50).cast("string"),
            ),
        )
        .when(
            F.col("p_partkey") % 3 == 1,
            F.concat(
                F.lit("?id="),
                (F.col("p_partkey") % 50).cast("string"),
                F.lit("#frag"),
            ),
        )
        .otherwise(F.lit("/")),
    )
    return (
        p.select("p_partkey", normalize_url(url).alias("canon"))
        .groupBy("canon")
        .agg(F.count("*").alias("n"), F.min("p_partkey").alias("keeper"))
    )


@register(
    "resource_list",
    oracle="""
WITH u AS (
  SELECT CASE
           WHEN p_partkey % 3 = 0
             THEN 'http://dbpedia.org/resource/' || replace(p_name, ' ', '_')
           WHEN p_partkey % 3 = 1
             THEN 'http://dbpedia.org/ontology/' || replace(p_name, ' ', '_')
           ELSE 'http://resourceful.example/' || replace(p_name, ' ', '_')
         END AS uri
  FROM part WHERE p_partkey < 300
), parts AS (
  SELECT uri, string_split(uri, '/') AS p FROM u WHERE contains(uri, 'resource')
)
SELECT p[list_position(p, 'resource') + 1] AS line
FROM parts WHERE list_position(p, 'resource') > 0
""",
)
def resource_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: the Selector's resource-list sink content (Selector.py:80-124) —
    URIs with an exact 'resource' path segment reduced to the name after it;
    'ontology' URIs and URIs merely CONTAINING 'resource' (ValueError ->
    skipped in the reference) are dropped."""
    from .explorer import resource_list_lines

    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    name = F.replace("p_name", F.lit(" "), F.lit("_"))
    uris = p.select(
        F.when(
            F.col("p_partkey") % 3 == 0,
            F.concat(F.lit("http://dbpedia.org/resource/"), name),
        )
        .when(
            F.col("p_partkey") % 3 == 1,
            F.concat(F.lit("http://dbpedia.org/ontology/"), name),
        )
        .otherwise(F.concat(F.lit("http://resourceful.example/"), name))
        .alias("uri")
    )
    return resource_list_lines(uris)


# ===========================================================================
# C. training-data pipeline operators (dedup / similarity / text analysis)
# ===========================================================================

from ..functions import text as T  # noqa: E402
from ..operators import dedup as D  # noqa: E402
from ..operators import similarity as S  # noqa: E402

# DuckDB rendering of the shared shingle pipeline (word 3-grams, distinct,
# reduced mod P) — documents always have >= 10 words so the short-text branch
# of word_shingles never triggers at these SFs.
_DUCK_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, len(w) - 2), "
    "i -> (('0x' || substr(md5(array_to_string(w[i:i+2], ' ')), 1, 15))::bigint"
    " % 2147483647)))"
)

_DUCK_SIG_TERMS = ", ".join(
    f"list_min(list_transform(hs, h -> ({2 * i + 3} * h + {17 * i + 5}) % 2147483647))"
    for i in range(MINHASH_PERMS)
)

_DUCK_SIGS_CTE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
h AS (SELECT doc_id, {_DUCK_SHINGLES} AS hs FROM w),
sigs AS (SELECT doc_id, [{_DUCK_SIG_TERMS}] AS sig FROM h),
buckets AS (
  SELECT doc_id, CAST(b AS INT) AS band,
         ('0x' || substr(md5(array_to_string(
             list_transform(sig[4*b+1:4*b+4], x -> CAST(x AS VARCHAR)), ',')),
             1, 15))::bigint AS bucket
  FROM sigs, generate_series(0, 3) t(b)
)
"""


@register(
    "dedup_exact",
    oracle=f"""
SELECT md5(text) AS content_hash,
       MIN(doc_id) AS keeper, COUNT(*) - 1 AS n_dupes
FROM documents GROUP BY 1
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "minhash_signatures",
    oracle=_DUCK_SIGS_CTE + """
SELECT doc_id,
       array_to_string(list_transform(sig, x -> CAST(x AS VARCHAR)), ',')
         AS sig
FROM sigs
""",
)
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = D.minhash_signatures(load_table(spark, sf_dir, "documents"))
    # serialized so the driver canonicalizer can hash it (arrays are
    # unhashable in its pandas path); the raw array form stays pytest-pinned
    return sigs.withColumn("sig", F.array_join(F.col("sig").cast("array<string>"), ","))


@register(
    "lsh_buckets",
    oracle=_DUCK_SIGS_CTE + "SELECT doc_id, band, bucket FROM buckets",
)
def lsh_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = D.minhash_signatures(load_table(spark, sf_dir, "documents"))
    return D.lsh_buckets(sigs)


@register(
    "lsh_candidate_pairs",
    oracle=_DUCK_SIGS_CTE + """
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
FROM buckets l JOIN buckets r
  ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
""",
)
def lsh_candidate_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = D.minhash_signatures(load_table(spark, sf_dir, "documents"))
    return D.lsh_candidate_pairs(D.lsh_buckets(sigs))


@register(
    "ngram_jaccard_dedup",
    oracle=_DUCK_SIGS_CTE + """
, pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM buckets l JOIN buckets r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
)
SELECT p.a, p.b,
       len(list_intersect(ha.hs, hb.hs)) AS n_common,
       len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)) AS n_union,
       CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
         / (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))
         AS jaccard
FROM pairs p JOIN h ha ON p.a = ha.doc_id JOIN h hb ON p.b = hb.doc_id
""",
)
def ngram_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.near_dup_pipeline(docs)


@register(
    "near_dup_components",
    oracle=_DUCK_SIGS_CTE.replace("WITH ", "WITH RECURSIVE ", 1) + """
, pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM buckets l JOIN buckets r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
), verified AS (
  SELECT p.a, p.b
  FROM pairs p JOIN h ha ON p.a = ha.doc_id JOIN h hb ON p.b = hb.doc_id
  WHERE CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
        / (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))
        >= 0.8
), edges AS (
  SELECT a AS u, b AS v FROM verified
  UNION SELECT b, a FROM verified
), walk AS (
  SELECT u, v FROM edges
  UNION
  SELECT wk.u, e.v FROM walk wk JOIN edges e ON wk.v = e.u
  WHERE e.v <> wk.u
)
SELECT u AS node, least(u, min(v)) AS component FROM walk GROUP BY u
""",
)
def near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the VERIFIED near-dup pair graph
    (large-star/small-star min-label propagation, operators/dedup
    ``connected_components``): (node, component-min) for every doc in a
    duplicate cluster — the keep-one-per-component contract the curation
    pipeline enforces.  The oracle replays the closure with a recursive CTE
    (exact transitive reachability; feasible because it runs on the verified
    EDGE list, never the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs)
    pairs = D.lsh_candidate_pairs(D.lsh_buckets(sigs))
    verified = D.ngram_jaccard(docs, pairs).filter(F.col("jaccard") >= 0.8)
    return D.connected_components(verified)


@register(
    "lsh_incremental_pairs",
    oracle=_DUCK_SIGS_CTE + """
SELECT DISTINCT least(l.doc_id, r.doc_id) AS a,
       greatest(l.doc_id, r.doc_id) AS b
FROM buckets l JOIN buckets r
  ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id <> r.doc_id
WHERE l.doc_id % 2 = 1
""",
)
def lsh_incremental_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup (daily-crawl shape): candidates for a NEW batch
    (odd doc ids) against the standing corpus index (even ids) — new x
    corpus and new x new pairs only, never corpus x corpus, so daily cost
    scales with the increment rather than re-pairing the whole corpus."""
    docs = load_table(spark, sf_dir, "documents")
    buckets = D.lsh_buckets(D.minhash_signatures(docs))
    corpus_b = buckets.filter(F.col("doc_id") % 2 == 0)
    new_b = buckets.filter(F.col("doc_id") % 2 == 1)
    return D.lsh_incremental_candidate_pairs(new_b, corpus_b)


@register(
    "ngram_containment_dedup",
    oracle=_DUCK_SIGS_CTE + """
, pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM buckets l JOIN buckets r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
)
SELECT p.a, p.b,
       len(list_intersect(ha.hs, hb.hs)) AS n_common,
       CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE) / len(ha.hs)
         AS containment_a_in_b,
       CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE) / len(hb.hs)
         AS containment_b_in_a
FROM pairs p JOIN h ha ON p.a = ha.doc_id JOIN h hb ON p.b = hb.doc_id
""",
)
def ngram_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup (doc-embedded-in-doc): containment = |A∩B|/|A|
    over LSH candidates — symmetric Jaccard under-scores a small doc wrapped
    in a larger one; training-data dedup wants both signals."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs)
    # persist the candidate pairs: they feed the verify joins AND the
    # candidate-id semi-join that prunes the shingle side (same shared-scan
    # rule near_dup_pipeline documents — without it the LSH pipeline is
    # recomputed three times)
    pairs = D.lsh_candidate_pairs(D.lsh_buckets(sigs)).persist()
    return D.ngram_containment(docs, pairs)


_DUCK_SIMHASH_TERMS = " + ".join(
    f"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> {j}) & 1) * 2 - 1)) > 0 "
    f"THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
    for j in range(32)
)


@register(
    "dedup_simhash",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
           WHERE doc_id < 100),
h AS (SELECT doc_id, list_transform(
        w, x -> ('0x' || substr(md5(x), 1, 15))::bigint) AS hs FROM w)
SELECT doc_id, {_DUCK_SIMHASH_TERMS} AS simhash FROM h
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return D.simhash_signatures(docs)


@register(
    "simhash_hamming_pairs",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
           WHERE doc_id < 200),
h AS (SELECT doc_id, list_transform(
        w, x -> ('0x' || substr(md5(x), 1, 15))::bigint) AS hs FROM w),
s AS (SELECT doc_id, {_DUCK_SIMHASH_TERMS} AS simhash FROM h),
blk AS (
  SELECT doc_id, simhash, t.j AS bj,
         (simhash >> (t.j * 8)) & 255 AS bv
  FROM s, generate_series(0, 3) t(j)
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
         l.simhash AS sa, r.simhash AS sb
  FROM blk l JOIN blk r
    ON l.bj = r.bj AND l.bv = r.bv AND l.doc_id < r.doc_id
)
SELECT a, b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
""",
)
def simhash_hamming_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-ball near-dup pairs over 32-bit SimHash fingerprints
    (operators/dedup ``simhash_hamming_pairs``; Manku et al. WWW 2007):
    4 contiguous 8-bit blocks index each fingerprint, distance<=3 pairs
    must share a block by pigeonhole, so candidate generation is one
    equi-join on (block, value) with recall 1.0 — the sketch-indexed
    complement to the shingle-set LSH family, one 64-bit word per doc
    instead of a signature array.  The oracle replays fingerprints,
    block arithmetic, and the bit_count(xor) verify."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return D.simhash_hamming_pairs(D.simhash_signatures(docs))


@register(
    "doc_fingerprint",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
h AS (SELECT doc_id, {_DUCK_SHINGLES} AS hs FROM w)
SELECT doc_id,
       array_to_string(list_transform((list_sort(hs))[1:4],
                                      x -> CAST(x AS VARCHAR)), ',')
         AS fingerprint
FROM h
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.array_join(
            D.bottomk_fingerprint(F.col("text")).cast("array<string>"), ","
        ).alias("fingerprint"),
    )


# shared winnowing CTE: positional 3-gram hashes -> packed rightmost-argmin
# window MIN -> decoded (doc_id, pos, fp), full windows only (w=8).  The
# int64 packing (h * 2^20 + (2^20-1-pos)) is the same construct the Spark
# operator uses, so both engines run ONE plain windowed MIN — no struct
# aggregates, no list lambdas on the comparison path.
_DUCK_WINNOW_CTE = """
WITH wd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
ph0 AS (
  SELECT doc_id, len(w) - 2 AS n, w,
         unnest(generate_series(1, len(w) - 2)) AS i
  FROM wd
),
ph AS (
  SELECT doc_id, n, i - 1 AS pos,
         (('0x' || substr(md5(array_to_string(w[i:i+2], ' ')), 1, 15))::bigint
          % 2147483647) AS h
  FROM ph0
),
keyed AS (
  SELECT doc_id, n, pos,
         MIN(h * 1048576 + (1048575 - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS k
  FROM ph
),
sel AS (
  SELECT DISTINCT doc_id,
         CAST(1048575 - (k % 1048576) AS BIGINT) AS pos,
         CAST(k // 1048576 AS BIGINT) AS fp
  FROM keyed
  WHERE pos <= n - 8 OR (pos = 0 AND n < 8)
)
"""


@register(
    "winnowing_fingerprints",
    oracle=_DUCK_WINNOW_CTE + "SELECT doc_id, pos, fp FROM sel",
)
def winnowing_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional winnowing fingerprints (operators/dedup
    ``winnowing_fingerprints``, Schleimer et al. SIGMOD 2003): the
    guaranteed-coverage local fingerprint — every 8-shingle window of every
    doc contributes its rightmost-min hash, so shared passages share
    fingerprints at known positions.  One posexplode + one per-doc window
    shuffle + a distinct; no joins, no Python."""
    docs = load_table(spark, sf_dir, "documents")
    return D.winnowing_fingerprints(docs)


@register(
    "winnowing_overlap_pairs",
    oracle=_DUCK_WINNOW_CTE + """
, fpp AS (SELECT DISTINCT doc_id, fp FROM sel)
SELECT l.doc_id AS a, r.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fpp l JOIN fpp r ON l.fp = r.fp AND l.doc_id < r.doc_id
GROUP BY l.doc_id, r.doc_id
HAVING COUNT(*) >= 3
""",
)
def winnowing_overlap_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style partial-overlap report: doc pairs sharing >= 3 winnowing
    fingerprints (operators/dedup ``winnowing_overlap_pairs``).  The
    self-join co-partitions on the fingerprint value — pair volume is
    bounded by fingerprint bucket sizes, with the ``max_fp_docs`` guard
    available for boilerplate-degenerate corpora (unused here: the
    synthetic corpus has no mega-buckets)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.winnowing_overlap_pairs(D.winnowing_fingerprints(docs))


_DUCK_COS = """
round(
  list_sum(list_transform(generate_series(1, len(q.e)), i -> q.e[i] * v.e[i]))
  / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
     * sqrt(list_sum(list_transform(v.e, x -> x * x)))), 6)
"""


@register(
    "embedding_cosine_topk",
    oracle=f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < 10),
sims AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, {_DUCK_COS} AS cos_sim
  FROM q, v WHERE q.vec_id <> v.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
  FROM sims
) WHERE rank <= 3
""",
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=3)


# near-dup candidate generation parameters (shared Spark <-> DuckDB)
NDUP_PLANES = 4
NDUP_TABLES = 8
# test embeddings have weak neighbor structure (max pairwise cos ~0.51 at
# sf0.01), so the "near-dup" bar sits where a few hundred pairs survive —
# the verify join and threshold logic get exercised, not vacuously satisfied
NDUP_THRESHOLD = 0.3


def _duck_ndup_bucket() -> str:
    """DuckDB replica of operators.similarity.sign_lsh_bucket over the
    1000x-quantized vector ``q`` (integer-valued doubles -> exact sums, so
    the sign bit can never disagree between engines on summation order)."""
    terms = []
    for p in range(NDUP_PLANES):
        terms.append(
            f"(CASE WHEN list_sum(list_transform(generate_series(1, len(q)), "
            f"j -> q[j] * (CASE WHEN ((1 + (2*{p}+3+17*t.t)*(j+6)) % 13) - 6 >= 0 "
            f"THEN 1.0 ELSE -1.0 END))) >= 0 THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


_DUCK_NDUP_COS = """
round(
  list_sum(list_transform(generate_series(1, len(va.e)), i -> va.e[i] * vb.e[i]))
  / (sqrt(list_sum(list_transform(va.e, x -> x * x)))
     * sqrt(list_sum(list_transform(vb.e, x -> x * x)))), 6)
"""


_DUCK_NDUP_CTE = f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           FROM embeddings),
qv AS (SELECT vec_id, e, list_transform(e, x -> round(x * 1000)) AS q FROM v),
b AS (SELECT vec_id, t.t AS tbl, {{bucket}} AS bucket
      FROM qv, generate_series(0, {NDUP_TABLES - 1}) t(t)),
pairs AS (
  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
  FROM b l JOIN b r ON l.tbl = r.tbl AND l.bucket = r.bucket
                   AND l.vec_id < r.vec_id
),
sims AS (
  SELECT p.a, p.b, {_DUCK_NDUP_COS} AS cos_sim
  FROM pairs p JOIN v va ON p.a = va.vec_id JOIN v vb ON p.b = vb.vec_id
)
""".replace("{bucket}", _duck_ndup_bucket())


@register(
    "embedding_near_dup_pairs",
    oracle=_DUCK_NDUP_CTE
    + f"SELECT a, b, cos_sim FROM sims WHERE cos_sim >= {NDUP_THRESHOLD}",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs, scale-safe: candidates come from a
    multi-table sign-LSH bucket equi-join (one shuffle on (table, bucket)),
    then ONE exact cosine per deduped candidate pair with a threshold — never
    an all-pairs self-join, so the plan grows with bucket occupancy instead
    of quadratically in corpus size.  The LSH buckets are computed on a
    1000x-quantized copy of the vector: projections are then sums of
    integer-valued doubles (exact in IEEE754 whatever the summation order),
    which makes the bucket ids engine-reproducible bit-for-bit — the DuckDB
    oracle replays the identical hyperplane arithmetic."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", S.as_double(F.col("embedding")).alias("e"))
    # stage the quantized copy in its own projection: sign_lsh_bucket
    # references its input once per plane and higher-order fns get no CSE
    qv = v.select(
        "vec_id", "e", F.transform("e", lambda x: F.round(x * 1000)).alias("q")
    )
    bucket_arr = F.array(
        *[
            S.sign_lsh_bucket(F.col("q"), NDUP_PLANES, table=t)
            for t in range(NDUP_TABLES)
        ]
    )
    b = qv.select("vec_id", bucket_arr.alias("buckets")).select(
        "vec_id", F.posexplode("buckets").alias("tbl", "bucket")
    )
    pairs = (
        b.select(F.col("vec_id").alias("a"), "tbl", "bucket")
        .join(b.select(F.col("vec_id").alias("b"), "tbl", "bucket"),
              ["tbl", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    side = v.select("vec_id", "e", S.norm(F.col("e")).alias("n"))
    return (
        pairs.join(
            side.select(F.col("vec_id").alias("a"), F.col("e").alias("ea"),
                        F.col("n").alias("na")), "a")
        .join(
            side.select(F.col("vec_id").alias("b"), F.col("e").alias("eb"),
                        F.col("n").alias("nb")), "b")
        .select(
            "a", "b",
            F.round(
                S.dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= NDUP_THRESHOLD)
    )


@register(
    "semantic_dedup_clusters",
    oracle=_DUCK_NDUP_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + f"""
, verified AS (SELECT a, b FROM sims WHERE cos_sim >= {NDUP_THRESHOLD}),
edges AS (
  SELECT a AS u, b AS w FROM verified
  UNION SELECT b, a FROM verified
), walk AS (
  SELECT u, w FROM edges
  UNION
  SELECT wk.u, e.w FROM walk wk JOIN edges e ON wk.w = e.u
  WHERE e.w <> wk.u
)
SELECT u AS node, least(u, min(w)) AS component FROM walk GROUP BY u
""",
)
def semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) duplicate CLUSTERS: the verified near-dup
    pair graph from ``embedding_near_dup_pairs`` closed into connected
    components (large-star/small-star), so semantic dedup can keep one doc
    per cluster instead of greedily dropping pair-larger ids — same CC
    operator the text-near-dup curation stage uses, same recursive-CTE
    oracle shape, over the sign-LSH + exact-cosine edge list (never the
    corpus)."""
    verified = embedding_near_dup_pairs(spark, sf_dir).select("a", "b")
    return D.connected_components(verified)


@register(
    "lang_id",
    oracle="""
SELECT doc_id,
       CASE WHEN CAST(len(list_filter(string_split(lower(text), ' '),
                 x -> list_contains(['the','a','of','and','to','in'], x)))
                 AS DOUBLE) / len(string_split(lower(text), ' ')) > 0.05
            THEN 'en' ELSE 'und' END AS lang_guess,
       lang AS lang_label
FROM documents
""",
)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.with_lang_id(docs).select(
        "doc_id", "lang_guess", F.col("lang").alias("lang_label")
    )


@register(
    "quality_score",
    oracle="""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS w,
         string_split(lower(text), ' ') AS lw
  FROM documents
), m AS (
  SELECT doc_id,
    CAST(len(list_filter(lw, x -> list_contains(['the','a','of','and','to','in'], x)))
         AS DOUBLE) / len(lw) AS stop_ratio,
    CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g'))
         AS DOUBLE) / greatest(length(text), 1) AS punct,
    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mwl
  FROM t
)
SELECT doc_id, round(stop_ratio * 0.5 + (1.0 - punct) * 0.3
       + (CASE WHEN mwl BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END), 6) AS quality
FROM m
""",
)
def quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.with_quality_score(docs).select("doc_id", "quality")


@register(
    "quality_classifier",
    oracle=f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
  FROM documents
), s AS (
  SELECT doc_id,
         CAST(SUM(({DUCK_HASH.format("word")} % 17) - 8) AS BIGINT) AS score
  FROM w GROUP BY doc_id
)
SELECT doc_id, score,
       CASE WHEN score >= 0 THEN 'keep' ELSE 'cut' END AS verdict
FROM s
""",
)
def quality_classifier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (functions/text.linear_classifier_score):
    the fastText-shaped hashing-trick linear classifier of the CCNet /
    GPT-3 recipes, as a STUB model (hash-derived integer weights) on the
    real scale plumbing — the whole score is ONE map-side aggregate over
    each doc's token array, pure JVM, zero shuffle, int64-exact in any
    order, so the oracle replays it bit-for-bit via the shared md5 hash.
    A learned model swaps the weight expression for a broadcast
    weight-table join without changing the plan class."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.linear_classifier_score(F.col("text")).alias("score"),
    ).withColumn(
        "verdict",
        F.when(F.col("score") >= 0, "keep").otherwise("cut"),
    )


@register(
    "repetition_filters",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
), g AS (
  SELECT doc_id, w,
         list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                        i -> w[i] || ' ' || w[i + 1]) AS grams
  FROM t
)
SELECT doc_id,
       ROUND(1.0 - CAST(len(list_distinct(w)) AS DOUBLE)
                   / greatest(len(w), 1), 6) AS dup_word_ratio,
       ROUND(1.0 - CAST(list_sum(list_transform(list_distinct(grams),
                                                x -> length(x))) AS DOUBLE)
                   / greatest(list_sum(list_transform(grams,
                                                      x -> length(x))), 1),
             6) AS dup_bigram_ratio
FROM g
""",
)
def repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters: fraction of repeated word
    occurrences and of characters covered by repeated bigrams — the standard
    boilerplate/spam signals in training-data curation.  Pure JVM array ops,
    exact integer counts divided in double."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(T.dup_word_ratio(F.col("text")), 6).alias("dup_word_ratio"),
        F.round(T.dup_ngram_char_ratio(F.col("text"), 2), 6).alias(
            "dup_bigram_ratio"
        ),
    )


@register(
    "boilerplate_strip",
    oracle="""
WITH d AS (
  SELECT doc_id,
         'home login menu' || chr(10)
           || coalesce(array_to_string((string_split(text, ' '))[1:20], ' '), '')
           || chr(10) || 'href:a href:b href:c related'
           || chr(10)
           -- coalesce: DuckDB array_to_string([]) is NULL, Spark's is ''
           || coalesce(array_to_string((string_split(text, ' '))[21:40], ' '), '')
           || chr(10) || 'copyright footer' AS page
  FROM documents
), b AS (
  SELECT doc_id, list_filter(
    string_split(page, chr(10)),
    blk -> len(string_split(trim(blk), ' ')) >= 5
       AND CAST(len(list_filter(string_split(trim(blk), ' '),
                                w -> starts_with(w, 'href:'))) AS DOUBLE)
           / len(string_split(trim(blk), ' ')) <= 0.5
  ) AS kept
  FROM d
)
SELECT doc_id, array_to_string(kept, chr(10)) AS content,
       CAST(len(kept) AS INT) AS n_blocks
FROM b
""",
)
def boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction (north-rule 'HTML boilerplate strip'):
    readability-style block heuristics — too-short blocks (nav, footer) and
    link-dense blocks (menus) dropped, content blocks kept in order.  Pages
    synthesized deterministically (two content blocks wrapped in three
    boilerplate blocks) so the DuckDB oracle replays the identical rules."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    nl = F.lit("\n")
    page = F.concat(
        F.lit("home login menu"), nl,
        F.array_join(F.slice(words, 1, 20), " "), nl,
        F.lit("href:a href:b href:c related"), nl,
        F.array_join(F.slice(words, 21, 20), " "), nl,
        F.lit("copyright footer"),
    )
    staged = docs.select("doc_id", T.strip_boilerplate(page).alias("content"))
    return staged.select(
        "doc_id",
        "content",
        F.size(F.split("content", "\n")).cast("int").alias("n_blocks"),
    )


def _pii_oracle_sql() -> str:
    from ..functions.text import PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE

    return f"""
WITH d AS (
  SELECT doc_id,
         'contact user' || CAST(doc_id AS VARCHAR)
           || '@mail.example.org at 10.' || CAST(doc_id % 256 AS VARCHAR)
           || '.0.' || CAST(doc_id % 200 AS VARCHAR)
           || ' or +1 (555) 01' || CAST(doc_id % 10 AS VARCHAR)
           || '-2345 re: ' || text AS t
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
      '{PII_IPV4_RE}', '<IP>', 'g'),
    '{PII_PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM d
"""


@register("pii_redaction", oracle=_pii_oracle_sql())
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (functions/text.redact_pii): emails -> <EMAIL>, IPv4 ->
    <IP>, phone-shaped runs -> <PHONE>, on text salted with synthetic PII
    so every rule fires; the oracle replays the identical patterns."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    did = F.col("doc_id").cast("string")
    t = F.concat(
        F.lit("contact user"), did, F.lit("@mail.example.org at 10."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".0."),
        (F.col("doc_id") % 200).cast("string"), F.lit(" or +1 (555) 01"),
        (F.col("doc_id") % 10).cast("string"), F.lit("-2345 re: "),
        F.col("text"),
    )
    return docs.select("doc_id", T.redact_pii(t).alias("redacted"))


@register(
    "curation_filter",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, text,
         string_split(text, ' ') AS w,
         string_split(lower(text), ' ') AS lw
  FROM documents
), m AS (
  SELECT doc_id, lang,
    len(w) AS n_words,
    CAST(len(list_filter(lw, x -> list_contains(
        ['the','a','of','and','to','in'], x))) AS DOUBLE) / len(lw)
      AS stop_ratio,
    1.0 - CAST(len(list_distinct(lw)) AS DOUBLE) / greatest(len(lw), 1)
      AS dup_ratio
  FROM t
)
SELECT doc_id, lang, CAST(n_words AS INT) AS n_words,
       ROUND(stop_ratio, 6) AS stop_ratio, ROUND(dup_ratio, 6) AS dup_ratio,
       (n_words BETWEEN 5 AND 100000
        AND stop_ratio >= 0.01 AND dup_ratio <= 0.5) AS keep
FROM m
""",
)
def curation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation decision (C4/Gopher shape): word
    count band + stopword floor + repetition ceiling, evaluated in ONE
    projection over one scan — at 100 TB the filter columns ride the same
    pass that computes them, and the boolean partitions the corpus for a
    split write.  Thresholds here are demonstrative; the point is the
    compose-signals-then-decide plan shape."""
    docs = load_table(spark, sf_dir, "documents")
    lw = F.split(F.lower(F.col("text")), " ")
    n_words = F.size(lw)
    stop_ratio = (
        F.size(F.filter(lw, lambda w: w.isin(*T.DEFAULT_STOPWORDS))).cast(
            "double"
        )
        / n_words.cast("double")
    )
    dup_ratio = (
        1.0
        - F.size(F.array_distinct(lw)).cast("double")
        / F.greatest(n_words, F.lit(1)).cast("double")
    )
    staged = docs.select(
        "doc_id",
        "lang",
        n_words.alias("__n"),
        stop_ratio.alias("__s"),
        dup_ratio.alias("__d"),
    )
    return staged.select(
        "doc_id",
        "lang",
        F.col("__n").cast("int").alias("n_words"),
        F.round("__s", 6).alias("stop_ratio"),
        F.round("__d", 6).alias("dup_ratio"),
        (
            F.col("__n").between(5, 100000)
            & (F.col("__s") >= 0.01)
            & (F.col("__d") <= 0.5)
        ).alias("keep"),
    )


def _curation_survivors_oracle() -> str:
    """Replay the ENTIRE curate() pipeline in DuckDB: quality gates -> PII
    scrub -> exact dedup (min id per content hash) -> minhash/LSH candidate
    pairs -> exact Jaccard verify -> connected components (recursive CTE)
    keep-one-per-component -> deterministic split."""
    from ..functions.text import PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE

    lw = "string_split(lower(text), ' ')"
    bucket = (
        "('0x' || substr(md5(array_to_string("
        "list_transform(sig[4*b+1:4*b+4], x -> CAST(x AS VARCHAR)), ',')),"
        " 1, 15))::bigint"
    )
    jac = (
        "CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)"
        " / (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))"
    )
    return f"""
WITH RECURSIVE g1 AS (
  SELECT doc_id, text,
         len({lw}) AS nw,
         CAST(len(list_filter({lw}, x -> list_contains(
             ['the','a','of','and','to','in'], x))) AS DOUBLE) / len({lw})
           AS stop_ratio,
         1.0 - CAST(len(list_distinct({lw})) AS DOUBLE)
             / greatest(len({lw}), 1) AS dup_ratio
  FROM documents
), gated AS (
  SELECT doc_id, text FROM g1
  WHERE nw BETWEEN 5 AND 100000 AND stop_ratio >= 0.01 AND dup_ratio <= 0.5
), scrubbed AS (
  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
    text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
          '{PII_IPV4_RE}', '<IP>', 'g'),
          '{PII_PHONE_RE}', '<PHONE>', 'g') AS text
  FROM gated
), keep_exact AS (
  SELECT MIN(doc_id) AS doc_id FROM scrubbed
  GROUP BY md5(text)
), exact AS (
  SELECT s.doc_id, s.text FROM scrubbed s
  JOIN keep_exact k ON s.doc_id = k.doc_id
), w AS (SELECT doc_id, string_split(text, ' ') AS w FROM exact),
h AS (SELECT doc_id, {_DUCK_SHINGLES} AS hs FROM w),
sigs AS (SELECT doc_id, [{_DUCK_SIG_TERMS}] AS sig FROM h),
buckets AS (
  SELECT doc_id, CAST(b AS INT) AS band, {bucket} AS bucket
  FROM sigs, generate_series(0, 3) t(b)
), pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM buckets l JOIN buckets r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
), verified AS (
  SELECT p.a, p.b
  FROM pairs p JOIN h ha ON p.a = ha.doc_id JOIN h hb ON p.b = hb.doc_id
  WHERE {jac} >= 0.8
), edges AS (
  SELECT a AS u, b AS v2 FROM verified UNION SELECT b, a FROM verified
), walk AS (
  SELECT u, v2 FROM edges
  UNION
  SELECT wk.u, e.v2 FROM walk wk JOIN edges e ON wk.v2 = e.u
  WHERE e.v2 <> wk.u
), dupes AS (
  SELECT u AS doc_id FROM walk GROUP BY u HAVING least(u, min(v2)) <> u
), survivors AS (
  SELECT doc_id FROM exact
  WHERE doc_id NOT IN (SELECT doc_id FROM dupes)
)
SELECT doc_id,
  CASE WHEN slot < 90 THEN 'train'
       WHEN slot < 95 THEN 'val'
       ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         {DUCK_HASH.format("'split:' || CAST(doc_id AS VARCHAR)")} % 100
           AS slot
  FROM survivors
)
"""


@register("curation_survivors", oracle=_curation_survivors_oracle())
def curation_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED curation pipeline end-to-end (plans/curation.curate):
    quality gates -> PII scrub -> exact dedup -> LSH near-dup verify ->
    connected-components keep-one-per-component -> deterministic split —
    the oracle replays every stage including the CC closure (recursive
    CTE), so the driver hash-checks the whole pipeline, not just its
    pieces."""
    from .curation import curate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return curate(docs).select("doc_id", "split")


@register(
    "top_ngrams",
    oracle="""
WITH ws AS (SELECT string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT unnest(list_transform(
    generate_series(1, len(w) - 2),
    i -> array_to_string(w[i:i+2], ' ')
  )) AS gram
  FROM ws WHERE len(w) >= 3
)
SELECT gram, COUNT(*) AS n
FROM grams GROUP BY gram
ORDER BY n DESC, gram LIMIT 20
""",
)
def top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate mining: the top-20 most-repeated word
    3-grams (occurrence counts, not per-doc distinct) — the discovery pass
    that feeds a boilerplate strip list.  groupBy + orderBy/limit plans as
    partial-agg + TakeOrderedAndProject: no global sort of the n-gram
    table, each partition ships only its own top candidates."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.filter(
        F.size(F.split("text", " ")) >= 3
    ).select(
        F.explode(D.word_shingles(F.col("text"), 3)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "gram")
        .limit(20)
    )


@register(
    "bpe_pair_counts",
    oracle="""
WITH wc AS (
  SELECT w AS word, COUNT(*) AS n FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
),
pos AS (
  SELECT word, n, unnest(generate_series(1, length(word))) AS i FROM wc
),
pairs AS (
  SELECT substr(word, i, 1) AS a,
         CASE WHEN i < length(word) THEN substr(word, i + 1, 1)
              ELSE '</w>' END AS b,
         n
  FROM pos
)
SELECT a, b, CAST(SUM(n) AS BIGINT) AS cnt FROM pairs GROUP BY a, b
ORDER BY cnt DESC, a, b LIMIT 30
""",
)
def bpe_pair_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction, round-1 discovery (operators/bpe): the
    top-30 adjacent symbol pairs over the corpus word-TYPE table
    (characters + end-of-word marker), weighted by word count — the pair
    the full ``bpe_train`` loop would merge first is row 1.  All integer
    counts and string equality; the corpus collapses to word types before
    any pair work, so the per-round cost at 10^12 docs tracks |vocab|,
    not |tokens|.  Training-loop semantics (greedy non-overlap merges,
    tie order) are differentially pinned against a textbook reference in
    tests/test_bpe.py."""
    from ..operators import bpe as BP

    docs = load_table(spark, sf_dir, "documents")
    return (
        BP.pair_counts(BP.word_symbol_table(docs))
        .orderBy(F.col("cnt").desc(), "a", "b")
        .limit(30)
    )


def _duck_bpe_with(n_merges: int) -> str:
    """The WITH-clause replaying operators.bpe.bpe_train: the corpus
    collapses to the word-type table ``s0`` (word, n, pos, sym — chars +
    end-of-word marker), then one CTE group per merge round: pair counts
    over adjacent positions, argmax (cnt desc, lhs, rhs), greedy
    LEFT-TO-RIGHT NON-OVERLAPPING merge via gaps-and-islands (consecutive
    match starts form an island; keep even offsets — 'aaa' + (a,a) merges
    once), and a re-ranked rewrite.  All integer counts + string equality:
    the replay is exact whatever the engine.  Shared by the
    ``bpe_merges`` oracle (reads the per-round ``top{{r}}``s) and the
    ``bpe_encode`` oracle (reads the final symbol table ``s{{N}}``)."""
    parts = ["""
wc AS (
  SELECT w AS word, COUNT(*) AS n FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
),
s0 AS MATERIALIZED (
  SELECT word, n, i AS pos,
         CASE WHEN i <= length(word) THEN substr(word, i, 1)
              ELSE '</w>' END AS sym
  FROM (SELECT word, n, unnest(generate_series(1, length(word) + 1)) AS i
        FROM wc)
)"""]
    for r in range(n_merges):
        parts.append(f"""
pc{r} AS (
  SELECT s1.sym AS a, s2.sym AS b, SUM(s1.n) AS cnt
  FROM s{r} s1 JOIN s{r} s2 ON s1.word = s2.word AND s2.pos = s1.pos + 1
  GROUP BY s1.sym, s2.sym
),
top{r} AS MATERIALIZED (SELECT a, b, cnt FROM pc{r} ORDER BY cnt DESC, a, b LIMIT 1),
mstart{r} AS (
  SELECT s1.word, s1.pos
  FROM s{r} s1
  JOIN s{r} s2 ON s1.word = s2.word AND s2.pos = s1.pos + 1
  JOIN top{r} t ON s1.sym = t.a AND s2.sym = t.b
),
isl{r} AS (
  SELECT word, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS grp
  FROM mstart{r}
),
keep{r} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos,
           pos - MIN(pos) OVER (PARTITION BY word, grp) AS off
    FROM isl{r}
  ) WHERE off % 2 = 0
),
s{r + 1} AS MATERIALIZED (
  SELECT word, n,
         ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
  FROM (
    SELECT s.word, s.n, s.pos,
           CASE WHEN k.pos IS NOT NULL THEN t.a || t.b ELSE s.sym END AS sym
    FROM s{r} s
    CROSS JOIN top{r} t
    LEFT JOIN keep{r} k ON s.word = k.word AND s.pos = k.pos
    WHERE NOT EXISTS (SELECT 1 FROM keep{r} kb
                      WHERE kb.word = s.word AND kb.pos = s.pos - 1)
  )
)""")
    return "WITH " + ",".join(parts)


def _duck_bpe_merges(n_merges: int) -> str:
    """The learned merge-rule table: one row per round from the replay."""
    finals = "\nUNION ALL ".join(
        f"SELECT {r} AS rank, a AS lhs, b AS rhs, "
        f"CAST(cnt AS BIGINT) AS cnt FROM top{r}"
        for r in range(n_merges)
    )
    return _duck_bpe_with(n_merges) + finals + "\nORDER BY rank"


def _duck_bpe_encode(n_merges: int) -> str:
    """Per-document tokenization under the learned vocabulary: each word
    type's final symbol sequence comes straight from the replay's
    ``s{{N}}`` table, documents re-tokenize by joining their words' symbol
    runs in order.  Output md5-compacted (the probe battery showed the
    compact shape is the right driver citizen for text-heavy outputs)."""
    return (
        _duck_bpe_with(n_merges)
        + f""",
wtok AS (
  SELECT word, string_agg(sym, ' ' ORDER BY pos) AS toks,
         CAST(COUNT(*) AS BIGINT) AS n_sym
  FROM s{n_merges} GROUP BY word
),
dws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
dwords AS (
  SELECT doc_id, unnest(w) AS word,
         unnest(generate_series(1, len(w))) AS ord
  FROM dws
)
SELECT d.doc_id,
       CAST(SUM(t.n_sym) AS BIGINT) AS n_bpe_tokens,
       md5(string_agg(t.toks, ' ' ORDER BY d.ord)) AS tokens_md5
FROM dwords d JOIN wtok t ON d.word = t.word
WHERE d.word <> ''
GROUP BY d.doc_id"""
    )


BPE_MERGES = 6


@register("bpe_merges", oracle=_duck_bpe_merges(BPE_MERGES))
def bpe_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge-rule table itself, driver-replayable: Spark
    runs the distributed training loop (operators/bpe.bpe_train — word-type
    collapse, per-round pair counts, greedy non-overlap rewrite, O(1)
    driver rows per round) and the oracle re-derives every round's winning
    pair and rewrite in pure SQL.  Complements ``bpe_pair_counts`` (the
    round-1 discovery view) and the textbook differential in
    tests/test_bpe.py."""
    from ..operators import bpe as BP

    docs = load_table(spark, sf_dir, "documents")
    rules = BP.bpe_train(docs, n_merges=BPE_MERGES)
    return spark.createDataFrame(
        [(r, a, b, c) for r, a, b, c in rules],
        "rank int, lhs string, rhs string, cnt bigint",
    )


@register("bpe_encode", oracle=_duck_bpe_encode(BPE_MERGES))
def bpe_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applied-tokenization side of the vocabulary (VERDICT r4 next
    #7): train the merge table distributed, then encode every document
    with it (operators/bpe.bpe_encode, expr path at this rule count) and
    emit (doc_id, n_bpe_tokens, tokens_md5).  The oracle replays training
    to the final symbol table and re-tokenizes each doc from its word
    types — closing the loop from vocabulary induction to applied
    tokenization under one driver hash.  Docs whose every token is empty
    would have no oracle row; the corpus has none, and the Spark side
    drops them symmetrically."""
    from ..operators import bpe as BP

    docs = load_table(spark, sf_dir, "documents")
    rules = BP.bpe_train(docs, n_merges=BPE_MERGES)
    enc = BP.bpe_encode(docs, rules)
    return enc.filter(F.size("bpe_tokens") > 0).select(
        "doc_id",
        F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.md5(F.array_join("bpe_tokens", " ")).alias("tokens_md5"),
    )


@register(
    "bpe_fertility_by_lang",
    oracle=_duck_bpe_with(BPE_MERGES)
    + f""",
wtok AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_sym
  FROM s{BPE_MERGES} GROUP BY word
),
dws AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
dwords AS (SELECT doc_id, lang, unnest(w) AS word FROM dws),
per AS (
  SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(t.n_sym) AS BIGINT) AS n_bpe_tokens
  FROM dwords d JOIN wtok t ON d.word = t.word
  WHERE d.word <> ''
  GROUP BY d.lang
)
SELECT lang, n_words, n_bpe_tokens,
       CAST((1000000 * n_bpe_tokens) // n_words AS BIGINT) AS fertility_ppm
FROM per
""",
)
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — BPE subword tokens emitted per
    whitespace word, in exact ppm — the multilingual-equity audit run on
    every candidate vocabulary (a language tokenizing at 2x the subwords
    of another effectively pays double sequence length for the same
    text; cf. the UniMax/NLLB tokenizer-fairness discussions).  Composes
    the distributed trainer and encoder (operators/bpe): train once,
    encode every doc (the per-doc size is the same quantity the
    driver-green ``bpe_encode`` row pins), then one partial-agg'd
    per-lang sum; the oracle replays training to the final symbol table
    and re-derives every count."""
    from ..operators import bpe as BP

    docs = load_table(spark, sf_dir, "documents")
    rules = BP.bpe_train(docs, n_merges=BPE_MERGES)
    enc = BP.bpe_encode(docs, rules)
    n_words = F.size(
        F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    )
    return (
        enc.select(
            "lang",
            n_words.alias("__nw"),
            F.size("bpe_tokens").alias("__nb"),
        )
        .groupBy("lang")
        .agg(
            F.sum("__nw").cast("long").alias("n_words"),
            F.sum("__nb").cast("long").alias("n_bpe_tokens"),
        )
        .filter(F.col("n_words") > 0)
        .withColumn(
            "fertility_ppm",
            F.expr("(1000000 * n_bpe_tokens) div n_words").cast("long"),
        )
    )


@register(
    "bpe_roundtrip",
    oracle="""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words AS (
  SELECT doc_id, unnest(w) AS word,
         unnest(generate_series(1, len(w))) AS ord
  FROM ws
)
SELECT doc_id, md5(string_agg(word, ' ' ORDER BY ord)) AS decoded_md5
FROM words WHERE word <> '' GROUP BY doc_id
""",
)
def bpe_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The detokenizer side (VERDICT r4 next #7): encode every document
    with the learned vocabulary, then ``bpe_decode`` the token stream
    back (operators/bpe.bpe_decode — merge-rank independent, the ``</w>``
    marker carries the word boundary).  The driver-checked invariant is
    decode(encode(text)) == normalized text: the oracle needs NO training
    replay, just each doc's nonempty words re-joined — so a green row
    hash-pins the entire encode+decode loop against plain tokenization."""
    from ..operators import bpe as BP

    docs = load_table(spark, sf_dir, "documents")
    rules = BP.bpe_train(docs, n_merges=BPE_MERGES)
    dec = BP.bpe_decode(BP.bpe_encode(docs, rules), out_col="decoded")
    return dec.filter(F.col("decoded") != "").select(
        "doc_id", F.md5("decoded").alias("decoded_md5")
    )


# r5 root-cause note (the r3/r4 driver-red on paragraph_dedup — and the
# r4-reds on bpe_pair_counts / bpe_merges / shard_assembly): DuckDB promotes
# integer SUM to HUGEINT (int128); a pandas/Arrow fetch renders that as
# float64/decimal128 ('3' -> '3.0'), so any UNCAST integer-sum OUTPUT column
# hash-mismatches at a driver that fetches via pandas, while
# fetchall()-based local checks stay green.  Exactly the four r4-red
# queries — and only those four of all 100 — had a HUGEINT output column
# (here: n_kept).  Fix: CAST every integer-sum output to BIGINT; enforced
# registry-wide by test_registry_contract.test_no_hugeint_oracle_outputs.
# The SQL below otherwise stays version-robust: zipped unnest +
# generate_series words, GROUP BY (ord-1)/10 chunking with
# string_agg(... ORDER BY ord), ROW_NUMBER first-occurrence ordered
# (doc_id, pos) — the exact lexicographic struct-min the Spark side uses —
# and string_agg(... ORDER BY pos) FILTER reassembly.  Kept as a module
# constant so the r5 probe battery can wrap it (md5-compacted variants).
_PARA_DEDUP_ORACLE = f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words AS (
  SELECT doc_id,
         unnest(w) AS word,
         unnest(generate_series(1, len(w))) AS ord
  FROM ws
), chunks AS (
  SELECT doc_id,
         CAST(floor((ord - 1) / 10.0) AS INT) AS pos,
         string_agg(word, ' ' ORDER BY ord) AS chunk
  FROM words GROUP BY doc_id, CAST(floor((ord - 1) / 10.0) AS INT)
), hh AS (
  SELECT doc_id, pos, chunk, md5(chunk) AS h FROM chunks
), rk AS (
  SELECT doc_id, pos, chunk,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM hh
)
SELECT doc_id,
       COALESCE(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE rn = 1),
                '') AS text,
       CAST(COALESCE(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_kept,
       COUNT(*) AS n_total
FROM rk GROUP BY doc_id
"""


@register("paragraph_dedup", oracle=_PARA_DEDUP_ORACLE)
def paragraph_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph-level dedup (operators/dedup.paragraph_dedup):
    a repeated paragraph survives only at its FIRST global occurrence
    (min (doc_id, pos)); docs are reassembled from survivors in order,
    with per-doc kept/total counts so nothing drops silently.  One shuffle
    on the paragraph hash + one on doc_id for reassembly; the 'paragraph'
    unit here is a 10-word window (the synthetic corpus is single-line;
    real corpora pass a newline splitter)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.paragraph_dedup(docs)


DUP_PASSAGE_K = 20


def _duck_passage_runs() -> str:
    """Shared WITH-clause for the duplicate-passage family: tokens,
    k-window hashes, cross-doc duplicated hashes, gaps-and-islands
    maximal runs."""
    k = DUP_PASSAGE_K
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words0 AS (
  SELECT doc_id, unnest(w) AS word,
         unnest(generate_series(1, len(w))) AS ord
  FROM ws
),
toks AS (
  SELECT doc_id, word,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ord) AS pos
  FROM words0 WHERE word <> ''
),
sh AS (
  SELECT doc_id, pos,
         string_agg(word, ' ') OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {k - 1} FOLLOWING
         ) AS shingle,
         COUNT(*) OVER (PARTITION BY doc_id) AS n
  FROM toks
),
shv AS (
  SELECT doc_id, pos, md5(shingle) AS h
  FROM sh WHERE pos <= n - {k - 1}
),
dup AS (SELECT h FROM shv GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
marks AS (SELECT doc_id, pos FROM shv WHERE h IN (SELECT h FROM dup)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {k}
              THEN 0 ELSE 1 END AS brk
  FROM marks
),
grp AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS g
  FROM isl
),
runs AS (
  SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS start_pos,
         CAST(MAX(pos) + {k - 1} AS BIGINT) AS end_pos,
         COUNT(*) AS n_windows
  FROM grp GROUP BY doc_id, g
)"""


@register(
    "duplicate_passages",
    oracle=_duck_passage_runs()
    + "\nSELECT doc_id, start_pos, end_pos, n_windows FROM runs",
)
def duplicate_passages_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup (operators/dedup.duplicate_passages —
    Lee et al. ACL 2022 semantics via k-token rolling windows): every
    maximal run of >= k consecutive tokens shared verbatim by >= 2
    documents, as 1-based inclusive token ranges.  The window-hash
    groupBy partial-aggregates map-side (boilerplate passages hitting
    millions of docs collapse before the shuffle), the semi join marks
    only duplicated starts, and the gaps-and-islands merge replays
    identically in the oracle's LAG/SUM windows — integer/hash exact
    end to end."""
    docs = load_table(spark, sf_dir, "documents")
    return D.duplicate_passages(docs, k=DUP_PASSAGE_K, min_docs=2)


@register(
    "cut_duplicate_passages",
    oracle=_duck_passage_runs()
    + """,
cutpos AS (
  SELECT doc_id, unnest(generate_series(start_pos, end_pos)) AS pos
  FROM runs
),
keptw AS (
  SELECT t.doc_id, t.pos, t.word
  FROM toks t
  WHERE NOT EXISTS (SELECT 1 FROM cutpos c
                    WHERE c.doc_id = t.doc_id AND c.pos = t.pos)
),
agg AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text,
         COUNT(*) AS n_kept
  FROM keptw GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(a.text, '') AS text,
       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(t.n, 0) - COALESCE(a.n_kept, 0) AS BIGINT)
         AS n_removed
FROM documents d
LEFT JOIN tot t ON d.doc_id = t.doc_id
LEFT JOIN agg a ON d.doc_id = a.doc_id
""",
)
def cut_duplicate_passages_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cut applied (operators/dedup.cut_duplicate_passages): every
    flagged range removed from every document, surviving tokens rejoined
    in order with honest kept/removed counts — a wholly-duplicated doc
    returns empty text rather than vanishing.  The oracle extends the
    runs replay with a NOT EXISTS anti-join on expanded cut positions
    and an ordered string_agg reassembly."""
    docs = load_table(spark, sf_dir, "documents")
    return D.cut_duplicate_passages(docs, k=DUP_PASSAGE_K, min_docs=2)


@register(
    "sequence_packing",
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         {DUCK_HASH.format("CAST(doc_id AS VARCHAR)")} % 32 AS shard,
         {DUCK_HASH.format("CAST(doc_id AS VARCHAR)")} AS h,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_offset
  FROM s
)
SELECT doc_id, shard, n_tokens, start_offset,
       CAST(floor(start_offset / 512) AS BIGINT) AS bin_id
FROM o
""",
)
def sequence_packing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-sequence packing (operators/packing): shard
    by the engine-agnostic doc hash, running token offsets per shard in
    canonical order, bin = offset / seq_len — one shuffle, integer-exact,
    replayed verbatim by the oracle's window."""
    from ..operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, seq_len=512, n_shards=32)


@register(
    "packing_efficiency",
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         {DUCK_HASH.format("CAST(doc_id AS VARCHAR)")} % 32 AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), per AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM s GROUP BY shard
)
SELECT shard, n_docs, n_tokens,
       CAST((n_tokens + 511) // 512 AS BIGINT) AS n_bins,
       CAST(((n_tokens + 511) // 512) * 512 - n_tokens AS BIGINT)
         AS waste_tokens,
       CAST((1000000 * n_tokens) // (((n_tokens + 511) // 512) * 512)
            AS BIGINT) AS fill_ppm
FROM per
""",
)
def packing_efficiency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing audit that rides with ``sequence_packing`` /
    ``shard_assembly``: per shard, how many 512-token bins the contiguous
    token stream fills, the padding tokens wasted in the final partial
    bin, and the realized fill rate in exact ppm — the no-silent-caps
    report a packing stage must publish (a skewed shard assignment or a
    pathological doc-length mix shows up here as fill divergence across
    shards before it costs a training run).  One partial-agg'd per-shard
    sum; pure integer arithmetic mirrored by the oracle."""
    from ..operators.packing import pack_sequences

    idx = pack_sequences(
        load_table(spark, sf_dir, "documents"), seq_len=512, n_shards=32
    )
    return (
        idx.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "n_bins", F.expr("(n_tokens + 511) div 512").cast("long")
        )
        .withColumn(
            "waste_tokens",
            (F.col("n_bins") * 512 - F.col("n_tokens")).cast("long"),
        )
        .withColumn(
            "fill_ppm",
            F.expr("(1000000 * n_tokens) div (n_bins * 512)").cast("long"),
        )
    )


@register(
    "chunk_documents",
    oracle="""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n
  FROM documents
), c AS (
  SELECT doc_id, w, n,
         unnest(generate_series(0,
             CAST((greatest(n - 64, 0) + 47) // 48 AS INT))) AS i
  FROM t
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * 48 AS BIGINT) AS start_token,
       CAST(least(64, n - i * 48) AS BIGINT) AS n_tokens,
       md5(array_to_string(list_slice(w, i * 48 + 1, i * 48 + 64), ' '))
         AS chunk_hash
FROM c
""",
)
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (operators/packing.chunk_documents): long
    documents split into 64-token windows every 48 tokens (16-token
    overlap) — the long-context training-prep step that SPLITS docs,
    complementing sequence_packing which CONCATENATES them.  Chunk
    boundaries are per-row integer arithmetic over the token array
    (sequence -> transform -> explode, all JVM): ZERO shuffles at any
    corpus size, deterministic under any partitioning, chunk payloads
    md5-compacted at the query surface per the probe-battery rule."""
    from ..operators.packing import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, seq_len=64, stride=48)


_SHARD_ASSEMBLY_ORACLE = f"""
WITH s AS (
  SELECT doc_id, text,
         {DUCK_HASH.format("CAST(doc_id AS VARCHAR)")} % 32 AS shard,
         {DUCK_HASH.format("CAST(doc_id AS VARCHAR)")} AS h,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, text, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_offset
  FROM s
)
SELECT shard, CAST(floor(start_offset / 512) AS BIGINT) AS bin_id,
       string_agg(text, '<|eod|>' ORDER BY start_offset) AS shard_text,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM o GROUP BY shard, CAST(floor(start_offset / 512) AS BIGINT)
"""


@register("shard_assembly", oracle=_SHARD_ASSEMBLY_ORACLE)
def shard_assembly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard payload assembly (operators/packing.assemble_shards):
    each (shard, bin) concatenates its documents in canonical packing
    order with an end-of-document separator — the writer stage of the
    packing index, deterministic whatever the partitioning (order inside a
    bin is by start_offset, itself a pure function of the doc hash)."""
    from ..operators.packing import assemble_shards

    docs = load_table(spark, sf_dir, "documents")
    return assemble_shards(docs, seq_len=512, n_shards=32)


# --------------------------------------------------------------------------
# r5 driver-divergence probe battery (VERDICT r4 "Next round" #1).
#
# The four r4 driver-red queries (bpe_pair_counts, bpe_merges,
# shard_assembly, paragraph_dedup) were local-green at two scale factors
# under the driver-identical gate, so the divergence is environmental, not
# algorithmic.  The r5 root cause (found by typing every oracle's output
# columns): all four — and ONLY those four — emitted a DuckDB HUGEINT
# output column (integer SUM promotes to int128; a pandas/Arrow fetch turns
# that into float64/decimal128 and the value hash diverges).  The fix is
# CAST ... AS BIGINT on those outputs; these probes bisect each red
# pipeline stage-by-stage anyway, so that IF any red row survives the cast
# fix, the first red probe in CORRECTNESS_r05.json names the divergent
# construct outright (tokenization vs char-split vs hashing vs chunk
# content vs first-occurrence choice vs reassembly vs long-string compare
# vs driver value normalization).  Every probe is green-expected, tiny,
# and carries a fully-cast oracle.
# --------------------------------------------------------------------------


@register(
    "probe_literal_specials",
    oracle="""
SELECT CAST(1 AS BIGINT) AS k,
       '<|eod|>' AS sep,
       'a|b,c d' AS mix,
       chr(9) || 'tab' AS tabbed,
       'q''s "x"' AS quoted
""",
)
def probe_literal_specials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-normalization control: one constant row whose strings carry
    every character class the real outputs embed (the '<|eod|>' shard
    separator, pipes/commas/spaces, a tab, quotes).  If THIS is red, the
    driver's value normalization — not any engine — mangles specials."""
    return spark.range(1).select(
        F.lit(1).cast("long").alias("k"),
        F.lit("<|eod|>").alias("sep"),
        F.lit("a|b,c d").alias("mix"),
        F.lit("\ttab").alias("tabbed"),
        F.lit('q\'s "x"').alias("quoted"),
    )


@register(
    "probe_corpus_sums",
    oracle="""
SELECT CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(*) AS n_docs
FROM documents
""",
)
def probe_corpus_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-sum arithmetic control (CAST AS BIGINT on the oracle side,
    long on the Spark side): one row, no text.  Red here would mean even
    cast integer aggregates diverge — i.e. the problem is arithmetic or
    normalization, not strings."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.count("*").alias("n_docs"),
    )


@register(
    "probe_word_tokens",
    oracle="""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words AS (
  SELECT doc_id, unnest(w) AS word,
         unnest(generate_series(1, len(w))) AS ord
  FROM ws
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN word = '' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_empty
FROM words GROUP BY doc_id
""",
)
def probe_word_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 1 of every red pipeline: whitespace tokenization parity,
    including empty-token behavior (trailing/duplicate separators are the
    classic split() version skew).  No text in the output."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_tokens"),
        F.size(F.filter(ws, lambda w: w == F.lit(""))).cast("long")
        .alias("n_empty"),
    )


@register(
    "probe_char_split",
    oracle="""
WITH wc AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
), top AS (
  SELECT word, n FROM wc ORDER BY n DESC, word LIMIT 20
), pos AS (
  SELECT word, n, unnest(generate_series(1, length(word))) AS i FROM top
)
SELECT word, n, CAST(length(word) + 1 AS BIGINT) AS n_syms,
       string_agg(substr(word, i, 1), '|' ORDER BY i) || '|</w>' AS syms
FROM pos GROUP BY word, n
""",
)
def probe_char_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 2 of the BPE pipeline: the character split itself (Spark
    ``split(word, '')`` vs oracle per-position ``substr``) on the 20 most
    frequent words, symbols joined visibly.  Red here = the empty-pattern
    regex split disagrees at the driver (code-unit vs code-point or
    trailing-empty skew) and word_symbol_table must move to a
    substring-based expansion."""
    from ..operators import bpe as BP

    docs = load_table(spark, sf_dir, "documents")
    top = (
        BP.word_symbol_table(docs)
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )
    return top.select(
        "word",
        "n",
        F.size("syms").cast("long").alias("n_syms"),
        F.array_join("syms", "|").alias("syms"),
    )


@register(
    "probe_chunk_hash",
    oracle=f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
            FROM documents WHERE doc_id % 7 = 0),
words AS (
  SELECT doc_id, unnest(w) AS word,
         unnest(generate_series(1, len(w))) AS ord
  FROM ws
), chunks AS (
  SELECT doc_id, CAST(floor((ord - 1) / 10.0) AS INT) AS pos,
         string_agg(word, ' ' ORDER BY ord) AS chunk
  FROM words GROUP BY doc_id, CAST(floor((ord - 1) / 10.0) AS INT)
)
SELECT doc_id, pos, md5(chunk) AS h FROM chunks
""",
)
def probe_chunk_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 2 of paragraph_dedup: chunk CONTENT parity, md5-compacted
    (doc_id, pos, h) on a 1/7th doc sample — separates 'the chunk text
    differs' from 'the aggregation construct differs'."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 7 == 0
    )
    return D.paragraph_chunks(docs).select("doc_id", "pos", "h")


@register(
    "probe_first_occurrence",
    oracle=f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words AS (
  SELECT doc_id, unnest(w) AS word,
         unnest(generate_series(1, len(w))) AS ord
  FROM ws
), chunks AS (
  SELECT doc_id, CAST(floor((ord - 1) / 10.0) AS INT) AS pos,
         string_agg(word, ' ' ORDER BY ord) AS chunk
  FROM words GROUP BY doc_id, CAST(floor((ord - 1) / 10.0) AS INT)
), hh AS (
  SELECT doc_id, pos, md5(chunk) AS h FROM chunks
), rk AS (
  SELECT doc_id, pos, h,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM hh
)
SELECT h, doc_id AS first_doc, pos AS first_pos FROM rk WHERE rn = 1
""",
)
def probe_first_occurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 3 of paragraph_dedup: the keep-first choice alone — Spark's
    lexicographic min(struct(doc_id, pos)) vs the oracle's ROW_NUMBER
    ordered (doc_id, pos).  No chunk text in the output."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = D.paragraph_chunks(docs)
    return (
        chunks.groupBy("h")
        .agg(F.min(F.struct("doc_id", "pos")).alias("f"))
        .select(
            "h",
            F.col("f.doc_id").alias("first_doc"),
            F.col("f.pos").alias("first_pos"),
        )
    )


@register(
    "probe_para_reassembly",
    oracle=f"""
SELECT doc_id, md5(text) AS text_md5, n_kept, n_total
FROM ({_PARA_DEDUP_ORACLE})
""",
)
def probe_para_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 4 of paragraph_dedup: the FULL pipeline with the reassembled
    text md5-compacted.  Red here with probe_chunk_hash green = the
    ordered-reassembly construct (array_sort/collect_list vs string_agg
    ORDER BY) diverges; green here with paragraph_dedup red = only the
    verbatim long-string compare diverges at the driver."""
    docs = load_table(spark, sf_dir, "documents")
    out = D.paragraph_dedup(docs)
    return out.select(
        "doc_id", F.md5("text").alias("text_md5"), "n_kept", "n_total"
    )


@register(
    "probe_packing_order",
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         {DUCK_HASH.format("CAST(doc_id AS VARCHAR)")} % 32 AS shard,
         {DUCK_HASH.format("CAST(doc_id AS VARCHAR)")} AS h,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, shard,
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_offset
  FROM s
)
SELECT shard, CAST(floor(start_offset / 512) AS BIGINT) AS bin_id,
       arg_min(doc_id, start_offset) AS first_doc,
       arg_max(doc_id, start_offset) AS last_doc,
       COUNT(*) AS n_docs
FROM o GROUP BY shard, CAST(floor(start_offset / 512) AS BIGINT)
""",
)
def probe_packing_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stages 1-3 of shard_assembly: shard hashing, canonical (h, doc_id)
    ordering and bin arithmetic — everything EXCEPT the text payload.
    Red here = the packing index itself diverges; green here with
    shard_assembly red = only the concatenated payload does."""
    from ..operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    idx = pack_sequences(docs, seq_len=512, n_shards=32)
    return idx.groupBy("shard", "bin_id").agg(
        F.min_by("doc_id", "start_offset").alias("first_doc"),
        F.max_by("doc_id", "start_offset").alias("last_doc"),
        F.count("*").alias("n_docs"),
    )


@register(
    "probe_shard_payload_hash",
    oracle=f"""
SELECT shard, bin_id, md5(shard_text) AS payload_md5, n_docs, n_tokens
FROM ({_SHARD_ASSEMBLY_ORACLE})
""",
)
def probe_shard_payload_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 4 of shard_assembly: the full payload, md5-compacted.  Green
    here with shard_assembly red = the driver's verbatim compare of very
    long strings is the divergence, not the assembly."""
    from ..operators.packing import assemble_shards

    docs = load_table(spark, sf_dir, "documents")
    out = assemble_shards(docs, seq_len=512, n_shards=32)
    return out.select(
        "shard",
        "bin_id",
        F.md5("shard_text").alias("payload_md5"),
        "n_docs",
        "n_tokens",
    )


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


# ===========================================================================
# D. multimodal columns (binary blobs + typed metadata; decode stubbed with a
#    deterministic fake container, Spark plumbing real — operators/multimodal)
# ===========================================================================

from ..operators import multimodal as M  # noqa: E402


@register(
    "media_metadata",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       'img://' || CAST(doc_id AS VARCHAR) || '/0.jpg' AS media_ref,
       'IMG1' AS format,
       CAST(doc_id % 64 + 16 AS INT) AS width,
       CAST(doc_id % 48 + 9 AS INT) AS height,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
       TRUE AS valid
FROM documents
""",
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode -> typed metadata via mapInPandas (stubbed codec,
    real Arrow/binary plumbing)."""
    docs = load_table(spark, sf_dir, "documents")
    return M.decode_metadata(M.synthesize_media(docs))


_DUCK_HBINS = ", ".join(
    "CAST(len(list_filter(codes, x -> x = {i})) AS BIGINT) AS h{i}".format(i=i)
    for i in range(16)
)


@register(
    "media_byte_histogram",
    oracle=f"""
WITH c AS (
  SELECT doc_id, list_transform(regexp_extract_all(text, '.'),
                                ch -> ascii(ch) % 16) AS codes
  FROM documents WHERE doc_id < 100
)
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       'img://' || CAST(doc_id AS VARCHAR) || '/0.jpg' AS media_ref,
       {_DUCK_HBINS}
FROM c
""",
)
def media_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads: numpy-vectorized byte
    histogram per Arrow batch (the batch shape a model forward pass uses)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return M.byte_histogram_features(M.synthesize_media(docs))


@register(
    "media_resize_plan",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(5 + 2 + 1 + 2 + 1 + octet_length(encode(text)) AS BIGINT)
         AS content_bytes
FROM documents WHERE doc_id < 100
""",
)
def media_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stub: binary-in/binary-out mapInPandas; the oracle checks the
    rewritten container size ('IMG1:' + '32:' + '24:' + payload)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    resized = M.resize_stub(M.synthesize_media(docs), width=32, height=24)
    return resized.select(
        "doc_id", F.octet_length("content").cast("long").alias("content_bytes")
    )


@register(
    "media_frame_sample",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST((octet_length(encode(text)) + 3) // 4 AS INT) AS n_frames
FROM documents WHERE doc_id < 100
""",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling stub: strided payload read, every 4th byte."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return M.frame_sample_stub(M.synthesize_media(docs), every=4).select(
        "doc_id", "n_frames"
    )


@register(
    "pdf_page_extract",
    oracle="""
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id < 200
), pages AS (
  SELECT doc_id, 0 AS page_no, 'Intro ' || doc_id AS title,
         coalesce(array_to_string(w[1:12], ' '), '') AS body FROM w
  UNION ALL
  SELECT doc_id, 1, 'Details ' || doc_id,
         coalesce(array_to_string(w[13:24], ' '), '') FROM w
)
SELECT doc_id, 'pdf://' || doc_id || '/doc.pdf' AS media_ref,
       CAST(page_no AS INT) AS page_no, title, body,
       CAST(len(string_split(title || ' ' || body, ' '))
            - CASE WHEN body = '' THEN 1 ELSE 0 END AS INT) AS n_words
FROM pages
""",
)
def pdf_page_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF/layout parse path (stubbed codec, real plumbing): binary PDF
    containers -> exploded per-page rows with the first-line-as-heading
    layout heuristic, one mapInPandas, poison blobs skipped."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return M.parse_pdf_pages(M.synthesize_pdfs(docs))


@register(
    "media_embedding_topk",
    oracle="""
WITH c AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '.'), ch -> ascii(ch) % 16)
           AS codes
  FROM documents WHERE doc_id < 200
), h AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
                        b -> CAST(len(list_filter(codes, x -> x = b))
                                  AS DOUBLE)) AS hist
  FROM c
), v AS (
  SELECT CAST(doc_id AS VARCHAR) AS vid, doc_id AS did,
         list_transform(
           hist,
           x -> x / sqrt(list_sum(list_transform(hist, y -> y * y)))) AS e
  FROM h
), q AS (SELECT * FROM v WHERE did < 5),
sims AS (
  SELECT q.vid AS query_id, v.vid AS neighbor_id,
         round(
           list_sum(list_transform(generate_series(1, len(q.e)),
                                   i -> q.e[i] * v.e[i]))
           / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
              * sqrt(list_sum(list_transform(v.e, x -> x * x)))), 6)
           AS cos_sim
  FROM q, v WHERE q.vid <> v.vid
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
  FROM sims
) WHERE rank <= 3
""",
)
def media_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline composition: binary media -> embedding
    model stub (numpy batch per Arrow batch, array<double> out) -> exact
    cosine top-k.  The decode/embed step runs BEFORE any shuffle — only the
    16-double vectors cross the wire, never the blobs; the oracle recomputes
    the embeddings from the synthesized payload in pure SQL."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    emb = M.embed_stub(M.synthesize_media(docs)).select("doc_id", "embedding")
    queries_df = emb.filter(F.col("doc_id").cast("int") < 5)
    return S.brute_force_topk(
        emb, queries_df, k=3, id_col="doc_id", vec_col="embedding"
    )
