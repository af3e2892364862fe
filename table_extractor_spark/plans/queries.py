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

from typing import Callable, Dict, List, Optional, Tuple

# the registration plumbing and parity constants, re-exported for the many
# long-standing importers of this module
from .registry import (  # noqa: F401
    DUCK_HASH,
    LSH_BANDS,
    MINHASH_P,
    MINHASH_PERMS,
    STOPWORDS,
    _REGISTRY,
    register,
    spark_hash,
)

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

# Queries registered DURING round 6, past the full window: green in both
# local gate modes at two SFs, awaiting their first driver row — they
# lead the r7 window (same contract the r6 queue had in round 5).
_R7_QUEUE = (
    "dedup_keep_best",
    "leakage_safe_split",
    "q4_order_priority",
    "q22_dormant_customers",
    "salted_skew_join",
    "scd2_dimension",
    "importance_resample",
    "zorder_layout_audit",
    "scd2_point_in_time",
    "json_props_rollup",
    "bloom_reduced_urgent_revenue",
    "cube_event_stats",
    "entity_match_pairs",
    "q21_sole_late_supplier",
    "q13_order_distribution",
    "q18_large_volume_orders",
    "part_triangle_counts",
    "part_k_hop_frontier",
    "daily_trend_slope",
    "range_frame_hourly_load",
    "stratified_sample_salted",
    "q15_top_revenue_supplier",
    "cheapest_supplier_per_part",
    "bigram_fluency_score",
    "ann_filtered_topk",
    "hourly_gap_fill",
    "null_safe_device_join",
    "event_transition_matrix",
    "q7_nation_trade_volume",
    "embedding_outlier_scores",
    "q16_distinct_supplier_counts",
    "cumulative_unique_users",
    "q10_returned_item_revenue",
    "q12_priority_by_returnflag",
    "q19_or_of_ands_revenue",
    "q8_market_share",
    "cume_dist_doc_length",
    "zero_token_docs_audit",
    "lang_id_confusion",
    "url_policy_longest_prefix",
)

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



# Importing the battery modules executes their @register calls (import
# order = registration order = the original single-file order); the star
# re-exports keep `queries.<fn>` attribute access working for tests and
# callers that predate the round-6 split.
from .battery_extraction import *  # noqa: E402,F401,F403
from .battery_relational import *  # noqa: E402,F401,F403
from .battery_dedup_text import *  # noqa: E402,F401,F403
from .battery_corpus_stats import *  # noqa: E402,F401,F403
from .battery_multimodal import *  # noqa: E402,F401,F403
