"""Aggregated query registry: {name: (spark_callable, oracle_sql|None)}.

The registry is an ordered dict and the order is load-bearing: the
correctness driver verifies the first 50 entries per round.
``_PRIORITY`` pins the round-5 window — the smoke query first, then
EVERY query whose operator code changed this round (changed code
outranks stale-but-unchanged attestations): the six CC/prefix-kernel
queries (kernel-stage fusion + neighbor-min CC seeding), the PQ/IVF-PQ
/ k-means block (sampled driver-side training + Arrow ADC kernels),
and the five model-evaluation queries (decimal overflow widenings).
Next the ELEVEN queries that are brand-new this round
(containment_pairs, dsir_importance_weights, lang_token_jsd,
perceptron_train_trace, perceptron_source_score, collocation_pmi_topk,
embedding_spectrum_power, item_hits_authorities,
cluster_balanced_sample, ranking_ndcg_by_source, qps_anomaly_report) —
never-attested code outranks everything stale. Then the FOUR
quality-rounding-fix consumers not already in the window
(quality_feature_matrix, per_source_caps, curation_funnel,
doc_quality_score — the text_analysis._round6 change altered
round-boundary values; quality_quantile_gate, the fifth consumer, was
already windowed, and the whole catalog was re-verified at BOTH
sf0.01 and sf0.1 in-round). Then the round-2-stale rotation the
round-4 verdict asked for — 19 of the 43 fit; the 24 deferred to the
TOP of the round-6 window are the lowest-risk pure-SQL / map-only
shapes untouched since round 2 (q11_value_concentration,
q12_priority_class_counts, range_frame_rolling, null_semantics_report,
unpivot_daily_metrics, session_stats, doc_length_histogram,
event_value_percentiles, grouping_sets_events, doc_token_stats,
weighted_doc_sample, fuzzy_near_titles, doc_bpe_tokens,
props_json_rollup, chunk_documents, pack_sequences,
stratified_doc_sample, temperature_lang_resample, doc_fingerprints,
repetition_report, topk_rollup_chain, ip_function_rollup,
authority_slice_docs, simhash_docs). One changed-code query did not
fit: event_cooccurrence (a decimal overflow widening, value-identical
— hash-verified against its oracle at sf0.01 in-round); it joins the
round-6 head alongside the deferred twenty-four.
"""

from dnsflow_clickhouse_spark.queries.catalog import QUERY_REGISTRY as _BASE
from dnsflow_clickhouse_spark.queries.catalog_dns2 import DNS2_REGISTRY as _DNS2
from dnsflow_clickhouse_spark.queries.catalog_dns3 import DNS3_REGISTRY as _DNS3
from dnsflow_clickhouse_spark.queries.catalog_dns4 import DNS4_REGISTRY as _DNS4
from dnsflow_clickhouse_spark.queries.catalog_dns5 import DNS5_REGISTRY as _DNS5
from dnsflow_clickhouse_spark.queries.catalog_corpus import CORPUS_REGISTRY as _CORPUS
from dnsflow_clickhouse_spark.queries.catalog_curation import (
    CURATION_REGISTRY as _CURATION,
)
from dnsflow_clickhouse_spark.queries.catalog_profiling import (
    PROFILING_REGISTRY as _PROFILING,
)
from dnsflow_clickhouse_spark.queries.catalog_eval import EVAL_REGISTRY as _EVAL
from dnsflow_clickhouse_spark.queries.catalog_mlops import MLOPS_REGISTRY as _MLOPS
from dnsflow_clickhouse_spark.queries.catalog_sketches import (
    SKETCH_REGISTRY as _SKETCHES,
)
from dnsflow_clickhouse_spark.queries.catalog_tokenizer import (
    TOKENIZER_REGISTRY as _TOKENIZER,
)
from dnsflow_clickhouse_spark.queries.catalog_tpch2 import TPCH2_REGISTRY as _TPCH2
from dnsflow_clickhouse_spark.queries.catalog_tpch3 import TPCH3_REGISTRY as _TPCH3
from dnsflow_clickhouse_spark.queries.catalog_tpch4 import TPCH4_REGISTRY as _TPCH4

_PARTS = [
    _BASE, _DNS2, _DNS3, _DNS4, _DNS5, _TPCH2, _TPCH3, _TPCH4,
    _MLOPS, _CORPUS, _CURATION, _PROFILING, _SKETCHES, _TOKENIZER, _EVAL,
]
_MERGED: dict = {}
for _part in _PARTS:
    _dups = set(_part) & set(_MERGED)
    # a duplicate name would silently SHADOW the earlier query (caught
    # live in round 4: a new corpus entry vanished under a curation
    # entry of the same name and the oracle gate verified the wrong
    # query) — fail the import instead; a real raise (not assert) so the
    # guard survives `python -O`
    if _dups:
        raise ValueError(
            f"duplicate query names across catalogs: {sorted(_dups)}"
        )
    _MERGED.update(_part)

# First 50 = driver correctness window for this round (round 5).
_PRIORITY = [
    # smoke entry
    "q1_pricing_summary",
    # --- queries whose kernel code changed after the r4 window ran
    # (the prefix-filtered Jaccard kernel swap, commits 0144507/422b57f)
    # or changes THIS round (kernel-stage fusion, GEMM sizing) — the
    # repo's discipline: changed code gets a same-round driver row ---
    "neardup_components",
    "dedup_canonical_keep",
    "prefix_jaccard_pairs",
    "neardup_component_census",
    "component_aware_shards",
    "semdedup_keep",
    # --- round-5 changed code: sampled k-means/PQ training + Arrow ADC
    # kernels (similarity.py) and decimal widenings (evaluation.py) ---
    "embedding_pq_ann",
    "embedding_ivfpq_ann",
    "kmeans_cluster_report",
    "score_auc_by_source",
    "score_calibration_bins",
    "feature_correlation_report",
    "ols_tokens_per_char",
    "value_drift_psi",
    "embedding_rp_components",  # rides the changed CC loop (graph.py)
    # --- brand-new this round: never driver-attested ---
    "containment_pairs",
    "dsir_importance_weights",
    "lang_token_jsd",
    "perceptron_train_trace",
    "perceptron_source_score",
    "collocation_pmi_topk",
    "embedding_spectrum_power",
    "item_hits_authorities",
    "cluster_balanced_sample",
    "ranking_ndcg_by_source",
    "qps_anomaly_report",
    # --- quality-rounding fix (text_analysis._round6): every consumer
    # of the scored quality changed value on round-boundary docs; the
    # two windowed ones (doc_quality_score, quality_quantile_gate) are
    # above, these three re-enter for same-round attestation ---
    "quality_feature_matrix",
    "per_source_caps",
    "curation_funnel",
    "doc_quality_score",
    # --- round-2-stale rotation (31 of 43; the 12 deferred pure-SQL
    # shapes lead the round-6 window, see module docstring) ---
    "cidr_membership_rollup",
    "geo_region_rollup",
    "minhash_band_buckets",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_docs",
    "embedding_ivf_ann",
    "lang_id_confusion",
    "multimodal_features",
    "tfidf_top_terms",
    "quality_quantile_gate",
    "decontamination_report",
    "group_split_leakproof",
    "pii_redaction_report",
    "column_profile_events",
    "event_gini_concentration",
    "inverted_index_terms",
    "hll_distinct_users",
    "cms_heavy_hitters",
]

_missing = [n for n in _PRIORITY if n not in _MERGED]
if _missing:
    raise ValueError(f"_PRIORITY names not in registry: {_missing}")
if len(_PRIORITY) != len(set(_PRIORITY)):
    raise ValueError("duplicate names in _PRIORITY")

QUERY_REGISTRY = {n: _MERGED[n] for n in _PRIORITY}
QUERY_REGISTRY.update((n, q) for n, q in _MERGED.items() if n not in QUERY_REGISTRY)

__all__ = ["QUERY_REGISTRY"]
