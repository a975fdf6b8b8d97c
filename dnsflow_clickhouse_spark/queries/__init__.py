"""Aggregated query registry: {name: (spark_callable, oracle_sql|None)}.

The registry is an ordered dict and the order is load-bearing: the
correctness driver verifies the first 50 entries per round.
``_PRIORITY`` pins the verified window — the smoke query first, then
the round-1 red/unchecked queries and one representative per operator
family (LLM-pipeline dedup/ANN/multimodal, corpus curation, profiling,
sketches) so every family has a hard driver row.  Rotation plan for
later rounds: the TPC-H tail (q9, q14-q21 — join shapes already
evidenced by 18 green TPC-H rows), embedding_knn/embedding_lsh_ann/
embedding_neardup_exact, multimodal_frame_index, per_user_event_sample,
prefix_jaccard_pairs and embedding_ivf_probe2 (these last two share
their oracle with in-window family representatives).
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
from dnsflow_clickhouse_spark.queries.catalog_mlops import MLOPS_REGISTRY as _MLOPS
from dnsflow_clickhouse_spark.queries.catalog_sketches import (
    SKETCH_REGISTRY as _SKETCHES,
)
from dnsflow_clickhouse_spark.queries.catalog_tpch2 import TPCH2_REGISTRY as _TPCH2
from dnsflow_clickhouse_spark.queries.catalog_tpch3 import TPCH3_REGISTRY as _TPCH3
from dnsflow_clickhouse_spark.queries.catalog_tpch4 import TPCH4_REGISTRY as _TPCH4

_MERGED = {
    **_BASE, **_DNS2, **_DNS3, **_DNS4, **_DNS5, **_TPCH2, **_TPCH3, **_TPCH4,
    **_MLOPS, **_CORPUS, **_CURATION, **_PROFILING, **_SKETCHES,
}

# First 50 = driver correctness window for this round.
_PRIORITY = [
    # smoke entry
    "q1_pricing_summary",
    # round-1 reds (HUGEINT oracle fix — must flip green)
    "doc_token_stats",
    "topk_rollup_chain",
    "ip_function_rollup",
    "range_frame_rolling",
    "null_semantics_report",
    "geo_region_rollup",
    "authority_slice_docs",
    "unpivot_daily_metrics",
    "session_stats",
    "doc_bpe_tokens",
    # latent HUGEINT fixes (never checked, same bug class)
    "q12_priority_class_counts",
    "curation_funnel",
    "temperature_lang_resample",
    "doc_length_histogram",
    "grouping_sets_events",
    # LLM-pipeline family (never checked in round 1)
    "incremental_dedup_flags",
    "minhash_band_buckets",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "neardup_components",
    "simhash_docs",
    "simhash_near_docs",
    "embedding_ivf_ann",
    "lang_id_confusion",
    "doc_fingerprints",
    # new operators since round 1 — need their first driver row;
    # embedding_knn / embedding_lsh_ann / embedding_neardup_exact and
    # multimodal_frame_index rotate into a later window (their
    # families are represented by ivf+neardup / multimodal_features
    # here); the two sketch queries take their window slots
    "cidr_membership_rollup",
    "hll_distinct_users",
    "cms_heavy_hitters",
    "embedding_neardup",
    "multimodal_features",
    # corpus curation family (never checked in round 1)
    "deterministic_shuffle_shards",
    "quality_feature_matrix",
    "chunk_documents",
    "repetition_report",
    "stratified_doc_sample",
    # leak-free splits + PII scrub — first driver row;
    # per_user_event_sample rotates to a later window (sampling family
    # is represented by stratified + weighted here)
    "group_split_leakproof",
    "pii_redaction_report",
    "tfidf_top_terms",
    "quality_quantile_gate",
    "decontamination_report",
    "props_json_rollup",
    "event_value_percentiles",
    "pack_sequences",
    # profiling family (never checked in round 1)
    "column_profile_events",
    "event_gini_concentration",
    "inverted_index_terms",
    "weighted_doc_sample",
    "fuzzy_near_titles",
    # TPC-H representative for the never-checked tpch4 batch
    "q11_value_concentration",
]

_missing = [n for n in _PRIORITY if n not in _MERGED]
assert not _missing, f"_PRIORITY names not in registry: {_missing}"
assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate names in _PRIORITY"

QUERY_REGISTRY = {n: _MERGED[n] for n in _PRIORITY}
QUERY_REGISTRY.update((n, q) for n, q in _MERGED.items() if n not in QUERY_REGISTRY)

__all__ = ["QUERY_REGISTRY"]
