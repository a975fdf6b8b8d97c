"""Aggregated query registry: {name: (spark_callable, oracle_sql|None)}.

The registry is an ordered dict and the order is load-bearing: the
correctness driver verifies the first 50 entries per round.
``_PRIORITY`` pins the round-4 window — the smoke query first, then the
28 catalog queries that have NEVER had a driver row (every round-3
addition past last round's window: the PQ/IVFPQ/L2/RRF/RP ANN block,
kmeans, KMV/Bloom/quantile sketches, BPE training, spans, census,
SemDeDup, SCD2 history, expectations, per-source caps, image dHash, and
the four model-evaluation ops), then the three queries NEW this round
(the wired LM scoring pair and the A14 user_report analogue — the last
§2 report family without a driver row), then the 15 stalest entries
(round-1 greens never re-attested: the TPC-H q2-q8/q10/q13/q17/q22
block and the set-ops/pivot/cube batch), then three round-2 dedup
greens whose shared text-path code has churned since. After this round
every one of the 140 registry entries has at least one driver-attested
green row, and nothing in the window is older than round 2.
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
    # query) — fail the import instead
    assert not _dups, f"duplicate query names across catalogs: {sorted(_dups)}"
    _MERGED.update(_part)

# First 50 = driver correctness window for this round (round 4).
_PRIORITY = [
    # smoke entry
    "q1_pricing_summary",
    # --- 28 never-driver-checked queries (highest verification value) ---
    # ANN / clustering block
    "embedding_pq_ann",
    "embedding_ivfpq_ann",
    "embedding_l2_knn",
    "ann_rrf_fusion",
    "embedding_rp_components",
    "embedding_dim_stats",
    "kmeans_cluster_report",
    "ann_recall_report",
    # sketches
    "kmv_corpus_overlap",
    "bloom_membership_flags",
    "quantile_sketch_values",
    # tokenizer
    "bpe_merge_training",
    "bpe_vocab_report",
    # text / dedup tails
    "duplicate_span_report",
    "boilerplate_grams",
    "rare_token_report",
    "neardup_component_census",
    "semdedup_keep",
    "image_dhash_neardups",
    # curation tails
    "mixture_budget_report",
    "per_source_caps",
    "snapshot_diff_report",
    "user_state_history",
    "data_quality_expectations",
    # model evaluation
    "score_auc_by_source",
    "score_calibration_bins",
    "feature_correlation_report",
    "ols_tokens_per_char",
    # --- NEW this round: wired LM scoring, the A14 analogue, A-ES
    # weighted sampling, PSI drift ---
    "doc_lm_score",
    "source_token_entropy",
    "user_report_pipeline",
    "es_weighted_source_sample",
    "value_drift_psi",
    "component_aware_shards",
    # --- stalest greens (round-1 rows, never re-attested) ---
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_priority_semi",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q13_order_distribution",
    "q17_small_quantity",
    "q22_idle_customers",
    "day_pivot_counts",
    "set_ops_users",
    "cube_day_type",
    "multiset_ops_events",
]

_missing = [n for n in _PRIORITY if n not in _MERGED]
assert not _missing, f"_PRIORITY names not in registry: {_missing}"
assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate names in _PRIORITY"

QUERY_REGISTRY = {n: _MERGED[n] for n in _PRIORITY}
QUERY_REGISTRY.update((n, q) for n, q in _MERGED.items() if n not in QUERY_REGISTRY)

__all__ = ["QUERY_REGISTRY"]
