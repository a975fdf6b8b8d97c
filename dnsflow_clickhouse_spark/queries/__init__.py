"""Aggregated query registry: {name: (spark_callable, oracle_sql|None)}.

The registry is an ordered dict and the order is load-bearing: the
correctness driver verifies the first 50 entries per round.

STANDING ROTATION POLICY (r6 verdict ask #1, adopted round 7): each
round, ``_PRIORITY`` is rebuilt as
  1. the smoke query,
  2. queries whose CODE changed this round (semantic changes first),
  3. queries brand-new this round (never attested),
  4. everything else OLDEST-GREEN-FIRST (latest green round ascending,
     computed from the union of CORRECTNESS_r0*.json; tools/
     rotate_window.py prints the recommended list),
truncated to 50. Changed-code queries that do not fit the window get a
same-round ``tools/verify_oracle.py --json SWEEP_VERIFY_r{N}.json``
artifact committed instead — the judge reads it in place of a driver
row. With a 166-query registry this bounds attestation staleness at
ceil(166/50) ~ 4 rounds worst-case and empties any older backlog first.

ROUND-7 WINDOW: after the smoke query, the 38 queries whose latest
green row is round 3 (the verdict's staleness list — qps_trend,
flow_report_topk, range_join_tiers, wide_enrichment_report, the
embedding-ANN family, nine TPC-H shapes, ...), then the EIGHT queries
brand-new this round (catalog_traindata.py: mad_outlier_docs,
ks_drift_by_source, masked_lm_samples, curriculum_schedule,
bigram_novelty_report, benford_order_totals, pareto_quality_frontier,
chi2_token_source), then three round-7 changed-code queries whose
kernels moved to the pinned floor(x*1e6+0.5) cosine chain and are not
already in the stale set (embedding_mmr_rerank, ann_recall_report,
ann_rrf_fusion). The remaining round-7 changed-code queries (the
quality-scan translate() rewrite's 13 consumers, the perceptron
literal-map key widening) are attested in SWEEP_VERIFY_r07.json, as is
the late second batch (bm25_retrieval_topk, truncated_knn_recall,
winsorized_length_stats — added after the window was pinned; they head
the r8 window as never-driver-attested).
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
from dnsflow_clickhouse_spark.queries.catalog_traindata import (
    TRAINDATA_REGISTRY as _TRAINDATA,
)

_PARTS = [
    _BASE, _DNS2, _DNS3, _DNS4, _DNS5, _TPCH2, _TPCH3, _TPCH4,
    _MLOPS, _CORPUS, _CURATION, _PROFILING, _SKETCHES, _TOKENIZER, _EVAL,
    _TRAINDATA,
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

# First 50 = driver correctness window for this round (round 7).
_PRIORITY = [
    # smoke entry
    "q1_pricing_summary",
    # --- the 38 round-3-stale queries (oldest-green-first policy) ---
    "asof_last_click",
    "authority_domain_rollup",
    "clients_rollup_sets",
    "cohort_retention",
    "conversion_funnel",
    "dedup_exact_docs",
    "dedup_keep_first_events",
    "deterministic_shuffle_shards",
    "distinct_agg_users",
    "embedding_ivf_probe2",
    "embedding_knn",
    "embedding_lsh_ann",
    "embedding_lsh_multiprobe",
    "embedding_neardup",
    "embedding_neardup_exact",
    "flow_report_topk",
    "grouped_topk_users",
    "hourly_gapfill",
    "incremental_dedup_flags",
    "incremental_report_merge",
    "item_pagerank",
    "multimodal_frame_index",
    "normalized_dedup_docs",
    "per_user_event_sample",
    "q16_supplier_variety",
    "q18_big_orders",
    "q20_stockpile_suppliers",
    "q21_sole_returner",
    "q9_product_profit",
    "qps_per_client",
    "qps_trend",
    "range_join_tiers",
    "response_code_ratio",
    "running_value_per_user",
    "storm_span_overlap",
    "trend_rollup_daily",
    "user_tag_profiles",
    "wide_enrichment_report",
    # --- brand-new round-7 queries (never attested) ---
    "mad_outlier_docs",
    "ks_drift_by_source",
    "masked_lm_samples",
    "curriculum_schedule",
    "bigram_novelty_report",
    "benford_order_totals",
    "pareto_quality_frontier",
    "chi2_token_source",
    # --- round-7 changed-code (pinned _cos6 rounding chain) not
    # already covered by the stale set ---
    "embedding_mmr_rerank",
    "ann_recall_report",
    "ann_rrf_fusion",
]

_missing = [n for n in _PRIORITY if n not in _MERGED]
if _missing:
    raise ValueError(f"_PRIORITY names not in registry: {_missing}")
if len(_PRIORITY) != len(set(_PRIORITY)):
    raise ValueError("duplicate names in _PRIORITY")

QUERY_REGISTRY = {n: _MERGED[n] for n in _PRIORITY}
QUERY_REGISTRY.update((n, q) for n, q in _MERGED.items() if n not in QUERY_REGISTRY)

__all__ = ["QUERY_REGISTRY"]
