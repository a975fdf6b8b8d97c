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
row. With a 204-query registry this bounds attestation staleness at
ceil(204/50) = 5 rounds worst-case and empties any older backlog first.

ROUND-8 WINDOW: after the smoke query, the TWENTY-FOUR queries brand-new this
round (catalog_traindata2.py: segment_dedup_docs, symspell_token_pairs,
lpa_communities, lexical_rerank_pairs, split_contamination_report,
dedup_recall_report, quantile_calibrated_lengths,
weighted_median_lengths, ewma_event_rates, oov_rate_by_source,
event_transition_matrix, attribution_u_shaped, conversion_lag_report,
vocab_coverage_report, shard_balance_report, user_sequence_fingerprints,
abc_customer_classes, temporal_split_report, join_skew_profile,
source_overlap_matrix, distribution_match_sample, borda_quality_docs,
budget_selection_report, minhash_estimate_report), then
ALL SIX round-7 queries that have never received a driver row —
bm25_retrieval_topk, truncated_knn_recall, winsorized_length_stats
(the late second batch, added after the r7 window was pinned) AND
hard_negative_mining, label_centroid_margins, span_scrubbed_docs
(shipped round 7 but attested only in SWEEP_VERIFY_r07.json; the r7
docstring omitted these three — r7 ADVICE low #4, fixed here) — then
the oldest-green-first fill: the round-4-latest cohort (bloom/bpe/
sketch/tpch shapes through source_token_entropy; the fourteen r4-stale
rows displaced by batches 2-4 — q2_min_cost_supplier,
q4_priority_semi, q7_volume_shipping, q8_market_share,
quantile_sketch_values, rare_token_report, set_ops_users,
snapshot_diff_report, source_token_entropy, user_report_pipeline,
user_state_history, cidr_membership_rollup, cluster_balanced_sample,
cms_heavy_hitters —
head the r9 fill), which the builder
pre-verified green at sf0.01 in round 7 (SWEEP_VERIFY_r07.json) so no
latent breakage rides into this window.
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
from dnsflow_clickhouse_spark.queries.catalog_traindata2 import (
    TRAINDATA2_REGISTRY as _TRAINDATA2,
)

_PARTS = [
    _BASE, _DNS2, _DNS3, _DNS4, _DNS5, _TPCH2, _TPCH3, _TPCH4,
    _MLOPS, _CORPUS, _CURATION, _PROFILING, _SKETCHES, _TOKENIZER, _EVAL,
    _TRAINDATA, _TRAINDATA2,
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

# First 50 = driver correctness window for this round (round 8).
_PRIORITY = [
    # smoke entry
    "q1_pricing_summary",
    # --- brand-new round-8 queries (never attested; catalog_traindata2) ---
    "segment_dedup_docs",
    "symspell_token_pairs",
    "lpa_communities",
    "lexical_rerank_pairs",
    "split_contamination_report",
    "dedup_recall_report",
    "quantile_calibrated_lengths",
    "weighted_median_lengths",
    "ewma_event_rates",
    "oov_rate_by_source",
    "event_transition_matrix",
    "attribution_u_shaped",
    "conversion_lag_report",
    "vocab_coverage_report",
    "shard_balance_report",
    "user_sequence_fingerprints",
    "abc_customer_classes",
    "temporal_split_report",
    "join_skew_profile",
    "source_overlap_matrix",
    "distribution_match_sample",
    "borda_quality_docs",
    "budget_selection_report",
    "minhash_estimate_report",
    # --- ALL round-7 queries without a driver row (SWEEP_VERIFY_r07
    # was their only attestation) ---
    "bm25_retrieval_topk",
    "hard_negative_mining",
    "label_centroid_margins",
    "span_scrubbed_docs",
    "truncated_knn_recall",
    "winsorized_length_stats",
    # --- oldest-green-first fill: the round-4-latest cohort ---
    "bloom_membership_flags",
    "boilerplate_grams",
    "bpe_merge_training",
    "bpe_vocab_report",
    "cube_day_type",
    "data_quality_expectations",
    "day_pivot_counts",
    "doc_lm_score",
    "duplicate_span_report",
    "embedding_dim_stats",
    "embedding_l2_knn",
    "es_weighted_source_sample",
    "image_dhash_neardups",
    "kmv_corpus_overlap",
    "mixture_budget_report",
    "multiset_ops_events",
    "q10_returned_items",
    "q13_order_distribution",
    "q22_idle_customers",
]

_missing = [n for n in _PRIORITY if n not in _MERGED]
if _missing:
    raise ValueError(f"_PRIORITY names not in registry: {_missing}")
if len(_PRIORITY) != len(set(_PRIORITY)):
    raise ValueError("duplicate names in _PRIORITY")

QUERY_REGISTRY = {n: _MERGED[n] for n in _PRIORITY}
QUERY_REGISTRY.update((n, q) for n, q in _MERGED.items() if n not in QUERY_REGISTRY)

__all__ = ["QUERY_REGISTRY"]
