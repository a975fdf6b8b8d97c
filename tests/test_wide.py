"""Pins for the production-width catalog entries (catalog_wide.py,
round-9 verdict ask #5): the 100 TB knob settings — 64-bit xxhash64
SimHash, 16-plane multi-probe hyperplane LSH, 64-hash/16-band xxhash64
MinHash — execute on every test run with their self-consistency checks
ASSERTED, not just reported:

- banded Hamming mining at max_hamming < n_bands is lossless (equals
  the exact all-pairs scan on the capped subset);
- wide-ANN recall@1 on near-dup-geometry queries clears the theory
  floor (~0.98 expected; pinned above 0.90);
- wide-MinHash candidate recall of true Jaccard>=0.7 pairs clears the
  banding-theory floor 1-(1-J^4)^16 (~0.988 at the threshold; pinned
  above 0.95 — the synthetic corpus's true pairs are mostly exact
  dups, observed 1.0 at both SFs).
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_simhash_wide_banding_is_lossless(spark):
    from dnsflow_clickhouse_spark.queries.catalog_wide import (
        simhash_wide_neardups,
    )

    r = simhash_wide_neardups(spark, SF).collect()[0]
    assert r.lossless == 1
    assert r.n_pairs_banded_capped == r.n_pairs_exact_capped
    assert r.n_docs > 0


def test_ann_wide_recall_clears_theory_floor(spark):
    from dnsflow_clickhouse_spark.queries.catalog_wide import (
        embedding_ann_wide_recall,
    )

    r = embedding_ann_wide_recall(spark, SF).collect()[0]
    assert r.n_queries > 0
    # ~0.98 expected from plane-flip theory; 0.90 floor leaves room for
    # small-corpus variance at sf0.001 without masking a real break
    assert r.recall_ppm >= 900_000, r


def test_minhash_wide_recall_clears_banding_floor(spark):
    from dnsflow_clickhouse_spark.queries.catalog_wide import (
        minhash_wide_recall,
    )

    r = minhash_wide_recall(spark, SF).collect()[0]
    # 16 bands x 4 rows: P(candidate | J>=0.7) >= 1-(1-0.7^4)^16 ~ 0.988
    assert r.recall_ppm >= 950_000, r
    # the guard must not drop buckets on this corpus — and the drop
    # count is a report VALUE now, so a lossy run is visible per sweep
    assert r.n_hot_buckets == 0, r
    # candidate mining must stay output-bound, not quadratic: on the
    # sf0.001 corpus the candidate count is within a small multiple of
    # the true-pair count
    assert r.n_candidates <= max(50, 20 * max(r.n_true, 1)), r


def test_ivfpq_wide_recall_clears_floor(spark):
    from dnsflow_clickhouse_spark.queries.catalog_wide import (
        ivfpq_wide_recall,
    )

    r = ivfpq_wide_recall(spark, SF).collect()[0]
    assert r.n_queries > 0
    # near-dup geometry: the source's summed ADC lookups sit far below
    # any random corpus vector's, so recall@1 is ~1.0 (observed 1.0 at
    # sf0.01 and sf0.1); 0.95 floor leaves small-corpus headroom
    assert r.recall_ppm >= 950_000, r
