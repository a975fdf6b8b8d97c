"""Tests for cross-document duplicate-span detection (operators.spans)
and the SemDeDup-style semantic dedup decision composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.operators.spans import duplicate_span_stats


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _toks(n, offset=0):
    return " ".join(f"w{i + offset}" for i in range(n))


def test_shared_block_becomes_one_merged_span(spark):
    # docs 0 and 1 share tokens w0..w11 (12 tokens); doc 1 then diverges.
    # Five overlapping duplicated 8-gram positions (0..4) must merge into
    # ONE span of exactly 12 tokens, not 5 spans of 8.
    shared = _toks(12)
    rows = [
        (0, shared + " " + _toks(6, 100)),
        (1, shared + " " + _toks(6, 200)),
        (2, _toks(18, 300)),  # unique -> zeros
    ]
    out = {
        r.doc_id: r
        for r in duplicate_span_stats(_mk(spark, rows), "doc_id", "text", k=8).collect()
    }
    for d in (0, 1):
        assert out[d].n_spans == 1
        assert out[d].dup_tokens == 12
        assert out[d].dup_ppm == 12 * 1_000_000 // 18
    assert out[2].n_spans == 0 and out[2].dup_tokens == 0 and out[2].dup_ppm == 0


def test_disjoint_shared_blocks_stay_separate_spans(spark):
    # doc 0 shares its head with doc 1 and its tail with doc 2; the two
    # duplicated regions are separated by unique middle tokens, so doc 0
    # reports TWO spans.
    head, tail = _toks(8), _toks(8, 50)
    rows = [
        (0, head + " " + _toks(10, 100) + " " + tail),
        (1, head + " " + _toks(10, 200)),
        (2, _toks(10, 300) + " " + tail),
    ]
    out = {
        r.doc_id: r
        for r in duplicate_span_stats(_mk(spark, rows), "doc_id", "text", k=8).collect()
    }
    assert out[0].n_spans == 2 and out[0].dup_tokens == 16
    assert out[1].n_spans == 1 and out[1].dup_tokens == 8
    assert out[2].n_spans == 1 and out[2].dup_tokens == 8


def test_within_doc_repeats_do_not_count(spark):
    # the same 8-gram twice in ONE doc is within-doc repetition
    # (repetition_metrics' job), not a cross-doc duplicated span.
    block = _toks(8)
    rows = [(0, block + " " + block), (1, _toks(16, 500))]
    out = {
        r.doc_id: r
        for r in duplicate_span_stats(_mk(spark, rows), "doc_id", "text", k=8).collect()
    }
    assert out[0].n_spans == 0 and out[1].n_spans == 0


def test_short_and_empty_docs_report_zero(spark):
    rows = [(0, "a b c"), (1, ""), (2, "   ")]
    out = {
        r.doc_id: r
        for r in duplicate_span_stats(_mk(spark, rows), "doc_id", "text", k=8).collect()
    }
    assert out[0].n_toks == 3 and out[0].n_spans == 0 and out[0].dup_ppm == 0
    assert out[1].n_toks == 0 and out[1].dup_ppm == 0
    assert out[2].n_toks == 0 and out[2].dup_ppm == 0


def test_every_input_doc_appears_exactly_once(spark):
    rows = [(i, _toks(12, i * 40)) for i in range(6)]
    out = duplicate_span_stats(_mk(spark, rows), "doc_id", "text", k=8)
    ids = [r.doc_id for r in out.collect()]
    assert sorted(ids) == list(range(6))


def test_semdedup_composition_keeps_highest_quality(spark):
    """canonical_representatives over embedding near-dup pairs: the
    cluster survivor is the highest-quality member (ties lowest id)."""
    from dnsflow_clickhouse_spark.operators.dedup import embedding_near_dups
    from dnsflow_clickhouse_spark.operators.graph import canonical_representatives

    # vectors: 0,1,2 colinear (near-dups), 3 orthogonal
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0]),
        (2, [0.98, 0.02, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    e = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = spark.createDataFrame(
        [(0, 10), (1, 99), (2, 50), (3, 7)], ["doc_id", "n_chars"]
    )
    pairs = embedding_near_dups(e, "vec_id", "embedding", threshold=0.9, n_planes=0)
    reps = canonical_representatives(
        pairs, q, id_col="doc_id", quality_col="n_chars", num_partitions=2
    ).collect()
    assert len(reps) == 1
    r = reps[0]
    assert r.comp == 0 and r.keep_id == 1 and r.n_members == 3 and r.n_dropped == 2


def test_triangle_counts_exact(spark):
    from dnsflow_clickhouse_spark.operators.graph import triangle_counts

    # K4 on {0,1,2,3} (4 triangles) + a chain 4-5-6 (0 triangles),
    # edges given in mixed orientation and with a duplicate
    edges = [(0, 1), (0, 2), (0, 3), (2, 1), (1, 3), (3, 2), (4, 5), (6, 5), (1, 0)]
    e = spark.createDataFrame(edges, ["id_a", "id_b"])
    tris = sorted(map(tuple, triangle_counts(e).collect()))
    assert tris == [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]


def test_component_census_clique_vs_chain(spark):
    from dnsflow_clickhouse_spark.operators.graph import component_census

    # component A: triangle {0,1,2} (clique); component B: chain 10-11-12
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12)]
    e = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = {r.comp: r for r in component_census(e, num_partitions=2).collect()}
    a, b = out[0], out[10]
    assert (a.n_members, a.n_edges, a.n_triangles, a.is_clique) == (3, 3, 1, 1)
    assert (b.n_members, b.n_edges, b.n_triangles, b.is_clique) == (3, 2, 0, 0)


def test_hash_grams_path_matches_raw_path(spark):
    """The xxhash64 shuffle-key variant must produce identical span
    stats on collision-free data (collisions are ~n^2/2^65)."""
    rows = [
        (0, _toks(12) + " " + _toks(6, 100)),
        (1, _toks(12) + " " + _toks(6, 200)),
        (2, _toks(18, 300)),
    ]
    raw = duplicate_span_stats(_mk(spark, rows), "doc_id", "text", k=8)
    hashed = duplicate_span_stats(
        _mk(spark, rows), "doc_id", "text", k=8, hash_grams=True
    )
    assert sorted(map(tuple, raw.collect())) == sorted(map(tuple, hashed.collect()))
