"""Unit tests for the round-7 training-data operators on handcrafted
inputs with known answers; sf-scale hash parity is covered by the
DuckDB oracles in catalog_traindata."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_mad_outliers_known_values(spark):
    from dnsflow_clickhouse_spark.operators.profiling import mad_outliers

    df = spark.createDataFrame(
        [("a", v) for v in (1, 2, 3, 4, 100)], "source string, n long"
    )
    [r] = mad_outliers(df, "source", "n", k=3).collect()
    # sorted 1,2,3,4,100 -> lo-median 3; devs 0,1,1,2,97 -> MAD 1;
    # only 100 exceeds med + 3*MAD
    assert (r.n, r.med, r.mad, r.n_outliers) == (5, 3, 1, 1)


def test_ks_by_group_two_groups(spark):
    from dnsflow_clickhouse_spark.operators.profiling import ks_by_group

    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 2), ("b", 3), ("b", 3)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: r for r in ks_by_group(df, "g", "v").collect()}
    # CDFs in ppm at v=2: a = 3/3 = 1e6, rest = 1/3 = 333333 -> D 666667
    assert got["a"].ks_ppm == 666_667 and got["a"].at_v == 2
    assert got["b"].ks_ppm == 666_667 and got["b"].at_v == 2
    assert got["a"].n == 3


def _mask_expected(doc_id: int, n: int, rate: int = 15, seed: int = 0):
    m = 1_000_003
    flags = []
    for pos in range(n):
        y = ((doc_id % m) * 131071 + pos * 8191 + seed) % m
        flags.append(((y * y + y) % m) % 100 < rate)
    return flags


def test_mask_positions_matches_python_replay(spark):
    from dnsflow_clickhouse_spark.operators.text_analysis import (
        mask_positions_report,
    )

    text = " ".join(f"t{i}" for i in range(40))
    df = spark.createDataFrame(
        [(7, text), (8, ""), (9, "solo")], "doc_id long, text string"
    )
    got = {r.id: r for r in mask_positions_report(df).collect()}
    exp = _mask_expected(7, 40)
    assert got[7].n_toks == 40
    assert got[7].n_masked == sum(exp)
    assert got[7].first_mask == (exp.index(True) if any(exp) else -1)
    assert got[7].mask_ppm == sum(exp) * 1_000_000 // 40
    assert (got[8].n_toks, got[8].n_masked, got[8].first_mask) == (0, 0, -1)
    exp9 = _mask_expected(9, 1)
    assert got[9].n_masked == sum(exp9)


def test_bigram_novelty_shared_and_unique(spark):
    from dnsflow_clickhouse_spark.operators.text_analysis import bigram_novelty

    df = spark.createDataFrame(
        [(1, "x y z"), (2, "x y w"), (3, "q"), (4, "")],
        "doc_id long, text string",
    )
    got = {r.id: r for r in bigram_novelty(df).collect()}
    # "x y" shared by docs 1 and 2; "y z"/"y w" unique
    assert (got[1].n_grams, got[1].n_novel, got[1].novel_ppm) == (2, 1, 500_000)
    assert (got[2].n_grams, got[2].n_novel) == (2, 1)
    # single-token doc: the lone pseudo-gram is unique
    assert (got[3].n_grams, got[3].novel_ppm) == (1, 1_000_000)
    assert (got[4].n_grams, got[4].n_novel, got[4].novel_ppm) == (0, 0, 0)


def test_benford_profile_digits_and_filter(spark):
    from dnsflow_clickhouse_spark.operators.profiling import benford_profile

    df = spark.createDataFrame(
        [(1.0,), (19.4,), (25.0,), (2.5,), (0.5,)], "v double"
    )
    got = {r.digit: r for r in benford_profile(df, "v").collect()}
    # 0.5 filtered (< 1); digits: 1, 1, 2, 2
    assert set(got) == {1, 2}
    assert got[1].n == 2 and got[1].ppm == 500_000
    assert got[2].n == 2 and got[2].ppm == 500_000


def test_pareto_frontier_dominance(spark):
    from dnsflow_clickhouse_spark.operators.profiling import pareto_frontier

    rows = [(1, 1.0, 10), (2, 2.0, 5), (3, 2.0, 7), (4, 3.0, 3)]
    df = spark.createDataFrame(rows, "id long, x double, y long")
    got = sorted(r.id for r in pareto_frontier(df, "id", "x", "y").collect())
    # (2.0, 5) dominated by (2.0, 7); the rest are frontier
    assert got == [1, 3, 4]


def test_curriculum_buckets_partition_and_order(spark):
    from dnsflow_clickhouse_spark.operators.sampling import curriculum_buckets

    rows = [(i, float(i % 5), i % 3 + 1, 10) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, q double, ln long, w long")
    out = curriculum_buckets(df, "q", "ln", "w", n_q=5, n_len=3).collect()
    assert sum(r.n_docs for r in out) == 30  # every row in exactly one bucket
    phases = [r.phase for r in out]
    assert phases == sorted(phases)
    # highest-quality bucket trains first
    assert out[0].q_bucket == max(r.q_bucket for r in out)
    # value-cut buckets keep ties together: same q value never splits
    tagged = {}
    for r in out:
        tagged[(r.q_bucket, r.len_bucket)] = r.n_docs


def test_chi2_token_assoc_hand_counts(spark):
    from dnsflow_clickhouse_spark.operators.text_analysis import (
        chi2_token_assoc,
    )

    rows = [
        ("s1", 1, "cat"),
        ("s1", 2, "cat dog"),
        ("s2", 3, "dog"),
        ("s2", 4, "dog"),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = {
        (r.source, r.tok): r
        for r in chi2_token_assoc(
            df, "source", "doc_id", "text", min_df=1, top_k=5
        ).collect()
    }
    # token 'cat': a(s1)=2, b=0, c=0, d=2 -> chi2 = 4*(4-0)^2/(2*2*2*2) = 4
    r = got[("s1", "cat")]
    assert (r.a, r.n_tok) == (2, 2)
    assert r.chi2_micro == 4_000_000
    # token 'dog': s1 a=1,b=1,c=2,d=0 -> 4*(0-2)^2/(2*2*3*1) = 16/12 -> floor ppm
    r2 = got[("s1", "dog")]
    assert r2.chi2_micro == 16 * 1_000_000 // 12


def test_cutpoint_row_discrete_quantiles(spark):
    from dnsflow_clickhouse_spark.operators.sampling import _cutpoint_row

    df = spark.createDataFrame([(v,) for v in range(1, 11)], "v long")
    [r] = _cutpoint_row(df, "v", 5).collect()
    # ceil(j*10/5): 2,4,6,8 -> cut values 2,4,6,8
    assert (r.c1, r.c2, r.c3, r.c4) == (2, 4, 6, 8)


def _bm25_expected(docs, queries, k1n=6, k1d=5, bn=3, bd=4):
    # python replica of the exact integer chain in operators/retrieval.py
    import math

    toks = {i: t.split() for i, t in docs}
    lens = {i: len(v) for i, v in toks.items()}
    D, T = len(docs), sum(lens.values())
    out = {}
    for qid, terms in queries:
        scores = {}
        for term in set(terms):
            df = sum(1 for v in toks.values() if term in v)
            if df == 0:
                continue
            idf = math.floor(
                math.log2((2 * D - 2 * df + 1) / (2 * df + 1) + 1.0) * 1e6
                + 0.5
            )
            for i, v in toks.items():
                tf = v.count(term)
                if tf == 0:
                    continue
                tfn = (22 * T * tf * 1_000_000) // (
                    10 * T * tf + 3 * T + 9 * lens[i] * D
                )
                scores[i] = scores.get(i, 0) + (idf * tfn) // 1_000_000
        out[qid] = scores
    return out


def test_bm25_matches_python_replay(spark):
    from dnsflow_clickhouse_spark.operators.retrieval import bm25_topk

    docs = [(1, "a a b"), (2, "a c"), (3, "b b b c"), (4, "d d")]
    queries = [(1, ["a", "b"]), (2, ["c"]), (3, ["zzz"])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in bm25_topk(df, queries, "doc_id", "text", k=10).collect():
        got.setdefault(r.query_id, {})[r.doc_id] = r.score_micro
    exp = _bm25_expected(docs, queries)
    assert got[1] == exp[1]
    assert got[2] == exp[2]
    assert 3 not in got  # no doc contains the term -> no rows
    # ranking: score desc then doc_id
    rows = sorted(
        bm25_topk(df, queries, "doc_id", "text", k=10)
        .filter(F.col("query_id") == 1)
        .collect(),
        key=lambda r: r.rnk,
    )
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_winsorized_stats_clamps_tails(spark):
    from dnsflow_clickhouse_spark.operators.profiling import winsorized_stats

    df = spark.createDataFrame(
        [("a", v) for v in range(1, 21)], "g string, v long"
    )
    [r] = winsorized_stats(df, "g", "v", tail_pct=5).collect()
    # ceil(.05*20)=1 -> p_lo=1; ceil(.95*20)=19 -> p_hi=19; 20 clamps to 19
    assert (r.n, r.p_lo, r.p_hi) == (20, 1, 19)
    assert r.wmean_micro == (sum(range(1, 20)) + 19) * 1_000_000 // 20


def test_scrub_duplicate_spans_keep_first(spark):
    from dnsflow_clickhouse_spark.operators.dedup import scrub_duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = [
        (1, shared + " one two"),
        (2, "prefix words here " + shared),  # later doc: span scrubbed
        (3, "totally different content entirely"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.id: r
        for r in scrub_duplicate_spans(df, "doc_id", "text", 3, 4, 64).collect()
    }
    # doc 1 owns every shared fingerprint: untouched
    assert got[1].n_removed == 0
    assert got[1].clean_text == docs[0][1]
    # doc 2 loses the fingerprinted cores of the shared 8-token run
    # (guarantee: the run >= w+k-1=6 tokens shares >= 1 fingerprint)
    assert got[2].n_removed > 0
    removed_tokens = set(docs[1][1].split()) - set(got[2].clean_text.split())
    assert removed_tokens <= set(shared.split())  # only shared-span tokens go
    assert "prefix" in got[2].clean_text  # unique lead-in survives
    # untouched / empty docs pass through
    assert got[3].n_removed == 0 and got[3].clean_text == docs[2][1]
    assert (got[4].n_toks, got[4].n_removed, got[4].clean_text) == (0, 0, "")
