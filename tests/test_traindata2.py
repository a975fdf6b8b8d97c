"""Unit tests for the round-8 training-data operators on handcrafted
inputs with known answers; sf-scale hash parity is covered by the
DuckDB oracles in catalog_traindata2."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_segment_dedup_keep_first(spark):
    from dnsflow_clickhouse_spark.operators.dedup import segment_dedup_keep_first

    # segment length 2; doc 1 owns "a b" and "c d"; doc 2 repeats "a b"
    # (removed) then has fresh "e f"; doc 3 repeats "c d" and repeats
    # its own first segment "x y" (intra-doc duplicate, keep-first)
    rows = [
        (1, "a b c d"),
        (2, "a b e f"),
        (3, "x y c d x y"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in segment_dedup_keep_first(df, "doc_id", "text", 2).collect()
    }
    assert (got[1].n_segments, got[1].n_removed, got[1].clean_text) == (2, 0, "a b c d")
    assert (got[2].n_segments, got[2].n_removed, got[2].clean_text) == (2, 1, "e f")
    assert (got[3].n_segments, got[3].n_removed, got[3].clean_text) == (3, 2, "x y")
    assert (got[4].n_segments, got[4].n_removed, got[4].clean_text) == (0, 0, "")


def test_segment_dedup_partial_tail_segment(spark):
    from dnsflow_clickhouse_spark.operators.dedup import segment_dedup_keep_first

    # 3 tokens at seg=2 -> segments "a b" and the partial "c"; a
    # later doc consisting only of "c" duplicates the partial segment
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r
        for r in segment_dedup_keep_first(df, "doc_id", "text", 2).collect()
    }
    assert (got[1].n_segments, got[1].n_removed) == (2, 0)
    assert (got[2].n_segments, got[2].n_removed, got[2].clean_text) == (1, 1, "")


def test_symspell_pairs_exact_distances(spark):
    from dnsflow_clickhouse_spark.operators.dedup import symspell_candidate_pairs

    vocab = spark.createDataFrame(
        [("cat", 10), ("cut", 5), ("cart", 3), ("dog", 7), ("banana", 1)],
        "term string, freq long",
    )
    got = {
        (r.term_a, r.term_b): (r.edit_dist, r.freq_a, r.freq_b)
        for r in symspell_candidate_pairs(vocab, "term", "freq", 2).collect()
    }
    # cat-cut (sub, 1), cat-cart (ins, 1), cart-cut (2); dog/banana
    # pair with nothing
    assert got[("cat", "cut")] == (1, 10, 5)
    assert got[("cart", "cat")] == (1, 3, 10)
    assert got[("cart", "cut")] == (2, 3, 5)
    assert len(got) == 3


def test_symspell_guarantee_vs_bruteforce(spark):
    """SymSpell depth-2 neighborhoods must catch EVERY pair at
    Levenshtein distance <= 2 (the deletion-neighborhood theorem)."""
    import itertools

    from dnsflow_clickhouse_spark.operators.dedup import symspell_candidate_pairs

    words = ["join", "hash", "fast", "part", "sort", "spark", "row", "slow", "a", "agg", "big"]

    def ed(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    truth = {
        tuple(sorted(p)) for p in itertools.combinations(words, 2) if ed(*p) <= 2
    }
    vocab = spark.createDataFrame([(w, 1) for w in words], "term string, freq long")
    got = {
        tuple(sorted((r.term_a, r.term_b)))
        for r in symspell_candidate_pairs(vocab, "term", "freq", 2).collect()
    }
    assert got == truth


def test_dedup_candidate_quality_counts(spark):
    from dnsflow_clickhouse_spark.operators.dedup import dedup_candidate_quality

    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame(
        [(1, 2), (4, 5), (6, 7)], "id_a long, id_b long"
    )
    [r] = dedup_candidate_quality(cand, truth).collect()
    assert (r.n_candidates, r.n_truth, r.n_common) == (3, 3, 2)
    assert r.precision_ppm == 666_666 and r.recall_ppm == 666_666


def test_label_propagation_two_communities(spark):
    from dnsflow_clickhouse_spark.operators.graph import label_propagation

    # two triangles {1,2,3} and {10,11,12} joined by one bridge 3-10:
    # CC would merge them; LPA keeps two communities because the
    # bridge label is outvoted
    edges = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.label for r in label_propagation(df, rounds=3).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12]
    assert got[10] != got[1]


def test_label_propagation_rejects_zero_rounds(spark):
    import pytest

    from dnsflow_clickhouse_spark.operators.graph import label_propagation

    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="rounds"):
        label_propagation(df, rounds=0)


def test_lexical_cosine_rerank_exact(spark):
    from dnsflow_clickhouse_spark.operators.retrieval import lexical_cosine_rerank

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "c c")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    got = {(r.id_a, r.id_b): r for r in lexical_cosine_rerank(docs, pairs).collect()}
    # doc1 tf {a:2,b:1} (norm² 5), doc2 {a:1,b:1} (norm² 2): dot 3,
    # cos² = 9/10 -> 900000000 ppb; doc3 {c:2} shares nothing
    r12 = got[(1, 2)]
    assert (r12.dot, r12.norm_sq_a, r12.norm_sq_b, r12.cos_sq_ppb) == (3, 5, 2, 900_000_000)
    r13 = got[(1, 3)]
    assert (r13.dot, r13.cos_sq_ppb) == (0, 0)


def test_weighted_median_by_group(spark):
    from dnsflow_clickhouse_spark.operators.profiling import (
        weighted_median_by_group,
    )

    # values 1,2,3 with weights 1,1,10 -> weighted median 3 (the heavy
    # value), unweighted median would be 2
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("a", 3, 10), ("b", 5, 2), ("b", 7, 2)],
        "g string, v long, w long",
    )
    got = {r.g: r for r in weighted_median_by_group(df, "g", "v", "w").collect()}
    assert (got["a"].w_median, got["a"].total_weight) == (3, 12)
    # even split: lo-median convention takes the smaller value
    assert (got["b"].w_median, got["b"].total_weight) == (5, 4)


def test_ewma_smooth_dyadic_weights(spark):
    from datetime import datetime

    from dnsflow_clickhouse_spark.operators.profiling import ewma_smooth

    # hourly buckets: 3 events at h0, 1 at h1, gap at h2, 2 at h3
    rows = (
        [("x", datetime(2024, 1, 1, 0, 10))] * 3
        + [("x", datetime(2024, 1, 1, 1, 20))]
        + [("x", datetime(2024, 1, 1, 3, 30))] * 2
    )
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {
        r.bucket - 473352: (r.cnt, r.ewma_scaled, r.ewma_milli)
        for r in ewma_smooth(df, "k", "ts", 3600, window_buckets=8).collect()
    }
    # weights 128,64,32,16,... for ages 0,1,2,3
    assert got[0] == (3, 3 * 128, 3 * 128 * 1000 // 255)
    assert got[1] == (1, 3 * 64 + 1 * 128, (3 * 64 + 128) * 1000 // 255)
    # h2 has no events -> no output row, but h3 still sees the gap:
    # 3*16 (age 3) + 1*32 (age 2) + 0 (gap) + 2*128 (age 0)
    assert 2 not in got
    assert got[3] == (2, 3 * 16 + 1 * 32 + 2 * 128, (3 * 16 + 32 + 256) * 1000 // 255)


def test_quantile_match_calibrate_maps_to_reference(spark):
    from dnsflow_clickhouse_spark.operators.profiling import (
        quantile_match_calibrate,
    )

    # ref group: values 10,20,30,40 -> cum ppm 250k/500k/750k/1e6;
    # group b: values 1,2 -> pct 500k/1e6 -> calibrated 20/40
    rows = [("r", 1, 10), ("r", 2, 20), ("r", 3, 30), ("r", 4, 40),
            ("b", 5, 1), ("b", 6, 2)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = {r.id: r.calibrated for r in
           quantile_match_calibrate(df, "g", "v", "id", "r").collect()}
    assert got[5] == 20 and got[6] == 40
    # the reference maps to itself exactly
    assert [got[i] for i in (1, 2, 3, 4)] == [10, 20, 30, 40]


def test_oov_rate_report_top_vocab(spark):
    from dnsflow_clickhouse_spark.operators.text_analysis import oov_rate_report

    # vocab_size=2 -> vocabulary {a, b} (freq 3, 2); c and d are OOV
    rows = [("s1", "a a b c"), ("s2", "a b d d")]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r.source: r for r in oov_rate_report(df, ["source"], "text", 2).collect()}
    assert (got["s1"].n_tokens, got["s1"].n_oov, got["s1"].oov_ppm) == (4, 1, 250_000)
    assert (got["s2"].n_tokens, got["s2"].n_oov, got["s2"].oov_ppm) == (4, 2, 500_000)


def test_transition_matrix_known(spark):
    from datetime import datetime

    from dnsflow_clickhouse_spark.operators.sessions import transition_matrix

    t = datetime(2024, 1, 1)
    rows = [
        (1, "a", datetime(2024, 1, 1, 0), 1),
        (1, "b", datetime(2024, 1, 1, 1), 2),
        (1, "a", datetime(2024, 1, 1, 2), 3),
        (2, "a", datetime(2024, 1, 1, 0), 4),
        (2, "b", datetime(2024, 1, 1, 1), 5),
    ]
    df = spark.createDataFrame(rows, "u long, s string, ts timestamp, i long")
    got = {
        (r.prev_state, r.next_state): (r.n, r.prob_ppm)
        for r in transition_matrix(df, "u", "s", "ts", "i").collect()
    }
    # a->b twice, b->a once; P(b|a)=1.0, P(a|b)=1.0 within rows of a/b
    assert got[("a", "b")] == (2, 1_000_000)
    assert got[("b", "a")] == (1, 1_000_000)
    assert len(got) == 2


def test_transition_matrix_tiebreak_total_order(spark):
    from datetime import datetime

    from dnsflow_clickhouse_spark.operators.sessions import transition_matrix

    # identical timestamps: the tiebreak column decides the sequence
    t = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, "x", t, 2), (1, "y", t, 1)], "u long, s string, ts timestamp, i long"
    )
    got = {(r.prev_state, r.next_state) for r in
           transition_matrix(df, "u", "s", "ts", "i").collect()}
    assert got == {("y", "x")}


def test_u_shaped_attribution_sums_to_unit(spark):
    from datetime import datetime

    from dnsflow_clickhouse_spark.operators.sessions import u_shaped_attribution

    # user 1: 5 touches a,b,c,d,e -> 400k a, 400k e, interiors share
    # 200k: 66666 each + remainder 2 to the EARLIEST two (b,c)
    rows = [
        (1, ch, datetime(2024, 1, 1, h), h)
        for h, ch in enumerate(["a", "b", "c", "d", "e"])
    ] + [(2, "a", datetime(2024, 1, 2), 1)]  # single-touch journey
    df = spark.createDataFrame(rows, "u long, ch string, ts timestamp, i long")
    got = {r.channel: r.credit_ppm for r in
           u_shaped_attribution(df, "u", "ch", "ts", "i").collect()}
    assert got["a"] == 400_000 + 1_000_000
    assert got["b"] == 66_667 and got["c"] == 66_667 and got["d"] == 66_666
    assert got["e"] == 400_000
    # per-key credits are exactly 1e6 each
    assert sum(got.values()) == 2_000_000


def test_u_shaped_two_touch_journey(spark):
    from datetime import datetime

    from dnsflow_clickhouse_spark.operators.sessions import u_shaped_attribution

    df = spark.createDataFrame(
        [(1, "a", datetime(2024, 1, 1), 1), (1, "b", datetime(2024, 1, 2), 2)],
        "u long, ch string, ts timestamp, i long",
    )
    got = {r.channel: r.credit_ppm for r in
           u_shaped_attribution(df, "u", "ch", "ts", "i").collect()}
    assert got == {"a": 500_000, "b": 500_000}


def test_conversion_lag_stats_known(spark):
    from datetime import datetime

    from dnsflow_clickhouse_spark.operators.sessions import conversion_lag_stats

    rows = [
        # user 1: signup then purchase 10s later
        (1, "signup", datetime(2024, 1, 1, 0, 0, 0)),
        (1, "purchase", datetime(2024, 1, 1, 0, 0, 10)),
        # user 2: 100s lag (also a later purchase that must not count)
        (2, "signup", datetime(2024, 1, 1, 0, 0, 0)),
        (2, "purchase", datetime(2024, 1, 1, 0, 1, 40)),
        (2, "purchase", datetime(2024, 1, 1, 1, 0, 0)),
        # user 3: purchase BEFORE signup -> excluded
        (3, "purchase", datetime(2024, 1, 1, 0, 0, 0)),
        (3, "signup", datetime(2024, 1, 1, 0, 1, 0)),
        # user 4: signup only -> excluded
        (4, "signup", datetime(2024, 1, 1)),
    ]
    df = spark.createDataFrame(rows, "u long, s string, ts timestamp")
    [r] = conversion_lag_stats(df, "u", "s", "ts", "signup", "purchase").collect()
    assert (r.n_converted, r.median_lag_s, r.p90_lag_s) == (2, 10, 100)


def test_vocab_coverage_curve_known(spark):
    from dnsflow_clickhouse_spark.operators.text_analysis import (
        vocab_coverage_curve,
    )

    # freqs: a=4, b=3, c=2, d=1 (total 10)
    df = spark.createDataFrame(
        [("a a a a b b",), ("b c c d",)], "text string"
    )
    got = {r.k: (r.covered_tokens, r.coverage_ppm) for r in
           vocab_coverage_curve(df, "text", ks=[1, 2, 3, 4]).collect()}
    assert got[1] == (4, 400_000)
    assert got[2] == (7, 700_000)
    assert got[3] == (9, 900_000)
    assert got[4] == (10, 1_000_000)


def test_shard_balance_mass_conserved(spark):
    from dnsflow_clickhouse_spark.operators.sampling import shard_balance

    df = spark.createDataFrame(
        [(i, 10 + i) for i in range(200)], "id long, w long"
    )
    rows = shard_balance(df, "id", 4, "w").collect()
    assert [r.shard for r in rows] == sorted({r.shard for r in rows})
    assert sum(r.n_rows for r in rows) == 200
    assert sum(r.mass for r in rows) == sum(10 + i for i in range(200))
    # load_ppm averages ~1e6 by construction
    assert all(500_000 < r.load_ppm < 2_000_000 for r in rows)


def test_sequence_fingerprints_groups_twins(spark):
    from datetime import datetime

    from dnsflow_clickhouse_spark.operators.sessions import sequence_fingerprints

    t = datetime
    rows = [
        # users 1 and 2 replay the identical flow a>b>a; user 3 differs
        (1, "a", t(2024, 1, 1, 0), 1), (1, "b", t(2024, 1, 1, 1), 2), (1, "a", t(2024, 1, 1, 2), 3),
        (2, "a", t(2024, 1, 2, 0), 4), (2, "b", t(2024, 1, 2, 1), 5), (2, "a", t(2024, 1, 2, 2), 6),
        (3, "b", t(2024, 1, 1, 0), 7), (3, "a", t(2024, 1, 1, 1), 8),
    ]
    df = spark.createDataFrame(rows, "u long, s string, ts timestamp, i long")
    got = sequence_fingerprints(df, "u", "s", "ts", "i", min_group=2).collect()
    assert len(got) == 1
    [r] = got
    assert (r.n_keys, r.keep_key, r.seq_len) == (2, 1, 3)
    # min_group=1 surfaces every fingerprint
    assert sequence_fingerprints(df, "u", "s", "ts", "i", min_group=1).count() == 2


def test_abc_classification_known_cut(spark):
    from dnsflow_clickhouse_spark.operators.profiling import abc_classification

    # values 50, 30, 15, 5 (total 100): cum shares 50%, 80%, 95%, 100%
    # -> A = {50, 30} (cum <= 80%), B = {15} (cum <= 95%), C = {5}
    df = spark.createDataFrame(
        [(1, 50), (2, 30), (3, 15), (4, 5)], "k long, v long"
    )
    got = {r.abc_class: r for r in abc_classification(df, "k", "v").collect()}
    assert (got["A"].n_keys, got["A"].value_sum, got["A"].share_ppm) == (2, 80, 800_000)
    assert (got["B"].n_keys, got["B"].value_sum) == (1, 15)
    assert (got["C"].n_keys, got["C"].value_sum) == (1, 5)


def test_temporal_split_embargo_boundaries(spark):
    from datetime import datetime

    from dnsflow_clickhouse_spark.operators.sessions import temporal_split_embargo

    # max day = 2024-01-31 -> test cut 2024-01-24, embargo starts 01-23
    rows = [
        ("a", datetime(2024, 1, 10)),          # train
        ("a", datetime(2024, 1, 22, 23, 59)),  # train (just before embargo)
        ("a", datetime(2024, 1, 23, 0, 0)),    # embargo (first second)
        ("a", datetime(2024, 1, 23, 23, 59)),  # embargo
        ("a", datetime(2024, 1, 24, 0, 0)),    # test (first second)
        ("a", datetime(2024, 1, 31, 5)),       # test (sets the max day)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    got = {(r.g, r.split): r.n for r in
           temporal_split_embargo(df, "ts", "g", 7, 1).collect()}
    assert got == {("a", "train"): 2, ("a", "embargo"): 2, ("a", "test"): 2}


def test_join_skew_profile_values(spark):
    from dnsflow_clickhouse_spark.operators.skew import join_skew_profile

    # key 1 x 8 rows, keys 2..5 x 1 row: n_keys=5, total=12, avg=2.4
    rows = [(1,)] * 8 + [(2,), (3,), (4,), (5,)]
    df = spark.createDataFrame(rows, "k long")
    got = join_skew_profile(df, "k", top_n=3).collect()
    assert [r.rank for r in got] == [1, 2, 3]
    top = got[0]
    assert (top.key, top.freq, top.n_keys, top.total_rows) == ("1", 8, 5, 12)
    assert top.share_ppm == 666_666
    # load vs avg: 8 / 2.4 = 3.33x -> 3333333 ppm; salt ceil(3.33) = 4
    assert top.load_vs_avg_ppm == 3_333_333
    assert top.suggested_salt == 4


def test_group_overlap_matrix_exact(spark):
    from dnsflow_clickhouse_spark.operators.dedup import group_overlap_matrix

    # group x: grams {a b c, b c d}; group y shares one of them
    df = spark.createDataFrame(
        [
            ("x", "a b c d"),        # grams: "a b c", "b c d"
            ("y", "a b c"),          # gram:  "a b c"
            ("z", "p q r"),          # gram:  "p q r" (disjoint)
        ],
        "g string, text string",
    )
    got = {(r.group_a, r.group_b): r for r in
           group_overlap_matrix(df, "g", "text", 3).collect()}
    assert set(got) == {("x", "y")}
    r = got[("x", "y")]
    assert (r.inter, r.na, r.nb, r.jaccard_ppm) == (1, 2, 1, 500_000)


def test_distribution_match_acceptance(spark):
    from dnsflow_clickhouse_spark.operators.sampling import distribution_match

    # ref 'r': buckets 0 and 1 equally; 'x' is all bucket 0 -> bucket 0
    # accepted at 50% target share / 100% actual share = 500000 ppm
    rows = (
        [("r", 0, i) for i in range(10)]
        + [("r", 100, 10 + i) for i in range(10)]
        + [("x", 0, 100 + i) for i in range(20)]
    )
    df = spark.createDataFrame(rows, "g string, v long, id long")
    got = {
        (r.g, r.bucket): r
        for r in distribution_match(
            df, "g", F.expr("v div 100"), "id", "r"
        ).collect()
    }
    assert got[("x", 0)].accept_ppm == 500_000
    # the reference matches itself exactly: accept_ppm 1e6, all kept
    assert got[("r", 0)].accept_ppm == 1_000_000
    assert got[("r", 0)].n_kept == 10 and got[("r", 1)].n_kept == 10
    # gate keeps a subset, never more than n
    assert 0 <= got[("x", 0)].n_kept <= 20


def test_distribution_match_unseen_bucket_rejected(spark):
    from dnsflow_clickhouse_spark.operators.sampling import distribution_match

    rows = [("r", 0, 1), ("x", 0, 2), ("x", 500, 3)]
    df = spark.createDataFrame(rows, "g string, v long, id long")
    got = {
        (r.g, r.bucket): r
        for r in distribution_match(
            df, "g", F.expr("v div 100"), "id", "r"
        ).collect()
    }
    # bucket 5 absent from the reference -> acceptance 0, nothing kept
    assert got[("x", 5)].accept_ppm == 0 and got[("x", 5)].n_kept == 0


def test_borda_rank_histogram_points(spark):
    from dnsflow_clickhouse_spark.operators.corpus import borda_rank

    # doc 1 best on s1 (2 below), worst on s2 (0 below); doc 3 middling
    rows = [(1, 30, 1), (2, 20, 2), (3, 10, 3)]
    df = spark.createDataFrame(rows, "doc_id long, s1 long, s2 long")
    got = {r.doc_id: r.borda for r in borda_rank(df, "doc_id", ["s1", "s2"], 3).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    # ties share points: two docs with equal s1 both get points-below
    df2 = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 5)], "doc_id long, s1 long"
    )
    got2 = {r.doc_id: r.borda for r in borda_rank(df2, "doc_id", ["s1"], 3).collect()}
    assert got2 == {1: 1, 2: 1, 3: 0}


def test_borda_rank_null_signal_zero_points_no_drop(spark):
    from dnsflow_clickhouse_spark.operators.corpus import borda_rank

    # doc 2 has a NULL s1: it must NOT be dropped, gets 0 points from
    # s1, and does not count as "smaller" for the non-null docs (doc 3
    # with the smallest non-null s1 still gets 0 points from s1)
    rows = [(1, 10, 1), (2, None, 3), (3, 5, 2)]
    df = spark.createDataFrame(rows, "doc_id long, s1 long, s2 long")
    got = {r.doc_id: r.borda for r in borda_rank(df, "doc_id", ["s1", "s2"], 3).collect()}
    assert got == {1: 1 + 0, 2: 0 + 2, 3: 0 + 1}


def test_greedy_budget_selection_boundary(spark):
    from dnsflow_clickhouse_spark.operators.corpus import greedy_budget_selection

    # quality 3: one doc of 4 tokens; quality 2: three docs of 3 tokens
    # (ids 10,11,12); quality 1: one doc. budget 9 -> q>2 layer = 4
    # tokens; boundary q=2 admits ids 10 (cum 3) and 11 (cum 6: 4+6=10>9?
    # remainder = 9-4 = 5 -> cum<=5 admits only id 10 (cum 3)
    rows = [(1, 3, 4), (10, 2, 3), (11, 2, 3), (12, 2, 3), (20, 1, 5)]
    df = spark.createDataFrame(rows, "id long, q long, w long")
    [r] = greedy_budget_selection(df, "id", "q", "w", 9).collect()
    assert (r.cutoff, r.n_above, r.mass_above) == (2, 1, 4)
    assert (r.n_boundary, r.mass_boundary) == (1, 3)
    assert (r.n_kept, r.mass_kept) == (2, 7)


def test_greedy_budget_selection_all_fit(spark):
    from dnsflow_clickhouse_spark.operators.corpus import greedy_budget_selection

    df = spark.createDataFrame([(1, 5, 2), (2, 4, 2)], "id long, q long, w long")
    [r] = greedy_budget_selection(df, "id", "q", "w", 100).collect()
    assert (r.n_kept, r.mass_kept) == (2, 4)


def test_minhash_estimate_identical_docs(spark):
    from dnsflow_clickhouse_spark.operators.dedup import minhash_estimate_pairs

    # two identical docs: estimate 1e6, true 1e6, err 0 (and they are
    # guaranteed LSH candidates since every band matches)
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "z z z y y x w v")],
        "doc_id long, text string",
    )
    got = {(r.id_a, r.id_b): r for r in
           minhash_estimate_pairs(df, "doc_id", "text").collect()}
    r = got[(1, 2)]
    assert (r.est_ppm, r.true_ppm, r.abs_err_ppm) == (1_000_000, 1_000_000, 0)
