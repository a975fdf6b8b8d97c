"""Unit tests for the profiling / corpus-statistics operators on
handcrafted inputs with known answers; sf-scale hash parity is covered
by the DuckDB oracles in catalog_profiling."""

from __future__ import annotations

from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.operators.profiling import (
    cooccurrence_pairs,
    fuzzy_pairs,
    gini_concentration,
    inverted_index,
    profile_columns,
    weighted_sample,
)


def test_profile_columns_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")], "id long, tag string"
    )
    got = {r.col_name: r for r in profile_columns(df, ["id", "tag"]).collect()}
    assert got["id"].n_rows == 4 and got["id"].n_null == 0
    assert got["id"].n_distinct == 4
    assert got["tag"].n_null == 1 and got["tag"].n_distinct == 2  # NULL excluded


def test_gini_concentration_extremes(spark):
    # 'mono' owned by one user -> gini 0; 'even' split 1/1 -> (4-2)/4 = 500000 ppm
    rows = [("mono", "u1")] * 4 + [("even", "u1"), ("even", "u2")]
    df = spark.createDataFrame(rows, "event_type string, user_id string")
    got = {r.event_type: r for r in gini_concentration(df, "event_type", "user_id").collect()}
    assert got["mono"].gini_ppm == 0 and got["mono"].n_keys == 1
    assert got["even"].gini_ppm == 500_000 and got["even"].n_rows == 2


def test_cooccurrence_pairs_jaccard(spark):
    # u1:{x,y}, u2:{x,y}, u3:{x} -> pair (x,y): both=2, n_x=3, n_y=2, J=2/3
    rows = [("u1", "x"), ("u1", "y"), ("u2", "x"), ("u2", "y"), ("u3", "x")]
    df = spark.createDataFrame(rows, "user_id string, event_type string")
    [p] = cooccurrence_pairs(df, "user_id", "event_type").collect()
    assert (p.item_a, p.item_b, p.n_both, p.n_a, p.n_b) == ("x", "y", 2, 3, 2)
    assert p.jaccard_ppm == 2 * 1_000_000 // 3


def test_inverted_index_caps_posting_sample_not_df(spark):
    rows = [(i, "common rare") if i < 3 else (i, "common") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.term: r
        for r in inverted_index(
            df, "doc_id", F.split(F.col("text"), " "), min_df=2, sample_k=2
        ).collect()
    }
    # doc_freq counts ALL matching docs; the sample is capped at k smallest
    assert got["common"].doc_freq == 10
    assert got["common"].posting_sample == "0,1"
    assert got["rare"].doc_freq == 3 and got["rare"].posting_sample == "0,1"


def test_weighted_sample_ht_weights(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    # p = 1.0 for everyone -> all kept, each HT weight exactly 1e6 micro
    got = weighted_sample(df, F.lit(0), F.lit(1_000_000))
    assert got.count() == 1000
    assert got.agg(F.sum("ht_micro")).first()[0] == 1000 * 1_000_000
    # p = 0 is clamped to 1 ppm, and bucket >= 1 ppm drops the row
    none = weighted_sample(df, F.lit(999_999), F.lit(0))
    assert none.count() == 0


def test_fuzzy_pairs_blocks_and_threshold(spark):
    rows = [
        (1, "en", "the quick brown fox jumps over it"),
        (2, "en", "the quick brown fox jumps over IT"),  # same block; the
        # 32-char probe truncates after "over i|I" -> edit distance 1
        (3, "en", "a totally different opening line"),  # different block
        (4, "de", "the quick brown fox jumps over it"),  # same text, other group
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    pairs = fuzzy_pairs(df, "doc_id", "text", "lang", max_dist=8).collect()
    assert [(p.doc_a, p.doc_b, p.edit_dist) for p in pairs] == [(1, 2, 1)]


def test_expect_report_counts_and_null_predicates(spark):
    from dnsflow_clickhouse_spark.operators.expectations import (
        expect_report,
        row_rule,
        unique_rule,
    )

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", -1), (3, None, 7), (3, "c", None)],
        "id long, name string, v int",
    )
    out = {
        r.rule: (r.n_rows, r.n_violations, r.passed)
        for r in expect_report(
            df,
            [
                row_rule("v_non_negative", F.col("v") >= 0),
                row_rule("name_not_null", F.col("name").isNotNull()),
                unique_rule("id_unique", "id"),
            ],
        ).collect()
    }
    # NULL v fails the range predicate (a rule that can't evaluate did
    # not hold), NULL name fails not-null, duplicate id 3 -> 1 violation
    assert out["v_non_negative"] == (4, 2, 0)
    assert out["name_not_null"] == (4, 1, 0)
    assert out["id_unique"] == (4, 1, 0)


def test_expect_report_all_green(spark):
    from dnsflow_clickhouse_spark.operators.expectations import (
        expect_report,
        row_rule,
        unique_rule,
    )

    df = spark.createDataFrame([(1, 2), (2, 3)], "id long, v int")
    rows = expect_report(
        df,
        [row_rule("v_pos", F.col("v") > 0), unique_rule("id_unique", "id")],
    ).collect()
    assert all(r.passed == 1 and r.n_violations == 0 for r in rows)


def test_cusum_matches_sequential_recurrence(spark):
    from dnsflow_clickhouse_spark.operators.profiling import cusum_changepoints

    xs = [3, 3, 3, 9, 9, 2, 3, 12, 1, 1]
    k, h = 4_000_000, 6_000_000  # k = 4.0, h = 6.0 in micros
    rows = [("s", t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    got = (
        cusum_changepoints(df, "g", "t", "x", k, h)
        .orderBy("t")
        .collect()
    )
    # pure-python replay of Page's recurrence s_t = max(0, s + x*1e6 - k)
    s, want = 0, []
    for x in xs:
        s = max(0, s + x * 1_000_000 - k)
        want.append((s, int(s > h)))
    assert [(r.cusum_micro, r.alarm) for r in got] == want


def test_cusum_per_series_column_thresholds(spark):
    from pyspark.sql import functions as F

    from dnsflow_clickhouse_spark.operators.profiling import cusum_changepoints

    # two series with different k columns: 'a' never alarms, 'b' does
    rows = [("a", t, 5, 10_000_000, 1_000_000) for t in range(3)] + [
        ("b", t, 5, 1_000_000, 1_000_000) for t in range(3)
    ]
    df = spark.createDataFrame(rows, "g string, t long, x long, k long, h long")
    got = {
        (r.g, r.t): r
        for r in cusum_changepoints(
            df, "g", "t", "x", F.col("k"), F.col("h")
        ).collect()
    }
    assert all(got[("a", t)].cusum_micro == 0 for t in range(3))
    assert [got[("b", t)].cusum_micro for t in range(3)] == [
        4_000_000,
        8_000_000,
        12_000_000,
    ]
    assert [got[("b", t)].alarm for t in range(3)] == [1, 1, 1]


def test_k_anonymity_flags(spark):
    from dnsflow_clickhouse_spark.operators.profiling import k_anonymity_report

    rows = (
        [("x", 1, u) for u in (1, 2, 3, 4, 5)]  # n=5, l=5: clean at k=5,l=2
        + [("x", 2, 9), ("x", 2, 9)]  # n=2 < 5, l=1 < 2: both flags
        + [("y", 1, u) for u in (7, 7, 7, 7, 8)]  # n=5, l=2: clean
    )
    df = spark.createDataFrame(rows, "q1 string, q2 long, sens long")
    got = {
        (r.q1, r.q2): r
        for r in k_anonymity_report(df, ["q1", "q2"], "sens", 5, 2).collect()
    }
    assert (got[("x", 1)].under_k, got[("x", 1)].under_l) == (0, 0)
    assert (got[("x", 2)].under_k, got[("x", 2)].under_l) == (1, 1)
    assert (got[("y", 1)].n, got[("y", 1)].l_distinct) == (5, 2)
    assert (got[("y", 1)].under_k, got[("y", 1)].under_l) == (0, 0)
