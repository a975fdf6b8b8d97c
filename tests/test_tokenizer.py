from __future__ import annotations

from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.operators.tokenizer import (
    bpe_learn,
    segment_with_merges,
)


def _corpus(spark):
    # the classic BPE toy distribution (Sennrich et al. fig. 1 shape):
    # low x5, lower x2, newest x6, widest x3
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    return spark.createDataFrame([(text,)], "text string")


def test_bpe_learns_the_classic_merge_sequence(spark):
    got = [
        (r["round"], r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_learn(_corpus(spark), "text", 6).collect()
    ]
    # es(9 from newest+widest) -> est(9) -> lo(7) -> low(7) -> e w ->
    # ew est; ties broken lexicographically
    assert got == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
        (5, "e", "w", 6),
        (6, "ew", "est", 6),
    ]


def test_bpe_repeated_pair_counts_each_adjacent_occurrence(spark):
    # 'aaa' has TWO (a,a) occurrences; left-to-right merge -> 'aa a'
    df = spark.createDataFrame([("aaa aaa",)], "text string")
    rows = bpe_learn(df, "text", 2).collect()
    assert (rows[0].left_sym, rows[0].right_sym, rows[0].pair_count) == (
        "a",
        "a",
        4,  # 2 per 'aaa' occurrence x 2 occurrences of the word... word
        # frequency table dedups: 'aaa' appears cnt=2, 2 pairs each
    )
    # after merging to 'aa a', the surviving adjacency is (aa, a)
    assert (rows[1].left_sym, rows[1].right_sym) == ("aa", "a")


def test_bpe_single_char_words_and_empty_text_are_safe(spark):
    df = spark.createDataFrame([("a b a",), ("",), ("   ",)], "text string")
    rows = bpe_learn(df, "text", 1).collect()
    # only 1-symbol states exist -> no adjacent pairs -> empty merge table
    assert rows == []


def test_segment_with_merges_applies_the_learned_tokenizer(spark):
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_learn(_corpus(spark), "text", 6).collect()
    ]
    out = (
        spark.createDataFrame([("newest lowest",)], "text string")
        .select(segment_with_merges(F.col("text"), merges).alias("seg"))
        .collect()[0]
        .seg
    )
    # 'newest' -> n ewest (round-6 merge ew+est applies);
    # 'lowest' -> low est (low learned; ew never forms, est survives)
    assert out == "n  ewest | low  est"
