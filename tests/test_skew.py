"""Salted aggregation must be bit-identical to the direct groupBy for
every supported algebraic aggregate, including on a pathologically
skewed key distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.operators.skew import (
    salted_agg,
    salted_distinct_count,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one mega-key ("hot": 9000 rows) and 100 cold keys (10 rows each)
    return (
        spark.range(0, 10000)
        .select(
            F.when(F.col("id") < 9000, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 100).cast("string")))
            .alias("k"),
            F.col("id").alias("v"),
            (F.col("id") % 7).alias("d"),
        )
    )


def test_salted_agg_matches_direct(spark, skewed):
    got = {
        r.k: (r.total, r.n, r.lo, r.hi)
        for r in salted_agg(
            skewed,
            ["k"],
            {
                "total": ("sum", "v"),
                "n": ("count", "v"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
            },
            spread_col="v",
        ).collect()
    }
    want = {
        r.k: (r.total, r.n, r.lo, r.hi)
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want


def test_salted_agg_rejects_non_algebraic(skewed):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(skewed, ["k"], {"m": ("avg", "v")}, spread_col="v")


def test_salted_distinct_count_matches_direct(spark, skewed):
    got = {
        r.k: r.n_distinct
        for r in salted_distinct_count(skewed, ["k"], "d").collect()
    }
    want = {
        r.k: r.n
        for r in skewed.groupBy("k").agg(F.countDistinct("d").alias("n")).collect()
    }
    assert got == want


def test_salted_distinct_count_excludes_nulls(spark):
    """COUNT(DISTINCT x) ignores NULLs; the salted dedup must too (a
    nullable column would otherwise count one phantom value per key)."""
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y"), ("b", None), ("c", "z")],
        "k string, d string",
    )
    got = {
        r.k: r.n_distinct
        for r in salted_distinct_count(df, ["k"], "d").collect()
    }
    # key "b" has only NULLs -> COUNT(DISTINCT)=0 -> no output row,
    # matching groupBy-count semantics on the filtered set
    assert got == {"a": 2, "c": 1}


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from dnsflow_clickhouse_spark.operators.skew import salted_join

    # hot key: 'a' carries 500 of 520 fact rows
    fact = spark.createDataFrame(
        [("a", i) for i in range(500)] + [("b", i) for i in range(20)],
        "k string, v long",
    )
    dim = spark.createDataFrame(
        [("a", "alpha"), ("b", "beta"), ("c", "unused")], "k string, name string"
    )
    plain = fact.join(dim, ["k"]).select("k", "v", "name")
    salted = salted_join(fact, dim, ["k"], spread_col="v", buckets=8).select(
        "k", "v", "name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # left join preserves unmatched fact rows exactly once
    fact2 = fact.union(spark.createDataFrame([("zz", 1)], "k string, v long"))
    left_plain = fact2.join(dim, ["k"], "left").select("k", "v", "name")
    left_salted = salted_join(
        fact2, dim, ["k"], spread_col="v", buckets=8, how="left"
    ).select("k", "v", "name")
    assert sorted(map(tuple, left_salted.collect())) == sorted(
        map(tuple, left_plain.collect())
    )
