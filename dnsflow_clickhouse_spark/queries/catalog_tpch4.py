"""Fourth TPC-H-shaped batch — q9/q11/q12/q20, the last of the 22
standard shapes not yet represented (with batches 1-3 this completes the
sweep: every TPC-H query shape has an oracle-checked analogue here,
reshaped where the testdata lacks partsupp/shipmode columns).

New plan shapes this batch adds:
- q11: HAVING against a *fraction of a global aggregate* (scalar
  subquery on the same aggregate tree);
- q20: nested semi-join chain (IN of an IN) with a correlated
  half-of-sum threshold;
- q9: multi-dim profit rollup with a LIKE-filtered dimension;
- q12: CASE-bucketed counts pivoted by a priority class.

Arithmetic conventions as in catalog.py: integer cents / e6 revenue
units end-to-end, one division at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.numeric import portable_round

from dnsflow_clickhouse_spark.queries.catalog import _SQL_CENTS, _cents
from dnsflow_clickhouse_spark.queries.catalog_tpch3 import _SQL_REV_E6, _rev_e6
from dnsflow_clickhouse_spark.sources.tables import load_table


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit rollup by (nation, year) over a LIKE-
    filtered part dimension (no ps_supplycost in the testdata; profit =
    discounted revenue). Part and nation broadcast; lineitem⋈orders is
    the only fact shuffle."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(portable_round(F.sum(_rev_e6()) / 1e6, 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q9_SQL = f"""
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
       floor(sum({_SQL_REV_E6}) / 1e6 * 100 + 0.5) / 100 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
ORDER BY nation, o_year DESC
"""


def q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value HAVING > fraction of the GLOBAL
    total (scalar subquery over the same aggregate). The per-part value
    aggregates once; its global sum is a one-row broadcast back over the
    aggregate — no second pass over the fact table."""
    l = load_table(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(
        F.sum(_cents("l_extendedprice")).alias("value_cents")
    )
    total = per_part.agg(F.sum("value_cents").alias("__total"))
    return (
        per_part.join(F.broadcast(total))
        # keep parts holding more than 1/1600 of total inventory value
        .filter(F.col("value_cents") * 1600 > F.col("__total"))
        .select(
            "l_partkey",
            F.round(F.col("value_cents") / 100.0, 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


_Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, sum({_SQL_CENTS.format(c='l_extendedprice')}) AS value_cents
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, round(value_cents / 100.0, 2) AS part_value
FROM per_part
WHERE value_cents * 1600 > (SELECT sum(value_cents) FROM per_part)
ORDER BY part_value DESC, l_partkey
"""


def q12_priority_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-bucketed dual counts per group (no
    l_shipmode in the testdata; the late-shipment class is reshaped over
    l_linestatus). One pass, two conditional sums."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


_Q12_SQL = """
SELECT l_linestatus AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
ORDER BY ship_class
"""


def q20_stockpile_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain — suppliers IN (the
    suppliers whose shipped quantity of some returned-heavy part exceeds
    half that part's total shipped quantity), names from a broadcast dim.

    Both levels compile to aggregates + a semi join; the correlated
    half-of-sum threshold is the per-part aggregate joined back, never a
    per-row subquery re-scan."""
    l = load_table(spark, sf_dir, "lineitem")
    r_parts = (
        l.filter(F.col("l_returnflag") == "R")
        .select("l_partkey")
        .distinct()
    )
    per_ps = (
        l.join(r_parts, "l_partkey", "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_cents("l_quantity")).alias("__q_cents"))
    )
    per_part = per_ps.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum("__q_cents").alias("__tot_cents")
    )
    heavy = (
        per_ps.join(per_part, per_ps.l_partkey == F.col("__pk"))
        .filter(F.col("__q_cents") * 5 > F.col("__tot_cents"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


_Q20_SQL = f"""
WITH per_ps AS (
  SELECT l_partkey, l_suppkey, sum({_SQL_CENTS.format(c='l_quantity')}) AS q_cents
  FROM lineitem
  WHERE l_partkey IN (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
  GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_ps
  WHERE q_cents * 5 > (SELECT sum(q_cents) FROM per_ps p2
                       WHERE p2.l_partkey = per_ps.l_partkey)
)
ORDER BY s_suppkey
"""


TPCH4_REGISTRY = {
    "q9_product_profit": (q9_product_profit, _Q9_SQL),
    "q11_value_concentration": (q11_value_concentration, _Q11_SQL),
    "q12_priority_class_counts": (q12_priority_class_counts, _Q12_SQL),
    "q20_stockpile_suppliers": (q20_stockpile_suppliers, _Q20_SQL),
}
