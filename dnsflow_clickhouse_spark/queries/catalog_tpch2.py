"""Second TPC-H-shaped batch: the join/subquery shapes the first batch
(q1/q3/q5 in catalog.py) doesn't reach — semi join (EXISTS), anti join
(NOT EXISTS), scalar-aggregate subquery, and a pushdown-only scan agg.

The reference's join surface is equi + interval left-outer only
(SURVEY §2.4); these fill out the remaining standard join surface any
complete engine must serve.

Exact-arithmetic conventions follow catalog.py: money as integer cents,
rates as basis points, so Spark and DuckDB hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.numeric import portable_round

from dnsflow_clickhouse_spark.queries.catalog import _SQL_BP, _SQL_CENTS, _bp, _cents
from dnsflow_clickhouse_spark.sources.tables import load_table


def q4_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS as a left-semi join.

    orders ⋉ lineitem(returned) — the semi join needs only the key from
    the probe side, so Catalyst broadcasts or shuffles the distinct
    orderkeys, never the full lineitem row. At 100 TB the build side is
    the filtered fact slice, already cut by the pushed returnflag filter.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-agg, the pushdown showcase.

    All three predicates and the 2-column projection reach the parquet
    reader (PushedFilters + ReadSchema); the aggregate is a map-side
    partial over surviving row groups. The discount band compares basis
    points (exact ints), not raw doubles.
    """
    l = load_table(spark, sf_dir, "lineitem")
    rev_e6 = _cents("l_extendedprice") * _bp("l_discount")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & _bp("l_discount").between(500, 700)
            & (F.col("l_quantity") < 24)
        )
        .agg(portable_round(F.sum(rev_e6) / 1e6, 2).alias("revenue"))
    )


_Q6_SQL = f"""
SELECT floor(sum({_SQL_CENTS.format(c='l_extendedprice')} * {_SQL_BP.format(c='l_discount')}) / 1e6 * 100 + 0.5) / 100 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND {_SQL_BP.format(c='l_discount')} BETWEEN 500 AND 700
  AND l_quantity < 24
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-aggregate subquery + NOT EXISTS anti join.

    The global average account balance is a one-row aggregate broadcast
    into the filter (Catalyst plans the cross join as
    BroadcastNestedLoopJoin over a single row); customers with no orders
    drop out via left-anti against the distinct custkeys.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_cents("c_acctbal")) / F.count(F.lit(1))).alias("__avg_cents")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(_cents("c_acctbal") > F.col("__avg_cents"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(_cents("c_acctbal")) / 100.0).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


_Q22_SQL = f"""
SELECT c_nationkey, count(*) AS numcust,
       sum({_SQL_CENTS.format(c='c_acctbal')}) / 100.0 AS totacctbal
FROM customer
WHERE {_SQL_CENTS.format(c='c_acctbal')} >
      (SELECT sum({_SQL_CENTS.format(c='c_acctbal')}) / count(*)
       FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-aggregate subquery, decorrelated
    as a join against the per-part aggregate.

    ``qty < 0.2 * avg(qty per part)`` is evaluated in exact integers:
    qty_cents * cnt * 10 < 2 * sum_qty_cents avoids the fractional
    average entirely. The per-part aggregate is tiny relative to
    lineitem and broadcasts.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = l.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum(_cents("l_quantity")).alias("__sum_qc"),
        F.count(F.lit(1)).alias("__cnt"),
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(per_part), l.l_partkey == F.col("__pk"))
        .filter(_cents("l_quantity") * F.col("__cnt") * 10 < 2 * F.col("__sum_qc"))
        .agg(
            portable_round(F.sum(_cents("l_extendedprice")) / 100.0 / 7.0, 6).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q17_SQL = f"""
SELECT floor(sum({_SQL_CENTS.format(c='l_extendedprice')}) / 100.0 / 7.0 * 1000000 + 0.5) / 1000000 AS avg_yearly,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND {_SQL_CENTS.format(c='l_quantity')} *
      (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey) * 10 <
      2 * (SELECT sum({_SQL_CENTS.format(c='l_quantity')})
           FROM lineitem l3 WHERE l3.l_partkey = lineitem.l_partkey)
"""


TPCH2_REGISTRY = {
    "q4_priority_semi": (q4_priority_semi, _Q4_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, _Q6_SQL),
    "q22_idle_customers": (q22_idle_customers, _Q22_SQL),
    "q17_small_quantity": (q17_small_quantity, _Q17_SQL),
}
