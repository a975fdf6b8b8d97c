"""Third TPC-H-shaped batch: the relational shapes batches 1-2 still
don't reach — LEFT OUTER join feeding a second-level histogram agg
(Q13), correlated MIN subquery (Q2), grouped-HAVING IN-subquery (Q18),
max-over-aggregate scalar subquery (Q15), multi-correlated EXISTS/NOT
EXISTS composite (Q21), OR-of-conjunctions pushdown (Q19), conditional
share ratios (Q8/Q14), nation-pair multi-joins (Q7/Q10), and NOT-IN +
COUNT DISTINCT (Q16).

None of these exist in the reference (its join surface is SURVEY §2.4:
equi + interval-lookup only); they complete the standard engine surface
a reference user would expect when switching. The testdata has no
``partsupp`` table, so Q2/Q16's part-supplier association is re-expressed
over the distinct (l_partkey, l_suppkey) pairs in lineitem — same plan
shape, same subquery semantics.

Exact-arithmetic conventions follow catalog.py: money in integer cents,
rates in basis points, revenue in e6 units (cents × basis-point
complement), divided back once at the end — bit-identical in Spark and
DuckDB regardless of partial-aggregation order.

Scale notes (100 TB): every dim/nation/supplier side is broadcast; the
only shuffles are on the fact table's own keys (orderkey/suppkey/
partkey), which AQE sizes at runtime. The correlated subqueries are
planned as one extra hash aggregate over the fact slice + a broadcast
of the (small) aggregated side — never a per-row re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.numeric import portable_round

from dnsflow_clickhouse_spark.queries.catalog import (
    _SQL_BP,
    _SQL_CENTS,
    _bp,
    _cents,
)
from dnsflow_clickhouse_spark.operators.topk import global_topk
from dnsflow_clickhouse_spark.sources.tables import load_table

_SQL_REV_E6 = (
    f"{_SQL_CENTS.format(c='l_extendedprice')} * "
    f"(10000 - {_SQL_BP.format(c='l_discount')})"
)


def _rev_e6() -> F.Column:
    return _cents("l_extendedprice") * (F.lit(10000) - _bp("l_discount"))


# ---------------------------------------------------------------------------
# Q7: volume shipping between a nation pair, by year
# ---------------------------------------------------------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two independent nation lookups on one fact row.

    The supplier-side and customer-side nation joins are both broadcast;
    the symmetric pair filter ((1,2) or (2,1)) lands after both lookups.
    Only lineitem⋈orders shuffles on orderkey.
    """
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("__ck"), F.col("n_name").alias("cust_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("__sk"), F.col("n_name").alias("supp_nation")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("__ck"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("__sk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(portable_round(F.sum(_rev_e6()) / 1e6, 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       floor(sum(rev_e6) / 1e6 * 100 + 0.5) / 100 AS revenue
FROM (
  SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         {_SQL_REV_E6} AS rev_e6
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
    AND ((n2.n_name = 'NATION_1' AND n1.n_name = 'NATION_2')
      OR (n2.n_name = 'NATION_2' AND n1.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8: national market share within a region, by year
# ---------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: conditional share of a grouped aggregate.

    share = sum(CASE supplier-nation)/sum(all) in one aggregation pass —
    a single division of two exact bigints per group, so the double
    result is bit-identical across engines.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n = load_table(spark, sf_dir, "nation")
    n2 = n.select(
        F.col("n_nationkey").alias("__sk"), F.col("n_name").alias("supp_nation")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    vol = _rev_e6()
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("__sk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            portable_round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q8_SQL = f"""
SELECT o_year,
       floor(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_e6 ELSE 0 END)
             / sum(rev_e6) * 1000000 + 0.5) / 1000000 AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         n2.n_name AS supp_nation,
         {_SQL_REV_E6} AS rev_e6
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
)
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q10: returned-item revenue, top 20 customers
# ---------------------------------------------------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact⋈fact join, wide group keys, global top-K.

    The grouped revenue is computed before the limit; the top-20 runs as
    TakeOrderedAndProject (per-partition heap + driver merge), never a
    full sort.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    agg = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev_e6()).alias("__rev_e6"))
    )
    # half-up to cents in exact integer space — F.round on the double
    # quotient ties to a different side than DuckDB at the .xx5 boundary
    return global_topk(
        agg, [F.desc("__rev_e6"), F.asc("c_custkey")], 20
    ).select(
        "c_custkey",
        "c_name",
        (F.floor((F.col("__rev_e6") + 5000) / 10000) / 100.0).alias("revenue"),
        F.round(_cents("c_acctbal") / 100.0, 2).alias("acctbal"),
        "n_name",
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name,
       floor((sum({_SQL_REV_E6}) + 5000) / 10000) / 100.0 AS revenue,
       round({_SQL_CENTS.format(c='c_acctbal')} / 100.0, 2) AS acctbal,
       n_name
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY sum({_SQL_REV_E6}) DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution (LEFT OUTER + double agg)
# ---------------------------------------------------------------------------


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left-outer join preserving zero-order customers,
    then a histogram over the per-customer counts.

    The ON-clause extra predicate (priority exclusion) is expressed by
    pre-filtering the right side — identical semantics, and the filter
    pushes to the orders scan. count(o_orderkey) counts only matched
    rows, so customers with no orders land in the c_count=0 bucket.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q14: promo revenue share in one month
# ---------------------------------------------------------------------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional ratio over a month of shipments."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    vol = _rev_e6()
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            portable_round(
                F.lit(100)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0))
                / F.sum(vol),
                6,
            ).alias("promo_revenue")
        )
    )


_Q14_SQL = f"""
SELECT floor(100 * sum(CASE WHEN p_type = 'PROMO' THEN {_SQL_REV_E6} ELSE 0 END)
             / sum({_SQL_REV_E6}) * 1000000 + 0.5) / 1000000 AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


# ---------------------------------------------------------------------------
# Q15: top supplier(s) by quarterly revenue (scalar max over an agg)
# ---------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate, take the max OF the aggregate, select
    the rows achieving it.

    The per-supplier revenue aggregates once; its one-row max broadcasts
    back over itself (BroadcastNestedLoopJoin over a single row — no
    re-scan of lineitem). Equality is on exact e6 bigints, so "the max"
    is unambiguous across engines.
    """
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_e6()).alias("__rev_e6")
    )
    mx = rev.agg(F.max("__rev_e6").alias("__max_e6"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("__rev_e6") == F.col("__max_e6"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            portable_round(F.col("__rev_e6") / 1e6, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, sum({_SQL_REV_E6}) AS rev_e6
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, floor(rev_e6 / 1e6 * 100 + 0.5) / 100 AS total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE rev_e6 = (SELECT max(rev_e6) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q16: supplier variety per part attribute (NOT IN + COUNT DISTINCT)
# ---------------------------------------------------------------------------


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape over lineitem's (partkey, suppkey) association
    (testdata has no partsupp): NOT-IN subquery as a broadcast anti join,
    then COUNT DISTINCT per part attribute triple.

    The distinct (partkey, suppkey) projection collapses the fact table
    before the part join — at 100 TB that pre-aggregation is the
    difference between shuffling 60k and 60B rows into the join.
    """
    p = load_table(spark, sf_dir, "part").filter(
        (~F.col("p_brand").isin("Brand#1", "Brand#2"))
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    assoc = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        assoc.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
JOIN part ON l_partkey = p_partkey
WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q18: large-volume orders (grouped-HAVING IN-subquery)
# ---------------------------------------------------------------------------


def q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN (SELECT key ... GROUP BY key HAVING sum > N).

    The HAVING subquery and the outer per-order sum are the same
    aggregate, so it computes once and joins back — Catalyst's plan for
    the DataFrame form is exactly that reuse, with quantities summed in
    exact cents.
    """
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(_cents("l_quantity")).alias("__qty_cents"))
        .filter(F.col("__qty_cents") > 300 * 100)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(_cents("o_totalprice") / 100.0, 2).alias("o_totalprice"),
            F.round(F.col("__qty_cents") / 100.0, 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


_Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round({_SQL_CENTS.format(c='o_totalprice')} / 100.0, 2) AS o_totalprice,
       round(qty_cents / 100.0, 2) AS total_qty
FROM (
  SELECT l_orderkey, sum({_SQL_CENTS.format(c='l_quantity')}) AS qty_cents
  FROM lineitem GROUP BY l_orderkey HAVING sum({_SQL_CENTS.format(c='l_quantity')}) > 30000
)
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19: disjunctive predicate revenue (OR-of-conjunctions pushdown)
# ---------------------------------------------------------------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three OR'd conjunction groups spanning both join
    sides.

    Catalyst factors the common l_quantity bounds out of the disjunction
    and pushes them to the lineitem scan; the brand/size/quantity band
    combination evaluates post-join in one codegen stage.
    """
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = load_table(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(1, 25)
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(1, 40)
           & qty.between(20, 30))
    )
    return j.filter(cond).agg(
        portable_round(F.sum(_rev_e6()) / 1e6, 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q19_SQL = f"""
SELECT floor(sum({_SQL_REV_E6}) / 1e6 * 100 + 0.5) / 100 AS revenue, count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 40 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q21: sole-returner suppliers (EXISTS + NOT EXISTS on the same fact)
# ---------------------------------------------------------------------------


def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per-row EXISTS (another supplier in the order)
    AND NOT EXISTS (another supplier who also returned).

    Both correlated subqueries compile to one semi + one anti join
    against the distinct (orderkey, suppkey) projection — the inequality
    rides along in the join condition. Supplier/nation broadcast.
    """
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_3"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l = load_table(spark, sf_dir, "lineitem")
    l1 = (
        l.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    others = l.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("__sk")
    ).distinct()
    returners = (
        l.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2"))
        .distinct()
    )
    return (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("__ok"))
            & (F.col("l_suppkey") != F.col("__sk")),
            "left_semi",
        )
        .join(
            returners,
            (F.col("l_orderkey") == F.col("__ok2"))
            & (F.col("l_suppkey") != F.col("__sk2")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


_Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l1.l_orderkey
              AND o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q2: min-cost supplier per part (correlated MIN subquery)
# ---------------------------------------------------------------------------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape over lineitem's distinct (part, supplier, price)
    association: rows equal to the per-part MIN of a correlated subquery.

    The per-part min aggregates once over the deduped association and
    joins back on partkey — the correlated subquery never re-executes
    per row. Region/nation/supplier/part dims broadcast.
    """
    assoc = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            _cents("l_extendedprice").alias("price_cents"),
        )
        .distinct()
    )
    mins = assoc.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.min("price_cents").alias("__min_cents")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        assoc.join(
            mins,
            (F.col("l_partkey") == F.col("__pk"))
            & (F.col("price_cents") == F.col("__min_cents")),
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.round(_cents("s_acctbal") / 100.0, 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round(F.col("price_cents") / 100.0, 2).alias("min_price"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


_Q2_SQL = f"""
WITH assoc AS (
  SELECT DISTINCT l_partkey, l_suppkey,
         {_SQL_CENTS.format(c='l_extendedprice')} AS price_cents
  FROM lineitem
)
SELECT round({_SQL_CENTS.format(c='s_acctbal')} / 100.0, 2) AS s_acctbal,
       s_name, n_name, p_partkey, p_brand,
       round(price_cents / 100.0, 2) AS min_price
FROM assoc
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size <= 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
  AND price_cents = (SELECT min(a2.price_cents) FROM assoc a2
                     WHERE a2.l_partkey = assoc.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


TPCH3_REGISTRY = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, _Q2_SQL),
    "q7_volume_shipping": (q7_volume_shipping, _Q7_SQL),
    "q8_market_share": (q8_market_share, _Q8_SQL),
    "q10_returned_items": (q10_returned_items, _Q10_SQL),
    "q13_order_distribution": (q13_order_distribution, _Q13_SQL),
    "q14_promo_revenue": (q14_promo_revenue, _Q14_SQL),
    "q15_top_supplier": (q15_top_supplier, _Q15_SQL),
    "q16_supplier_variety": (q16_supplier_variety, _Q16_SQL),
    "q18_big_orders": (q18_big_orders, _Q18_SQL),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, _Q19_SQL),
    "q21_sole_returner": (q21_sole_returner, _Q21_SQL),
}
