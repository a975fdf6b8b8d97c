"""Unit tests for the third TPC-H-shaped batch on a handcrafted
micro-warehouse with hand-computed answers. The sf-scale hash parity is
covered by the DuckDB oracles (tools/verify_oracle.py); these pin the
semantic corners: the zero-order bucket surviving the outer join (q13),
the EXISTS/NOT-EXISTS composite (q21), the correlated per-part MIN (q2),
exact-tie max selection (q15), and the TakeOrderedAndProject top-K plan
(q10).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.queries.catalog_tpch3 import (
    q2_min_cost_supplier,
    q10_returned_items,
    q13_order_distribution,
    q15_top_supplier,
    q21_sole_returner,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    """Micro TPC-H warehouse written as parquet in the testdata layout."""
    d = tmp_path_factory.mktemp("tpch3")

    def w(name, rows, schema):
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            str(d / f"{name}.parquet")
        )

    w("region", [(0, "EUROPE"), (1, "AMERICA")],
      "r_regionkey int, r_name string")
    w("nation",
      [(1, "NATION_1", 0), (2, "NATION_2", 0), (3, "NATION_3", 1)],
      "n_nationkey int, n_name string, n_regionkey int")
    # s4 has a negative balance (q16's exclusion set, unused elsewhere)
    w("supplier",
      [(1, "S1", 1, 100.0), (2, "S2", 2, 200.0), (3, "S3", 3, 300.0),
       (4, "S4", 3, -5.0)],
      "s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
    w("customer",
      [(1, "C1", 1, 50.0, "BUILDING"), (2, "C2", 2, 60.0, "AUTOMOBILE"),
       (3, "C3", 3, 70.0, "BUILDING")],  # C3 places no orders (q13 zero bucket)
      "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
      " c_mktsegment string")
    w("orders",
      [(10, 1, "F", 1000.0, _ts("1996-02-01"), "1-URGENT"),
       (20, 1, "F", 2000.0, _ts("1996-02-02"), "5-LOW"),   # excluded by q13
       (30, 2, "F", 3000.0, _ts("1996-02-03"), "2-HIGH"),
       (40, 2, "O", 4000.0, _ts("1996-02-04"), "2-HIGH")],  # non-F (q21)
      "o_orderkey long, o_custkey long, o_orderstatus string,"
      " o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    # lineitem: order 10 = S3 returned + S1 kept  -> q21 counts S3
    #           order 30 = S3 returned + S1 returned -> NOT EXISTS kills it
    #           order 40 = S3 returned alone, non-F -> EXISTS + status kill it
    # part 100 min price 5.00 held by S1; part 200 min 8.00 held by S3
    li = "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int," \
         " l_quantity double, l_extendedprice double, l_discount double," \
         " l_tax double, l_returnflag string, l_linestatus string," \
         " l_shipdate timestamp"
    w("lineitem",
      [(10, 100, 3, 1, 10.0, 30.0, 0.0, 0.0, "R", "F", _ts("1996-02-10")),
       (10, 100, 1, 2, 20.0, 5.0, 0.0, 0.0, "N", "F", _ts("1996-02-11")),
       (30, 200, 3, 1, 30.0, 8.0, 0.0, 0.0, "R", "F", _ts("1996-02-12")),
       (30, 200, 1, 2, 40.0, 9.0, 0.0, 0.0, "R", "F", _ts("1996-02-13")),
       (40, 100, 3, 1, 50.0, 7.0, 0.1, 0.0, "R", "O", _ts("1996-02-14"))],
      li)
    w("part",
      [(100, "p100", "Brand#3", "STANDARD", 10, 1.0),
       (200, "p200", "Brand#5", "STANDARD", 20, 2.0)],
      "p_partkey long, p_name string, p_brand string, p_type string,"
      " p_size int, p_retailprice double")
    return str(d)


def test_q13_zero_order_bucket_and_priority_exclusion(spark, wh):
    rows = {r.c_count: r.custdist for r in q13_order_distribution(spark, wh).collect()}
    # C1 has orders 10+20 but 20 is 5-LOW -> c_count 1; C2 -> 2; C3 -> 0.
    assert rows == {1: 1, 2: 1, 0: 1}


def test_q21_sole_returner_composite(spark, wh):
    got = [(r.s_name, r.numwait) for r in q21_sole_returner(spark, wh).collect()]
    # only order 10 qualifies: S3 returned, another supplier present,
    # nobody else returned, order status F. Orders 30 (co-returner) and
    # 40 (non-F, no co-supplier) are excluded.
    assert got == [("S3", 1)]


def test_q2_correlated_min_per_part(spark, wh):
    got = {(r.p_partkey, r.s_name, r.min_price)
           for r in q2_min_cost_supplier(spark, wh).collect()}
    # EUROPE suppliers are S1 (N1) and S2 (N2); min price for part 100 is
    # 5.00 held by S1. Part 200's min (8.00) is held by S3 (AMERICA) -> out.
    assert got == {(100, "S1", 5.0)}


def test_q15_exact_max_selection(spark, wh):
    got = q15_top_supplier(spark, wh).collect()
    # Q1-1996 revenue: S3 = 30.0 + 8*30=240 -> wait, revenue is per line:
    # order10/S3: 30.00*10? No -- extendedprice is the line total already.
    # S3: 30.00 (ord 10) + 240.0? extendedprice=8.0 qty irrelevant => 8.0
    # (ord 30) + 7.0*0.9=6.3 (ord 40) = 44.3 -> wins over S1 (5+9=14).
    assert [(r.s_name, r.total_revenue) for r in got] == [("S3", 44.3)]


def test_q10_plans_take_ordered(spark, wh):
    plan = q10_returned_items(spark, wh)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
