"""Top-K operators.

The reference hand-rolls ranking two ways (SURVEY §2.6):
- global top-K: ``sortBy(desc).take(K)`` (DnsRptCH.scala:577-578)
- grouped top-K: ``groupByKey + in-memory sort + take`` per group
  (DnsRptCH.scala:646-650 etc.) — OOM-prone on hot groups.

Here:
- ``global_topk`` = orderBy().limit() → Catalyst's TakeOrderedAndProject,
  which keeps a size-K heap per partition and merges heaps on the driver
  — no global sort, no full shuffle, scale-safe for the reference's
  K <= 70000.
- ``grouped_topk`` = row_number window → one hash-partitioned shuffle by
  group key, streaming rank per group — no per-group materialization.

Both take explicit tie-break columns: the reference's RDD sorts are
unstable on ties (SURVEY §7.4), so deterministic output requires a total
order; callers pass the natural unique key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order(cols: list[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def global_topk(df: DataFrame, order_by: list[Column | str], k: int) -> DataFrame:
    """Top-K over the whole frame (TakeOrderedAndProject)."""
    return df.orderBy(*_order(order_by)).limit(k)


def grouped_topk(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column | str],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Top-K rows per group via row_number (single shuffle on the group
    key; replaces the reference's groupByKey+sort pattern)."""
    w = Window.partitionBy(*partition_by).orderBy(*_order(order_by))
    ranked = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    if rank_col:
        return ranked.withColumnRenamed("__rn", rank_col)
    return ranked.drop("__rn")
