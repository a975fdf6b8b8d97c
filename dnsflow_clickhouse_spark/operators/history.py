"""Slowly-changing-dimension type-2 history (engine extension): turn
per-snapshot dimension rows into validity intervals.

Why this operator: the reference pipeline joins events against
point-in-time dimension state (clientName tiers, domain tags) but keeps
only the LATEST state — re-running last month's report silently uses
today's dimensions (SURVEY §3). io.merge_upsert gives SCD1 (latest
wins); this gives SCD2: every (key, attribute-state) becomes a
``[valid_from, valid_to)`` interval, which is exactly what
operators.sessions.asof_join consumes for reproducible backfills.

Shape: one window pass per key (change detection via null-safe compare
against the lagged attribute struct, then a running change counter
forms the version id) and one aggregate per (key, version) — both hash
on the dimension key, so the whole build is two shuffles of the
DIMENSION table (tiny next to any fact table). Sparse snapshots are
allowed: a key absent from a snapshot is "unchanged", not deleted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    snapshots: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    snap_col: str,
) -> DataFrame:
    """Collapse per-snapshot rows into SCD2 intervals.

    Input: one row per (key, snapshot) with the attribute values seen
    at that snapshot. Output: (*key_cols, *value_cols, valid_from,
    valid_to, version) — valid_from = first snapshot showing this
    state, valid_to = the snapshot that replaced it (NULL while
    current), version = 1-based change counter per key.
    """
    staged = snapshots.select(
        *key_cols, *value_cols, F.col(snap_col).alias("__snap")
    )
    state = F.struct(*[F.col(c) for c in value_cols])
    order_w = Window.partitionBy(*key_cols).orderBy("__snap")
    changed = (
        F.when(F.lag("__snap").over(order_w).isNull(), F.lit(1))
        .when(~state.eqNullSafe(F.lag(state).over(order_w)), F.lit(1))
        .otherwise(F.lit(0))
    )
    versioned = staged.withColumn("version", F.sum(changed).over(order_w))
    spans = versioned.groupBy(*key_cols, "version").agg(
        *[F.first(c).alias(c) for c in value_cols],
        F.min("__snap").alias("valid_from"),
    )
    ver_w = Window.partitionBy(*key_cols).orderBy("version")
    return spans.select(
        *key_cols,
        *value_cols,
        "valid_from",
        F.lead("valid_from").over(ver_w).alias("valid_to"),
        "version",
    )
