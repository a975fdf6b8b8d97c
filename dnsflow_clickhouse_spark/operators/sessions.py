"""Event-sequence operators (engine extension): gap-based
sessionization and as-of (latest-prior) joins.

Neither exists in the reference (its stream is stateless 5-minute
batches, SURVEY §2.10), but both are standard capabilities for an
event-analytics engine and for training-data pipelines (session-level
document assembly, point-in-time feature joins).

Scale shape: both operators are ONE shuffle on the entity key — a
window over (key, time) for sessionize, a tagged union + window for
asof_join. No self-joins, no per-row subqueries; state per key is a
single running value, so skewed keys degrade linearly and AQE can split
them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_cols: list[str] | None = None,
    session_col: str = "session_idx",
) -> DataFrame:
    """Assign gap-based session indexes per key.

    A new session starts at the first event and whenever the gap to the
    previous event (per key, ordered by ``ts_col`` then
    ``tiebreak_cols``) strictly exceeds ``gap_seconds``. Adds
    ``session_col`` (1-based, dense per key).

    Exact arithmetic: gaps compare in integer microseconds
    (``unix_micros``), so engines agree on boundary events.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    new_session = (
        prev_us.isNull() | ((us - prev_us) > F.lit(int(gap_seconds) * 1_000_000))
    ).cast("long")
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_session).over(running))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, attach ``value_cols`` from
    the right row with the greatest ``right_ts`` STRICTLY before the
    left row's ``left_ts`` (per ``key_col``); nulls when none exists.

    Ties inside the right side (same key + timestamp) resolve to the
    greatest ``right_tiebreak`` — matching the SQL
    ``ORDER BY ts DESC, tiebreak DESC LIMIT 1`` correlated form.

    Plan: tag both inputs, union, and take ``last_value(..., ignorenulls)``
    over a (key, time) window — one shuffle, no join node at all, the
    canonical Spark composition for point-in-time lookups. At equal
    timestamps left rows order BEFORE right rows, which is exactly the
    strict (<) semantic.
    """
    lcols = left.columns
    # dedupe right to one row per (key, ts): keep greatest tiebreak
    r = right
    if right_tiebreak is not None:
        wdd = Window.partitionBy(key_col, right_ts).orderBy(
            F.col(right_tiebreak).desc()
        )
        r = (
            r.withColumn("__rn", F.row_number().over(wdd))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    payload = F.struct(*[F.col(c) for c in value_cols])
    r2 = r.select(
        F.col(key_col),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        payload.alias("__rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key_col],
    )
    l2 = left.select(
        F.col(key_col),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r2.schema["__rv"].dataType).alias("__rv"),
        *[F.col(c) for c in lcols if c != key_col],
    )
    # order: time, then left(0) before right(1) so same-ts right rows are
    # invisible to the left row (strict before)
    w = Window.partitionBy(key_col).orderBy("__ts", "__is_right").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    merged = r2.unionByName(l2).withColumn(
        "__last_rv", F.last("__rv", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__is_right") == 0).select(
        key_col,
        *[c for c in lcols if c != key_col],
        *[F.col("__last_rv").getField(c).alias(f"asof_{c}") for c in value_cols],
    )
    return out


def session_boundary_flag(
    ts: Column, prev_ts: Column, gap_seconds: int
) -> Column:
    """Column-level boundary predicate for composition/tests."""
    return prev_ts.isNull() | (
        (F.unix_micros(ts) - F.unix_micros(prev_ts))
        > F.lit(int(gap_seconds) * 1_000_000)
    )
