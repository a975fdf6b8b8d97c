"""Skew mitigation for hot-key aggregation.

The reference salts six hot aggregations by hand with ``random.nextInt
(100)`` (DnsRptCH.scala:641-761) — non-deterministic and always-on. The
rebuild's default is AQE (skew-join splitting + coalescing, SURVEY §4),
which handles *join* skew at runtime; aggregation skew is already mostly
absorbed by partial aggregation (map-side combine). The residual case —
a groupBy whose per-key *partial* states are still too hot for one
reducer (e.g. a count over a handful of mega-keys with billions of rows
each on 1000 executors) — is what ``salted_agg`` is for: an explicit,
deterministic two-phase aggregation.

Phase 1 groups by (key, salt) — the hot key's rows spread over
``buckets`` reducers; phase 2 re-aggregates the per-salt partials by
key. Only algebraic aggregates (whose merge is the same op or a known
combiner) are supported, because the partial→final composition must be
exact: sum/count/min/max. The salt is a deterministic hash of a spread
column (not ``rand()``), so results are reproducible and retries/
speculative tasks can't double-count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (partial aggregate, final merge) per supported algebraic aggregate
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    spread_col: str,
    buckets: int = 32,
) -> DataFrame:
    """Deterministic two-phase (salted) aggregation.

    ``aggs`` maps output column name -> (agg_name, input_col) with
    agg_name in {sum, count, min, max}. ``spread_col`` is any column
    whose values vary within a hot key (an id, a timestamp); its hash
    modulo ``buckets`` is the salt.

    Equivalent to ``df.groupBy(keys).agg(...)`` for every supported
    aggregate — pinned by tests — but the first shuffle carries
    (keys, salt) so no single reducer owns a whole hot key.
    """
    unsupported = [a for a, _ in aggs.values() if a not in _ALGEBRAIC]
    if unsupported:
        raise ValueError(
            f"non-algebraic aggregates not salt-safe: {unsupported}; "
            f"supported: {sorted(_ALGEBRAIC)}"
        )
    salt = F.pmod(F.xxhash64(F.col(spread_col)), F.lit(buckets)).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(
        *[
            _ALGEBRAIC[a][0](F.col(c)).alias(f"__p_{out}")
            for out, (a, c) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[a][1](F.col(f"__p_{out}")).alias(out)
            for out, (a, _) in aggs.items()
        ]
    )


def salted_distinct_count(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    out: str = "n_distinct",
    buckets: int = 32,
) -> DataFrame:
    """COUNT(DISTINCT x) for hot keys: dedup on (keys, x) spread by the
    hash of x itself (the distinct column is its own perfect spread),
    then count per key. Two shuffles, neither concentrated.

    NULLs are excluded up front to match COUNT(DISTINCT x) exactly —
    grouping by a nullable x would otherwise count NULL as one extra
    distinct value per key."""
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(buckets)).alias("__salt")
    dedup = (
        df.filter(F.col(distinct_col).isNotNull())
        .groupBy(*keys, salt, F.col(distinct_col))
        .agg(F.lit(1).alias("__one"))
    )
    return dedup.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))


def salt_column(spread: Column | str, buckets: int) -> Column:
    """The deterministic salt expression used by both operators —
    exposed for callers composing their own salted plans."""
    c = F.col(spread) if isinstance(spread, str) else spread
    return F.pmod(F.xxhash64(c), F.lit(buckets))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    spread_col: str,
    buckets: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Deterministic salted equi-join for a skewed FACT side against a
    small-ish DIM side, for when the runtime paths are unavailable: AQE
    skew-split only fires on sort-merge joins (bucketed tables pin SMJ
    without runtime re-splitting) and a broadcast is off the table when
    the dim exceeds the driver/executor broadcast budget.

    Shape: the fact side gains a deterministic salt (hash of
    ``spread_col`` mod ``buckets``; never ``rand()`` — retries and
    speculative tasks must land identically), the dim side is
    replicated ``buckets`` times via a constant-fan-out explode, and
    the join key becomes (*on, salt) — a hot key's rows spread over
    ``buckets`` reducers instead of pinning one. Dim replication cost
    is buckets * |dim| rows, which is the explicit price: size
    ``buckets`` to the hot key's imbalance, not higher.

    Supported ``how``: inner / left — the fact side's semantics are
    preserved exactly (pinned against the unsalted join in tests).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_fact = fact.withColumn("__salt", salt_column(spread_col, buckets))
    rep = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(b) for b in range(buckets)])),
    )
    return salted_fact.join(rep, [*on, "__salt"], how).drop("__salt")


def join_skew_profile(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Join-key skew profiler: the measurement that decides whether a
    planned join/aggregation on ``key_col`` needs salting (salted_agg /
    salted_join above) or can lean on AQE's skew split. Reports the
    ``top_n`` hottest keys with their share of rows and load-vs-even
    ratio, plus the integer salt factor that would level each
    (ceil(freq / avg) — the ``buckets`` argument salt_column wants).

    Plan: one map-side-combinable (key, freq) aggregate; stats and the
    top-N window run at KEY grain. Exact integers throughout."""
    freqs = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("freq")
    )
    tot = Window.partitionBy()
    ranked = (
        freqs.withColumn("n_keys", F.count(F.lit(1)).over(tot))
        .withColumn("total", F.sum("freq").over(tot))
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("key"))),
        )
        .filter(F.col("rank") <= top_n)
    )
    return ranked.select(
        "rank",
        F.col("key").cast("string").alias("key"),
        F.col("freq").cast("long").alias("freq"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("total").cast("long").alias("total_rows"),
        F.expr("(freq * 1000000) div total").cast("long").alias("share_ppm"),
        # freq relative to the even split (1e6 = average key); decimal
        # widening — freq * n_keys * 1e6 wraps int64 on web-scale key
        # spaces (DuckDB side pairs with HUGEINT)
        F.expr("(CAST(freq AS DECIMAL(38,0)) * n_keys * 1000000) div total")
        .cast("long")
        .alias("load_vs_avg_ppm"),
        # salt factor that levels this key: ceil(freq / (total/n_keys))
        F.expr("(CAST(freq AS DECIMAL(38,0)) * n_keys + total - 1) div total")
        .cast("int")
        .alias("suggested_salt"),
    ).orderBy("rank")
