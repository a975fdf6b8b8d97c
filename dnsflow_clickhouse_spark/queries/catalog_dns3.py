"""Third query batch: the geo range-join scale path (prefix-bucketed
equi-join, reference IpSearch.java:63-74 / SURVEY §2.1 S7), full
window-function breadth, the A22 tag-profile pattern, and keep-first
record dedup.

Oracle stance: the SQL expresses the *semantics* (DuckDB can compute the
synthetic geo labels arithmetically); the Spark side must produce the
same result through the operator under test (broadcast hash range join,
window rank, broadcast dim join + array ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.numeric import portable_round

from dnsflow_clickhouse_spark.operators.range_join import prefix_bucketed_range_join
from dnsflow_clickhouse_spark.sources.tables import load_table


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- S7/J5 scale path: prefix-bucketed broadcast range join -------------
# Synthetic geo rules: every first octet o in [1, 223] splits into a low
# and a high half-range, labeled region R{o%7} / tier {half}. 446
# disjoint rules — enough that a naive BNLJ probe scans all of them while
# the bucketed plan probes ~2.

_OCTETS = range(1, 224)
_HALF = 1 << 23


def _geo_rules(spark: SparkSession) -> DataFrame:
    rows = []
    for o in _OCTETS:
        base = o << 24
        rows.append((base, base + _HALF - 1, f"R{o % 7}", 0))
        rows.append((base + _HALF, base + (1 << 24) - 1, f"R{o % 7}", 1))
    return spark.createDataFrame(
        rows, "min_long_ip long, max_long_ip long, region string, tier int"
    )


def _synth_ip_long() -> F.Column:
    e = F.col("event_id")
    return (
        (e % 223 + 1) * 16777216
        + ((e * 37) % 256) * 65536
        + ((e * 53) % 256) * 256
        + ((e * 71) % 256)
    ).cast("long")


def geo_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(region, tier) event counts via the prefix-bucketed broadcast
    range join — the reference's binary-search geo lookup re-expressed as
    an equi-join on the first octet plus a residual range predicate."""
    ev = _ev(spark, sf_dir).select(_synth_ip_long().alias("ip_long"))
    joined = prefix_bucketed_range_join(
        ev,
        _geo_rules(spark),
        "ip_long",
        fact_bucket=(F.col("ip_long") / F.lit(16777216)).cast("long"),
        defaults={"region": "unknown", "tier": -1},
    )
    return (
        joined.groupBy("region", "tier")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("ip_long").alias("ip_sum"))
        .orderBy("region", "tier")
    )


_GEO_ROLLUP_SQL = """
WITH ips AS (
  SELECT (event_id % 223 + 1) * 16777216 + ((event_id * 37) % 256) * 65536
         + ((event_id * 53) % 256) * 256 + ((event_id * 71) % 256) AS ip_long
  FROM events
)
SELECT 'R' || CAST((ip_long // 16777216) % 7 AS VARCHAR) AS region,
       CAST((ip_long % 16777216) // 8388608 AS INT) AS tier,
       count(*) AS cnt, CAST(sum(ip_long) AS BIGINT) AS ip_sum
FROM ips GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- window-function breadth: lead / dense_rank / ntile / percent_rank --


def window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("event_id")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.lead("event_id", 1).over(w).alias("next_event_id"),
            F.dense_rank().over(Window.partitionBy("user_id").orderBy("event_type")).alias("type_rank"),
            F.ntile(4).over(w).alias("quartile"),
            portable_round(F.percent_rank().over(w), 6).alias("pct_rank"),
            portable_round(
                F.avg(cents).over(w.rowsBetween(-2, 0)) / 100.0, 2
            ).alias("moving_avg3"),
        )
        .orderBy("user_id", "event_id")
    )


_WINDOW_SUITE_SQL = """
SELECT user_id, event_id,
       lead(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_event_id,
       CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS INT) AS type_rank,
       CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY event_id) AS INT) AS quartile,
       floor(percent_rank() OVER (PARTITION BY user_id ORDER BY event_id) * 1000000 + 0.5) / 1000000 AS pct_rank,
       floor(avg(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 100.0 * 100 + 0.5) / 100 AS moving_avg3
FROM events WHERE user_id < 10
ORDER BY user_id, event_id
"""


# --- A22 tag profiles: distinct pairs -> broadcast tag dim -> flattened
#     distinct tag array (UserRpt.scala:141-191), exploded to scalars ---

_TAG_DIM = [
    ("click", "engage", "ui", "web"),
    ("view", "engage", "passive", "web"),
    ("purchase", "convert", "money", "web"),
    ("signup", "convert", "identity", "web"),
    # 'error' intentionally unmapped -> all-unknown, dropped like the
    # reference's 未知|未知|未知 filter
]


def user_tag_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).filter(F.col("user_id") < 50)
    dim = spark.createDataFrame(
        _TAG_DIM, "event_type string, tag1 string, tag2 string, tag3 string"
    )
    pairs = ev.select("user_id", "event_type").dropDuplicates()
    tagged = pairs.join(F.broadcast(dim), "event_type", "left").select(
        "user_id",
        F.array(
            F.coalesce("tag1", F.lit("unknown")),
            F.coalesce("tag2", F.lit("unknown")),
            F.coalesce("tag3", F.lit("unknown")),
        ).alias("tags3"),
    )
    known = tagged.filter(~F.array_contains("tags3", "unknown"))
    profiles = known.groupBy("user_id").agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("tags3")))).alias("tags")
    )
    return (
        profiles.select("user_id", F.explode("tags").alias("tag"))
        .orderBy("user_id", "tag")
    )


_USER_TAGS_SQL = """
WITH dim(event_type, tag1, tag2, tag3) AS (
  VALUES ('click','engage','ui','web'), ('view','engage','passive','web'),
         ('purchase','convert','money','web'), ('signup','convert','identity','web')
),
pairs AS (SELECT DISTINCT user_id, event_type FROM events WHERE user_id < 50),
tagged AS (
  SELECT p.user_id, d.tag1, d.tag2, d.tag3
  FROM pairs p JOIN dim d USING (event_type)
),
flat AS (
  SELECT DISTINCT user_id, tag FROM (
    SELECT user_id, tag1 AS tag FROM tagged
    UNION ALL SELECT user_id, tag2 FROM tagged
    UNION ALL SELECT user_id, tag3 FROM tagged
  )
)
SELECT user_id, tag FROM flat ORDER BY user_id, tag
"""


# --- keep-first dedup (canonical-record selection) ----------------------


def dedup_keep_first_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One canonical (earliest) event per (user_id, event_type): the
    window-rank keep-first pattern every ingest pipeline needs."""
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")
    )


_DEDUP_FIRST_SQL = """
SELECT user_id, event_type, event_id FROM (
  SELECT user_id, event_type, event_id,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1 ORDER BY user_id, event_type
"""


def range_frame_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame sliding window (the frame type window_suite's ROWS
    frames don't reach): per user, the count and exact-cents sum of the
    events in the trailing hour of *event time* — rangeBetween on epoch
    seconds, so rows at identical timestamps share one frame regardless
    of physical order. One window shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("ep"),
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ep")
        .rangeBetween(-3599, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ep",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum("v_cents").over(w).alias("sum_cents_1h"),
    ).orderBy("user_id", "event_id")


_RANGE_FRAME_SQL = """
SELECT user_id, event_id, ep,
       count(*) OVER w AS n_1h,
       CAST(sum(v_cents) OVER w AS BIGINT) AS sum_cents_1h
FROM (SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             CAST(round(value * 100) AS BIGINT) AS v_cents
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ep
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def null_semantics_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling semantics under one roof: a derived nullable
    measure and a nullable group key; count(*) vs count(col), null-
    excluding sum/min, null-safe equality (<=>), and an explicit null
    group with pinned NULLS-LAST ordering — the semantics corner every
    engine must agree on before any report built on it can."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        F.when(F.col("event_type") != "error", F.round(F.col("value") * 100))
        .cast("long")
        .alias("ok_cents"),
        F.when(
            F.col("event_type").isin("click", "view"), F.col("event_type")
        ).alias("k"),
    )
    return (
        d.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("ok_cents").alias("n_vals"),
            F.sum("ok_cents").alias("sum_cents"),
            F.min("ok_cents").alias("min_cents"),
            F.sum(F.col("k").eqNullSafe(F.lit(None).cast("string")).cast("long")
                  ).alias("n_null_safe_hits"),
        )
        .orderBy(F.col("k").asc_nulls_last())
    )


_NULL_SEMANTICS_SQL = """
WITH d AS (
  SELECT CASE WHEN event_type <> 'error'
              THEN CAST(round(value * 100) AS BIGINT) END AS ok_cents,
         CASE WHEN event_type IN ('click', 'view') THEN event_type END AS k
  FROM events
)
SELECT k, count(*) AS n_rows, count(ok_cents) AS n_vals,
       CAST(sum(ok_cents) AS BIGINT) AS sum_cents, min(ok_cents) AS min_cents,
       CAST(sum(CASE WHEN k IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe_hits
FROM d GROUP BY k ORDER BY k ASC NULLS LAST
"""


DNS3_REGISTRY = {
    "range_frame_rolling": (range_frame_rolling, _RANGE_FRAME_SQL),
    "null_semantics_report": (null_semantics_report, _NULL_SEMANTICS_SQL),
    "geo_region_rollup": (geo_region_rollup, _GEO_ROLLUP_SQL),
    "window_suite": (window_suite, _WINDOW_SUITE_SQL),
    "user_tag_profiles": (user_tag_profiles, _USER_TAGS_SQL),
    "dedup_keep_first_events": (dedup_keep_first_events, _DEDUP_FIRST_SQL),
}
