"""Fourth query batch: distinct aggregation and CUBE — the grouping
shapes absent from the reference (SURVEY §2.5: "no grouping sets / cube
/ rollup, no distinct-agg") but part of any complete engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.sources.tables import load_table


def distinct_agg_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) alongside plain aggregates — Catalyst plans the
    expand + two-phase aggregate; nothing manual."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 2).alias("value_sum"),
        )
        .orderBy("event_type")
    )


_DISTINCT_AGG_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS value_sum
FROM events GROUP BY event_type ORDER BY event_type
"""


def cube_day_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (day-of-week, event_type) with sentinel fills for
    the rollup rows (the reference's clientName=0 pattern generalized)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("dow", F.dayofweek("ts"))
        .cube("dow", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.coalesce(F.col("dow"), F.lit(-1)).alias("dow"),
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            "cnt",
        )
        .orderBy("dow", "event_type")
    )


_CUBE_SQL = """
SELECT coalesce(dow, -1) AS dow,
       coalesce(event_type, 'ALL') AS event_type,
       count(*) AS cnt
FROM (SELECT dayofweek(ts) + 1 AS dow, event_type FROM events)
GROUP BY CUBE (dow, event_type)
ORDER BY dow, event_type
"""


def authority_slice_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 shape (reference Top20AuthorityDomain, DnsRptCH.scala:63-105):
    regex-membership filter (P5) ahead of the aggregation, then HAVING.
    The rlike is one codegen'd predicate directly above the scan — the
    shuffle only ever sees surviving rows."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").rlike("(data|model|spark|query)"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars"),
        )
        .filter(F.col("n_docs") > 3)
        .orderBy("lang", "source")
    )


_AUTH_SLICE_SQL = """
SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents
WHERE regexp_matches(text, '(data|model|spark|query)')
GROUP BY lang, source HAVING count(*) > 3
ORDER BY lang, source
"""


def hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (resample): per-user hourly event counts
    with MISSING hours materialized as zeros across each user's observed
    span. The hour spine is generated per user from its min/max epoch
    (sequence + explode — rows proportional to user-hours, not a cross
    join with a global calendar), then left-joined with the actual
    hourly counts. Restricted to the first 3 users to keep the output
    test-sized; the plan shape is user-count-independent."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 3)
    hours = ev.withColumn(
        "hour_ep", (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    )
    counts = hours.groupBy("user_id", "hour_ep").agg(
        F.count(F.lit(1)).alias("n")
    )
    spine = (
        hours.groupBy("user_id")
        .agg(F.min("hour_ep").alias("__lo"), F.max("hour_ep").alias("__hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(3600))
            ).alias("hour_ep"),
        )
    )
    return (
        spine.join(counts, ["user_id", "hour_ep"], "left")
        .select(
            "user_id", "hour_ep", F.coalesce("n", F.lit(0)).alias("n_events")
        )
        .orderBy("user_id", "hour_ep")
    )


_GAPFILL_SQL = """
WITH h AS (
  SELECT user_id,
         CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600) AS BIGINT) * 3600 AS hour_ep
  FROM events WHERE user_id < 3
),
counts AS (SELECT user_id, hour_ep, count(*) AS n FROM h GROUP BY 1, 2),
spine AS (
  SELECT user_id, CAST(e AS BIGINT) AS hour_ep
  FROM (SELECT user_id, min(hour_ep) AS lo, max(hour_ep) AS hi FROM h GROUP BY 1),
       UNNEST(generate_series(lo, hi, 3600)) AS u(e)
)
SELECT spine.user_id, spine.hour_ep, coalesce(counts.n, 0) AS n_events
FROM spine LEFT JOIN counts
  ON spine.user_id = counts.user_id AND spine.hour_ep = counts.hour_ep
ORDER BY spine.user_id, spine.hour_ep
"""


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: per user, did view -> click ->
    purchase happen IN ORDER (first occurrences strictly increasing)?
    One aggregation computes the three first-timestamps; the ordering
    predicate is pure expression logic — no self-joins, no window."""
    ev = load_table(spark, sf_dir, "events")
    first_of = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.unix_timestamp("ts"))
    )
    per_user = ev.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    converted = (
        F.col("t_view").isNotNull()
        & F.col("t_click").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_view") < F.col("t_click"))
        & (F.col("t_click") < F.col("t_purchase"))
    )
    return (
        per_user.select("user_id", converted.cast("int").alias("converted"))
        .groupBy("converted")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("converted")
    )


_FUNNEL_CONV_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT CAST(t_view IS NOT NULL AND t_click IS NOT NULL AND t_purchase IS NOT NULL
            AND t_view < t_click AND t_click < t_purchase AS INT) AS converted,
       count(*) AS n_users
FROM per_user GROUP BY 1 ORDER BY 1
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day, then
    for each later day offset, how many of that cohort were active. Two
    aggregations (first-day per user; distinct user-days) and one join
    on user_id — the cohort table is user-count-sized and joins back
    onto the activity aggregate, never onto raw events. Offsets limited
    to the first week to keep the matrix test-sized."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    activity = ev.distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohorts, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day"))
        .filter(F.col("day_offset") <= 7)
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


_COHORT_SQL = """
WITH activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
cohorts AS (SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY 1)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       datediff('day', cohort_day, day) AS day_offset,
       count(DISTINCT activity.user_id) AS n_active
FROM activity JOIN cohorts ON activity.user_id = cohorts.user_id
WHERE datediff('day', cohort_day, day) <= 7
GROUP BY 1, 2 ORDER BY 1, 2
"""


DNS4_REGISTRY = {
    "cohort_retention": (cohort_retention, _COHORT_SQL),
    "hourly_gapfill": (hourly_gapfill, _GAPFILL_SQL),
    "conversion_funnel": (conversion_funnel, _FUNNEL_CONV_SQL),
    "distinct_agg_users": (distinct_agg_users, _DISTINCT_AGG_SQL),
    "cube_day_type": (cube_day_type, _CUBE_SQL),
    "authority_slice_docs": (authority_slice_docs, _AUTH_SLICE_SQL),
}
