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
SELECT lang, source, count(*) AS n_docs, sum(n_chars) AS chars
FROM documents
WHERE regexp_matches(text, '(data|model|spark|query)')
GROUP BY lang, source HAVING count(*) > 3
ORDER BY lang, source
"""


DNS4_REGISTRY = {
    "distinct_agg_users": (distinct_agg_users, _DISTINCT_AGG_SQL),
    "cube_day_type": (cube_day_type, _CUBE_SQL),
    "authority_slice_docs": (authority_slice_docs, _AUTH_SLICE_SQL),
}
