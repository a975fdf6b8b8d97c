"""Training-data curation queries, batch 2: leakage-free splits and PII
scrubbing. Both are pure map-side expression stages (no shuffle besides
the final tiny rollup) — the shapes that matter most at 100 TB because
they run over every row of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.textfn import (
    PII_EMAIL_RE,
    PII_PHONE_RE,
    pii_counts,
    redact_pii,
)
from dnsflow_clickhouse_spark.operators.sampling import group_split
from dnsflow_clickhouse_spark.queries.catalog_mlops import _sql_poly
from dnsflow_clickhouse_spark.sources.tables import load_table


# --- leakage-free train/val/test split over event groups -------------------


def group_split_leakproof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split of events where ALL of a user's events share one
    split (train/test contamination guard). The oracle recomputes the
    same portable hash assignment in SQL; n_users summing to the global
    distinct-user count proves the partition is exact."""
    ev = load_table(spark, sf_dir, "events")
    df = group_split(
        ev, "user_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7
    )
    return (
        df.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("event_id").alias("sum_event_id"),
        )
        .orderBy("split")
    )


_SQL_USER_BUCKET = (
    f"(({_sql_poly('CAST(user_id AS VARCHAR)', seed=7)}) * 2654435761)"
    " % 1000000007 % 1000000"
)

_GROUP_SPLIT_SQL = f"""
WITH b AS (
  SELECT *, {_SQL_USER_BUCKET} AS bucket FROM events
), s AS (
  SELECT *, CASE WHEN bucket < 800000 THEN 'train'
                 WHEN bucket < 900000 THEN 'val'
                 ELSE 'test' END AS split
  FROM b
)
SELECT split, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(event_id) AS BIGINT) AS sum_event_id
FROM s GROUP BY split ORDER BY split
"""


# --- PII redaction report over the documents corpus ------------------------


def pii_redaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language PII scrub stats. The corpus text is augmented with
    deterministic synthetic PII (an email + a phone derived from the
    doc id) so the patterns are guaranteed to fire; counts and the
    redacted length delta are checked against the RE2 oracle running
    the same patterns."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@ex.com or 139-1234-5678"),
    )
    df = (
        docs.select("lang", aug.alias("__aug"))
        .withColumn("__pii", pii_counts(F.col("__aug")))
        .select(
            "lang",
            F.col("__pii.n_emails").alias("__em"),
            F.col("__pii.n_phones").alias("__ph"),
            (F.length("__aug") - F.length(redact_pii(F.col("__aug")))).alias(
                "__delta"
            ),
        )
    )
    return (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__em").alias("n_emails"),
            F.sum("__ph").alias("n_phones"),
            F.sum("__delta").alias("len_delta"),
        )
        .orderBy("lang")
    )


_PII_SQL = f"""
WITH aug AS (
  SELECT lang,
         text || ' contact u' || CAST(doc_id AS VARCHAR)
              || '@ex.com or 139-1234-5678' AS t
  FROM documents
), m AS (
  SELECT lang,
         len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS em,
         len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS ph,
         length(t) - length(
           regexp_replace(
             regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
             '{PII_PHONE_RE}', '<PHONE>', 'g')) AS delta
  FROM aug
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(em) AS BIGINT) AS n_emails,
       CAST(sum(ph) AS BIGINT) AS n_phones,
       CAST(sum(delta) AS BIGINT) AS len_delta
FROM m GROUP BY lang ORDER BY lang
"""


CURATION_REGISTRY = {
    "group_split_leakproof": (group_split_leakproof, _GROUP_SPLIT_SQL),
    "pii_redaction_report": (pii_redaction_report, _PII_SQL),
}
