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




from dnsflow_clickhouse_spark.functions.textfn import STOPWORDS_EN as _SW

_SW_LIST2 = ", ".join(f"'{w}'" for w in _SW)
_CAPS_SQL = rf"""
WITH t AS (
  SELECT doc_id, source, text,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
  FROM documents
),
q AS (
  SELECT doc_id, source,
         floor((
           0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 200.0)
           + 0.4 * (1.0 - (CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                     / CAST(length(text) AS DOUBLE) END))
           + 0.3 * (CASE WHEN len(toks) = 0 THEN 0.0
                ELSE CAST(len(list_filter(toks, x -> lower(x) IN ({_SW_LIST2}))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) END)
           ) * 1000000 + 0.5) / 1000000 AS quality
  FROM t
),
r AS (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY quality DESC, doc_id) AS rn FROM q),
k AS (SELECT source, count(*) AS n_kept, min(quality) AS min_kept_quality
      FROM r WHERE rn <= 15 GROUP BY source),
n AS (SELECT source, count(*) AS n_docs FROM q GROUP BY source)
SELECT n.source, n.n_docs, k.n_kept, n.n_docs - k.n_kept AS n_dropped,
       k.min_kept_quality
FROM n JOIN k USING (source) ORDER BY n.source
"""

PER_SOURCE_CAP = 15


def per_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document caps — the C4/Common-Crawl curation stage
    that stops any single domain from dominating the mix: within each
    source, keep the top-``PER_SOURCE_CAP`` documents by quality score
    (ties by doc_id) and report per source what the cap did: n_docs,
    n_kept, n_dropped, and the admission bar (the lowest quality that
    still made the cut). One window shuffle on the source key
    (operators.topk.grouped_topk) + one aggregate; at 100 TB the window
    carries (source, quality, doc_id) triples, never the texts."""
    from dnsflow_clickhouse_spark.operators.text_analysis import (
        score_documents,
    )
    from dnsflow_clickhouse_spark.operators.topk import grouped_topk

    d = load_table(spark, sf_dir, "documents")
    scored = score_documents(d).select("doc_id", "source", "quality")
    kept = grouped_topk(
        scored, ["source"], [F.desc("quality"), F.col("doc_id")],
        PER_SOURCE_CAP,
    )
    totals = scored.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    kept_agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("quality").alias("min_kept_quality"),
    )
    return (
        totals.join(kept_agg, "source")
        .select(
            "source", "n_docs", "n_kept",
            (F.col("n_docs") - F.col("n_kept")).alias("n_dropped"),
            "min_kept_quality",
        )
        .orderBy("source")
    )


CURATION_REGISTRY = {
    "group_split_leakproof": (group_split_leakproof, _GROUP_SPLIT_SQL),
    "pii_redaction_report": (pii_redaction_report, _PII_SQL),
    "per_source_caps": (per_source_caps, _CAPS_SQL),
}
