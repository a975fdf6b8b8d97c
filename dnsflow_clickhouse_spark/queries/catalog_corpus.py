"""Corpus-curation query batch: deterministic sampling, TF-IDF,
quantile quality gating, benchmark decontamination — the remaining
training-data-pipeline surface, each with a DuckDB oracle that replays
the portable primitives (poly_hash sampling keys, integer micro-unit
thresholds, the shared tokenizer/n-gram SQL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.operators.corpus import (
    contamination_report,
    quantile_quality_filter,
    tf_idf_top_terms,
)
from dnsflow_clickhouse_spark.operators.sampling import (
    per_key_sample,
    stratified_sample,
)
from dnsflow_clickhouse_spark.queries.catalog_mlops import _sql_poly, _SQL_TOKS
from dnsflow_clickhouse_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# shared SQL fragments
# ---------------------------------------------------------------------------

# sampling bucket replay: poly_hash(CAST(id AS VARCHAR)), multiplicative
# mix (operators.sampling.MIX_MULT), then the ppm modulus
_SQL_BUCKET_DOC = (
    f"(({_sql_poly('CAST(doc_id AS VARCHAR)')}) * 2654435761) % 1000000007 % 1000000"
)
_SQL_BUCKET_EVT = (
    f"(({_sql_poly('CAST(event_id AS VARCHAR)')}) * 2654435761) % 1000000007 % 1000000"
)


def _sql_grams_n(n: int) -> str:
    """Distinct token n-grams, mirroring operators.dedup.ngrams_from_tokens."""
    terms = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return f"""CASE
  WHEN len(toks) >= {n} THEN list_distinct(list_transform(
        generate_series(1, len(toks) - {n - 1}), i -> {terms}))
  WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
  ELSE CAST([] AS VARCHAR[]) END"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

_STRATA_RATES = {"en": 0.6, "de": 0.4, "fr": 0.3}
_DEFAULT_RATE = 0.1


def stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing stratified sample of the documents corpus:
    60% en / 40% de / 30% fr / 10% everything else, hash-gated on the
    doc id so the selection is a pure function of the data (pure filter,
    zero shuffle)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(
            d, "lang", _STRATA_RATES, "doc_id", default_rate=_DEFAULT_RATE
        )
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


_STRATIFIED_SQL = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_SQL_BUCKET_DOC} <
      CASE lang WHEN 'en' THEN 600000 WHEN 'de' THEN 400000
                WHEN 'fr' THEN 300000 ELSE 100000 END
ORDER BY doc_id
"""


def per_user_event_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3-per-user event reservoir: rank each user's events
    by the portable hash of the event id, keep the 3 smallest. One window
    shuffle on user_id (grouped top-K plan family)."""
    e = load_table(spark, sf_dir, "events")
    return (
        per_key_sample(e, "user_id", "event_id", k=3)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id", "event_id")
    )


_PER_KEY_SQL = f"""
WITH r AS (
  SELECT user_id, event_id, event_type,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY {_SQL_BUCKET_EVT}, event_id) AS rn
  FROM events
)
SELECT user_id, event_id, event_type FROM r WHERE rn <= 3
ORDER BY user_id, event_id
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most document-specific terms per document (tf/df score,
    engine-exact double division, term-string tie-break)."""
    d = load_table(spark, sf_dir, "documents")
    return tf_idf_top_terms(d, "doc_id", "text", k=3).orderBy("doc_id", "rn")


_TFIDF_SQL = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
occ AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM occ GROUP BY doc_id, term),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         CAST(tf.tf AS DOUBLE) / CAST(dfreq.df AS DOUBLE) AS raw,
         CAST(row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) / CAST(dfreq.df AS DOUBLE) DESC,
                    tf.term) AS INTEGER) AS rn
  FROM tf JOIN dfreq USING (term)
)
SELECT doc_id, term, tf, df, round(raw, 6) AS score, rn
FROM scored WHERE rn <= 3
ORDER BY doc_id, rn
"""


def quality_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality gate at the 25th percentile: score every
    document (text-analysis quality expression), take each language's
    discrete p25 in integer micro-units, count survivors."""
    from dnsflow_clickhouse_spark.operators.text_analysis import analyze_documents

    d = load_table(spark, sf_dir, "documents")
    scored = analyze_documents(d.repartition(F.col("doc_id"))).select(
        "doc_id", "lang", "quality"
    )
    return quantile_quality_filter(
        scored, "lang", "quality", "doc_id", q=0.25
    ).orderBy("stratum")


# quality replay matches catalog._DOC_QUALITY_SQL's expression shape
from dnsflow_clickhouse_spark.functions.textfn import STOPWORDS_EN as _SW

_SW_LIST = ", ".join(f"'{w}'" for w in _SW)
_QUALITY_EXPR = rf"""round(
  0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 200.0)
  + 0.4 * (1.0 - (CASE WHEN length(text) = 0 THEN 0.0
       ELSE CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
            / CAST(length(text) AS DOUBLE) END))
  + 0.3 * (CASE WHEN len(toks) = 0 THEN 0.0
       ELSE CAST(len(list_filter(toks, t -> lower(t) IN ({_SW_LIST}))) AS DOUBLE)
            / CAST(len(toks) AS DOUBLE) END),
  6)"""

_QUANTILE_GATE_SQL = rf"""
WITH t AS (
  SELECT doc_id, lang, text, {_SQL_TOKS} AS toks FROM documents
),
s AS (
  SELECT doc_id, lang AS stratum,
         CAST(round({_QUALITY_EXPR} * 1000000) AS BIGINT) AS si
  FROM t
),
r AS (
  SELECT stratum, si,
         row_number() OVER (PARTITION BY stratum ORDER BY si, doc_id) AS rn,
         count(*) OVER (PARTITION BY stratum) AS n
  FROM s
),
thr AS (
  SELECT stratum, si AS thr FROM r
  WHERE rn = CAST(ceil(0.25 * n) AS BIGINT)
)
SELECT s.stratum,
       max(thr.thr) AS threshold_micro,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN s.si >= thr.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM s JOIN thr ON s.stratum = thr.stratum
GROUP BY s.stratum
ORDER BY s.stratum
"""


def decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination sweep: docs with doc_id % 20 == 0 play
    the held-out eval suite; flag every training doc sharing a distinct
    token 4-gram with it (broadcast the benchmark gram set)."""
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    train = d.filter(F.col("doc_id") % 20 != 0)
    return contamination_report(train, bench, "doc_id", "text", ngram=4).orderBy(
        "doc_id"
    )


_DECONTAM_SQL = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, {_sql_grams_n(4)} AS grams FROM t),
e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
bench AS (SELECT doc_id AS bench_id, gram FROM e WHERE doc_id % 20 = 0),
train AS (SELECT doc_id, gram FROM e WHERE doc_id % 20 != 0)
SELECT train.doc_id,
       count(DISTINCT train.gram) AS n_shared_grams,
       count(DISTINCT bench.bench_id) AS n_bench_docs
FROM train JOIN bench USING (gram)
GROUP BY train.doc_id
ORDER BY train.doc_id
"""


CORPUS_REGISTRY = {
    "stratified_doc_sample": (stratified_doc_sample, _STRATIFIED_SQL),
    "per_user_event_sample": (per_user_event_sample, _PER_KEY_SQL),
    "tfidf_top_terms": (tfidf_top_terms, _TFIDF_SQL),
    "quality_quantile_gate": (quality_quantile_gate, _QUANTILE_GATE_SQL),
    "decontamination_report": (decontamination_report, _DECONTAM_SQL),
}
