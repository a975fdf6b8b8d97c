"""Training-data pipeline query batch, round 7: robust outlier gating
(median/MAD), KS distribution drift, masked-LM sample planning,
curriculum scheduling, cross-document n-gram novelty, Benford
first-digit forensics, Pareto/skyline curation frontier, chi-squared
token-vs-source feature selection; second batch: Okapi BM25 lexical
retrieval (exact integer quantization), Matryoshka truncated-dim KNN
recall, and winsorized robust means.

Every oracle replays the engine's portable primitives: discrete
ceil(q*n) order statistics on value HISTOGRAMS (no interpolation), ppm
integers via nonnegative ``div`` == DuckDB ``//``, decimal(38,0)
widening where int64 would wrap, the shared whitespace tokenizer SQL,
and the square-mix positional hash (pure modular arithmetic — no
engine RNG anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.queries.catalog import _SW_LIST
from dnsflow_clickhouse_spark.queries.catalog_mlops import _SQL_TOKS, _sql_quant
from dnsflow_clickhouse_spark.sources.tables import load_table

# the quality_score() expression as DuckDB SQL over (text, toks) —
# identical arithmetic to operators.text_analysis.score_documents
_SQL_QUALITY = f"""floor((
  0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 200.0)
  + 0.4 * (1.0 - (CASE WHEN length(text) = 0 THEN 0.0
       ELSE CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
            / CAST(length(text) AS DOUBLE) END))
  + 0.3 * (CASE WHEN len(toks) = 0 THEN 0.0
       ELSE CAST(len(list_filter(toks, t -> lower(t) IN ({_SW_LIST}))) AS DOUBLE)
            / CAST(len(toks) AS DOUBLE) END)
  ) * 1000000 + 0.5) / 1000000"""


# ---------------------------------------------------------------------------
# robust outlier gate (median + MAD)
# ---------------------------------------------------------------------------


def mad_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source robust length gate: lo-median + MAD over n_chars,
    counting docs beyond 3 MADs — the curation length filter that a few
    giant spam docs cannot drag (unlike mean/stddev)."""
    from dnsflow_clickhouse_spark.operators.profiling import mad_outliers

    d = load_table(spark, sf_dir, "documents")
    return mad_outliers(d, "source", "n_chars", k=3).orderBy("source")


_MAD_SQL = """
WITH hist AS (SELECT source, CAST(n_chars AS BIGINT) AS v, count(*) AS cnt
              FROM documents GROUP BY 1, 2),
c1 AS (SELECT source, v, cnt,
              sum(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
              sum(cnt) OVER (PARTITION BY source) AS n FROM hist),
med AS (SELECT source,
               min(CASE WHEN cum >= CAST(ceil(n / 2.0) AS BIGINT) THEN v END) AS med,
               CAST(max(n) AS BIGINT) AS n
        FROM c1 GROUP BY source),
dev AS (SELECT h.source, abs(h.v - m.med) AS v, sum(h.cnt) AS cnt
        FROM hist h JOIN med m USING (source) GROUP BY 1, 2),
c2 AS (SELECT source, v, cnt,
              sum(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
              sum(cnt) OVER (PARTITION BY source) AS n FROM dev),
mad AS (SELECT source,
               min(CASE WHEN cum >= CAST(ceil(n / 2.0) AS BIGINT) THEN v END) AS mad
        FROM c2 GROUP BY source),
outs AS (SELECT h.source,
                CAST(sum(CASE WHEN abs(h.v - m.med) > 3 * d.mad
                              THEN h.cnt ELSE 0 END) AS BIGINT) AS n_outliers
         FROM hist h JOIN med m USING (source) JOIN mad d USING (source)
         GROUP BY 1)
SELECT m.source, m.n, m.med, d.mad, o.n_outliers
FROM med m JOIN mad d USING (source) JOIN outs o USING (source)
ORDER BY m.source
"""


# ---------------------------------------------------------------------------
# KS drift, each source vs rest
# ---------------------------------------------------------------------------


def ks_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic per source (vs the rest of the corpus)
    over n_chars, with both empirical CDFs ppm-quantized before the max
    gap — the full-CDF drift screen PSI's fixed bins can miss."""
    from dnsflow_clickhouse_spark.operators.profiling import ks_by_group

    d = load_table(spark, sf_dir, "documents")
    return ks_by_group(d, "source", "n_chars").orderBy("source")


_KS_SQL = """
WITH hist AS (SELECT source, CAST(n_chars AS BIGINT) AS v, count(*) AS cnt
              FROM documents GROUP BY 1, 2),
grp AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_g FROM hist GROUP BY 1),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tot FROM hist),
va AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum_all
       FROM (SELECT v, sum(cnt) AS cnt FROM hist GROUP BY v)),
grid AS (SELECT g.source, g.n_g, va.v, va.cum_all FROM grp g CROSS JOIN va),
j AS (SELECT grid.source, grid.n_g, grid.v, grid.cum_all,
             sum(coalesce(h.cnt, 0))
               OVER (PARTITION BY grid.source ORDER BY grid.v) AS cum_g
      FROM grid LEFT JOIN hist h ON h.source = grid.source AND h.v = grid.v),
d AS (SELECT source, n_g, v,
             abs(cum_g * 1000000 // n_g
                 - CASE WHEN n_tot - n_g > 0
                        THEN (cum_all - cum_g) * 1000000 // (n_tot - n_g)
                        ELSE 1000000 END) AS d_ppm
      FROM j CROSS JOIN tot),
mx AS (SELECT source, max(d_ppm) AS mx FROM d GROUP BY source)
SELECT d.source, CAST(max(d.n_g) AS BIGINT) AS n,
       CAST(max(d.d_ppm) AS BIGINT) AS ks_ppm,
       min(CASE WHEN d.d_ppm = mx.mx THEN d.v END) AS at_v
FROM d JOIN mx USING (source) GROUP BY d.source ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# masked-LM sample plan
# ---------------------------------------------------------------------------


def masked_lm_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic BERT-style 15% masking plan per document (mask
    positions from a pure modular mix of (doc_id, pos) — reproducible
    training data, no engine RNG)."""
    from dnsflow_clickhouse_spark.operators.text_analysis import (
        mask_positions_report,
    )

    d = load_table(spark, sf_dir, "documents")
    return (
        mask_positions_report(d, "doc_id", "text", rate_pct=15, seed=0)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


_MASKED_SQL = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
e AS (SELECT doc_id, i - 1 AS pos
      FROM t, UNNEST(generate_series(1, len(toks))) AS u(i)),
m AS (SELECT doc_id, pos,
             CASE WHEN ((y * y + y) % 1000003) % 100 < 15 THEN 1 ELSE 0 END AS is_masked
      FROM (SELECT doc_id, pos,
                   ((doc_id % 1000003) * 131071 + pos * 8191 + 0) % 1000003 AS y
            FROM e)),
per AS (SELECT doc_id, count(*) AS n_toks, sum(is_masked) AS n_masked,
               coalesce(min(CASE WHEN is_masked = 1 THEN pos END), -1) AS first_mask
        FROM m GROUP BY doc_id)
SELECT t.doc_id,
       CAST(coalesce(per.n_toks, 0) AS BIGINT) AS n_toks,
       CAST(coalesce(per.n_masked, 0) AS BIGINT) AS n_masked,
       CAST(CASE WHEN coalesce(per.n_toks, 0) > 0
                 THEN per.n_masked * 1000000 // per.n_toks ELSE 0 END AS BIGINT) AS mask_ppm,
       CAST(coalesce(per.first_mask, -1) AS BIGINT) AS first_mask
FROM t LEFT JOIN per USING (doc_id) ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# curriculum schedule
# ---------------------------------------------------------------------------


def curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-quintile x length-tercile curriculum buckets with a
    deterministic easy-to-hard phase order; buckets cut by VALUE at
    discrete quantile cutpoints so ties never split."""
    from dnsflow_clickhouse_spark.operators.sampling import curriculum_buckets
    from dnsflow_clickhouse_spark.operators.text_analysis import score_documents

    d = load_table(spark, sf_dir, "documents")
    scored = score_documents(d)
    return curriculum_buckets(
        scored, "quality", "n_chars", weight_col="toks", n_q=5, n_len=3
    )


_CURRICULUM_SQL = f"""
WITH t AS (SELECT doc_id, text, CAST(n_chars AS BIGINT) AS n_chars,
                  {_SQL_TOKS} AS toks FROM documents),
q AS (SELECT doc_id, n_chars, CAST(len(toks) AS BIGINT) AS toks,
             {_SQL_QUALITY} AS quality FROM t),
qc AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, sum(cnt) OVER () AS n
       FROM (SELECT quality AS v, count(*) AS cnt FROM q GROUP BY 1)),
qcuts AS (SELECT
  min(CASE WHEN cum >= (1 * n + 4) // 5 THEN v END) AS c1,
  min(CASE WHEN cum >= (2 * n + 4) // 5 THEN v END) AS c2,
  min(CASE WHEN cum >= (3 * n + 4) // 5 THEN v END) AS c3,
  min(CASE WHEN cum >= (4 * n + 4) // 5 THEN v END) AS c4 FROM qc),
lc AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, sum(cnt) OVER () AS n
       FROM (SELECT n_chars AS v, count(*) AS cnt FROM q GROUP BY 1)),
lcuts AS (SELECT
  min(CASE WHEN cum >= (1 * n + 2) // 3 THEN v END) AS l1,
  min(CASE WHEN cum >= (2 * n + 2) // 3 THEN v END) AS l2 FROM lc),
tagged AS (SELECT q.*,
  1 + CAST(q.quality > qcuts.c1 AS INT) + CAST(q.quality > qcuts.c2 AS INT)
    + CAST(q.quality > qcuts.c3 AS INT) + CAST(q.quality > qcuts.c4 AS INT) AS q_bucket,
  1 + CAST(q.n_chars > lcuts.l1 AS INT) + CAST(q.n_chars > lcuts.l2 AS INT) AS len_bucket
  FROM q, qcuts, lcuts)
SELECT CAST((5 - q_bucket) * 3 + len_bucket AS BIGINT) AS phase,
       CAST(q_bucket AS BIGINT) AS q_bucket,
       CAST(len_bucket AS BIGINT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS total_weight,
       min(quality) AS min_quality, max(quality) AS max_quality
FROM tagged GROUP BY q_bucket, len_bucket ORDER BY phase
"""


# ---------------------------------------------------------------------------
# cross-document bigram novelty
# ---------------------------------------------------------------------------


def bigram_novelty_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document content originality: fraction of distinct bigrams
    appearing in no other document (df = 1), exact ppm."""
    from dnsflow_clickhouse_spark.operators.text_analysis import bigram_novelty

    d = load_table(spark, sf_dir, "documents")
    return (
        bigram_novelty(d, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


_NOVELTY_SQL = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (SELECT doc_id,
  CASE WHEN len(toks) >= 2 THEN list_distinct(list_transform(
         generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1]))
       WHEN len(toks) = 1 THEN [array_to_string(toks, ' ')]
       ELSE CAST([] AS VARCHAR[]) END AS grams FROM t),
e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
dfq AS (SELECT gram, count(DISTINCT doc_id) AS gdf FROM e GROUP BY 1),
per AS (SELECT e.doc_id, count(*) AS n_grams,
               sum(CASE WHEN gdf = 1 THEN 1 ELSE 0 END) AS n_novel
        FROM e JOIN dfq USING (gram) GROUP BY 1)
SELECT t.doc_id,
       CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
       CAST(CASE WHEN coalesce(n_grams, 0) > 0
                 THEN n_novel * 1000000 // n_grams ELSE 0 END AS BIGINT) AS novel_ppm
FROM t LEFT JOIN per USING (doc_id) ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# Benford first-digit forensics
# ---------------------------------------------------------------------------


def benford_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals — the
    fabricated/unit-mangled-numbers screen; digit from the integer
    part's decimal string (no log10 float boundary)."""
    from dnsflow_clickhouse_spark.operators.profiling import benford_profile

    o = load_table(spark, sf_dir, "orders")
    return benford_profile(o, "o_totalprice")


_BENFORD_SQL = """
WITH f AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
           FROM orders WHERE o_totalprice >= 1),
a AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1),
t AS (SELECT sum(n) AS tot FROM a)
SELECT digit, n, CAST(n * 1000000 // tot AS BIGINT) AS ppm
FROM a, t ORDER BY digit
"""


# ---------------------------------------------------------------------------
# Pareto / skyline curation frontier
# ---------------------------------------------------------------------------


def pareto_quality_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of (quality, n_chars): the documents no other document
    beats on both axes — the keep-first shortlist of a quality-vs-length
    curation trade-off, computed without any O(n^2) dominance test."""
    from dnsflow_clickhouse_spark.operators.profiling import pareto_frontier
    from dnsflow_clickhouse_spark.operators.text_analysis import score_documents

    d = load_table(spark, sf_dir, "documents")
    scored = score_documents(d)
    return pareto_frontier(scored, "doc_id", "quality", "n_chars").select(
        F.col("id").alias("doc_id"),
        F.col("x").alias("quality"),
        F.col("y").alias("n_chars"),
    )


_PARETO_SQL = f"""
WITH t AS (SELECT doc_id, text, CAST(n_chars AS BIGINT) AS n_chars,
                  {_SQL_TOKS} AS toks FROM documents),
q AS (SELECT doc_id, n_chars, {_SQL_QUALITY} AS quality FROM t),
byx AS (SELECT quality AS x, max(n_chars) AS ymax FROM q GROUP BY 1),
h AS (SELECT x, ymax,
             max(ymax) OVER (ORDER BY x DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hi
      FROM byx)
SELECT q.doc_id, q.quality, q.n_chars
FROM q JOIN h ON q.quality = h.x
WHERE q.n_chars = h.ymax AND (h.hi IS NULL OR q.n_chars > h.hi)
ORDER BY q.quality DESC, q.doc_id
"""


# ---------------------------------------------------------------------------
# chi-squared token-vs-source association
# ---------------------------------------------------------------------------


def chi2_token_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tokens per source by exact chi-squared association
    (one-vs-rest 2x2 on document presence, decimal(38,0) arithmetic) —
    the feature-selection screen for 'what characterizes this slice'."""
    from dnsflow_clickhouse_spark.operators.text_analysis import (
        chi2_token_assoc,
    )

    d = load_table(spark, sf_dir, "documents")
    return chi2_token_assoc(
        d, "source", "doc_id", "text", min_df=5, top_k=3
    ).orderBy("source", "rnk")


_CHI2_SQL = f"""
WITH t AS (SELECT source, doc_id, list_distinct({_SQL_TOKS}) AS toks
           FROM documents),
pres AS (SELECT source AS g, doc_id, unnest(toks) AS tok FROM t),
tokdf AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_tok FROM pres GROUP BY 1),
grp AS (SELECT source AS g, CAST(count(*) AS BIGINT) AS n_g FROM t GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM t),
gt AS (SELECT g, tok, CAST(count(*) AS BIGINT) AS a FROM pres GROUP BY 1, 2),
cells AS (SELECT grp.g, tk.tok, tk.n_tok, grp.n_g,
                 coalesce(gt.a, 0) AS a, tot.n_tot
          FROM grp
          CROSS JOIN (SELECT * FROM tokdf WHERE n_tok >= 5) tk
          LEFT JOIN gt ON gt.g = grp.g AND gt.tok = tk.tok
          CROSS JOIN tot),
abcd AS (SELECT g, tok, n_tok, a,
                n_g - a AS b, n_tok - a AS c,
                n_tot - n_g - n_tok + a AS d, n_tot
         FROM cells),
sc AS (SELECT g, tok, a, n_tok,
              CAST((CAST(n_tot AS HUGEINT) * (a * d - b * c) * (a * d - b * c)
                    * 1000000)
                   // (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d))
                   AS BIGINT) AS chi2_micro
       FROM abcd
       WHERE (a + b) > 0 AND (c + d) > 0 AND (a + c) > 0 AND (b + d) > 0),
r AS (SELECT *, row_number() OVER (PARTITION BY g
                                   ORDER BY chi2_micro DESC, tok) AS rnk
      FROM sc)
SELECT g AS source, tok, a, n_tok, chi2_micro, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3 ORDER BY source, rnk
"""


TRAINDATA_REGISTRY = {
    "mad_outlier_docs": (mad_outlier_docs, _MAD_SQL),
    "ks_drift_by_source": (ks_drift_by_source, _KS_SQL),
    "masked_lm_samples": (masked_lm_samples, _MASKED_SQL),
    "curriculum_schedule": (curriculum_schedule, _CURRICULUM_SQL),
    "bigram_novelty_report": (bigram_novelty_report, _NOVELTY_SQL),
    "benford_order_totals": (benford_order_totals, _BENFORD_SQL),
    "pareto_quality_frontier": (pareto_quality_frontier, _PARETO_SQL),
    "chi2_token_source": (chi2_token_source, _CHI2_SQL),
}


# ---------------------------------------------------------------------------
# BM25 lexical retrieval
# ---------------------------------------------------------------------------

_BM25_QUERIES = [
    (1, ["hash", "table", "join"]),
    (2, ["spark", "sort", "window"]),
    (3, ["scan", "value", "fast"]),
]
_BM25_K = 10


def bm25_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 per query over the documents corpus (k1=1.2,
    b=0.75) — exact integer-quantized scoring, no float accumulation
    (operators/retrieval.py docstring for the denominator-clearing
    identity)."""
    from dnsflow_clickhouse_spark.operators.retrieval import bm25_topk

    d = load_table(spark, sf_dir, "documents")
    return bm25_topk(d, _BM25_QUERIES, "doc_id", "text", k=_BM25_K).orderBy(
        "query_id", "rnk"
    )


_BM25_QT_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
)

_BM25_SQL = f"""
WITH t AS (SELECT doc_id AS id, {_SQL_TOKS} AS toks FROM documents),
lens AS (SELECT id, CAST(len(toks) AS BIGINT) AS len FROM t),
post AS (SELECT id, tok AS term, CAST(count(*) AS BIGINT) AS tf
         FROM (SELECT id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
stats AS (SELECT CAST(count(*) AS BIGINT) AS d_cnt,
                 CAST(sum(len) AS BIGINT) AS t_cnt FROM lens),
qt(query_id, term) AS (VALUES {_BM25_QT_VALUES}),
dfreq AS (SELECT term, CAST(count(DISTINCT id) AS BIGINT) AS df
          FROM post WHERE term IN (SELECT term FROM qt) GROUP BY 1),
idf AS (SELECT term,
               CAST(floor(log2(CAST(2 * d_cnt - 2 * df + 1 AS DOUBLE)
                                / CAST(2 * df + 1 AS DOUBLE) + 1.0)
                          * 1000000 + 0.5) AS BIGINT) AS idf_micro
        FROM dfreq CROSS JOIN stats),
scored AS (
  SELECT qt.query_id, post.id,
         CAST(sum((idf.idf_micro *
                   (CAST(22 AS HUGEINT) * t_cnt * tf * 1000000
                    // (CAST(10 AS HUGEINT) * t_cnt * tf
                        + 3 * t_cnt + 9 * len * d_cnt)))
                  // 1000000) AS BIGINT) AS score_micro
  FROM post
  JOIN qt USING (term) JOIN idf USING (term)
  JOIN lens USING (id) CROSS JOIN stats
  GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_micro DESC, id) AS rnk
      FROM scored)
SELECT CAST(query_id AS BIGINT) AS query_id, id AS doc_id, score_micro,
       CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= {_BM25_K} ORDER BY query_id, rnk
"""


# ---------------------------------------------------------------------------
# Matryoshka truncation recall
# ---------------------------------------------------------------------------

_TRUNC_DIM = 8


def truncated_knn_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation eval (Kusupati 2022): exact cosine
    top-3 neighbors using only the FIRST 8 of 64 embedding dims vs the
    full-dimension top-3, recall per query — "how much ANN quality does
    a cheap low-dim prefilter keep?". Both sides run the same exact
    GEMM kernel; the slice happens before quantization."""
    from dnsflow_clickhouse_spark.operators.similarity import cosine_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    full = cosine_topk(q, e, "vec_id", "embedding", 3).select(
        "query_id", "neighbor_id"
    )
    sliced = e.select(
        "vec_id", F.slice(F.col("embedding"), 1, _TRUNC_DIM).alias("emb8")
    )
    trunc = cosine_topk(
        sliced.filter(F.col("vec_id") < 20), sliced, "vec_id", "emb8", 3
    ).select("query_id", F.col("neighbor_id").alias("t_neighbor"))
    hits = (
        full.join(
            trunc,
            (full.query_id == trunc.query_id)
            & (full.neighbor_id == trunc.t_neighbor),
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_match"))
    )
    qs = full.select("query_id").distinct()
    return (
        qs.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_match", F.lit(0)).cast("long").alias("n_match"),
            F.expr("coalesce(n_match, 0) * 1000000 div 3")
            .cast("long")
            .alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


_TRUNC_SQL = f"""
WITH q AS (SELECT vec_id, {_sql_quant('embedding')} AS qv,
                  {_sql_quant('embedding[1:8]')} AS tv FROM embeddings),
fp AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         floor(list_dot_product(a.qv, b.qv)
               / (sqrt(list_dot_product(a.qv, a.qv)) * sqrt(list_dot_product(b.qv, b.qv))) * 1000000 + 0.5) / 1000000 AS cosine
  FROM q a JOIN q b ON a.vec_id < 20 AND a.vec_id != b.vec_id),
fr AS (SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk FROM fp),
full3 AS (SELECT query_id, neighbor_id FROM fr WHERE rnk <= 3),
tp AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         floor(list_dot_product(a.tv, b.tv)
               / (sqrt(list_dot_product(a.tv, a.tv)) * sqrt(list_dot_product(b.tv, b.tv))) * 1000000 + 0.5) / 1000000 AS cosine
  FROM q a JOIN q b ON a.vec_id < 20 AND a.vec_id != b.vec_id),
tr AS (SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk FROM tp),
trunc3 AS (SELECT query_id, neighbor_id FROM tr WHERE rnk <= 3),
hits AS (SELECT f.query_id, count(*) AS n_match
         FROM full3 f JOIN trunc3 t
           ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
         GROUP BY 1)
SELECT q2.query_id,
       CAST(coalesce(h.n_match, 0) AS BIGINT) AS n_match,
       CAST(coalesce(h.n_match, 0) * 1000000 // 3 AS BIGINT) AS recall_ppm
FROM (SELECT DISTINCT query_id FROM full3) q2
LEFT JOIN hits h USING (query_id) ORDER BY query_id
"""


# ---------------------------------------------------------------------------
# winsorized robust mean
# ---------------------------------------------------------------------------


def winsorized_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source winsorized mean document length: clamp to the discrete
    [p5, p95] cutpoints and average — the robust mean that pairs with
    mad_outlier_docs' flag counts."""
    from dnsflow_clickhouse_spark.operators.profiling import winsorized_stats

    d = load_table(spark, sf_dir, "documents")
    return winsorized_stats(d, "source", "n_chars", tail_pct=5).orderBy(
        "source"
    )


_WINSOR_SQL = """
WITH hist AS (SELECT source, CAST(n_chars AS BIGINT) AS v, count(*) AS cnt
              FROM documents GROUP BY 1, 2),
c AS (SELECT source, v, cnt,
             sum(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
             sum(cnt) OVER (PARTITION BY source) AS n FROM hist),
cuts AS (SELECT source,
                min(CASE WHEN cum >= (5 * n + 99) // 100 THEN v END) AS p_lo,
                min(CASE WHEN cum >= (95 * n + 99) // 100 THEN v END) AS p_hi,
                CAST(max(n) AS BIGINT) AS n
         FROM c GROUP BY source),
cl AS (SELECT h.source, least(greatest(h.v, cuts.p_lo), cuts.p_hi) AS cv,
              h.cnt, cuts.n, cuts.p_lo, cuts.p_hi
       FROM hist h JOIN cuts USING (source))
SELECT source, CAST(max(n) AS BIGINT) AS n, max(p_lo) AS p_lo,
       max(p_hi) AS p_hi,
       CAST(CAST(sum(cv * cnt) AS HUGEINT) * 1000000 // max(n) AS BIGINT)
         AS wmean_micro
FROM cl GROUP BY source ORDER BY source
"""


TRAINDATA_REGISTRY.update(
    {
        "bm25_retrieval_topk": (bm25_retrieval_topk, _BM25_SQL),
        "truncated_knn_recall": (truncated_knn_recall, _TRUNC_SQL),
        "winsorized_length_stats": (winsorized_length_stats, _WINSOR_SQL),
    }
)


# ---------------------------------------------------------------------------
# hard-negative mining (labels)
# ---------------------------------------------------------------------------


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training support set: for each query vector, the 3
    highest-cosine corpus vectors with a DIFFERENT label — the
    hard-negative shortlist a contrastive fine-tune mines before
    building triplets (the labels column's first first-class use).
    Scores come from the same exact GEMM kernel as embedding_knn; the
    label filter applies before the final rank."""
    from pyspark.sql import Window

    from dnsflow_clickhouse_spark.operators.similarity import cosine_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    # k large enough to keep every scored pair: rank AFTER label filter
    pairs = cosine_topk(q, e, "vec_id", "embedding", k=10**9)
    lab = e.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label"))
    qlab = e.select(F.col("vec_id").alias("query_id"), F.col("label").alias("q_label"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pairs.join(F.broadcast(qlab), "query_id")
        .join(lab, "neighbor_id")
        .filter(F.col("n_label") != F.col("q_label"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("n_label").cast("long").alias("n_label"),
            F.col("rnk").cast("long").alias("rnk"),
        )
        .orderBy("query_id", "rnk")
    )


_HARDNEG_SQL = f"""
WITH q AS (SELECT vec_id, label, {_sql_quant('embedding')} AS qv FROM embeddings),
p AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(b.label AS BIGINT) AS n_label,
         floor(list_dot_product(a.qv, b.qv)
               / (sqrt(list_dot_product(a.qv, a.qv)) * sqrt(list_dot_product(b.qv, b.qv))) * 1000000 + 0.5) / 1000000 AS cosine
  FROM q a JOIN q b ON a.vec_id < 20 AND a.vec_id != b.vec_id
  WHERE a.label != b.label),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM p)
SELECT query_id, neighbor_id, cosine, n_label, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3 ORDER BY query_id, rnk
"""


# ---------------------------------------------------------------------------
# label centroid margins
# ---------------------------------------------------------------------------


def label_centroid_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space class-separability audit: per-label centroid
    (per-dim floor-mean of the quantized vectors — exact at these
    magnitudes, the quotient sits >= 1/cnt from any integer so the
    IEEE floor is engine-identical) and the pairwise cosine between
    centroids. Close centroid pairs = confusable classes = where a
    contrastive pass should spend its hard negatives
    (hard_negative_mining's macro view)."""
    from dnsflow_clickhouse_spark.operators.similarity import int_dot, quantize

    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label", F.posexplode(quantize(F.col("embedding"))).alias("i", "v")
    )
    cent = (
        dims.groupBy("label", "i")
        .agg(
            F.floor(
                F.sum("v").cast("double") / F.count(F.lit(1)).cast("double")
            )
            .cast("long")
            .alias("cv")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("i"), F.col("cv")))
                ),
                lambda s: s.getField("cv"),
            ).alias("c")
        )
    )
    a, b = cent.alias("a"), cent.alias("b")
    dot = int_dot(F.col("a.c"), F.col("b.c")).cast("double")
    na = F.sqrt(int_dot(F.col("a.c"), F.col("a.c")).cast("double"))
    nb = F.sqrt(int_dot(F.col("b.c"), F.col("b.c")).cast("double"))
    return (
        a.join(b, F.col("a.label") < F.col("b.label"))
        .select(
            F.col("a.label").cast("long").alias("label_a"),
            F.col("b.label").cast("long").alias("label_b"),
            (F.floor(dot / (na * nb) * 1_000_000 + F.lit(0.5)) / 1_000_000)
            .alias("cosine"),
        )
        .orderBy("label_a", "label_b")
    )


_CENTROID_SQL = f"""
WITH q AS (SELECT vec_id, label, {_sql_quant('embedding')} AS qv FROM embeddings),
d AS (SELECT label, i, qv[i] AS v
      FROM q, UNNEST(generate_series(1, len(qv))) AS g(i)),
cd AS (SELECT label, i,
              CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
       FROM d GROUP BY 1, 2),
cent AS (SELECT label, list(cv ORDER BY i) AS c FROM cd GROUP BY label)
SELECT CAST(a.label AS BIGINT) AS label_a, CAST(b.label AS BIGINT) AS label_b,
       floor(list_dot_product(a.c, b.c)
             / (sqrt(list_dot_product(a.c, a.c)) * sqrt(list_dot_product(b.c, b.c)))
             * 1000000 + 0.5) / 1000000 AS cosine
FROM cent a JOIN cent b ON a.label < b.label
ORDER BY label_a, label_b
"""


TRAINDATA_REGISTRY.update(
    {
        "hard_negative_mining": (hard_negative_mining, _HARDNEG_SQL),
        "label_centroid_margins": (label_centroid_margins, _CENTROID_SQL),
    }
)


# ---------------------------------------------------------------------------
# keep-first duplicate-span removal (the winnowing family's transform)
# ---------------------------------------------------------------------------

_SCRUB_K, _SCRUB_W, _SCRUB_MAX_DF = 3, 4, 64


def span_scrubbed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first duplicate-span removal: the k-token grams anchored at
    winnowing fingerprints already selected by an earlier document are
    excised from later documents (stop-gram cap exempts corpus-wide
    boilerplate). The curation TRANSFORM built from the same
    fingerprint table winnowed_span_pairs mines — the distributed
    stand-in for exact suffix-array substring dedup."""
    from dnsflow_clickhouse_spark.operators.dedup import scrub_duplicate_spans

    d = load_table(spark, sf_dir, "documents")
    return (
        scrub_duplicate_spans(
            d, "doc_id", "text", _SCRUB_K, _SCRUB_W, _SCRUB_MAX_DF
        )
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


def _scrub_sql() -> str:
    from dnsflow_clickhouse_spark.queries.catalog_mlops import _sql_poly

    k, w, max_df = _SCRUB_K, _SCRUB_W, _SCRUB_MAX_DF
    return f"""
WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, len(toks) - {k} + 1 AS ng, u.i AS pos,
         {_sql_poly(f"array_to_string(toks[u.i:u.i+{k - 1}], ' ')")} AS h
  FROM t, LATERAL unnest(
    generate_series(1, greatest(len(toks) - {k} + 1, 0))) AS u(i)),
m AS (
  SELECT doc_id, ng, pos,
         min(struct_pack(h := h, p := -pos))
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mm
  FROM g),
sel AS (
  SELECT DISTINCT doc_id, (mm).h AS fp_hash, -((mm).p) AS fpos
  FROM m WHERE pos <= ng - {w} + 1),
ph AS (SELECT fp_hash, min(doc_id) AS owner, count(DISTINCT doc_id) AS dfq
       FROM sel GROUP BY 1),
marks AS (
  SELECT DISTINCT s.doc_id, s.fpos AS st, s.fpos + {k - 1} AS en
  FROM sel s JOIN ph USING (fp_hash)
  WHERE ph.dfq >= 2 AND ph.dfq <= {max_df} AND s.doc_id > ph.owner),
e AS (SELECT doc_id, u.i AS pos, toks[u.i] AS tok
      FROM t, LATERAL unnest(generate_series(1, len(toks))) AS u(i)),
kept AS (
  SELECT e.* FROM e
  WHERE NOT EXISTS (SELECT 1 FROM marks m2
                    WHERE m2.doc_id = e.doc_id
                      AND e.pos BETWEEN m2.st AND m2.en)),
agg AS (SELECT doc_id, count(*) AS n_kept,
               string_agg(tok, ' ' ORDER BY pos) AS clean_text
        FROM kept GROUP BY 1),
n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM t)
SELECT n.doc_id, n.n_toks,
       CAST(n.n_toks - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(agg.clean_text, '') AS clean_text
FROM n LEFT JOIN agg USING (doc_id) ORDER BY n.doc_id
"""


TRAINDATA_REGISTRY.update(
    {"span_scrubbed_docs": (span_scrubbed_docs, _scrub_sql())}
)
