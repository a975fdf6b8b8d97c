"""Model-evaluation query batch: per-slice AUC, calibration bins,
feature correlation, OLS fits — the scoring/eval side of a quality-
classifier curation loop (train a filter, then measure it per corpus
slice before gating 100 TB on it).

Pseudo-model under test: the portable hash score ``sample_key(doc_id)``
plays the classifier probability (so the oracle can replay it), and the
documents table's own columns provide the deterministic gold labels and
features. Every statistic follows the repo's exactness discipline:
integer sums -> one final division (ppm) or IEEE-exact double (+ - * /
sqrt only), so DuckDB hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.textfn import token_count, tokens
from dnsflow_clickhouse_spark.operators.evaluation import (
    PPM,
    auc_by_group,
    calibration_bins,
    correlation_pairs,
    ols_fit,
)
from dnsflow_clickhouse_spark.operators.sampling import MIX_MULT, sample_key
from dnsflow_clickhouse_spark.queries.catalog_mlops import _sql_poly, _SQL_TOKS
from dnsflow_clickhouse_spark.sources.tables import load_table

# DuckDB replay of operators.sampling.sample_key(doc_id): polynomial
# hash of the id's decimal string, multiplicatively mixed, folded to ppm.
def _sql_sample_key(seed: int) -> str:
    return (
        f"(({_sql_poly('CAST(doc_id AS VARCHAR)', seed=seed)}) * {MIX_MULT})"
        f" % 1000000007 % {PPM}"
    )


_SQL_SAMPLE_KEY = _sql_sample_key(7)

# ---------------------------------------------------------------------------
# per-slice AUC
# ---------------------------------------------------------------------------


def score_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-aware exact AUC of n_chars as a predictor of lang='en', per
    source slice. The per-slice breakdown is how a classifier gate is
    actually signed off: a global AUC hides a slice where the filter is
    anti-correlated."""
    d = load_table(spark, sf_dir, "documents")
    return auc_by_group(
        d, "source", F.col("n_chars"), (F.col("lang") == "en").cast("long")
    ).orderBy("source")


_AUC_SQL = f"""
WITH per AS (
  SELECT source AS grp, n_chars AS s,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
         count(*) - sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS neg
  FROM documents GROUP BY 1, 2),
wb AS (
  SELECT grp, pos, neg,
         coalesce(sum(neg) OVER (PARTITION BY grp ORDER BY s) - neg, 0)
           AS neg_below
  FROM per),
a AS (
  SELECT grp, sum(pos) AS n_pos, sum(neg) AS n_neg,
         sum(2 * pos * neg_below + pos * neg) AS num2
  FROM wb GROUP BY grp)
SELECT grp AS source, CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       CAST(CASE WHEN n_pos > 0 AND n_neg > 0
                 THEN num2 * {PPM} // (2 * n_pos * n_neg) END AS BIGINT)
         AS auc_ppm
FROM a ORDER BY source
"""

# ---------------------------------------------------------------------------
# calibration / reliability bins
# ---------------------------------------------------------------------------

_N_BINS = 10


def score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table of the hash pseudo-probability against the
    lang='en' label: 10 equal-width ppm bins with exact mean score,
    observed rate, and |gap| (the ECE ingredient)."""
    d = load_table(spark, sf_dir, "documents")
    return calibration_bins(
        d.withColumn("score_ppm", sample_key("doc_id", seed=7)),
        "score_ppm",
        (F.col("lang") == "en").cast("long"),
        _N_BINS,
    )


_CALIB_SQL = f"""
WITH sc AS (
  SELECT ({_SQL_SAMPLE_KEY}) AS score_ppm,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents),
b AS (
  SELECT least({_N_BINS - 1}, score_ppm * {_N_BINS} // {PPM}) AS bin,
         score_ppm, y
  FROM sc),
a AS (
  SELECT bin, count(*) AS n, sum(y) AS n_pos, sum(score_ppm) AS ssum
  FROM b GROUP BY bin)
SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(ssum // n AS BIGINT) AS avg_score_ppm,
       CAST(n_pos * {PPM} // n AS BIGINT) AS pos_rate_ppm,
       CAST(abs(ssum // n - n_pos * {PPM} // n) AS BIGINT) AS gap_ppm
FROM a ORDER BY bin
"""

# ---------------------------------------------------------------------------
# feature correlation
# ---------------------------------------------------------------------------

_CORR_FEATS = ["n_chars", "n_tokens", "n_uniq"]


def feature_correlation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the three cheap doc features a
    quality gate would start from (bytes, tokens, distinct tokens) —
    one exact-sum pass, deterministic doubles."""
    d = load_table(spark, sf_dir, "documents").select(
        "n_chars",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens(F.col("text")))).cast("long").alias("n_uniq"),
    )
    return correlation_pairs(d, _CORR_FEATS)


_CORR_CTE = f"""
feats AS (
  SELECT n_chars,
         CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct({_SQL_TOKS})) AS BIGINT) AS n_uniq
  FROM documents),
s AS (
  SELECT count(*) AS n,
         sum(n_chars) AS s_a, sum(n_chars * n_chars) AS ss_a,
         sum(n_tokens) AS s_b, sum(n_tokens * n_tokens) AS ss_b,
         sum(n_uniq) AS s_c, sum(n_uniq * n_uniq) AS ss_c,
         sum(n_chars * n_tokens) AS sxy_ab,
         sum(n_chars * n_uniq) AS sxy_ac,
         sum(n_tokens * n_uniq) AS sxy_bc
  FROM feats)
"""


def _corr_row(x: str, y: str, sx: str, sy: str, ssx: str, ssy: str, sxy: str) -> str:
    num = f"CAST(n * {sxy} - {sx} * {sy} AS BIGINT)"
    va = f"CAST(n * {ssx} - {sx} * {sx} AS BIGINT)"
    vb = f"CAST(n * {ssy} - {sy} * {sy} AS BIGINT)"
    return f"""
SELECT '{x}' AS feat_x, '{y}' AS feat_y, CAST(n AS BIGINT) AS n,
       CASE WHEN {va} > 0 AND {vb} > 0
            THEN CAST({num} AS DOUBLE)
                 / (sqrt(CAST({va} AS DOUBLE)) * sqrt(CAST({vb} AS DOUBLE)))
       END AS corr
FROM s"""


_CORR_SQL = (
    "WITH "
    + _CORR_CTE
    + _corr_row("n_chars", "n_tokens", "s_a", "s_b", "ss_a", "ss_b", "sxy_ab")
    + " UNION ALL "
    + _corr_row("n_chars", "n_uniq", "s_a", "s_c", "ss_a", "ss_c", "sxy_ac")
    + " UNION ALL "
    + _corr_row("n_tokens", "n_uniq", "s_b", "s_c", "ss_b", "ss_c", "sxy_bc")
)

# ---------------------------------------------------------------------------
# OLS fit
# ---------------------------------------------------------------------------


def ols_tokens_per_char(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language OLS fit n_tokens ~ a + b * n_chars: the bytes->
    tokens conversion ratio a token-budget planner uses before the
    tokenizer has run (mixture_budget_report's upstream estimate)."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").alias("x"),
        token_count(F.col("text")).cast("long").alias("y"),
    )
    return ols_fit(d, "lang", "x", "y").orderBy("lang")


_OLS_SQL = f"""
WITH feats AS (
  SELECT lang, n_chars AS x, CAST(len({_SQL_TOKS}) AS BIGINT) AS y
  FROM documents),
a AS (
  SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM feats GROUP BY lang),
d AS (
  SELECT lang, n, sx, sy,
         CAST(n * sxx - sx * sx AS BIGINT) AS den,
         CAST(n * sxy - sx * sy AS BIGINT) AS num
  FROM a)
SELECT lang, CAST(n AS BIGINT) AS n,
       CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END
         AS slope,
       CASE WHEN den > 0 THEN
         (CAST(sy AS DOUBLE)
          - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) END AS intercept
FROM d ORDER BY lang
"""


EVAL_REGISTRY = {
    "score_auc_by_source": (score_auc_by_source, _AUC_SQL),
    "score_calibration_bins": (score_calibration_bins, _CALIB_SQL),
    "feature_correlation_report": (feature_correlation_report, _CORR_SQL),
    "ols_tokens_per_char": (ols_tokens_per_char, _OLS_SQL),
}

# ---------------------------------------------------------------------------
# retrieval: L2 ranking, reciprocal-rank fusion, random projection
# ---------------------------------------------------------------------------

from dnsflow_clickhouse_spark.operators.similarity import (  # noqa: E402
    l2_topk,
    random_projection,
    rrf_fuse,
)
from dnsflow_clickhouse_spark.queries.catalog_mlops import (  # noqa: E402
    KNN_K,
    KNN_QUERIES,
    _sql_quant,
)

_SQL_QV = f"WITH q AS (SELECT vec_id, {_sql_quant('embedding')} AS qv FROM embeddings)"


def embedding_l2_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Euclidean top-3 for the first 20 query vectors — the
    all-integer second ranker (disagrees with cosine exactly where
    norms differ)."""
    e = load_table(spark, sf_dir, "embeddings")
    return l2_topk(
        e.filter(F.col("vec_id") < KNN_QUERIES), e, "vec_id", "embedding", KNN_K
    ).orderBy("query_id", "rnk")


_L2_PAIRS = f"""
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(list_dot_product(a.qv, a.qv)
              - 2 * list_dot_product(a.qv, b.qv)
              + list_dot_product(b.qv, b.qv) AS BIGINT) AS dist_sq
  FROM q a JOIN q b ON a.vec_id < {KNN_QUERIES} AND a.vec_id != b.vec_id
)"""

_L2_KNN_SQL = f"""
{_SQL_QV},
{_L2_PAIRS},
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dist_sq, neighbor_id) AS rnk
      FROM pairs)
SELECT query_id, neighbor_id, dist_sq, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= {KNN_K} ORDER BY query_id, rnk
"""

_RRF_LIST_K, _RRF_TOP, _RRF_C = 10, 5, 60


def ann_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the cosine and L2 top-10 lists per query
    with reciprocal-rank fusion (integer micro scores), keep top-5.
    The combiner every hybrid (dense+sparse) search stack uses; here
    both rankers are exact so the oracle replays the whole pipeline."""
    from dnsflow_clickhouse_spark.operators.similarity import cosine_topk

    e = load_table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < KNN_QUERIES)
    cos = cosine_topk(qs, e, "vec_id", "embedding", _RRF_LIST_K)
    l2 = l2_topk(qs, e, "vec_id", "embedding", _RRF_LIST_K)
    return rrf_fuse(cos, l2, _RRF_TOP, _RRF_C).orderBy("query_id", "rnk")


_RRF_SQL = f"""
{_SQL_QV},
cpairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         floor(list_dot_product(a.qv, b.qv)
               / (sqrt(list_dot_product(a.qv, a.qv))
                  * sqrt(list_dot_product(b.qv, b.qv))) * 1000000 + 0.5) / 1000000 AS cosine
  FROM q a JOIN q b ON a.vec_id < {KNN_QUERIES} AND a.vec_id != b.vec_id),
ca AS (SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS ra
       FROM cpairs QUALIFY ra <= {_RRF_LIST_K}),
{_L2_PAIRS},
lb AS (SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY dist_sq, neighbor_id) AS rb
       FROM pairs QUALIFY rb <= {_RRF_LIST_K}),
fused AS (
  SELECT coalesce(ca.query_id, lb.query_id) AS query_id,
         coalesce(ca.neighbor_id, lb.neighbor_id) AS neighbor_id,
         coalesce(1000000 // ({_RRF_C} + ca.ra), 0)
         + coalesce(1000000 // ({_RRF_C} + lb.rb), 0) AS rrf_micro
  FROM ca FULL OUTER JOIN lb
    ON ca.query_id = lb.query_id AND ca.neighbor_id = lb.neighbor_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_micro DESC, neighbor_id) AS rnk
      FROM fused)
SELECT query_id, neighbor_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
       CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= {_RRF_TOP} ORDER BY query_id, rnk
"""

_RP_DIM, _RP_OUT, _RP_SEED, _RP_VECS = 64, 8, 11, 100


def embedding_rp_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed random projection (JL sketch) of the first 100 embeddings
    to 8 exact-integer components, long format — the cheap dimensionality
    reduction upstream of clustering/LSH when 64 dims is already too
    wide to shuffle at corpus scale."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _RP_VECS
    )
    return random_projection(
        e, "vec_id", "embedding", _RP_OUT, _RP_SEED, dim=_RP_DIM
    ).orderBy("vec_id", "out_idx")


_RP_SQL = f"""
{_SQL_QV},
signs AS (
  SELECT CAST(fid // {_RP_OUT} AS BIGINT) AS dim_idx,
         CAST(fid % {_RP_OUT} AS BIGINT) AS out_idx,
         CASE WHEN ({_sql_poly('CAST(fid AS VARCHAR)', seed=_RP_SEED)}) % 2 = 0
              THEN 1 ELSE -1 END AS sign
  FROM range(0, {_RP_DIM * _RP_OUT}) AS s(fid)),
flat AS (
  SELECT q.vec_id, t.dim_idx, q.qv[t.dim_idx + 1] AS qval
  FROM q, range(0, {_RP_DIM}) AS t(dim_idx)
  WHERE q.vec_id < {_RP_VECS})
SELECT f.vec_id, s.out_idx,
       CAST(sum(f.qval * s.sign) AS BIGINT) AS component
FROM flat f JOIN signs s ON f.dim_idx = s.dim_idx
GROUP BY f.vec_id, s.out_idx
ORDER BY f.vec_id, s.out_idx
"""

EVAL_REGISTRY.update(
    {
        "embedding_l2_knn": (embedding_l2_knn, _L2_KNN_SQL),
        "ann_rrf_fusion": (ann_rrf_fusion, _RRF_SQL),
        "embedding_rp_components": (embedding_rp_components, _RP_SQL),
    }
)


# ---------------------------------------------------------------------------
# Statistical LM scoring (operators/lm.py): self-perplexity filter +
# per-source token entropy.  The oracle replays the TERM-QUANTIZED log2
# (floor(log2(x) * scale + 0.5) as a long per bigram/token) so only
# exact integers are ever summed — the module's exactness contract.
# ---------------------------------------------------------------------------


def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed bigram log2-probability of every document under
    the corpus's own bigram LM (the KenLM-style self-perplexity gate:
    docs far below the corpus average are boilerplate/gibberish
    candidates).

    Scale shape (operators/lm.py docstring): instances pre-aggregate to
    (doc, a, b, n) before the two count-table equi-joins, the vocabulary
    is a one-row broadcast, and the log layer is quantized per term —
    no collect, no window, no float accumulation-order hazard."""
    from dnsflow_clickhouse_spark.operators.lm import bigram_logprob_scores

    d = load_table(spark, sf_dir, "documents")
    return bigram_logprob_scores(d, "doc_id", tokens(F.col("text"))).orderBy(
        "doc_id"
    )


_LM_SQL = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
base AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
bg0 AS (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 1)) AS i FROM base),
bg AS (SELECT doc_id, toks[i] AS a, toks[i + 1] AS b FROM bg0),
per_doc AS (SELECT doc_id, a, b, count(*) AS n FROM bg GROUP BY ALL),
c2 AS (SELECT a, b, sum(n) AS c2 FROM per_doc GROUP BY a, b),
c1 AS (SELECT a, sum(c2) AS c1 FROM c2 GROUP BY a),
v AS (SELECT count(DISTINCT tok) AS v
      FROM (SELECT unnest(toks) AS tok FROM t)),
scored AS (
  SELECT doc_id, n,
         CAST(floor(log2(CAST(c2.c2 + 1 AS DOUBLE)
                         / CAST(c1.c1 + v.v AS DOUBLE)) * 1000000 + 0.5)
              AS BIGINT) AS term_micro
  FROM per_doc JOIN c2 USING (a, b) JOIN c1 USING (a) CROSS JOIN v)
SELECT doc_id,
       CAST(sum(n) AS BIGINT) AS n_bigrams,
       CAST(sum(n * term_micro) AS BIGINT) AS logprob_micro,
       CAST(sum(n * term_micro) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
         / 1000000 AS avg_logprob
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each source's token distribution — the
    vocabulary-diversity gate: a source whose entropy collapses relative
    to its peers is emitting templated/boilerplate text.

    Two hash aggregations (token counts, then the per-group fold) with
    the nano-quantized log term in between — map-side combinable end to
    end (operators/lm.py)."""
    from dnsflow_clickhouse_spark.operators.lm import token_entropy_by_group

    d = load_table(spark, sf_dir, "documents")
    return token_entropy_by_group(d, "source", tokens(F.col("text"))).orderBy(
        "source"
    )


_ENTROPY_SQL = f"""
WITH t AS (SELECT source, {_SQL_TOKS} AS toks FROM documents),
tok AS (SELECT source AS grp, unnest(toks) AS tk FROM t),
counts AS (SELECT grp, tk, count(*) AS c FROM tok GROUP BY grp, tk),
totals AS (SELECT grp, sum(c) AS n FROM counts GROUP BY grp),
terms AS (
  SELECT counts.grp, n,
         -CAST(floor(log2(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                     * 1000000000 + 0.5) AS BIGINT) * c AS wterm
  FROM counts JOIN totals USING (grp)),
agg AS (SELECT grp, CAST(max(n) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS vocab, sum(wterm) AS wsum
        FROM terms GROUP BY grp)
SELECT grp AS source, n_tokens, vocab,
       CAST(wsum // n_tokens AS BIGINT) AS entropy_nano,
       CAST(wsum // n_tokens AS DOUBLE) / 1000000000 AS entropy_bits
FROM agg ORDER BY source
"""

EVAL_REGISTRY.update(
    {
        "doc_lm_score": (doc_lm_score, _LM_SQL),
        "source_token_entropy": (source_token_entropy, _ENTROPY_SQL),
    }
)


# ---------------------------------------------------------------------------
# PSI distribution drift (operators/evaluation.py: psi_report)
# ---------------------------------------------------------------------------

_PSI_BINS = 10


def value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event value distribution, per
    event type, between the first half of the month (reference) and the
    second half (current) — the drift gate a feature pipeline runs
    before trusting a new ingest window. Explicit equal-width cent bins
    ([0, 2000) in 10 bins, top bin clamps) so the ruler never shifts
    with the data; Laplace-smoothed, integer-exact (psi_pico)."""
    from dnsflow_clickhouse_spark.operators.evaluation import psi_report

    e = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.lit(_PSI_BINS - 1).cast("long"),
        F.floor(F.round(F.col("value") * 100) / 200).cast("long"),
    )
    return psi_report(
        e,
        "event_type",
        (F.dayofmonth("ts") >= 16),
        bucket,
        _PSI_BINS,
    ).orderBy("event_type")


_PSI_SQL = f"""
WITH e AS (
  SELECT event_type AS grp,
         CASE WHEN date_part('day', ts) >= 16 THEN 1 ELSE 0 END AS cur,
         least({_PSI_BINS - 1},
               CAST(floor(round(value * 100) / 200) AS BIGINT)) AS b
  FROM events),
cells AS (SELECT grp, b, sum(1 - cur) AS c_ref, sum(cur) AS c_cur
          FROM e GROUP BY grp, b),
totals AS (SELECT grp, sum(c_ref) AS n_ref, sum(c_cur) AS n_cur
           FROM cells GROUP BY grp),
spine AS (SELECT grp, unnest(generate_series(0, {_PSI_BINS - 1})) AS b
          FROM totals),
filled AS (
  SELECT s.grp, s.b,
         coalesce(c.c_ref, 0) AS c_ref, coalesce(c.c_cur, 0) AS c_cur,
         t.n_ref, t.n_cur
  FROM spine s
  LEFT JOIN cells c ON s.grp = c.grp AND s.b = c.b
  JOIN totals t ON s.grp = t.grp),
terms AS (
  SELECT grp, n_ref, n_cur,
         ((c_cur + 1) * 1000000 // (n_cur + {_PSI_BINS})
          - (c_ref + 1) * 1000000 // (n_ref + {_PSI_BINS}))
         * CAST(floor(log2(
               (CAST(c_cur + 1 AS DOUBLE) / CAST(c_ref + 1 AS DOUBLE))
               * (CAST(n_ref + {_PSI_BINS} AS DOUBLE)
                  / CAST(n_cur + {_PSI_BINS} AS DOUBLE))
           ) * 1000000 + 0.5) AS BIGINT) AS term_pico
  FROM filled)
SELECT grp AS event_type,
       CAST(max(n_ref) AS BIGINT) AS n_ref,
       CAST(max(n_cur) AS BIGINT) AS n_cur,
       CAST(sum(term_pico) AS BIGINT) AS psi_pico,
       CAST(CAST(sum(term_pico) AS BIGINT) AS DOUBLE) / 1e12 AS psi_bits
FROM terms GROUP BY grp ORDER BY event_type
"""

EVAL_REGISTRY["value_drift_psi"] = (value_drift_psi, _PSI_SQL)


# ---------------------------------------------------------------------------
# DSIR importance weights + pairwise token JSD (operators/lm.py) — the
# data-SELECTION and mixture-DIAGNOSTIC members of the statistical-LM
# family (doc_lm_score / source_token_entropy are the per-corpus ones).
# ---------------------------------------------------------------------------

_DSIR_TARGET_SOURCE = "src1"


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): per-document bigram
    log-likelihood ratio between the target-slice LM (documents from
    one exemplar source) and the raw-corpus LM. The weights feed
    importance resampling (es_weighted_source_sample is the sampling
    half) to keep a target-shaped subset of a 100 TB crawl.

    Scale shape (operators/lm.py): instances pre-aggregate to
    (doc, a, b, n); raw counts are corpus-wide hash aggs; target
    counts aggregate only the exemplar slice; both log terms quantize
    to integer micros per bigram before any sum."""
    from dnsflow_clickhouse_spark.operators.lm import dsir_log_ratio_scores

    d = load_table(spark, sf_dir, "documents")
    return dsir_log_ratio_scores(
        d, "doc_id", tokens(F.col("text")), F.col("source") == _DSIR_TARGET_SOURCE
    ).orderBy("doc_id")


_DSIR_SQL = f"""
WITH t AS (SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents),
base AS (SELECT doc_id, source, toks FROM t WHERE len(toks) >= 2),
bg0 AS (SELECT doc_id, source, toks,
               unnest(generate_series(1, len(toks) - 1)) AS i FROM base),
bg AS (SELECT doc_id, source, toks[i] AS a, toks[i + 1] AS b FROM bg0),
per_doc AS (SELECT doc_id, a, b, count(*) AS n FROM bg GROUP BY ALL),
c2r AS (SELECT a, b, count(*) AS c2r FROM bg GROUP BY a, b),
c1r AS (SELECT a, sum(c2r) AS c1r FROM c2r GROUP BY a),
c2t AS (SELECT a, b, count(*) AS c2t FROM bg
        WHERE source = '{_DSIR_TARGET_SOURCE}' GROUP BY a, b),
c1t AS (SELECT a, sum(c2t) AS c1t FROM c2t GROUP BY a),
v AS (SELECT count(DISTINCT tok) AS vr,
             count(DISTINCT CASE WHEN source = '{_DSIR_TARGET_SOURCE}'
                                 THEN tok END) AS vt
      FROM (SELECT source, unnest(toks) AS tok FROM t)),
scored AS (
  SELECT doc_id, n,
         CAST(floor(log2(CAST(coalesce(c2t.c2t, 0) + 1 AS DOUBLE)
                         / CAST(coalesce(c1t.c1t, 0) + v.vt AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT)
         - CAST(floor(log2(CAST(c2r.c2r + 1 AS DOUBLE)
                           / CAST(c1r.c1r + v.vr AS DOUBLE))
                      * 1000000 + 0.5) AS BIGINT) AS term_micro
  FROM per_doc JOIN c2r USING (a, b) JOIN c1r USING (a)
       LEFT JOIN c2t USING (a, b) LEFT JOIN c1t USING (a) CROSS JOIN v)
SELECT doc_id,
       CAST(sum(n) AS BIGINT) AS n_bigrams,
       CAST(sum(n * term_micro) AS BIGINT) AS dsir_micro,
       CAST(sum(n * term_micro) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
         / 1000000 AS avg_dsir
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def lang_token_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (bits) between every two
    languages' token distributions — the symmetric corpus-mixture
    diagnostic: which slices contribute genuinely distinct text and
    which are interchangeable (a JSD collapse between two 'languages'
    usually means mislabeled or templated text).

    One (group, token) hash agg over the corpus; the pair fan-out
    joins COUNT rows, not documents (operators/lm.py)."""
    from dnsflow_clickhouse_spark.operators.lm import token_jsd_pairs

    d = load_table(spark, sf_dir, "documents")
    return token_jsd_pairs(d, "lang", tokens(F.col("text"))).orderBy(
        "grp_a", "grp_b"
    )


def _jsd_side(own: str, other: str, na: str, nb: str, out: str) -> str:
    return f"""
  SELECT p.grp_a, p.grp_b,
         sum(ca.c * CAST(floor(log2(
               (CAST(ca.c AS DOUBLE) / CAST(p.{na} AS DOUBLE))
               / ((CAST(ca.c AS DOUBLE) / CAST(p.{na} AS DOUBLE)
                   + CAST(coalesce(cb.c, 0) AS DOUBLE)
                     / CAST(p.{nb} AS DOUBLE)) / 2.0))
             * 1000000000 + 0.5) AS BIGINT)) AS {out}
  FROM pairs p JOIN counts ca ON ca.grp = p.{own}
       LEFT JOIN counts cb ON cb.grp = p.{other} AND cb.tk = ca.tk
  GROUP BY 1, 2"""


_JSD_SQL = f"""
WITH t AS (SELECT lang, {_SQL_TOKS} AS toks FROM documents),
tok AS (SELECT lang AS grp, unnest(toks) AS tk FROM t),
counts AS (SELECT grp, tk, count(*) AS c FROM tok GROUP BY grp, tk),
totals AS (SELECT grp, sum(c) AS n FROM counts GROUP BY grp),
pairs AS (SELECT x.grp AS grp_a, x.n AS n_a, y.grp AS grp_b, y.n AS n_b
          FROM totals x JOIN totals y ON x.grp < y.grp),
terma AS ({_jsd_side('grp_a', 'grp_b', 'n_a', 'n_b', 'wsum_a')}),
termb AS ({_jsd_side('grp_b', 'grp_a', 'n_b', 'n_a', 'wsum_b')})
SELECT p.grp_a, p.grp_b,
       CAST(p.n_a AS BIGINT) AS n_a, CAST(p.n_b AS BIGINT) AS n_b,
       CAST(greatest(wsum_a, 0) // (2 * p.n_a)
            + greatest(wsum_b, 0) // (2 * p.n_b) AS BIGINT) AS jsd_nano,
       CAST(greatest(wsum_a, 0) // (2 * p.n_a)
            + greatest(wsum_b, 0) // (2 * p.n_b) AS DOUBLE)
         / 1000000000 AS jsd_bits
FROM pairs p JOIN terma USING (grp_a, grp_b) JOIN termb USING (grp_a, grp_b)
ORDER BY grp_a, grp_b
"""

EVAL_REGISTRY.update(
    {
        "dsir_importance_weights": (dsir_importance_weights, _DSIR_SQL),
        "lang_token_jsd": (lang_token_jsd, _JSD_SQL),
    }
)


# ---------------------------------------------------------------------------
# Trainable quality classifier (operators/classifier.py): batch
# perceptron over hashed token features — the model-BASED member of the
# curation family (the CCNet/fastText-filter shape: train a linear text
# classifier on a labeled slice, score the whole crawl). Exact integer
# training, so the oracle unrolls the three epochs as CTEs.
# ---------------------------------------------------------------------------

_PCT_FEATURES = 256
_PCT_EPOCHS = 3


def _perceptron_parts(spark: SparkSession, sf_dir: str):
    from dnsflow_clickhouse_spark.operators.classifier import (
        batch_perceptron_train,
        hashed_token_features,
    )

    d = load_table(spark, sf_dir, "documents")
    features = hashed_token_features(
        d, "doc_id", tokens(F.col("text")), _PCT_FEATURES
    )
    labels = d.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("lang") == "en", F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("y"),
    )
    # batch_perceptron_train persists the id-partitioned feature table;
    # the scoring pass reuses that same cache (same plan object)
    model = batch_perceptron_train(
        features, labels, _PCT_FEATURES, epochs=_PCT_EPOCHS
    )
    return d, features, labels, model


def perceptron_train_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-perceptron training trace (epoch, misclassified count,
    gradient L1 mass, weight L1 mass) for the lang=='en' label over
    256 hashed token buckets, 3 epochs. The trace is the convergence
    evidence a curation run records before trusting the filter; every
    number is an exact integer (see operators/classifier.py)."""
    _, _, _, model = _perceptron_parts(spark, sf_dir)
    return spark.createDataFrame(
        [(int(e), int(m), int(g), int(w)) for e, m, g, w in model.trace],
        "epoch bigint, n_mis bigint, grad_l1 bigint, w_l1 bigint",
    ).orderBy("epoch")


def perceptron_source_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained perceptron corpus-wide: per source, document
    count, correctly-classified count (sign agreement with the label),
    accuracy ppm (exact integer div — numerator nonnegative, so Spark
    div and DuckDB // agree) and the summed label-weighted margin (no
    mean: a negative sum under truncating vs flooring division would
    diverge across engines). One broadcast join + two hash aggregates
    over the corpus — the single-scan 100 TB scoring pass."""
    from dnsflow_clickhouse_spark.operators.classifier import score_documents

    d, features, labels, model = _perceptron_parts(spark, sf_dir)
    scores = score_documents(features, model)
    src = d.select(F.col("doc_id").alias("id"), "source")
    return (
        scores.join(labels, "id")
        .join(src, "id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("y") * F.col("score") > 0, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("n_correct"),
            F.sum(F.col("y") * F.col("score")).alias("margin_sum"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_correct").cast("long").alias("n_correct"),
            # n_correct * 1e6 wraps int64 at ~9.2e12 docs per source —
            # widen to decimal(38,0) like the sibling ppm divisions
            # (calibration_bins, psi_from_cells, gini, cooccurrence)
            F.expr("CAST(n_correct AS DECIMAL(38,0)) * 1000000 div n_docs")
            .cast("long")
            .alias("acc_ppm"),
            F.col("margin_sum").cast("long").alias("margin_sum"),
        )
        .orderBy("source")
    )


_PCT_CTES = f"""
t AS (SELECT doc_id, lang, source, {_SQL_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
feat AS (SELECT doc_id, ({_sql_poly('tok')}) % {_PCT_FEATURES} AS b,
                count(*) AS c
         FROM tok GROUP BY doc_id, b),
lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
        FROM t),
m1 AS (SELECT DISTINCT f.doc_id, l.y
       FROM feat f JOIN lab l USING (doc_id)),
g1 AS (SELECT b, sum(y * c) AS g FROM feat JOIN m1 USING (doc_id)
       GROUP BY b),
w1 AS (SELECT b, g AS w FROM g1),
s2 AS (SELECT f.doc_id, any_value(l.y) AS y,
              sum(f.c * coalesce(w1.w, 0)) AS score
       FROM feat f JOIN lab l USING (doc_id) LEFT JOIN w1 USING (b)
       GROUP BY f.doc_id),
m2 AS (SELECT doc_id, y FROM s2 WHERE y * score <= 0),
g2 AS (SELECT b, sum(y * c) AS g FROM feat JOIN m2 USING (doc_id)
       GROUP BY b),
w2 AS (SELECT coalesce(w1.b, g2.b) AS b,
              coalesce(w1.w, 0) + coalesce(g2.g, 0) AS w
       FROM w1 FULL JOIN g2 ON w1.b = g2.b),
s3 AS (SELECT f.doc_id, any_value(l.y) AS y,
              sum(f.c * coalesce(w2.w, 0)) AS score
       FROM feat f JOIN lab l USING (doc_id) LEFT JOIN w2 USING (b)
       GROUP BY f.doc_id),
m3 AS (SELECT doc_id, y FROM s3 WHERE y * score <= 0),
g3 AS (SELECT b, sum(y * c) AS g FROM feat JOIN m3 USING (doc_id)
       GROUP BY b),
w3 AS (SELECT coalesce(w2.b, g3.b) AS b,
              coalesce(w2.w, 0) + coalesce(g3.g, 0) AS w
       FROM w2 FULL JOIN g3 ON w2.b = g3.b)
"""

_PCT_TRACE_SQL = f"""
WITH {_PCT_CTES}
SELECT * FROM (
  SELECT 1 AS epoch,
         (SELECT CAST(count(*) AS BIGINT) FROM m1) AS n_mis,
         (SELECT CAST(coalesce(sum(abs(g)), 0) AS BIGINT) FROM g1) AS grad_l1,
         (SELECT CAST(coalesce(sum(abs(w)), 0) AS BIGINT) FROM w1) AS w_l1
  UNION ALL
  SELECT 2,
         (SELECT CAST(count(*) AS BIGINT) FROM m2),
         (SELECT CAST(coalesce(sum(abs(g)), 0) AS BIGINT) FROM g2),
         (SELECT CAST(coalesce(sum(abs(w)), 0) AS BIGINT) FROM w2)
  UNION ALL
  SELECT 3,
         (SELECT CAST(count(*) AS BIGINT) FROM m3),
         (SELECT CAST(coalesce(sum(abs(g)), 0) AS BIGINT) FROM g3),
         (SELECT CAST(coalesce(sum(abs(w)), 0) AS BIGINT) FROM w3)
) ORDER BY epoch
"""

_PCT_SCORE_SQL = f"""
WITH {_PCT_CTES},
sf AS (SELECT f.doc_id, sum(f.c * coalesce(w3.w, 0)) AS score
       FROM feat f LEFT JOIN w3 USING (b) GROUP BY f.doc_id)
SELECT t.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN l.y * sf.score > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       CAST(CAST(sum(CASE WHEN l.y * sf.score > 0 THEN 1 ELSE 0 END)
                 AS DECIMAL(38,0))
            * 1000000 // count(*) AS BIGINT) AS acc_ppm,
       CAST(sum(l.y * sf.score) AS BIGINT) AS margin_sum
FROM sf JOIN lab l USING (doc_id) JOIN t USING (doc_id)
GROUP BY t.source ORDER BY t.source
"""

EVAL_REGISTRY.update(
    {
        "perceptron_train_trace": (perceptron_train_trace, _PCT_TRACE_SQL),
        "perceptron_source_score": (perceptron_source_score, _PCT_SCORE_SQL),
    }
)


# ---------------------------------------------------------------------------
# PMI collocations (operators/lm.py): the word2phrase stage — adjacent
# token pairs whose joint frequency beats independence are phrase/merge
# candidates for a tokenizer vocabulary.
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_K = 50


def collocation_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 PMI collocations over the documents corpus (min pair
    count 5). Ratio built in a pinned IEEE-double order and quantized
    once to integer micros (operators/lm.py); top-k lowers to
    TakeOrderedAndProject."""
    from dnsflow_clickhouse_spark.operators.lm import pmi_collocations

    d = load_table(spark, sf_dir, "documents")
    return pmi_collocations(
        d, tokens(F.col("text")), min_count=_PMI_MIN_COUNT, k=_PMI_K
    )


_PMI_SQL = f"""
WITH t AS (SELECT {_SQL_TOKS} AS toks FROM documents),
base AS (SELECT toks FROM t WHERE len(toks) >= 1),
uni AS (SELECT tk, count(*) AS c1
        FROM (SELECT unnest(toks) AS tk FROM base) GROUP BY tk),
pr AS (SELECT toks[i] AS a, toks[i + 1] AS b
       FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
             FROM base WHERE len(toks) >= 2)),
pairs AS (SELECT a, b, count(*) AS c2 FROM pr GROUP BY a, b),
tot AS (SELECT (SELECT sum(c2) FROM pairs) AS n2,
               (SELECT sum(c1) FROM uni) AS n1)
SELECT p.a, p.b, CAST(p.c2 AS BIGINT) AS c2,
       CAST(ua.c1 AS BIGINT) AS ca, CAST(ub.c1 AS BIGINT) AS cb,
       CAST(floor(log2(((CAST(p.c2 AS DOUBLE) * n1) * n1)
                       / ((CAST(n2 AS DOUBLE) * ua.c1) * ub.c1))
                  * 1000000 + 0.5) AS BIGINT) AS pmi_micro
FROM pairs p JOIN uni ua ON ua.tk = p.a JOIN uni ub ON ub.tk = p.b, tot
WHERE p.c2 >= {_PMI_MIN_COUNT}
ORDER BY pmi_micro DESC, a, b LIMIT {_PMI_K}
"""

EVAL_REGISTRY["collocation_pmi_topk"] = (collocation_pmi_topk, _PMI_SQL)


# ---------------------------------------------------------------------------
# Embedding spectrum (operators/spectral.py): exact integer Gram +
# power iteration — the anisotropy/collapse diagnostic run before
# trusting cosine thresholds on an embedding column.
# ---------------------------------------------------------------------------

_SPEC_DIM = 64
_SPEC_ITERS = 3


def embedding_spectrum_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant eigenpair of the uncentered second-moment (Gram)
    matrix of the quantized embeddings, 3 integer power iterations.
    Per-dimension rows: Gram diagonal, eigvec coordinate (1e6-scaled),
    plus the constant Rayleigh eigenvalue and its ppm share of the
    trace (top_share_ppm -> 1e6/dim means isotropic; near 1e6 means
    collapsed). The Gram pass is the only corpus scan (Arrow partial
    X^T X per batch); the iteration is exact driver-side model state."""
    from dnsflow_clickhouse_spark.operators.spectral import (
        gram_matrix,
        top_eig_power,
    )

    e = load_table(spark, sf_dir, "embeddings")
    res = top_eig_power(
        gram_matrix(e, "embedding", _SPEC_DIM), _SPEC_DIM, iters=_SPEC_ITERS
    )
    rows = [
        (
            i + 1,
            int(res.gram_diag[i]),
            int(res.eigvec_scaled[i]),
            int(res.top_eig),
            int(res.top_share_ppm),
        )
        for i in range(_SPEC_DIM)
    ]
    return spark.createDataFrame(
        rows,
        "i bigint, g_diag bigint, v_scaled bigint,"
        " top_eig bigint, top_share_ppm bigint",
    ).orderBy("i")


def _spec_iter(prev: str, n: int) -> str:
    return f"""
u{n} AS (SELECT c.i, sum(c.g * {prev}.v) AS u
         FROM cell c JOIN {prev} ON {prev}.i = c.j GROUP BY c.i),
m{n} AS (SELECT max(abs(u)) AS m FROM u{n}),
v{n} AS (SELECT i, (CASE WHEN u < 0 THEN -1 ELSE 1 END)
                   * ((abs(u) * 1000000) // m) AS v
         FROM u{n}, m{n})"""


_SPEC_SQL = f"""
WITH e AS (SELECT list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
           FROM embeddings),
idx AS (SELECT unnest(generate_series(1, {_SPEC_DIM})) AS i),
cell AS (SELECT ii.i AS i, jj.i AS j, sum(q[ii.i] * q[jj.i]) AS g
         FROM e, idx ii, idx jj GROUP BY 1, 2),
v0 AS (SELECT i, CAST(1000000 AS HUGEINT) AS v FROM idx),
{_spec_iter('v0', 1)},
{_spec_iter('v1', 2)},
{_spec_iter('v2', 3)},
num AS (SELECT sum(c.g * a.v * b.v) AS n
        FROM cell c JOIN v3 a ON a.i = c.i JOIN v3 b ON b.i = c.j),
den AS (SELECT sum(v * v) AS d FROM v3),
tr AS (SELECT sum(g) AS t FROM cell WHERE i = j)
SELECT idx.i,
       CAST(c.g AS BIGINT) AS g_diag,
       CAST(v3.v AS BIGINT) AS v_scaled,
       CAST(n // d AS BIGINT) AS top_eig,
       CAST((n // d) * 1000000 // t AS BIGINT) AS top_share_ppm
FROM idx
JOIN cell c ON c.i = idx.i AND c.j = idx.i
JOIN v3 ON v3.i = idx.i, num, den, tr
ORDER BY idx.i
"""

EVAL_REGISTRY["embedding_spectrum_power"] = (
    embedding_spectrum_power,
    _SPEC_SQL,
)


# ---------------------------------------------------------------------------
# NDCG@10 (operators/evaluation.py): the ranked-retrieval sign-off —
# AUC orders pairs, NDCG grades the TOP slots, which is what matters
# when only the head of a ranking survives (top-k curation).
# ---------------------------------------------------------------------------

_NDCG_K = 10


def ranking_ndcg_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the hash pseudo-score against the lang='en' label,
    per source slice — integer micro discounts, exact DCG/IDCG sums,
    total tie-breaks both rankings (operators/evaluation.py)."""
    from dnsflow_clickhouse_spark.operators.evaluation import ndcg_by_group

    d = load_table(spark, sf_dir, "documents")
    return ndcg_by_group(
        d,
        "source",
        "doc_id",
        sample_key("doc_id", seed=7),
        (F.col("lang") == "en").cast("long"),
        k=_NDCG_K,
    ).orderBy("source")


_NDCG_SQL = f"""
WITH sc AS (
  SELECT source AS g, doc_id, ({_SQL_SAMPLE_KEY}) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS r
  FROM documents),
rk AS (
  SELECT g, r,
         row_number() OVER (PARTITION BY g ORDER BY s DESC, doc_id) AS rk1,
         row_number() OVER (PARTITION BY g
                            ORDER BY r DESC, s DESC, doc_id) AS rk2
  FROM sc),
a AS (
  SELECT g, count(*) AS n, sum(r) AS n_pos,
         sum(CASE WHEN rk1 <= {_NDCG_K}
                  THEN r * CAST(floor(1000000.0 / log2(rk1 + 1) + 0.5)
                                AS BIGINT) ELSE 0 END) AS dcg_micro,
         sum(CASE WHEN rk2 <= {_NDCG_K}
                  THEN r * CAST(floor(1000000.0 / log2(rk2 + 1) + 0.5)
                                AS BIGINT) ELSE 0 END) AS idcg_micro
  FROM rk GROUP BY g)
SELECT g AS source, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       CAST(dcg_micro AS BIGINT) AS dcg_micro,
       CAST(idcg_micro AS BIGINT) AS idcg_micro,
       CAST(CASE WHEN idcg_micro > 0
                 THEN dcg_micro * {PPM} // idcg_micro END AS BIGINT)
         AS ndcg_ppm
FROM a ORDER BY source
"""

EVAL_REGISTRY["ranking_ndcg_by_source"] = (ranking_ndcg_by_source, _NDCG_SQL)


# ---------------------------------------------------------------------------
# Round-6 evaluation additions: Spearman rank correlation (monotone
# complement to Pearson), per-class precision/recall/F1 over the
# lang-id heuristic, and the Brier score of the quality heuristic as a
# probability for lang=='en' (operators/evaluation.py).
# ---------------------------------------------------------------------------

from dnsflow_clickhouse_spark.operators.util import cpu_repartition  # noqa: E402
from dnsflow_clickhouse_spark.queries.catalog_corpus import (  # noqa: E402
    _QUALITY_EXPR,
)


def spearman_quality_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Spearman rank correlation (exact integer ppm) between
    the heuristic quality score and the document character count — the
    monotone-association audit of "is quality just length?" that the
    Pearson report (feature_correlation_report) can understate for
    nonlinear but monotone relations. Crisp-permutation ranks
    (row_number, ties by doc_id) make the statistic engine-replayable
    (operators/evaluation.py: spearman_by_group)."""
    from dnsflow_clickhouse_spark.operators.evaluation import spearman_by_group
    from dnsflow_clickhouse_spark.operators.text_analysis import (
        analyze_documents,
    )

    d = analyze_documents(
        cpu_repartition(load_table(spark, sf_dir, "documents"), "doc_id")
    )
    return spearman_by_group(
        d, "source", "doc_id", F.col("quality"), F.col("n_chars")
    ).orderBy("source")


_SPEARMAN_SQL = f"""
WITH t AS (SELECT doc_id, source, n_chars, {_SQL_TOKS} AS toks, text
           FROM documents),
q AS (SELECT doc_id, source, n_chars, {_QUALITY_EXPR} AS quality FROM t),
rk AS (
  SELECT source,
         row_number() OVER (PARTITION BY source ORDER BY quality, doc_id)
           AS rx,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
           AS ry
  FROM q),
a AS (SELECT source, count(*) AS n,
             sum(CAST((rx - ry) * (rx - ry) AS HUGEINT)) AS sum_d2
      FROM rk GROUP BY source)
SELECT source, CAST(n AS BIGINT) AS n, CAST(sum_d2 AS BIGINT) AS sum_d2,
       CAST(CASE WHEN n >= 2 THEN {PPM} - (CAST(6000000 AS HUGEINT) * sum_d2)
                 // (CAST(n AS HUGEINT) * n * n - n) END AS BIGINT)
         AS rho_ppm
FROM a ORDER BY source
"""


def lang_id_prf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 (ppm) of the stopword-hit lang-id
    heuristic against the gold lang column — the sign-off table the
    raw confusion matrix (lang_id_confusion) feeds. F1 uses the
    division-free identity 2*tp/(n_true + n_pred), so all three ratios
    are single decimal-widened integer divisions (operators/
    evaluation.py: prf1_by_class)."""
    from dnsflow_clickhouse_spark.operators.evaluation import prf1_by_class
    from dnsflow_clickhouse_spark.operators.text_analysis import (
        analyze_documents,
    )

    d = analyze_documents(
        cpu_repartition(load_table(spark, sf_dir, "documents"), "doc_id")
    )
    return (
        prf1_by_class(d, F.col("lang"), F.col("lang_guess"))
        .withColumnRenamed("cls", "lang")
        .orderBy("lang")
    )


def _sql_prf1() -> str:
    from dnsflow_clickhouse_spark.operators.text_analysis import (
        LANG_STOPWORDS,
        _LANG_ORDER,
    )

    hit = {
        lg: "len(list_filter(toks, t -> lower(t) IN ("
        + ", ".join(repr(w) for w in LANG_STOPWORDS[lg])
        + ")))"
        for lg in _LANG_ORDER
    }
    best = f"greatest({', '.join(hit.values())})"
    case = " ".join(
        f"WHEN best > 0 AND {hit[lg]} = best THEN '{lg}'" for lg in _LANG_ORDER
    )
    return f"""
WITH t AS (SELECT lang, {_SQL_TOKS} AS toks FROM documents),
s AS (SELECT lang, toks, {best} AS best FROM t),
g AS (SELECT lang, CASE {case} ELSE 'unknown' END AS lang_guess FROM s),
bt AS (SELECT lang AS cls, count(*) AS n_true,
              sum(CASE WHEN lang = lang_guess THEN 1 ELSE 0 END) AS tp
       FROM g GROUP BY 1),
bp AS (SELECT lang_guess AS cls, count(*) AS n_pred FROM g GROUP BY 1),
f AS (SELECT coalesce(bt.cls, bp.cls) AS cls,
             coalesce(n_true, 0) AS n_true, coalesce(n_pred, 0) AS n_pred,
             coalesce(tp, 0) AS tp
      FROM bt FULL JOIN bp ON bt.cls = bp.cls)
SELECT cls AS lang, CAST(n_true AS BIGINT) AS n_true,
       CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
       CAST(CASE WHEN n_pred > 0
                 THEN CAST(tp AS HUGEINT) * {PPM} // n_pred END AS BIGINT)
         AS precision_ppm,
       CAST(CASE WHEN n_true > 0
                 THEN CAST(tp AS HUGEINT) * {PPM} // n_true END AS BIGINT)
         AS recall_ppm,
       CAST(CASE WHEN n_true + n_pred > 0
                 THEN CAST(2 AS HUGEINT) * tp * {PPM} // (n_true + n_pred)
            END AS BIGINT) AS f1_ppm
FROM f ORDER BY lang
"""


def brier_quality_en(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score per source of the quality heuristic read as a
    probability that lang == 'en' (exact integer micro^2 units) — the
    squared-error summary that complements the reliability table
    (score_calibration_bins); operators/evaluation.py:
    brier_by_group."""
    from dnsflow_clickhouse_spark.operators.evaluation import brier_by_group
    from dnsflow_clickhouse_spark.operators.text_analysis import (
        analyze_documents,
    )

    d = analyze_documents(
        cpu_repartition(load_table(spark, sf_dir, "documents"), "doc_id")
    )
    scored = d.select(
        "source",
        F.round(F.col("quality") * 1_000_000).cast("long").alias("score_ppm"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    return brier_by_group(scored, "source", "score_ppm", "y").orderBy("source")


_BRIER_SQL = f"""
WITH t AS (SELECT doc_id, source, lang, {_SQL_TOKS} AS toks, text
           FROM documents),
q AS (SELECT source,
             CAST(round({_QUALITY_EXPR} * 1000000) AS BIGINT) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM t),
a AS (SELECT source, count(*) AS n, sum(y) AS n_pos,
             sum(CAST((s - y * {PPM}) AS HUGEINT)
                 * (s - y * {PPM})) AS se
      FROM q GROUP BY source)
SELECT source, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       CAST(se // n AS BIGINT) AS brier_micro2
FROM a ORDER BY source
"""

EVAL_REGISTRY.update(
    {
        "spearman_quality_chars": (spearman_quality_chars, _SPEARMAN_SQL),
        "lang_id_prf1": (lang_id_prf1, _sql_prf1()),
        "brier_quality_en": (brier_quality_en, _BRIER_SQL),
    }
)


# ---------------------------------------------------------------------------
# Round-6 batch 2: average precision (PR-AUC) — the imbalanced-data
# complement to ROC-AUC — and Good-Turing / Chao1 vocabulary-growth
# diagnostics (operators/evaluation.py, operators/lm.py).
# ---------------------------------------------------------------------------


def pr_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision per source of n_chars as a predictor of
    lang=='en' — the same pseudo-model score_auc_by_source signs off
    with ROC-AUC, summarized the way an imbalanced filter should be
    (precision at every positive's rank, crisp score-desc/doc_id
    permutation, exact integer ppm)."""
    from dnsflow_clickhouse_spark.operators.evaluation import (
        average_precision_by_group,
    )

    d = load_table(spark, sf_dir, "documents")
    return average_precision_by_group(
        d,
        "source",
        "doc_id",
        F.col("n_chars"),
        (F.col("lang") == "en").cast("long"),
    ).orderBy("source")


_PR_AUC_SQL = f"""
WITH b AS (
  SELECT source AS g, doc_id, n_chars AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents),
r AS (
  SELECT g, y,
         row_number() OVER (PARTITION BY g ORDER BY s DESC, doc_id) AS k,
         sum(y) OVER (PARTITION BY g ORDER BY s DESC, doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum_pos
  FROM b),
a AS (
  SELECT g, count(*) AS n, sum(y) AS n_pos,
         sum(CASE WHEN y = 1
                  THEN CAST(cum_pos AS HUGEINT) * {PPM} // k
                  ELSE 0 END) AS term_sum
  FROM r GROUP BY g)
SELECT g AS source, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       CAST(CASE WHEN n_pos > 0 THEN term_sum // n_pos END AS BIGINT)
         AS ap_ppm
FROM a ORDER BY source
"""


def vocab_growth_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing / Chao1 vocabulary diagnostics per source: token
    count, observed vocabulary, hapax/dis legomena, unseen-probability
    mass (ppm) and the Chao1 vocabulary lower bound — the
    "is this source's vocabulary saturated?" gate a crawl-budget
    planner consults (operators/lm.py: good_turing_vocab)."""
    from dnsflow_clickhouse_spark.operators.lm import good_turing_vocab

    d = cpu_repartition(load_table(spark, sf_dir, "documents"), "doc_id")
    return good_turing_vocab(d, "source", tokens(F.col("text"))).orderBy(
        "source"
    )


_VOCAB_SQL = f"""
WITH t AS (SELECT source, {_SQL_TOKS} AS toks FROM documents),
tok AS (SELECT source, unnest(toks) AS tok FROM t),
pt AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2),
a AS (
  SELECT source, sum(c) AS n_tokens, count(*) AS vocab,
         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
         sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
  FROM pt GROUP BY source)
SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(vocab AS BIGINT) AS vocab,
       CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
       CAST(CAST(f1 AS HUGEINT) * {PPM} // n_tokens AS BIGINT)
         AS gt_unseen_ppm,
       CAST(vocab + CAST(f1 AS HUGEINT) * (f1 - 1) // (2 * (f2 + 1))
            AS BIGINT) AS chao1_vocab
FROM a ORDER BY source
"""

EVAL_REGISTRY.update(
    {
        "pr_auc_by_source": (pr_auc_by_source, _PR_AUC_SQL),
        "vocab_growth_report": (vocab_growth_report, _VOCAB_SQL),
    }
)


def roc_points_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC operating-point table per source for n_chars as a predictor
    of lang=='en' — the threshold-picking table that score_auc_by_source
    integrates and pr_auc_by_source summarizes; one row per distinct
    score with exact (tpr, fpr) ppm (operators/evaluation.py:
    roc_points_by_group)."""
    from dnsflow_clickhouse_spark.operators.evaluation import (
        roc_points_by_group,
    )

    d = load_table(spark, sf_dir, "documents")
    return roc_points_by_group(
        d, "source", F.col("n_chars"), (F.col("lang") == "en").cast("long")
    ).orderBy("source", F.col("s").desc())


_ROC_SQL = f"""
WITH per AS (
  SELECT source AS g, n_chars AS s,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
         count(*) - sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS neg
  FROM documents GROUP BY 1, 2),
c AS (
  SELECT g, s,
         sum(pos) OVER (PARTITION BY g ORDER BY s DESC) AS cum_pos,
         sum(neg) OVER (PARTITION BY g ORDER BY s DESC) AS cum_neg,
         sum(pos) OVER (PARTITION BY g) AS n_pos,
         sum(neg) OVER (PARTITION BY g) AS n_neg
  FROM per)
SELECT g AS source, s, CAST(cum_pos AS BIGINT) AS cum_pos,
       CAST(cum_neg AS BIGINT) AS cum_neg,
       CAST(CASE WHEN n_pos > 0
                 THEN CAST(cum_pos AS HUGEINT) * {PPM} // n_pos
            END AS BIGINT) AS tpr_ppm,
       CAST(CASE WHEN n_neg > 0
                 THEN CAST(cum_neg AS HUGEINT) * {PPM} // n_neg
            END AS BIGINT) AS fpr_ppm
FROM c ORDER BY source, s DESC
"""


def zipf_decay_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf decay exponent per source (micro units, sign flipped to
    nonnegative by construction) — natural text decays with exponent
    ~1e6; templated sources decay faster, token soup slower. The cheap
    "does this source look like language?" gate alongside entropy and
    vocab_growth_report (operators/lm.py: zipf_decay_by_group)."""
    from dnsflow_clickhouse_spark.operators.lm import zipf_decay_by_group

    d = cpu_repartition(load_table(spark, sf_dir, "documents"), "doc_id")
    return zipf_decay_by_group(d, "source", tokens(F.col("text"))).orderBy(
        "source"
    )


_ZIPF_SQL = f"""
WITH t AS (SELECT source, {_SQL_TOKS} AS toks FROM documents),
tok AS (SELECT source, unnest(toks) AS tok FROM t),
pt AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2),
r AS (
  SELECT source,
         CAST(floor(log2(CAST(row_number() OVER (PARTITION BY source
                  ORDER BY c DESC, tok) AS DOUBLE)) * {PPM} + 0.5)
              AS BIGINT) AS x,
         CAST(floor(log2(CAST(c AS DOUBLE)) * {PPM} + 0.5) AS BIGINT) AS y
  FROM pt),
a AS (
  SELECT source, count(*) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM r GROUP BY source)
SELECT source, CAST(n AS BIGINT) AS n_types,
       CAST(CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                 THEN (sx * sy - n * sxy) * 1000000 // (n * sxx - sx * sx)
            END AS BIGINT) AS zipf_decay_micro
FROM a ORDER BY source
"""

EVAL_REGISTRY.update(
    {
        "roc_points_by_source": (roc_points_by_source, _ROC_SQL),
        "zipf_decay_report": (zipf_decay_report, _ZIPF_SQL),
    }
)
