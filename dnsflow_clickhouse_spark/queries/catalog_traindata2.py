"""Training-data pipeline query batch, round 8: CCNet-style exact
segment dedup (keep-first paragraph removal), SymSpell deletion-
neighborhood term pairs (edit-distance blocking without an all-pairs
scan), label-propagation communities over the LSH graph, lexical
cosine² rerank of LSH candidates, train/val/test split-contamination
audit, LSH candidate precision/recall vs the exact-Jaccard truth set,
cross-source quantile-matching calibration, token-weighted medians,
gap-aware dyadic EWMA smoothing, and an OOV/vocabulary-coverage audit.

Portability contract (same as catalog_traindata): every numeric
output is either exact integer arithmetic (ppm/ppb via nonnegative
``div`` == DuckDB ``//``, dyadic EWMA weights, deletion variants +
``levenshtein`` — identical in both engines) or the pinned
floor(x*1e6+0.5) rounding chain; no engine RNG anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.textfn import POLY_MOD, tokens
from dnsflow_clickhouse_spark.queries.catalog_mlops import (
    N_BANDS,
    N_HASHES,
    _sql_band_hash,
    _sql_minhash_sig,
    _sql_poly,
    _SQL_GRAMS,
    _SQL_TOKS,
)
from dnsflow_clickhouse_spark.sources.tables import load_table

_SEG_TOKENS = 10

# the LSH candidate-pair CTE chain shared by four queries here:
# minhash signatures -> band hashes -> distinct bucket-sharing pairs
_SQL_LSH_PAIRS_CTE = _sql_minhash_sig() + f"""
, bands AS MATERIALIZED (
  {' UNION ALL '.join(f"SELECT doc_id, {b} AS band, {_sql_band_hash(b)} AS band_hash FROM s" for b in range(N_BANDS))}
),
pairs AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
"""


# ---------------------------------------------------------------------------
# CCNet-style segment-level keep-first dedup
# ---------------------------------------------------------------------------


def segment_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-corpus segment dedup: 10-token positional segments,
    keep the globally-first occurrence of every duplicated segment,
    reassemble the survivors (the CCNet paragraph-hash pass)."""
    from dnsflow_clickhouse_spark.operators.dedup import segment_dedup_keep_first

    d = load_table(spark, sf_dir, "documents")
    return segment_dedup_keep_first(d, "doc_id", "text", _SEG_TOKENS).orderBy(
        "doc_id"
    )


_SEGMENT_DEDUP_SQL = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
n AS (SELECT doc_id, toks,
             CAST(ceil(len(toks) / {_SEG_TOKENS}.0) AS BIGINT) AS n_segs FROM t),
seg AS (
  SELECT doc_id, u.i AS seg_no,
         array_to_string(toks[(u.i - 1) * {_SEG_TOKENS} + 1 : u.i * {_SEG_TOKENS}], ' ') AS seg
  FROM n, LATERAL unnest(generate_series(1, greatest(n_segs, 1))) AS u(i)),
nz AS (SELECT * FROM seg WHERE seg <> ''),
own AS (SELECT seg, min(struct_pack(i := doc_id, s := seg_no)) AS own
        FROM nz GROUP BY 1),
kept AS (
  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(s.seg, ' ' ORDER BY s.seg_no) AS clean_text
  FROM nz s JOIN own o USING (seg)
  WHERE s.doc_id = (o.own).i AND s.seg_no = (o.own).s
  GROUP BY 1)
SELECT n.doc_id, n.n_segs AS n_segments,
       CAST(n.n_segs - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(k.clean_text, '') AS clean_text
FROM n LEFT JOIN kept k USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# SymSpell deletion-neighborhood term pairs
# ---------------------------------------------------------------------------


def symspell_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-≤2 term pairs over the corpus vocabulary via
    SymSpell deletion-neighborhood blocking (equi-join on deletion
    variants, exact levenshtein verify — no all-pairs scan)."""
    from dnsflow_clickhouse_spark.operators.dedup import symspell_candidate_pairs

    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return symspell_candidate_pairs(vocab, "term", "freq", max_edit=2).orderBy(
        "term_a", "term_b"
    )


_SQL_DEL1 = (
    "list_distinct(list_append(list_transform(generate_series(1, length({c})), "
    "i -> substr({c}, 1, i - 1) || substr({c}, i + 1, length({c}))), {c}))"
)

_SYMSPELL_SQL = f"""
WITH t AS (SELECT {_SQL_TOKS} AS toks FROM documents),
v AS (SELECT tok AS term, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
e1 AS (SELECT term, unnest({_SQL_DEL1.format(c='term')}) AS v1 FROM v),
e2 AS (SELECT term, unnest({_SQL_DEL1.format(c='v1')}) AS var FROM e1),
posts AS (SELECT DISTINCT term, var FROM e2),
cand AS (SELECT DISTINCT a.term AS term_a, b.term AS term_b
         FROM posts a JOIN posts b ON a.var = b.var AND a.term < b.term),
ver AS (SELECT term_a, term_b,
               CAST(levenshtein(term_a, term_b) AS INT) AS edit_dist
        FROM cand WHERE levenshtein(term_a, term_b) <= 2)
SELECT ver.term_a, ver.term_b, ver.edit_dist,
       fa.freq AS freq_a, fb.freq AS freq_b
FROM ver JOIN v fa ON ver.term_a = fa.term JOIN v fb ON ver.term_b = fb.term
ORDER BY term_a, term_b
"""


# ---------------------------------------------------------------------------
# label propagation communities on the LSH candidate graph
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities (3 fixed rounds,
    most-frequent-neighbor-label, min-label ties) over the MinHash-LSH
    candidate graph — community structure where connected components
    would over-merge via bridge edges."""
    from dnsflow_clickhouse_spark.operators.dedup import lsh_candidate_pairs
    from dnsflow_clickhouse_spark.operators.graph import label_propagation

    d = load_table(spark, sf_dir, "documents")
    edges = lsh_candidate_pairs(d, "doc_id", "text", N_HASHES, N_BANDS, 3)
    return label_propagation(edges, rounds=_LPA_ROUNDS).orderBy("id")


def _lpa_round(prev: str, idx: int) -> str:
    return f"""
m{idx} AS (SELECT u.a AS id, l.label FROM und u JOIN {prev} l ON u.b = l.id),
v{idx} AS (SELECT id, label, count(*) AS n FROM m{idx} GROUP BY 1, 2),
l{idx} AS (SELECT id,
                  -((max(struct_pack(n := n, neg := -label))).neg) AS label
           FROM v{idx} GROUP BY id)"""


_LPA_SQL = (
    _SQL_LSH_PAIRS_CTE
    + """,
und AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
l0 AS (SELECT DISTINCT a AS id, a AS label FROM und),"""
    + ",".join(_lpa_round(f"l{i}", i + 1) for i in range(_LPA_ROUNDS))
    + f"""
SELECT CAST(id AS BIGINT) AS id, CAST(label AS BIGINT) AS label
FROM l{_LPA_ROUNDS} ORDER BY id
"""
)


# ---------------------------------------------------------------------------
# lexical cosine² rerank of LSH candidates
# ---------------------------------------------------------------------------


def lexical_rerank_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-cosine² (integer ppb) for every LSH candidate pair —
    the verify/rerank stage between blocking and action."""
    from dnsflow_clickhouse_spark.operators.dedup import lsh_candidate_pairs
    from dnsflow_clickhouse_spark.operators.retrieval import lexical_cosine_rerank

    d = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(d, "doc_id", "text", N_HASHES, N_BANDS, 3)
    return lexical_cosine_rerank(d, pairs, "doc_id", "text").orderBy(
        "id_a", "id_b"
    )


_LEX_RERANK_SQL = _SQL_LSH_PAIRS_CTE + """,
tf AS (SELECT doc_id AS id, tok AS term, CAST(count(*) AS BIGINT) AS tf
       FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
norms AS (SELECT id, CAST(sum(tf * tf) AS BIGINT) AS norm_sq FROM tf GROUP BY 1),
dot AS (SELECT p.id_a, p.id_b, CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
        FROM pairs p
        JOIN tf a ON a.id = p.id_a
        JOIN tf b ON b.id = p.id_b AND b.term = a.term
        GROUP BY 1, 2)
SELECT p.id_a AS id_a, p.id_b AS id_b, coalesce(d.dot, 0) AS dot,
       na.norm_sq AS norm_sq_a, nb.norm_sq AS norm_sq_b,
       CAST((CAST(coalesce(d.dot, 0) AS HUGEINT) * coalesce(d.dot, 0)
             * 1000000000)
            // (CAST(na.norm_sq AS HUGEINT) * nb.norm_sq) AS BIGINT)
         AS cos_sq_ppb
FROM pairs p
LEFT JOIN dot d ON d.id_a = p.id_a AND d.id_b = p.id_b
JOIN norms na ON na.id = p.id_a
JOIN norms nb ON nb.id = p.id_b
ORDER BY p.id_a, p.id_b
"""


# ---------------------------------------------------------------------------
# split contamination audit
# ---------------------------------------------------------------------------

_SPLIT_SEED = 11


def split_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs straddling a deterministic 80/10/10 doc
    split: the leakage a random split leaves behind even after
    group_split guards (near-dups have DIFFERENT ids, so only a
    dedup-aware split assignment removes them — this is the audit
    that says whether you need one)."""
    from dnsflow_clickhouse_spark.operators.dedup import lsh_candidate_pairs
    from dnsflow_clickhouse_spark.operators.sampling import group_split

    d = load_table(spark, sf_dir, "documents")
    splits = group_split(
        d.select("doc_id"),
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
        seed=_SPLIT_SEED,
    )
    pairs = lsh_candidate_pairs(d, "doc_id", "text", N_HASHES, N_BANDS, 3)
    joined = (
        pairs.join(
            splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
        .select(
            F.least("sa", "sb").alias("split_lo"),
            F.greatest("sa", "sb").alias("split_hi"),
        )
    )
    return (
        joined.groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn(
            "is_cross", (F.col("split_lo") != F.col("split_hi")).cast("int")
        )
        .orderBy("split_lo", "split_hi")
    )


_SQL_DOC_BUCKET = (
    f"(({_sql_poly('CAST(doc_id AS VARCHAR)', seed=_SPLIT_SEED)})"
    f" * 2654435761) % {POLY_MOD} % 1000000"
)

_SPLIT_CONTAM_SQL = _SQL_LSH_PAIRS_CTE + f""",
sp AS (SELECT doc_id,
              CASE WHEN {_SQL_DOC_BUCKET} < 800000 THEN 'train'
                   WHEN {_SQL_DOC_BUCKET} < 900000 THEN 'val'
                   ELSE 'test' END AS split
       FROM documents),
j AS (SELECT least(a.split, b.split) AS split_lo,
             greatest(a.split, b.split) AS split_hi
      FROM pairs p JOIN sp a ON a.doc_id = p.id_a
                   JOIN sp b ON b.doc_id = p.id_b)
SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(split_lo <> split_hi AS INT) AS is_cross
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# LSH candidate quality vs exact-Jaccard truth
# ---------------------------------------------------------------------------


def dedup_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the MinHash-LSH candidate generator against
    the exact trigram-Jaccard≥0.5 truth set — the measurement that
    picks (bands × rows) before a 100 TB dedup run."""
    from dnsflow_clickhouse_spark.operators.dedup import (
        dedup_candidate_quality,
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs(d, "doc_id", "text", N_HASHES, N_BANDS, 3)
    truth = ngram_jaccard_pairs(d, "doc_id", "text", ngram=3, threshold=0.5)
    return dedup_candidate_quality(cand, truth)


_DEDUP_RECALL_SQL = _SQL_LSH_PAIRS_CTE + """,
e AS (SELECT doc_id, len(grams) AS ng, unnest(grams) AS gram FROM g),
jp AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.ng AS na, b.ng AS nb,
         CAST(count(*) AS BIGINT) AS inter
  FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4),
truth AS (SELECT id_a, id_b FROM jp
          WHERE floor(inter / (na + nb - inter) * 1000000 + 0.5) / 1000000 >= 0.5),
u AS (SELECT id_a, id_b, 1 AS c, 0 AS t FROM pairs
      UNION ALL SELECT id_a, id_b, 0, 1 FROM truth),
pp AS (SELECT id_a, id_b, max(c) AS c, max(t) AS t FROM u GROUP BY 1, 2),
agg AS (SELECT CAST(sum(c) AS BIGINT) AS n_candidates,
               CAST(sum(t) AS BIGINT) AS n_truth,
               CAST(sum(c * t) AS BIGINT) AS n_common
        FROM pp)
SELECT n_candidates, n_truth, n_common,
       CAST(CASE WHEN n_candidates > 0
                 THEN (n_common * 1000000) // n_candidates ELSE 0 END AS BIGINT)
         AS precision_ppm,
       CAST(CASE WHEN n_truth > 0
                 THEN (n_common * 1000000) // n_truth ELSE 0 END AS BIGINT)
         AS recall_ppm
FROM agg
"""


# ---------------------------------------------------------------------------
# cross-source quantile-matching calibration
# ---------------------------------------------------------------------------

_REF_SOURCE = "src0"


def quantile_calibrated_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's length mapped onto the reference source's
    (src0) length distribution at the same within-source percentile —
    cross-source score calibration by quantile matching."""
    from dnsflow_clickhouse_spark.operators.profiling import (
        quantile_match_calibrate,
    )

    d = load_table(spark, sf_dir, "documents")
    return quantile_match_calibrate(
        d, "source", "n_chars", "doc_id", _REF_SOURCE
    ).orderBy("doc_id")


_QMATCH_SQL = f"""
WITH r AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v,
         CAST((row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
               * 1000000)
              // (count(*) OVER (PARTITION BY source)) AS BIGINT) AS pct_ppm
  FROM documents),
ref AS (SELECT v AS ref_v, max(pct_ppm) AS cum_ppm
        FROM r WHERE source = '{_REF_SOURCE}' GROUP BY 1)
SELECT r.doc_id, r.source, r.v AS n_chars, r.pct_ppm,
       min(ref.ref_v) AS calibrated
FROM r JOIN ref ON ref.cum_ppm >= r.pct_ppm
GROUP BY 1, 2, 3, 4
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# token-weighted median lengths
# ---------------------------------------------------------------------------


def weighted_median_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted lo-median of document length per source: the
    robust center weighted by the token mass each document actually
    contributes to training."""
    from dnsflow_clickhouse_spark.functions.textfn import token_count
    from dnsflow_clickhouse_spark.operators.profiling import (
        weighted_median_by_group,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars", token_count(F.col("text")).alias("toks")
    )
    return weighted_median_by_group(d, "source", "n_chars", "toks").orderBy(
        "source"
    )


_WMEDIAN_SQL = f"""
WITH t AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
                  CAST(len({_SQL_TOKS}) AS BIGINT) AS w FROM documents),
hist AS (SELECT source, v, sum(w) AS cnt FROM t GROUP BY 1, 2),
c AS (SELECT source, v, cnt,
             sum(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
             sum(cnt) OVER (PARTITION BY source) AS total
      FROM hist)
SELECT source, CAST(max(total) AS BIGINT) AS total_weight,
       min(CASE WHEN cum * 2 >= total THEN v END) AS w_median
FROM c GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# dyadic EWMA smoothing of hourly event rates
# ---------------------------------------------------------------------------

_EWMA_WINDOW = 8


def ewma_event_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-aware hourly EWMA of event counts per type (half-life one
    hour, exact dyadic weights — integer arithmetic end to end)."""
    from dnsflow_clickhouse_spark.operators.profiling import ewma_smooth

    ev = load_table(spark, sf_dir, "events")
    return ewma_smooth(
        ev, "event_type", "ts", 3600, window_buckets=_EWMA_WINDOW
    ).orderBy("event_type", "bucket")


_EWMA_DENOM = (1 << _EWMA_WINDOW) - 1

_EWMA_SQL = f"""
WITH counts AS (
  SELECT event_type AS k,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS b,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2),
contrib AS (
  SELECT k, b + u.age AS b,
         cnt * (1 << ({_EWMA_WINDOW} - 1 - u.age)) AS w
  FROM counts, LATERAL unnest(generate_series(0, {_EWMA_WINDOW} - 1)) AS u(age)),
scaled AS (SELECT k, b, CAST(sum(w) AS BIGINT) AS ewma_scaled
           FROM contrib GROUP BY 1, 2)
SELECT c.k AS event_type, c.b AS bucket, c.cnt,
       s.ewma_scaled,
       CAST((s.ewma_scaled * 1000) // {_EWMA_DENOM} AS BIGINT) AS ewma_milli
FROM counts c JOIN scaled s ON s.k = c.k AND s.b = c.b
ORDER BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# OOV / vocabulary coverage
# ---------------------------------------------------------------------------

_VOCAB_K = 20


def oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary token mass per (lang, source) against the
    corpus's top-20 token vocabulary — the coverage audit before
    committing to a vocab."""
    from dnsflow_clickhouse_spark.operators.text_analysis import oov_rate_report

    d = load_table(spark, sf_dir, "documents")
    return oov_rate_report(d, ["lang", "source"], "text", _VOCAB_K).orderBy(
        "lang", "source"
    )


_OOV_SQL = f"""
WITH t AS (SELECT lang, source, {_SQL_TOKS} AS toks FROM documents),
tc AS (SELECT lang, source, tok, CAST(count(*) AS BIGINT) AS cnt
       FROM (SELECT lang, source, unnest(toks) AS tok FROM t) GROUP BY 1, 2, 3),
vocab AS (SELECT tok FROM (SELECT tok, sum(cnt) AS freq FROM tc GROUP BY 1)
          ORDER BY freq DESC, tok ASC LIMIT {_VOCAB_K}),
fl AS (SELECT tc.*, (vocab.tok IS NOT NULL) AS inv
       FROM tc LEFT JOIN vocab ON tc.tok = vocab.tok)
SELECT lang, source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN inv THEN 0 ELSE cnt END) AS BIGINT) AS n_oov,
       CAST((sum(CASE WHEN inv THEN 0 ELSE cnt END) * 1000000)
            // sum(cnt) AS BIGINT) AS oov_ppm
FROM fl GROUP BY 1, 2 ORDER BY lang, source
"""


TRAINDATA2_REGISTRY = {
    "segment_dedup_docs": (segment_dedup_docs, _SEGMENT_DEDUP_SQL),
    "symspell_token_pairs": (symspell_token_pairs, _SYMSPELL_SQL),
    "lpa_communities": (lpa_communities, _LPA_SQL),
    "lexical_rerank_pairs": (lexical_rerank_pairs, _LEX_RERANK_SQL),
    "split_contamination_report": (
        split_contamination_report,
        _SPLIT_CONTAM_SQL,
    ),
    "dedup_recall_report": (dedup_recall_report, _DEDUP_RECALL_SQL),
    "quantile_calibrated_lengths": (
        quantile_calibrated_lengths,
        _QMATCH_SQL,
    ),
    "weighted_median_lengths": (weighted_median_lengths, _WMEDIAN_SQL),
    "ewma_event_rates": (ewma_event_rates, _EWMA_SQL),
    "oov_rate_by_source": (oov_rate_by_source, _OOV_SQL),
}


# ---------------------------------------------------------------------------
# batch 2: sequence mining / attribution / funnel timing / vocab sizing /
# shard balance
# ---------------------------------------------------------------------------


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts + exact-ppm conditional
    probabilities over per-user event sequences."""
    from dnsflow_clickhouse_spark.operators.sessions import transition_matrix

    ev = load_table(spark, sf_dir, "events")
    return transition_matrix(
        ev, "user_id", "event_type", "ts", "event_id"
    ).orderBy("prev_state", "next_state")


_TRANSITION_SQL = """
WITH s AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_state
  FROM events),
c AS (SELECT prev_state, event_type AS next_state,
             CAST(count(*) AS BIGINT) AS n
      FROM s WHERE prev_state IS NOT NULL GROUP BY 1, 2)
SELECT prev_state, next_state, n,
       CAST((n * 1000000) // (sum(n) OVER (PARTITION BY prev_state))
            AS BIGINT) AS prob_ppm
FROM c ORDER BY prev_state, next_state
"""


def attribution_u_shaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (40/20/40) credit attribution per event type over
    each user's full touch sequence — exact integer ppm, credits sum to
    1e6 per user (largest-remainder to earliest interiors)."""
    from dnsflow_clickhouse_spark.operators.sessions import u_shaped_attribution

    ev = load_table(spark, sf_dir, "events")
    return u_shaped_attribution(
        ev, "user_id", "event_type", "ts", "event_id"
    ).orderBy("channel")


_USHAPE_SQL = """
WITH b AS (
  SELECT event_type AS channel,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
c AS (SELECT channel,
             CASE WHEN n = 1 THEN 1000000
                  WHEN n = 2 THEN 500000
                  WHEN pos = 1 THEN 400000
                  WHEN pos = n THEN 400000
                  ELSE 200000 // (n - 2)
                       + CASE WHEN pos - 1 <= 200000 % (n - 2)
                              THEN 1 ELSE 0 END
             END AS credit
      FROM b)
SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(credit) AS BIGINT) AS credit_ppm
FROM c GROUP BY 1 ORDER BY channel
"""


def conversion_lag_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel timing: discrete lo-median and ceil-p90 of the lag from a
    user's first signup to their first purchase (integer order
    statistics over the lag histogram)."""
    from dnsflow_clickhouse_spark.operators.sessions import conversion_lag_stats

    ev = load_table(spark, sf_dir, "events")
    return conversion_lag_stats(
        ev, "user_id", "event_type", "ts", "signup", "purchase"
    )


_CONVLAG_SQL = """
WITH f AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS f_from,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS f_to
  FROM events GROUP BY 1),
l AS (SELECT CAST(floor(epoch(f_to)) AS BIGINT)
             - CAST(floor(epoch(f_from)) AS BIGINT) AS lag_s
      FROM f
      WHERE f_from IS NOT NULL AND f_to IS NOT NULL AND f_to >= f_from),
hist AS (SELECT lag_s, count(*) AS cnt FROM l GROUP BY 1),
c AS (SELECT lag_s, cnt,
             sum(cnt) OVER (ORDER BY lag_s) AS cum,
             sum(cnt) OVER () AS n
      FROM hist)
SELECT CAST(max(n) AS BIGINT) AS n_converted,
       min(CASE WHEN cum >= (n + 1) // 2 THEN lag_s END) AS median_lag_s,
       min(CASE WHEN cum >= (9 * n + 9) // 10 THEN lag_s END) AS p90_lag_s
FROM c
"""


def vocab_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary sizing curve: exact ppm of corpus token mass covered
    by the top-K tokens for K in {1, 2, 5, 10, 20}."""
    from dnsflow_clickhouse_spark.operators.text_analysis import (
        vocab_coverage_curve,
    )

    d = load_table(spark, sf_dir, "documents")
    return vocab_coverage_curve(d, "text")


_VOCAB_CURVE_SQL = f"""
WITH t AS (SELECT {_SQL_TOKS} AS toks FROM documents),
f AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
r AS (SELECT tok, freq,
             row_number() OVER (ORDER BY freq DESC, tok) AS rank,
             sum(freq) OVER (ORDER BY freq DESC, tok) AS cum,
             sum(freq) OVER () AS total
      FROM f)
SELECT CAST(k.k AS INT) AS k, CAST(cum AS BIGINT) AS covered_tokens,
       CAST(total AS BIGINT) AS total_tokens,
       CAST((cum * 1000000) // total AS BIGINT) AS coverage_ppm
FROM r JOIN (VALUES (1), (2), (5), (10), (20)) k(k) ON r.rank = k.k
ORDER BY k
"""

_SHARD_SEED = 3
_N_SHARDS = 8


def shard_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight balance audit for a deterministic 8-way hash sharding
    of the documents table, weighted by n_chars: per-shard mass and
    skew vs the even split in ppm (1e6 = perfectly even)."""
    from dnsflow_clickhouse_spark.operators.sampling import shard_balance

    d = load_table(spark, sf_dir, "documents")
    return shard_balance(d, "doc_id", _N_SHARDS, "n_chars", seed=_SHARD_SEED)


_SQL_SHARD = (
    f"(({_sql_poly('CAST(doc_id AS VARCHAR)', seed=_SHARD_SEED)})"
    f" * 2654435761) % {POLY_MOD} % 1000000 % {_N_SHARDS}"
)

_SHARD_BALANCE_SQL = f"""
WITH s AS (SELECT {_SQL_SHARD} AS shard, CAST(n_chars AS BIGINT) AS w
           FROM documents),
a AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(w) AS BIGINT) AS mass
      FROM s GROUP BY 1)
SELECT CAST(shard AS INT) AS shard, n_rows, mass,
       CAST((CAST(mass AS HUGEINT) * 1000000 * {_N_SHARDS})
            // (sum(mass) OVER ()) AS BIGINT) AS load_ppm
FROM a ORDER BY shard
"""


TRAINDATA2_REGISTRY.update(
    {
        "event_transition_matrix": (event_transition_matrix, _TRANSITION_SQL),
        "attribution_u_shaped": (attribution_u_shaped, _USHAPE_SQL),
        "conversion_lag_report": (conversion_lag_report, _CONVLAG_SQL),
        "vocab_coverage_report": (vocab_coverage_report, _VOCAB_CURVE_SQL),
        "shard_balance_report": (shard_balance_report, _SHARD_BALANCE_SQL),
    }
)


# ---------------------------------------------------------------------------
# batch 3: sequence fingerprints / ABC cut / purged time split /
# join-skew profiler / source overlap matrix
# ---------------------------------------------------------------------------


def user_sequence_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint of every user's full ordered event-type sequence
    (min_group=1 so the oracle hash-verifies every fingerprint; the
    twin-GROUPING behavior — bot rings replaying identical flows — is
    pinned by the min_group=2 unit test)."""
    from dnsflow_clickhouse_spark.operators.sessions import sequence_fingerprints

    ev = load_table(spark, sf_dir, "events")
    return sequence_fingerprints(
        ev, "user_id", "event_type", "ts", "event_id", min_group=1
    ).orderBy("seq_hash")


_SEQ_FP_SQL = """
WITH s AS (SELECT user_id AS k,
                  string_agg(event_type, '>' ORDER BY ts, event_id) AS seq,
                  CAST(count(*) AS BIGINT) AS seq_len
           FROM events GROUP BY 1)
SELECT md5(seq) AS seq_hash, CAST(count(*) AS BIGINT) AS n_keys,
       min(k) AS keep_key, CAST(max(seq_len) AS BIGINT) AS seq_len
FROM s GROUP BY 1 ORDER BY seq_hash
"""


def abc_customer_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC classification of customers by order revenue (exact
    cents): class A carries the first 80% of cumulative revenue, B to
    95%, C the tail."""
    from dnsflow_clickhouse_spark.operators.profiling import abc_classification
    from dnsflow_clickhouse_spark.queries.catalog import _cents

    o = load_table(spark, sf_dir, "orders")
    return abc_classification(o, "o_custkey", _cents("o_totalprice"))


_ABC_SQL = """
WITH pk AS (SELECT o_custkey AS key,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS val
            FROM orders GROUP BY 1),
c AS (SELECT key, val,
             sum(val) OVER (ORDER BY val DESC, key) AS cum,
             sum(val) OVER () AS total
      FROM pk),
cl AS (SELECT CASE WHEN cum * 1000000 <= 800000 * total THEN 'A'
                   WHEN cum * 1000000 <= 950000 * total THEN 'B'
                   ELSE 'C' END AS abc_class, val
       FROM c)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(val) AS BIGINT) AS value_sum,
       CAST((sum(val) * 1000000) // (sum(sum(val)) OVER ()) AS BIGINT)
         AS share_ppm
FROM cl GROUP BY 1 ORDER BY 1
"""


def temporal_split_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged time-based split audit: train / 1-day embargo / 7-day
    test holdout, cutoffs a pure function of the data's max day; counts
    per (event_type, split)."""
    from dnsflow_clickhouse_spark.operators.sessions import temporal_split_embargo

    ev = load_table(spark, sf_dir, "events")
    return temporal_split_embargo(ev, "ts", "event_type", 7, 1)


_TSPLIT_SQL = """
WITH b AS (SELECT CAST(floor(epoch(date_trunc('day', max(ts)))) AS BIGINT)
             AS maxd FROM events),
t AS (SELECT event_type,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) < maxd - 8 * 86400
                  THEN 'train'
                  WHEN CAST(floor(epoch(ts)) AS BIGINT) < maxd - 7 * 86400
                  THEN 'embargo'
                  ELSE 'test' END AS split
      FROM events CROSS JOIN b)
SELECT event_type, split, CAST(count(*) AS BIGINT) AS n
FROM t GROUP BY 1, 2 ORDER BY 1, 2
"""


def join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile of events.user_id: top-10 hottest keys
    with share, load-vs-even ratio, and the salt factor that would
    level each — the pre-join measurement for salted_agg/salted_join."""
    from dnsflow_clickhouse_spark.operators.skew import (
        join_skew_profile as _profile,
    )

    ev = load_table(spark, sf_dir, "events")
    return _profile(ev, "user_id", top_n=10)


_SKEW_SQL = """
WITH f AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS freq
           FROM events GROUP BY 1),
r AS (SELECT key, freq,
             count(*) OVER () AS n_keys,
             sum(freq) OVER () AS total,
             row_number() OVER (ORDER BY freq DESC, key) AS rank
      FROM f)
SELECT CAST(rank AS INT) AS rank, CAST(key AS VARCHAR) AS key, freq,
       CAST(n_keys AS BIGINT) AS n_keys, CAST(total AS BIGINT) AS total_rows,
       CAST((freq * 1000000) // total AS BIGINT) AS share_ppm,
       CAST((CAST(freq AS HUGEINT) * n_keys * 1000000) // total AS BIGINT)
         AS load_vs_avg_ppm,
       CAST((CAST(freq AS HUGEINT) * n_keys + total - 1) // total AS INT)
         AS suggested_salt
FROM r WHERE rank <= 10 ORDER BY rank
"""


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise trigram-Jaccard between SOURCES (group-level
    shingle sets) — which crawl feeds substantially duplicate each
    other; the exact counterpart of kmv_corpus_overlap's estimate."""
    from dnsflow_clickhouse_spark.operators.dedup import group_overlap_matrix

    d = load_table(spark, sf_dir, "documents")
    return group_overlap_matrix(d, "source", "text", 3).orderBy(
        "group_a", "group_b"
    )


_OVERLAP_SQL = f"""
WITH t AS (SELECT source, {_SQL_TOKS} AS toks FROM documents),
g AS (SELECT source, {_SQL_GRAMS} AS grams FROM t),
e AS (SELECT DISTINCT source AS g, unnest(grams) AS gram FROM g),
sz AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
i AS (SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS inter
      FROM e a JOIN e b ON a.gram = b.gram AND a.g < b.g GROUP BY 1, 2)
SELECT ga AS group_a, gb AS group_b, i.inter, sa.n AS na, sb.n AS nb,
       CAST((i.inter * 1000000) // (sa.n + sb.n - i.inter) AS BIGINT)
         AS jaccard_ppm
FROM i JOIN sz sa ON sa.g = i.ga JOIN sz sb ON sb.g = i.gb
ORDER BY group_a, group_b
"""


TRAINDATA2_REGISTRY.update(
    {
        "user_sequence_fingerprints": (
            user_sequence_fingerprints,
            _SEQ_FP_SQL,
        ),
        "abc_customer_classes": (abc_customer_classes, _ABC_SQL),
        "temporal_split_report": (temporal_split_report, _TSPLIT_SQL),
        "join_skew_profile": (join_skew_profile, _SKEW_SQL),
        "source_overlap_matrix": (source_overlap_matrix, _OVERLAP_SQL),
    }
)


# ---------------------------------------------------------------------------
# batch 4: distribution matching / rank-ensemble / budget selection /
# estimator audit
# ---------------------------------------------------------------------------

_DM_SEED = 5


def distribution_match_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejection-sample every source so its length-bucket profile
    matches src0's (exact-ppm acceptance, portable hash gate)."""
    from dnsflow_clickhouse_spark.operators.sampling import distribution_match

    d = load_table(spark, sf_dir, "documents")
    return distribution_match(
        d, "source", F.expr("n_chars div 100"), "doc_id", "src0", seed=_DM_SEED
    ).orderBy("source", "bucket")


_SQL_DM_GATE = (
    f"(({_sql_poly('CAST(id AS VARCHAR)', seed=_DM_SEED)})"
    f" * 2654435761) % {POLY_MOD} % 1000000"
)

_DISTMATCH_SQL = f"""
WITH tg AS (SELECT source AS g, CAST(n_chars // 100 AS BIGINT) AS b,
                   doc_id AS id FROM documents),
c AS (SELECT g, b, CAST(count(*) AS BIGINT) AS cnt FROM tg GROUP BY 1, 2),
t AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY 1),
r AS (SELECT b, cnt AS ref_cnt, tot AS ref_tot
      FROM c JOIN t USING (g) WHERE g = 'src0'),
a AS (SELECT c.g, c.b, c.cnt,
             CASE WHEN r.ref_cnt IS NOT NULL THEN
               least(1000000,
                 CAST((CAST(r.ref_cnt AS HUGEINT) * t.tot * 1000000)
                      // (CAST(r.ref_tot AS HUGEINT) * c.cnt) AS BIGINT))
             ELSE 0 END AS accept_ppm
      FROM c JOIN t USING (g) LEFT JOIN r ON r.b = c.b),
k AS (SELECT tg.g, tg.b, CAST(count(*) AS BIGINT) AS n_kept
      FROM tg JOIN a ON a.g = tg.g AND a.b = tg.b
      WHERE {_SQL_DM_GATE} < a.accept_ppm GROUP BY 1, 2)
SELECT a.g AS source, a.b AS bucket, a.cnt AS n,
       CAST(a.accept_ppm AS BIGINT) AS accept_ppm,
       coalesce(k.n_kept, 0) AS n_kept
FROM a LEFT JOIN k ON k.g = a.g AND k.b = a.b
ORDER BY source, bucket
"""


def borda_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by histogram-Borda rank aggregation over three
    uncalibrated quality signals (chars, tokens, distinct tokens)."""
    from dnsflow_clickhouse_spark.operators.corpus import borda_rank

    d = load_table(spark, sf_dir, "documents")
    staged = (
        d.select("doc_id", F.col("n_chars").cast("long").alias("n_chars"),
                 tokens(F.col("text")).alias("__toks"))
        .select(
            "doc_id",
            "n_chars",
            F.size("__toks").cast("long").alias("n_toks"),
            F.size(F.array_distinct("__toks")).cast("long").alias("n_uniq"),
        )
    )
    return borda_rank(staged, "doc_id", ["n_chars", "n_toks", "n_uniq"], 20)


def _borda_pts(sig: str, idx: int) -> str:
    return f"""
h{idx} AS (SELECT {sig} AS v, count(*) AS cnt FROM s GROUP BY 1),
p{idx} AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) - cnt AS BIGINT) AS pts
           FROM h{idx})"""


_BORDA_SQL = (
    f"""
WITH t AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                  {_SQL_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, n_chars, CAST(len(toks) AS BIGINT) AS n_toks,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq FROM t),"""
    + ",".join(
        _borda_pts(sig, i + 1)
        for i, sig in enumerate(["n_chars", "n_toks", "n_uniq"])
    )
    + """
SELECT s.doc_id, s.n_chars, s.n_toks, s.n_uniq,
       CAST(p1.pts + p2.pts + p3.pts AS BIGINT) AS borda
FROM s JOIN p1 ON p1.v = s.n_chars
       JOIN p2 ON p2.v = s.n_toks
       JOIN p3 ON p3.v = s.n_uniq
ORDER BY borda DESC, doc_id LIMIT 20
"""
)

_SELECT_BUDGET = 10_000


def budget_selection_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy quality-ordered selection under a 10k-token budget via
    the histogram-cutoff plan (no global sort): admit every doc above
    the quality cutoff, then boundary docs in id order."""
    from dnsflow_clickhouse_spark.operators.corpus import greedy_budget_selection

    d = load_table(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", tokens(F.col("text")).alias("__toks")
    ).select(
        "doc_id",
        F.size(F.array_distinct("__toks")).cast("long").alias("n_uniq"),
        F.size("__toks").cast("long").alias("n_toks"),
    )
    return greedy_budget_selection(
        staged, "doc_id", "n_uniq", "n_toks", _SELECT_BUDGET
    )


_BUDGET_SQL = f"""
WITH t AS (SELECT doc_id AS id,
                  CAST(len(list_distinct(toks)) AS BIGINT) AS q,
                  CAST(len(toks) AS BIGINT) AS w
           FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)),
h AS (SELECT q, CAST(sum(w) AS BIGINT) AS mass FROM t GROUP BY 1),
c AS (SELECT q, CAST(coalesce(sum(mass) OVER (ORDER BY q DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS mass_above
      FROM h),
cut AS (SELECT min(q) AS cutoff FROM c WHERE mass_above <= {_SELECT_BUDGET}),
above AS (SELECT CAST(count(*) AS BIGINT) AS n_above,
                 CAST(coalesce(sum(w), 0) AS BIGINT) AS mass_above
          FROM t, cut WHERE q > cutoff),
bl AS (SELECT w, sum(w) OVER (ORDER BY id) AS cum
       FROM t, cut WHERE q = cutoff),
bnd AS (SELECT CAST(count(*) AS BIGINT) AS n_boundary,
               CAST(coalesce(sum(w), 0) AS BIGINT) AS mass_boundary
        FROM bl, above WHERE cum <= {_SELECT_BUDGET} - above.mass_above)
SELECT CAST({_SELECT_BUDGET} AS BIGINT) AS budget,
       CAST(cut.cutoff AS BIGINT) AS cutoff,
       above.n_above, above.mass_above, bnd.n_boundary, bnd.mass_boundary,
       CAST(above.n_above + bnd.n_boundary AS BIGINT) AS n_kept,
       CAST(above.mass_above + bnd.mass_boundary AS BIGINT) AS mass_kept
FROM cut, above, bnd
"""


def minhash_estimate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash Jaccard estimate (position-match fraction) vs the exact
    shingle Jaccard for every LSH candidate pair — the estimator audit
    that sizes n_hashes before a corpus-scale dedup."""
    from dnsflow_clickhouse_spark.operators.dedup import minhash_estimate_pairs

    d = load_table(spark, sf_dir, "documents")
    return minhash_estimate_pairs(d, "doc_id", "text", N_HASHES, N_BANDS, 3).orderBy(
        "id_a", "id_b"
    )


_MATCHES = " + ".join(
    f"(CASE WHEN a.sig[{i + 1}] = b.sig[{i + 1}] THEN 1 ELSE 0 END)"
    for i in range(N_HASHES)
)

_MH_EST_SQL = _SQL_LSH_PAIRS_CTE + f""",
est AS (SELECT p.id_a, p.id_b,
               (({_MATCHES}) * 1000000) // {N_HASHES} AS est_ppm
        FROM pairs p JOIN s a ON a.doc_id = p.id_a
                     JOIN s b ON b.doc_id = p.id_b),
e AS (SELECT doc_id, len(grams) AS ng, unnest(grams) AS gram FROM g),
jp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.ng AS na, b.ng AS nb,
              CAST(count(*) AS BIGINT) AS inter
       FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
       GROUP BY 1, 2, 3, 4),
tr AS (SELECT jp.id_a, jp.id_b,
              CAST((inter * 1000000) // (na + nb - inter) AS BIGINT)
                AS true_ppm
       FROM jp JOIN pairs p ON p.id_a = jp.id_a AND p.id_b = jp.id_b)
SELECT est.id_a, est.id_b, CAST(est.est_ppm AS BIGINT) AS est_ppm,
       coalesce(tr.true_ppm, 0) AS true_ppm,
       CAST(abs(est.est_ppm - coalesce(tr.true_ppm, 0)) AS BIGINT)
         AS abs_err_ppm
FROM est LEFT JOIN tr ON tr.id_a = est.id_a AND tr.id_b = est.id_b
ORDER BY est.id_a, est.id_b
"""


TRAINDATA2_REGISTRY.update(
    {
        "distribution_match_sample": (
            distribution_match_sample,
            _DISTMATCH_SQL,
        ),
        "borda_quality_docs": (borda_quality_docs, _BORDA_SQL),
        "budget_selection_report": (budget_selection_report, _BUDGET_SQL),
        "minhash_estimate_report": (minhash_estimate_report, _MH_EST_SQL),
    }
)
