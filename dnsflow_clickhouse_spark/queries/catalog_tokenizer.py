"""Tokenizer-training query batch: BPE merge induction over the
documents table, and the trained tokenizer applied back to the corpus
(the resulting subword vocabulary with frequencies). Both oracle-checked
by unrolling every merge round as a DuckDB CTE (the same
unrolled-iteration oracle pattern the k-means and PageRank queries use —
the oracle replays the exact loop, not a proxy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.operators.tokenizer import (
    SEP,
    bpe_learn,
    word_frequency_table,
)
from dnsflow_clickhouse_spark.sources.tables import load_table

N_MERGES = 8
VOCAB_TOP = 20


def bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 8 BPE merges over the documents corpus; the output IS the
    tokenizer artifact — the ordered merge table (round, left_sym,
    right_sym, pair_count).

    Scale shape (operators/tokenizer.py): the corpus is scanned once
    into a word-frequency table; each round is one pair hash-aggregate
    + global top-1 (TakeOrderedAndProject) + one broadcast of the
    single winning pair — no collects, no driver loop state. Ties
    break by (left_sym, right_sym) ascending, so the learned tokenizer
    is a pure function of the corpus in every engine."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    return bpe_learn(docs, "text", N_MERGES)


def bpe_vocab_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the 8-merge tokenizer, then APPLY it back to the corpus:
    the top-20 subword tokens by total occurrence count — the
    train->apply round trip a tokenizer deployment runs end-to-end
    (learned merges become the vocabulary a sharded tokenization pass
    would emit).

    The 8 learned (left, right) pairs are collected as scalar planning
    state (8 rows — the engine's documented centroid-style carve-out)
    and applied as literal replaces over the word-frequency table; the
    corpus itself is scanned exactly once."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_learn(docs, "text", N_MERGES).collect()
    ]
    words = word_frequency_table(docs, "text")
    sym = F.array_join(F.split("word", ""), SEP)
    for a, b in merges:
        sym = F.trim(
            F.replace(
                F.concat(F.lit(" "), sym, F.lit(" ")),
                F.lit(f" {a}{SEP}{b} "),
                F.lit(f" {a}{b} "),
            )
        )
    return (
        words.select(F.explode(F.split(sym, SEP)).alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").alias("n_occurrences"))
        .select("token", "n_occurrences", F.length("token").alias("token_len"))
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(VOCAB_TOP)
    )


def _bpe_cte_parts(n_merges: int) -> list[str]:
    """Shared unrolled replay of bpe_learn: w{r} = symbol states
    entering round r, p{r} = weighted adjacent pairs, t{r} = winning
    pair, for r in 1..n_merges, plus the post-final state
    w{n_merges+1}. Pair strings split on the FIRST space — symbols
    never contain spaces, so 'a b' is unambiguous. Sums cast to BIGINT
    (DuckDB HUGEINT is un-canonicalizable by the driver)."""
    parts = [
        """w1 AS (
  SELECT CAST(count(*) AS BIGINT) AS cnt,
         array_to_string(string_split(word, ''), '  ') AS sym
  FROM (SELECT unnest(CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
                           ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END) AS word
        FROM documents)
  GROUP BY word)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f"""p{r} AS (
  SELECT split_part(p, ' ', 1) AS a, split_part(p, ' ', 2) AS b,
         CAST(sum(cnt) AS BIGINT) AS total
  FROM (SELECT unnest(list_transform(generate_series(1, len(l) - 1),
                                     i -> l[i] || ' ' || l[i+1])) AS p, cnt
        FROM (SELECT string_split(sym, '  ') AS l, cnt FROM w{r}))
  GROUP BY 1, 2),
t{r} AS (SELECT a, b, total FROM p{r} ORDER BY total DESC, a, b LIMIT 1),
w{r + 1} AS (
  SELECT cnt, trim(replace(' ' || sym || ' ',
                           ' ' || a || '  ' || b || ' ',
                           ' ' || a || b || ' ')) AS sym
  FROM w{r}, t{r})"""
        )
    return parts


def _sql_bpe(n_merges: int = N_MERGES) -> str:
    union = "\nUNION ALL ".join(
        f"SELECT {r} AS round, a AS left_sym, b AS right_sym, total AS pair_count FROM t{r}"
        for r in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + ",\n".join(_bpe_cte_parts(n_merges))
        + "\n"
        + union
        + "\nORDER BY round"
    )


def _sql_bpe_vocab(n_merges: int = N_MERGES, top: int = VOCAB_TOP) -> str:
    return (
        "WITH "
        + ",\n".join(_bpe_cte_parts(n_merges))
        + f"""
SELECT token, n_occurrences, CAST(length(token) AS INT) AS token_len
FROM (
  SELECT token, CAST(sum(cnt) AS BIGINT) AS n_occurrences
  FROM (SELECT unnest(string_split(sym, '  ')) AS token, cnt
        FROM w{n_merges + 1})
  GROUP BY token)
ORDER BY n_occurrences DESC, token LIMIT {top}
"""
    )


TOKENIZER_REGISTRY = {
    "bpe_merge_training": (bpe_merge_training, _sql_bpe()),
    "bpe_vocab_report": (bpe_vocab_report, _sql_bpe_vocab()),
}
