"""Statistical language-model scoring operators (engine extension for
training-data pipelines): add-one-smoothed bigram log-probability
scoring (the KenLM-style perplexity filter) and token-distribution
Shannon entropy.

These are the two classic log-domain corpus filters. The repo's
exactness discipline normally bans exp/log (libm results differ across
engines in the last ulp — measured: ~1/3 of raw log2 values differ
between Spark and DuckDB), so the log layer here is QUANTIZED AT THE
TERM LEVEL: each per-bigram/per-token contribution becomes an integer
micro/nano unit via floor(x * scale + 0.5) BEFORE any aggregation, and
only exact integers are ever summed. Engines then disagree only if a
single term's double lands within an ulp of a rounding boundary
(~1e-8 per term — measured zero over the smoothed-ratio range), not
whenever the float ACCUMULATION ORDER differs (which local shuffles
make certain).

Scale shapes:
- ``bigram_logprob_scores``: instances aggregate to (doc, a, b, n)
  before joining the count tables, so the two equi-joins move one row
  per distinct in-doc bigram, not one per token. The count tables are
  corpus-wide aggregates (map-side combinable); vocabulary size is a
  one-row frame broadcast into the expression. No collect, no window.
- ``token_entropy_by_group``: two hash aggregations (token counts,
  then per-group fold) — the same cascade as gini_concentration, plus
  the quantized log term in between.
- Overflow: term micros are O(30e6); n * micro sums stay < 2^63 until
  ~3e11 bigram instances per doc — unreachable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000
NANO = 1_000_000_000


def _quant_log2(x: Column, scale: int) -> Column:
    """floor(log2(x) * scale + 0.5) as long — the term-level log
    quantization both engines replay identically."""
    return F.floor(F.log2(x) * scale + F.lit(0.5)).cast("long")


def bigram_logprob_scores(
    df: DataFrame, id_col: str, toks: Column
) -> DataFrame:
    """Per-document add-one-smoothed bigram log2-probability under the
    corpus's own bigram LM — the self-perplexity filter: documents far
    below the corpus average are boilerplate/gibberish candidates.

    Model: p(b|a) = (c2(a,b) + 1) / (c1(a) + V), with c1(a) the history
    count (sum of c2 over continuations) and V the corpus vocabulary.
    Each distinct in-doc bigram contributes
    n_occurrences * floor(log2(p) * 1e6 + 0.5).

    Output: id, n_bigrams, logprob_micro (exact long sum),
    avg_logprob (double = micro sum / n / 1e6, deterministic).
    Documents with < 2 tokens are excluded (no bigrams to score).
    """
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg = base.select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2),"
                " i -> struct(toks[i] AS a, toks[i + 1] AS b))"
            )
        ).alias("p"),
    ).select("id", "p.a", "p.b")
    per_doc = bg.groupBy("id", "a", "b").agg(F.count(F.lit(1)).alias("n"))
    c2 = per_doc.groupBy("a", "b").agg(F.sum("n").alias("c2"))
    c1 = c2.groupBy("a").agg(F.sum("c2").alias("c1"))
    vocab = df.select(F.explode(toks).alias("t")).agg(
        F.count_distinct("t").alias("v")
    )
    scored = (
        per_doc.join(c2, ["a", "b"])
        .join(c1, ["a"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            "n",
            _quant_log2(
                (F.col("c2") + 1).cast("double")
                / (F.col("c1") + F.col("v")).cast("double"),
                MICRO,
            ).alias("term_micro"),
        )
    )
    return scored.groupBy(F.col("id").alias(id_col)).agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.sum(F.col("n") * F.col("term_micro")).cast("long").alias("logprob_micro"),
        (
            F.sum(F.col("n") * F.col("term_micro")).cast("double")
            / F.sum("n").cast("double")
            / MICRO
        ).alias("avg_logprob"),
    )


def token_entropy_by_group(
    df: DataFrame, group_col: str, toks: Column
) -> DataFrame:
    """Shannon entropy (bits) of each group's token distribution —
    the vocabulary-diversity gate (a source whose entropy collapses is
    emitting templated/boilerplate text).

    H = -sum_t p_t log2 p_t with p_t = c_t / n; each distinct token's
    term quantizes to nano units before the per-group sum. Output:
    group, n_tokens, vocab, entropy_nano (exact long),
    entropy_bits (double = nano / 1e9)."""
    counts = (
        df.select(F.col(group_col).alias("grp"), F.explode(toks).alias("t"))
        .groupBy("grp", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.groupBy("grp").agg(F.sum("c").alias("n"))
    terms = counts.join(totals, "grp").select(
        "grp",
        "c",
        (
            -_quant_log2(F.col("c").cast("double") / F.col("n").cast("double"), NANO)
            * F.col("c")
        ).alias("wterm"),
        F.col("n"),
    )
    agg = terms.groupBy("grp").agg(
        F.max("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("wterm")).alias("wsum"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "vocab",
        F.expr("wsum div n_tokens").cast("long").alias("entropy_nano"),
        (F.expr("wsum div n_tokens").cast("double") / NANO).alias("entropy_bits"),
    )
