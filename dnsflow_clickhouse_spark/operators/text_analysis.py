"""Text-analysis operators (engine extension): heuristic language ID,
document fingerprinting, quality filtering. All in-row Catalyst
expressions over the shared textfn primitives — zero shuffle until the
final aggregation a caller adds.

Expression-shape rule (see operators/dedup.py): higher-order lambdas run
interpreted and nested Columns re-inline their children, so
``analyze_documents`` stages the token array once and derives every
feature from the staged column; Column-level helpers remain for
composition and tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.textfn import (
    non_alnum_ratio,
    poly_hash,
    stopword_ratio,
    token_count,
    tokens,
)

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不"],
}
_LANG_ORDER = ["de", "en", "es", "fr", "zh"]  # tie-break: alphabetical


def _hits_from_tokens(toks: Column, lang: str) -> Column:
    sw = LANG_STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*sw)))


def lang_hits(text: Column, lang: str) -> Column:
    """Count of tokens belonging to ``lang``'s stopword list."""
    return _hits_from_tokens(tokens(text), lang)


def _guess_from_hits(hits: dict[str, Column]) -> Column:
    best = F.greatest(*hits.values())
    guess = F.lit("unknown")
    # build right-to-left so earlier languages win ties
    for lg in reversed(_LANG_ORDER):
        guess = F.when((best > 0) & (hits[lg] == best), F.lit(lg)).otherwise(guess)
    return guess


def lang_guess(text: Column) -> Column:
    """argmax over language stopword hits; 'unknown' when all zero.
    Ties resolve to the alphabetically-first language (deterministic)."""
    return _guess_from_hits({lg: lang_hits(text, lg) for lg in _LANG_ORDER})


def fingerprint(text: Column) -> Column:
    """Deterministic 2-part document fingerprint: polynomial rolling hash
    of the whole text combined with the token count — a cheap stable
    identity for shard-level dedup bookkeeping."""
    return F.concat_ws(
        "-",
        poly_hash(text).cast("string"),
        token_count(text).cast("string"),
    )


def _round6(x: Column) -> Column:
    """6-decimal engine-portable rounding — see functions/numeric.py
    (Spark's round() HALF_UPs the shortest decimal string; caught live
    at sf0.1 on three quality scores)."""
    from dnsflow_clickhouse_spark.functions.numeric import portable_round

    return portable_round(x, 6)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality: length, alnum-ness, stopword-ness. The
    expression shape is fixed so cross-engine doubles agree."""
    toks = token_count(text).cast("double")
    return _round6(
        F.lit(0.3) * F.least(F.lit(1.0), toks / F.lit(200.0))
        + F.lit(0.4) * (F.lit(1.0) - non_alnum_ratio(text))
        + F.lit(0.3) * stopword_ratio(text)
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Gopher-style within-document repetition: for each n in ``ns``,
    attach ``dup{n}_ppm`` — the fraction of n-gram occurrences that are
    repeats of an earlier occurrence, in integer parts-per-million.

    Repeated boilerplate (headers, spam templates, looping generations)
    shows up as a high duplicate-gram fraction long before exact dedup
    would catch it. Map-only: one staged tokenization per row, each
    fraction a single integer-exact expression — no shuffle, no UDF.
    The ppm is floor((total - distinct) * 1e6 / total): with total ≤
    doc length, the true quotient is never within an ulp of an integer
    from below, so the IEEE floor is engine-identical.
    """
    toks = F.col("__toks")
    out = df.withColumn("__toks", tokens(F.col(text_col)))
    for n in ns:
        total = F.size(toks) - F.lit(n - 1)
        grams = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
        dup = total - F.size(F.array_distinct(grams))
        out = out.withColumn(
            f"dup{n}_ppm",
            F.when(
                total > 0,
                F.floor(dup.cast("double") * 1_000_000 / total.cast("double")),
            )
            .otherwise(0)
            .cast("long"),
        )
    return out.drop("__toks")


def score_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach only (toks, quality) with the token array staged once.

    Lean sibling of ``analyze_documents`` for quality-gating passes that
    don't need lang/fingerprint columns: the analysis tree stays small
    (planning + codegen cost scales with expression size, which matters
    when the pass runs per micro-batch), and the op stays map-only — no
    shuffle, file splits provide the parallelism at scale.
    """
    from dnsflow_clickhouse_spark.functions.textfn import STOPWORDS_EN

    t = F.col(text_col)
    toks = F.col("__toks")
    n_toks = F.col("toks")
    sw_hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(*STOPWORDS_EN)))
    quality = _round6(
        F.lit(0.3) * F.least(F.lit(1.0), n_toks.cast("double") / F.lit(200.0))
        + F.lit(0.4) * (F.lit(1.0) - non_alnum_ratio(t))
        + F.lit(0.3)
        * F.when(n_toks == 0, F.lit(0.0)).otherwise(
            sw_hits.cast("double") / n_toks.cast("double")
        )
    )
    return (
        df.withColumn("__toks", tokens(t))
        .withColumn("toks", F.size(toks).cast("long"))
        .withColumn("quality", quality)
        .drop("__toks")
    )


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column family (toks, lang_guess,
    quality, fp), with the token array staged once per row and every
    feature derived from the staged columns."""
    t = F.col(text_col)
    toks = F.col("__toks")
    n_toks = F.col("toks")
    # per-language hit counts staged as columns: the guess expression
    # references each count twice (argmax + tie chain), so attributes
    # keep the scan count at one per language and the codegen tree small
    hits = {lg: F.col(f"__hit_{lg}") for lg in _LANG_ORDER}
    from dnsflow_clickhouse_spark.functions.textfn import STOPWORDS_EN

    sw_hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(*STOPWORDS_EN)))
    quality = _round6(
        F.lit(0.3) * F.least(F.lit(1.0), n_toks.cast("double") / F.lit(200.0))
        + F.lit(0.4) * (F.lit(1.0) - non_alnum_ratio(t))
        + F.lit(0.3)
        * F.when(n_toks == 0, F.lit(0.0)).otherwise(
            sw_hits.cast("double") / n_toks.cast("double")
        )
    )
    out = df.withColumn("__toks", tokens(t)).withColumn(
        "toks", F.size(toks).cast("long")
    )
    for lg in _LANG_ORDER:
        out = out.withColumn(f"__hit_{lg}", _hits_from_tokens(toks, lg))
    return (
        out.withColumn("lang_guess", _guess_from_hits(hits))
        .withColumn("quality", quality)
        .withColumn(
            "fp",
            F.concat_ws("-", poly_hash(t).cast("string"), n_toks.cast("string")),
        )
        .drop("__toks", *[f"__hit_{lg}" for lg in _LANG_ORDER])
    )
