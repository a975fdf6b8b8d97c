"""Corpus-level text operators (engine extension for training-data
pipelines): TF-IDF term scoring, quantile-gated quality filtering, and
benchmark decontamination. Unlike `operators/text_analysis.py` (pure
in-row expressions), every operator here aggregates *across* the corpus,
so the design notes are about shuffle shape.

Scale shapes (100 TB):
- TF-IDF: one explode + two hash aggregations (term frequency per doc,
  document frequency per term) + one equi-join on the term. The df side
  is vocabulary-sized — orders smaller than the corpus — so AQE picks a
  broadcast join when it fits and a shuffle join otherwise; the final
  per-doc top-k is the window row_number plan (grouped top-K family,
  SURVEY §2.6).
- Quantile filter: thresholds are computed per stratum with an ordered
  window (discrete percentile = element at ceil(q*n)), producing a
  strata-sized threshold table that broadcasts back onto the corpus.
  Integer score micro-units throughout — no float interpolation, so any
  engine replays the thresholds bit-exactly.
- Decontamination: n-gram equi-join where the build side is the
  *benchmark* corpus (eval sets are tiny relative to training data), so
  it broadcasts; the training side never shuffles its text, only the
  exploded (gram, id) pairs that survive the join reach the aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.numeric import portable_round

from dnsflow_clickhouse_spark.functions.textfn import tokens
from dnsflow_clickhouse_spark.operators.dedup import ngrams_from_tokens

SCORE_MICRO = 1_000_000


def tf_idf_top_terms(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` most document-specific terms per document.

    Specificity score = tf / df (term frequency over corpus document
    frequency) — monotone in classic tf·idf for a fixed corpus size but
    computed as a single IEEE double division of two small integers, so
    the ordering is engine-exact (a transcendental ``ln`` would not be).
    Ties break on the term string; the per-doc ordering is total.
    """
    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = occ.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df").cast("double")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "tf", "df", portable_round(F.col("score"), 6).alias("score"), "rn")
    )


def quantile_quality_filter(
    scored: DataFrame,
    strata_col: str,
    score_col: str,
    id_col: str,
    q: float = 0.25,
) -> DataFrame:
    """Per-stratum quality gate: keep rows whose score reaches their
    stratum's ``q``-quantile. Returns one row per stratum:
    (stratum, threshold_micro, n_total, n_kept).

    The threshold is the *discrete* percentile — the actual score held by
    the row at ordered position ceil(q*n) — on integer micro-unit scores.
    No interpolation, no float aggregation: every output column is exact
    integer arithmetic, which is what makes the gate auditable and
    replayable on any engine.
    """
    si = F.round(F.col(score_col) * SCORE_MICRO).cast("long")
    base = scored.select(
        F.col(strata_col).alias("stratum"), si.alias("si"), F.col(id_col).alias("id")
    )
    w = Window.partitionBy("stratum")
    ordered = Window.partitionBy("stratum").orderBy("si", "id")
    thr = (
        base.withColumn("rn", F.row_number().over(ordered))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .filter(F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("long"))
        .select("stratum", F.col("si").alias("thr"))
    )
    return (
        base.join(F.broadcast(thr), "stratum")
        .groupBy("stratum")
        .agg(
            F.max("thr").alias("threshold_micro"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum((F.col("si") >= F.col("thr")).cast("long")).alias("n_kept"),
        )
    )


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 4,
) -> DataFrame:
    """Benchmark decontamination: for each training document sharing at
    least one distinct token ``ngram``-gram with any benchmark document,
    report (doc_id, n_shared_grams, n_bench_docs).

    The benchmark side builds the (gram, bench_id) set and broadcasts —
    eval suites are tiny next to a training corpus. Distinct grams per
    document are computed in-row (no explode before the distinct), the
    explode feeds the join directly.
    """

    def grams(df: DataFrame, out_id: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(out_id), tokens(F.col(text_col)).alias("__toks")
            )
            .select(out_id, F.explode(ngrams_from_tokens(F.col("__toks"), ngram)).alias("gram"))
        )

    hits = grams(train, "doc_id").join(
        F.broadcast(grams(bench, "bench_id")), "gram"
    )
    return hits.groupBy("doc_id").agg(
        F.countDistinct("gram").alias("n_shared_grams"),
        F.countDistinct("bench_id").alias("n_bench_docs"),
    )


def temperature_resample(
    df: DataFrame, strata_col: str, id_col: str
) -> DataFrame:
    """Temperature-based stratum rebalancing (alpha = 0.5): keep each
    stratum with probability (n_min / n_stratum)^0.5, so over-represented
    strata are downsampled toward the multilingual-training "temperature
    sampling" distribution while the rarest stratum keeps everything.

    The stratum counts and their min are two tiny aggregates that
    broadcast back onto the corpus; the gate itself is the deterministic
    ppm hash of the row id (operators/sampling.py) — a pure filter, no
    shuffle of the data. alpha is fixed at 0.5 because sqrt is correctly
    rounded in IEEE 754 (any engine replays the rates bit-exactly);
    a transcendental pow(x, alpha) would not be.
    """
    from dnsflow_clickhouse_spark.operators.sampling import PPM, sample_key

    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    min_n = counts.agg(F.min("__n").alias("__min_n"))
    rates = counts.join(F.broadcast(min_n)).select(
        strata_col,
        F.col("__n").alias("stratum_n"),
        F.floor(
            F.lit(PPM)
            * F.sqrt(F.col("__min_n").cast("double") / F.col("__n").cast("double"))
        )
        .cast("long")
        .alias("rate_ppm"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .withColumn("__keep", (sample_key(id_col) < F.col("rate_ppm")).cast("int"))
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Fixed-size token chunking with overlap (context-window prep):
    each document explodes into chunks of ``size`` tokens taken every
    ``stride`` tokens; the final chunk is the remainder (never empty).

    Map-only until the explode, and the explode carries token slices
    rather than repeated full texts — at 100 TB the difference between
    writing chunk shards and re-shuffling whole documents per chunk.
    Empty documents produce zero chunks.

    Requires ``stride <= size``: with a stride wider than the chunk the
    last computed offset can land at-or-past the end of the document and
    emit an empty chunk, breaking the "final chunk is never empty"
    invariant (and silently dropping the tokens in the gap).
    """
    if stride > size or stride <= 0 or size <= 0:
        raise ValueError(
            f"need 0 < stride <= size, got size={size} stride={stride}"
        )
    toks = F.col("__toks")
    n = F.size(toks)
    n_chunks = (
        F.ceil(F.greatest(n - size, F.lit(0)).cast("double") / F.lit(stride)).cast(
            "int"
        )
        + 1
    )
    chunk = F.explode(
        F.when(
            n > 0,
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.struct(
                    i.cast("int").alias("chunk_id"),
                    F.slice(toks, i * stride + 1, size).alias("chunk_toks"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<chunk_id:int,chunk_toks:array<string>>>"))
    )
    return (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .select(id_col, chunk.alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.chunk_toks").alias("n_tokens"),
            F.element_at("c.chunk_toks", 1).alias("first_token"),
            F.element_at("c.chunk_toks", F.size("c.chunk_toks")).alias("last_token"),
        )
    )


def budget_allocation(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    weights_ppm: dict[str, int],
    budget_tokens: int,
) -> DataFrame:
    """Data-mixing budget split: allocate an EXACT global token budget
    across strata by target weights (ppm, must sum to 1_000_000) with
    largest-remainder rounding — the deterministic integer form of the
    mixture-weights step every pretraining run performs before sampling.

    Per stratum: ``alloc = (B * w) // 1e6`` plus one extra token for the
    ``B - sum(alloc)`` strata with the largest remainders (ties -> name
    order), so ``sum(alloc) == B`` exactly. The allocation is then
    capped by what the stratum actually has (``quota``), with the
    uncovered remainder reported as ``shortfall`` — surfacing
    under-supplied strata is the point; silently reflowing their budget
    into over-represented strata is the mixing bug this op exists to
    prevent.

    Scale shape: one map-side-combinable sum per stratum, then all logic
    runs on the strata frame (rows = distinct strata, i.e. tiny); the
    window ordering the remainders never sees the corpus.
    """
    if sum(weights_ppm.values()) != 1_000_000:
        raise ValueError("weights_ppm must sum to 1_000_000")
    spark = df.sparkSession
    w = spark.createDataFrame(
        list(weights_ppm.items()), f"{strata_col} string, target_ppm long"
    )
    avail = df.groupBy(strata_col).agg(
        F.sum(F.col(token_col)).cast("long").alias("avail_tokens")
    )
    base = w.join(avail, strata_col, "left").select(
        strata_col,
        F.coalesce("avail_tokens", F.lit(0)).alias("avail_tokens"),
        "target_ppm",
        ((F.lit(budget_tokens) * F.col("target_ppm")) / F.lit(1_000_000))
        .cast("long")
        .alias("__base"),
        ((F.lit(budget_tokens) * F.col("target_ppm")) % F.lit(1_000_000)).alias(
            "__rem"
        ),
    )
    from pyspark.sql import Window

    # leftover = B - sum(base): how many +1s to hand out. The windows run
    # over the strata frame only (a handful of rows).
    leftover = Window.partitionBy(F.lit(1))
    rank_w = Window.partitionBy(F.lit(1)).orderBy(
        F.desc("__rem"), F.asc(strata_col)
    )
    alloc = base.withColumn(
        "__leftover", F.lit(budget_tokens) - F.sum("__base").over(leftover)
    ).withColumn("__rk", F.row_number().over(rank_w)).withColumn(
        "alloc_tokens",
        F.col("__base")
        + F.when(F.col("__rk") <= F.col("__leftover"), 1).otherwise(0),
    )
    return alloc.select(
        strata_col,
        "avail_tokens",
        "target_ppm",
        "alloc_tokens",
        F.least("alloc_tokens", "avail_tokens").alias("quota_tokens"),
        (
            F.col("alloc_tokens") - F.least("alloc_tokens", "avail_tokens")
        ).alias("shortfall"),
        F.floor(
            F.lit(1_000_000)
            * F.least("alloc_tokens", "avail_tokens")
            / F.lit(budget_tokens)
        ).alias("achieved_ppm"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols: list[str],
) -> DataFrame:
    """Corpus-version diff (the CDC primitive of incremental curation):
    per id, ``status`` in {added, removed, changed, unchanged} computed
    by full-outer-joining the two snapshots on the id and comparing md5
    fingerprints of the content columns. Texts are never shipped through
    the join — each side reduces to (id, 16-byte fingerprint) first, so
    the shuffle carries fingerprints even when documents are megabytes.

    One equi-join on the id; both fingerprint projections are map-only.
    The output is one row per id in either snapshot — feed it to a
    groupBy(status) for the audit report, or semi-join 'added'/'changed'
    ids back against the new snapshot to get the incremental work list.
    """
    fp = F.md5(F.concat_ws("\x01", *[F.col(c) for c in content_cols]))
    o = old.select(F.col(id_col).alias("id"), fp.alias("__old_fp"))
    n = new.select(F.col(id_col).alias("id"), fp.alias("__new_fp"))
    j = o.join(n, "id", "full_outer")
    return j.select(
        "id",
        F.when(F.col("__old_fp").isNull(), F.lit("added"))
        .when(F.col("__new_fp").isNull(), F.lit("removed"))
        .when(F.col("__old_fp") == F.col("__new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def rare_token_stats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    rare_max_count: int = 2,
) -> DataFrame:
    """Log-free perplexity stand-in: per document, the share of token
    OCCURRENCES whose corpus-wide count is <= ``rare_max_count``
    (``rare_ppm``, exact-integer). High rare-mass flags gibberish /
    OCR noise / boilerplate-free junk the way an LM-perplexity filter
    would, without a model and without transcendental math (a real
    logprob needs ln, which is not correctly-rounded-portable across
    engines — the reason this engine's quality gates are all integer).

    Two hash aggregates (corpus term counts, then per-doc rare mass)
    plus one equi-join on the term; all map-side combinable. Docs with
    zero tokens report rare_ppm = 0.
    """
    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    counts = occ.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    flagged = occ.join(counts, "term").select(
        "doc_id", (F.col("n") <= rare_max_count).cast("long").alias("is_rare")
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.sum("is_rare").alias("n_rare"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_toks", F.lit(0)).alias("n_toks"),
            F.coalesce("n_rare", F.lit(0)).alias("n_rare"),
            F.when(F.coalesce("n_toks", F.lit(0)) == 0, F.lit(0).cast("long"))
            .otherwise(
                F.floor(F.lit(1_000_000) * F.col("n_rare") / F.col("n_toks"))
            )
            .alias("rare_ppm"),
        )
    )


def borda_rank(
    df: DataFrame,
    id_col: str,
    signal_cols: list[str],
    top_n: int = 20,
) -> DataFrame:
    """Rank-aggregation quality ensemble (Borda count, histogram form):
    each signal awards a document as many points as there are documents
    with a STRICTLY smaller signal value (value-level mid-rank — ties
    award equally, so the score is a pure function of the value
    histogram and engine-portable), and the ensemble score is the sum
    across signals. The curation pattern for combining heterogeneous
    quality signals without calibrating their scales first.

    Scale shape: per signal, one (value, cnt) histogram aggregate and a
    cumulative window that walks DISTINCT VALUES (never rows), then one
    join back per signal keyed on the value. The final top-N lowers to
    TakeOrderedAndProject — the corpus is never globally sorted.

    NULL signals award ZERO points for that signal and never drop the
    row: NULLs are excluded from the value histogram, the join-back is
    a LEFT join, and the points are coalesced to 0 — well-defined,
    engine-portable (a SQL twin mirrors it with ``WHERE c IS NOT NULL``
    in the histogram CTE + ``LEFT JOIN`` + ``COALESCE(pts, 0)``), and
    the plain equality key keeps the broadcast-hash fast path that a
    null-safe join key would forfeit."""
    out = df.select(F.col(id_col).alias("id"), *[F.col(c) for c in signal_cols])
    total = F.lit(0).cast("long")
    for c in signal_cols:
        hist = (
            out.filter(F.col(c).isNotNull())
            .groupBy(F.col(c).alias("__v"))
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        w = Window.orderBy("__v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        below = hist.withColumn(
            f"__pts_{c}",
            (F.sum("__cnt").over(w) - F.col("__cnt")).cast("long"),
        ).select(F.col("__v").alias(f"__v_{c}"), f"__pts_{c}")
        out = out.join(
            below, F.col(c) == F.col(f"__v_{c}"), "left"
        ).drop(f"__v_{c}")
        total = total + F.coalesce(F.col(f"__pts_{c}"), F.lit(0).cast("long"))
    return (
        out.withColumn("borda", total)
        .select("id", *signal_cols, "borda")
        .orderBy(F.desc("borda"), F.asc("id"))
        .limit(top_n)
        .withColumnRenamed("id", id_col)
    )


def greedy_budget_selection(
    df: DataFrame,
    id_col: str,
    quality_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Budget-constrained greedy selection — keep the highest-quality
    documents until a token budget is exhausted — WITHOUT globally
    sorting the corpus: find the quality CUTOFF on the (quality,
    token-mass) histogram (every document strictly above the cutoff
    fits), then admit boundary-layer documents (quality == cutoff) in
    deterministic id order until the remainder is spent. The histogram
    walk and the boundary window touch distinct-value / boundary-layer
    rows only; the full corpus sees one aggregate and one filter — the
    scale-safe form of "sort by quality, take until budget".

    Output: one row — budget, cutoff quality, counts/token mass of the
    strictly-above layer and of the admitted boundary docs."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(quality_col).cast("long").alias("q"),
        F.col(weight_col).cast("long").alias("w"),
    )
    hist = base.groupBy("q").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("w").alias("mass")
    )
    w_above = Window.orderBy(F.desc("q")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.withColumn(
        "mass_above", F.coalesce(F.sum("mass").over(w_above), F.lit(0))
    )
    # cutoff = the highest quality value whose strictly-above mass still
    # fits the budget; everything above it is admitted wholesale
    cut = (
        cum.filter(F.col("mass_above") <= budget)
        .agg(F.min("q").alias("cutoff"))
    )
    j = base.crossJoin(F.broadcast(cut))
    above = j.filter(F.col("q") > F.col("cutoff")).agg(
        F.count(F.lit(1)).cast("long").alias("n_above"),
        F.coalesce(F.sum("w"), F.lit(0)).cast("long").alias("mass_above"),
    )
    # boundary layer: admit in id order while the remainder holds
    w_b = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    boundary = (
        j.filter(F.col("q") == F.col("cutoff"))
        .withColumn("__cum", F.sum("w").over(w_b))
        .crossJoin(F.broadcast(above))
        .filter(F.col("__cum") <= F.lit(budget) - F.col("mass_above"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_boundary"),
            F.coalesce(F.sum("w"), F.lit(0)).cast("long").alias("mass_boundary"),
        )
    )
    return (
        cut.crossJoin(above)
        .crossJoin(boundary)
        .select(
            F.lit(budget).cast("long").alias("budget"),
            F.col("cutoff").cast("long").alias("cutoff"),
            "n_above",
            "mass_above",
            "n_boundary",
            "mass_boundary",
            (F.col("n_above") + F.col("n_boundary")).cast("long").alias("n_kept"),
            (F.col("mass_above") + F.col("mass_boundary"))
            .cast("long")
            .alias("mass_kept"),
        )
    )
