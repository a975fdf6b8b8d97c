"""Production-width ANN / SimHash / MinHash catalog instances
(round-9 verdict ask #5).

The oracle-pinned catalog entries deliberately run TOY widths (16-bit
SimHash, 8 hyperplanes, 8 MinHash hashes) so a DuckDB oracle can replay
every integer. The documented 100 TB settings — 64-bit signatures,
16 hyperplanes with multi-probe, 64-hash/16-band MinHash over raw
``xxhash64`` — were previously executed only in scale smokes. These
entries run the production widths against the standard test tables on
EVERY sweep, each returning a one-row SELF-CONSISTENCY report instead
of raw pairs:

- ``simhash_wide_neardups``: 64-bit xxhash64 SimHash, banded Hamming
  candidates at 8 bands / max_hamming 7 (< n_bands, so banding is
  LOSSLESS by pigeonhole) — the report re-proves losslessness against
  an exact all-pairs Hamming scan over a capped, deterministic doc
  subset.
- ``embedding_ann_wide_recall``: 16-plane / 2-table multi-probe
  hyperplane LSH recall@1 against the exact GEMM top-1 on
  deterministically perturbed near-dup queries (the geometry ANN is
  deployed for).
- ``minhash_wide_recall``: 64-hash/16-band xxhash64 MinHash-LSH
  candidates (with the round-10 ``max_bucket_size`` guard engaged at
  its production setting) measured against the exact Jaccard >= 0.7
  truth from the lossless prefix-filtered kernel — the banding theory
  predicts recall 1-(1-J^4)^16 (~0.99 at J=0.7, ~1 for exact dups).

No ``oracle_sql`` twins by design: raw xxhash64 and the 16-plane GEMM
signature are not DuckDB-replayable — the driver records the
rows-only check and the REPORT VALUES are the verification (pytest
pins floors; the sweep artifact carries the observed numbers every
round). Every expensive exact side is capped by a deterministic
id-ordered subset so the entries stay runnable at scale-smoke tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.sources.tables import load_table

# deterministic bound on the exact (quadratic / GEMM) verification side:
# the production-width CANDIDATE path always runs over the full table;
# only the ground-truth scan is capped, so the entries survive the 16x+
# scale tiers while still executing the 100 TB knob settings.
EXACT_CAP = 2048

SIMHASH_BITS, SIMHASH_BANDS, SIMHASH_MAXHAM = 64, 8, 7
ANN_PLANES, ANN_TABLES = 16, 2
MH_HASHES, MH_BANDS, MH_BUCKET_CAP = 64, 16, 100_000


def _capped_ids(df: DataFrame, id_col: str, cap: int = EXACT_CAP) -> DataFrame:
    """The ``cap`` smallest ids — a deterministic subset whose exact
    ground truth stays quadratic-in-cap, not quadratic-in-corpus
    (TakeOrderedAndProject; no full sort)."""
    return df.select(F.col(id_col).alias("id")).orderBy("id").limit(cap)


def _neardup_queries(emb: DataFrame, cap: int = EXACT_CAP) -> DataFrame:
    """Near-dup query set shared by the ANN self-proof entries: the
    ``cap`` smallest corpus vectors perturbed by deterministic +-5%
    multiplicative per-dim noise (the portable square-mix recipe —
    reduce the id mod m BEFORE multiplying so int64 never overflows),
    so each query's true nearest neighbor is its source vector at
    cosine ~0.999 — the geometry ANN is deployed for."""
    src = emb.join(
        _capped_ids(emb, "vec_id", cap).withColumnRenamed("id", "vec_id"),
        "vec_id",
        "semi",
    )
    return src.select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x
            * (
                F.lit(1.0)
                + (
                    (
                        (F.col("vec_id") % 1000003) * 131071
                        + i.cast("long") * 8191
                        + 7
                    )
                    % 101
                    - 50
                ).cast("double")
                / F.lit(1000.0)
            ),
        ).alias("embedding"),
    ).localCheckpoint(eager=False)


def simhash_wide_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit production SimHash (raw xxhash64 token hashes) with banded
    Hamming candidate mining at the documented scale setting, plus an
    executed losslessness proof: over the EXACT_CAP smallest doc_ids,
    the banded pair set at hamming <= 7 must equal the exact all-pairs
    scan (pigeonhole: 7 flips cannot touch all 8 bands).

    Output (1 row): n_docs, n_pairs_banded (full corpus),
    n_pairs_exact_capped, n_pairs_banded_capped, lossless (0/1).
    """
    from dnsflow_clickhouse_spark.operators.dedup import (
        banded_hamming_pairs,
        hamming64,
        simhash_df,
    )

    d = load_table(spark, sf_dir, "documents")
    sig = simhash_df(
        d, "doc_id", "text", n_bits=SIMHASH_BITS, hash_fn=F.xxhash64
    ).localCheckpoint(eager=False)
    banded = banded_hamming_pairs(
        sig, "id", "simhash", SIMHASH_BITS, SIMHASH_BANDS, SIMHASH_MAXHAM
    ).localCheckpoint(eager=False)

    cap_ids = _capped_ids(d, "doc_id")
    sub = sig.join(cap_ids, "id", "semi").select("id", "simhash")
    a, b = sub.alias("a"), sub.alias("b")
    exact_capped = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .filter(
            hamming64(F.col("a.simhash"), F.col("b.simhash"))
            <= SIMHASH_MAXHAM
        )
        .select(F.count(F.lit(1)).alias("n"))
    )
    banded_capped = (
        banded.join(cap_ids.withColumnRenamed("id", "id_a"), "id_a", "semi")
        .join(cap_ids.withColumnRenamed("id", "id_b"), "id_b", "semi")
        .select(F.count(F.lit(1)).alias("n"))
    )
    n_docs = d.select(F.count(F.lit(1)).alias("n"))
    n_banded = banded.select(F.count(F.lit(1)).alias("n"))
    return (
        n_docs.withColumnRenamed("n", "n_docs")
        .crossJoin(n_banded.withColumnRenamed("n", "n_pairs_banded"))
        .crossJoin(exact_capped.withColumnRenamed("n", "n_pairs_exact_capped"))
        .crossJoin(banded_capped.withColumnRenamed("n", "n_pairs_banded_capped"))
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_pairs_banded").cast("long").alias("n_pairs_banded"),
            F.col("n_pairs_exact_capped").cast("long").alias("n_pairs_exact_capped"),
            F.col("n_pairs_banded_capped").cast("long").alias("n_pairs_banded_capped"),
            (F.col("n_pairs_banded_capped") == F.col("n_pairs_exact_capped"))
            .cast("int")
            .alias("lossless"),
        )
    )


def embedding_ann_wide_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-plane multi-probe hyperplane LSH at the production ANN width,
    scored as recall@1 against the exact GEMM top-1 on NEAR-DUP
    GEOMETRY: each query is a corpus vector (EXACT_CAP smallest
    vec_ids) perturbed by deterministic +-5% per-dimension noise (the
    portable square-mix recipe, replayable anywhere), so its true
    nearest neighbor is its source vector at cosine ~0.999. That is
    the geometry ANN exists for — on this synthetic corpus the
    UNPERTURBED top-10 sits at cosine ~0.37 (random-vector range),
    where any LSH's recall is a property of the data, not the
    operator. Expected here: per-plane flip prob ~theta/pi ~1%,
    P(0 flips) ~0.85, multiprobe covers 1 flip -> ~0.98 per table;
    the second independent table (r10 n_tables knob) squares the
    remaining miss probability -> ~0.999.

    The candidate index is built over the FULL corpus — only the query
    set is capped, which is also the production shape (queries bounded
    + broadcast, corpus never shuffled).

    Output (1 row): n_queries, n_hits, recall_ppm.
    """
    from dnsflow_clickhouse_spark.operators.similarity import (
        cosine_topk,
        hyperplane_lsh_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = _neardup_queries(emb)
    exact = cosine_topk(q, emb, "vec_id", "embedding", k=1).select(
        "query_id", "neighbor_id"
    ).localCheckpoint(eager=False)
    ann = hyperplane_lsh_topk(
        q,
        emb,
        "vec_id",
        "embedding",
        k=1,
        n_planes=ANN_PLANES,
        multiprobe=True,
        n_tables=ANN_TABLES,
    ).select("query_id", "neighbor_id")
    hits = exact.join(ann, ["query_id", "neighbor_id"], "semi")
    return (
        q.select(F.count(F.lit(1)).alias("n_queries"))
        .crossJoin(hits.select(F.count(F.lit(1)).alias("n_hits")))
        .select(
            F.col("n_queries").cast("long").alias("n_queries"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr("(n_hits * 1000000) div n_queries")
            .cast("long")
            .alias("recall_ppm"),
        )
    )


def minhash_wide_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-hash / 16-band MinHash-LSH over raw ``xxhash64`` gram hashes —
    the exact production signature configuration, hot-bucket guard
    engaged — measured against the exact Jaccard >= 0.7 ground truth
    from the lossless prefix-filtered kernel (capped id subset).
    Banding theory: P(candidate | J) = 1-(1-J^4)^16, ~0.988 at J=0.7
    and ~1.0 for exact duplicates, so recall_ppm ~ 990k+ on the
    dup-saturated synthetic corpus.

    Output (1 row): n_true, n_candidates, n_found, recall_ppm,
    n_hot_buckets (r11: the guard's drop count as a REPORT VALUE — a
    lossy hot-bucket drop is visible in every sweep, not just in a log
    nobody reads; 0 on this corpus, asserted by tests/test_wide.py).
    """
    from dnsflow_clickhouse_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_hot_bucket_counts,
        prefix_filtered_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    cands_raw = lsh_candidate_pairs(
        d,
        "doc_id",
        "text",
        n_hashes=MH_HASHES,
        n_bands=MH_BANDS,
        hash_fn=F.xxhash64,
        max_bucket_size=MH_BUCKET_CAP,
    )
    hot = lsh_hot_bucket_counts(cands_raw).select("n_hot_buckets")
    cands = cands_raw.localCheckpoint(eager=False)
    cap_ids = _capped_ids(d, "doc_id")
    sub = d.join(
        cap_ids.withColumnRenamed("id", "doc_id"), "doc_id", "semi"
    )
    truth = (
        prefix_filtered_jaccard_pairs(sub, "doc_id", "text", threshold=0.5)
        .filter(F.col("jaccard") >= 0.7)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    found = truth.join(cands, ["id_a", "id_b"], "semi")
    return (
        truth.select(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(cands.select(F.count(F.lit(1)).alias("n_candidates")))
        .crossJoin(found.select(F.count(F.lit(1)).alias("n_found")))
        .crossJoin(hot)
        .select(
            F.col("n_true").cast("long").alias("n_true"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.col("n_found").cast("long").alias("n_found"),
            F.expr(
                "CASE WHEN n_true = 0 THEN 1000000"
                " ELSE (n_found * 1000000) div n_true END"
            )
            .cast("long")
            .alias("recall_ppm"),
            F.col("n_hot_buckets").cast("long").alias("n_hot_buckets"),
        )
    )


IVFPQ_W_CELLS, IVFPQ_W_M, IVFPQ_W_K = 16, 8, 32
IVFPQ_W_NPROBE, IVFPQ_W_ITERS = 4, 2
IVFPQ_W_QUERIES = 512  # bounds the broadcast ADC table (q x nprobe x m*k)


def ivfpq_wide_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ at production composition — 16 coarse cells / nprobe 4,
    m=8 subspaces x 32 codewords over residuals, 2 Lloyd iterations —
    scored as recall@1 against the exact GEMM top-1 on the SAME
    near-dup geometry as :func:`embedding_ann_wide_recall` (r10 verdict
    #7: the toy-width IVF-PQ is DuckDB-oracled; this entry executes the
    scale knobs every sweep and self-proves them).

    Expected: the perturbed query lands in (or within nprobe of) its
    source's coarse cell, and at near-dup distance the source's summed
    ADC lookups sit far below any random corpus vector's, so PQ
    distortion (m*log2(k) = 40 bits/vector here) still ranks the true
    neighbor first for ~all queries. The query set is capped at 512
    (the production shape: queries bounded + broadcast as the ADC
    table, corpus codes never reshuffled); the index covers the FULL
    corpus.

    Output (1 row): n_queries, n_hits, recall_ppm.
    """
    from dnsflow_clickhouse_spark.operators.similarity import (
        cosine_topk,
        ivfpq_build,
        ivfpq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = _neardup_queries(emb, cap=IVFPQ_W_QUERIES)
    exact = cosine_topk(q, emb, "vec_id", "embedding", k=1).select(
        "query_id", "neighbor_id"
    ).localCheckpoint(eager=False)
    codes, cells, books = ivfpq_build(
        emb, "vec_id", "embedding", dim=64,
        n_cells=IVFPQ_W_CELLS, m=IVFPQ_W_M, k=IVFPQ_W_K,
        iters=IVFPQ_W_ITERS,
    )
    ann = ivfpq_topk(
        codes, cells, books, q, "vec_id", "embedding",
        k_neighbors=1, nprobe=IVFPQ_W_NPROBE,
    ).select("query_id", "neighbor_id")
    hits = exact.join(ann, ["query_id", "neighbor_id"], "semi")
    return (
        q.select(F.count(F.lit(1)).alias("n_queries"))
        .crossJoin(hits.select(F.count(F.lit(1)).alias("n_hits")))
        .select(
            F.col("n_queries").cast("long").alias("n_queries"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr("(n_hits * 1000000) div n_queries")
            .cast("long")
            .alias("recall_ppm"),
        )
    )


# rows-only entries: sql=None -> the driver/sweep records row-count +
# schema stability; the report VALUES carry the self-consistency proof
WIDE_REGISTRY: dict = {
    "simhash_wide_neardups": (simhash_wide_neardups, None),
    "embedding_ann_wide_recall": (embedding_ann_wide_recall, None),
    "minhash_wide_recall": (minhash_wide_recall, None),
    "ivfpq_wide_recall": (ivfpq_wide_recall, None),
}
