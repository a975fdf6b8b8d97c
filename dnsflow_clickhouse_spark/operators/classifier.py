"""Trainable document-quality classifier: batch perceptron over hashed
token features (engine extension for training-data pipelines).

The model-based stage of a corpus curation loop: heuristic gates
(``operators/corpus.py``) and statistical-LM scores (``operators/
lm.py``) are model-FREE; the production counterpart (CCNet / fastText
quality filters, GPT-3's WebText classifier) TRAINS a linear text
classifier on a labeled slice and scores the whole crawl with it. This
module implements that shape with the batch perceptron (Rosenblatt
1958; averaged/structured variants in Collins 2002, EMNLP) instead of
logistic regression so training stays in EXACT INTEGER arithmetic —
features are token counts, weights are integer sums of counts, every
epoch is replayable bit-for-bit by any SQL engine (the DuckDB oracle
unrolls the epochs as CTEs). No transcendental functions means no
cross-engine libm drift, the hazard a sigmoid would import.

Scale shape (the distributed-LR pattern, e.g. Spark MLlib's):

- the corpus is touched once to build a SPARSE feature table
  (doc, bucket, count) — one explode + one hash aggregate, then a
  lineage barrier so epochs never re-derive it;
- model state (``n_features`` weight rows, e.g. 256) lives on the
  driver between epochs and enters each epoch's plan as a broadcast
  literal frame — the classic parameter-broadcast loop. Per epoch the
  fact-side work is: one broadcast join + per-doc hash agg (score),
  one filter (misclassified), one per-bucket hash agg (gradient).
  Two tiny driver collects per epoch (gradient + error count), both
  O(n_features) / O(1) — the documented training-state carve-out, same
  as the k-means codebook loop in ``operators/similarity.py``;
- scoring is one broadcast join + hash agg over the corpus — the
  100 TB pass is a single scan, shuffled only as (doc) partial sums.

Overflow discipline: counts, weights and scores are int64. |gradient|
per bucket is bounded by the corpus token count (< 2^50 for ~1 PB of
text), weights by ``epochs`` times that, and per-doc scores by
doc_len * max|w| — the score product is widened to decimal(38,0)
before summing so a pathological corpus saturates gracefully instead
of wrapping (ANSI off).

Reference parity note: the reference engine (ref: DnsRptCH.scala) has
no trainable classifier; this is a first-class engine extension in the
spirit of its report operators (label → aggregate → threshold).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.textfn import poly_hash


class PerceptronModel(NamedTuple):
    """Driver-side model state: sparse integer weights + epoch trace."""

    weights: dict[int, int]  # bucket -> weight (absent = 0)
    trace: list[tuple[int, int, int, int]]  # (epoch, n_mis, grad_l1, w_l1)
    n_features: int


def hashed_token_features(
    df: DataFrame, id_col: str, toks: Column, n_features: int
) -> DataFrame:
    """Sparse hashed bag-of-words: (id, b, c) with
    b = poly_hash(token) % n_features (portable hash — the oracle
    replays it), c = occurrence count. One explode + one hash
    aggregate; documents with zero tokens contribute no rows and are
    therefore outside the training set by construction.

    The table is REPARTITIONED BY id before the aggregate: hash(id)
    clusters (id, b) too, so the aggregate adds no second exchange, and
    every downstream epoch — the label join, the per-doc score
    aggregate, the misclassified join — reuses this one partitioning
    instead of re-shuffling the corpus (the training loop's per-epoch
    shuffles collapse to the d-bucket gradient aggregate).
    """
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("toks"))
        .repartition("id")
        .select("id", F.explode("toks").alias("tok"))
        .select(
            "id", (poly_hash(F.col("tok")) % F.lit(n_features)).alias("b")
        )
        .groupBy("id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _weights_df(spark: SparkSession, weights: dict[int, int]) -> DataFrame:
    rows = [(int(b), int(w)) for b, w in sorted(weights.items())]
    return spark.createDataFrame(rows or [], "b bigint, w bigint")


def _scores(features: DataFrame, labels: DataFrame, wdf: DataFrame) -> DataFrame:
    """Per-doc margin under the given weights: (id, y, score).

    The c*w product is widened to decimal(38,0) before the sum (see
    module overflow discipline); the final score is cast back to long
    — exact whenever the true score fits int64.
    """
    return (
        features.join(labels, "id")
        .join(F.broadcast(wdf), "b", "left")
        .groupBy("id", "y")
        .agg(
            F.sum(
                F.expr("CAST(c AS DECIMAL(38,0)) * coalesce(w, 0)")
            )
            .cast("long")
            .alias("score")
        )
    )


def batch_perceptron_train(
    features: DataFrame,
    labels: DataFrame,
    n_features: int,
    epochs: int = 3,
) -> PerceptronModel:
    """Batch perceptron: per epoch, sum the (y * x) updates of every
    misclassified document (margin y*score <= 0, zero counted as a
    miss) into the weight vector in one shot. Deterministic — no
    per-row update order to pin, unlike the online perceptron — and
    exactly the unrolled-CTE form the DuckDB oracle replays.

    ``labels``: (id, y) with y in {-1, +1}. Returns the driver-side
    model (weights dict + per-epoch trace); use :func:`score_documents`
    to apply it. Weights start at zero, so epoch 1's gradient is the
    full label-weighted feature mass.
    """
    spark = features.sparkSession
    # persist, not localCheckpoint: InMemoryRelation PRESERVES the
    # feature table's hashpartitioning(id) (a checkpoint's LogicalRDD
    # forgets it), so every epoch's label join, per-doc score aggregate
    # and misclassified join reuse the one up-front shuffle. The
    # features cache is left in place for the caller's scoring pass;
    # labels are co-partitioned and dropped when training ends.
    feats = features.persist()
    lab = labels.repartition("id").persist()
    weights: dict[int, int] = {}
    trace: list[tuple[int, int, int, int]] = []
    for epoch in range(1, epochs + 1):
        if not weights:
            # zero weights: every featured document has margin 0 and
            # counts as misclassified — skip the scoring pass
            mis = feats.select("id").distinct().join(lab, "id")
        else:
            wdf = _weights_df(spark, weights)
            mis = (
                _scores(feats, lab, wdf)
                .filter(F.col("y") * F.col("score") <= 0)
                .select("id", "y")
            )
        mis = mis.persist()
        n_mis = mis.count()  # materializes the cache for the join
        grad = (
            feats.join(mis, "id")
            .groupBy("b")
            .agg(F.sum(F.col("y") * F.col("c")).alias("g"))
            .collect()
        )
        mis.unpersist()
        grad_l1 = 0
        for row in grad:
            weights[row["b"]] = weights.get(row["b"], 0) + row["g"]
            grad_l1 += abs(row["g"])
        w_l1 = sum(abs(w) for w in weights.values())
        trace.append((epoch, n_mis, grad_l1, w_l1))
    lab.unpersist()
    return PerceptronModel(weights, trace, n_features)


def score_documents(
    features: DataFrame, model: PerceptronModel
) -> DataFrame:
    """Apply trained weights: (id, score) — one broadcast join + one
    hash aggregate over the corpus; sign(score) is the prediction."""
    wdf = _weights_df(features.sparkSession, model.weights)
    return (
        features.join(F.broadcast(wdf), "b", "left")
        .groupBy("id")
        .agg(
            F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * coalesce(w, 0)"))
            .cast("long")
            .alias("score")
        )
    )
