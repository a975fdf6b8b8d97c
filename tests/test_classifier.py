"""Batch perceptron classifier (operators/classifier.py): independent
Python replay of the hashed features and the full training loop —
every weight, gradient and trace number must match the exact-integer
Spark computation bit-for-bit."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.textfn import POLY_MOD, POLY_MULT, tokens
from dnsflow_clickhouse_spark.operators.classifier import (
    batch_perceptron_train,
    hashed_token_features,
    score_documents,
)

D = 16

DOCS = [
    (1, "good fine good", 1),
    (2, "good solid fine", 1),
    (3, "bad awful bad bad", -1),
    (4, "awful poor", -1),
    (5, "good bad", 1),  # mixed doc — keeps the problem non-trivial
    (6, "   ", -1),  # zero tokens: outside the training set
]


def _poly(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * POLY_MULT + ord(ch)) % POLY_MOD
    return h


def _py_features() -> dict[int, Counter]:
    feats: dict[int, Counter] = {}
    for doc_id, text, _ in DOCS:
        toks = text.split()
        if toks:
            feats[doc_id] = Counter(_poly(t) % D for t in toks)
    return feats


def _py_train(epochs: int = 3):
    feats = _py_features()
    labels = {doc_id: y for doc_id, _, y in DOCS}
    w: Counter = Counter()
    trace = []
    for epoch in range(1, epochs + 1):
        mis = [
            doc_id
            for doc_id, fv in feats.items()
            if labels[doc_id] * sum(c * w[b] for b, c in fv.items()) <= 0
        ]
        grad: Counter = Counter()
        for doc_id in mis:
            for b, c in feats[doc_id].items():
                grad[b] += labels[doc_id] * c
        for b, g in grad.items():
            w[b] += g
        trace.append(
            (
                epoch,
                len(mis),
                sum(abs(g) for g in grad.values()),
                sum(abs(x) for x in w.values()),
            )
        )
    return w, trace, feats, labels


def _spark_parts(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, t, y in DOCS], "id long, y long"
    )
    features = hashed_token_features(df, "doc_id", tokens(F.col("text")), D)
    return features, labels


def test_features_match_python_replay(spark):
    features, _ = _spark_parts(spark)
    got = {
        (r["id"], r["b"]): r["c"] for r in features.collect()
    }
    want = {
        (doc_id, b): c
        for doc_id, fv in _py_features().items()
        for b, c in fv.items()
    }
    assert got == want  # doc 6 (zero tokens) contributes no rows


def test_training_matches_python_replay(spark):
    features, labels = _spark_parts(spark)
    model = batch_perceptron_train(features, labels, D, epochs=3)
    w_py, trace_py, feats, lab = _py_train(3)
    assert model.trace == trace_py
    assert {b: w for b, w in model.weights.items() if w != 0} == {
        b: w for b, w in w_py.items() if w != 0
    }
    # the toy problem is nearly separable: epoch 3 must misclassify
    # strictly fewer docs than epoch 1's everything-is-wrong start
    assert model.trace[-1][1] < model.trace[0][1]


def test_scores_match_and_zero_margin_counts_as_miss(spark):
    features, labels = _spark_parts(spark)
    model = batch_perceptron_train(features, labels, D, epochs=2)
    w_py, trace_py, feats, lab = _py_train(2)
    got = {r["id"]: r["score"] for r in score_documents(features, model).collect()}
    want = {
        doc_id: sum(c * w_py[b] for b, c in fv.items())
        for doc_id, fv in feats.items()
    }
    assert got == want
    # epoch 1 counts EVERY featured doc as misclassified (margin 0)
    assert trace_py[0][1] == len(feats) == model.trace[0][1]
