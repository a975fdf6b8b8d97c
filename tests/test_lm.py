"""Statistical LM scoring operators (operators/lm.py): hand-replayed
expectations for the add-one bigram log-probability and the token
entropy, using the module's own term-level quantization (floor(log2(x)
* scale + 0.5)) computed independently in Python."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.operators.lm import (
    MICRO,
    NANO,
    bigram_logprob_scores,
    token_entropy_by_group,
)


def _q(x: float, scale: int) -> int:
    return math.floor(math.log2(x) * scale + 0.5)


def test_bigram_logprob_matches_hand_replay(spark):
    # doc1: a b a b -> bigrams (a,b)x2 (b,a)x1 ; doc2: a a -> (a,a)x1
    # c2: (a,b)=2 (b,a)=1 (a,a)=1 ; c1: a=3 b=1 ; V=2
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a a"), (3, "solo")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in bigram_logprob_scores(
            df, "doc_id", F.split("text", " ")
        ).collect()
    }
    assert set(out) == {1, 2}  # doc 3 has < 2 tokens -> excluded
    # V = 3: the vocabulary spans the WHOLE corpus, including docs too
    # short to score ('solo' still contributes its token)
    t_ab = _q((2 + 1) / (3 + 3), MICRO)
    t_ba = _q((1 + 1) / (1 + 3), MICRO)
    t_aa = _q((1 + 1) / (3 + 3), MICRO)
    assert out[1].n_bigrams == 3
    assert out[1].logprob_micro == 2 * t_ab + t_ba
    assert out[1].avg_logprob == (2 * t_ab + t_ba) / 3 / MICRO
    assert out[2].n_bigrams == 1
    assert out[2].logprob_micro == t_aa


def test_token_entropy_matches_hand_replay(spark):
    df = spark.createDataFrame(
        [("g1", "a a b b"), ("g2", "x x x"), ("g3", "p q r s")],
        "src string, text string",
    )
    out = {
        r.src: r
        for r in token_entropy_by_group(df, "src", F.split("text", " ")).collect()
    }
    # g1: uniform over 2 tokens -> exactly 1 bit
    assert (out["g1"].n_tokens, out["g1"].vocab) == (4, 2)
    assert out["g1"].entropy_nano == NANO
    assert out["g1"].entropy_bits == 1.0
    # g2: degenerate distribution -> 0 bits
    assert (out["g2"].n_tokens, out["g2"].vocab) == (3, 1)
    assert out["g2"].entropy_nano == 0
    # g3: uniform over 4 -> exactly 2 bits
    assert out["g3"].entropy_nano == 2 * NANO
    assert out["g3"].entropy_bits == 2.0
