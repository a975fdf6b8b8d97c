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


def test_dsir_log_ratio_matches_hand_replay(spark):
    # target slice = src 't' (doc1 only). Corpus bigrams:
    # doc1 "a b a b": (a,b)x2 (b,a)x1 ; doc2 "a a": (a,a)x1 ;
    # doc3 "b a": (b,a)x1
    # raw:    c2r (a,b)=2 (b,a)=2 (a,a)=1 ; c1r a=3 b=2 ; vr=2
    # target: c2t (a,b)=2 (b,a)=1         ; c1t a=2 b=1 ; vt=2
    from dnsflow_clickhouse_spark.operators.lm import dsir_log_ratio_scores

    df = spark.createDataFrame(
        [(1, "a b a b", "t"), (2, "a a", "r"), (3, "b a", "r")],
        "doc_id long, text string, src string",
    )
    out = {
        r.doc_id: r
        for r in dsir_log_ratio_scores(
            df, "doc_id", F.split("text", " "), F.col("src") == "t"
        ).collect()
    }
    t_ab = _q((2 + 1) / (2 + 2), MICRO) - _q((2 + 1) / (3 + 2), MICRO)
    t_ba = _q((1 + 1) / (1 + 2), MICRO) - _q((2 + 1) / (2 + 2), MICRO)
    # (a,a) is unseen in the target (c2t=0) but its HISTORY 'a' is seen
    # (c1t=2): back-off = (0+1) / (c1t + vt) = 1/4, not 1/vt
    t_aa = _q((0 + 1) / (2 + 2), MICRO) - _q((1 + 1) / (3 + 2), MICRO)
    assert out[1].n_bigrams == 3
    assert out[1].dsir_micro == 2 * t_ab + t_ba
    assert out[1].avg_dsir == (2 * t_ab + t_ba) / 3 / MICRO
    # doc2's (a,a) is UNSEEN in the target -> smoothed back-off path
    assert out[2].dsir_micro == t_aa
    assert out[3].dsir_micro == t_ba
    # the target-sourced doc scores higher per bigram than the
    # out-of-domain one (the whole point of the weight)
    assert out[1].avg_dsir > out[2].avg_dsir


def test_token_jsd_identical_zero_disjoint_one(spark):
    from dnsflow_clickhouse_spark.operators.lm import token_jsd_pairs

    df = spark.createDataFrame(
        [("g1", "a b"), ("g2", "a b"), ("g3", "c d")],
        "src string, text string",
    )
    out = {
        (r.grp_a, r.grp_b): r
        for r in token_jsd_pairs(df, "src", F.split("text", " ")).collect()
    }
    assert set(out) == {("g1", "g2"), ("g1", "g3"), ("g2", "g3")}
    # identical distributions -> 0 bits (clamped exact zero)
    assert out[("g1", "g2")].jsd_nano == 0
    # disjoint vocabularies -> exactly 1 bit
    assert out[("g1", "g3")].jsd_nano == NANO
    assert out[("g1", "g3")].jsd_bits == 1.0


def test_token_jsd_partial_overlap_hand_replay(spark):
    from dnsflow_clickhouse_spark.operators.lm import token_jsd_pairs

    df = spark.createDataFrame(
        [("p", "a a"), ("q", "a b")], "src string, text string"
    )
    r = token_jsd_pairs(df, "src", F.split("text", " ")).collect()[0]
    # P: a=1.0 ; Q: a=0.5 b=0.5 ; n_a = n_b = 2
    # side P: token a: m = 0.75, wterm = 2 * q(1/0.75)
    # side Q: a: m = 0.75, wterm = 1 * q(0.5/0.75) ; b: m = 0.25,
    #         wterm = 1 * q(2.0)
    wsum_p = 2 * _q(1 / 0.75, NANO)
    wsum_q = _q(0.5 / 0.75, NANO) + _q(2.0, NANO)
    expect = max(wsum_p, 0) // 4 + max(wsum_q, 0) // 4
    assert (r.grp_a, r.grp_b, r.n_a, r.n_b) == ("p", "q", 2, 2)
    assert r.jsd_nano == expect
    assert 0 < r.jsd_bits < 1


def test_pmi_collocations_hand_replay(spark):
    from dnsflow_clickhouse_spark.operators.lm import pmi_collocations
    from dnsflow_clickhouse_spark.functions.textfn import tokens as _toks

    # doc1: x y x y -> pairs (x,y)x2 (y,x)x1 ; doc2: x y z -> (x,y) (y,z)
    # c2: (x,y)=3 (y,x)=1 (y,z)=1, N2=5 ; uni: x=3 y=3 z=1, N1=7
    df = spark.createDataFrame([("x y x y",), ("x y z",)], "text string")
    rows = pmi_collocations(
        df, _toks(F.col("text")), min_count=2, k=10
    ).collect()
    assert len(rows) == 1  # only (x,y) survives min_count=2
    r = rows[0]
    assert (r["a"], r["b"], r["c2"], r["ca"], r["cb"]) == ("x", "y", 3, 3, 3)
    ratio = ((3.0 * 7) * 7) / ((5.0 * 3) * 3)  # pinned op order
    assert r["pmi_micro"] == math.floor(math.log2(ratio) * MICRO + 0.5)


def test_pmi_min_count_and_ordering(spark):
    from dnsflow_clickhouse_spark.operators.lm import pmi_collocations
    from dnsflow_clickhouse_spark.functions.textfn import tokens as _toks

    # "a b" repeated 3x and "c d" repeated 2x inside filler: both pass
    # min_count=2; the rarer pair has the higher PMI (smaller unigram
    # mass) and must sort first.
    df = spark.createDataFrame(
        [("a b a b a b",), ("c d c d",), ("a filler a filler a",)],
        "text string",
    )
    rows = pmi_collocations(df, _toks(F.col("text")), min_count=2, k=10).collect()
    got = [(r["a"], r["b"]) for r in rows]
    assert ("c", "d") in got and ("a", "b") in got
    assert got.index(("c", "d")) < got.index(("a", "b"))
    micros = [r["pmi_micro"] for r in rows]
    assert micros == sorted(micros, reverse=True)
