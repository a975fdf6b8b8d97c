"""Property tests (hypothesis): the portable integer kernels checked
against INDEPENDENT pure-python references on randomized inputs. The
DuckDB oracles prove cross-engine agreement on the fixed testdata;
these prove the algebra itself holds across the input space — each
example batches many values into one DataFrame so Spark round-trips
stay cheap."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.operators.sketches import (
    QH_SUB_BITS,
    qh_bucket,
    qh_bucket_floor,
)


def _py_qh_bucket(v: int, sub_bits: int = QH_SUB_BITS) -> int:
    shift = max(v.bit_length() - sub_bits - 1, 0)
    return (shift << sub_bits) + (v >> shift)


def _py_qh_floor(b: int, sub_bits: int = QH_SUB_BITS) -> int:
    if b < 1 << (sub_bits + 1):
        return b
    shift = (b >> sub_bits) - 1
    return (b - (shift << sub_bits)) << shift


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62 - 1), min_size=1, max_size=80
    )
)
def test_qh_bucket_matches_python_reference(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = (
        df.select("v", qh_bucket(F.col("v")).alias("b"))
        .withColumn("f", qh_bucket_floor(F.col("b")))
        .collect()
    )
    for r in rows:
        assert r.b == _py_qh_bucket(r.v), (r.v, r.b)
        assert r.f == _py_qh_floor(r.b), (r.b, r.f)
        # the bound the sketch's accuracy contract rests on
        assert r.f <= r.v
        assert r.v < (_py_qh_floor(r.b + 1) if r.v > 0 else 1) or r.b == _py_qh_bucket(r.v)


def _py_dup_spans(docs: list[list[str]], k: int):
    """Brute-force reference: positions whose k-gram occurs in >= 2
    distinct docs, merged into maximal intervals per doc."""
    from collections import defaultdict

    where = defaultdict(set)
    for d, toks in enumerate(docs):
        for i in range(len(toks) - k + 1):
            where[tuple(toks[i : i + k])].add(d)
    out = []
    for d, toks in enumerate(docs):
        pos = [
            i
            for i in range(len(toks) - k + 1)
            if len(where[tuple(toks[i : i + k])]) >= 2
        ]
        spans = []
        for p in pos:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k)
            else:
                spans.append([p, p + k])
        out.append(
            (d, len(toks), len(spans), sum(e - s for s, e in spans))
        )
    return out


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12
        ),
        min_size=2,
        max_size=8,
    )
)
def test_duplicate_spans_match_python_reference(spark, docs):
    from dnsflow_clickhouse_spark.operators.spans import duplicate_span_stats

    k = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_toks, r.n_spans, r.dup_tokens)
        for r in duplicate_span_stats(df, "doc_id", "text", k=k).collect()
    }
    for d, n_toks, n_spans, dup_tokens in _py_dup_spans(docs, k):
        assert got[d] == (n_toks, n_spans, dup_tokens), (d, docs)


def _py_budget(weights: dict[str, int], budget: int):
    base = {s: budget * w // 1_000_000 for s, w in weights.items()}
    rem = {s: budget * w % 1_000_000 for s, w in weights.items()}
    leftover = budget - sum(base.values())
    for s in sorted(weights, key=lambda s: (-rem[s], s))[:leftover]:
        base[s] += 1
    return base


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=999_997), min_size=2, max_size=6
    ),
    st.integers(min_value=1, max_value=10**9),
)
def test_budget_allocation_matches_python_reference(spark, raw, budget):
    from dnsflow_clickhouse_spark.operators.corpus import budget_allocation

    # normalize raw weights to exactly 1e6 ppm (remainder to the first)
    total = sum(raw)
    weights = {f"s{i}": w * 1_000_000 // total for i, w in enumerate(raw)}
    weights["s0"] += 1_000_000 - sum(weights.values())
    d = spark.createDataFrame(
        [(s, 10) for s in weights], ["lang", "toks"]
    )
    out = {
        r.lang: r.alloc_tokens
        for r in budget_allocation(d, "lang", "toks", weights, budget).collect()
    }
    assert out == _py_budget(weights, budget)
    assert sum(out.values()) == budget


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("abcdefg"), min_size=0, max_size=12
        ).map(lambda toks: " ".join(toks)),
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([0.3, 0.5, 0.7]),
)
def test_prefix_filtered_jaccard_is_lossless(spark, texts, threshold):
    """The PPJoin prefix/size/positional filters must be LOSSLESS: on
    randomized corpora the kernel's output equals the naive
    every-shared-gram join's, pair for pair — the property the whole
    CC family rests on (single-token alphabet keeps gram collisions and
    boundary Jaccard values frequent, which is where a broken filter
    would show)."""
    from dnsflow_clickhouse_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filtered_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    naive = {
        (r.id_a, r.id_b, r.inter)
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", ngram=2, threshold=threshold
        ).collect()
    }
    fast = {
        (r.id_a, r.id_b, r.inter)
        for r in prefix_filtered_jaccard_pairs(
            docs, "doc_id", "text", ngram=2, threshold=threshold
        ).collect()
    }
    assert fast == naive, (texts, threshold)


def _py_lloyd(rows, k, iters):
    """Independent plain-int Lloyd reference for _lloyd_numpy: init = k
    smallest ids, argmin with ties to the lowest cid, floor-division
    means, empty clusters keep their centroid."""
    rows = sorted(rows)
    cents = [list(q) for _, q in rows[:k]]
    for _ in range(iters):
        assign = []
        for _, q in rows:
            best, bd = 0, None
            for ci, c in enumerate(cents):
                d = sum((a - b) ** 2 for a, b in zip(q, c))
                if bd is None or d < bd:
                    best, bd = ci, d
            assign.append(best)
        for ci in range(k):
            members = [q for (_, q), a in zip(rows, assign) if a == ci]
            if members:
                cents[ci] = [
                    sum(col) // len(members) for col in zip(*members)
                ]
    return cents


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=-(10**6), max_value=10**6),
            min_size=2,
            max_size=2,
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=2),
)
def test_lloyd_numpy_matches_python_reference(vals, k, iters):
    from dnsflow_clickhouse_spark.operators.similarity import _lloyd_numpy

    k = min(k, len(vals))
    rows = [(i, v) for i, v in enumerate(vals)]
    got = _lloyd_numpy([(0, i, v) for i, v in rows], 1, k, iters)[0]
    assert got == _py_lloyd(rows, k, iters), (vals, k, iters)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                min_size=1,
                max_size=6,
            ),
            st.sampled_from([1, -1]),
        ),
        min_size=2,
        max_size=8,
    )
)
def test_perceptron_label_flip_antisymmetry(spark, docs):
    """Negating every label negates the weights and preserves the whole
    trace (n_mis, grad_l1, w_l1): y*score <= 0 iff (-y)*(-score) <= 0,
    so the misclassified sets coincide epoch by epoch."""
    from dnsflow_clickhouse_spark.functions.textfn import tokens
    from dnsflow_clickhouse_spark.operators.classifier import (
        batch_perceptron_train,
        hashed_token_features,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, (toks, _) in enumerate(docs)],
        "doc_id long, text string",
    )
    feats = hashed_token_features(df, "doc_id", tokens(F.col("text")), 8)
    feats = feats.localCheckpoint(eager=False)

    def lab(sign):
        return spark.createDataFrame(
            [(i, sign * y) for i, (_, y) in enumerate(docs)],
            "id long, y long",
        )

    m_pos = batch_perceptron_train(feats, lab(1), 8, epochs=2)
    m_neg = batch_perceptron_train(feats, lab(-1), 8, epochs=2)
    assert m_pos.trace == m_neg.trace
    assert {b: -w for b, w in m_pos.weights.items() if w != 0} == {
        b: w for b, w in m_neg.weights.items() if w != 0
    }


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),
            st.integers(min_value=10, max_value=13),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_hits_ignores_edge_multiplicity(spark, edges, dup):
    """HITS runs on the DISTINCT edge set: replicating every edge
    ``dup`` times must leave hubs and authorities untouched."""
    from dnsflow_clickhouse_spark.operators.graph import hits_scores

    once = spark.createDataFrame(edges, "src long, dst long")
    many = spark.createDataFrame(edges * dup, "src long, dst long")
    h1, a1 = hits_scores(once, iterations=2)
    h2, a2 = hits_scores(many, iterations=2)
    assert {r.id: r.hub for r in h1.collect()} == {
        r.id: r.hub for r in h2.collect()
    }
    assert {r.id: r.auth for r in a1.collect()} == {
        r.id: r.auth for r in a2.collect()
    }


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=20,
    ),
    st.sampled_from([2, 3, 6]),
)
def test_portable_round_matches_python_and_duckdb(spark, vals, digits):
    """portable_round must equal floor(x*10^d + 0.5)/10^d computed by
    python AND by DuckDB on the same doubles — the three-way agreement
    that F.round(x, d) lacks on boundary values."""
    import math

    import duckdb

    from dnsflow_clickhouse_spark.functions.numeric import (
        portable_round,
        sql_portable_round,
    )

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r["y"]
        for r in df.select(portable_round(F.col("x"), digits).alias("y"))
        .collect()
    ]
    scale = 10**digits
    want_py = [math.floor(v * scale + 0.5) / scale for v in vals]
    con = duckdb.connect()
    want_duck = [
        con.execute(
            f"SELECT {sql_portable_round(f'CAST({v!r} AS DOUBLE)', digits)}"
        ).fetchone()[0]
        for v in vals
    ]
    assert got == want_py == want_duck


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=1000), min_size=1, max_size=60
    ),
    st.integers(min_value=0, max_value=2_000_000_000),
    st.integers(min_value=0, max_value=4_000_000_000),
)
def test_cusum_prefix_scan_identity(spark, xs, k, h):
    """The distributed form (running sum - clamped running min) equals
    Page's sequential recurrence s_t = max(0, s_{t-1} + x*1e6 - k) for
    ARBITRARY series and thresholds — the identity the operator's one-
    shuffle plan rests on."""
    from dnsflow_clickhouse_spark.operators.profiling import (
        cusum_changepoints,
    )

    rows = [("s", t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    got = [
        (r.cusum_micro, r.alarm)
        for r in cusum_changepoints(df, "g", "t", "x", k, h)
        .orderBy("t")
        .collect()
    ]
    s, want = 0, []
    for x in xs:
        s = max(0, s + x * 1_000_000 - k)
        want.append((s, int(s > h)))
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_winnowing_guarantee_on_random_shared_spans(spark, data):
    """Schleimer/Wilkerson/Aiken's detection guarantee, fuzzed: any two
    documents sharing a token run of >= w + k - 1 tokens share at
    least one selected fingerprint hash, whatever surrounds the run."""
    from dnsflow_clickhouse_spark.operators.dedup import winnow_fingerprints

    K, W = 3, 4
    word = st.text(alphabet="abcdefgh", min_size=1, max_size=5)
    span = data.draw(st.lists(word, min_size=K + W - 1, max_size=12))
    pre1 = data.draw(st.lists(word, min_size=0, max_size=8))
    suf1 = data.draw(st.lists(word, min_size=0, max_size=8))
    pre2 = data.draw(st.lists(word, min_size=0, max_size=8))
    suf2 = data.draw(st.lists(word, min_size=0, max_size=8))
    texts = [
        (1, " ".join(pre1 + span + suf1)),
        (2, " ".join(pre2 + span + suf2)),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", K, W).collect()
    h1 = {r.fp_hash for r in fps if r.id == 1}
    h2 = {r.fp_hash for r in fps if r.id == 2}
    assert h1 & h2, f"no shared fingerprint for shared span {span}"


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=1, allow_nan=False, width=32),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_pareto_frontier_matches_bruteforce(spark, pts):
    """The windowed skyline equals the O(n^2) dominance definition:
    keep row i iff no row j has x_j >= x_i and y_j >= y_i with at
    least one strict."""
    from dnsflow_clickhouse_spark.operators.profiling import pareto_frontier

    rows = [(i, round(float(x), 6), int(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x double, y long")
    got = sorted(r.id for r in pareto_frontier(df, "id", "x", "y").collect())
    exp = sorted(
        i
        for i, x, y in rows
        if not any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for j, x2, y2 in rows
            if j != i
        )
    )
    assert got == exp


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(min_value=-5000, max_value=5000), min_size=1, max_size=80)
)
def test_mad_outliers_matches_python_reference(spark, vals):
    """Lo-median and MAD equal statistics.median_low on the same data;
    the outlier count equals the brute filter."""
    import statistics

    from dnsflow_clickhouse_spark.operators.profiling import mad_outliers

    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    [r] = mad_outliers(df, "g", "v", k=3).collect()
    med = statistics.median_low(vals)
    mad = statistics.median_low([abs(v - med) for v in vals])
    n_out = sum(1 for v in vals if abs(v - med) > 3 * mad)
    assert (r.n, r.med, r.mad, r.n_outliers) == (len(vals), med, mad, n_out)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50)),
        min_size=2,
        max_size=80,
    )
)
def test_ks_by_group_matches_bruteforce_cdf(spark, rows):
    """ks_ppm equals the brute maximum over observed values of the
    ppm-quantized CDF gap, group vs rest."""
    from dnsflow_clickhouse_spark.operators.profiling import ks_by_group

    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: r.ks_ppm for r in ks_by_group(df, "g", "v").collect()}
    vals = sorted({v for _, v in rows})
    groups = {g for g, _ in rows}
    for g in groups:
        ing = sorted(v for gg, v in rows if gg == g)
        rest = sorted(v for gg, v in rows if gg != g)
        best = 0
        for x in vals:
            cg = sum(1 for v in ing if v <= x) * 1_000_000 // len(ing)
            cr = (
                sum(1 for v in rest if v <= x) * 1_000_000 // len(rest)
                if rest
                else 1_000_000
            )
            best = max(best, abs(cg - cr))
        assert got[g] == best


@settings(max_examples=5, deadline=None)
@given(
    st.integers(min_value=6, max_value=12),  # planted span length >= w+k-1
    st.integers(min_value=0, max_value=5),   # owner prefix length
    st.integers(min_value=0, max_value=5),   # later-doc prefix length
)
def test_scrub_guarantee_later_doc_always_loses_core(spark, span_len, p1, p2):
    """Winnowing guarantee, transform form: a shared run of
    >= w + k - 1 tokens (k=3, w=4 -> 6) ALWAYS loses at least one
    fingerprinted core in the later document, and the owner never
    loses anything."""
    from dnsflow_clickhouse_spark.operators.dedup import scrub_duplicate_spans

    span = " ".join(f"s{i}" for i in range(span_len))
    d1 = (" ".join(f"a{i}" for i in range(p1)) + " " + span).strip()
    d2 = (" ".join(f"b{i}" for i in range(p2)) + " " + span).strip()
    df = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id long, text string"
    )
    got = {
        r.id: r
        for r in scrub_duplicate_spans(df, "doc_id", "text", 3, 4, 64).collect()
    }
    assert got[1].n_removed == 0 and got[1].clean_text == d1
    assert got[2].n_removed >= 1
    # removal only ever touches shared-span tokens
    gone = set(d2.split()) - set(got[2].clean_text.split())
    assert gone <= set(span.split())
