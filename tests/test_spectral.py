"""Embedding spectrum operators (operators/spectral.py): Python/numpy
replay of the exact integer Gram and power iteration, plus a rank-1
fixture whose dominant eigenpair is known analytically."""

from __future__ import annotations

from dnsflow_clickhouse_spark.operators.spectral import (
    V_SCALE,
    gram_matrix,
    top_eig_power,
)

DIM = 4


def _mk(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _py_gram(vecs):
    q = [[round(x * 10000) for x in v] for v in vecs]
    g = [[0] * DIM for _ in range(DIM)]
    for row in q:
        for i in range(DIM):
            for j in range(DIM):
                g[i][j] += row[i] * row[j]
    return g


def _py_power(g, iters=3):
    v = [V_SCALE] * DIM
    for _ in range(iters):
        u = [sum(g[i][j] * v[j] for j in range(DIM)) for i in range(DIM)]
        m = max(abs(x) for x in u)
        if m == 0:
            break
        v = [(1 if x >= 0 else -1) * ((abs(x) * V_SCALE) // m) for x in u]
    return v


VECS = [
    [1.0, 0.5, -0.25, 0.0],
    [0.9, 0.4, 0.1, -0.2],
    [-0.3, 1.1, 0.0, 0.6],
    [0.05, -0.7, 0.8, 0.25],
    [0.0, 0.0, 0.0, 0.0],  # zero vector contributes nothing
]


def test_gram_matches_python_replay(spark):
    cells = gram_matrix(_mk(spark, VECS), "embedding", DIM).collect()
    got = {(r["i"], r["j"]): int(r["g"]) for r in cells}
    want = _py_gram(VECS)
    assert got == {
        (i + 1, j + 1): want[i][j] for i in range(DIM) for j in range(DIM)
    }


def test_power_iteration_matches_python_replay(spark):
    g = gram_matrix(_mk(spark, VECS), "embedding", DIM)
    res = top_eig_power(g, DIM, iters=3)
    want_v = _py_power(_py_gram(VECS), 3)
    assert res.eigvec_scaled == want_v
    assert max(abs(x) for x in res.eigvec_scaled) == V_SCALE
    assert 0 <= res.top_share_ppm <= 1_000_000


def test_rank_one_data_concentrates(spark):
    # every vector is a multiple of e2 -> top component IS e2 and it
    # carries the whole trace (share ppm == 1e6 exactly)
    vecs = [[0.0, s, 0.0, 0.0] for s in (1.0, -2.0, 0.5, 3.0)]
    res = top_eig_power(gram_matrix(_mk(spark, vecs), "embedding", DIM), DIM)
    assert res.top_share_ppm == 1_000_000
    assert res.eigvec_scaled[1] == V_SCALE  # dominant coordinate
    assert res.eigvec_scaled[0] == res.eigvec_scaled[2] == 0
