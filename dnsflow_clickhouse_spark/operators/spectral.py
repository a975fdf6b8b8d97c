"""Embedding-spectrum diagnostics: exact integer Gram matrix + power
iteration (engine extension for training-data pipelines).

The linear-algebra member of the embedding family next to k-means/PQ
(operators/similarity.py): before trusting an embedding column for
near-dup thresholds, ANN recall targets, or whitening, a pipeline
measures its SPECTRUM — a top component carrying most of the mass
means collapsed/anisotropic embeddings (Mu & Viswanath 2018, "All-but-
the-Top"; Ethayarajh 2019 on anisotropy), which silently break cosine
thresholds. This module computes the uncentered second-moment (Gram)
matrix G = sum_rows x x^T exactly in integers over quantized vectors,
then the dominant eigenpair by fixed-iteration power method — all in
EXACT integer arithmetic (python ints driver-side are arbitrary-
precision), so a SQL engine replays every number bit-for-bit.

Scale shape:

- the 100 TB pass is the Gram accumulation: an Arrow ``mapInPandas``
  kernel folds each batch into one d x d integer partial (X^T X via
  numpy matmul) and emits d^2 rows PER BATCH — the corpus never
  shuffles; only (i, j, partial) cells do, and the final hash
  aggregate widens partials to decimal(38,0) so ~1e12-row corpora
  cannot wrap (per-batch int64 partials are bounded by
  batch_rows * (scale*|x|)^2 ~ 1e4 * 2.5e9 = 2.5e13).
- the d x d result (d=64 -> 4096 cells) is model state: it collects
  to the driver ONCE (the documented training-state carve-out, same
  as the k-means codebooks in operators/similarity.py) and the power
  iteration runs in exact python ints: v0 = SCALE * ones;
  u = G v; v' = sign(u) * ((|u| * SCALE) // max|u|) — the rescale
  divides only NONNEGATIVE values, so truncating (Spark/python) and
  flooring (DuckDB //) division agree.
- Rayleigh quotient and trace share are exact integer divisions of
  nonnegative quantities (G is PSD): top_eig = (v G v) // (v v),
  top_share_ppm = top_eig * 1e6 // trace(G).

Reference parity note: the reference engine (ref: DnsRptCH.scala) has
no embedding operators; this extends the engine's similarity family.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.operators.similarity import QUANT_SCALE, quantize

V_SCALE = 1_000_000


class PowerIterationResult(NamedTuple):
    eigvec_scaled: list[int]  # V_SCALE-units, max|entry| == V_SCALE
    top_eig: int  # Rayleigh quotient, exact integer div
    top_share_ppm: int  # top_eig * 1e6 // trace(G)
    gram_diag: list[int]


def gram_matrix(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Exact integer Gram cells (i, j, g), 1-based indices, over
    quantized vectors. One corpus scan; d^2 rows per Arrow batch."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # yield the d^2 partial PER ARROW BATCH (~1e4 rows), not per
        # partition: the int64 partial's overflow bound is then
        # rows_per_batch * max|q|^2, which numpy holds with ~1e4x
        # headroom; a per-partition accumulator would instead grow with
        # partition size and could wrap int64 silently in numpy before
        # the decimal(38,0) widening in the Spark-side sum below
        ii, jj = np.meshgrid(
            np.arange(1, dim + 1), np.arange(1, dim + 1), indexing="ij"
        )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.int64) for v in pdf["q"]]
            )
            acc = x.T @ x
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "g": acc.ravel()}
            )

    cells = df.select(quantize(F.col(vec_col)).alias("q")).mapInPandas(
        fold, "i long, j long, g long"
    )
    return cells.groupBy("i", "j").agg(
        F.sum(F.col("g").cast("decimal(38,0)")).alias("g")
    )


def top_eig_power(
    gram: DataFrame, dim: int, iters: int = 3
) -> PowerIterationResult:
    """Collect the d x d Gram (model state) and run ``iters`` rounds of
    integer power iteration. Exact: python ints never overflow, and
    every operation (matmul, abs, //, max) is replayable in SQL."""
    g = [[0] * dim for _ in range(dim)]
    for row in gram.collect():
        g[row["i"] - 1][row["j"] - 1] = int(row["g"])
    v = [V_SCALE] * dim
    for _ in range(iters):
        u = [sum(g[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in u)
        if m == 0:  # zero corpus: eigvec stays the uniform start
            break
        v = [
            (1 if x >= 0 else -1) * ((abs(x) * V_SCALE) // m) for x in u
        ]
    num = sum(
        g[i][j] * v[i] * v[j] for i in range(dim) for j in range(dim)
    )
    den = sum(x * x for x in v)
    trace = sum(g[i][i] for i in range(dim))
    top_eig = num // den if den else 0
    share = (top_eig * 1_000_000) // trace if trace else 0
    return PowerIterationResult(
        v, top_eig, share, [g[i][i] for i in range(dim)]
    )
