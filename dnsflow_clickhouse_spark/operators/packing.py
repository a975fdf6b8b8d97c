"""Sequence packing (engine extension for training-data pipelines):
greedily concatenate documents into fixed-token-budget training
sequences.

This is the one curation operator whose semantics are genuinely
sequential — each document's sequence assignment depends on the running
token total before it — so it cannot be a window expression (the
accumulator resets when the cap overflows, which breaks prefix-sum
algebra). The scale scheme is standard for packing at 100 TB:

- partition the corpus into deterministic shards (id-derived, so the
  layout is reproducible), pack *within* each shard in id order;
- each shard packs independently in one Arrow batch via
  ``applyInPandas`` — parallelism = shard count, which grows with the
  data; the driver never sees a row;
- the per-shard loop is O(shard size) in pandas (vectorized read of one
  int column, plain Python fold), dwarfed by the scan that feeds it.

The DuckDB oracle replays the fold as a recursive CTE walking each
shard in row order — the packing loop is hash-verified, not just
row-counted.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.textfn import token_count

PACK_SCHEMA = "doc_id long, shard long, ntok long, seq_id long"


def _pack_one_shard(pdf: pd.DataFrame, cap: int) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    seqs: list[int] = []
    seq = acc = 0
    first = True
    for ntok in pdf["ntok"]:
        if first:
            acc, seq, first = int(ntok), 0, False
        elif acc + int(ntok) > cap:
            seq, acc = seq + 1, int(ntok)
        else:
            acc += int(ntok)
        seqs.append(seq)
    pdf["seq_id"] = pd.Series(seqs, dtype="int64")
    return pdf[["doc_id", "shard", "ntok", "seq_id"]]


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    cap: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document a (shard, seq_id) training-sequence slot.

    Greedy contiguous packing in id order within each shard: a document
    joins the current sequence unless that would push its token total
    over ``cap``, in which case it starts the next one. Oversized
    documents (> cap tokens) get a sequence of their own.
    """
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_shards).alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("ntok"),
    )
    return staged.groupBy("shard").applyInPandas(
        lambda pdf: _pack_one_shard(pdf, cap), PACK_SCHEMA
    )
