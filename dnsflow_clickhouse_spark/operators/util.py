"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cpu_repartition(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Repartition for a CPU-bound downstream stage (interpreted
    higher-order expressions, Arrow/pandas kernels) with an EXPLICIT
    partition count.

    ``df.repartition(F.col(...))`` without a count is advisory: AQE
    coalesces it by shuffle BYTE size (advisoryPartitionSizeInBytes),
    which is the right call for I/O-bound stages but starves CPU-bound
    ones — a few MB of text can carry seconds of per-row signature
    work, and AQE will happily fold it onto 2-3 tasks. An explicit
    count is exempt from AQE coalescing, so parallelism follows the
    session's configured width (spark.sql.shuffle.partitions — sized
    per cluster) instead of the data's byte size.
    """
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return df.repartition(n, *exprs)
