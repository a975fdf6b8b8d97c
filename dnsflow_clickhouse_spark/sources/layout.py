"""Multi-dimensional clustered write layout (Z-order), feeding the
zone-map skipping in sources/skipping.py.

A sort on one column gives perfect file-level locality for that column
and none for any other. Interleaving the bits of several columns' rank
buckets (a Z-order / Morton curve — the technique Delta OPTIMIZE ZORDER
and ClickHouse's mortonEncode index use) gives PARTIAL locality on every
participating column at once: each output file covers a small hyper-box
of the key space, so the per-file min/max intervals the manifest records
stay tight on all dimensions and a selective predicate on ANY of them
prunes most files at planning time.

Scale shape: one stats aggregate (2 scalars per column to the driver —
planning metadata), one map-side bucketize+interleave expression (pure
codegen), one sampled range exchange on the z-key, and a sort WITHIN
each output partition. No global single-partition stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 8  # per-dimension resolution (256 buckets)


def _bucketize(c: Column, vmin: float, vmax: float, nb: int) -> Column:
    """Linear rank bucket in [0, nb): planning-time min/max, clamped so
    late-arriving out-of-range values still land in the edge buckets.
    ``None`` stats (empty frame, or an all-null column) degenerate to
    bucket 0, same as a constant column — the write still succeeds, it
    just contributes no clustering on that dimension."""
    if vmin is None or vmax is None or vmax <= vmin:
        return F.lit(0).cast("long")
    scaled = (
        (c.cast("double") - F.lit(float(vmin)))
        * F.lit(float(nb))
        / F.lit(float(vmax - vmin) * (1 + 1e-9))
    )
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)), F.lit(nb - 1)
    )


def zorder_key(
    cols: list[Column],
    stats: list[tuple[float, float]],
    bits: int = ZORDER_BITS,
) -> Column:
    """Morton-interleave the ``bits``-bit rank buckets of ``cols`` into
    one long: bit b of column j lands at position b*len(cols)+j. Pure
    integer expression — stays inside whole-stage codegen."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds int64")
    buckets = [
        _bucketize(c, lo, hi, 1 << bits) for c, (lo, hi) in zip(cols, stats)
    ]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, bk in enumerate(buckets):
            bit = F.shiftright(bk, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit.cast("long"), b * n + j)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Z-order curve of ``cols``: range-repartition by the z-key (balanced
    files regardless of data skew — the curve is just a sort key) and
    sort within each partition so row groups inside a file are tight
    too. Pair with skipping.build_manifest over the same columns."""
    row = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    stats = [(row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols]
    z = zorder_key([F.col(c) for c in cols], stats, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_partitioned(
    spark,
    in_path: str,
    out_path: str,
    partition_cols: list[str],
    target_bytes: int = 128 << 20,
) -> None:
    """Small-file compaction for a hive-partitioned parquet table — the
    OPTIMIZE/maintenance pass every streaming or micro-batch sink needs
    (each trigger writes a few files per partition; a month later the
    table is 100k tiny files and planning time + scan setup dominate
    every query).

    Per-partition output file counts are derived from the partition's
    estimated byte share (rows-proportional split of the table's scan
    size), clamped to >= 1: a partition with 10 MB becomes one file, one
    with 10 GB becomes ~80. Rows are routed with an explicit
    ``repartition(partition_cols + __file)`` so each output file is one
    shuffle task's worth of co-located rows — no global sort, no
    single-partition stage, and the shuffle is the unavoidable one any
    re-bucketing write pays. Row order within a partition is not
    preserved (compaction contract); pair with write_zordered when
    clustering matters.
    """
    df = spark.read.parquet(in_path)
    from dnsflow_clickhouse_spark.operators.util import est_input_bytes

    try:
        total_bytes = est_input_bytes(df)
    except Exception:
        total_bytes = None
    counts = df.groupBy(*partition_cols).count()
    total_rows = df.count()
    if total_bytes is None or not total_rows:
        files = counts.select(*partition_cols, F.lit(1).alias("__nf"))
    else:
        bpr = total_bytes / total_rows
        files = counts.select(
            *partition_cols,
            F.greatest(
                F.ceil(F.col("count") * F.lit(bpr) / F.lit(target_bytes)),
                F.lit(1),
            ).cast("int").alias("__nf"),
        )
    routed = df.join(F.broadcast(files), partition_cols).withColumn(
        "__file",
        F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.col("__nf")),
    )
    (
        routed.repartition(*partition_cols, "__file")
        .drop("__nf", "__file")
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(out_path)
    )
