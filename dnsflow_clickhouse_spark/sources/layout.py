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
