from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.sources.layout import write_zordered
from dnsflow_clickhouse_spark.sources.skipping import (
    build_manifest,
    read_with_skipping,
)


def _kept_files(spark, path, ranges):
    return read_with_skipping(spark, path, ranges).inputFiles()


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    # two independent uniform dimensions — the worst case for a
    # single-column sort, the motivating case for Z-order
    df = spark.range(0, 20_000).select(
        F.col("id"),
        (F.col("id") * 48271 % 65537 % 1000).alias("x"),
        (F.col("id") * 69621 % 65537 % 1000).alias("y"),
    )
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    # linear: clustered by x only (what a naive pipeline writes)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        linear
    )
    write_zordered(df, zord, ["x", "y"], n_files=16)
    for p in (linear, zord):
        build_manifest(spark, p, ["x", "y"])

    box = {"x": (100.0, 199.0), "y": (100.0, 199.0)}
    y_slice = {"y": (0.0, 99.0)}

    # identical rows under the exact filter, fewer files opened
    for ranges in (box, y_slice):
        cond = None
        for c, (lo, hi) in ranges.items():
            p = (F.col(c) >= lo) & (F.col(c) <= hi)
            cond = p if cond is None else (cond & p)
        expect = df.filter(cond).count()
        for path in (linear, zord):
            got = read_with_skipping(spark, path, ranges).filter(cond).count()
            assert got == expect

    # the x-sorted layout has no y-locality: every file intersects a
    # y-predicate; the z-ordered layout prunes most of them
    assert len(_kept_files(spark, linear, y_slice)) == 16
    assert len(_kept_files(spark, zord, y_slice)) <= 8
    # the 2-D box must never prune worse than the x-only layout (the
    # exact counts vary with range-exchange sampling, so no strict <)
    assert len(_kept_files(spark, zord, box)) <= len(
        _kept_files(spark, linear, box)
    )


def test_zorder_key_rejects_int64_overflow(spark):
    import pytest

    from dnsflow_clickhouse_spark.sources.layout import zorder_key

    with pytest.raises(ValueError):
        zorder_key([F.col("a")] * 8, [(0.0, 1.0)] * 8, bits=8)


def test_compact_partitioned_shrinks_file_count(spark, tmp_path):
    from dnsflow_clickhouse_spark.sources.layout import compact_partitioned

    src = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    df = spark.range(0, 3000).select(
        (F.col("id") % 3).alias("day"), F.col("id").alias("v")
    )
    # fragment: 20 shuffle partitions x 3 partition dirs -> ~60 small files
    df.repartition(20).write.partitionBy("day").parquet(src)
    n_before = sum(1 for p in Path(src).rglob("*.parquet"))
    assert n_before >= 30  # genuinely fragmented fixture

    compact_partitioned(spark, src, out, ["day"])
    n_after = sum(1 for p in Path(out).rglob("*.parquet"))
    got = spark.read.parquet(out)
    assert got.count() == 3000
    # tiny partitions (~KB each vs the 128MB target) -> one file apiece
    assert n_after == 3
    # partition dirs survive
    assert sorted(
        p.name for p in Path(out).iterdir() if p.name.startswith("day=")
    ) == ["day=0", "day=1", "day=2"]
    # same data, partition column intact
    assert got.groupBy("day").count().orderBy("day").collect() == df.groupBy(
        "day"
    ).count().orderBy("day").collect()
