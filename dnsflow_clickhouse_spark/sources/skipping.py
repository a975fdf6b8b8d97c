"""Manifest-based data skipping (zone maps) for non-partition columns.

Partition pruning (io.write_events_partitioned) only helps for the
columns the layout was partitioned by. For any OTHER selective column —
a user id, a numeric range — the 100 TB alternative to scanning every
file is a per-file min/max manifest consulted at planning time: the
same idea as Delta/Iceberg file statistics or ClickHouse's sparse
primary-key index (the reference gets this from MergeTree for free;
plain parquet directories need it rebuilt).

The manifest is built once per dataset write from the parquet FOOTERS
(pyarrow reads only metadata — no data pages touched) and stored as its
own tiny parquet table. ``read_with_skipping`` evaluates a conjunction
of closed-interval predicates against the manifest and hands Spark the
surviving file list; Spark's own row-group pruning then applies inside
each file. Files written before the column existed (no stats) are
conservatively kept.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifest"


def build_manifest(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Scan parquet footers under ``path`` and write the per-file
    min/max manifest for the NUMERIC columns in ``cols`` to
    ``<path>/_manifest`` (file, col, vmin double, vmax double).
    Non-numeric stats are skipped — such files stay un-skippable for
    that column, which is the conservative direction."""
    import pyarrow.parquet as pq

    rows: list[tuple[str, str, float, float]] = []
    for root, _dirs, files in os.walk(path):
        # segment-exact: a parent directory merely CONTAINING the string
        # "_manifest" must not disable the whole walk
        if MANIFEST_DIR in root.split(os.sep):
            continue
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            fpath = os.path.join(root, fname)
            meta = pq.ParquetFile(fpath).metadata
            idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
            for c in cols:
                if c not in idx:
                    continue
                mins: list[float] = []
                maxs: list[float] = []
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(idx[c]).statistics
                    try:
                        if st is None or not st.has_min_max:
                            raise ValueError
                        mins.append(float(st.min))
                        maxs.append(float(st.max))
                    except (TypeError, ValueError):
                        mins, maxs = [], []
                        break
                if mins:
                    rows.append((fpath, c, min(mins), max(maxs)))
    mdf = spark.createDataFrame(
        rows, "file string, col string, vmin double, vmax double"
    )
    mdf.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, MANIFEST_DIR)
    )
    return mdf


def read_with_skipping(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple[float, float]],
) -> DataFrame:
    """Read the dataset keeping only files whose manifest interval
    intersects every ``col: (lo, hi)`` predicate. The caller still
    applies the row-exact filter on the result — skipping is a superset
    guarantee, identical semantics, fewer files opened.

    The manifest is file-count-sized; evaluating it on the driver is the
    point (planning-time work), exactly like Delta's log replay.
    """
    mrows = spark.read.parquet(os.path.join(path, MANIFEST_DIR)).collect()
    stats: dict[str, dict[str, tuple[float, float]]] = {}
    for r in mrows:
        stats.setdefault(r.file, {})[r.col] = (r.vmin, r.vmax)

    # Enumerate the ACTUAL data files, not the manifest keys: a file with
    # no usable stats for any requested column, or one written after the
    # manifest was built, has no manifest row at all — skipping must only
    # drop files the manifest positively proves disjoint, so unknown
    # files are kept.
    all_files: list[str] = []
    for root, _dirs, files in os.walk(path):
        if MANIFEST_DIR in root.split(os.sep):
            continue
        all_files.extend(
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        )
    all_files.sort()
    keep = [
        f
        for f in all_files
        if f not in stats  # no manifest row -> keep (conservative)
        or all(
            c not in stats[f]  # no stats for the column -> keep (conservative)
            or (stats[f][c][0] <= hi and lo <= stats[f][c][1])
            for c, (lo, hi) in ranges.items()
        )
    ]
    if not keep:
        # empty selection: preserve schema by reading the full dataset's
        # metadata with an always-false filter
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        return df.filter(F.lit(False))
    return spark.read.parquet(*keep)
