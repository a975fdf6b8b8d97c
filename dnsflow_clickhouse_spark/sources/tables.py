"""Loaders for the driver's parquet testdata (TESTDATA.md).

``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark reads
only via ``spark.sql.legacy.parquet.nanosAsLong`` (set in session.py);
we convert nanos -> microsecond timestamps here (truncating division —
identical to how DuckDB's reader truncates ns to its µs timestamps, so
oracle comparisons agree).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.schemas import TESTDATA_TABLES

# Schema memo for repeated parquet loads: (path, mtime, reader confs)
# -> StructType. This is METADATA caching only — the role a metastore
# or Iceberg manifest plays in production — never results: the scan is
# rebuilt per call and re-reads the parquet bytes on every action.
# Measured: per-call footer schema inference costs ~0.1s of driver
# time at sf0.1, and a full bench issues hundreds of load_table calls
# (~500 across 210 queries x 2 passes), so inference was a double-digit
# share of the catalog wall. Keys include the file/dir mtime (a
# rebuilt corpus re-infers — parquet writers create new part files, so
# the directory mtime moves) and the two reader confs that change what
# inference returns (TIMESTAMP(NANOS)-as-long, NTZ inference), so a
# vanilla harness session and our tuned session never share an entry.
#
# FLAT-LAYOUT ASSUMPTION (r13 ADVICE): the mtime key is the stat of
# ``path`` itself, which moves when a file is rewritten or when entries
# are added/removed in a directory — but NOT when a part file is
# rewritten in place inside a nested partition subdirectory. The
# testdata layout this loader serves is single flat parquet files
# (TESTDATA.md); pointing load_table at a Hive-partitioned dataset
# would need a directory-listing fingerprint in the key instead. The
# cache is bounded in practice by (n_tables x n_SFs x conf variants);
# it never holds data, only StructType objects.
_SCHEMA_CACHE: dict[tuple, object] = {}


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    try:
        key = (
            path,
            os.stat(path).st_mtime_ns,
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false"),
            spark.conf.get(
                "spark.sql.parquet.inferTimestampNTZ.enabled", "true"
            ),
        )
    except OSError:
        # missing path: let the reader raise its own (clearer) error
        return spark.read.parquet(path)
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = _read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) testdata read via nanosAsLong
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    # Naive parquet timestamps inferred as NTZ (a session built without
    # our inferTimestampNTZ=false conf — e.g. the correctness driver's):
    # cast to LTZ, an identity on wall clock under a UTC session
    # timezone, so epoch math (unix_micros/unix_timestamp) type-checks.
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all testdata tables and register them as temp views."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
