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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
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
