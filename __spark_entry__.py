"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual catalog lives in ``dnsflow_clickhouse_spark.queries.catalog``;
this file is just the thin adapter the driver imports.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

from dnsflow_clickhouse_spark.queries import QUERY_REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _tune(spark: SparkSession) -> None:
    """Runtime-settable confs the catalog depends on, applied to whatever
    session the driver hands us: nanos testdata readability, naive
    parquet timestamps as LTZ (not NTZ — epoch math needs it), and a UTC
    session timezone so the LTZ wall clock equals DuckDB's naive reading."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _tune(spark)
    fn, _ = QUERY_REGISTRY["q1_pricing_summary"]
    return fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _tune(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, (fn, _) in QUERY_REGISTRY.items()}


# Explicit rows-only waivers (the weaker check is a DECISION, asserted
# by tests/test_oracle_types.py): the round-10 production-width
# instances run the documented 100 TB knob settings — raw xxhash64 gram
# hashes, 16-plane GEMM signatures — which no DuckDB oracle can replay;
# each returns a one-row SELF-CONSISTENCY report (banding losslessness
# vs exact scan, recall vs exact truth) whose floors tests/test_wide.py
# pins.
ROWS_ONLY_WAIVERS = (
    "simhash_wide_neardups",
    "embedding_ann_wide_recall",
    "minhash_wide_recall",
    "ivfpq_wide_recall",
)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for
    non-SQL-expressible ops, which get a rows-only check)."""
    return {name: sql for name, (_, sql) in QUERY_REGISTRY.items() if sql is not None}
