"""Dimension-table loaders.

The reference collects every dimension to the driver and captures it in
closures (reference: DnsRptCH.scala:796-855, 146-200); here dimensions
are ordinary DataFrames (from parquet fixtures, python rows, or JDBC)
that downstream operators broadcast-join. Fixture injection for tests is
therefore trivial: pass any DataFrame with the right schema.

External-system connectivity (MySQL via JDBC, reference Utils.scala:105-117;
ClickHouse JDBC, ClickUtils.scala:22-33) is kept behind ``read_jdbc`` /
``write_jdbc`` — same Spark API, driver jars not bundled in this repo.
Redis-backed dims (reference: JedisPool.scala, DnsRptCH.scala:146-350) are
modeled as "small python collections fetched driver-side" -> ``dim_from_rows``;
the Redis client itself is out of scope of the engine and injected by the
caller (import-gated).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def dim_from_rows(spark: SparkSession, rows: Iterable[tuple], schema: T.StructType) -> DataFrame:
    """Small driver-side collection -> DataFrame (for broadcast joins)."""
    return spark.createDataFrame(list(rows), schema=schema)


def read_parquet_dim(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC dimension read (reference: Utils.scala:105-117 ReadMysql)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    batchsize: int = 100_000,
    num_partitions: int = 1,
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC append sink with the reference's batching defaults
    (reference: ClickUtils.scala:22-33 — batchsize 100000, single writer
    partition, no transaction isolation)."""
    writer = (
        df.coalesce(num_partitions)
        .write.format("jdbc")
        .mode("append")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", "NONE")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
