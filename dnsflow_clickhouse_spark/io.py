"""Sinks. The reference appends every report to ClickHouse via JDBC
(ClickUtils.scala:22-33) and writes user middle data as \\x01-delimited
text to HDFS (DnsRptCH.scala:110-140 / K2). The rebuild's default sink
is parquet tables with identical schemas; the JDBC writer is kept in
sources.dims.write_jdbc as an optional backend.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_report(df: DataFrame, base_dir: str, table: str, mode: str = "append") -> None:
    """Append-only report sink, one directory per report table."""
    df.write.mode(mode).parquet(os.path.join(base_dir, table))


def write_middle_data(df: DataFrame, path: str, partitions: int = 12) -> None:
    """K2: \\x01-delimited text, coalesced to a fixed file count
    (reference: coalesce(12), DnsRptCH.scala:138)."""
    df.coalesce(partitions).write.mode("overwrite").option("sep", "\x01").csv(path)
