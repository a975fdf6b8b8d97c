"""dnsflow_clickhouse_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference system
``wangcheng-1997/dnsflow-clickhouse`` (a Spark-2.2 RDD application that
enriches DNS resolution logs and fans out ~16 aggregation reports to
ClickHouse), re-expressed as idiomatic Spark DataFrame / SQL plans so
Catalyst + Tungsten + AQE pick the physical strategy.

Layout (see SURVEY.md §7):

- ``session``    — tuned SparkSession builder
- ``schemas``    — explicit StructTypes for the raw event + report tables
- ``functions``  — scalar column expressions (ip<->long, authority domain,
  text stats, poly-hash) — all JVM-side, no Python UDFs in the hot path
- ``sources``    — event parsing (JSON lines), dimension loaders, testdata
- ``operators``  — range joins, top-K, enrichment, reports, dedup,
  similarity search, text analysis, multimodal plumbing
- ``plans``      — plan inspection helpers (pushdown / broadcast asserts)
- ``streaming``  — 5-minute tumbling micro-batch pipeline + backfill
"""

from dnsflow_clickhouse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
