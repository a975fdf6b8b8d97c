"""Aggregated query registry: {name: (spark_callable, oracle_sql|None)}."""

from dnsflow_clickhouse_spark.queries.catalog import QUERY_REGISTRY as _BASE
from dnsflow_clickhouse_spark.queries.catalog_dns2 import DNS2_REGISTRY as _DNS2
from dnsflow_clickhouse_spark.queries.catalog_dns3 import DNS3_REGISTRY as _DNS3
from dnsflow_clickhouse_spark.queries.catalog_dns4 import DNS4_REGISTRY as _DNS4
from dnsflow_clickhouse_spark.queries.catalog_dns5 import DNS5_REGISTRY as _DNS5
from dnsflow_clickhouse_spark.queries.catalog_corpus import CORPUS_REGISTRY as _CORPUS
from dnsflow_clickhouse_spark.queries.catalog_profiling import (
    PROFILING_REGISTRY as _PROFILING,
)
from dnsflow_clickhouse_spark.queries.catalog_mlops import MLOPS_REGISTRY as _MLOPS
from dnsflow_clickhouse_spark.queries.catalog_tpch2 import TPCH2_REGISTRY as _TPCH2
from dnsflow_clickhouse_spark.queries.catalog_tpch3 import TPCH3_REGISTRY as _TPCH3
from dnsflow_clickhouse_spark.queries.catalog_tpch4 import TPCH4_REGISTRY as _TPCH4

QUERY_REGISTRY = {
    **_BASE, **_DNS2, **_DNS3, **_DNS4, **_DNS5, **_TPCH2, **_TPCH3, **_TPCH4,
    **_MLOPS, **_CORPUS, **_PROFILING,
}

__all__ = ["QUERY_REGISTRY"]
