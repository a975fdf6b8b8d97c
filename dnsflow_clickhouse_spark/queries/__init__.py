from dnsflow_clickhouse_spark.queries.catalog import QUERY_REGISTRY

__all__ = ["QUERY_REGISTRY"]
