from dnsflow_clickhouse_spark.operators.range_join import range_join
from dnsflow_clickhouse_spark.operators.topk import global_topk, grouped_topk

__all__ = ["range_join", "global_topk", "grouped_topk"]
