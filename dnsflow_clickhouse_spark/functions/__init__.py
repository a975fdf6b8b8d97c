from dnsflow_clickhouse_spark.functions.net import (
    ip_to_long,
    long_to_ip,
    first_octet,
)
from dnsflow_clickhouse_spark.functions.domains import (
    AUTHORITY_PATTERN,
    authority_domain,
    strip_scheme,
    is_junk_domain,
)
from dnsflow_clickhouse_spark.functions.textfn import (
    poly_hash,
    token_count,
    stopword_ratio,
    non_alnum_ratio,
)

__all__ = [
    "ip_to_long",
    "long_to_ip",
    "first_octet",
    "AUTHORITY_PATTERN",
    "authority_domain",
    "strip_scheme",
    "is_junk_domain",
    "poly_hash",
    "token_count",
    "stopword_ratio",
    "non_alnum_ratio",
]
