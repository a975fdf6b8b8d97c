"""Explicit StructTypes for every table the engine touches.

The reference fixes its record shapes with Scala case classes
(reference: BeanObj.scala:17-147); here they are explicit StructTypes so
no schema is ever inferred in production paths.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Raw DNS event, as it appears in the JSON log lines consumed by the
# ingest stage (reference: DnsRptCH.scala:861-979 field extraction).
# ---------------------------------------------------------------------------
RAW_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("Timestamp", T.LongType()),  # epoch seconds
        T.StructField("ServerIP", T.StringType()),  # resolving DNS server
        T.StructField("ClientIP", T.StringType()),
        T.StructField("Domain", T.StringType()),
        T.StructField("Type", T.StringType()),  # request type: A/AAAA/NS/...
        T.StructField("ResponseCode", T.IntegerType()),  # DNS RCODE
        T.StructField("QR", T.BooleanType()),  # true = response
        T.StructField(
            "Answers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("Type", T.StringType()),
                        T.StructField("Value", T.StringType()),
                    ]
                )
            ),
        ),
        # PERMISSIVE-mode capture of malformed lines (dropped downstream;
        # reference logs-and-drops at DnsRptCH.scala:866-873).
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# The enriched base event — the DnsBean equivalent
# (reference: BeanObj.scala:17-21 + derivations in DnsRptCH.scala:861-979).
# ---------------------------------------------------------------------------
BASE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("clientName", T.IntegerType()),  # dim id; default 5
        T.StructField("clientIp", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("requestType", T.StringType()),
        T.StructField("responseCode", T.IntegerType()),
        T.StructField("responseType", T.StringType()),  # last answer's Type
        T.StructField("dnsIp", T.StringType()),  # ServerIP
        T.StructField("aip", T.StringType()),  # sampled A answer; "0.0.0.0" none
        T.StructField("error", T.LongType()),  # 1 iff failed resolution
        T.StructField("resolver", T.LongType()),  # constant 1 == row count
        T.StructField("operator", T.StringType()),  # ISP from geo lookup
        T.StructField("province", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("city", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Dimension tables (reference: DnsRptCH.scala:796-855 loaders).
# ---------------------------------------------------------------------------
CLIENT_RULE_SCHEMA = T.StructType(
    [
        T.StructField("min_long_ip", T.LongType()),
        T.StructField("max_long_ip", T.LongType()),
        T.StructField("client_type_id", T.IntegerType()),
    ]
)

IP_SEGMENT_SCHEMA = T.StructType(  # business resource ranges
    [
        T.StructField("min_long_ip", T.LongType()),
        T.StructField("max_long_ip", T.LongType()),
        T.StructField("resource_name", T.StringType()),
        T.StructField("resource_type", T.StringType()),
        T.StructField("resource_props", T.StringType()),
        T.StructField("rule_idx", T.IntegerType()),  # load order; last match wins
    ]
)

MEDIA_RULE_SCHEMA = T.StructType(  # intranet ("inNet") ranges
    [
        T.StructField("min_long_ip", T.LongType()),
        T.StructField("max_long_ip", T.LongType()),
    ]
)

AUTH_DOMAIN_SCHEMA = T.StructType(  # Redis dns:dns-authDomain metadata
    [
        T.StructField("authorityDomain", T.StringType()),
        T.StructField("companyName", T.StringType()),
        T.StructField("soft", T.StringType()),
        T.StructField("websiteName", T.StringType()),
        T.StructField("websiteType", T.StringType()),
        T.StructField("rule_idx", T.IntegerType()),  # last match wins
    ]
)

GEO_SCHEMA = T.StructType(  # qqzeng-ip interval table equivalent
    [
        T.StructField("min_long_ip", T.LongType()),
        T.StructField("max_long_ip", T.LongType()),
        T.StructField("country", T.StringType()),
        T.StructField("province", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("operator", T.StringType()),
    ]
)

WHITELIST_SCHEMA = T.StructType([T.StructField("domain", T.StringType())])

USER_SCHEMA = T.StructType(  # Redis ONLINEUSERS:USER_OBJECT
    [
        T.StructField("clientIp", T.StringType()),
        T.StructField("userName", T.StringType()),
    ]
)

USER_INFO_SCHEMA = T.StructType(  # Redis broadband:userinfo
    [
        T.StructField("userName", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("address", T.StringType()),
    ]
)

DOMAIN_TAG_SCHEMA = T.StructType(  # Redis key-cache-liveness-domain-label
    [
        T.StructField("domain", T.StringType()),
        T.StructField("tag1", T.StringType()),
        T.StructField("tag2", T.StringType()),
        T.StructField("tag3", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Multimodal asset table (engine extension; binary payload + typed meta).
# ---------------------------------------------------------------------------
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
