"""Second batch of reference-semantics queries over the events table:
grouping-set sentinel rollups, pivoted ratio tables, the A6->A7
rollup-of-topK chain, frame windows, set operations, IP scalar
functions, and the A12-style wide conditional enrichment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.net import first_octet, ip_to_long, long_to_ip
from dnsflow_clickhouse_spark.operators.topk import grouped_topk
from dnsflow_clickhouse_spark.sources.tables import load_table

_SQL_CENTS = "CAST(round({c} * 100) AS BIGINT)"


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- grouping-set sentinel rollup (the reference's clientName=0 "all
#     clients" pattern, DnsRptCH.scala:453-532; sentinel -1 here because
#     user_id 0 exists in the data) ---


def clients_rollup_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return (
        ev.groupingSets([["user_id", "event_type"], ["event_type"]], "user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("val_cents"),
        )
        .withColumn("user_id", F.coalesce(F.col("user_id"), F.lit(-1)))
        .select(
            "user_id",
            "event_type",
            "cnt",
            F.round(F.col("val_cents") / 100.0, 2).alias("value_sum"),
        )
        .orderBy("user_id", "event_type")
    )


_ROLLUP_SETS_SQL = f"""
SELECT coalesce(user_id, -1) AS user_id, event_type,
       count(*) AS cnt,
       round(sum({_SQL_CENTS.format(c='value')}) / 100.0, 2) AS value_sum
FROM events
GROUP BY GROUPING SETS ((user_id, event_type), (event_type))
ORDER BY 1, 2
"""


# --- pivoted ratio table (the dns_flow_ratio table shape) ---

_ETYPES = ["click", "error", "purchase", "signup", "view"]


def day_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", _ETYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _ETYPES)
        .orderBy("day")
    )


_PIVOT_SQL = f"""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       {', '.join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}" for t in _ETYPES)}
FROM events GROUP BY 1 ORDER BY 1
"""


# --- A6 -> A7: rollup OF the top-K output (order of operations is the
#     semantic: top-20 first, then authority rollup, then top-3;
#     DnsRptCH.scala:646-667) ---


def topk_rollup_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    per_user = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    top20 = grouped_topk(per_user, ["event_type"], [F.desc("cnt"), F.asc("user_id")], 20)
    rolled = (
        top20.withColumn("bucket", (F.col("user_id") % 5).cast("long"))
        .groupBy("event_type", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return grouped_topk(
        rolled, ["event_type"], [F.desc("cnt"), F.asc("bucket")], 3, rank_col="rnk"
    ).select("event_type", "bucket", "cnt", F.col("rnk").cast("long").alias("rnk"))


_TOPK_CHAIN_SQL = """
WITH per_user AS (
  SELECT event_type, user_id, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
top20 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, user_id) AS rn
    FROM per_user
  ) WHERE rn <= 20
),
rolled AS (
  SELECT event_type, user_id % 5 AS bucket, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM top20 GROUP BY 1, 2
)
SELECT event_type, bucket, cnt, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, bucket) AS rnk
  FROM rolled
) WHERE rnk <= 3
"""


# --- frame window: per-user running value (beyond the reference's
#     ranking-only windows — completes the window-function surface) ---


def running_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        ev.filter(F.col("user_id") < 20)
        .select(
            "user_id",
            "event_id",
            F.round(F.sum(cents).over(w) / 100.0, 2).alias("running_value"),
            F.lag("event_id", 1).over(Window.partitionBy("user_id").orderBy("event_id")).alias("prev_event_id"),
        )
        .orderBy("user_id", "event_id")
    )


_RUNNING_SQL = f"""
SELECT user_id, event_id,
       round(sum({_SQL_CENTS.format(c='value')}) OVER (
         PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 2) AS running_value,
       lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_event_id
FROM events WHERE user_id < 20
ORDER BY user_id, event_id
"""


# --- set operations (SURVEY §2.8: UNION ALL + DISTINCT + EXCEPT) ---


def set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, event_type) pairs active in the first 10 days but not the
    last 10 days of the month — dropDuplicates + subtract (EXCEPT)."""
    ev = _ev(spark, sf_dir)
    early = (
        ev.filter(F.dayofmonth("ts") <= 10).select("user_id", "event_type").dropDuplicates()
    )
    late = (
        ev.filter(F.dayofmonth("ts") > 20).select("user_id", "event_type").dropDuplicates()
    )
    return early.subtract(late).orderBy("user_id", "event_type")


_SET_OPS_SQL = """
SELECT DISTINCT user_id, event_type FROM events WHERE day(ts) <= 10
EXCEPT
SELECT DISTINCT user_id, event_type FROM events WHERE day(ts) > 20
ORDER BY user_id, event_type
"""


# --- IP scalar functions (§2.9): synthesize dotted-quads, roundtrip,
#     aggregate by first octet ---


def ip_function_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    ip = F.concat_ws(
        ".",
        (F.col("event_id") % 223 + 1).cast("string"),
        ((F.col("event_id") * 37) % 256).cast("string"),
        ((F.col("event_id") * 53) % 256).cast("string"),
        ((F.col("event_id") * 71) % 256).cast("string"),
    )
    df = ev.select(
        ip.alias("ip"),
    ).select(
        "ip",
        ip_to_long("ip").alias("ip_long"),
        first_octet("ip").alias("octet"),
    ).withColumn("roundtrip_ok", (long_to_ip(F.col("ip_long")) == F.col("ip")).cast("int"))
    return (
        df.groupBy("octet")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("ip_long").alias("sum_long"),
            F.sum("roundtrip_ok").alias("n_roundtrip_ok"),
        )
        .orderBy("octet")
    )


_IP_FN_SQL = """
WITH ips AS (
  SELECT CAST(event_id % 223 + 1 AS VARCHAR) || '.' ||
         CAST((event_id * 37) % 256 AS VARCHAR) || '.' ||
         CAST((event_id * 53) % 256 AS VARCHAR) || '.' ||
         CAST((event_id * 71) % 256 AS VARCHAR) AS ip,
         (event_id % 223 + 1) * 16777216 + ((event_id * 37) % 256) * 65536
           + ((event_id * 53) % 256) * 256 + ((event_id * 71) % 256) AS ip_long,
         CAST(event_id % 223 + 1 AS INT) AS octet
  FROM events
)
SELECT octet, count(*) AS cnt, CAST(sum(ip_long) AS BIGINT) AS sum_long,
       CAST(count(*) AS BIGINT) AS n_roundtrip_ok
FROM ips GROUP BY octet ORDER BY octet
"""


# --- A12-style wide conditional enrichment (geo counters + concat with
#     city==province dedup, DnsRptCH.scala:207-294) ---


def wide_enrichment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    country = (
        F.when(F.col("user_id") % 4 == 1, "美国")
        .when(F.col("user_id") % 4 == 3, "德国")
        .otherwise("中国")
    )
    operator = (
        F.when(k % 3 == 0, "电信").when(k % 3 == 1, "联通").otherwise("移动")
    )
    province = F.when(k % 2 == 0, "上海").otherwise("浙江")
    city = F.when(k % 2 == 0, "上海").otherwise("杭州")
    df = ev.select(
        F.col("event_type"),
        country.alias("country"),
        operator.alias("operator"),
        province.alias("province"),
        city.alias("city"),
    ).select(
        "event_type",
        F.when(F.col("country") != "中国", 1).otherwise(0).cast("long").alias("abroad"),
        F.when(F.col("operator") == "电信", 1).otherwise(0).cast("long").alias("telecom"),
        F.when(F.col("operator") == "联通", 1).otherwise(0).cast("long").alias("link"),
        F.concat(
            F.col("country"),
            F.col("province"),
            F.when(F.col("city") == F.col("province"), F.lit("")).otherwise(F.col("city")),
            F.col("operator"),
        ).alias("addr"),
    )
    return (
        df.groupBy("event_type", "addr")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("abroad").alias("abroadNum"),
            F.sum("telecom").alias("telecomNum"),
            F.sum("link").alias("linkNum"),
        )
        .orderBy("event_type", "addr")
    )


_WIDE_ENRICH_SQL = """
WITH e AS (
  SELECT event_type,
         CASE WHEN user_id % 4 = 1 THEN '美国' WHEN user_id % 4 = 3 THEN '德国' ELSE '中国' END AS country,
         CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) % 3 = 0 THEN '电信'
              WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) % 3 = 1 THEN '联通'
              ELSE '移动' END AS operator,
         CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) % 2 = 0 THEN '上海' ELSE '浙江' END AS province,
         CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) % 2 = 0 THEN '上海' ELSE '杭州' END AS city
  FROM events
)
SELECT event_type,
       country || province || (CASE WHEN city = province THEN '' ELSE city END) || operator AS addr,
       count(*) AS cnt,
       CAST(sum(CASE WHEN country != '中国' THEN 1 ELSE 0 END) AS BIGINT) AS abroadNum,
       CAST(sum(CASE WHEN operator = '电信' THEN 1 ELSE 0 END) AS BIGINT) AS telecomNum,
       CAST(sum(CASE WHEN operator = '联通' THEN 1 ELSE 0 END) AS BIGINT) AS linkNum
FROM e GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- CIDR membership rollup (isInRange, ref IpUtil.java:13-25; the
#     commented serverIP gate DnsRptCH.scala:889) ---

_CIDRS = ["55.0.0.0/8", "120.64.0.0/10", "200.200.0.0/16", "7.32.0.0/11"]


def cidr_membership_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-CIDR member count + sum over synthesized event IPs.

    Exercises ``is_in_range`` (pure shift/mask expressions) against an
    oracle that uses independently precomputed [lo, hi] literal bounds —
    the two agree only if the mask arithmetic is right.
    """
    from dnsflow_clickhouse_spark.functions.net import is_in_range

    ev = _ev(spark, sf_dir)
    ip = F.concat_ws(
        ".",
        (F.col("event_id") % 223 + 1).cast("string"),
        ((F.col("event_id") * 37) % 256).cast("string"),
        ((F.col("event_id") * 53) % 256).cast("string"),
        ((F.col("event_id") * 71) % 256).cast("string"),
    )
    df = (
        ev.select(ip.alias("ip"))
        .select("ip", ip_to_long("ip").alias("ip_long"))
        .select(
            "ip",
            "ip_long",
            F.explode(F.array(*[F.lit(c) for c in _CIDRS])).alias("cidr"),
        )
        .filter(is_in_range("ip", "cidr"))
    )
    return (
        df.groupBy("cidr")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("ip_long").alias("sum_in"),
        )
        .orderBy("cidr")
    )


_CIDR_SQL = """
WITH ips AS (
  SELECT CAST(event_id % 223 + 1 AS VARCHAR) || '.' ||
         CAST((event_id * 37) % 256 AS VARCHAR) || '.' ||
         CAST((event_id * 53) % 256 AS VARCHAR) || '.' ||
         CAST((event_id * 71) % 256 AS VARCHAR) AS ip,
         (event_id % 223 + 1) * 16777216 + ((event_id * 37) % 256) * 65536
           + ((event_id * 53) % 256) * 256 + ((event_id * 71) % 256) AS ip_long
  FROM events
), c(cidr, lo, hi) AS (
  VALUES ('55.0.0.0/8',    922746880,  939524095),
         ('120.64.0.0/10', 2017460224, 2021654527),
         ('200.200.0.0/16', 3368550400, 3368615935),
         ('7.32.0.0/11',   119537664,  121634815)
)
SELECT cidr, count(*) AS cnt, CAST(sum(ip_long) AS BIGINT) AS sum_in
FROM ips JOIN c ON ip_long BETWEEN lo AND hi
GROUP BY cidr ORDER BY cidr
"""


DNS2_REGISTRY = {
    "clients_rollup_sets": (clients_rollup_sets, _ROLLUP_SETS_SQL),
    "day_pivot_counts": (day_pivot_counts, _PIVOT_SQL),
    "topk_rollup_chain": (topk_rollup_chain, _TOPK_CHAIN_SQL),
    "running_value_per_user": (running_value_per_user, _RUNNING_SQL),
    "set_ops_users": (set_ops_users, _SET_OPS_SQL),
    "ip_function_rollup": (ip_function_rollup, _IP_FN_SQL),
    "wide_enrichment_report": (wide_enrichment_report, _WIDE_ENRICH_SQL),
    "cidr_membership_rollup": (cidr_membership_rollup, _CIDR_SQL),
}
