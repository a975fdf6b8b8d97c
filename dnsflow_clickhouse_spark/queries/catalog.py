"""Query catalog: every operator from SURVEY.md §2 (plus the
training-data-pipeline extensions) as a (PySpark callable, DuckDB oracle
SQL) pair over the driver testdata tables.

Determinism rules (so order-insensitive value hashes match across
engines):

- **Money doubles** are exact 2-decimal (4-decimal for rates) values, so
  they are scaled to integers per row (``round(x*100)``), aggregated in
  exact integer/decimal arithmetic, and divided back once at the end —
  bit-identical in Spark and DuckDB regardless of summation order.
- **Timestamps** never leave as raw timestamps: they are bucketed to
  epoch-second bigints or formatted date strings (testdata ``events.ts``
  is ns-precision, which the two engines truncate identically to µs).
- **Ranks/limits** always carry an explicit total tie-break order.
- Every computed column is aliased identically in both engines.

Each callable takes ``(spark, sf_dir)`` and returns a DataFrame; it must
remain a single declarative plan (no driver-side loops) so Catalyst can
optimize end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.numeric import portable_round

from dnsflow_clickhouse_spark.functions.domains import (
    AUTHORITY_PATTERN,
    authority_domain,
)
from dnsflow_clickhouse_spark.functions.textfn import (
    STOPWORDS_EN,
    non_alnum_ratio,
    stopword_ratio,
    token_count,
)
from dnsflow_clickhouse_spark.operators.range_join import range_join
from dnsflow_clickhouse_spark.operators.topk import global_topk, grouped_topk
from dnsflow_clickhouse_spark.schemas import T
from dnsflow_clickhouse_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _cents(c) -> F.Column:
    """Exact integer cents from a 2-decimal money double."""
    return F.round((F.col(c) if isinstance(c, str) else c) * 100, 0).cast("long")


def _bp(c) -> F.Column:
    """Exact integer basis points from a 4-decimal rate double."""
    return F.round((F.col(c) if isinstance(c, str) else c) * 10000, 0).cast("long")


_SQL_CENTS = "CAST(round({c} * 100) AS BIGINT)"
_SQL_BP = "CAST(round({c} * 10000) AS BIGINT)"


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# epoch seconds of a ts (both engines truncate identically for t >= 0)
_EPOCH = F.unix_timestamp  # spark side
_SQL_EPOCH = "CAST(floor(epoch({c})) AS BIGINT)"

def _err() -> "F.Column":
    return F.when(F.col("event_type") == "error", 1).otherwise(0).cast("long")


# ---------------------------------------------------------------------------
# TPC-H-style relational core (scan / filter / join / agg / top-k at scale)
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide aggregation with exact-money sums.

    Exercises: parquet scan w/ predicate pushdown, hash aggregate with
    partial (map-side) combine, decimal-exact summation.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_e6 = _cents("l_extendedprice") * (F.lit(10000) - _bp("l_discount"))
    charge_e10 = (disc_e6 * (F.lit(10000) + _bp("l_tax"))).cast("decimal(38,0)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(_cents("l_quantity")) / 100.0).alias("sum_qty"),
            (F.sum(_cents("l_extendedprice")) / 100.0).alias("sum_base_price"),
            portable_round(F.sum(disc_e6) / 1e6, 2).alias("sum_disc_price"),
            portable_round((F.sum(charge_e10).cast("double")) / 1e10, 2).alias("sum_charge"),
            portable_round(F.sum(_cents("l_quantity")) / 100.0 / F.count(F.lit(1)), 6).alias("avg_qty"),
            portable_round(F.sum(_cents("l_extendedprice")) / 100.0 / F.count(F.lit(1)), 6).alias("avg_price"),
            portable_round(F.sum(_bp("l_discount")) / 10000.0 / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  sum({_SQL_CENTS.format(c='l_quantity')}) / 100.0 AS sum_qty,
  sum({_SQL_CENTS.format(c='l_extendedprice')}) / 100.0 AS sum_base_price,
  floor(sum({_SQL_CENTS.format(c='l_extendedprice')} * (10000 - {_SQL_BP.format(c='l_discount')})) / 1e6 * 100 + 0.5) / 100 AS sum_disc_price,
  floor(CAST(sum({_SQL_CENTS.format(c='l_extendedprice')} * (10000 - {_SQL_BP.format(c='l_discount')}) * (10000 + {_SQL_BP.format(c='l_tax')})) AS DOUBLE) / 1e10 * 100 + 0.5) / 100 AS sum_charge,
  floor(sum({_SQL_CENTS.format(c='l_quantity')}) / 100.0 / count(*) * 1000000 + 0.5) / 1000000 AS avg_qty,
  floor(sum({_SQL_CENTS.format(c='l_extendedprice')}) / 100.0 / count(*) * 1000000 + 0.5) / 1000000 AS avg_price,
  floor(sum({_SQL_BP.format(c='l_discount')}) / 10000.0 / count(*) * 1000000 + 0.5) / 1000000 AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic global top-10.

    The small dims (customer) broadcast; the orderBy().limit() compiles
    to TakeOrderedAndProject (per-partition heaps, no global sort).
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01")
    )
    rev_e6 = _cents("l_extendedprice") * (F.lit(10000) - _bp("l_discount"))
    agg = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev_e6).alias("__rev_e6"))
    )
    return global_topk(
        agg, [F.desc("__rev_e6"), F.asc("l_orderkey")], 10
    ).select(
        "l_orderkey",
        portable_round(F.col("__rev_e6") / 1e6, 2).alias("revenue"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
    )


_Q3_SQL = f"""
SELECT
  l_orderkey,
  floor(sum({_SQL_CENTS.format(c='l_extendedprice')} * (10000 - {_SQL_BP.format(c='l_discount')})) / 1e6 * 100 + 0.5) / 100 AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
  o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY sum({_SQL_CENTS.format(c='l_extendedprice')} * (10000 - {_SQL_BP.format(c='l_discount')})) DESC, l_orderkey
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join rolled up by nation.

    region/nation/customer broadcast; only lineitem⋈orders shuffles.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    rev_e6 = _cents("l_extendedprice") * (F.lit(10000) - _bp("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(portable_round(F.sum(rev_e6) / 1e6, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_Q5_SQL = f"""
SELECT n_name,
       floor(sum({_SQL_CENTS.format(c='l_extendedprice')} * (10000 - {_SQL_BP.format(c='l_discount')})) / 1e6 * 100 + 0.5) / 100 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# DNS-reference report analogues over the `events` stream table.
# events(event_id, ts, user_id, event_type, value, props) maps onto the
# reference's DnsBean stream: user_id ~ clientName, event_type ~
# requestType, event_type='error' ~ error flag, value ~ money metric,
# props.k ~ responseCode source.
# ---------------------------------------------------------------------------


def qps_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 analogue (reference getDnsQps, DnsRptCH.scala:522-538): 5-min
    tumbling buckets with count, error count and avgNum=floor(n/300)."""
    ev = _ev(spark, sf_dir)
    bucket = (F.floor(_EPOCH(F.col("ts")) / 300) * 300).cast("long")
    return (
        ev.groupBy(bucket.alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(_err()).alias("errors"),
        )
        .withColumn("avg_qps", F.floor(F.col("cnt") / 300).cast("long"))
        .orderBy("bucket_start")
    )


_QPS_TREND_SQL = """
SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_start,
       count(*) AS cnt,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
       CAST(floor(count(*) / 300) AS BIGINT) AS avg_qps
FROM events
GROUP BY 1
ORDER BY 1
"""


def qps_per_client(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 analogue: per-client QPS (reference DnsRptCH.scala:541-552)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(_err()).alias("errors"))
        .withColumn("avg_qps", F.floor(F.col("cnt") / 300).cast("long"))
        .orderBy("user_id")
    )


_QPS_CLIENT_SQL = """
SELECT user_id,
       count(*) AS cnt,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
       CAST(floor(count(*) / 300) AS BIGINT) AS avg_qps
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def event_type_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 analogue (request-type ratio, DnsRptCH.scala:774-791): group
    share of total as an exact-integer-derived ratio."""
    ev = _ev(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    total = Window.partitionBy()
    return (
        agg.withColumn(
            "ratio", portable_round(F.col("cnt") / F.sum("cnt").over(total), 6)
        )
        .orderBy("event_type")
    )


_EVENT_TYPE_RATIO_SQL = """
SELECT event_type, count(*) AS cnt,
       floor(count(*) / (sum(count(*)) OVER ()) * 1000000 + 0.5) / 1000000 AS ratio
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def response_code_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 analogue (response-code ratio, DnsRptCH.scala:608-625); the
    "code" is derived from the JSON props payload — exercises JSON field
    extraction (reference parses fastjson per line)."""
    ev = _ev(spark, sf_dir)
    code = (F.get_json_object("props", "$.k").cast("int") % 6).alias("code")
    return (
        ev.groupBy(code)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("code")
    )


_RESPONSE_CODE_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 6 AS code,
       count(*) AS cnt
FROM events
GROUP BY 1
ORDER BY 1
"""


def grouped_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A9 analogue (top-N per responseCode, DnsRptCH.scala:633-653):
    grouped top-K via row_number window — replaces the reference's
    groupByKey + in-memory per-group sort."""
    ev = _ev(spark, sf_dir)
    agg = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    return grouped_topk(
        agg,
        ["event_type"],
        [F.desc("cnt"), F.asc("user_id")],
        5,
        rank_col="rnk",
    ).select("event_type", "user_id", "cnt", F.col("rnk").cast("long").alias("rnk"))


_GROUPED_TOPK_SQL = """
SELECT event_type, user_id, cnt, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT event_type, user_id, count(*) AS cnt,
         row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC, user_id) AS rnk
  FROM events
  GROUP BY event_type, user_id
)
WHERE rnk <= 5
"""


def flow_report_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 analogue (4-dim flow report, DnsRptCH.scala:558-602):
    multi-key agg → HAVING → deterministic global top-K
    (TakeOrderedAndProject), all cluster-side — no driver round-trip."""
    ev = _ev(spark, sf_dir)
    agg = (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.sum(F.lit(1)).alias("cnt"),
            F.sum(_cents("value")).alias("__val_cents"),
            F.sum(_err()).alias("errors"),
        )
        .filter(F.col("cnt") >= 5)
    )
    top = global_topk(
        agg, [F.desc("cnt"), F.asc("user_id"), F.asc("event_type")], 100
    )
    return top.select(
        "user_id",
        "event_type",
        "cnt",
        F.round(F.col("__val_cents") / 100.0, 2).alias("value_sum"),
        "errors",
    )


_FLOW_TOPK_SQL = f"""
SELECT user_id, event_type, cnt, round(val_cents / 100.0, 2) AS value_sum, errors
FROM (
  SELECT user_id, event_type,
         CAST(count(*) AS BIGINT) AS cnt,
         sum({_SQL_CENTS.format(c='value')}) AS val_cents,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
  FROM events
  GROUP BY user_id, event_type
  HAVING count(*) >= 5
  ORDER BY cnt DESC, user_id, event_type
  LIMIT 100
)
"""


def trend_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 analogue (trend rollup + HAVING, DnsRptCH.scala:46-57)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(_cents("value")) / 100.0, 2).alias("value_sum"),
            F.sum(_err()).alias("errors"),
        )
        .filter(F.col("cnt") > 2)
        .orderBy("day", "event_type")
    )


_TREND_ROLLUP_SQL = f"""
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       count(*) AS cnt,
       round(sum({_SQL_CENTS.format(c='value')}) / 100.0, 2) AS value_sum,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
FROM events
GROUP BY 1, 2
HAVING count(*) > 2
ORDER BY 1, 2
"""


# tier rules: deliberately overlapping (silver/gold) to pin first-match
# semantics, with a gap below 100 cents to pin the unmatched default —
# mirrors the reference's client-range lookup J1 (DnsRptCH.scala:928-930).
_TIERS = [
    (100, 4999, "bronze"),
    (5000, 14999, "silver"),
    (10000, 14999, "gold"),  # shadowed by silver under first-match
    (15000, 10_000_000, "platinum"),
]


def range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 analogue: broadcast interval join with first-match semantics
    and a default for unmatched probes (reference defaults clientName=5,
    BeanObj.scala:17). Rule overlaps are pre-flattened so the fact side
    joins exactly once and never shuffles."""
    ev = _ev(spark, sf_dir).withColumn("__v_cents", _cents("value"))
    rules = spark.createDataFrame(
        [
            {"min_long_ip": lo, "max_long_ip": hi, "tier": t, "rule_idx": i}
            for i, (lo, hi, t) in enumerate(_TIERS)
        ],
        schema=T.StructType(
            [
                T.StructField("min_long_ip", T.LongType()),
                T.StructField("max_long_ip", T.LongType()),
                T.StructField("tier", T.StringType()),
                T.StructField("rule_idx", T.IntegerType()),
            ]
        ),
    )
    joined = range_join(
        ev,
        rules,
        "__v_cents",
        match="first",
        order_col="rule_idx",
        payload_cols=["tier"],
        defaults={"tier": "none"},
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("__v_cents") / 100.0, 2).alias("value_sum"),
        )
        .orderBy("tier")
    )


# CASE-in-rule-order is exactly first-match-with-default semantics.
_RANGE_TIERS_SQL = f"""
WITH t AS (
  SELECT {_SQL_CENTS.format(c='value')} AS v,
         CASE
           WHEN {_SQL_CENTS.format(c='value')} BETWEEN 100 AND 4999 THEN 'bronze'
           WHEN {_SQL_CENTS.format(c='value')} BETWEEN 5000 AND 14999 THEN 'silver'
           WHEN {_SQL_CENTS.format(c='value')} BETWEEN 10000 AND 14999 THEN 'gold'
           WHEN {_SQL_CENTS.format(c='value')} BETWEEN 15000 AND 10000000 THEN 'platinum'
           ELSE 'none'
         END AS tier
  FROM events
)
SELECT tier, count(*) AS cnt, round(sum(v) / 100.0, 2) AS value_sum
FROM t GROUP BY tier ORDER BY tier
"""


def authority_domain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 analogue: roll a synthetic domain column up to its authority
    domain with the reference's last-match regex semantics
    (Utils.scala:62-77, Constant.scala:10-18)."""
    ev = _ev(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    suffix = (
        F.when(k % 5 == 0, "example.com")
        .when(k % 5 == 1, "foo.org.cn")
        .when(k % 5 == 2, "bar.net")
        .when(k % 5 == 3, "baz.co")
        .otherwise("qux.io")
    )
    domain = F.concat(
        F.lit("svc"), (F.col("user_id") % 7).cast("string"), F.lit("."), suffix
    )
    # two-phase: count by the raw domain first (distinct domains ≪
    # events — here 35 vs 1M, and at 100 TB still only the DNS
    # namespace), then run the expensive last-match regex on the compact
    # keys and re-aggregate. The regex evaluates once per domain, not
    # once per event.
    return (
        ev.select(domain.alias("__domain"))
        .groupBy("__domain")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(authority_domain(F.col("__domain")).alias("authority_domain"), "__cnt")
        .groupBy("authority_domain")
        .agg(F.sum("__cnt").alias("cnt"))
        .orderBy("authority_domain")
    )


_AUTH_ROLLUP_SQL = f"""
WITH d AS (
  SELECT 'svc' || CAST(user_id % 7 AS VARCHAR) || '.' ||
         CASE CAST(json_extract_string(props, '$.k') AS INTEGER) % 5
           WHEN 0 THEN 'example.com'
           WHEN 1 THEN 'foo.org.cn'
           WHEN 2 THEN 'bar.net'
           WHEN 3 THEN 'baz.co'
           ELSE 'qux.io'
         END AS domain
  FROM events
)
SELECT coalesce(regexp_extract_all(domain, '{AUTHORITY_PATTERN}')[-1], domain)
         AS authority_domain,
       count(*) AS cnt
FROM d
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Training-data pipeline operators over documents/embeddings
# ---------------------------------------------------------------------------


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per language (text-analysis extension): whitespace
    tokenization via built-in higher-order functions, no UDFs."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", token_count("text").cast("long").alias("toks"), "n_chars")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


_DOC_TOKEN_SQL = r"""
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication by content hash: canonical doc per md5(text)
    is the minimum doc_id; emits the full doc→canonical mapping."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("h")
    return (
        d.select(F.col("doc_id"), F.md5("text").alias("h"))
        .withColumn("keep_id", F.min("doc_id").over(w))
        .withColumn("is_dup", (F.col("doc_id") != F.col("keep_id")).cast("int"))
        .select("doc_id", "h", "keep_id", "is_dup")
        .orderBy("doc_id")
    )


_DEDUP_EXACT_SQL = """
SELECT doc_id, md5(text) AS h,
       min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
       CAST(doc_id != min(doc_id) OVER (PARTITION BY md5(text)) AS INTEGER) AS is_dup
FROM documents
ORDER BY doc_id
"""


def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring (text-analysis extension): length,
    punctuation and stopword components combined with fixed expression
    shape so the double arithmetic is engine-identical.

    Map-only: no repartition — scoring is embarrassingly parallel and a
    shuffle here would move every text payload once for nothing (file
    splits already spread the scan at scale)."""
    from dnsflow_clickhouse_spark.operators.text_analysis import score_documents

    d = load_table(spark, sf_dir, "documents")
    return (
        score_documents(d)
        .select("doc_id", "toks", "quality")
        .orderBy("doc_id")
    )


_SW_LIST = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
_DOC_QUALITY_SQL = rf"""
WITH t AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS toks,
       floor((
         0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 200.0)
         + 0.4 * (1.0 - (CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE) END))
         + 0.3 * (CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, t -> lower(t) IN ({_SW_LIST}))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE) END)
         ) * 1000000 + 0.5) / 1000000 AS quality
FROM t
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERY_REGISTRY: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "q1_pricing_summary": (q1_pricing_summary, _Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, _Q3_SQL),
    "q5_region_revenue": (q5_region_revenue, _Q5_SQL),
    "qps_trend": (qps_trend, _QPS_TREND_SQL),
    "qps_per_client": (qps_per_client, _QPS_CLIENT_SQL),
    "event_type_ratio": (event_type_ratio, _EVENT_TYPE_RATIO_SQL),
    "response_code_ratio": (response_code_ratio, _RESPONSE_CODE_SQL),
    "grouped_topk_users": (grouped_topk_users, _GROUPED_TOPK_SQL),
    "flow_report_topk": (flow_report_topk, _FLOW_TOPK_SQL),
    "trend_rollup_daily": (trend_rollup_daily, _TREND_ROLLUP_SQL),
    "range_join_tiers": (range_join_tiers, _RANGE_TIERS_SQL),
    "authority_domain_rollup": (authority_domain_rollup, _AUTH_ROLLUP_SQL),
    "doc_token_stats": (doc_token_stats, _DOC_TOKEN_SQL),
    "dedup_exact_docs": (dedup_exact_docs, _DEDUP_EXACT_SQL),
    "doc_quality_score": (doc_quality_score, _DOC_QUALITY_SQL),
}


# ---------------------------------------------------------------------------
# A14 analogue: per-user top report pipeline
# ---------------------------------------------------------------------------


def user_report_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 analogue (per-user top report, ref DnsRptCH.scala:355-412):
    client filter -> 3-dim agg -> HAVING -> global top-K1 -> user-name
    equi join (drop unmatched) -> global top-K2 by errors -> range
    membership flag -> broadcast info enrichment — the full user_report
    chain (operators/reports.py:user_report) over the testdata tables.
    The reference runs the second top-K and the enrichment on the
    driver (:396-406); here the whole chain is cluster-side with
    explicit total tie-breaks, both top-Ks lowering to
    TakeOrderedAndProject and both dim joins broadcast."""
    ev = _ev(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    kb = (F.get_json_object("props", "$.k").cast("long") % 10).alias("kb")
    agg = (
        ev.filter(F.col("user_id") % 2 == 1)
        .groupBy("user_id", "event_type", kb)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.when(F.col("value") < 1.0, 1).otherwise(0))
            .cast("long")
            .alias("errors"),
        )
        .filter(F.col("cnt") >= 3)
    )
    order1 = [F.desc("cnt"), F.asc("user_id"), F.asc("event_type"), F.asc("kb")]
    top1 = global_topk(agg, order1, 500)
    names = cust.select(
        F.col("c_custkey").alias("user_id"), F.col("c_name").alias("user_name")
    )
    named = top1.join(F.broadcast(names), "user_id")  # drop unmatched users
    order2 = [F.desc("errors"), F.asc("user_id"), F.asc("event_type"), F.asc("kb")]
    top2 = global_topk(named, order2, 100)
    in_net = (
        F.when(
            F.col("kb").between(2, 3) | F.col("kb").between(7, 8), F.col("cnt")
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    info = cust.select(
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acct_cents"),
    )
    return (
        top2.withColumn("in_net", in_net)
        .join(F.broadcast(info), "user_name", "left")
        .select(
            "user_id", "event_type", "kb", "cnt", "errors",
            "user_name", "in_net", "segment", "acct_cents",
        )
    )


_USER_REPORT_SQL = """
WITH f AS (
  SELECT user_id, event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS kb, value
  FROM events WHERE user_id % 2 = 1),
a AS (
  SELECT user_id, event_type, kb, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(CASE WHEN value < 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS errors
  FROM f GROUP BY user_id, event_type, kb HAVING count(*) >= 3),
t1 AS (SELECT * FROM a ORDER BY cnt DESC, user_id, event_type, kb LIMIT 500),
n AS (SELECT t1.*, c.c_name AS user_name
      FROM t1 JOIN customer c ON t1.user_id = c.c_custkey),
t2 AS (SELECT * FROM n ORDER BY errors DESC, user_id, event_type, kb LIMIT 100)
SELECT user_id, event_type, kb, cnt, errors, user_name,
       CASE WHEN kb BETWEEN 2 AND 3 OR kb BETWEEN 7 AND 8
            THEN cnt ELSE 0 END AS in_net,
       i.c_mktsegment AS segment,
       CAST(round(i.c_acctbal * 100) AS BIGINT) AS acct_cents
FROM t2 LEFT JOIN customer i ON t2.user_name = i.c_name
"""

QUERY_REGISTRY["user_report_pipeline"] = (user_report_pipeline, _USER_REPORT_SQL)
