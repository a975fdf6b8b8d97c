"""Fifth query batch: event-sequence operators (sessionization, as-of
join) and BPE-ish token counting — engine extensions with exact DuckDB
oracles (window-function SQL / correlated point-in-time subquery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.numeric import portable_round

from dnsflow_clickhouse_spark.functions.textfn import (
    BPE_SPLIT_PATTERN,
    bpe_token_count,
    token_count,
)
from dnsflow_clickhouse_spark.operators.sessions import asof_join, sessionize
from dnsflow_clickhouse_spark.queries.catalog import _cents
from dnsflow_clickhouse_spark.sources.tables import load_table

SESSION_GAP_S = 1800


def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) rolled up per user:
    one window shuffle assigns sessions, a two-level aggregate computes
    per-session then per-user stats."""
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", SESSION_GAP_S, tiebreak_cols=["event_id"])
    per_session = s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("span_us"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_ev").alias("n_events"),
            F.max("n_ev").alias("max_session_events"),
            portable_round(F.sum("span_us") / 1e6, 3).alias("active_seconds"),
        )
        .orderBy("user_id")
    )


_SESSION_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_S} * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), per_session AS (
  SELECT user_id, sid, count(*) AS n_ev,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
  FROM sessions GROUP BY user_id, sid
)
SELECT user_id, count(*) AS n_sessions, CAST(sum(n_ev) AS BIGINT) AS n_events,
       max(n_ev) AS max_session_events,
       floor(sum(span_us) / 1e6 * 1000 + 0.5) / 1000 AS active_seconds
FROM per_session GROUP BY user_id ORDER BY user_id
"""


def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase event picks the value of the
    user's latest strictly-prior click (the classic leakage-safe feature
    join). Spark side is the tagged-union window composition (one
    shuffle, no join node); the oracle is the equivalent correlated
    LIMIT-1 subquery."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id"),
        F.col("value").alias("c_value"),
    )
    joined = asof_join(
        purchases,
        clicks,
        key_col="user_id",
        left_ts="ts",
        right_ts="c_ts",
        value_cols=["c_value"],
        right_tiebreak="c_id",
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("asof_c_value").alias("n_with_prior_click"),
            (F.sum(_cents(F.coalesce(F.col("asof_c_value"), F.lit(0.0)))) / 100.0).alias(
                "prior_click_value"
            ),
        )
        .orderBy("user_id")
    )


_ASOF_SQL = """
WITH p AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click'),
j AS (
  SELECT p.user_id, p.event_id,
         (SELECT c.value FROM c
          WHERE c.user_id = p.user_id AND c.ts < p.ts
          ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click
  FROM p
)
SELECT user_id, count(*) AS n_purchases,
       count(last_click) AS n_with_prior_click,
       sum(CAST(round(coalesce(last_click, 0.0) * 100) AS BIGINT)) / 100.0 AS prior_click_value
FROM j GROUP BY user_id ORDER BY user_id
"""


def doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with the BPE-ish pretokenizer regex alongside
    whitespace tokens, per language (the subword/word ratio is a cheap
    quality signal for training corpora)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "lang",
            bpe_token_count("text").cast("long").alias("bpe"),
            token_count("text").cast("long").alias("ws"),
        )
        .groupBy("lang")
        .agg(
            F.sum("bpe").alias("bpe_tokens"),
            F.sum("ws").alias("ws_tokens"),
            portable_round(F.sum("bpe") / F.sum("ws"), 6).alias("subword_ratio"),
        )
        .orderBy("lang")
    )


_BPE_SQL_PATTERN = BPE_SPLIT_PATTERN.replace("'", "''")

_BPE_SQL = rf"""
WITH t AS (
  SELECT lang,
         len(list_filter(regexp_extract_all(text, '{_BPE_SQL_PATTERN}'),
                         x -> trim(x) != '')) AS bpe,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws
  FROM documents
)
SELECT lang, CAST(sum(bpe) AS BIGINT) AS bpe_tokens, CAST(sum(ws) AS BIGINT) AS ws_tokens,
       floor(sum(bpe) / sum(ws) * 1000000 + 0.5) / 1000000 AS subword_ratio
FROM t GROUP BY lang ORDER BY lang
"""


def multiset_ops_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): event-type
    multisets of the month's first vs second half, duplicates preserved.
    Catalyst plans both as aggregate+generate (per-key min-count replay),
    not a row-by-row anti join."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.dayofmonth("ts").alias("__d")
    )
    first_half = ev.filter(F.col("__d") <= 15).drop("__d")
    second_half = ev.filter(F.col("__d") > 15).drop("__d")
    both = first_half.intersectAll(second_half).groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    only_first = first_half.exceptAll(second_half).groupBy(
        "user_id", "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        both.join(only_first.withColumnRenamed("n", "n_first_only"),
                  ["user_id", "event_type"], "full_outer")
        .fillna(0, ["n_common", "n_first_only"])
        .orderBy("user_id", "event_type")
    )


_MULTISET_SQL = """
WITH fh AS (SELECT user_id, event_type FROM events WHERE day(ts) <= 15),
sh AS (SELECT user_id, event_type FROM events WHERE day(ts) > 15),
both_t AS (
  SELECT user_id, event_type, count(*) AS n_common
  FROM (SELECT * FROM fh INTERSECT ALL SELECT * FROM sh)
  GROUP BY user_id, event_type
),
first_only AS (
  SELECT user_id, event_type, count(*) AS n_first_only
  FROM (SELECT * FROM fh EXCEPT ALL SELECT * FROM sh)
  GROUP BY user_id, event_type
)
SELECT coalesce(b.user_id, f.user_id) AS user_id,
       coalesce(b.event_type, f.event_type) AS event_type,
       coalesce(b.n_common, 0) AS n_common,
       coalesce(f.n_first_only, 0) AS n_first_only
FROM both_t b FULL OUTER JOIN first_only f
  ON b.user_id = f.user_id AND b.event_type = f.event_type
ORDER BY user_id, event_type
"""


def unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt): per-day metric columns (events,
    errors, distinct users) rotate into (metric, value) rows — the
    inverse of the pivot query, planned as one Expand node (each input
    row emitted k times), no join or shuffle beyond the daily agg."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return daily.unpivot(
        "day", ["n_events", "n_errors", "n_users"], "metric", "value"
    ).orderBy("day", "metric")


_UNPIVOT_SQL = """
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         count(*) AS n_events,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
         count(DISTINCT user_id) AS n_users
  FROM events GROUP BY 1
)
SELECT day, metric, value FROM (
  SELECT day, 'n_events' AS metric, n_events AS value FROM daily
  UNION ALL SELECT day, 'n_errors', n_errors FROM daily
  UNION ALL SELECT day, 'n_users', n_users FROM daily
)
ORDER BY day, metric
"""


_STORM_MIN_ERRORS = 5


def storm_span_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join: per-(user, day) activity spans
    against hourly "error storm" windows (hours with >= 5 error events),
    counting affected users per storm hour. Both interval sets derive
    from aggregates; the overlap join buckets on the hour grid — see
    operators/range_join.py: interval_overlap_join for the dedup trick
    that keeps it distinct-free."""
    from dnsflow_clickhouse_spark.operators.range_join import interval_overlap_join

    ev = load_table(spark, sf_dir, "events").withColumn(
        "__ep", F.unix_timestamp("ts")
    )
    spans = ev.groupBy(
        F.col("user_id").alias("span_user"),
        F.date_format("ts", "yyyy-MM-dd").alias("span_day"),
    ).agg(F.min("__ep").alias("span_s"), F.max("__ep").alias("span_e"))
    storms = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(
            (F.floor(F.col("__ep") / 3600).cast("long") * 3600).alias("storm_s")
        )
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .filter(F.col("n_errors") >= _STORM_MIN_ERRORS)
        .withColumn("storm_e", F.col("storm_s") + 3599)
    )
    return (
        interval_overlap_join(
            spans, storms, ("span_s", "span_e"), ("storm_s", "storm_e"), 3600
        )
        .groupBy("storm_s", "n_errors")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.countDistinct("span_user").alias("n_users"),
        )
        .orderBy("storm_s")
    )


_STORM_SQL = """
WITH ep AS (SELECT user_id, event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) AS e,
                   strftime(ts, '%Y-%m-%d') AS day
            FROM events),
spans AS (SELECT user_id AS span_user, day AS span_day,
                 min(e) AS span_s, max(e) AS span_e
          FROM ep GROUP BY 1, 2),
storms AS (SELECT CAST(floor(e / 3600) AS BIGINT) * 3600 AS storm_s,
                  count(*) AS n_errors
           FROM ep WHERE event_type = 'error'
           GROUP BY 1 HAVING count(*) >= 5)
SELECT storm_s, n_errors, count(*) AS n_spans,
       count(DISTINCT span_user) AS n_users
FROM spans JOIN storms
  ON span_s <= storm_s + 3599 AND storm_s <= span_e
GROUP BY storm_s, n_errors
ORDER BY storm_s
"""


def item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank (3 exact-integer iterations) over the item
    transition graph: per-user consecutive props.k values form directed
    edges; ranks replay bit-exactly in any engine (see operators/
    graph.py: pagerank_exact), which is what lets an iterative operator
    carry a full value-hash oracle instead of a rows-only check."""
    from dnsflow_clickhouse_spark.operators.graph import pagerank_exact

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("pk", F.lag("k").over(w))
        .filter(F.col("pk").isNotNull() & (F.col("pk") != F.col("k")))
        .select(F.col("pk").alias("src"), F.col("k").alias("dst"))
    )
    # item vocabulary is ~100 nodes: size the loop shuffles accordingly
    return pagerank_exact(edges, iterations=3, num_partitions=4).orderBy("id")


def _pr_iter(prev: str, out: str) -> str:
    return f"""{out} AS (
  SELECT n.id, CAST(150000 + (coalesce(c.i, 0) * 850) // 1000 AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.d AS id, sum(r.rank // deg.dg) AS i
    FROM {prev} r JOIN edges e ON r.id = e.s JOIN deg ON deg.s = e.s
    GROUP BY e.d
  ) c ON n.id = c.id
)"""


_PAGERANK_SQL = f"""
WITH seq AS (
  SELECT user_id, ts, event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         lag(CAST(json_extract_string(props, '$.k') AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS pk
  FROM events
),
edges AS (SELECT DISTINCT pk AS s, k AS d FROM seq
          WHERE pk IS NOT NULL AND pk <> k),
deg AS (SELECT s, count(*) AS dg FROM edges GROUP BY s),
nodes AS (SELECT s AS id FROM edges UNION SELECT d FROM edges),
r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM nodes),
{_pr_iter("r0", "r1")},
{_pr_iter("r1", "r2")},
{_pr_iter("r2", "r3")}
SELECT id, rank FROM r3 ORDER BY id
"""


DNS5_REGISTRY = {
    "item_pagerank": (item_pagerank, _PAGERANK_SQL),
    "storm_span_overlap": (storm_span_overlap, _STORM_SQL),
    "multiset_ops_events": (multiset_ops_events, _MULTISET_SQL),
    "unpivot_daily_metrics": (unpivot_daily_metrics, _UNPIVOT_SQL),
    "session_stats": (session_stats, _SESSION_SQL),
    "asof_last_click": (asof_last_click, _ASOF_SQL),
    "doc_bpe_tokens": (doc_bpe_tokens, _BPE_SQL),
}


def item_hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration HITS authorities (3 exact-integer iterations)
    over the bipartite user -> props.k item graph: items endorsed by
    users who endorse many well-endorsed items rank highest — the
    mutually-reinforcing counterpart of item_pagerank's random walk.
    Max-rescaled integer half-steps replay bit-exactly in any engine
    (operators/graph.py: hits_scores)."""
    from dnsflow_clickhouse_spark.operators.graph import hits_scores

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    edges = ev.filter(F.col("k").isNotNull()).select(
        F.col("user_id").alias("src"), F.col("k").alias("dst")
    )
    # item vocabulary is ~100 nodes; size the loop shuffles accordingly
    _, auth = hits_scores(edges, iterations=3, num_partitions=8)
    return auth.select(F.col("id").alias("item"), "auth").orderBy(
        F.col("auth").desc(), "item"
    )


def _hits_iter(h_prev: str, n: int) -> str:
    return f"""
a{n}r AS (SELECT d, sum(h) AS r FROM e JOIN {h_prev} ON {h_prev}.id = e.s
          GROUP BY d),
a{n} AS (SELECT d AS id, (r * 1000000) // (SELECT max(r) FROM a{n}r) AS a
         FROM a{n}r),
h{n}r AS (SELECT s, sum(a) AS r FROM e JOIN a{n} ON a{n}.id = e.d
          GROUP BY s),
h{n} AS (SELECT s AS id, (r * 1000000) // (SELECT max(r) FROM h{n}r) AS h
         FROM h{n}r)"""


_HITS_SQL = f"""
WITH ev AS (SELECT user_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events),
e AS (SELECT DISTINCT user_id AS s, k AS d FROM ev WHERE k IS NOT NULL),
h0 AS (SELECT DISTINCT s AS id, CAST(1000000 AS HUGEINT) AS h FROM e),
{_hits_iter("h0", 1)},
{_hits_iter("h1", 2)},
{_hits_iter("h2", 3)}
SELECT id AS item, CAST(a AS BIGINT) AS auth FROM a3
ORDER BY auth DESC, item
"""

DNS5_REGISTRY["item_hits_authorities"] = (item_hits_authorities, _HITS_SQL)


# ---------------------------------------------------------------------------
# Seasonal-naive QPS anomaly detection: each (day, hour-of-day) bucket
# vs the expanding average of PRIOR days' same-hour counts — the ops
# alarm a DNS analytics deployment runs on the A1 QPS rollup (traffic
# is hour-of-day seasonal, so "same hour, previous days" is the right
# baseline; a plain trailing window would alarm every diurnal ramp).
# ---------------------------------------------------------------------------

_ANOM_MIN_HISTORY = 7  # require a week of same-hour history
_ANOM_THRESHOLD_PPM = 500_000  # |count - baseline| >= 50% of baseline


def qps_anomaly_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, hour) buckets whose event count deviates >= 50% from the
    average of all prior days' same-hour counts (>= 7 days history).
    Exactness: the deviation test cross-multiplies instead of dividing
    (|cnt * n_prior - sum_prior| * 1e6 div sum_prior, numerator widened
    to decimal so ~1e10-events/hour deployments cannot wrap int64);
    every quantity is a nonnegative integer, so truncating and flooring
    division agree. One hash agg + one expanding window partitioned by
    hour-of-day (24 partitions of day-count length — trivially
    redistributable at any scale)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.unix_timestamp("ts").alias("ep")
    )
    return anomalies_from_epochs(ev)


def bucket_hour_counts(ev: DataFrame) -> DataFrame:
    """(day, hod, cnt) hour buckets from a frame with one ``ep``
    (epoch seconds) column — the map+agg half shared with the
    streaming fold."""
    return (
        ev.select(
            F.floor(F.col("ep") / 86400).cast("long").alias("day"),
            (F.floor(F.col("ep") / 3600) % 24).cast("long").alias("hod"),
        )
        .groupBy("day", "hod")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def anomalies_from_epochs(ev: DataFrame) -> DataFrame:
    """Core of qps_anomaly_report over a frame with one ``ep`` (epoch
    seconds) column — split out so fixtures and the streaming parity
    test can drive it directly (scoring: operators/reports.py:
    seasonal_hour_anomalies)."""
    from dnsflow_clickhouse_spark.operators.reports import (
        seasonal_hour_anomalies,
    )

    return seasonal_hour_anomalies(
        bucket_hour_counts(ev), _ANOM_MIN_HISTORY, _ANOM_THRESHOLD_PPM
    )


_ANOM_SQL = f"""
WITH hc AS (
  SELECT CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600) % 24 AS BIGINT) AS hod,
         count(*) AS cnt
  FROM events GROUP BY 1, 2),
sc AS (
  SELECT day, hod, cnt,
         count(*) OVER (PARTITION BY hod ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS n_prior,
         coalesce(sum(cnt) OVER (PARTITION BY hod ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS sum_prior
  FROM hc)
SELECT day, hod, CAST(cnt AS BIGINT) AS cnt,
       CAST(n_prior AS BIGINT) AS n_prior,
       CAST(sum_prior AS BIGINT) AS sum_prior,
       CAST(abs(CAST(cnt AS HUGEINT) * n_prior - sum_prior) * 1000000
            // sum_prior AS BIGINT) AS dev_ppm
FROM sc
WHERE n_prior >= {_ANOM_MIN_HISTORY}
  AND abs(CAST(cnt AS HUGEINT) * n_prior - sum_prior) * 1000000
      >= {_ANOM_THRESHOLD_PPM} * CAST(sum_prior AS HUGEINT)
ORDER BY day, hod
"""

DNS5_REGISTRY["qps_anomaly_report"] = (qps_anomaly_report, _ANOM_SQL)
