"""DNS event ingest: JSON lines -> validated, filtered, derived events.

Re-expresses the reference's ``getBaseRDD`` parse/filter/derive stage
(reference: DnsRptCH.scala:861-979) as one declarative plan:

- fastjson per-line parse + drop malformed      -> from_json PERMISSIVE + filter
- domain hygiene filter (DnsRptCH.scala:879-887)-> is_junk_domain predicate
- event-time window filter (DnsRptCH.scala:888) -> ts between [start, end)
- QR filter (DnsRptCH.scala:890)                -> filter(QR)
- error rule (DnsRptCH.scala:916-918, 964):
    error = 1 iff responseCode != 0 OR Answers empty OR final aip == 0.0.0.0
- aip: a *sampled* A-record Value from Answers (DnsRptCH.scala:950);
  seedable via a deterministic pick for tests (rand() otherwise)
- responseType: the *last* answer's Type (DnsRptCH.scala:951)
- resolver = 1 (row-count-as-column, BeanObj.scala:18)

Everything is a built-in expression; the JSON parse itself is the only
per-row cost, exactly as in the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.domains import is_junk_domain, strip_scheme
from dnsflow_clickhouse_spark.schemas import RAW_EVENT_SCHEMA

DEFAULT_AIP = "0.0.0.0"
DEFAULT_CLIENT_NAME = 5  # unmatched client ranges (BeanObj.scala:17)


def parse_raw_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON-lines DataFrame -> typed raw events; malformed lines dropped.

    PERMISSIVE mode puts unparseable lines into _corrupt_record; the
    reference logs-and-drops them (DnsRptCH.scala:866-873) — we drop.
    """
    parsed = lines.select(
        F.from_json(F.col(value_col), RAW_EVENT_SCHEMA).alias("r")
    ).select("r.*")
    return parsed.filter(
        F.col("_corrupt_record").isNull() & F.col("Timestamp").isNotNull()
    ).drop("_corrupt_record")


def parse_with_quarantine(
    lines: DataFrame, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Like :func:`parse_raw_lines`, but returns ``(good, quarantine)``
    instead of silently dropping: the quarantine frame carries the raw
    line plus a ``reason`` ('corrupt' | 'missing_timestamp') for a side
    sink — the pattern that turns the reference's log-and-drop
    (DnsRptCH.scala:866-873) into an auditable dead-letter table.
    One parse; both frames are filters over the same projection, so
    Catalyst shares the scan when both are written in one job."""
    parsed = lines.select(
        F.col(value_col).alias("__raw"),
        F.from_json(F.col(value_col), RAW_EVENT_SCHEMA).alias("r"),
    ).select("__raw", "r.*")
    good = parsed.filter(
        F.col("_corrupt_record").isNull() & F.col("Timestamp").isNotNull()
    ).drop("_corrupt_record", "__raw")
    bad = parsed.filter(
        F.col("_corrupt_record").isNotNull() | F.col("Timestamp").isNull()
    ).select(
        F.col("__raw").alias("raw_line"),
        F.when(F.col("_corrupt_record").isNotNull(), "corrupt")
        .otherwise("missing_timestamp")
        .alias("reason"),
    )
    return good, bad


def _a_answers(answers: Column) -> Column:
    return F.filter(answers, lambda a: a["Type"] == "A")


def derive_events(
    raw: DataFrame,
    window_start_s: int | None = None,
    window_end_s: int | None = None,
    deterministic_aip: bool = False,
) -> DataFrame:
    """Apply filters + derivations; returns the BASE_EVENT shape.

    ``deterministic_aip=True`` picks the first A answer instead of a
    random one — used by tests/oracles (the reference samples randomly,
    DnsRptCH.scala:950, which is unverifiable; SURVEY §7.4).
    """
    df = raw
    # P1 hygiene + P3 QR response-only (DnsRptCH.scala:879-890)
    df = df.filter(~is_junk_domain(F.col("Domain"))).filter(F.col("QR"))
    # P2 event-time window [start, end) (DnsRptCH.scala:888)
    if window_start_s is not None:
        df = df.filter(F.col("Timestamp") >= F.lit(window_start_s))
    if window_end_s is not None:
        df = df.filter(F.col("Timestamp") < F.lit(window_end_s))

    answers = F.coalesce(F.col("Answers"), F.array().cast(RAW_EVENT_SCHEMA["Answers"].dataType))
    a_recs = _a_answers(answers)
    if deterministic_aip:
        pick = F.element_at(a_recs, 1)["Value"]
    else:
        # uniform sample over the A records (DnsRptCH.scala:950)
        idx = (F.rand() * F.size(a_recs)).cast("int") + 1
        pick = F.element_at(a_recs, idx)["Value"]
    aip = F.when(F.size(a_recs) > 0, pick).otherwise(F.lit(DEFAULT_AIP))
    # responseType = last answer's Type; "other" when no answers
    # (DnsRptCH.scala:944-951, BeanObj.scala:20 default)
    response_type = F.when(
        F.size(answers) > 0, F.element_at(answers, -1)["Type"]
    ).otherwise(F.lit("other"))
    # error rule (DnsRptCH.scala:916-918 + the post-enrichment aip check
    # at :964 folded into one expression)
    error = (
        F.when(F.col("ResponseCode") != 0, 1)
        .when(F.size(answers) == 0, 1)
        .when(aip == DEFAULT_AIP, 1)
        .otherwise(0)
        .cast("long")
    )
    return df.select(
        F.timestamp_seconds(F.col("Timestamp")).alias("ts"),
        F.col("ClientIP").alias("clientIp"),
        strip_scheme(F.col("Domain")).alias("domain"),
        F.col("Type").alias("requestType"),
        F.col("ResponseCode").alias("responseCode"),
        response_type.alias("responseType"),
        F.col("ServerIP").alias("dnsIp"),
        aip.alias("aip"),
        error.alias("error"),
        F.lit(1).cast("long").alias("resolver"),
    )


def read_event_files(spark, paths: list[str]) -> DataFrame:
    """Multi-path JSON-lines scan (reference: comma-joined textFile,
    DnsRptCH.scala:1014-1024 — an implicit UNION ALL)."""
    return spark.read.text(paths)
