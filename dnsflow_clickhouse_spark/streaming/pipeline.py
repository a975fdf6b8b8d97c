"""The 5-minute micro-batch pipeline: one shared ``process_batch`` used
by both streaming and backfill (a hard requirement per SURVEY §3.2 —
the reference replays the same ``call()`` for both,
DnsRptCH.scala:981-1164, DnsRptOffline.scala:69-73).

Reference behavior being re-expressed:
- trigger: a DStream clock hack firing every 300 s (DnsRptCH.scala:1213)
  -> Structured Streaming file source + ``trigger(processingTime)``, or
  a plain loop for backfill.
- window: 5-min tumbling on event time with a fixed 5-min late allowance
  (records for window W are processed when W+5min closes;
  DnsRptCH.scala:888, 988-994) -> ``withWatermark`` + window filter in
  ``process_batch``.
- state: none — every batch is independent; the fan-out is stateless
  over the batch's events, so ``foreachBatch`` is the right tool (no
  stateful operators needed).
- caching: base and top frames persist(MEMORY_AND_DISK) around the
  16-report fan-out, unpersisted in finally (DnsRptCH.scala:1069-1160).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Literal, overload

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from dnsflow_clickhouse_spark.operators import reports as R
from dnsflow_clickhouse_spark.operators.enrich import (
    EnrichDims,
    enrich_base,
    enrich_top,
)
from dnsflow_clickhouse_spark.sources.events import derive_events, parse_raw_lines

WINDOW_SECONDS = 300


@overload
def process_batch(
    events: DataFrame,
    dims: EnrichDims,
    app_time_s: int | None = ...,
    deterministic: bool = ...,
    return_base: Literal[False] = ...,
) -> dict[str, DataFrame]: ...


@overload
def process_batch(
    events: DataFrame,
    dims: EnrichDims,
    app_time_s: int | None = ...,
    deterministic: bool = ...,
    *,
    return_base: Literal[True],
) -> tuple[dict[str, DataFrame], DataFrame]: ...


def process_batch(
    events: DataFrame,
    dims: EnrichDims,
    app_time_s: int | None = None,
    deterministic: bool = False,
    return_base: bool = False,
) -> dict[str, DataFrame] | tuple[dict[str, DataFrame], DataFrame]:
    """Run the full report fan-out over one window's events.

    ``events`` is the *raw* typed event frame (RAW_EVENT_SCHEMA columns);
    filtering to ``[app_time_s, app_time_s + 300)`` happens here exactly
    like the reference's per-record window filter (DnsRptCH.scala:888).

    Returns {report_name: DataFrame}; the caller persists/writes. All 16
    reports read the cached base/top frames — one scan + one parse
    amortized across the fan-out. ``return_base=True`` returns
    ``(reports, base)`` instead, so a harness can materialize the shared
    cached base on its own clock and report the scan+parse+enrich cost
    separately from the per-report costs (bench.py's
    ``base_materialize`` line) — production callers ignore it.
    """
    window_end = app_time_s + WINDOW_SECONDS if app_time_s is not None else None
    derived = derive_events(
        events,
        window_start_s=app_time_s,
        window_end_s=window_end,
        deterministic_aip=deterministic,
    )
    base = enrich_base(derived, dims).persist(StorageLevel.MEMORY_AND_DISK)

    flow = R.flow_report(base, dims).persist(StorageLevel.MEMORY_AND_DISK)
    top = enrich_top(flow, dims)

    code_domain = R.response_code_domain_topk(base)
    code_domain_client = R.response_code_domain_topk(base, per_client=True)

    out: dict[str, DataFrame] = {
        "dns_flow_qps": R.qps_report(base),
        "dns_flow_request_type": R.request_type_ratio(base),
        "dns_flow_response_type": R.response_type_ratio(base),
        "dns_flow_response_code": R.response_code_ratio(base),
        "dns_flow_code_domain": code_domain,
        "dns_flow_code_authority": R.response_code_authority_topk(code_domain),
        "dns_flow_code_domain_client": code_domain_client,
        "dns_flow_code_authority_client": R.response_code_authority_topk(
            code_domain_client, per_client=True
        ),
        "dns_flow_code_client_ip": R.response_code_client_topk(base),
        "dns_flow_code_client_ip_client": R.response_code_client_topk(
            base, per_client=True
        ),
        "dns_flow_clear": top,
        "dns_flow_trend": R.detail_report(top),
        "dns_flow_top_business": R.business_report(flow),
        "dns_flow_top_server": R.dns_server_topn(base),
        "dns_flow_top_province": R.province_report(base),
        "dns_flow_top_operator": R.operator_report(base),
        "bigdata_dns_flow_top_user": R.user_report(base, dims),
        "dns_middle_user": R.user_middle_data(base, dims),
    }
    if return_base:
        return out, base
    return out


def run_batch_from_lines(
    lines: DataFrame,
    dims: EnrichDims,
    app_time_s: int | None = None,
    deterministic: bool = False,
) -> dict[str, DataFrame]:
    """JSON-lines variant: parse then process (reference S3 + call())."""
    return process_batch(
        parse_raw_lines(lines), dims, app_time_s, deterministic=deterministic
    )


def run_backfill(
    spark: SparkSession,
    events: DataFrame,
    dims: EnrichDims,
    start_s: int,
    end_s: int,
    sink: Callable[[str, DataFrame, int], None],
    deterministic: bool = False,
) -> None:
    """Replay ``process_batch`` over [start_s, end_s] in 300-s steps —
    the reference's offline loop (DnsRptOffline.scala:69-73). One code
    path with streaming; only the driver loop differs."""
    for t in range(start_s, end_s, WINDOW_SECONDS):
        for name, df in process_batch(events, dims, t, deterministic=deterministic).items():
            sink(name, df, t)


def windowed_qps_stream(
    raw_lines: DataFrame,
    window: str = "5 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Event-time tumbling-window QPS aggregation with a watermark — the
    Structured-Streaming-native form of the reference's window semantics
    (5-min tumbling + fixed 5-min late allowance, DnsRptCH.scala:888,
    988-994).

    Where ``start_stream`` reproduces the reference's *mechanism* (a
    clock firing a stateless batch over a window's files), this is the
    engine-native *declaration*: the watermark finalizes a window once
    max(event time) − allowance passes its end, accepts any in-allowance
    late record into open state, and drops later ones — no hand-rolled
    path math. In append output mode each window row emits exactly once,
    so the sink is idempotent-append like the reference's report tables.

    Works on a streaming OR batch frame of raw JSON lines (one shared
    code path, SURVEY §3.2); aggregation state is per-window counts
    only, so executor memory is bounded by open windows, not events.
    """
    parsed = parse_raw_lines(raw_lines)
    ev = (
        parsed.withColumn("ts", F.timestamp_seconds(F.col("Timestamp")))
        .filter(F.col("QR"))
        .withColumn(
            "error",
            ((F.col("ResponseCode") != 0) | (F.size(F.col("Answers")) == 0))
            .cast("long"),
        )
        .withWatermark("ts", watermark)
    )
    return (
        ev.groupBy(F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("dnsNum"), F.sum("error").alias("errNum"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "dnsNum",
            "errNum",
        )
    )


def sessionized_stream(
    raw_lines: DataFrame,
    gap: str = "2 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Event-time gap sessions per client — the Structured-Streaming-
    native sibling of ``operators/sessions.py: sessionize`` (whose lag/
    cumsum window algebra only works on closed batches).

    ``F.session_window`` keeps one open [start, last+gap) interval per
    (client, session) in state, merging events that arrive within the
    gap — including out-of-order ones the watermark still admits — and
    emits exactly one row per session in append mode once the watermark
    passes the session's close. State is bounded by *open* sessions, so
    executor memory scales with concurrent clients, not event volume —
    the property that makes this run on an unbounded stream at 100 TB/
    day where the batch form would need the whole day shuffled first.
    """
    parsed = parse_raw_lines(raw_lines)
    ev = (
        parsed.withColumn("ts", F.timestamp_seconds(F.col("Timestamp")))
        .filter(F.col("QR"))
        .withWatermark("ts", watermark)
    )
    return (
        ev.groupBy(F.col("ClientIP"), F.session_window(F.col("ts"), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("ClientIP").alias("client_ip"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def attribution_stream(
    raw_lines: DataFrame,
    attribution_window: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Stream-stream interval join: each error response joins the same
    client's requests from the preceding attribution window — the
    streaming form of the as-of/attribution join (operators/sessions.py)
    where BOTH sides are unbounded.

    Structured Streaming requirements encoded here: each side carries
    its own watermark, and the join condition bounds the event-time
    distance, so the engine can expire request-side state once the error
    watermark passes ``ts + attribution_window`` — state is bounded by
    the window span per client, not the stream length. Inner join rows
    emit as soon as both sides arrive.
    """
    parsed = parse_raw_lines(raw_lines).filter(F.col("QR"))
    reqs = (
        parsed.select(
            F.col("ClientIP").alias("r_client"),
            F.col("Domain").alias("r_domain"),
            F.timestamp_seconds(F.col("Timestamp")).alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    errs = (
        parsed.filter(F.col("ResponseCode") != 0)
        .select(
            F.col("ClientIP").alias("e_client"),
            F.col("Domain").alias("e_domain"),
            F.timestamp_seconds(F.col("Timestamp")).alias("e_ts"),
        )
        .withWatermark("e_ts", watermark)
    )
    return reqs.join(
        errs,
        (F.col("r_client") == F.col("e_client"))
        & (F.col("r_ts") <= F.col("e_ts"))
        & (
            F.col("r_ts")
            >= F.col("e_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
        "inner",
    ).select("e_client", "e_domain", "e_ts", "r_domain", "r_ts")


def start_stream(
    spark: SparkSession,
    input_path: str,
    dims: EnrichDims,
    sink: Callable[[str, DataFrame, int], None],
    checkpoint_dir: str,
    trigger_seconds: int = WINDOW_SECONDS,
    deterministic: bool = False,
):
    """File-source Structured Stream: new JSON-line files are discovered
    per trigger; each micro-batch runs the same ``process_batch`` via
    foreachBatch. Watermarking is implicit in the window filter (each
    batch processes the window that closed >= 5 min ago, exactly the
    reference's late-data allowance); checkpointing gives restart-safety
    the reference never had."""
    raw = spark.readStream.format("text").load(input_path)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        parsed = parse_raw_lines(batch_df)
        # process the most recent fully-closed 5-min window per batch.
        # DELIBERATE driver collect (the engine's "no driver-side data"
        # rule has a scalar carve-out): this is ONE aggregated row —
        # max(event time) — fetched once per 300 s trigger to pick the
        # window bound, mirroring the reference's batch-time path
        # enumeration (DnsRptCH.scala:983-1011). Structured Streaming's
        # own watermark metadata isn't usable here because foreachBatch
        # sees the raw un-watermarked frame; an aggregate probe is the
        # batch-parity-preserving equivalent.
        bounds = parsed.agg(F.max("Timestamp").alias("m")).collect()[0]
        if bounds["m"] is None:
            return
        app_time = (int(bounds["m"]) // WINDOW_SECONDS - 1) * WINDOW_SECONDS
        for name, df in process_batch(parsed, dims, app_time, deterministic=deterministic).items():
            sink(name, df, app_time)

    return (
        raw.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def merge_bloom_state(state: DataFrame | None, batch_bloom: DataFrame) -> DataFrame:
    """Cross-batch membership state as a Bloom bitmap
    (operators.sketches.bloom_build): or-fold one micro-batch's filter
    into the running state. Same contract as the HLL/CMS folds — the
    state is <= bits/32 rows FOREVER, the merge is idempotent (replayed
    batches cannot flip a bit twice), and the same bitmap gates the next
    batch's admission (seen-before suppression without an ever-growing
    exact key set; false positives drop a few novel items, never
    re-admit seen ones)."""
    from dnsflow_clickhouse_spark.operators.sketches import bloom_merge

    return batch_bloom if state is None else bloom_merge(state, batch_bloom)


def merge_sketch_state(
    state: DataFrame | None, batch_regs: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Cross-batch distinct-count state as mergeable HLL registers
    (operators.sketches): fold one micro-batch's register table into the
    running state with union + max.

    This is the streaming shape the sketch family exists for — the state
    is <= m rows per key FOREVER (vs an ever-growing exact distinct
    set), the merge is idempotent (a replayed batch cannot inflate the
    estimate, so retries are safe), and the same state table is what an
    incremental daily rollup stores between runs."""
    from dnsflow_clickhouse_spark.operators.sketches import hll_merge

    both = batch_regs if state is None else state.unionByName(batch_regs)
    return hll_merge(both, key_cols)


def merge_cms_state(state: DataFrame | None, batch_sketch: DataFrame) -> DataFrame:
    """Cross-batch frequency state as Count-Min counters: counters are
    additive, so the fold is union + sum per (row, bucket). Unlike the
    HLL fold this one is NOT replay-idempotent (a re-delivered batch
    adds its counts again) — pair it with the idempotent batch-id sink
    (io.write_report_idempotent) or exactly-once foreachBatch
    bookkeeping when retries are possible. State stays depth x width
    rows forever."""
    from pyspark.sql import functions as F

    if state is None:
        return batch_sketch
    return (
        state.unionByName(batch_sketch)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def merge_qh_state(
    state: DataFrame | None, batch_state: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Cross-batch quantile state as mergeable HDR-histogram buckets
    (operators.sketches.qh_sketch): counts are additive, so the fold is
    union + sum per (key, bucket). State stays (keys x occupied buckets)
    rows forever — bucket count grows with log(max_value), not volume —
    and qh_quantiles answers p50/p99 from the folded state at any point
    without rescanning history. Like the CMS fold this is NOT
    replay-idempotent (counts re-add); pair with the idempotent batch-id
    sink when retries are possible."""
    from dnsflow_clickhouse_spark.operators.sketches import qh_merge

    both = batch_state if state is None else state.unionByName(batch_state)
    return qh_merge(both, key_cols)


def merge_kmv_state(
    state: DataFrame | None,
    batch_state: DataFrame,
    key_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Cross-batch distinct-SET state as a KMV/theta sketch
    (operators.sketches.kmv_sketch): fold one micro-batch's k-minimum
    hash table into the running state with union + distinct + keep-k.
    Like the HLL fold this is replay-IDEMPOTENT (a re-delivered batch
    re-inserts hashes that dedupe away, so retries are safe) and the
    state stays <= k rows per key forever — but unlike HLL the folded
    state also answers SET questions (kmv_set_estimates): the running
    "corpus so far" sketch can be intersected against a benchmark
    sketch every batch for streaming contamination tracking."""
    from dnsflow_clickhouse_spark.operators.sketches import kmv_merge

    if state is None:
        return batch_state
    return kmv_merge(state, batch_state, key_cols, k)


def merge_hist_state(
    state: DataFrame | None, batch_cells: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Cross-batch histogram state for streaming drift monitoring:
    additive (``*key_cols``, ``b``, ``cnt``) bucket counts, folded with
    union + sum. State stays (keys x buckets) rows forever. Like the
    CMS/QH folds this is NOT replay-idempotent (counts re-add) — pair
    with the idempotent batch-id sink when retries are possible.

    The consumer is ``streaming_psi``: join the folded CURRENT histogram
    against a fixed REFERENCE histogram (training-time distribution) and
    score drift per batch on bucket-count-sized frames — the streaming
    face of operators/evaluation.psi_report."""
    from pyspark.sql import functions as F

    if state is None:
        return batch_cells
    return (
        state.unionByName(batch_cells)
        .groupBy(*key_cols, "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def streaming_psi(
    cur_cells: DataFrame,
    ref_cells: DataFrame,
    group_col: str,
    n_buckets: int,
) -> DataFrame:
    """PSI of the folded current histogram against a fixed reference
    histogram, per group. Inputs are (group, b, cnt) frames (the
    merge_hist_state shape); both are bucket-count-sized, so the full
    outer join and the PSI math are planning-cost only — no history
    rescans, no fact-table pass."""
    from pyspark.sql import functions as F

    from dnsflow_clickhouse_spark.operators.evaluation import psi_from_cells

    r = ref_cells.select(
        F.col(group_col).alias("grp"), "b", F.col("cnt").alias("c_ref")
    )
    c = cur_cells.select(
        F.col(group_col).alias("grp"), "b", F.col("cnt").alias("c_cur")
    )
    cells = (
        r.join(c, ["grp", "b"], "full_outer")
        .select(
            "grp",
            "b",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
        )
    )
    return psi_from_cells(cells, group_col, n_buckets)


def merge_hour_counts(state: DataFrame | None, batch_counts: DataFrame) -> DataFrame:
    """Cross-batch (day, hod, cnt) hour-bucket state for streaming
    anomaly detection: additive fold (union + sum), state bounded by
    days x 24 rows. Like merge_hist_state this is NOT replay-idempotent
    (counts re-add) — pair with the idempotent batch-id sink when
    retries are possible."""
    from pyspark.sql import functions as F

    if state is None:
        return batch_counts
    return (
        state.unionByName(batch_counts)
        .groupBy("day", "hod")
        .agg(F.sum("cnt").alias("cnt"))
    )


def streaming_qps_anomaly(
    counts: DataFrame,
    min_history: int = 7,
    threshold_ppm: int = 500_000,
) -> DataFrame:
    """Seasonal-naive anomaly report over the folded hour-count state —
    the streaming face of queries/catalog_dns5.qps_anomaly_report,
    scoring on day x 24-sized frames only (no history rescans, no
    fact-table pass). Because the fold is additive and the scorer is a
    pure function of the folded counts, the batch and streaming paths
    are value-identical once the same events have arrived (parity
    test in tests/test_streaming.py)."""
    from dnsflow_clickhouse_spark.operators.reports import (
        seasonal_hour_anomalies,
    )

    return seasonal_hour_anomalies(counts, min_history, threshold_ppm)


def merge_series_hour_counts(
    state: DataFrame | None, batch_counts: DataFrame
) -> DataFrame:
    """Cross-batch (series, hour_ep, cnt) state for streaming CUSUM:
    additive fold (union + sum), state bounded by series x observed
    hours. Same contract as merge_hour_counts: NOT replay-idempotent
    (counts re-add on retry) — pair with the idempotent batch-id sink
    when retries are possible. Late events for an already-folded hour
    simply add into that hour's cell, so the rescore after the fold
    sees the corrected series."""
    if state is None:
        return batch_counts
    return (
        state.unionByName(batch_counts)
        .groupBy("series", "hour_ep")
        .agg(F.sum("cnt").alias("cnt"))
    )


def streaming_cusum(
    counts: DataFrame,
    k_num: int = 3,
    k_den: int = 2,
    h_mult: int = 8,
) -> DataFrame:
    """CUSUM drift report over the folded (series, hour_ep, cnt) state
    — the streaming face of queries/catalog_profiling.event_rate_cusum,
    rescoring on series x hours-sized frames only (no fact-table
    rescans). The detector's sequential recurrence is a pure function
    of the ordered hour counts (the prefix-scan identity in
    operators/profiling.cusum_changepoints), and the fold is additive,
    so batch and streaming are value-identical once the same events
    have arrived — including late hours, which re-enter the prefix at
    their event-time position instead of corrupting running state
    (parity test in tests/test_streaming.py). Thresholds replay the
    batch query's: k = mean * k_num/k_den, h = mean * h_mult, means
    recomputed from the folded state each trigger."""
    from dnsflow_clickhouse_spark.operators.profiling import (
        cusum_changepoints,
    )

    means = counts.groupBy("series").agg(
        F.expr("CAST(sum(cnt) AS DECIMAL(38,0)) * 1000000 div count(*)")
        .cast("long")
        .alias("mean_micro")
    )
    joined = counts.join(F.broadcast(means), "series")
    return cusum_changepoints(
        joined,
        "series",
        "hour_ep",
        F.col("cnt"),
        F.expr(f"mean_micro * {k_num} div {k_den}"),
        F.expr(f"mean_micro * {h_mult}"),
    )


def merge_bucket_counts(
    state: DataFrame | None, batch_counts: DataFrame
) -> DataFrame:
    """Cross-batch (k, b, cnt) time-bucket count state for streaming
    EWMA smoothing: additive fold (union + sum), state bounded by
    keys × live buckets (prune buckets older than the EWMA window if
    the state must stay small). Like merge_hour_counts this is NOT
    replay-idempotent (counts re-add) — pair with the idempotent
    batch-id sink when retries are possible."""
    if state is None:
        return batch_counts
    return (
        state.unionByName(batch_counts)
        .groupBy("k", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def streaming_ewma(counts: DataFrame, window_buckets: int = 8) -> DataFrame:
    """Gap-aware dyadic EWMA over the folded bucket-count state — the
    streaming face of queries/catalog_traindata2.ewma_event_rates.
    Counts are additive and the EWMA contribution expansion is linear
    in the counts, so scoring the fold is value-identical to the batch
    operator once the same events have arrived (parity test in
    tests/test_streaming.py) — the same incremental-view-maintenance
    contract as streaming_psi and streaming_qps_anomaly."""
    from dnsflow_clickhouse_spark.operators.profiling import ewma_from_counts

    return ewma_from_counts(counts, window_buckets)
