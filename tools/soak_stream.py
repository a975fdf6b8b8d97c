"""Streaming soak (r6 verdict ask #6): the reference runs 24/7
(DnsRptCH.scala's 300 s DStream clock); the rebuild's tests prove
per-batch parity but a long-lived deployment's risk surface is the
CROSS-batch loop — per-batch wall creeping up and stateful-merge state
growing without bound. This drives N consecutive 5-minute windows
through the SAME ``process_batch`` the production stream's foreachBatch
runs, folding the three cross-batch state families through
write/read-back state tables exactly like a deployed foreachBatch
would:

- Bloom first-seen membership over domains (``merge_bloom_state``) —
  bitmap rows must stay CONSTANT (bits/32) forever;
- HLL distinct-clients-per-server registers (``merge_sketch_state``) —
  <= keys x m rows forever;
- per-series hour counts + CUSUM rescore (``merge_series_hour_counts``
  + ``streaming_cusum``) — rows grow with OBSERVED HOURS (10 windows =
  ~1h), never with event volume.

Each batch materializes all 16+2 reports (noop sink) plus the folded
state (localCheckpoint = the write-to-store barrier), records wall and
state row counts, and the artifact asserts the soak contract:
last-3-batch mean wall within 1.5x of the first-3 mean (flat, no
lineage/creep), bloom rows constant, HLL rows bounded, hour rows
linear in windows.

    python tools/soak_stream.py [sf_dir] [n_batches] [out.json]

Defaults: /root/testdata/sf0.01, 10 batches, SOAK_r09.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.session import get_spark
from dnsflow_clickhouse_spark.sources.synth import (
    SYNTH_APP_TIME,
    demo_dims,
    synthetic_raw_events,
)
from dnsflow_clickhouse_spark.streaming.pipeline import (
    WINDOW_SECONDS,
    merge_bloom_state,
    merge_series_hour_counts,
    merge_sketch_state,
    process_batch,
    streaming_cusum,
)


STATEFUL_WORK = Path("/tmp/soak_stateful")
SS_KEYS_PER_WINDOW, SS_KEY_STRIDE = 100, 60  # 40-key overlap per window


def _stateful_window(spark, k: int) -> dict:
    """One window of the REAL state-store leg (r10 verdict #6): a
    checkpointed ``applyInPandasWithState`` first-seen query advances
    one micro-batch per soak window over an overlapping key stream
    (60 new / 40 repeat keys per window -> state must grow EXACTLY 60
    rows per window), and the window records the state store's own
    telemetry so a leak shows in BYTES and commit latency, not just
    folded-table row counts:

    - ``progress``: the trigger's StateOperatorProgress —
      ``numRowsTotal`` / ``numRowsUpdated`` / ``commitTimeMs`` /
      ``memoryUsedBytes`` + the provider's
      ``stateOnCurrentVersionSizeBytes`` custom metric;
    - ``reader_rows``: an independent snapshot via the batch
      ``statestore`` reader (needs
      ``coordinatorReportSnapshotUploadLag=false`` on a batch session —
      the lag report RPCs a coordinator endpoint only streaming queries
      create); recorded as a skip string on any reader gap.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dnsflow_clickhouse_spark.streaming.stateful import first_seen

    # SPARK_GRAFT_SOAK_SS_PROVIDER=rocksdb runs the leg on the
    # production state-store provider (in-box rocksdbjni + changelog
    # checkpointing) — the configuration the operators' 10^9-key scale
    # notes cite; default stays the HDFS-backed provider
    if os.environ.get("SPARK_GRAFT_SOAK_SS_PROVIDER", "") == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )

    inp = STATEFUL_WORK / "input"
    inp.mkdir(parents=True, exist_ok=True)
    keys, ids = [], []
    for key in range(k * SS_KEY_STRIDE, k * SS_KEY_STRIDE + SS_KEYS_PER_WINDOW):
        for rep in (1, 0):
            keys.append(f"k{key:05d}")
            ids.append(key * 10 + rep)
    pq.write_table(
        pa.table({"dup_key": pa.array(keys), "id": pa.array(ids, pa.int64())}),
        inp / f"w{k}.parquet",
    )
    raw = (
        spark.readStream.schema("dup_key string, id long")
        .parquet(str(inp))
    )
    q = (
        first_seen(raw)
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", str(STATEFUL_WORK / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ops = [p for p in q.recentProgress if p.get("stateOperators")]
    op = ops[-1]["stateOperators"][0] if ops else {}
    progress = {
        "numRowsTotal": op.get("numRowsTotal"),
        "numRowsUpdated": op.get("numRowsUpdated"),
        "commitTimeMs": op.get("commitTimeMs"),
        "memoryUsedBytes": op.get("memoryUsedBytes"),
        "stateOnCurrentVersionSizeBytes": (op.get("customMetrics") or {}).get(
            "stateOnCurrentVersionSizeBytes"
        ),
    }
    spark.conf.set(
        "spark.sql.streaming.stateStore.coordinatorReportSnapshotUploadLag",
        "false",
    )
    try:
        reader_rows = (
            spark.read.format("statestore")
            .load(str(STATEFUL_WORK / "ckpt"))
            .count()
        )
    except Exception as ex:  # noqa: BLE001 - recorded, not raised
        reader_rows = f"skipped: {type(ex).__name__}: {str(ex).splitlines()[0][:120]}"
    return {"window": k, "progress": progress, "reader_rows": reader_rows}


def run_soak(spark, sf_dir: str, n_batches: int) -> dict:
    import shutil

    from dnsflow_clickhouse_spark.operators.sketches import (
        bloom_build,
        hll_registers,
    )

    shutil.rmtree(STATEFUL_WORK, ignore_errors=True)

    dims = demo_dims(spark)
    walls: list[float] = []
    bloom_rows: list[int] = []
    hll_rows: list[int] = []
    hour_rows: list[int] = []
    report_rows: list[int] = []
    statestore: list[dict] = []
    bloom_state = hll_state = hour_state = None

    for k in range(n_batches):
        app_k = SYNTH_APP_TIME + WINDOW_SECONDS * k
        raw = synthetic_raw_events(spark, sf_dir, app_time_s=app_k)
        t0 = time.perf_counter()
        out = process_batch(raw, dims, app_k, deterministic=True)
        n_out = 0
        for _, df in out.items():
            df.write.format("noop").mode("overwrite").save()
            n_out += 1
        # cross-batch state folds, localCheckpoint = the state-store
        # write barrier a deployed foreachBatch would hit per trigger
        bloom_state = merge_bloom_state(
            bloom_state, bloom_build(raw, "Domain")
        ).localCheckpoint(eager=True)
        hll_state = merge_sketch_state(
            hll_state,
            hll_registers(raw, ["ServerIP"], "ClientIP"),
            ["ServerIP"],
        ).localCheckpoint(eager=True)
        batch_hours = (
            raw.select(
                F.col("Type").alias("series"),
                (F.col("Timestamp") - F.pmod(F.col("Timestamp"), F.lit(3600)))
                .cast("long")
                .alias("hour_ep"),
            )
            .groupBy("series", "hour_ep")
            .agg(F.count("*").alias("cnt"))
        )
        hour_state = merge_series_hour_counts(
            hour_state, batch_hours
        ).localCheckpoint(eager=True)
        streaming_cusum(hour_state).write.format("noop").mode(
            "overwrite"
        ).save()
        walls.append(round(time.perf_counter() - t0, 3))
        # the state-store leg runs OUTSIDE the per-batch wall clock so
        # wall_per_batch_mean / the 1.5x flatness leak-detector keep
        # measuring exactly what every prior round's soak measured (the
        # fold legs); the leg clocks itself into its own record
        t1 = time.perf_counter()
        ss = _stateful_window(spark, k)
        ss["leg_wall_s"] = round(time.perf_counter() - t1, 3)
        statestore.append(ss)
        bloom_rows.append(bloom_state.count())
        hll_rows.append(hll_state.count())
        hour_rows.append(hour_state.count())
        report_rows.append(n_out)
        spark.catalog.clearCache()  # process_batch persists base/flow
        print(
            f"batch {k}: wall={walls[-1]:.2f}s bloom={bloom_rows[-1]} "
            f"hll={hll_rows[-1]} hours={hour_rows[-1]}",
            file=sys.stderr,
            flush=True,
        )

    head = walls[1 : max(2, min(4, len(walls)))]  # skip batch 0 (cold)
    tail = walls[-3:]
    flat = (sum(tail) / len(tail)) / (sum(head) / len(head)) if head else None

    # state-store leg bounds (r10 verdict #6): the key stream makes the
    # exact row count a closed form (60 new keys per window after the
    # first 100), commit latency must stay flat, and bytes-per-state-row
    # must not creep — a per-row byte leak is the failure mode row
    # counts alone cannot see
    ss_rows = [w["progress"]["numRowsTotal"] for w in statestore]
    ss_expected = [
        SS_KEY_STRIDE * k + SS_KEYS_PER_WINDOW for k in range(n_batches)
    ]
    ss_bytes = [w["progress"]["memoryUsedBytes"] for w in statestore]
    ss_commit = [w["progress"]["commitTimeMs"] for w in statestore]
    bpr = [
        (b / r) for b, r in zip(ss_bytes, ss_rows)
        if isinstance(b, (int, float)) and r
    ]
    rocksdb = (
        os.environ.get("SPARK_GRAFT_SOAK_SS_PROVIDER", "") == "rocksdb"
    )
    if rocksdb:
        # RocksDB's memoryUsedBytes is INSTANCE-level (block cache +
        # memtables filling toward their configured caps — measured
        # 68KB -> 32.5MB over 8 windows while rows grew 5.2x, then
        # plateaus at the budget), so per-row flatness is the wrong
        # leak detector; bound the absolute budget instead.
        bytes_bound = ("bytes_under_provider_budget", (
            bool(ss_bytes)
            and isinstance(ss_bytes[-1], (int, float))
            and ss_bytes[-1] <= 256 * 1024 * 1024
        ))
    else:
        bytes_bound = ("bytes_per_row_flat", (
            len(bpr) >= 2 and bpr[-1] <= 3.0 * max(bpr[0], 1e-9)
        ))
    ss_bounds = {
        "rows_exact_closed_form": ss_rows == ss_expected,
        bytes_bound[0]: bytes_bound[1],
        "commit_ms_tail_flat": (
            len(ss_commit) >= 6
            and all(isinstance(c, (int, float)) for c in ss_commit)
            and (sum(ss_commit[-3:]) / 3)
            <= 3.0 * max(sum(ss_commit[1:4]) / 3, 1.0)
        ),
        "reader_matches_progress": all(
            w["reader_rows"] == w["progress"]["numRowsTotal"]
            for w in statestore
            if isinstance(w["reader_rows"], int)
        ),
        "reader_snapshots_decoded": sum(
            1 for w in statestore if isinstance(w["reader_rows"], int)
        ),
    }
    return {
        "metric": "stream_soak",
        "sf_dir": sf_dir,
        "soak_batches": n_batches,
        "wall_per_batch": walls,
        "wall_per_batch_mean": round(sum(walls) / len(walls), 3),
        "wall_flatness_tail3_over_head3": round(flat, 3),
        "state_rows": {
            "bloom_bitmap": bloom_rows,
            "hll_registers": hll_rows,
            "series_hour_counts": hour_rows,
        },
        "reports_per_batch": report_rows[-1],
        "statestore": {
            "provider": os.environ.get(
                "SPARK_GRAFT_SOAK_SS_PROVIDER", "hdfs-backed (default)"
            ),
            "per_window": statestore,
            "bounds": ss_bounds,
        },
        "bounded": {
            "bloom_constant": len(set(bloom_rows)) == 1,
            "hll_nondecreasing_bounded": hll_rows[-1] <= hll_rows[0] * 4 + 64,
            "hours_linear_in_windows": hour_rows[-1]
            <= hour_rows[0] * (n_batches + 1),
        },
        # end-of-run reading is the soak's OWN 32-thread work, not
        # ambient (r12 advisory #3): labeled so the artifact can't be
        # misread as a loaded run — the idle proof is
        # ambient_load_1m_at_start, recorded before the first batch.
        "self_load_1m_at_end": round(os.getloadavg()[0], 1),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    n = int(args[1]) if len(args) > 1 else 10
    out = Path(args[2] if len(args) > 2 else "SOAK_r09.json")
    # same idle gate the bench uses (r11 verdict #3): the flatness
    # numbers are wall-clock-insensitive by design, but an artifact
    # recorded under ambient load carries a caveat it doesn't need —
    # wait (bounded) for the box to drain and record the wait + the
    # load at start so the numbers are citable without it.
    from bench import _idle_gate, _loadavg

    idle_waited = _idle_gate()
    load_at_start = _loadavg()
    spark = get_spark(app_name="stream-soak")
    art = run_soak(spark, sf_dir, n)
    art["idle_gate_waited_s"] = idle_waited
    art["ambient_load_1m_at_start"] = load_at_start
    # r12 verdict #6: the soak telemetry is ASSERTED, not eyeballed —
    # named boolean fields with their floors, violations printed to
    # stderr (the same promotion pattern as the sweep's 16x recall).
    flat = art["wall_flatness_tail3_over_head3"]
    bool_bounds = {
        **{k: v for k, v in art["bounded"].items()},
        **{k: v for k, v in art["statestore"]["bounds"].items()
           if isinstance(v, bool)},
    }
    art["assertions"] = {
        "wall_flatness_floor": 1.5,
        "wall_flatness_le_floor": flat <= 1.5,
        "state_bounds_all_true": all(bool_bounds.values()),
        "n_bool_bounds": len(bool_bounds),
    }
    for name, ok in [
        ("wall_flatness_le_floor", art["assertions"]["wall_flatness_le_floor"]),
        ("state_bounds_all_true", art["assertions"]["state_bounds_all_true"]),
    ]:
        if not ok:
            print(f"SOAK ASSERTION VIOLATION: {name} "
                  f"(flatness={flat}, bounds={bool_bounds})",
                  file=sys.stderr)
    out.write_text(json.dumps(art, indent=1, sort_keys=True))
    print(json.dumps({
        **{k: art[k] for k in ("wall_per_batch_mean", "wall_flatness_tail3_over_head3", "bounded")},
        "statestore_bounds": art["statestore"]["bounds"],
        "assertions": art["assertions"],
    }))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
