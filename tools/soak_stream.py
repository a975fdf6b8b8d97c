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


def run_soak(spark, sf_dir: str, n_batches: int) -> dict:
    from dnsflow_clickhouse_spark.operators.sketches import (
        bloom_build,
        hll_registers,
    )

    dims = demo_dims(spark)
    walls: list[float] = []
    bloom_rows: list[int] = []
    hll_rows: list[int] = []
    hour_rows: list[int] = []
    report_rows: list[int] = []
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
        "bounded": {
            "bloom_constant": len(set(bloom_rows)) == 1,
            "hll_nondecreasing_bounded": hll_rows[-1] <= hll_rows[0] * 4 + 64,
            "hours_linear_in_windows": hour_rows[-1]
            <= hour_rows[0] * (n_batches + 1),
        },
        "load_1m": round(os.getloadavg()[0], 1),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    n = int(args[1]) if len(args) > 1 else 10
    out = Path(args[2] if len(args) > 2 else "SOAK_r09.json")
    spark = get_spark(app_name="stream-soak")
    art = run_soak(spark, sf_dir, n)
    out.write_text(json.dumps(art, indent=1, sort_keys=True))
    print(json.dumps({k: art[k] for k in ("wall_per_batch_mean", "wall_flatness_tail3_over_head3", "bounded")}))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
