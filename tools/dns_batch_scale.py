"""Production-batch scale drill: the reference's operating unit (one
5-minute window -> parse/derive -> enrich -> all 16+2 reports, ref
DnsRptCH.scala:1069-1139, envelope "< 300s" at DnsRptCH.scala:1213)
measured one octave PAST the round-6/7 16x rows — 6.4M raw events per
window (64x sf0.1).

Builds /tmp/scale64ev/events.parquet on demand: 64 key-shifted copies
of sf0.1 events (same rep_shift scheme as tools/make_scale16.py —
disjoint event_id/user_id ranges per copy, so per-copy join structure
and group grain scale linearly, no dup-saturated artifacts).

    python tools/dns_batch_scale.py [events_multiple ...]

Measures min-of-2 warm sequential (_dns_batch) and concurrent fan-out
(_dns_batch_concurrent) per tier, exactly the bench.py unit, and
prints one JSON line per tier.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from bench import _dns_batch, _dns_batch_concurrent, _loadavg  # noqa: E402
from dnsflow_clickhouse_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def ensure_events(spark, k: int) -> str:
    out = f"/tmp/scale{k}ev"
    path = os.path.join(out, "events.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return out
    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    parts = []
    for i in range(k):
        parts.append(
            ev.select(
                (F.col("event_id").cast("long") + F.lit(i * 10_000_000)).alias(
                    "event_id"
                ),
                (F.col("user_id").cast("long") + F.lit(i * 1_000_000)).alias(
                    "user_id"
                ),
                *[c for c in ev.columns if c not in ("event_id", "user_id")],
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(32).write.mode("overwrite").parquet(path)
    return out


def main() -> None:
    tiers = [int(a) for a in sys.argv[1:]] or [64]
    spark = get_spark(app_name="dns-batch-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for k in tiers:
        sf_dir = SRC if k == 1 else ensure_events(spark, k)
        n_events = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")
        ).count()
        # warm leg, then two timed legs (bench.py protocol)
        _dns_batch(spark, sf_dir)
        seqs, cons = [], []
        for _ in range(2):
            w, _per, _oh = _dns_batch(spark, sf_dir)
            seqs.append(w)
        for _ in range(2):
            cons.append(_dns_batch_concurrent(spark, sf_dir))
        row = {
            "tier": f"{k}x",
            "raw_events_per_window": n_events,
            "dns_batch_wall": round(min(seqs), 2),
            "dns_batch_wall_concurrent": round(min(cons), 2),
            "runs_seq": [round(x, 2) for x in seqs],
            "runs_con": [round(x, 2) for x in cons],
            "vs_300s_envelope": round(300.0 / min(cons), 1),
            "load_1m": _loadavg(),
            "ts": time.strftime("%Y-%m-%d"),
        }
        print(json.dumps(row))


if __name__ == "__main__":
    main()
