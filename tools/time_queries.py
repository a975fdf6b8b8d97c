"""Time a subset of catalog queries in isolation (same harness shape as
bench.py: warmed session, noop sink). Usage:

    python tools/time_queries.py [sf_dir] q1 q2 ...  [--repeat N]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dnsflow_clickhouse_spark.queries import QUERY_REGISTRY
from dnsflow_clickhouse_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    repeat = 1
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    as_json = "--json" in args
    if as_json:
        args.remove("--json")
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark(app_name="dnsflow-time")
    warm = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    warm.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
    warm.limit(32).groupBy("l_returnflag").applyInPandas(
        lambda pdf: pdf[["l_orderkey"]].head(1), schema="l_orderkey long"
    ).write.format("noop").mode("overwrite").save()
    mins: dict[str, float] = {}
    for name in names:
        fn = QUERY_REGISTRY[name][0]
        times = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        # min + the 1-minute load average: this VM has phantom load
        # bursts (SCALE_SMOKE), so a reading without its weather is
        # uninterpretable — read `min` for plan quality
        load = os.getloadavg()[0]
        mins[name] = round(min(times), 3)
        print(
            f"{name}: " + " ".join(f"{t:.2f}s" for t in times)
            + f"  min={min(times):.2f}s load1m={load:.1f}",
            flush=True,
        )
    if as_json:
        # optional machine-readable last line for ad-hoc tooling. NOTE:
        # tools/ab_bench.py does NOT use this — it regex-parses the
        # `name: ... min=X.XXs` TEXT lines above, because the prev-round
        # worktree's copy of this script predates --json; that text
        # format is therefore load-bearing across rounds — do not change
        # it
        import json

        print(json.dumps({"mins": mins, "repeat": repeat}), flush=True)


if __name__ == "__main__":
    main()
