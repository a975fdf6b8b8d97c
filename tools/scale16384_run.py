"""Round-12 deepest tier: the flagship document family at 16384x sf0.1
— 81.92M documents on one node (docs-only corpus via
`tools/make_scale256.py 16384 --docs-only`), the FOURTH measured octave
of the exact-dedup ladder (1024x -> 4096x -> 8192x -> 16384x) plus the
manifest-skipping probe at 4096 data files. Grouped LSH mining at this
tier runs separately via `tools/lsh_grouped_run.py /tmp/scale16384 4`
(the r12 scratch-bounded executor; peak ~2x its measured 14 GB at
8192x).

    SPARK_DRIVER_MEM=48g python tools/scale16384_run.py [/tmp/scale16384]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from dnsflow_clickhouse_spark.session import get_spark

TIER = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale16384"

spark = get_spark(app_name="scale16384")
spark.sparkContext.setLogLevel("ERROR")

results: dict[str, dict] = {}


def timed(name: str, fn, warm: int = 2):
    walls = []
    val = None
    for _ in range(warm):
        t = time.perf_counter()
        val = fn()
        walls.append(round(time.perf_counter() - t, 2))
    results[name] = {"walls_s": walls, "min_s": min(walls), "value": val}
    print(json.dumps({name: results[name]}), flush=True)


docs = spark.read.parquet(f"{TIER}/documents.parquet")
print(json.dumps({"tier": TIER, "n_docs": docs.count()}), flush=True)

from dnsflow_clickhouse_spark.operators.dedup import exact_dedup

timed(
    "exact_dedup_dup_rows",
    lambda: exact_dedup(docs, ["text"], "doc_id")
    .filter(F.col("is_dup") == 1)
    .count(),
    warm=3,
)

from dnsflow_clickhouse_spark.sources.skipping import (
    build_manifest,
    read_with_skipping,
)

dpath = f"{TIER}/documents.parquet"
timed("build_manifest_rows", lambda: build_manifest(spark, dpath, ["doc_id"]).count(), warm=1)


def _skip_read():
    got = read_with_skipping(spark, dpath, {"doc_id": (0.0, 999_999.0)})
    return {
        "files_kept": len(got.inputFiles()),
        "rows": got.filter(F.col("doc_id") <= 999_999).count(),
    }


timed("read_with_skipping_probe", _skip_read, warm=1)

print(json.dumps({"summary": results}, default=str))
