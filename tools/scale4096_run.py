"""Round-10 deepest tier: the dedup family at 4096x sf0.1
(~20.5M documents / 8M vectors on one node) with the production knobs
engaged — xxhash64 gram hashes, 64-hash/16-band LSH, the round-10
max_bucket_size hot-bucket guard, CC over the mined pairs — plus the
cluster-real manifest build (Hadoop-FS listing) at the same tier,
giving the measured driver-side manifest row count the skipping
docstring cites.

Prints one JSON line per measurement and a final summary; peak local
scratch is sampled from the session's actual spark.local.dir children
every 2s on a daemon thread.

    python tools/scale4096_run.py [/tmp/scale4096]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from dnsflow_clickhouse_spark.session import get_spark

TIER = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale4096"

spark = get_spark(app_name="scale4096")
spark.sparkContext.setLogLevel("ERROR")

# -- scratch sampler over the real local dirs ------------------------------
_local = spark.sparkContext.getConf().get("spark.local.dir", "/tmp")
_peak = {"bytes": 0}


def _du(path: str) -> int:
    total = 0
    for root, _d, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _sample() -> None:
    while True:
        b = sum(
            _du(p)
            for d in _local.split(",")
            for p in glob.glob(os.path.join(d, "blockmgr-*"))
            + glob.glob(os.path.join(d, "spark-*"))
        )
        _peak["bytes"] = max(_peak["bytes"], b)
        time.sleep(2)


threading.Thread(target=_sample, daemon=True).start()

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
emb = spark.read.parquet(f"{TIER}/embeddings.parquet")
n_docs, n_vecs = docs.count(), emb.count()
print(json.dumps({"tier": TIER, "n_docs": n_docs, "n_vectors": n_vecs}), flush=True)

# 1. flagship exact dedup (md5 groupBy) at 20.5M docs
from dnsflow_clickhouse_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_bands_df,
)

timed(
    "exact_dedup_dup_rows",
    lambda: exact_dedup(docs, ["text"], "doc_id")
    .filter(F.col("is_dup") == 1)
    .count(),
)

# 2. production-width signature build: 64 hashes / 16 bands, xxhash64
timed(
    "minhash_bands_64x16_xxhash64",
    lambda: minhash_bands_df(
        docs, "doc_id", "text", n_hashes=64, n_bands=16, hash_fn=F.xxhash64
    ).count(),
    warm=1,
)

# 3. full LSH candidate mining with the round-10 hot-bucket guard engaged
pairs_holder: dict = {}


def _mine():
    raw = lsh_candidate_pairs(
        docs,
        "doc_id",
        "text",
        n_hashes=64,
        n_bands=16,
        hash_fn=F.xxhash64,
        max_bucket_size=100_000,
    )
    p = raw.localCheckpoint(eager=True)
    pairs_holder["df"] = p
    pairs_holder["raw"] = raw  # audit tag lives on the builder's frame
    return p.count()


timed("lsh_pairs_64x16_xxhash64_guarded", _mine, warm=1)

# guard observability (r11): the drop count reads the guard's bucket
# barrier — checkpoint blocks the mining action just materialized, so
# this is a cheap aggregate, and it logs the drop warning if any fired
from dnsflow_clickhouse_spark.operators.dedup import lsh_hot_bucket_audit

audit = lsh_hot_bucket_audit(pairs_holder["raw"])
print(f"hot_bucket_audit: {audit}", flush=True)

# 4. connected components over the mined pairs (the CC single-node
# ceiling the r9 verdict asked to name)
from dnsflow_clickhouse_spark.operators.graph import connected_components


def _cc():
    cc = connected_components(
        pairs_holder["df"], "id_a", "id_b", num_partitions=32
    )
    return cc.select(F.countDistinct("comp")).collect()[0][0]


timed("cc_over_lsh_pairs", _cc, warm=1)

# 5. ANN at 8M vectors: IVF probe path
from dnsflow_clickhouse_spark.queries.catalog_mlops import embedding_ivf_ann

timed("embedding_ivf_ann", lambda: embedding_ivf_ann(spark, TIER).count())

# 6. cluster-real manifest skipping at tier scale: Hadoop-FS listing,
# footer scan, then a pruning read — the measured manifest row count
from dnsflow_clickhouse_spark.sources.skipping import (
    build_manifest,
    read_with_skipping,
)

dpath = f"{TIER}/documents.parquet"


def _manifest():
    m = build_manifest(spark, dpath, ["doc_id", "n_chars"])
    return m.count()


timed("build_manifest_rows", _manifest, warm=1)


def _skip_read():
    got = read_with_skipping(spark, dpath, {"doc_id": (0.0, 999_999.0)})
    return {
        "files_kept": len(got.inputFiles()),
        "rows": got.filter(F.col("doc_id") <= 999_999).count(),
    }


timed("read_with_skipping_probe", _skip_read, warm=1)

results["peak_scratch_gb"] = round(_peak["bytes"] / 2**30, 2)
print(json.dumps({"summary": {k: v for k, v in results.items()}}, default=str))
