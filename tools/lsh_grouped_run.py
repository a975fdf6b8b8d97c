"""Scratch-bounded LSH mining at the deep tiers (r11 verdict #1).

The one-shot 64x16 mining plan's peak local scratch measured ~29.4 GB
at the 4096x tier and ~doubles per octave — the 8192x tier (40.96M
docs) would crowd the volume, so round 11 deliberately skipped its
mining leg. ``lsh_candidate_pairs_grouped`` mines bands in G sequential
groups (bit-equal pair set, ~1/G peak scratch, G gram passes); this
driver (a) proves bit-equality against the one-shot miner at a tier
where both fit, and (b) runs the grouped mining leg at the deepest
tier inside the volume budget, with peak scratch sampled from the
session's real spark.local.dir children every 2 s.

    python tools/lsh_grouped_run.py TIER_DIR G [--compare]

``--compare`` also runs the ONE-SHOT miner and asserts the pair sets
are bit-equal (count + order-independent xxhash64 pair-set fold).
Production knobs throughout: 64 hashes / 16 bands, xxhash64 gram
hashes, max_bucket_size=100_000 (the scale4096_run.py settings).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from dnsflow_clickhouse_spark.session import get_spark

TIER = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale1024"
G_ARG = sys.argv[2] if len(sys.argv) > 2 else "4"
COMPARE = "--compare" in sys.argv

N_HASHES, N_BANDS, MAX_BUCKET = 64, 16, 100_000

spark = get_spark(app_name="lsh-grouped")
spark.sparkContext.setLogLevel("ERROR")

# -- scratch sampler over the real local dirs + the group parquet ----------
_local = spark.sparkContext.getConf().get("spark.local.dir", "/tmp")
_peak = {"spark_bytes": 0, "timeline": []}


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
    t0 = time.time()
    while True:
        b = sum(
            _du(p)
            for d in _local.split(",")
            for p in glob.glob(os.path.join(d, "blockmgr-*"))
            + glob.glob(os.path.join(d, "spark-*"))
        )
        _peak["spark_bytes"] = max(_peak["spark_bytes"], b)
        _peak["timeline"].append((round(time.time() - t0, 1), b))
        time.sleep(2)


threading.Thread(target=_sample, daemon=True).start()


def pair_fingerprint(df) -> dict:
    """Order-independent fingerprint of a (id_a, id_b) pair set: count
    plus the bit_xor fold of xxhash64 over both ids — equal sets give
    equal folds regardless of partitioning or row order."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("id_a", "id_b")).alias("fold"),
    ).collect()[0]
    return {"n_pairs": int(row["n"]), "fold": int(row["fold"])}


docs = spark.read.parquet(f"{TIER}/documents.parquet")
n_docs = docs.count()

from dnsflow_clickhouse_spark.operators.dedup import (
    choose_n_band_groups,
    lsh_candidate_pairs,
    lsh_candidate_pairs_grouped,
    lsh_hot_bucket_audit,
)

# G='auto' (r12 verdict #3): dial the band-group count from the measured
# scratch model + the scratch volume's live free space; never 1 here —
# this driver exists to exercise the grouped executor.
if G_ARG == "auto":
    import logging
    logging.getLogger(
        "dnsflow_clickhouse_spark.operators.dedup"
    ).setLevel(logging.INFO)
    logging.basicConfig(level=logging.INFO)
    G = max(2, choose_n_band_groups(n_docs, N_HASHES, N_BANDS))
    auto = {"auto_dial": True,
            "free_gb_at_pick": round(
                __import__("os").statvfs("/tmp").f_bavail
                * __import__("os").statvfs("/tmp").f_frsize / 2**30, 1)}
else:
    G = int(G_ARG)
    auto = {"auto_dial": False}
SCRATCH = f"/tmp/lsh_grouped_scratch_{Path(TIER).name}_g{G}"
print(json.dumps({"tier": TIER, "n_docs": n_docs, "g": G, **auto}),
      flush=True)

out: dict = {"tier": TIER, "n_band_groups": G, **auto,
             "knobs": f"{N_HASHES}x{N_BANDS} xxhash64 cap={MAX_BUCKET}"}

# -- grouped mining ---------------------------------------------------------
if os.path.isdir(SCRATCH):
    shutil.rmtree(SCRATCH)
t = time.perf_counter()
grouped = lsh_candidate_pairs_grouped(
    docs, "doc_id", "text", n_hashes=N_HASHES, n_bands=N_BANDS,
    hash_fn=F.xxhash64, max_bucket_size=MAX_BUCKET,
    n_band_groups=G, scratch_dir=SCRATCH,
)
fp_g = pair_fingerprint(grouped)
out["grouped"] = {
    "wall_s": round(time.perf_counter() - t, 1),
    **fp_g,
    "audit": lsh_hot_bucket_audit(grouped),
    "peak_spark_scratch_gb": round(_peak["spark_bytes"] / 2**30, 2),
    "group_parquet_gb": round(_du(SCRATCH) / 2**30, 3),
}
print(json.dumps({"grouped": out["grouped"]}), flush=True)

# -- one-shot comparison (bit-equality proof) -------------------------------
if COMPARE:
    base = _peak["spark_bytes"]
    t = time.perf_counter()
    one = lsh_candidate_pairs(
        docs, "doc_id", "text", n_hashes=N_HASHES, n_bands=N_BANDS,
        hash_fn=F.xxhash64, max_bucket_size=MAX_BUCKET,
    )
    fp_1 = pair_fingerprint(one)
    out["one_shot"] = {
        "wall_s": round(time.perf_counter() - t, 1),
        **fp_1,
        "audit": lsh_hot_bucket_audit(one),
        "peak_spark_scratch_gb": round(_peak["spark_bytes"] / 2**30, 2),
    }
    out["bit_equal"] = fp_g == fp_1
    out["audit_equal"] = out["grouped"]["audit"] == out["one_shot"]["audit"]
    print(json.dumps({"one_shot": out["one_shot"],
                      "bit_equal": out["bit_equal"],
                      "audit_equal": out["audit_equal"]}), flush=True)
    assert out["bit_equal"], "grouped pair set != one-shot pair set"

# per-group scratch sawtooth: max sampled bytes in each ~equal time slice
tl = _peak["timeline"]
if tl:
    out["scratch_timeline_peak_per_minute_gb"] = [
        round(max(b for ts, b in tl if m * 60 <= ts < (m + 1) * 60) / 2**30, 2)
        for m in range(int(tl[-1][0] // 60) + 1)
        if any(m * 60 <= ts < (m + 1) * 60 for ts, _ in tl)
    ]
print(json.dumps({"summary": out}, default=str), flush=True)
