"""Build the 16x scale-sweep corpus under /tmp/scale16 (used by
tools/scale_sweep.py). Reproduces the corpus the round-5/6 sweep
artifacts describe — regenerating yields an EQUIVALENT corpus (same
row counts, key layout, dup structure), not a byte-identical one.

Design (why not just 16 verbatim copies):
- dims (region, nation) stay 1x — TPC-H SF semantics;
- every fact table is replicated 16x with ALL integer keys shifted by
  1e7 * copy_index, so each copy reproduces the 1x JOIN STRUCTURE on
  disjoint keys: join fan-outs, self-join pair mass and group counts
  scale linearly with rows — no dup-saturation artifacts;
- documents copy 0 is verbatim; copies r>0 get a per-token `_c{r}`
  suffix (cross-copy Jaccard ~0, so pair-mining output scales with
  rows, not quadratically in copies);
- embeddings copy 0 is verbatim; copies r>0 flip the sign of dims
  where (r*7 + i) % 3 == 0 (cosine near-dups stay within-copy).

    python tools/make_scale16.py [base_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.session import get_spark

SHIFT = 10_000_000
COPIES = 16

_FACT_KEYS = {
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
# nation/region keys referenced by facts stay 1x on copy 0 only if NOT
# shifted — but shifting c_nationkey would break the dim join for
# copies > 0. Per the r5 corpus: nationkeys are NOT shifted (verified:
# every copy joins the 1x dims), so drop them from the shift lists.
_FACT_KEYS["customer"] = ["c_custkey"]
_FACT_KEYS["supplier"] = ["s_suppkey"]


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale16"
    spark = get_spark(app_name="make-scale16")

    for t in ("region", "nation"):
        spark.read.parquet(os.path.join(base, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{t}.parquet"))

    copies = spark.range(COPIES).select(F.col("id").cast("long").alias("r"))

    for t, keys in _FACT_KEYS.items():
        df = spark.read.parquet(os.path.join(base, f"{t}.parquet"))
        rep = df.crossJoin(F.broadcast(copies))
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + F.lit(SHIFT) * F.col("r"))
        rep.drop("r").write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )

    d = spark.read.parquet(os.path.join(base, "documents.parquet"))
    rep = d.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.lit(SHIFT) * F.col("r")).alias("doc_id"),
        F.when(F.col("r") == 0, F.col("text"))
        .otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda tok: F.concat(
                        tok, F.lit("_c"), F.col("r").cast("string")
                    ),
                ),
                " ",
            )
        )
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    rep.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    e = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    rep = e.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") + F.lit(SHIFT) * F.col("r")).alias("vec_id"),
        F.when(F.col("r") == 0, F.col("embedding"))
        .otherwise(
            F.transform(
                F.col("embedding"),
                lambda x, i: F.when(
                    F.pmod(i + F.col("r") * 7, F.lit(3)) == 0, -x
                ).otherwise(x),
            )
        )
        .alias("embedding"),
        "label",
    )
    rep.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
