"""Generate /tmp/scale256: 256x sf0.1 documents+embeddings — two
octaves past /tmp/scale64, for the deepest tier of the dedup /
signature / CC / ANN family (1.28M docs, 512k vectors).

Same light-dup scheme as tools/make_scale64.py: copy 0 verbatim; copy
k>0 rewrites every token with a copy suffix (cross-copy Jaccard ~0)
except the pmod(doc_id,500)==k slice which stays verbatim — each copy
reproduces the 1x corpus's internal near-dup structure (output linear
in copies) plus a thin cross-copy band. doc_id shift 1M per copy keeps
key ranges disjoint.

Embeddings: copy k>0 flips signs on dims where
(i*(1 + k%19) + k) % 5 == 0 — the k-dependent multiplier gives ~95
distinct flip patterns (vs the 64x builder's 3), so perturbed copies
are NOT pairwise identical and pair-emitting ops aren't handed an
artificial quadratic cross-copy dup mass; the keep slice
pmod(vec_id,500)==k stays verbatim. Top-k ANN queries (the 256x
targets) are output-bounded either way.

Writes are chunked 64 copies per append so no single plan unions 256
branches.

    python tools/make_scale256.py [K]   # default 256 -> /tmp/scale<K>

K=1024 builds the 5.1M-doc / 2M-vector tier (three orders of magnitude
over the 1x bench corpus) with the same scheme; doc_id/vec_id shifts of
1M per copy keep key ranges disjoint up to K ~ 1e6.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F

from dnsflow_clickhouse_spark.session import get_spark

K = int(sys.argv[1]) if len(sys.argv) > 1 else 256
CHUNK = 64
OUT = f"/tmp/scale{K}"
# --docs-only: skip the embeddings replication (the deepest tiers are
# document-family drills; halves the build time and the disk footprint)
DOCS_ONLY = "--docs-only" in sys.argv

spark = get_spark(app_name="gen256")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

t = time.time()
for c0 in range(0, K, CHUNK):
    parts = []
    for k in range(c0, c0 + CHUNK):
        if k == 0:
            d = docs.select("doc_id", "text", "lang", "source", "n_chars")
        else:
            keep = F.pmod(F.col("doc_id"), F.lit(500)) == k % 500
            suff = F.lit(f"_c{k}")
            rew = F.array_join(
                F.transform(
                    F.split(F.trim("text"), r"\s+"), lambda t_: F.concat(t_, suff)
                ),
                " ",
            )
            d = docs.select(
                (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
                F.when(keep, F.col("text")).otherwise(rew).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    mode = "overwrite" if c0 == 0 else "append"
    out.repartition(16).write.mode(mode).parquet(f"{OUT}/documents.parquet")
    print("docs chunk", c0, "done", round(time.time() - t, 1), flush=True)

t = time.time()
for c0 in range(0, K, CHUNK) if not DOCS_ONLY else []:
    parts = []
    for k in range(c0, c0 + CHUNK):
        if k == 0:
            e = emb.select("vec_id", "embedding", "label")
        else:
            keep = F.pmod(F.col("vec_id"), F.lit(500)) == k % 500
            mult = F.lit(1 + k % 19)
            kk = F.lit(k)
            pert = F.transform(
                F.col("embedding"),
                lambda x, i: F.when(
                    F.pmod(i * mult + kk, F.lit(5)) == 0, -x
                ).otherwise(x),
            )
            e = emb.select(
                (F.col("vec_id") + F.lit(k * 1_000_000)).alias("vec_id"),
                F.when(keep, F.col("embedding")).otherwise(pert).alias("embedding"),
                "label",
            )
        parts.append(e)
    eout = parts[0]
    for p in parts[1:]:
        eout = eout.unionByName(p)
    mode = "overwrite" if c0 == 0 else "append"
    eout.repartition(8).write.mode(mode).parquet(f"{OUT}/embeddings.parquet")
    print("emb chunk", c0, "done", round(time.time() - t, 1), flush=True)

print("doc rows:", spark.read.parquet(f"{OUT}/documents.parquet").count())
if not DOCS_ONLY:
    print("emb rows:", spark.read.parquet(f"{OUT}/embeddings.parquet").count())
