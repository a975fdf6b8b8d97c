"""Generate /tmp/scale64: 64x sf0.1 documents+embeddings, light dup mass.

Design: copy 0 is the original; copy k>0 rewrites every token with a
copy-specific suffix (cross-copy Jaccard ~0) EXCEPT the doc_id slice
pmod(doc_id,500)==k which stays verbatim (forms a 2-member cross-copy
cluster with copy 0) -> each copy reproduces the 1x corpus's own
near-dup structure internally (output linear in copies) plus a thin
cross-copy dup mass (~0.2%/copy). Embeddings: same scheme; perturbed
copies get a deterministic directional rotation (sign flips keyed on
(k, dim)) so cosine near-dup pairs stay within-copy.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from dnsflow_clickhouse_spark.session import get_spark
import pyspark.sql.functions as F

spark = get_spark(app_name="gen64"); spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

t = time.time()
parts = []
for k in range(64):
    d = docs.withColumn("__k", F.lit(k))
    if k == 0:
        d = d.select((F.col("doc_id")).alias("doc_id"), "text", "lang", "source", "n_chars")
    else:
        keep = F.pmod(F.col("doc_id"), F.lit(500)) == k
        suff = F.lit(f"_c{k}")
        rew = F.array_join(F.transform(F.split(F.trim("text"), r"\s+"), lambda t_: F.concat(t_, suff)), " ")
        d = d.select(
            (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
            F.when(keep, F.col("text")).otherwise(rew).alias("text"),
            "lang", "source", "n_chars",
        )
    parts.append(d)
out = parts[0]
for p in parts[1:]:
    out = out.unionByName(p)
out.repartition(32).write.mode("overwrite").parquet("/tmp/scale64/documents.parquet")
print("docs done", round(time.time()-t,1))

t = time.time()
eparts = []
for k in range(64):
    if k == 0:
        e = emb.select("vec_id", "embedding", "label")
    else:
        keep = F.pmod(F.col("vec_id"), F.lit(500)) == k
        # deterministic sign-flip rotation: flip dims where (k*7 + i) % 3 == 0
        pert = F.transform(
            F.col("embedding"),
            lambda x, i: F.when(F.pmod(i + F.lit(k * 7), F.lit(3)) == 0, -x).otherwise(x),
        )
        e = emb.select(
            (F.col("vec_id") + F.lit(k * 1_000_000)).alias("vec_id"),
            F.when(keep, F.col("embedding")).otherwise(pert).alias("embedding"),
            "label",
        )
    eparts.append(e)
eout = eparts[0]
for p in eparts[1:]:
    eout = eout.unionByName(p)
eout.repartition(16).write.mode("overwrite").parquet("/tmp/scale64/embeddings.parquet")
print("emb done", round(time.time()-t,1))
print("doc rows:", spark.read.parquet("/tmp/scale64/documents.parquet").count())
print("emb rows:", spark.read.parquet("/tmp/scale64/embeddings.parquet").count())
