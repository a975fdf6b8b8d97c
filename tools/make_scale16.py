"""Generate /tmp/scale16: ALL tables at 16x sf0.1, TPC-H-style scaling.

Design (mirrors how TPC-H itself scales with SF):
- region/nation stay 1x (dimension tables are SF-invariant).
- customer/supplier/part/orders/lineitem/events replicate 16x with
  consistent key SHIFTS per copy (custkey, orderkey, partkey, suppkey,
  event_id, user_id), so every copy reproduces the 1x join structure
  with disjoint keys: join fan-outs, self-join pair mass, and group
  counts all scale LINEARLY in copies (no dup-saturated quadratic
  artifacts). FK columns into nation keep their values (dims fixed).
- documents: light-dup token-rewrite scheme (same as /tmp/scale64's
  gen64.py, 16 copies): copy 0 verbatim; copy k>0 rewrites every token
  with a copy suffix except the pmod(doc_id,500)==k slice, so each
  copy reproduces the 1x near-dup structure internally plus a thin
  cross-copy band.
- embeddings: copy k>0 gets keyed sign flips (dims where (k*7+i)%3==0)
  except the pmod(vec_id,500)==k slice; cosine near-dups stay
  within-copy.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from dnsflow_clickhouse_spark.session import get_spark
import pyspark.sql.functions as F

OUT = "/tmp/scale16"
SRC = "/root/testdata/sf0.1"
K = 16

spark = get_spark(app_name="gen16")
spark.sparkContext.setLogLevel("ERROR")

def rep_shift(table, shifts, n_files=16):
    t = time.time()
    df = spark.read.parquet(f"{SRC}/{table}.parquet")
    parts = []
    for k in range(K):
        cols = []
        for c in df.columns:
            if c in shifts:
                cols.append((F.col(c) + F.lit(k * shifts[c])).alias(c))
            else:
                cols.append(F.col(c))
        parts.append(df.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(n_files).write.mode("overwrite").parquet(f"{OUT}/{table}.parquet")
    print(table, "done", round(time.time() - t, 1))

# dims: verbatim 1x
for t in ["region", "nation"]:
    spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
    print(t, "copied 1x")

rep_shift("customer", {"c_custkey": 1_000_000})
rep_shift("supplier", {"s_suppkey": 10_000})
rep_shift("part", {"p_partkey": 1_000_000})
rep_shift("orders", {"o_orderkey": 10_000_000, "o_custkey": 1_000_000})
rep_shift("lineitem", {"l_orderkey": 10_000_000, "l_partkey": 1_000_000, "l_suppkey": 10_000}, n_files=32)
rep_shift("events", {"event_id": 10_000_000, "user_id": 1_000_000})

# documents: light-dup rewrite
t = time.time()
docs = spark.read.parquet(f"{SRC}/documents.parquet")
parts = []
for k in range(K):
    if k == 0:
        parts.append(docs.select("doc_id", "text", "lang", "source", "n_chars"))
    else:
        keep = F.pmod(F.col("doc_id"), F.lit(500)) == k
        suff = F.lit(f"_c{k}")
        rew = F.array_join(F.transform(F.split(F.trim("text"), r"\s+"), lambda tok: F.concat(tok, suff)), " ")
        parts.append(docs.select(
            (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
            F.when(keep, F.col("text")).otherwise(rew).alias("text"),
            "lang", "source", "n_chars"))
out = parts[0]
for p in parts[1:]:
    out = out.unionByName(p)
out.repartition(16).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")
print("documents done", round(time.time() - t, 1))

# embeddings: keyed sign flips
t = time.time()
emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
eparts = []
for k in range(K):
    if k == 0:
        eparts.append(emb.select("vec_id", "embedding", "label"))
    else:
        keep = F.pmod(F.col("vec_id"), F.lit(500)) == k
        pert = F.transform(
            F.col("embedding"),
            lambda x, i: F.when(F.pmod(i + F.lit(k * 7), F.lit(3)) == 0, -x).otherwise(x),
        )
        eparts.append(emb.select(
            (F.col("vec_id") + F.lit(k * 1_000_000)).alias("vec_id"),
            F.when(keep, F.col("embedding")).otherwise(pert).alias("embedding"),
            "label"))
eout = eparts[0]
for p in eparts[1:]:
    eout = eout.unionByName(p)
eout.repartition(16).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")
print("embeddings done", round(time.time() - t, 1))

for t in ["customer", "orders", "lineitem", "events", "documents", "embeddings"]:
    print(t, spark.read.parquet(f"{OUT}/{t}.parquet").count())
