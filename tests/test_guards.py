"""Production guards on the exact O(n²) baselines + the TRAIN_CAP /
testdata coupling canary (r6 verdict asks #4 and #7).

The exact kernels (`embedding_near_dups(n_planes=0)` block-pair GEMM,
`cosine_topk`'s broadcast-query GEMM) are correctness baselines whose
compute is quadratic by construction; these tests prove the row-count
guards TRIP above the configured threshold so nobody can point them at
a production-sized corpus by accident, and that the guard stays out of
the way below it.

The canary pins the silent coupling between similarity.TRAIN_CAP and
/root/testdata: the kmeans/PQ DuckDB oracles replay training on the
FULL embeddings table, which is bit-identical to Spark's capped
priority sample only while the cap does not bind. If a future testdata
bump pushes embeddings past TRAIN_CAP, this test fails with the
diagnosis instead of the oracle gate failing family-wide with no
pointer to the cause.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _vec_df(spark, n: int):
    return spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7 + 1).cast("float"),
            (F.col("id") % 5 + 1).cast("float"),
            (F.col("id") % 3 + 1).cast("float"),
        ).alias("embedding"),
    )


def test_embedding_near_dups_exact_guard_trips(spark):
    from dnsflow_clickhouse_spark.operators.dedup import embedding_near_dups

    df = _vec_df(spark, 10)
    with pytest.raises(ValueError, match="n_planes>0"):
        embedding_near_dups(
            df, "vec_id", "embedding", n_planes=0, max_rows=5
        ).collect()
    # below the cap: runs; opt-out: runs
    assert (
        embedding_near_dups(
            df, "vec_id", "embedding", threshold=-1.0, n_planes=0, max_rows=10
        ).count()
        > 0
    )
    assert (
        embedding_near_dups(
            df, "vec_id", "embedding", threshold=-1.0, n_planes=0, max_rows=None
        ).count()
        > 0
    )


def test_embedding_near_dups_lsh_path_not_guarded(spark):
    from dnsflow_clickhouse_spark.operators.dedup import embedding_near_dups

    # the bucketed twin is the scale path — max_rows must not apply
    df = _vec_df(spark, 10)
    embedding_near_dups(
        df, "vec_id", "embedding", threshold=-1.0, n_planes=2, max_rows=1
    ).collect()


def test_cosine_topk_query_guard_trips(spark):
    from dnsflow_clickhouse_spark.operators.similarity import cosine_topk

    df = _vec_df(spark, 10)
    with pytest.raises(ValueError, match="hyperplane_lsh_topk"):
        cosine_topk(
            df, df, "vec_id", "embedding", k=2, max_query_rows=5
        ).collect()
    # at exactly the cap: full result, not truncated
    out = cosine_topk(df, df, "vec_id", "embedding", k=2, max_query_rows=10)
    assert out.select("query_id").distinct().count() == 10


def test_train_cap_canary_testdata_below_cap():
    import pyarrow.parquet as pq

    from dnsflow_clickhouse_spark.operators.similarity import TRAIN_CAP

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/embeddings.parquet"
        if not os.path.exists(path):
            continue
        n = pq.ParquetFile(path).metadata.num_rows
        assert n < TRAIN_CAP, (
            f"{path} has {n} rows >= TRAIN_CAP={TRAIN_CAP}: the training "
            "cap now BINDS, so Spark trains the kmeans/PQ family on the "
            "priority sample while the DuckDB oracles keep training on "
            "the full table — expect oracle hash mismatches family-wide "
            "(see similarity._warn_if_cap_binds). Raise TRAIN_CAP and "
            "re-verify, or shrink the corpus."
        )


def test_load_table_schema_memo_correct_and_mtime_invalidated(spark, tmp_path):
    """The load_table schema memo must (a) return the same schema and
    rows as a fresh inferred read, and (b) drop its entry when the
    parquet path's mtime moves (a rebuilt corpus must re-infer, never
    serve a stale schema). Metadata-only: the scan itself re-reads the
    parquet bytes on every action either way."""
    import shutil
    import time as _time

    from dnsflow_clickhouse_spark.sources import tables as T

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "docs_dir")
    shutil.copytree(f"{src}/documents.parquet", d) if os.path.isdir(
        f"{src}/documents.parquet"
    ) else shutil.copy(f"{src}/documents.parquet", d)

    fresh = spark.read.parquet(d)
    first = T._read_parquet(spark, d)   # populates the memo
    second = T._read_parquet(spark, d)  # served from the memo
    assert first.schema == fresh.schema == second.schema
    assert second.count() == fresh.count()

    # rewrite the path with a DIFFERENT schema + a moved mtime: the
    # memo must re-infer, not serve the old schema (derive the new
    # frame from the ORIGINAL source — overwriting a path while reading
    # from it deletes the input mid-job)
    sub = spark.read.parquet(f"{src}/documents.parquet").select("doc_id")
    if os.path.isdir(d):
        shutil.rmtree(d)
    else:
        os.remove(d)
    sub.write.mode("overwrite").parquet(d)
    now = _time.time() + 5
    os.utime(d, (now, now))  # force a distinct mtime even on fast FS
    again = T._read_parquet(spark, d)
    assert [f.name for f in again.schema.fields] == ["doc_id"]
