"""Cross-batch stateful dedup: a key emitted in batch 1 must NOT be
re-emitted when a later file repeats it; new keys in later batches still
surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.streaming.stateful import first_seen


def _write(p, rows):
    p.write_text("\n".join(f"{k},{i}" for k, i in rows), encoding="utf-8")


def test_first_seen_across_batches(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    _write(inp / "b1.txt", [("a", 3), ("a", 1), ("b", 7)])

    raw = spark.readStream.format("text").load(str(inp))
    keyed = raw.select(
        F.split("value", ",")[0].alias("dup_key"),
        F.split("value", ",")[1].cast("long").alias("id"),
    )
    out = first_seen(keyed)
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            r.dup_key: (r.first_id, r.n_in_batch)
            for r in spark.sql("SELECT * FROM first_seen_sink").collect()
        }
        assert got1 == {"a": (1, 2), "b": (7, 1)}

        # batch 2: 'a' repeats (suppressed), 'c' is new (emitted)
        _write(inp / "b2.txt", [("a", 99), ("c", 5)])
        q.processAllAvailable()
        got2 = {
            r.dup_key: (r.first_id, r.n_in_batch)
            for r in spark.sql("SELECT * FROM first_seen_sink").collect()
        }
        assert got2 == {"a": (1, 2), "b": (7, 1), "c": (5, 1)}
    finally:
        q.stop()
