"""Opt-in Spark Connect lane (r11 verdict #6): the Connect degradation
paths — ``spark_broadcast`` falling back to closure capture and the
manifest build's gateway-absent local walk — are unit-tested with
monkeypatched stubs elsewhere (the error-type gating). This module runs
them against a REAL ``pyspark.sql.connect`` session when the sandbox
can host one, so the degradations are executed, not simulated.

In this container the lane cannot run: Spark Connect's client needs
``grpcio`` (and a local Connect server needs the grpc jars), and the
probe below finds grpcio absent — the probe result is recorded in
COVERAGE.md alongside the codec probes, re-checked per round. The tests
then skip with the reason named instead of silently passing.
"""

from __future__ import annotations

import pytest


def _connect_session():
    """A local Spark Connect session, or pytest.skip naming why not."""
    pytest.importorskip(
        "grpc",
        reason="grpcio not installed in this sandbox (pip install is "
        "unavailable) — Spark Connect client cannot exist; probe "
        "recorded in COVERAGE.md",
    )
    from pyspark.sql import SparkSession

    try:
        # `local` spawns an in-process Connect server on first use when
        # the distribution ships the connect jars
        return (
            SparkSession.builder.remote("local")
            .appName("connect-lane")
            .getOrCreate()
        )
    except Exception as exc:  # server jars absent, port policy, ...
        pytest.skip(f"no local Spark Connect server available: {exc}")


def test_spark_broadcast_degrades_on_real_connect_session(tmp_path):
    from dnsflow_clickhouse_spark.operators.util import (
        _ClosureBroadcast,
        spark_broadcast,
    )

    spark = _connect_session()
    holder = spark_broadcast(spark, {"k": [1, 2, 3]})
    # a Connect session has no py4j SparkContext: the documented
    # degradation is the closure holder with the same .value shape
    assert isinstance(holder, _ClosureBroadcast)
    assert holder.value == {"k": [1, 2, 3]}


def test_manifest_build_on_real_connect_session(tmp_path):
    from dnsflow_clickhouse_spark.sources.skipping import build_manifest

    spark = _connect_session()
    p = str(tmp_path / "t")
    spark.range(0, 100).toDF("x").coalesce(2).write.parquet(p)
    man = build_manifest(spark, p, ["x"])
    rows = man.collect()
    # gateway-absent local walk must still see both data files
    assert len({r["file"] for r in rows}) == 2
