"""End-to-end JDBC connectivity (S4/S8 read, K1/K3 write).

The reference's external-system I/O is plain Spark JDBC (MySQL read
Utils.scala:105-117, ClickHouse append ClickUtils.scala:22-33). The
sandbox bundles no MySQL/ClickHouse driver jars, but Spark itself ships
Apache Derby (its Hive-metastore backend), whose embedded driver runs
in-JVM with zero network — so the *actual* JDBC code path (driver
registration, dialect, batched writes, typed reads, predicate pushdown)
is exercised for real, not mocked.
"""

from __future__ import annotations

from dnsflow_clickhouse_spark.sources.dims import read_jdbc, write_jdbc

_URL = "jdbc:derby:memory:jdbctest;create=true"
_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _people(spark):
    return spark.createDataFrame(
        [(1, "alice", 10.5), (2, "bob", 20.0), (3, "carol", 30.25)],
        "id int, name string, score double",
    )


def test_jdbc_write_then_read_roundtrip(spark):
    write_jdbc(_people(spark), _URL, "people_rt", properties=_PROPS)
    back = read_jdbc(spark, _URL, "people_rt", properties=_PROPS)
    assert back.count() == 3
    names = sorted(r[1] for r in back.collect())
    assert names == ["alice", "bob", "carol"]
    cols = {c.lower() for c in back.columns}
    assert cols == {"id", "name", "score"}


def test_jdbc_append_semantics(spark):
    write_jdbc(_people(spark), _URL, "people_app", properties=_PROPS)
    extra = spark.createDataFrame(
        [(4, "dave", 40.0)], "id int, name string, score double"
    )
    write_jdbc(extra, _URL, "people_app", properties=_PROPS)
    back = read_jdbc(spark, _URL, "people_app", properties=_PROPS)
    assert back.count() == 4  # K1/K3 are append-mode sinks


def test_jdbc_read_filter_pushdown(spark):
    write_jdbc(_people(spark), _URL, "people_pd", properties=_PROPS)
    back = read_jdbc(spark, _URL, "people_pd", properties=_PROPS)
    filtered = back.filter(back[2] > 15.0)
    assert filtered.count() == 2
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # the comparison is pushed to the remote scan, not a Spark Filter
    assert "PushedFilters: [" in plan


def test_jdbc_idempotent_write_skips_committed_batch(spark):
    from dnsflow_clickhouse_spark.sources.dims import write_jdbc_idempotent

    got = write_jdbc_idempotent(
        _people(spark), _URL, "people_idem", batch_id=7, properties=_PROPS
    )
    assert got == "written"
    # replay of a COMMITTED batch is a no-op
    assert (
        write_jdbc_idempotent(
            _people(spark), _URL, "people_idem", batch_id=7, properties=_PROPS
        )
        == "skipped"
    )
    back = read_jdbc(spark, _URL, "people_idem", properties=_PROPS)
    assert back.count() == 3
    # a different batch id appends beside it (normal multi-batch append)
    write_jdbc_idempotent(
        _people(spark), _URL, "people_idem", batch_id=8, properties=_PROPS
    )
    assert read_jdbc(spark, _URL, "people_idem", properties=_PROPS).count() == 6


def test_jdbc_idempotent_recovers_kill_between_write_and_mark(spark):
    """r10 verdict #3 drill shape: the process dies AFTER the data
    append but BEFORE the commit mark — the partial batch's rows are on
    the table with no mark; the replay must scrub and rewrite them,
    converging to exactly one copy (the reference's bare append would
    hold six rows here)."""
    import pytest

    from dnsflow_clickhouse_spark.sources.dims import write_jdbc_idempotent

    class _Kill(RuntimeError):
        pass

    def _die():
        raise _Kill("killed between data append and commit mark")

    with pytest.raises(_Kill):
        write_jdbc_idempotent(
            _people(spark),
            _URL,
            "people_crash",
            batch_id=1,
            properties=_PROPS,
            on_before_commit_mark=_die,
        )
    # partial state: data rows landed, batch never marked
    back = read_jdbc(spark, _URL, "people_crash", properties=_PROPS)
    assert back.count() == 3

    got = write_jdbc_idempotent(
        _people(spark), _URL, "people_crash", batch_id=1, properties=_PROPS
    )
    assert got == "written"  # unmarked -> scrub + rewrite, not skip
    back = read_jdbc(spark, _URL, "people_crash", properties=_PROPS)
    assert back.count() == 3, "replay duplicated the crashed batch"
    ids = sorted(r["ID"] if "ID" in r.asDict() else r["id"] for r in back.collect())
    assert ids == [1, 2, 3]

    # and now it IS marked
    assert (
        write_jdbc_idempotent(
            _people(spark), _URL, "people_crash", batch_id=1, properties=_PROPS
        )
        == "skipped"
    )
