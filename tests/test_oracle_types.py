"""Guard against cross-engine representation drift in the oracle SQL.

Round-1 incident: DuckDB widens ``SUM(BIGINT)`` to HUGEINT, whose
stringified form differs from Spark's int64 under the driver's
normalization — 10 queries went red with numerically identical values.
Every integer SUM in an oracle must therefore be ``CAST(... AS BIGINT)``.
This test runs every registered oracle through DuckDB (schema only, via
a LIMIT 0 relation over the smallest scale factor) and asserts no output
column is HUGEINT, so the class cannot recur as the catalog grows.
"""

from __future__ import annotations

import os
from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry
from dnsflow_clickhouse_spark.schemas import TESTDATA_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.skipif(not Path(SF_DIR).exists(), reason="testdata missing")
def test_no_hugeint_in_any_oracle(duck):
    oracles = entry.oracle_sql()
    offenders = {}
    for name, sql in oracles.items():
        rel = duck.sql(sql)
        bad = [
            c
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "HUGEINT columns in oracle SQL (wrap the SUM in CAST(... AS "
        f"BIGINT)): {offenders}"
    )


@pytest.mark.skipif(not Path(SF_DIR).exists(), reason="testdata missing")
def test_no_nested_types_in_any_oracle(duck):
    """Round-2 incident: ``quality_feature_matrix`` returned an
    ``array<long>`` column and the driver's canonicalizer (a pandas
    sort over all output columns) died with ``TypeError: unhashable
    type: 'list'`` — a query no harness can check fails the gate even
    when its values are right.  Nested vectors must be serialized to
    deterministic text (``array_join`` / ``array_to_string``) or
    exploded to rows.  Both engines build the same shape, so guarding
    the (cheap, schema-only) DuckDB side covers the class."""
    oracles = entry.oracle_sql()
    offenders = {}
    for name, sql in oracles.items():
        rel = duck.sql(sql)
        bad = [
            c
            for c, t in zip(rel.columns, rel.types)
            if any(k in str(t).upper() for k in ("[]", "STRUCT", "MAP", "JSON", "LIST"))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "nested-typed columns in oracle SQL (serialize with "
        f"array_to_string or explode to rows): {offenders}"
    )


@pytest.mark.skipif(not Path(SF_DIR).exists(), reason="testdata missing")
def test_every_query_has_oracle_or_waiver(duck):
    """Every queries() entry should have an oracle; non-SQL-expressible
    ops must be explicitly listed so the weaker rows-only check is a
    decision, not an accident."""
    qs = entry.queries()
    oracles = entry.oracle_sql()
    waived = set(getattr(entry, "ROWS_ONLY_WAIVERS", ()))
    missing = [n for n in qs if n not in oracles and n not in waived]
    assert not missing, f"queries without oracle or waiver: {missing}"
