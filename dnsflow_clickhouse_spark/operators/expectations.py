"""Declarative data-quality expectations (engine extension): validate a
frame against a rule list and emit one audit row per rule — the
contract check a production pipeline runs before publishing a table
(the reference pipeline writes reports with no validation pass at all;
SURVEY §3 lists the silent-corruption risks that follow).

Two rule kinds, chosen so the whole report stays cheap at 100 TB:

- ``row`` rules — a boolean predicate per row (not-null, range, set
  membership, regex). ALL row rules fold into ONE map-side-combinable
  aggregate pass: violations are ``sum(predicate violated)`` per rule,
  so adding a rule adds a column to the aggregate, not a scan.
- ``unique`` rules — key uniqueness. Each needs its own distinct
  aggregate; violations = n_rows - n_distinct(key). Run as a separate
  tiny aggregate unioned in (a 100 TB table pays one extra shuffle per
  unique rule — the report says exactly which).

Output contract: (rule, kind, n_rows, n_violations, passed) — passed
is an int flag so the frame stays canonicalizable by the oracle
harness. A gate that wants hard failure filters ``passed = 0`` and
raises; keeping the report a plain DataFrame lets it flow to the same
idempotent sink as every other report (io.write_report_idempotent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_rule(name: str, holds: Column) -> tuple[str, str, Column]:
    """A per-row expectation: ``holds`` must be TRUE for the row to
    pass. NULL predicate results count as violations (a rule that
    cannot be evaluated did not hold)."""
    return (name, "row", holds)


def unique_rule(name: str, *cols: str) -> tuple[str, str, tuple[str, ...]]:
    """A key-uniqueness expectation over ``cols``."""
    return (name, "unique", cols)


def expect_report(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns one row per rule:
    (rule, kind, n_rows, n_violations, passed), ordered by rule name.
    See module docstring for the aggregation shape."""
    row_rules = [(n, c) for (n, k, c) in rules if k == "row"]
    uniq_rules = [(n, cols) for (n, k, cols) in rules if k == "unique"]

    reports: list[DataFrame] = []
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.sum(
                F.when(F.coalesce(holds, F.lit(False)), 0).otherwise(1)
            ).alias(f"__v{i}")
            for i, (_, holds) in enumerate(row_rules)
        ]
        one = df.agg(*aggs)
        entries = F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.lit("row").alias("kind"),
                    F.col(f"__v{i}").alias("n_violations"),
                )
                for i, (name, _) in enumerate(row_rules)
            ]
        )
        reports.append(
            one.select(F.col("__n").alias("n_rows"), F.explode(entries).alias("e"))
            .select(
                F.col("e.rule").alias("rule"),
                F.col("e.kind").alias("kind"),
                "n_rows",
                F.col("e.n_violations").alias("n_violations"),
            )
        )
    for name, cols in uniq_rules:
        reports.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (
                    F.count(F.lit(1))
                    - F.count_distinct(*[F.col(c) for c in cols])
                ).alias("n_violations"),
            ).select(
                F.lit(name).alias("rule"),
                F.lit("unique").alias("kind"),
                "n_rows",
                "n_violations",
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "rule",
        "kind",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    ).orderBy("rule")
