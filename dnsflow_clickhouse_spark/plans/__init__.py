"""Plan-inspection helpers: assert that the physical plan has the shape
we designed for (pushdown reached the scan, dims broadcast, codegen
spans). Used by tests and by the bench notes — at 100 TB the plan shape
IS the performance model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    # real raises (not assert) so the checks survive `python -O`
    plan = physical_plan(df)
    if "PushedFilters" not in plan or fragment not in plan:
        raise AssertionError(
            f"expected pushed filter containing {fragment!r}; plan:\n{plan}"
        )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "Broadcast" not in plan:
        raise AssertionError(f"expected a broadcast join; plan:\n{plan}")


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange NODES: the formatted plan prints each node in
    the tree and again as a '(n) Exchange' detail heading — count the
    headings, which are one-per-node."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange", physical_plan(df), re.M))
