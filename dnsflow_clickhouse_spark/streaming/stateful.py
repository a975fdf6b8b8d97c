"""Custom stateful streaming operators (engine extension).

The reference pipeline is stateless — every 5-minute batch is
independent (SURVEY §2.10) — but a training-data ingest needs at least
one stateful primitive: cross-batch deduplication ("emit each key the
first time it is ever seen, forever"). Spark's built-in
``dropDuplicates`` on a stream needs a watermark and forgets state past
it; this operator keeps explicit per-key state via
``applyInPandasWithState`` with optional processing-time timeout for
bounded retention.

Scale notes:
- State is keyed by the dedup hash, so it shards across executors with
  the shuffle on the group key; per-key state is one boolean + count
  (~bytes). 10^9 distinct keys ≈ tens of GB across a 1000-executor
  cluster — RocksDB state store territory, configured via
  ``spark.sql.streaming.stateStore.providerClass``.
- Use a bounded ``timeout_minutes`` when the key space is unbounded;
  expired keys re-admit (the same trade every TTL'd dedup makes).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIRST_SEEN_OUTPUT = T.StructType(
    [
        T.StructField("dup_key", T.StringType()),
        T.StructField("first_id", T.LongType()),
        T.StructField("n_in_batch", T.LongType()),
    ]
)

_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def first_seen(
    keyed: DataFrame,
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Streaming cross-batch dedup: for a stream grouped by ``dup_key``
    (string) with a numeric ``id`` column, emit one row per key the
    FIRST time it appears across the whole stream; later batches with
    the same key emit nothing.

    Input columns: ``dup_key string, id long``. Output:
    FIRST_SEEN_OUTPUT (the winning id = min id of the first batch that
    saw the key, plus that batch's row count for observability).
    """

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n = 0
        first_id = None
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                m = int(pdf["id"].min())
                first_id = m if first_id is None else min(first_id, m)
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists and state.get[0]
        state.update((True,))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        if already or n == 0:
            return
        yield pd.DataFrame(
            {"dup_key": [key[0]], "first_id": [first_id], "n_in_batch": [n]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("dup_key").applyInPandasWithState(
        fn, FIRST_SEEN_OUTPUT, _STATE, "append", timeout
    )
