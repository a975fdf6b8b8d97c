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


# --- per-key streaming admission quota (transformWithState) ----------------

QUOTA_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("admit_rank", T.LongType()),
    ]
)

try:  # Spark >= 4.0 only; import-gated per repo policy
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TRANSFORM_WITH_STATE = True
except ImportError:  # pragma: no cover - present on every supported Spark
    HAS_TRANSFORM_WITH_STATE = False
    StatefulProcessor = object  # type: ignore[assignment,misc]


class _QuotaProcessor(StatefulProcessor):
    """Per-key admission quota over the lifetime of the stream: admit a
    key's rows (smallest id first within each batch, deterministic)
    until ``cap`` have ever been admitted, then drop the rest forever.

    The streaming face of the per-domain crawl quota: state is ONE long
    per key (the admitted count) in a ``ValueState``, sharded by the
    group key across executors — RocksDB-backed at real scale like
    every transformWithState operator. Built on the Spark 4
    ``transformWithStateInPandas`` API (the successor of
    ``applyInPandasWithState`` used by :func:`first_seen`) so the engine
    exercises both custom-state surfaces.
    """

    def __init__(self, cap: int) -> None:
        self.cap = cap

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self.admitted = handle.getValueState("admitted", "n BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        prev = self.admitted.get()
        n = int(prev[0]) if prev else 0
        room = self.cap - n
        if room <= 0:
            # quota already exhausted; nothing to emit, state unchanged
            return
        batch = pd.concat(list(rows), ignore_index=True)
        sel = batch.sort_values("id").head(room)
        if len(sel):
            self.admitted.update((n + len(sel),))
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(sel),
                    "id": sel["id"].to_list(),
                    "admit_rank": list(range(n + 1, n + len(sel) + 1)),
                }
            )

    def close(self) -> None:
        pass


_QUOTA_STATE = T.StructType([T.StructField("n", T.LongType())])


def quota_admit(keyed: DataFrame, cap: int, backend: str = "groupstate") -> DataFrame:
    """Streaming per-key admission quota.

    Input columns: ``key string, id long``. Output: QUOTA_OUTPUT with
    ``admit_rank`` = 1-based lifetime admission index per key; rows past
    the key's lifetime ``cap`` are dropped forever.

    ``backend="groupstate"`` (default) uses ``applyInPandasWithState`` —
    runs everywhere this repo runs. ``backend="tws"`` uses the Spark 4
    ``transformWithStateInPandas`` processor (:class:`_QuotaProcessor`);
    its state server speaks protobuf, so it needs a working
    ``google.protobuf`` on the workers (absent in this sandbox — the
    class itself is exercised only for its pure-pandas logic in tests).
    """
    if backend == "tws":
        if not HAS_TRANSFORM_WITH_STATE:  # pragma: no cover
            raise RuntimeError("transformWithStateInPandas requires Spark >= 4.0")
        return keyed.groupBy("key").transformWithStateInPandas(
            _QuotaProcessor(cap), QUOTA_OUTPUT, "append", "none"
        )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        n = state.get[0] if state.exists else 0
        room = cap - n
        if room <= 0:
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        sel = batch.sort_values("id").head(room)
        if len(sel):
            state.update((n + len(sel),))
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(sel),
                    "id": sel["id"].to_list(),
                    "admit_rank": list(range(n + 1, n + len(sel) + 1)),
                }
            )

    return keyed.groupBy("key").applyInPandasWithState(
        fn, QUOTA_OUTPUT, _QUOTA_STATE, "append", GroupStateTimeout.NoTimeout
    )


# --- gap-based streaming sessionizer (applyInPandasWithState) --------------

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(
    keyed: DataFrame,
    gap_seconds: int,
    idle_timeout_minutes: int = 1,
) -> DataFrame:
    """Custom stateful gap sessionizer: closes a session when the gap
    between consecutive event times exceeds ``gap_seconds``, emitting
    ``(key, session_start, session_end, n_events)`` per CLOSED session
    — the explicit-state twin of the native ``session_window`` path in
    streaming/pipeline.py, for payloads the built-in can't carry (the
    state here is three longs, but any session accumulator slots into
    the state schema).

    Input columns: ``key string, ts long`` (epoch seconds). Sessions
    also close via processing-time timeout (``idle_timeout_minutes``)
    when a key goes quiet, so the final session is not held forever.
    State per key is O(1); the shuffle is the groupBy on the key —
    exactly the distribution the 100 TB run needs (RocksDB state store
    for large key spaces, same note as :func:`first_seen`).
    """

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            if state.exists:
                s, last, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "key": [key[0]],
                        "session_start": [s],
                        "session_end": [last],
                        "n_events": [n],
                    }
                )
            return
        ts = sorted(
            int(t) for pdf in pdfs if len(pdf) for t in pdf["ts"].tolist()
        )
        if not ts:
            return
        if state.exists:
            s, last, n = state.get
        else:
            s = last = n = None  # loop opens the first session
        closed = []
        for t in ts:
            if s is None:
                s, last, n = t, t, 1
            elif t - last > gap_seconds:
                closed.append((s, last, n))
                s, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((s, last, n))
        state.setTimeoutDuration(idle_timeout_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        SESSION_OUTPUT,
        _SESSION_STATE,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
