"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 extension — no reference counterpart; the reference's only
state is the per-process model cache, ``app.py:30``).

Operator: **per-user running counters** — for every user, maintain
(n_events, sum_value, last_ep) across micro-batches in the state store;
optionally finalize-and-evict after processing-time inactivity. This is
the canonical "custom session aggregate" the windowed built-ins can't
express (the finalize action is user-defined).

Scale shape: state is hash-partitioned by user_id (one shuffle), each
executor holds only its groups' state in the state store; Arrow batches
amortize the Python hop exactly like the batch ``mapInPandas`` ops.

Operational note: with ``timeout_ms`` set, Spark keeps scheduling
empty "state cleanup" micro-batches until every group has timed out —
``processAllAvailable()`` then blocks for at least the timeout; bounded
drains (tests, backfills) should leave it ``None`` and treat the last
``update`` row per key as the running total.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, sum_value double, last_ep long"
OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, last_ep long, final boolean"
)
_COLS = ["user_id", "n_events", "sum_value", "last_ep", "final"]


def _make_update_fn(timeout_ms: int | None):
    def update_user(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if timeout_ms is not None and state.hasTimedOut:
            n, s, last = state.get
            state.remove()
            yield pd.DataFrame([(user_id, n, s, last, True)], columns=_COLS)
            return
        n, s, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            last = max(last, int(pdf["ep"].max()))
        state.update((n, s, last))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame([(user_id, n, s, last, False)], columns=_COLS)

    return update_user


def running_user_counters(
    stream: DataFrame, ts_col: str = "ts", timeout_ms: int | None = None
) -> DataFrame:
    """Streaming: emit updated per-user counters each micro-batch; with
    ``timeout_ms``, emit a ``final=True`` row and evict state after that
    much processing-time inactivity."""
    prepared = stream.select(
        "user_id",
        F.col("value").cast("double").alias("value"),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("ep"),
    )
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=conf,
    )


def batch_user_counters(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Batch twin: the totals the stream converges to once all input is
    processed (oracle-checkable contract for the stateful op)."""
    return df.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("double")).alias("sum_value"),
        F.max(F.unix_timestamp(F.col(ts_col)).cast("long")).alias("last_ep"),
    )
