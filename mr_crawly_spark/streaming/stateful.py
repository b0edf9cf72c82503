"""Custom stateful streaming operator (task brief: applyInPandasWithState).

``host_crawl_state`` maintains per-host crawl accounting — total fetches,
successes, last logical fetch time, and a politeness-violation counter —
as explicit streaming state that survives across micro-batches. This is the
streaming twin of the engine's frontier bookkeeping: in the batch engine the
state lives in snapshot tables; here it lives in the state store, which is
what a continuously-fed deployment (seed batches arriving forever) uses.

State flows through Arrow batches: one pandas DataFrame per host group per
micro-batch, state tuple pickled by the state store.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HOST_STATE = StructType(
    [
        StructField("n_fetches", LongType()),
        StructField("n_ok", LongType()),
        StructField("last_fetch_at", DoubleType()),
        StructField("politeness_violations", LongType()),
    ]
)

HOST_STATE_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("n_fetches", LongType()),
        StructField("n_ok", LongType()),
        StructField("last_fetch_at", DoubleType()),
        StructField("politeness_violations", LongType()),
    ]
)


def _update_host_state(min_gap: float):
    def update(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_fetches, n_ok, last_at, violations = state.get
        else:
            n_fetches, n_ok, last_at, violations = 0, 0, float("-inf"), 0
        for pdf in batches:
            pdf = pdf.sort_values("fetched_at")
            for t, status in zip(pdf["fetched_at"], pdf["fetch_status"]):
                t = float(t)
                if t - last_at < min_gap:
                    violations += 1
                last_at = t
                n_fetches += 1
                if int(status) == 200:
                    n_ok += 1
        state.update((n_fetches, n_ok, last_at, violations))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "n_fetches": [n_fetches],
                "n_ok": [n_ok],
                "last_fetch_at": [last_at],
                "politeness_violations": [violations],
            }
        )

    return update


def host_crawl_state(fetch_log: DataFrame, min_gap: float = 1.0) -> DataFrame:
    """Streaming df (host string, fetched_at double, fetch_status int) ->
    per-host running state. ``min_gap`` is the politeness floor (seconds of
    logical time between fetches to one host) whose breaches are counted."""
    return fetch_log.groupBy("host").applyInPandasWithState(
        _update_host_state(min_gap),
        outputStructType=HOST_STATE_OUTPUT,
        stateStructType=HOST_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
