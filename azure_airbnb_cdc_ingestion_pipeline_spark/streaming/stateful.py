"""Custom stateful streaming operators via applyInPandasWithState.

Charter extension: arbitrary per-key state the built-in window aggs can't
express — here a running per-user accumulator (event count, value sum,
last event type/time) that emits the refreshed state every micro-batch.

Scale posture: state lives in the executor state store partitioned by the
grouping key (one shuffle to co-locate a key's events); the pandas hook
sees one key's batch rows at a time, so memory is bounded per key, and a
timeout policy (not needed for this accumulator) would bound total state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

RUNNING_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _running_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_totals(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running (count, sum) emitted as updates each micro-batch.
    Input needs columns (user_id, value)."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _running_fn,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
