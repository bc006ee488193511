"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the arbitrary-stateful-processing path the built-in windows
can't express: a per-user running profile (total events, total value,
last-seen timestamp) maintained as GroupState across micro-batches and
emitted on every update. At scale, state lives in the state store
partitioned by the grouping key — the same shuffle boundary as a groupBy.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_profile(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n_events, total_value = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n_events += len(pdf)
        total_value += float(pdf["value"].sum())
    state.update((n_events, total_value))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "total_value": [total_value],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Streaming per-user running profile with explicit GroupState."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
