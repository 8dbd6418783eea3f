"""Custom stateful streaming operator via applyInPandasWithState —
the arbitrary-state escape hatch (the analog of the reference's
informer cache + per-key reconcile state,
/root/reference/syncer/controllers/krmsyncer_controller.go:327-375,
generalized beyond latest-value to arbitrary per-key accumulators).

`user_activity_tracker` maintains per-user (n_events, total_value,
last_ts) across micro-batches and emits the updated snapshot for every
user seen in the batch — a running CDC-style profile. State lives in
Spark's state store (checkpointed, partitioned by key); at 100 TB the
operative constraints are keys-per-executor memory and state-store
compaction, both bounded because state is one fixed-width row per key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n_events long, total_value double, last_ts timestamp"


def _track(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_ts = state.get
    else:
        n, total, last_ts = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if last_ts is None or batch_max > last_ts:
            last_ts = batch_max
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [last_ts],
        }
    )


def user_activity_tracker(events: DataFrame) -> DataFrame:
    """Attach the stateful tracker to a (streaming) events frame with
    columns (user_id, ts, value). Emits the post-batch snapshot for
    every user updated in that micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
