"""Custom stateful streaming operators.

The reference has no true streaming (SURVEY §2.9) — its incremental
story is batch-with-watermark plus the SCD2 store. This module is the
Structured-Streaming expression of that story, the brief's
"applyInPandasWithState for custom stateful operators":

- :func:`running_entity_stats` — per-key running aggregates maintained
  in the state store across micro-batches (the streaming analogue of
  the reference's "touch/extend on every sighting" semantics);
- :func:`stream_into_store` — ``foreachBatch`` → SCD2 ``merge_batch``:
  each micro-batch runs the exact V2–V5 merge the batch path runs, so
  a stream and a sequence of batch loads produce identical store state
  (asserted in tests).

Scale notes: state is partitioned by the grouping key (state-store
shards follow the shuffle); with NoTimeout the state size is bounded by
key cardinality — for unbounded key spaces use a timeout so idle keys
age out. ``foreachBatch`` gives exactly-once table updates when the
sink write is idempotent — ours is: the SCD2 merge is content-hash
keyed, so replaying a batch is a no-op.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
)
# The timestamp lives in state as int64 MICROseconds (Spark timestamp
# precision) — state tuples are serialized through Spark's row
# converters, which reject pandas/numpy datetime scalars; plain ints
# round-trip losslessly. Inside applyInPandasWithState the ts column
# itself may arrive as raw int64 µs rather than Timestamp scalars.
_STATE_SCHEMA = "n bigint, total double, last_ts_us bigint"


def _update_running_stats(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (n, total, last_ts_us) = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        m = pdf["ts"].max()
        batch_max_us = int(m.value) // 1000 if hasattr(m, "value") else int(m)
        if last_ts_us is None or batch_max_us > last_ts_us:
            last_ts_us = batch_max_us
    state.update((int(n), float(total), int(last_ts_us)))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_ts_us, unit="us", tz="UTC")],
        }
    )


def running_entity_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, latest-ts) maintained in the state
    store — ``applyInPandasWithState`` over a stream grouped by key.
    Works on the ``events`` table shape (user_id, ts, value). Emits the
    updated running row for every key seen in the micro-batch
    (outputMode="update")."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_running_stats,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_into_store(
    stream: DataFrame,
    store,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """foreachBatch → SCD2 merge: every micro-batch is one incremental
    load through :func:`...versioned_store.merge_batch` (V2–V5), giving
    stream/batch parity by construction. Returns the started query;
    caller awaits termination (``availableNow`` drains then stops)."""

    def merge(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.load_batch(batch_df)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
