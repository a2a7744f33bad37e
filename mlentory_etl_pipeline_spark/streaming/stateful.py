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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_cents bigint"
)
_SESSION_STATE = "start_us bigint, last_us bigint, n bigint, total_cents bigint"


def _ts_us_array(values) -> "np.ndarray":
    """Vectorized µs-since-epoch from whatever applyInPandasWithState
    hands us (datetime64 of any unit, or raw int64 µs)."""
    arr = values.to_numpy()
    if arr.dtype.kind == "M":
        return arr.astype("datetime64[us]").astype(np.int64)
    return arr.astype(np.int64)


def _fold_sessions(t_parts, c_parts, prev, gap_us):
    """The shared VECTORIZED session fold behind both stateful APIs
    (GroupState v1 and transformWithState v2 — one implementation, so
    the v1 operator's hard oracle covers the core of both): gap breaks
    via one array diff, per-session counts/totals via
    ``np.add.reduceat`` segment sums. The first version iterated
    events row-at-a-time in Python and built a 1-row DataFrame per
    closed session — measured ~8 s of a 10 s stateful batch at sf0.1;
    per-row Python in the hot path is the same mistake inside a
    stateful operator as it is in a UDF.

    ``prev`` is the stored (start_us, last_us, n, total) tuple or
    None. Returns ``(closed, state)``: ``closed`` as parallel lists
    (starts, lasts, ns, totals) of sessions that closed in-stream, and
    the new state tuple for the still-open last session — or
    ``(None, prev)`` when no events arrived."""
    if not t_parts:
        return None, prev
    t_us = np.concatenate(t_parts)
    cents = np.concatenate(c_parts)
    order = np.argsort(t_us, kind="stable")
    t_us, cents = t_us[order], cents[order]

    brk = np.flatnonzero(t_us[1:] - t_us[:-1] > gap_us)
    seg_start = np.concatenate(([0], brk + 1))
    seg_end = np.append(brk, len(t_us) - 1)
    starts = t_us[seg_start]
    lasts = t_us[seg_end]
    ns = (seg_end - seg_start + 1).astype(np.int64)
    totals = np.add.reduceat(cents, seg_start)

    closed_prev = None
    if prev is not None:
        s0, l0, n0, tot0 = prev
        if t_us[0] - l0 <= gap_us:
            # first new session continues the stored one
            starts[0] = s0
            ns[0] += n0
            totals[0] += tot0
        else:
            closed_prev = (s0, l0, n0, tot0)

    # every session but the last closes in-stream; the last waits in
    # state for the event-time timer
    out_s = list(starts[:-1])
    out_l = list(lasts[:-1])
    out_n = list(ns[:-1])
    out_t = list(totals[:-1])
    if closed_prev is not None:
        out_s.insert(0, closed_prev[0])
        out_l.insert(0, closed_prev[1])
        out_n.insert(0, closed_prev[2])
        out_t.insert(0, closed_prev[3])
    state = (int(starts[-1]), int(lasts[-1]), int(ns[-1]), int(totals[-1]))
    return (out_s, out_l, out_n, out_t), state


def _sessions_df(key, out_s, out_l, out_n, out_t) -> pd.DataFrame:
    # Built from typed numpy arrays, NOT python lists + pd.to_datetime:
    # this constructor runs once per key per micro-batch (the per-key
    # dispatch floor of applyInPandasWithState), and dtype inference +
    # to_datetime made it 450 µs/key; explicit dtypes are 98 µs/key —
    # ~3.5 s off a 5k-key drain. int64 µs .view('datetime64[us]') is
    # exact (no ns conversion), and Arrow serializes either unit.
    n = len(out_s)
    return pd.DataFrame(
        {
            "user_id": np.full(n, key[0], dtype=np.int64),
            "session_start": np.asarray(out_s, dtype=np.int64).view(
                "datetime64[us]"
            ),
            "session_end": np.asarray(out_l, dtype=np.int64).view(
                "datetime64[us]"
            ),
            "n_events": np.asarray(out_n, dtype=np.int64),
            "total_cents": np.asarray(out_t, dtype=np.int64),
        },
        copy=False,
    )


def make_session_update(gap_us: int):
    """Build the per-key update function for
    :func:`sessionize_with_timeout` (gap captured by closure); the
    session fold itself is the shared :func:`_fold_sessions`."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield _sessions_df(key, [start_us], [last_us], [n], [total])
            return

        t_parts, c_parts = [], []
        for pdf in pdfs:
            if len(pdf):
                t_parts.append(_ts_us_array(pdf["ts"]))
                c_parts.append(pdf["_cents"].to_numpy(np.int64))
        prev = tuple(state.get) if state.exists else None
        closed, new_state = _fold_sessions(t_parts, c_parts, prev, gap_us)
        if new_state is None:
            return
        if closed and closed[0]:
            yield _sessions_df(key, *closed)
        state.update(tuple(int(v) for v in new_state))
        # event-time timeout: fire once the watermark passes the gap
        state.setTimeoutTimestamp(int(new_state[1]) // 1000 + gap_us // 1000)

    return update


def sessionize_with_timeout(
    events: DataFrame,
    gap: str = "4 hours",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """CUSTOM stateful sessionization via ``applyInPandasWithState``
    with an EVENT-TIME TIMEOUT — the operator shape the built-in
    ``session_window`` cannot express when a session must emit custom
    per-session output exactly once, on close (here: start/end/count/
    exact integer value total; in production: arbitrary per-session
    features).

    A session CLOSES either when a later event of the same key arrives
    more than ``gap`` after the previous one (detected in-stream) or
    when the watermark passes ``last_event + gap`` (the state-store
    timeout — idle keys emit without waiting for another event, and
    state is removed, which is what bounds the state store to ACTIVE
    sessions only). Value totals fold in integer cents, so the drained
    output is bit-comparable to a batch sessionization (the registry
    query's hard oracle).

    Event-time timeouts fire in the micro-batch AFTER the watermark
    advances past them — a drained ``availableNow`` replay therefore
    appends one far-future sentinel row so every real session's timer
    fires before the drain completes: the engine runs one final
    no-data micro-batch whenever the end-of-batch watermark advanced,
    and that is where the timers go off. The sentinel key's own open
    session stays in state with a never-fired timer (one row —
    callers filter sentinel keys from the OUTPUT, post-drain).

    Do NOT try to filter sentinel rows between the watermark and the
    stateful groupBy: Catalyst pushes a deterministic key filter BELOW
    the EventTimeWatermark node, so the sentinel never reaches the
    watermark tracker and every session whose ``last_event + gap``
    exceeds the real data's max timestamp silently never emits
    (measured: exactly those sessions missing, both test SFs).
    """
    from mlentory_etl_pipeline_spark.streaming.incremental import _event_time

    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
    prepared = (
        _event_time(events, "ts")
        .withColumn("_cents", F.floor(F.col("value") * 100).cast("long"))
        .withWatermark("ts", watermark_delay)
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        make_session_update(gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def make_session_processor(gap_us: int):
    """Build the :class:`StatefulProcessor` for
    :func:`sessionize_tws` — the same per-key session fold as
    :func:`make_session_update`, re-expressed on Spark 4's
    ``transformWithState`` surface: an explicit named ValueState
    replaces the implicit GroupState, and event-time TIMERS are
    first-class (register/delete per key) instead of the single
    ``setTimeoutTimestamp`` slot. Import is deferred so the module
    stays importable on older PySpark."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class SessionProcessor(StatefulProcessor):
        def init(self, handle):
            self.handle = handle
            self.state = handle.getValueState("session", _SESSION_STATE)

        def handleInputRows(self, key, rows, timer_values):
            t_parts, c_parts = [], []
            for pdf in rows:
                if len(pdf):
                    t_parts.append(_ts_us_array(pdf["ts"]))
                    c_parts.append(pdf["_cents"].to_numpy(np.int64))
            prev = tuple(self.state.get()) if self.state.exists() else None
            # the fold is the SAME _fold_sessions the oracle-carrying
            # v1 operator runs — only the state/timer plumbing differs
            closed, new_state = _fold_sessions(t_parts, c_parts, prev, gap_us)
            if new_state is None:
                return
            if closed and closed[0]:
                yield _sessions_df(key, *closed)
            self.state.update(tuple(int(v) for v in new_state))
            # timers accumulate on this API (unlike setTimeoutTimestamp,
            # which replaces): clear the key's previous timer first
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            self.handle.registerTimer(int(new_state[1]) // 1000 + gap_us // 1000)

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            if self.state.exists():
                start_us, last_us, n, total = self.state.get()
                self.state.clear()
                yield _sessions_df(key, [start_us], [last_us], [n], [total])

        def close(self):
            pass

    return SessionProcessor()


def sessionize_tws(
    events: DataFrame,
    gap: str = "4 hours",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """The :func:`sessionize_with_timeout` semantics on Spark 4's
    ``transformWithStateInPandas`` — the successor stateful API
    (SPARK-49564 "state v2"): named state variables (Value/List/Map)
    instead of one tuple slot, first-class per-key timers, and a
    RocksDB-backed state store (the caller must set
    ``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
    provider — transformWithState requires it). Output is
    bit-identical to the v1 operator and carries the same batch-parity
    oracle; the drain recipe (sentinel pair advancing the watermark)
    is unchanged. Runtime dependency: PySpark's transformWithState
    driver worker speaks protobuf to the JVM — ``google.protobuf``
    must be installed (it is absent in the build sandbox, where the
    parity test self-skips; the v1 operator carries the oracle).

    Scale posture: identical to v1 — state holds ACTIVE sessions only
    (closed sessions emit and clear), shuffle is one user-keyed
    exchange per micro-batch; RocksDB additionally spills state to
    local disk, which is what lets 100 TB-scale key cardinalities
    outgrow executor heap without OOM.
    """
    from mlentory_etl_pipeline_spark.streaming.incremental import _event_time

    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
    prepared = (
        _event_time(events, "ts")
        .withColumn("_cents", F.floor(F.col("value") * 100).cast("long"))
        .withWatermark("ts", watermark_delay)
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        make_session_processor(gap_us),
        outputStructType=SESSION_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
