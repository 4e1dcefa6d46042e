"""Custom stateful streaming operator: per-user session accumulator.

Demonstrates the ``applyInPandasWithState`` extension point — the escape
hatch for stateful semantics Spark's built-ins can't express (the
instruction-set analogue of the reference's "arbitrary Ruby per record",
but keyed, checkpointed, and event-time-correct).

Semantics: for each ``user_id``, maintain an open session (start, last
ts, event count, value sum); when the event-time watermark passes
``last_ts + gap`` the session times out and is emitted. This matches the
batch sessionizer (operators/sessionize.py) for completed sessions.

State is per-key and O(1) — a 100 TB stream with 100 M users holds 100 M
small tuples sharded across executors, checkpointed incrementally.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("sess_start", TimestampType()),
        StructField("sess_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

# (start_epoch_us, last_epoch_us, n_events, value_sum)
_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("vsum", DoubleType()),
    ]
)

_US = 1_000_000


def make_session_fn(gap_seconds: int):
    """Build the per-group state function (gap captured by closure)."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "sess_start": [pd.Timestamp(start_us, unit="us")],
                    "sess_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "value_sum": [vsum],
                }
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        # unit-safe epoch micros (pandas may hand us datetime64[ns] or [us])
        ts_us = rows["ts"].values.astype("datetime64[us]").astype("int64")
        vals = rows["value"].fillna(0.0)

        if state.exists:
            start_us, last_us, n, vsum = state.get
        else:
            t0 = int(ts_us[0])
            start_us, last_us, n, vsum = t0, t0, 0, 0.0

        closed = []
        for t, v in zip(ts_us, vals):
            t = int(t)
            if t - last_us > gap_seconds * _US:
                closed.append((start_us, last_us, n, vsum))
                start_us, n, vsum = t, 0, 0.0
            last_us = max(last_us, t)
            n += 1
            vsum += float(v)

        state.update((start_us, last_us, n, vsum))
        # time out when the event-time watermark passes last_ts + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "sess_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "sess_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "value_sum": [c[3] for c in closed],
                }
            )

    return update


def sessionize_stateful(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "30 minutes"
) -> DataFrame:
    """Custom stateful sessionization of a streaming events DataFrame.

    ``events`` needs ``user_id: string``, ``ts: timestamp``,
    ``value: double``. Emits one row per CLOSED session (gap exceeded
    in-stream, or event-time timeout via watermark).
    """
    return (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_seconds),
            outputStructType=SESSION_OUTPUT,
            stateStructType=_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


THROTTLE_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

_THROTTLE_STATE = StructType([StructField("last_emit_us", LongType())])


def make_throttle_fn(interval_seconds: int):
    """Per-key rate limiter: emit an event only if at least
    ``interval_seconds`` passed since the key's LAST EMITTED event.

    True throttling is stateful relative to what was *kept*, not the
    previous arrival — `lag()` windows can't express it (a burst of
    n events inside one interval must emit exactly the first one, and
    the next emission anchors on that first event's time). This is the
    streaming complement of the batch `events_debounce` query, which
    implements the weaker burst-gap semantics windows CAN express.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        user_id, event_type = key
        if state.hasTimedOut:
            # watermark passed last_emit + interval: every future event
            # passes the gate anyway, so the state is dead weight
            state.remove()
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts_us = rows["ts"].values.astype("datetime64[us]").astype("int64")
        last_emit = state.get[0] if state.exists else None

        keep_idx = []
        for i, t in enumerate(ts_us):
            t = int(t)
            if last_emit is None or t - last_emit >= interval_seconds * _US:
                keep_idx.append(i)
                last_emit = t

        if last_emit is not None:
            state.update((last_emit,))
            state.setTimeoutTimestamp(last_emit // 1000 + interval_seconds * 1000)
        if keep_idx:
            kept = rows.iloc[keep_idx]
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(kept),
                    "event_type": [event_type] * len(kept),
                    "ts": kept["ts"].values,
                    "value": kept["value"].values,
                }
            )

    return update


def throttle_stateful(
    events: DataFrame, interval_seconds: int = 5, watermark: str = "30 minutes"
) -> DataFrame:
    """At most one emitted event per (user, type) per interval."""
    return (
        events.select("user_id", "event_type", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            make_throttle_fn(interval_seconds),
            outputStructType=THROTTLE_OUTPUT,
            stateStructType=_THROTTLE_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
