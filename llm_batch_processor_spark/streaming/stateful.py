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
