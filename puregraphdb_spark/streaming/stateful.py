"""Custom stateful streaming operator: incremental sessionization via
``applyInPandasWithState`` (the sanctioned path for stateful logic
Structured Streaming's built-ins can't express — SURVEY §7.5, driver
brief 'custom stateful operators').

Unlike ``F.session_window`` (which manages session state internally),
this keeps an explicit per-user open-session record and EMITS a row
the moment a session closes (gap exceeded) — the shape you need for
"session ended" triggers, enrichment, or TTL policies. State is one
tiny tuple per user; the shuffle is keyed by user exactly like the
batch sessionize.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType, StructField, StructType, TimestampType,
)

#: emitted once per CLOSED session
SESSION_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_start", TimestampType(), False),
    StructField("session_end", TimestampType(), False),
    StructField("n_events", LongType(), False),
])

#: per-user open-session state: (start_us, last_us, n_events)
STATE_SCHEMA = StructType([
    StructField("start_us", LongType(), True),
    StructField("last_us", LongType(), True),
    StructField("n", LongType(), True),
])


def sessionize_stateful(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Streaming sessionizer emitting closed sessions incrementally.

    ``events`` must be a streaming DataFrame with (user_id, ts). The
    final open session per user stays in state until a later batch
    closes it (or the query ends) — exactly once per session emission.
    """
    gap_us = gap_seconds * 1_000_000

    def close_sessions(key: tuple, pdfs: Iterator[pd.DataFrame],
                       state: Any) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(v.value) // 1000 for v in pd.to_datetime(pdf["ts"]))
        ts_us.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed: list[tuple[int, int, int, int]] = []
        for t in ts_us:
            if last is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                last = t
                n += 1
        if start is not None:
            state.update((start, last, n))
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                "n_events": [c[3] for c in closed],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            close_sessions,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
