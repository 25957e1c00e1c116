"""Custom stateful streaming operator: incremental ordered-funnel
tracking via ``applyInPandasWithState`` — the streaming counterpart of
``operators.events.funnel`` (q87), the way ``stateful.sessionize_stateful``
mirrors the batch sessionizer.

Semantics: for each user, stage i is completed by the FIRST event of
the stage's type with timestamp strictly after the completion of stage
i−1 (the batch funnel's strict-ordering min). The tracker is MONOTONE:
per-user state is just (n_reached, last completion time) — two longs —
and a row (user_id, stage_index, stage, ts) is emitted the moment a
stage transition happens. Events are processed in event-time order
within each batch, so with in-order arrival across batches (or all of
a user's events in one trigger) the emitted rows equal the batch
funnel exactly (tests/test_stateful_streaming.py proves both: the
availableNow run and a two-trigger time-split run). Genuinely
out-of-order arrival across triggers cannot retract an already-emitted
completion — the standard append-mode funnel contract; bound lateness
upstream with a watermark-sorted buffer if revisions matter.

Scale: the input is prefiltered to the stages' event types BEFORE the
user-keyed shuffle (map-side, prunes the scan), state is two longs per
user regardless of event volume, and the Arrow-batched pandas seam is
the sanctioned stateful-custom-operator boundary (SURVEY §7.5) — the
grouping shuffle is keyed by user exactly like the batch funnel's
joins.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

#: emitted once per stage TRANSITION (same contract as events.funnel)
FUNNEL_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("stage_index", LongType(), False),
    StructField("stage", StringType(), False),
    StructField("ts", TimestampType(), False),
])

#: per-user funnel position: (n_reached, last completion micros)
FUNNEL_STATE_SCHEMA = StructType([
    StructField("n_reached", LongType(), True),
    StructField("last_us", LongType(), True),
])


def funnel_stateful(events: DataFrame, stages: list[str],
                    user_col: str = "user_id", ts_col: str = "ts",
                    type_col: str = "event_type",
                    within_seconds: int | None = None) -> DataFrame:
    """Streaming funnel tracker emitting stage completions incrementally.

    ``events`` must be a streaming DataFrame with (user_col, ts_col,
    type_col). Returns the append-mode stream of FUNNEL_SCHEMA rows.
    ``within_seconds`` mirrors the batch funnel's ``within`` window:
    stages past the first must complete within that many seconds of
    the previous completion (events outside the window are skipped,
    not funnel-resetting — same as batch).
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    within_us = None if within_seconds is None else within_seconds * 1_000_000

    def track(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: Any) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        evs: list[tuple[int, str]] = []
        for pdf in pdfs:
            ts_us = (pd.to_datetime(pdf["ts"]).astype("int64") // 1000)
            evs.extend(zip(ts_us, pdf["event_type"]))
        evs.sort()
        if state.exists:
            n_reached, last = state.get
        else:
            n_reached, last = 0, -1
        out: list[tuple[int, int, str, int]] = []
        for t_us, et in evs:
            if n_reached >= len(stages):
                break
            if et == stages[n_reached] and (n_reached == 0 or (
                t_us > last
                and (within_us is None or t_us <= last + within_us)
            )):
                out.append((user_id, n_reached, stages[n_reached], t_us))
                last = t_us
                n_reached += 1
        state.update((n_reached, last))
        yield pd.DataFrame(
            {
                "user_id": [o[0] for o in out],
                "stage_index": [o[1] for o in out],
                "stage": [o[2] for o in out],
                "ts": [pd.Timestamp(o[3], unit="us") for o in out],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.filter(F.col(type_col).isin(stages))
        .select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col(type_col).alias("event_type"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
