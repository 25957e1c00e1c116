"""Streaming twins for the batch engagement reports (VERDICT r7 item
4): conversion latency (q124) and session bounce rate (q130), wired
over the proven stateful cores the way ``funnel_conversion_windows``
rides ``funnel_stateful``.

Both follow the repo's tracker + read-side-report split:

* a tiny ``applyInPandasWithState`` tracker (or the existing
  ``stateful.sessionize_stateful``) emits one append-mode row per
  COMPLETED unit — a first conversion, a closed session — with
  per-key state of two/three longs;
* a batch-shape REPORT function aggregates the tracker's sink table
  into exactly the batch report's columns, so ``report(sink) ≡
  batch_report(events)`` is a testable equivalence
  (tests/test_stateful_streaming.py proves it availableNow and across
  a two-trigger time split).

Scale: trackers shuffle once on user_id (same exchange as the batch
cores), state is O(1) per user, and the reports run on the
completed-units relation (conversions / sessions), which is orders of
magnitude smaller than the event stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StructField, StructType, TimestampType,
)

from puregraphdb_spark.functions.numeric import decimal_round

#: emitted ONCE per user, at the moment of first conversion
CONVERSION_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("from_ts", TimestampType(), False),
    StructField("to_ts", TimestampType(), False),
    StructField("hours_bucket", LongType(), False),
])

#: per-user conversion state: (first from-event micros or -1, done)
CONVERSION_STATE_SCHEMA = StructType([
    StructField("first_from_us", LongType(), True),
    StructField("converted", LongType(), True),
])

_HOUR_US = 3_600 * 1_000_000


def conversion_stateful(events: DataFrame, from_type: str = "signup",
                        to_type: str = "purchase",
                        user_col: str = "user_id", ts_col: str = "ts",
                        type_col: str = "event_type") -> DataFrame:
    """Streaming first-conversion tracker: per user, anchor on the
    first ``from_type`` event and emit ONE row at the first
    ``to_type`` event at-or-after it — the incremental counterpart of
    ``operators.events.conversion_latency`` (q124).

    Same in-order contract as ``funnel_stateful``: events are
    processed in event-time order within each trigger, so with
    in-order arrival across triggers the emitted rows equal the batch
    anchor/min semantics exactly; a from-event arriving late (after a
    to-event already anchored a conversion in an earlier trigger)
    cannot retract the emission — the append-mode contract.
    """

    def track(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: Any) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        evs: list[tuple[int, str]] = []
        for pdf in pdfs:
            ts_us = (pd.to_datetime(pdf["ts"]).astype("int64") // 1000)
            evs.extend(zip(ts_us, pdf["event_type"]))
        evs.sort()
        if state.exists:
            first_from, converted = state.get
        else:
            first_from, converted = -1, 0
        out: list[tuple[int, int, int]] = []
        for t_us, et in evs:
            if converted:
                break
            if et == from_type and first_from < 0:
                first_from = t_us
            elif (et == to_type and first_from >= 0
                  and t_us >= first_from):
                out.append((user_id, first_from, t_us))
                converted = 1
        state.update((first_from, converted))
        yield pd.DataFrame(
            {
                "user_id": [o[0] for o in out],
                "from_ts": [pd.Timestamp(o[1], unit="us") for o in out],
                "to_ts": [pd.Timestamp(o[2], unit="us") for o in out],
                "hours_bucket": [(o[2] - o[1]) // _HOUR_US for o in out],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.filter(F.col(type_col).isin(from_type, to_type))
        .select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col(type_col).alias("event_type"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType=CONVERSION_SCHEMA,
            stateStructType=CONVERSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def conversion_latency_report(conversions: DataFrame) -> DataFrame:
    """Batch-shape rollup of the tracker's sink: the whole-hour
    time-to-convert histogram with EXACTLY the columns of
    ``operators.events.conversion_latency`` (hours_bucket, n_users),
    so report(sink) ≡ batch report on the same events."""
    return (
        conversions.groupBy("hours_bucket")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def bounce_report(sessions: DataFrame) -> DataFrame:
    """Daily bounce-rate rollup over CLOSED sessions — the read-side
    report for ``stateful.sessionize_stateful``'s sink, with exactly
    the columns of ``operators.events.bounce_rate`` (q130): day,
    n_sessions, n_bounces, bounce_rate. A bounce is a single-event
    session; the day is the session START day, as in batch.

    The streaming caveat is the sessionizer's, not the report's: each
    user's final session stays open (in state) until a later event or
    the query's end, so the report over a live sink lags the batch
    number by the open sessions — tests close them with a sentinel
    event past the gap.
    """
    return (
        sessions.groupBy(
            F.date_trunc("day", "session_start").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("long").alias("n_bounces"),
        )
        .select(
            "day", "n_sessions", "n_bounces",
            decimal_round(
                F.col("n_bounces").cast("double")
                / F.col("n_sessions").cast("double"), 6, grid=10,
            ).alias("bounce_rate"),
        )
    )
