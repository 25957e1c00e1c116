"""Streaming level-shift monitor: the batch run of windowed_means IS
the oracle for the streaming run (exact decimal sums, so equivalence
is exact), plus alert semantics on a planted shift — the online twin
of q159_cusum_changepoint.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from puregraphdb_spark.sources.registry import load_table
from puregraphdb_spark.streaming import windows as sw
from puregraphdb_spark.streaming.levelshift import (
    level_shift_alerts,
    windowed_means,
)
from tests.conftest import SF_DIR


def _norm(rows):
    return sorted(
        (r["window_start"], r["event_type"], r["n"], r["mean_value"])
        for r in rows)


def test_stream_means_match_batch(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "ev_means")
    ev.write.parquet(path)

    want = _norm(windowed_means(ev, window_duration="6 hours").collect())
    stream = sw.read_parquet_stream(spark, path, ev.schema)
    sw.run_available_now(
        windowed_means(stream, window_duration="6 hours"),
        "t_means_stream")
    got = _norm(spark.table("t_means_stream").collect())
    assert got == want and len(got) > 0


def test_stream_means_incremental_across_triggers(spark, tmp_path):
    """Micro-batches split WITHIN windows: the exact decimal partial
    sums must merge to the identical finalized means (bit-equal, not
    approximately — the reason the state is a decimal sum and not a
    running double mean)."""
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "ev_means2")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(path)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(path)

    stream = sw.read_parquet_stream(spark, path, ev.schema,
                                    max_files_per_trigger=1)
    sw.run_available_now(
        windowed_means(stream, window_duration="6 hours"),
        "t_means_stream2")
    want = _norm(windowed_means(ev, window_duration="6 hours").collect())
    assert _norm(spark.table("t_means_stream2").collect()) == want


def test_level_shift_alert_fires_on_planted_shift(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(hours=h), "t", 2.0) for h in range(24)]
    # day 2: level shifts by +3
    rows += [(base + dt.timedelta(days=1, hours=h), "t", 5.0)
             for h in range(24)]
    ev = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double")
    means = windowed_means(ev, window_duration="1 day")
    ref = spark.createDataFrame([("t", 2.0)], "event_type string, ref_mean double")
    alerts = level_shift_alerts(means, ref, min_shift=1.0).collect()
    assert len(alerts) == 1
    a = alerts[0]
    assert a["window_start"] == base + dt.timedelta(days=1)
    assert a["shift"] == 3.0 and a["n"] == 24


def test_level_shift_quiet_on_stable_series(spark):
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(base + dt.timedelta(hours=h), "t", 2.0) for h in range(48)],
        "ts timestamp, event_type string, value double")
    means = windowed_means(ev, window_duration="1 day")
    ref = spark.createDataFrame([("t", 2.0)],
                                "event_type string, ref_mean double")
    assert level_shift_alerts(means, ref, min_shift=0.5).count() == 0


def test_level_shift_threshold_is_inclusive_and_signed(spark):
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(base, "up", 3.0), (base, "down", 1.0), (base, "flat", 2.0)],
        "ts timestamp, event_type string, value double")
    means = windowed_means(ev, window_duration="1 day")
    ref = spark.createDataFrame(
        [("up", 2.0), ("down", 2.0), ("flat", 2.0)],
        "event_type string, ref_mean double")
    out = {r["event_type"]: r["shift"] for r in
           level_shift_alerts(means, ref, min_shift=1.0).collect()}
    # |shift| == min_shift fires (inclusive); sign is preserved
    assert out == {"up": 1.0, "down": -1.0}
