"""Streaming data-quality monitor: the batch run of windowed_profile
IS the oracle for the streaming run (same plan, F.window groups both),
plus alert-guardrail unit checks on synthetic degradations.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from puregraphdb_spark.sources.registry import load_table
from puregraphdb_spark.streaming import windows as sw
from puregraphdb_spark.streaming.quality import profile_alerts, windowed_profile
from tests.conftest import SF_DIR

COLS = ["user_id", "event_type", "value"]


def _norm(rows):
    return sorted(
        (r["window_start"], r["col_name"], r["n_rows"], r["n_nulls"],
         r["n_distinct_approx"]) for r in rows)


def test_stream_profile_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "ev_profile")
    ev.write.parquet(path)

    want = _norm(windowed_profile(ev, COLS, window_duration="6 hours")
                 .collect())
    stream = sw.read_parquet_stream(spark, path, ev.schema)
    sw.run_available_now(
        windowed_profile(stream, COLS, window_duration="6 hours"),
        "t_profile_stream")
    got = _norm(spark.table("t_profile_stream").collect())
    assert got == want and len(got) > 0


def test_stream_profile_incremental_across_triggers(spark, tmp_path):
    """Two micro-batches split WITHIN windows: HLL sketches and sums
    must merge incrementally to the same finalized profile."""
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "ev_profile2")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(path)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(path)

    stream = sw.read_parquet_stream(spark, path, ev.schema,
                                    max_files_per_trigger=1)
    sw.run_available_now(
        windowed_profile(stream, COLS, window_duration="6 hours"),
        "t_profile_stream2")
    want = _norm(windowed_profile(ev, COLS, window_duration="6 hours")
                 .collect())
    assert _norm(spark.table("t_profile_stream2").collect()) == want


def test_profile_counts_nulls_exactly(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, "a", base), (2, None, base + dt.timedelta(minutes=5)),
         (None, "b", base + dt.timedelta(hours=2))],
        ["x", "y", "ts"],
    )
    out = {(r["window_start"].hour, r["col_name"]):
           (r["n_rows"], r["n_nulls"])
           for r in windowed_profile(df, ["x", "y"],
                                     window_duration="1 hour").collect()}
    assert out[(0, "x")] == (2, 0)
    assert out[(0, "y")] == (2, 1)
    assert out[(2, "x")] == (1, 1)
    with pytest.raises(ValueError):
        windowed_profile(df, [])


def test_profile_alerts_fire_on_degradation(spark):
    base = dt.datetime(2024, 1, 1)
    good = spark.createDataFrame(
        [(i, f"t{i % 5}", base) for i in range(100)], ["x", "y", "ts"])
    ref = (
        windowed_profile(good, ["x", "y"], window_duration="1 day")
        .select("col_name", "n_rows", "n_nulls", "n_distinct_approx")
    )
    # degraded batch: x 50% null (ref 0%), y collapses to 1 value
    bad = spark.createDataFrame(
        [(None if i % 2 else i, "t0", base + dt.timedelta(days=1))
         for i in range(100)],
        "x long, y string, ts timestamp")
    cur = windowed_profile(bad, ["x", "y"], window_duration="1 day")
    alerts = {r["col_name"]: r for r in
              profile_alerts(cur, ref).collect()}
    assert alerts["x"]["null_alert"] and not alerts["x"]["distinct_alert"]
    assert alerts["y"]["distinct_alert"] and not alerts["y"]["null_alert"]
    # a healthy window raises nothing
    assert profile_alerts(
        windowed_profile(good, ["x", "y"], window_duration="1 day"),
        ref).count() == 0
