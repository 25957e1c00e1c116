"""Hypertable rollup: hierarchical re-aggregation must equal direct
aggregation at every granularity (cross-checked against the oracled
q20 shape at 1 hour).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from puregraphdb_spark.operators.events import tumbling_window
from puregraphdb_spark.operators.rollup import time_rollup
from puregraphdb_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def test_hourly_level_matches_q20(spark):
    ev = load_table(spark, SF_DIR, "events")
    roll = time_rollup(
        ev, "ts", ["15 minutes", "1 hour"], ["event_type"],
        {"n": ("count", None), "sum_raw": ("sum", "value")},
    )
    hourly = (
        roll.filter(F.col("granularity") == "1 hour")
        .select(
            F.col("bucket").alias("win"), "event_type", "n",
            F.round("sum_raw", 2).alias("sum_val"),
        )
        .orderBy("win", "event_type")
    )
    want = tumbling_window(ev).collect()
    got = hourly.collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_daily_equals_direct(spark):
    ev = load_table(spark, SF_DIR, "events")
    roll = time_rollup(
        ev, "ts", ["1 hour", "1 day"], [],
        {"n": ("count", None), "mx": ("max", "value")},
    )
    daily = {
        r["bucket"]: (r["n"], r["mx"])
        for r in roll.filter(F.col("granularity") == "1 day").collect()
    }
    direct = {
        r["bucket"]: (r["n"], r["mx"])
        for r in ev.groupBy(F.window("ts", "1 day").start.alias("bucket"))
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert daily == direct


def test_non_decomposable_measure_rejected(spark):
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError):
        time_rollup(ev, "ts", ["1 hour"], [], {"a": ("avg", "value")})


def test_incremental_stream_plus_refresh_equals_batch(spark, tmp_path):
    """The continuous-aggregate deployment: stream maintains the finest
    level (availableNow drain over the fixture parquet), coarser levels
    refresh from it — the combined result must equal the one-shot batch
    time_rollup at every granularity."""
    import shutil

    from puregraphdb_spark.operators.rollup import (
        incremental_rollup_stream, refresh_from_finest,
    )
    from puregraphdb_spark.streaming.windows import (
        read_parquet_stream, run_available_now,
    )

    ev = load_table(spark, SF_DIR, "events")
    grans = ["1 hour", "1 day"]
    groups = ["event_type"]
    measures = {"n": ("count", None), "sm": ("sum", "value")}

    # the streaming file source needs a DIRECTORY of arriving files
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", stream_dir / "part-0.parquet")
    # raw schema (nanos ts as long) — the fixture stores TIMESTAMP(NANOS)
    raw_schema = spark.read.parquet(str(stream_dir)).schema
    stream = read_parquet_stream(spark, str(stream_dir), raw_schema)
    # fixture ts arrives as raw nanos in the stream schema path; mirror
    # load_table's conversion so event-time semantics match batch
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    finest_stream = incremental_rollup_stream(
        stream, "ts", grans[0], groups, measures)
    run_available_now(finest_stream, "finest_rollup")
    finest = spark.table("finest_rollup")

    got = refresh_from_finest(finest, grans, groups, measures)
    want = time_rollup(ev, "ts", grans, groups, measures)

    key = ["granularity", "bucket", "event_type"]
    g = {tuple(r[k] for k in key): (r["n"], round(r["sm"], 6))
         for r in got.collect()}
    w = {tuple(r[k] for k in key): (r["n"], round(r["sm"], 6))
         for r in want.collect()}
    assert g == w
