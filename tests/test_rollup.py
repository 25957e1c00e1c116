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
