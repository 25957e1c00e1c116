"""Unit-level checks: sessionize gap handling, vector math exactness,
and the nanos-timestamp load path.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from puregraphdb_spark.functions.vector import cosine_similarity, dot, l2_norm
from puregraphdb_spark.operators.events import _gap_seconds, sessionize
from puregraphdb_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s))
         for u, s in rows],
        ["user_id", "ts"],
    )


def test_gap_seconds_parsing():
    assert _gap_seconds("30 minutes") == 1800
    assert _gap_seconds("1 hour") == 3600
    assert _gap_seconds("90 seconds") == 90
    with pytest.raises(ValueError):
        _gap_seconds("banana")


def test_sessionize_breaks_on_gap(spark):
    # user 1: events at 0s, 60s, then 1h later → sessions {2 events},{1}
    df = _events(spark, [(1, 0), (1, 60), (1, 3660), (2, 0)])
    out = {(r["user_id"], r["sid"]): r["n_events"]
           for r in sessionize(df, "30 minutes").collect()}
    assert out == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_sessionize_custom_gap(spark):
    # 45 s apart: one session under "1 hour", two under "30 seconds"
    df = _events(spark, [(1, 0), (1, 45)])
    assert sessionize(df, "1 hour").count() == 1
    assert sessionize(df, "30 seconds").count() == 2


def test_sessionize_boundary_is_strictly_greater(spark):
    # gap exactly == threshold must NOT break (oracle uses strict >)
    df = _events(spark, [(1, 0), (1, 1800)])
    assert sessionize(df, "30 minutes").count() == 1


def test_events_ts_is_timestamp(spark):
    ev = load_table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"].startswith("timestamp")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert lo.year == 2024 and hi.year == 2024


def test_vector_math_exact(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
         ([1.0, 2.0, 2.0], [1.0, 2.0, 2.0]),
         ([3.0, 4.0, 0.0], [4.0, 3.0, 0.0])],
        ["a", "b"],
    )
    rows = df.select(
        dot("a", "b").alias("d"),
        l2_norm("a").alias("na"),
        cosine_similarity("a", "b").alias("cos"),
    ).collect()
    assert rows[0]["d"] == 0.0 and rows[0]["cos"] == 0.0
    assert rows[1]["na"] == 3.0 and rows[1]["cos"] == pytest.approx(1.0)
    assert rows[2]["cos"] == pytest.approx(24.0 / 25.0)
    assert math.isclose(rows[2]["na"], 5.0)
