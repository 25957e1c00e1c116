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


def test_funnel_randomized_vs_simulation(spark):
    """Batch funnel (bounded and unbounded) vs an independent per-user
    event-replay simulation on random event streams — covers ties,
    out-of-order stage types, windows that exactly touch, and users
    who never start."""
    import random
    from datetime import datetime, timedelta

    from puregraphdb_spark.operators.events import funnel

    stages = ["s0", "s1", "s2"]
    rnd = random.Random(31)
    base = datetime(2026, 1, 1)
    rows = []
    for user in range(25):
        for _ in range(rnd.randint(0, 12)):
            rows.append(
                (
                    user,
                    rnd.choice(stages + ["noise"]),
                    base + timedelta(minutes=rnd.randint(0, 500)),
                )
            )
    if not rows:
        rows = [(0, "s0", base)]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])

    def simulate(within_minutes):
        got = {}
        by_user = {}
        for u, et, ts in rows:
            by_user.setdefault(u, []).append((ts, et))
        for u, evs in by_user.items():
            evs.sort()
            n, last = 0, None
            for ts, et in evs:
                if n >= len(stages):
                    break
                ok = et == stages[n] and (n == 0 or ts > last)
                if ok and within_minutes is not None and n > 0:
                    ok = ts <= last + timedelta(minutes=within_minutes)
                if ok:
                    got[(u, n)] = ts
                    last = ts
                    n += 1
        return got

    for within, arg in ((None, None), (60, "60 minutes")):
        want = simulate(within)
        res = {
            (r["user_id"], r["stage_index"]): r["ts"]
            for r in funnel(ev, stages, within=arg).collect()
        }
        assert res == want, (within, sorted(res.items())[:5])


def test_rolling_actives_hand_computed(spark):
    from puregraphdb_spark.operators.events import rolling_actives

    # u1 active day 1 and day 3; u2 active day 1 only; day 2 has no
    # activity so it must NOT appear as a report day.
    df = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 1)), ("u2", dt.datetime(2024, 1, 1)),
         ("u1", dt.datetime(2024, 1, 3, 12))],
        ["user_id", "ts"],
    )
    out = {r["day"].day: (r["n_active_7d"], r["n_active_1d"])
           for r in rolling_actives(df, window_days=7).collect()}
    assert out == {1: (2, 2), 3: (2, 1)}


def test_rolling_actives_window_1_equals_daily(spark):
    from puregraphdb_spark.operators.events import rolling_actives

    ev = load_table(spark, SF_DIR, "events")
    rows = rolling_actives(ev, window_days=1).collect()
    assert rows and all(r["n_active_7d"] == r["n_active_1d"] for r in rows)


def test_ab_split_is_deterministic_and_partitions_users(spark):
    from puregraphdb_spark.operators.events import ab_split_conversion

    ev = load_table(spark, SF_DIR, "events")
    a = {r["variant"]: r for r in ab_split_conversion(ev).collect()}
    b = {r["variant"]: r for r in ab_split_conversion(ev).collect()}
    assert set(a) == {"A", "B"}
    total = sum(r["n_users"] for r in a.values())
    assert total == ev.select("user_id").distinct().count()
    for v in a:
        assert a[v]["n_users"] == b[v]["n_users"]
        assert a[v]["n_purchasers"] <= a[v]["n_users"]


def test_scd2_intervals_hand_case(spark):
    from puregraphdb_spark.operators.events import scd2_intervals

    rows = [
        ("u1", "a", 0, 1), ("u1", "a", 10, 2), ("u1", "b", 20, 3),
        ("u1", "a", 30, 4), ("u2", "x", 5, 5),
    ]
    df = spark.createDataFrame(
        [(u, s, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t), e)
         for u, s, t, e in rows],
        ["user_id", "event_type", "ts", "event_id"],
    )
    out = sorted(
        ((r["user_id"], r["event_type"], r["valid_from"].second,
          None if r["valid_to"] is None else r["valid_to"].second,
          r["n_events"])
         for r in scd2_intervals(df).collect()),
        key=lambda t: (t[0], t[2]),
    )
    assert out == [
        ("u1", "a", 0, 20, 2),   # run of two a's, closed by b
        ("u1", "b", 20, 30, 1),
        ("u1", "a", 30, None, 1),  # re-entry is a NEW interval
        ("u2", "x", 5, None, 1),
    ]


def test_scd2_intervals_tile_without_overlap(spark):
    from puregraphdb_spark.operators.events import scd2_intervals

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id")
    iv = scd2_intervals(ev)
    # intervals tile: per user, every valid_to equals the next
    # valid_from, exactly one open interval, counts sum to the stream
    from pyspark.sql import Window as W
    nxt = F.lead("valid_from").over(
        W.partitionBy("user_id").orderBy("valid_from"))
    bad = iv.withColumn("__n", nxt).filter(
        (F.col("valid_to").isNotNull() | F.col("__n").isNotNull())
        & (F.col("valid_to") != F.col("__n"))).count()
    assert bad == 0
    assert iv.filter(F.col("valid_to").isNull()).count() == \
        iv.select("user_id").distinct().count()
    assert iv.agg(F.sum("n_events")).collect()[0][0] == ev.count()
