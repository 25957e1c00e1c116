"""Hand-computed ground truths for the round-7 behavioral/mining
operators: markov transitions, session opening paths, basket lift,
inter-order gaps. The oracle tests cover fixture-scale equivalence;
these pin the SEMANTICS on inputs small enough to verify by hand.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from puregraphdb_spark.operators.events import markov_transitions, session_paths
from puregraphdb_spark.operators.extras import cooccur_lift

BASE = datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    # rows: (user_id, event_id, minutes_offset, event_type)
    return spark.createDataFrame(
        [(u, e, BASE + timedelta(minutes=m), t) for u, e, m, t in rows],
        ["user_id", "event_id", "ts", "event_type"],
    )


def test_markov_transitions_hand_computed(spark):
    ev = _events(spark, [
        # user 1: a -> b -> a -> b   (a>b ×2, b>a ×1)
        (1, 1, 0, "a"), (1, 2, 1, "b"), (1, 3, 2, "a"), (1, 4, 3, "b"),
        # user 2: a -> c             (a>c ×1)
        (2, 5, 0, "a"), (2, 6, 1, "c"),
        # user 3: single event -> no transition
        (3, 7, 0, "b"),
    ])
    got = {(r.src, r.dst): (r.n, r.p)
           for r in markov_transitions(ev).collect()}
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "c"): (1, round(1 / 3, 6)),
        ("b", "a"): (1, 1.0),
    }


def test_markov_transitions_timestamp_tie_uses_event_id(spark):
    # two events at the SAME ts: event_id orders them totally
    ev = _events(spark, [
        (1, 10, 0, "x"), (1, 11, 5, "y"), (1, 12, 5, "z"),
    ])
    got = {(r.src, r.dst) for r in markov_transitions(ev).collect()}
    assert got == {("x", "y"), ("y", "z")}


def test_session_paths_hand_computed(spark):
    ev = _events(spark, [
        # user 1, session 1: a,b,c,d -> path a>b>c
        (1, 1, 0, "a"), (1, 2, 1, "b"), (1, 3, 2, "c"), (1, 4, 3, "d"),
        # user 1, session 2 (gap > 30 min): a,b,c -> path a>b>c
        (1, 5, 60, "a"), (1, 6, 61, "b"), (1, 7, 62, "c"),
        # user 2: only 2 events -> no path
        (2, 8, 0, "a"), (2, 9, 1, "b"),
        # user 3: x,y,z -> path x>y>z
        (3, 10, 0, "x"), (3, 11, 29, "y"), (3, 12, 58, "z"),
    ])
    got = {(r.path, r.n_sessions)
           for r in session_paths(ev, gap="30 minutes").collect()}
    assert got == {("a>b>c", 2), ("x>y>z", 1)}


def test_session_paths_gap_boundary_is_strict(spark):
    # exactly 30:00 gap does NOT split (strictly-greater, matching
    # sessionize); 30:00.000001 would
    ev = _events(spark, [
        (1, 1, 0, "a"), (1, 2, 30, "b"), (1, 3, 31, "c"),
    ])
    rows = session_paths(ev, gap="30 minutes").collect()
    assert {(r.path, r.n_sessions) for r in rows} == {("a>b>c", 1)}


def test_cooccur_lift_hand_computed(spark):
    # 4 baskets: {1,2} {1,2} {1,3} {2,3}  (duplicate line for part 1 in
    # basket 1 must NOT double-count)
    li = spark.createDataFrame(
        [(10, 1), (10, 1), (10, 2), (20, 1), (20, 2), (30, 1), (30, 3),
         (40, 2), (40, 3)],
        ["l_orderkey", "l_partkey"],
    )
    tot = li.select("l_orderkey").distinct().agg(
        F.count("*").alias("n_orders"))
    got = {(r.a, r.b): (r.n_ab, r.lift)
           for r in cooccur_lift(li, tot, min_support=1, k=10).collect()}
    # N=4; n_1=3, n_2=3, n_3=2
    assert got == {
        (1, 2): (2, round(2 * 4 / (3 * 3), 6)),
        (1, 3): (1, round(1 * 4 / (3 * 2), 6)),
        (2, 3): (1, round(1 * 4 / (3 * 2), 6)),
    }


def test_cooccur_lift_min_support_filters(spark):
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (20, 1), (20, 2), (30, 1), (30, 3)],
        ["l_orderkey", "l_partkey"],
    )
    tot = li.select("l_orderkey").distinct().agg(
        F.count("*").alias("n_orders"))
    got = cooccur_lift(li, tot, min_support=2, k=10).collect()
    assert [(r.a, r.b, r.n_ab) for r in got] == [(1, 2, 2)]
