"""Hand-computed ground truths for the round-7 session-5 operators:
interval union (true active time), conversion latency, weighted
median, sorted-neighborhood blocking, token diversity. The oracle
tests cover fixture-scale cross-engine equivalence; these pin the
SEMANTICS on inputs small enough to verify by hand.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from puregraphdb_spark.operators.events import (
    conversion_latency,
    interval_union,
)
from puregraphdb_spark.operators.extras import weighted_median
from puregraphdb_spark.operators.pipeline import (
    sorted_neighborhood_pairs,
    token_diversity,
)

BASE = datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    # rows: (user_id, event_id, seconds_offset, event_type)
    return spark.createDataFrame(
        [(u, e, BASE + timedelta(seconds=s), t) for u, e, s, t in rows],
        ["user_id", "event_id", "ts", "event_type"],
    )


def test_interval_union_merges_overlaps(spark):
    ev = _events(spark, [
        # user 1: [0,60) + [30,90) merge; [600,660) is its own island
        (1, 1, 0, "x"), (1, 2, 30, "x"), (1, 3, 600, "x"),
        # user 2: a single event
        (2, 4, 0, "x"),
    ])
    got = {r.user_id: (r.n_islands, r.covered_us)
           for r in interval_union(ev, duration_s=60).collect()}
    assert got == {1: (2, 150_000_000), 2: (1, 60_000_000)}


def test_interval_union_touching_windows_merge(spark):
    # second window starts EXACTLY at the first's end: s > prev_end is
    # false, so touching intervals merge (closed-open tiling)
    ev = _events(spark, [(1, 1, 0, "x"), (1, 2, 60, "x")])
    row = interval_union(ev, duration_s=60).collect()[0]
    assert (row.n_islands, row.covered_us) == (1, 120_000_000)


def test_conversion_latency_anchors_at_first_from(spark):
    ev = _events(spark, [
        # user 1: signup at 0, purchase 90 min later -> bucket 1
        (1, 1, 0, "signup"), (1, 2, 5400, "purchase"),
        # user 2: purchase BEFORE signup is ignored; the one 30 min
        # after the signup counts -> bucket 0
        (2, 3, 0, "purchase"), (2, 4, 600, "signup"),
        (2, 5, 2400, "purchase"),
        # user 3: signup only / user 4: purchase only -> excluded
        (3, 6, 0, "signup"), (4, 7, 0, "purchase"),
    ])
    got = {r.hours_bucket: r.n_users
           for r in conversion_latency(ev).collect()}
    assert got == {0: 1, 1: 1}


def test_weighted_median_upper_variant(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 2.0),
         ("b", 1.0, 3.0), ("b", 10.0, 1.0)],
        ["grp", "val", "w"],
    )
    got = {r.grp: (r.w_median, r.total_weight)
           for r in weighted_median(df, "val", "w", "grp").collect()}
    # group a: cum at 2.0 is 2, 2*2 >= 4 -> 2.0
    # group b: cum at 1.0 is 3, 2*3 >= 4 -> the heavy low value wins
    assert got == {"a": (2.0, 4.0), "b": (1.0, 4.0)}


def test_weighted_median_range_frame_absorbs_ties(spark):
    # both 5.0 rows share the RANGE-frame cumulative (2), so the
    # median is 5.0 regardless of tie order
    df = spark.createDataFrame(
        [("a", 5.0, 1.0), ("a", 5.0, 1.0), ("a", 7.0, 1.0)],
        ["grp", "val", "w"],
    )
    assert weighted_median(df, "val", "w", "grp").collect()[0].w_median == 5.0


def test_sorted_neighborhood_window_and_verify(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aab"), (3, "zzz"), (4, "aac")],
        ["id", "name"],
    )
    pairs = sorted_neighborhood_pairs(
        df, key_col="name", id_col="id", window=2, max_dist=1
    ).collect()
    got = {(r.id1, r.id2): r.dist for r in pairs}
    # sorted order: aaa(1) aab(2) aac(4) zzz(3); window 2 pairs each
    # record with the next two; zzz fails the distance verify
    assert got == {(1, 2): 1, (1, 4): 1, (2, 4): 1}


def test_token_diversity_hand_computed(spark):
    df = spark.createDataFrame(
        [("X", "a b a"), ("X", "b"), ("Y", "c c c")],
        ["source", "text"],
    )
    got = {r.source: (r.n_tokens, r.n_types, r.type_token_ratio,
                      r.simpson_index)
           for r in token_diversity(df).collect()}
    # X: a:2 b:2 -> simpson 1 - 8/16; Y: c:3 -> 1 - 9/9
    assert got == {"X": (4, 2, 0.5, 0.5), "Y": (3, 1, 0.333333, 0.0)}


def test_asof_forward_picks_next_at_or_after(spark):
    from puregraphdb_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [(1, BASE + timedelta(seconds=10)),
         (1, BASE + timedelta(seconds=25)),
         (2, BASE)],
        ["k", "ts"],
    )
    right = spark.createDataFrame(
        [(1, BASE + timedelta(seconds=5), "a"),
         (1, BASE + timedelta(seconds=10), "b"),
         (1, BASE + timedelta(seconds=20), "c")],
        ["k", "ts", "v"],
    )
    fwd = as_of_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     right_cols=["v"], prefix="n_", direction="forward")
    got = {(r.k, r.ts.second): r.n_v for r in fwd.collect()}
    # t=10 matches the same-instant right row; t=25 has nothing after;
    # key 2 has no right rows at all
    assert got == {(1, 10): "b", (1, 25): None, (2, 0): None}
    bwd = as_of_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     right_cols=["v"], prefix="p_")
    got_b = {(r.k, r.ts.second): r.p_v for r in bwd.collect()}
    assert got_b == {(1, 10): "b", (1, 25): "c", (2, 0): None}


def test_asof_rejects_bad_direction(spark):
    import pytest
    from puregraphdb_spark.operators.asof import as_of_join

    df = spark.createDataFrame([(1, BASE)], ["k", "ts"])
    with pytest.raises(ValueError, match="direction"):
        as_of_join(df, df, on="k", left_ts="ts", right_ts="ts",
                   right_cols=["ts"], direction="sideways")


def test_gini_hand_computed(spark):
    from puregraphdb_spark.operators.extras import gini_concentration

    # nine keys spend 1, one key spends 11: gini = 0.45, the top
    # decile (rank 10 of 10) holds 11/20 = 0.55
    rows = [(i, 1.0) for i in range(9)] + [(9, 11.0)]
    df = spark.createDataFrame(rows, ["o_custkey", "o_totalprice"])
    r = gini_concentration(df).collect()[0]
    assert (r.n_keys, r.gini, r.top_decile_share) == (10, 0.45, 0.55)


def test_gini_zero_for_equal_spend(spark):
    from puregraphdb_spark.operators.extras import gini_concentration

    df = spark.createDataFrame(
        [(i, 7.0) for i in range(10)], ["o_custkey", "o_totalprice"]
    )
    r = gini_concentration(df).collect()[0]
    assert (r.gini, r.top_decile_share) == (0.0, 0.1)


def test_hhi_hand_computed(spark):
    from pyspark.sql import functions as F

    from puregraphdb_spark.operators.extras import hhi_concentration

    df = spark.createDataFrame(
        [("X", 1, 2.0), ("X", 2, 2.0), ("Y", 3, 4.0)],
        ["seg", "key", "amt"],
    )
    got = {r.seg: (r.n_keys, r.hhi)
           for r in hhi_concentration(df, "seg", "key", F.col("amt")).collect()}
    assert got == {"X": (2, 0.5), "Y": (1, 1.0)}


def test_bounce_rate_hand_computed(spark):
    from puregraphdb_spark.operators.events import bounce_rate

    ev = _events(spark, [
        # user 1: two events 5 min apart -> one 2-event session
        (1, 1, 0, "x"), (1, 2, 300, "x"),
        # user 2: one event -> bounce, same day
        (2, 3, 0, "x"),
        # user 3: one event next day -> bounce on day 2
        (3, 4, 86400, "x"),
    ])
    got = {r.day.day: (r.n_sessions, r.n_bounces, r.bounce_rate)
           for r in bounce_rate(ev).collect()}
    assert got == {1: (2, 1, 0.5), 2: (1, 1, 1.0)}


def test_approx_quantiles_rank_error_bound(spark):
    """percentile_approx's contract: each reported quantile's EXACT
    rank is within n/accuracy of the target rank."""
    from puregraphdb_spark.operators.extras import approx_quantiles_profile
    from puregraphdb_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem")
    acc = 200
    prof = approx_quantiles_profile(
        li, "l_extendedprice", "l_returnflag",
        ps=(0.25, 0.5, 0.75, 0.95), accuracy=acc,
    ).collect()
    vals = {r.l_returnflag: r for r in prof}
    for flag, r in vals.items():
        grp = li.filter(F.col("l_returnflag") == flag)
        n = r.n
        for p, col in ((0.25, "p25"), (0.5, "p50"),
                       (0.75, "p75"), (0.95, "p95")):
            v = r[col]
            rank = grp.filter(F.col("l_extendedprice") <= v).count()
            assert abs(rank - p * n) <= n / acc + 1, (
                flag, p, rank, p * n, n / acc)


def test_dup_cluster_histogram_mass_conservation(spark):
    from puregraphdb_spark.operators.pipeline import dup_cluster_histogram

    df = spark.createDataFrame(
        [(1, "a b"), (2, "A  b!"), (3, "a b"), (4, "c"), (5, "d")],
        ["doc_id", "text"],
    )
    got = {r.size: (r.n_clusters, r.n_docs, r.n_removable)
           for r in dup_cluster_histogram(df).collect()}
    # docs 1,2,3 normalize identically -> one cluster of 3; two singles
    assert got == {1: (2, 2, 0), 3: (1, 3, 2)}
    assert sum(v[1] for v in got.values()) == 5  # mass conserved


def test_chi_square_hand_computed(spark):
    from puregraphdb_spark.operators.extras import chi_square_contingency

    # 2x2 table: rows A/B x cols L/R with counts [[10, 20], [20, 10]]
    # chi2 = sum (o-e)^2/e with all e = 15 -> 4 * 25/15 = 20/3
    rows = ([("A", "L")] * 10 + [("A", "R")] * 20
            + [("B", "L")] * 20 + [("B", "R")] * 10)
    df = spark.createDataFrame(rows, ["r", "c"])
    out = chi_square_contingency(df, "r", "c").collect()[0]
    assert out.n == 60 and out.dof == 1
    assert out.chi2 == round(20 / 3, 6)
    # V = sqrt(chi2/(n*1)) = sqrt(1/9) = 1/3
    assert out.cramers_v == round((20 / 3 / 60) ** 0.5, 6)


def test_chi_square_independent_table_is_zero(spark):
    from puregraphdb_spark.operators.extras import chi_square_contingency

    rows = ([("A", "L")] * 6 + [("A", "R")] * 12
            + [("B", "L")] * 3 + [("B", "R")] * 6)
    df = spark.createDataFrame(rows, ["r", "c"])
    out = chi_square_contingency(df, "r", "c").collect()[0]
    assert out.chi2 == 0.0 and out.cramers_v == 0.0


def test_degenerate_input_guards(spark):
    import pytest

    from puregraphdb_spark.operators.events import interval_union
    from puregraphdb_spark.operators.extras import chi_square_contingency
    from puregraphdb_spark.operators.sketch import heavy_hitters

    ev = _events(spark, [(1, 1, 0, "x")])
    with pytest.raises(ValueError, match="duration_s"):
        interval_union(ev, duration_s=0)
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(ev, "event_type", k=0)
    # single-category table: V reports 0.0 instead of NaN/div-by-zero
    df = spark.createDataFrame([("A", "L"), ("A", "L"), ("A", "R")],
                               ["r", "c"])
    out = chi_square_contingency(df, "r", "c").collect()[0]
    assert out.dof == 0 and out.cramers_v == 0.0
