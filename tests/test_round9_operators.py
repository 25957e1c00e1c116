"""Hand-computed ground truths for the round-9 operators: MAD
time-series anomalies, day-of-week seasonality, hourly burst z-tests,
winsorized stats, token-budget mix allocation, class balancing, and
cross-source shingle contamination. The oracle sweep covers
fixture-scale cross-engine equivalence; these pin the SEMANTICS on
inputs small enough to verify by hand.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from puregraphdb_spark.operators.events import (
    anomaly_mad_ts,
    burst_detection,
    seasonal_dow,
)
from puregraphdb_spark.operators.extras import winsorized_stats
from puregraphdb_spark.operators.llm import cross_source_shingles
from puregraphdb_spark.operators.pipeline import (
    class_balance_plan,
    source_mix_budget,
)

BASE = datetime(2024, 1, 1, 0, 0, 0)  # a Monday (isodow 1)


def _ts_events(spark, rows):
    # rows: (days_offset, seconds_within_day, event_type)
    return spark.createDataFrame(
        [(BASE + timedelta(days=d, seconds=s), t) for d, s, t in rows],
        ["ts", "event_type"],
    )


def test_anomaly_mad_flags_the_spike_day(spark):
    # 7 days: counts 2,2,2,2,2,2,16 → median 2, MAD 0... use varied
    # counts so MAD > 0: 1,2,2,2,3,3,30 → med 2, |dev| = 1,0,0,0,1,1,28
    # → MAD 1 → day-6 score 28.
    rows = []
    counts = [1, 2, 2, 2, 3, 3, 30]
    for day, c in enumerate(counts):
        rows += [(day, i, "x") for i in range(c)]
    got = {r.day.day: r for r in
           anomaly_mad_ts(_ts_events(spark, rows)).collect()}
    assert got[7].cnt == 30 and got[7].is_anomaly == 1
    assert got[7].med == 2.0 and got[7].mad == 1.0
    assert got[7].score == 28.0
    assert sum(r.is_anomaly for r in got.values()) == 1


def test_anomaly_mad_zero_mad_yields_null_scores(spark):
    rows = []
    for day in range(3):
        rows += [(day, i, "x") for i in range(5)]  # constant volume
    res = anomaly_mad_ts(_ts_events(spark, rows)).collect()
    assert all(r.score is None and r.is_anomaly == 0 for r in res)


def test_seasonal_dow_index(spark):
    # type "a": 6 on Monday, 1 on Tuesday → index Mon = 7*6/7 = 6.0
    rows = [(0, i, "a") for i in range(6)] + [(1, 0, "a")]
    got = {r.isodow: r for r in
           seasonal_dow(_ts_events(spark, rows)).collect()}
    assert got[1].cnt == 6 and got[1].dow_index == 6.0
    assert got[2].cnt == 1 and got[2].dow_index == 1.0


def test_burst_detection_flags_the_spike_hour(spark):
    # 9 quiet hours of 2 events + 1 hour of 20 → that hour's z is
    # huge; quiet hours are below threshold.
    rows = []
    for h in range(9):
        rows += [(0, h * 3600 + i, "x") for i in range(2)]
    rows += [(0, 9 * 3600 + i, "x") for i in range(20)]
    res = burst_detection(_ts_events(spark, rows)).collect()
    assert len(res) == 1
    assert res[0].cnt == 20 and res[0].z > 2.0


def test_burst_detection_needs_variance(spark):
    rows = [(0, h * 3600, "x") for h in range(5)]  # constant 1/hour
    assert burst_detection(_ts_events(spark, rows)).count() == 0


def test_winsorized_stats_clamps_the_tails(spark):
    # group g: values 1..20 → lo rank ceil(.05*20)=1 → lo=1,
    # hi rank ceil(.95*20)=19 → hi=19; the 20 clamps to 19 →
    # mean = (sum(1..19) + 19)/20 = (190+19)/20 = 10.45
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 21)], ["k", "v"])
    r = winsorized_stats(df, "k", "v").collect()[0]
    assert (r.n, r.lo_val, r.hi_val) == (20, 1.0, 19.0)
    assert r.win_mean == pytest.approx(10.45)
    assert (r.n_clip_lo, r.n_clip_hi) == (0, 1)
    assert r.k == "g"


def test_winsorized_stats_single_value_group(spark):
    df = spark.createDataFrame([("g", 5.0)] * 3, ["k", "v"])
    r = winsorized_stats(df, "k", "v").collect()[0]
    assert (r.lo_val, r.hi_val, r.win_mean) == (5.0, 5.0, 5.0)
    assert (r.n_clip_lo, r.n_clip_hi) == (0, 0)


def test_source_mix_budget_allocates_and_redistributes(spark):
    # sources: a=100 toks, b=20, c=60 → total 180, budget 90, fair 30.
    # alloc1: a=30, b=20, c=30 → leftover 10, caps a=70, c=30 →
    # second round: a += floor(10*70/100)=7, c += floor(10*30/100)=3.
    docs = spark.createDataFrame(
        [("a", "w " * 100), ("b", "w " * 20), ("c", "w " * 60)],
        ["source", "text"],
    )
    got = {r.source: r for r in source_mix_budget(docs).collect()}
    assert got["a"].tokens == 100 and got["a"].alloc_tokens == 37
    assert got["b"].tokens == 20 and got["b"].alloc_tokens == 20
    assert got["c"].tokens == 60 and got["c"].alloc_tokens == 33
    assert got["b"].sample_rate == 1.0
    assert got["a"].sample_rate == 0.37


def test_source_mix_budget_budget_covers_everything(spark):
    # one tiny source: budget 50% of 4 = 2, fair 2, alloc 2 of 4
    docs = spark.createDataFrame([("a", "x y z w")], ["source", "text"])
    r = source_mix_budget(docs).collect()[0]
    assert r.tokens == 4 and r.alloc_tokens == 2 and r.sample_rate == 0.5


def test_class_balance_plan(spark):
    docs = spark.createDataFrame(
        [("en",)] * 6 + [("fr",)] * 2 + [("de",)] * 4, ["lang"])
    got = {r["class"]: r for r in class_balance_plan(docs).collect()}
    assert got["fr"].keep_n == 2 and got["fr"].sample_rate == 1.0
    assert got["en"].cnt == 6 and got["en"].n_excess == 4
    assert got["de"].sample_rate == 0.5


def test_cross_source_shingles_overlap_and_jaccard(spark):
    # source a: "w x y z" → 1 shingle; source b has the same shingle
    # plus one more; source c shares nothing.
    docs = spark.createDataFrame(
        [
            (1, "a", "w x y z"),
            (2, "b", "w x y z q"),
            (3, "c", "p p p p p"),
        ],
        ["doc_id", "source", "text"],
    )
    res = {(r.src_a, r.src_b): r
           for r in cross_source_shingles(docs).collect()}
    ab = res[("a", "b")]
    assert (ab.n_a, ab.n_b, ab.n_shared) == (1, 2, 1)
    assert ab.jaccard == 0.5
    # pairs with zero overlap don't appear (inner join on shingle)
    assert ("a", "c") not in res and ("b", "c") not in res


def test_cross_source_shingles_dedups_within_source(spark):
    # the same shingle twice in one source counts once
    docs = spark.createDataFrame(
        [(1, "a", "w x y z"), (2, "a", "w x y z"), (3, "b", "w x y z")],
        ["doc_id", "source", "text"],
    )
    r = cross_source_shingles(docs).collect()[0]
    assert (r.n_a, r.n_b, r.n_shared) == (1, 1, 1)
    assert r.jaccard == 1.0


def test_q100_cap_above_fixture_degrees_is_bit_identical(spark):
    """VERDICT r7 item 3: the default max_neighborhood cap sits far
    above every fixture degree, so the capped plan must reproduce the
    exact path bit-for-bit at test scale."""
    from puregraphdb_spark.operators.graph import q100_link_prediction

    sf = "/root/testdata/sf0.001"
    capped = sorted(map(tuple, q100_link_prediction(spark, sf).collect()))
    exact = sorted(map(tuple, q100_link_prediction(
        spark, sf, max_neighborhood=None).collect()))
    assert capped == exact


def test_q100_tiny_cap_bounds_the_pair_expansion(spark):
    """With the size gate forced open and cap=1, each customer
    contributes at most one supplier, so no co-supply pair can form —
    the hard O(cap²) bound at work."""
    from puregraphdb_spark.operators.graph import q100_link_prediction

    sf = "/root/testdata/sf0.001"
    assert q100_link_prediction(
        spark, sf, max_neighborhood=1, skew_cap_bytes=0).count() == 0


def test_q100_forced_window_large_cap_still_bit_identical(spark):
    """Window engaged (gate forced) with a cap above every fixture
    degree: the sampled plan must still reproduce the exact result."""
    from puregraphdb_spark.operators.graph import q100_link_prediction

    sf = "/root/testdata/sf0.001"
    capped = sorted(map(tuple, q100_link_prediction(
        spark, sf, max_neighborhood=512, skew_cap_bytes=0).collect()))
    exact = sorted(map(tuple, q100_link_prediction(
        spark, sf, max_neighborhood=None).collect()))
    assert capped == exact


def test_split_contamination_hand_case(spark):
    """Force known splits by choosing doc ids whose multiplicative
    hash lands in train/val: verify leak accounting on a 3-doc corpus
    where one val doc shares its only shingle with train."""
    from puregraphdb_spark.operators.pipeline import (
        _hash_bucket, split_contamination,
    )
    from pyspark.sql import functions as F

    # find concrete ids per split (same expression the operator uses)
    ids = spark.range(0, 200).select(
        F.col("id"), _hash_bucket(F.col("id"), 100).alias("b")).collect()
    train_id = next(r.id for r in ids if r.b < 80)
    val_ids = [r.id for r in ids if 80 <= r.b < 90][:2]
    docs = spark.createDataFrame(
        [
            (train_id, "a b c d"),          # train: shingle "a b c d"
            (val_ids[0], "a b c d e"),      # val: shares "a b c d"
            (val_ids[1], "p q r s"),        # val: clean
        ],
        ["doc_id", "text"],
    )
    r = {row.split: row for row in split_contamination(docs).collect()}
    v = r["val"]
    # val shingles: {"a b c d", "b c d e", "p q r s"} → 1 of 3 leaked
    assert (v.n_shingles, v.n_leaked) == (3, 1)
    assert v.n_docs == 2 and v.n_docs_leaked == 1
    assert v.doc_leak_ratio == 0.5
    assert "test" not in r or r["test"].n_leaked == 0


def test_vocab_growth_monotone_and_exact(spark):
    from puregraphdb_spark.operators.pipeline import vocab_growth

    docs = spark.createDataFrame(
        [(10, "a b"), (50, "b c"), (100, "c d e")],
        ["doc_id", "text"],
    )
    got = {r.pct: r.vocab_size for r in vocab_growth(docs).collect()}
    # thresholds: pct*100/100 → docs ≤10 at 10%, ≤50 at 50%, ≤100 at 100%
    assert got[10] == 2          # {a, b}
    assert got[50] == 3          # + {c}
    assert got[100] == 5         # + {d, e}
    sizes = [got[p] for p in sorted(got)]
    assert sizes == sorted(sizes)  # monotone growth


def test_minhash_staging_survives_optimizer(spark):
    """Round-9 staged-projection pin: the shingle-construction tree
    must appear O(1) times in the OPTIMIZED plan, not once per hash
    component. If a future Spark version's CollapseProject starts
    inlining non-cheap aliases referenced many times, this count
    explodes to ~num_hashes x and the 40x sf1 regression returns
    (SCALECHECK round 9: dedup_minhash_near 543s -> 13.7s)."""
    from puregraphdb_spark.operators.similarity import minhash_signatures

    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    plan = (minhash_signatures(df, num_hashes=64)
            ._jdf.queryExecution().optimizedPlan().toString())
    # staged: 'split(' appears ~3x (inside the one shingles tree);
    # collapsed it would appear ~192x (64 components x 3 uses)
    assert plan.count("split(") <= 8, plan.count("split(")


def test_node2vec_staging_survives_optimizer(spark):
    """Same pin for the node2vec sampler: the d1/d2 set-algebra trees
    must stay staged (each array_intersect once per step, not 3-4x)."""
    from puregraphdb_spark.operators.graph import Graph

    v = spark.createDataFrame([(i,) for i in range(4)], ["id"])
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (1, 0), (2, 1), (3, 2)], ["src", "dst"])
    plan = (Graph(v, e)
            .node2vec_walks(walk_length=2, walks_per_node=1,
                            p=0.5, q=2.0)
            ._jdf.queryExecution().optimizedPlan().toString())
    # 2 steps x 1 intersect each; collapsed would be 2 x 3+ per step
    assert plan.count("array_intersect(") <= 4, (
        plan.count("array_intersect("))


def test_seasonal_burst_adjusts_for_weekday_pattern(spark):
    """A 'spike' that equals the regular Monday level must NOT flag
    when every Monday looks like that, but a genuinely anomalous
    Monday must. Two quiet weekdays + 3 Mondays of 6 + 1 Monday of
    30: only the 30 flags (the flat q140 detector would flag every
    Monday against the global mean)."""
    from puregraphdb_spark.operators.events import (
        burst_detection, seasonal_burst_detection,
    )

    rows = []
    # Mondays (BASE is a Monday): 7 weeks at 6/hour-0, week 8 at 30.
    # With one outlier inflating its own stratum's variance, max z is
    # ~(n-1)/sqrt(n·(n-1)) of the deviation — n=8 gives z≈2.47 > 2,
    # while n=4 caps below 1.5 (why this test needs 8 weeks).
    for wk, c in [(w, 6) for w in range(7)] + [(7, 30)]:
        rows += [(wk * 7, i, "x") for i in range(c)]
    # Tuesdays: constant 2 → stratum variance 0, never flags
    for wk in range(8):
        rows += [(wk * 7 + 1, i, "x") for i in range(2)]
    ev = _ts_events(spark, rows)
    seasonal = seasonal_burst_detection(ev).collect()
    assert len(seasonal) == 1 and seasonal[0].cnt == 30
    assert seasonal[0].isodow == 1
    # the flat detector flags the ordinary Mondays too (global mean
    # is dragged down by the Tuesdays) — the composition's point
    flat = {r.cnt for r in burst_detection(ev).collect()}
    assert 30 in flat


def test_dedup_impact_by_source(spark):
    from puregraphdb_spark.operators.pipeline import dedup_impact_by_source

    docs = spark.createDataFrame(
        [
            ("a", "Hello, World!"),   # normalizes equal to the next
            ("a", "hello world"),
            ("a", "something else"),
            ("b", "unique one"),
        ],
        ["source", "text"],
    )
    got = {r.source: r for r in dedup_impact_by_source(docs).collect()}
    assert (got["a"].n_docs, got["a"].n_unique,
            got["a"].n_removable) == (3, 2, 1)
    assert got["b"].dup_ratio == 0.0
