"""Round-10 operator pins: single-pass winsorized stats (plan + the
lo_pct=0 rank-clamp edge), plus hand-computed ground truths for the
operators added this round. The oracle sweep covers fixture-scale
cross-engine equivalence; these pin SEMANTICS and PLANS.
"""

from __future__ import annotations

import pytest

from puregraphdb_spark.operators.extras import winsorized_stats


def test_winsorized_single_scan_plan(spark):
    """VERDICT r9 item 4: the bounds must come from a conditional
    window aggregate in the same pass, not a filter + broadcast-join
    back (which scanned and window-sorted the fact table twice)."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q136_winsorized_stats"](
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_winsorized_lo_pct_zero_leaves_low_tail_unclipped(spark):
    # ADVICE r9: lo_pct=0 used to produce rank 0 (matches no row),
    # leaving lo_val NULL and clamping everything to the upper bound.
    # Clamped to rank 1, pct=0 selects the group minimum -> the low
    # tail is untouched while the high tail still winsorizes.
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 21)], ["k", "v"])
    r = winsorized_stats(df, "k", "v", lo_pct=0, hi_pct=95).collect()[0]
    assert (r.lo_val, r.hi_val) == (1.0, 19.0)
    assert (r.n_clip_lo, r.n_clip_hi) == (0, 1)
    assert r.win_mean == pytest.approx((190 + 19) / 20)


def test_winsorized_validates_percentiles(spark):
    df = spark.createDataFrame([("g", 1.0)], ["k", "v"])
    with pytest.raises(ValueError):
        winsorized_stats(df, "k", "v", lo_pct=50, hi_pct=50)
    with pytest.raises(ValueError):
        winsorized_stats(df, "k", "v", lo_pct=-1, hi_pct=95)
    with pytest.raises(ValueError):
        winsorized_stats(df, "k", "v", lo_pct=5, hi_pct=101)
