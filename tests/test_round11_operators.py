"""Round-11 operator pins: winsorized-stats dual-path equivalence
(the sort-free rewrite, VERDICT r10 item 2). The oracle sweep covers
fixture-scale cross-engine equivalence; these pin that the
sketch-bracketed path is EXACTLY the collect path on adversarial
shapes (ties, bound-straddling duplicates, sub-floor groups).
"""

from __future__ import annotations

import random

from puregraphdb_spark.operators.extras import winsorized_stats


def _rows():
    rng = random.Random(411)
    rows = []
    # g_big: 5000 rows > small_floor(=accuracy=1000) so the bracket
    # path runs its REAL band machinery, with heavy ties (200 distinct
    # values) so order statistics land inside tie runs.
    rows += [("g_big", float(rng.randrange(200))) for _ in range(5000)]
    # g_dup: every value identical — bounds, clips, and mean collapse.
    rows += [("g_dup", 7.25)] * 1500
    # g_small / g_one / g_two: below the small floor, the bracket
    # path's degenerate whole-group bands must still be exact.
    rows += [("g_small", float(v)) for v in range(1, 43)]
    rows += [("g_one", 3.5)]
    rows += [("g_two", 1.0), ("g_two", 2.0)]
    return rows


def test_winsorized_paths_equal(spark):
    df = spark.createDataFrame(_rows(), ["k", "v"])
    for lo, hi in [(5, 95), (0, 90), (25, 75), (0, 100)]:
        a = sorted(
            tuple(r) for r in
            winsorized_stats(df, "k", "v", lo, hi).collect())
        b = sorted(
            tuple(r) for r in
            winsorized_stats(df, "k", "v", lo, hi,
                             n_estimate=10_000).collect())
        assert a == b, (lo, hi, a, b)


def test_winsorized_bracket_autoscales_accuracy(spark):
    # a huge n_estimate must raise accuracy so bands stay bounded —
    # and the result must still be exact on the actual (small) data,
    # where every group then falls under the raised small floor.
    df = spark.createDataFrame(_rows(), ["k", "v"])
    a = sorted(tuple(r) for r in winsorized_stats(df, "k", "v").collect())
    b = sorted(
        tuple(r) for r in
        winsorized_stats(df, "k", "v", n_estimate=10**9).collect())
    assert a == b
