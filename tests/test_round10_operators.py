"""Round-10 operator pins: single-pass winsorized stats (plan + the
lo_pct=0 rank-clamp edge), plus hand-computed ground truths for the
operators added this round. The oracle sweep covers fixture-scale
cross-engine equivalence; these pin SEMANTICS and PLANS.
"""

from __future__ import annotations

import pytest

from puregraphdb_spark.operators.extras import winsorized_stats


def test_winsorized_single_scan_plan(spark):
    """VERDICT r9 item 4 + r10 item 2: the measured-small path is ONE
    scan, ONE aggregation — and neither path may contain a Window op
    (the 3-key window sort serialized the table through 3 tasks)."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q136_winsorized_stats"](
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "Window" not in plan, plan


def test_winsorized_bracket_plan_no_window(spark):
    """Past the size gate: two scans (sketch bracket + band pass), the
    3-row brackets broadcast, and STILL no per-group sort window.

    Reads the parquet directly rather than via load_table: the
    load_table memo can carry a repartition exchange (latency-mode
    width) from an earlier Engine test in the same session, which
    ReusedExchange then legitimately collapses to ONE scan — a better
    plan, but not the shape this test pins (found as an order-
    dependent failure in the r11 full-suite run)."""
    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .select("l_returnflag", "l_extendedprice")
    df = winsorized_stats(l, "l_returnflag", "l_extendedprice",
                          n_estimate=10_000)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 2, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan


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


# ---------------------------------------------------------------- q145
from puregraphdb_spark.operators.pipeline import (  # noqa: E402
    repeated_substring_spans,
    substring_dedup_report,
)


def _docs(spark, rows):
    # rows: (doc_id, source, text)
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_substring_spans_single_shared_window(spark):
    # "c d e" (k=3) is the only cross-doc repeat; in doc 1 it starts
    # at token position 3 and covers exactly 3 tokens.
    d = _docs(spark, [
        (1, "s", "a b c d e f g h"),
        (2, "s", "x y c d e z w q"),
    ])
    spans = {r.doc_id: r for r in
             repeated_substring_spans(d, k=3).collect()}
    assert spans[1].span_start == 3 and spans[1].span_tokens == 3
    assert spans[1].n_windows == 1
    assert spans[2].span_start == 3 and spans[2].span_tokens == 3


def test_substring_spans_merge_consecutive_windows(spark):
    # identical docs: every window duplicates; consecutive positions
    # merge into ONE span covering the whole doc (5 tokens, 3 windows)
    d = _docs(spark, [
        (1, "s", "v w x y z"),
        (2, "s", "v w x y z"),
    ])
    spans = repeated_substring_spans(d, k=3).collect()
    assert len(spans) == 2
    for r in spans:
        assert (r.span_start, r.span_tokens, r.n_windows) == (1, 5, 3)


def test_substring_spans_gap_exactly_k_merges(spark):
    # dup windows at positions 1 and 4 with k=3: coverage [1,3] and
    # [4,6] touch -> one merged span of 6 tokens; a gap > k splits.
    d = _docs(spark, [
        (1, "s", "a b c d e f"),
        (2, "s", "a b c q q q q d e f"),
    ])
    spans = {r.doc_id: r for r in
             repeated_substring_spans(d, k=3).collect()}
    assert (spans[1].span_start, spans[1].span_tokens) == (1, 6)
    # doc 2: dup windows at pos 1 ("a b c") and pos 8 ("d e f"),
    # gap 7 > 3 -> two separate 3-token spans
    two = [r for r in repeated_substring_spans(d, k=3).collect()
           if r.doc_id == 2]
    assert sorted((r.span_start, r.span_tokens) for r in two) == [
        (1, 3), (8, 3)]


def test_substring_spans_intra_doc_repeat_not_counted(spark):
    # the same 3-gram twice WITHIN one doc is q81's business, not a
    # cross-doc repeat -> no spans
    d = _docs(spark, [
        (1, "s", "a b c x a b c"),
        (2, "s", "p q r s t u v"),
    ])
    assert repeated_substring_spans(d, k=3).count() == 0


def test_substring_report_rolls_up_and_counts_union_tokens(spark):
    d = _docs(spark, [
        (1, "sA", "a b c d e f"),      # span covers all 6 tokens
        (2, "sA", "a b c q q q q d e f"),  # two 3-token spans
        (3, "sB", "m n o p q r"),      # no repeats
    ])
    rep = {r.source: r for r in
           substring_dedup_report(d, k=3).collect()}
    a, b = rep["sA"], rep["sB"]
    assert (a.n_docs, a.total_tokens) == (2, 16)
    assert (a.n_docs_with_repeat, a.n_spans) == (2, 3)
    assert a.dup_tokens == 6 + 6 and a.max_span_tokens == 6
    assert a.dup_token_ratio == pytest.approx(12 / 16)
    assert (b.n_docs_with_repeat, b.n_spans, b.dup_tokens,
            b.max_span_tokens, b.dup_token_ratio) == (0, 0, 0, 0, 0.0)
