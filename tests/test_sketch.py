"""Misra-Gries heavy-hitters sketch: the rows-only correctness
contract. No SQL oracle by design (estimates depend on partition
layout), so these pin the guarantees instead:

1. bounds bracket the exact counts on every tested partition layout;
2. every TRUE heavy hitter (count > the sketch's global error mass)
   is present in the output;
3. with capacity ≥ distinct values the sketch degrades to EXACT
   counts (lower == upper == groupBy count) — the merge adds no slop
   when no partition ever decremented.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from puregraphdb_spark.operators.sketch import heavy_hitter_tokens, heavy_hitters
from tests.conftest import SF_DIR
from puregraphdb_spark.sources.registry import load_table


def _skewed(spark, n_partitions):
    # Zipf-ish: value v_i appears ~ n/i times, i = 1..40, plus a long
    # tail of singletons — deterministic, no RNG
    rows = []
    for i in range(1, 41):
        rows += [(f"v{i:02d}",)] * (2000 // i)
    rows += [(f"tail{j}",) for j in range(500)]
    return spark.createDataFrame(rows, ["x"]).repartition(n_partitions)


def test_bounds_bracket_exact_counts_across_layouts(spark):
    for parts in (1, 4, 13):
        df = _skewed(spark, parts)
        exact = {r["x"]: r["n"] for r in
                 df.groupBy("x").agg(F.count("*").alias("n")).collect()}
        sk = heavy_hitters(df, "x", k=15, capacity=48).collect()
        assert len(sk) == 15
        for r in sk:
            assert r.count_lower <= exact.get(r.value, 0) <= r.count_upper, (
                parts, r.value, r.count_lower, exact.get(r.value), r.count_upper)


def test_true_heavy_hitters_always_present(spark):
    df = _skewed(spark, 7)
    exact = {r["x"]: r["n"] for r in
             df.groupBy("x").agg(F.count("*").alias("n")).collect()}
    # k past any possible summary size ((capacity+1)·partitions), so
    # the top-k cut hides nothing: every value whose true count
    # exceeds the sketch's slack (upper - lower on any row) must show
    sk = heavy_hitters(df, "x", k=1000, capacity=48).collect()
    got = {r.value for r in sk}
    slack = {r.count_upper - r.count_lower for r in sk}
    assert len(slack) == 1  # same global error term on every row
    err = slack.pop()
    missing = [v for v, n in exact.items() if n > err and v not in got]
    assert missing == []


def test_exact_when_capacity_covers_distincts(spark):
    df = _skewed(spark, 5)
    exact = {r["x"]: r["n"] for r in
             df.groupBy("x").agg(F.count("*").alias("n")).collect()}
    sk = heavy_hitters(df, "x", k=10, capacity=1000).collect()
    top10 = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.value, r.count_lower, r.count_upper) for r in sk] == [
        (v, n, n) for v, n in top10
    ]


def test_heavy_hitter_tokens_runs_on_fixture(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = heavy_hitter_tokens(docs, k=10, capacity=32).collect()
    assert len(out) == 10
    assert all(r.count_lower <= r.count_upper for r in out)
    # deterministic across invocations on the same layout
    again = heavy_hitter_tokens(docs, k=10, capacity=32).collect()
    assert [(r.value, r.count_lower) for r in out] == \
        [(r.value, r.count_lower) for r in again]
