"""Louvain community detection + modularity scoring (VERDICT r6 item 2).

Ground truths are hand-computable partitions (clique chains, two
triangles with a bridge); the monotonicity property is pinned on the
accepted-sweep history, which the implementation makes non-decreasing
by construction (validated sweeps).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from puregraphdb_spark.operators.community import louvain, modularity


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long")


def _clique(ids):
    return [(a, b) for a in ids for b in ids if a < b]


def test_modularity_hand_value(spark):
    # two triangles {1,2,3} and {4,5,6} bridged by 3-4: m=7,
    # Q = 2*6/14 - (49+49)/196 = 0.357143 (exact hand computation)
    e = _edges(spark, _clique([1, 2, 3]) + _clique([4, 5, 6]) + [(3, 4)])
    a = spark.createDataFrame(
        [(i, 1 if i <= 3 else 4) for i in range(1, 7)],
        "id long, community long")
    row = modularity(e, a).collect()[0]
    assert row["m"] == 7.0
    assert row["q"] == pytest.approx(0.357143, abs=1e-6)


def test_modularity_trivial_partitions(spark):
    e = _edges(spark, _clique([1, 2, 3, 4]))
    all_one = spark.createDataFrame(
        [(i, 0) for i in range(1, 5)], "id long, community long")
    # single community: Q = 1 - 1 = 0 exactly
    assert modularity(e, all_one).collect()[0]["q"] == 0.0
    # two disconnected cliques, each its own community: Q = 0.5
    e2 = _edges(spark, _clique([1, 2, 3]) + _clique([4, 5, 6]))
    by_clique = spark.createDataFrame(
        [(i, 1 if i <= 3 else 4) for i in range(1, 7)],
        "id long, community long")
    assert modularity(e2, by_clique).collect()[0]["q"] == 0.5


def test_modularity_normalizes_direction_and_duplicates(spark):
    # same graph declared messily: reversed edges, duplicates, self-loop
    clean = _edges(spark, _clique([1, 2, 3]) + _clique([4, 5, 6]) + [(3, 4)])
    messy = _edges(
        spark,
        [(b, a) for a, b in _clique([1, 2, 3])]
        + _clique([4, 5, 6]) + [(4, 3), (3, 4), (5, 5)],
    )
    a = spark.createDataFrame(
        [(i, 1 if i <= 3 else 4) for i in range(1, 7)],
        "id long, community long")
    q_clean = modularity(clean, a).collect()[0]["q"]
    assert q_clean == pytest.approx(0.357143, abs=1e-6)
    # duplicate 3-4 edge doubles that pair's weight: m = 8 and, by
    # hand, W_in = 3+3 = 6, d_A = 2+2+4 = 8 = d_B, so
    # Q = 2*6/16 - (64+64)/256 = 0.75 - 0.5 = 0.25 exactly — pins the
    # direction/duplicate/self-loop normalization of Q itself, not
    # just of m (round-7 review finding #7)
    row = modularity(messy, a).collect()[0]
    assert row["m"] == 8.0
    assert row["q"] == pytest.approx(0.25, abs=1e-9)


def test_louvain_two_triangles(spark):
    e = _edges(spark, _clique([1, 2, 3]) + _clique([4, 5, 6]) + [(3, 4)])
    assign, hist = louvain(e, return_history=True)
    rows = {r["id"]: r["community"] for r in assign.collect()}
    assert rows[1] == rows[2] == rows[3]
    assert rows[4] == rows[5] == rows[6]
    assert rows[1] != rows[4]
    # labels are min member ids
    assert rows[1] == 1 and rows[4] == 4
    # accepted-sweep modularity strictly improves to the optimum
    assert hist == sorted(hist)
    assert hist[-1] == pytest.approx(0.357142857, abs=1e-6)


def test_louvain_clique_chain_ground_truth(spark):
    # 4 K5 cliques chained by single bridges: communities = cliques
    cliques = [list(range(10 * c + 1, 10 * c + 6)) for c in range(4)]
    pairs = []
    for ids in cliques:
        pairs += _clique(ids)
    for a, b in zip(cliques, cliques[1:]):
        pairs.append((a[-1], b[0]))
    assign, hist = louvain(_edges(spark, pairs), return_history=True)
    rows = {r["id"]: r["community"] for r in assign.collect()}
    labels = set()
    for ids in cliques:
        got = {rows[i] for i in ids}
        assert len(got) == 1, f"clique {ids} split: {got}"
        labels.add(got.pop())
    assert len(labels) == 4
    assert hist == sorted(hist)


def test_louvain_history_matches_public_modularity(spark):
    # the composed assignment's public modularity == the last accepted
    # internal level modularity — pins the contraction convention
    # (k = nbr + 2*self preserves Q across levels)
    cliques = [list(range(10 * c + 1, 10 * c + 5)) for c in range(3)]
    pairs = []
    for ids in cliques:
        pairs += _clique(ids)
    pairs += [(4, 11), (14, 21), (1, 24)]  # ring of bridges
    e = _edges(spark, pairs)
    assign, hist = louvain(e, return_history=True)
    q_pub = modularity(e, assign).collect()[0]["q"]
    assert q_pub == pytest.approx(hist[-1], abs=1e-6)


def test_louvain_weighted_pulls_vertex_across(spark):
    # 5 is wired to clique {1,2,3,4} by one unit edge but to 6 by a
    # w=30 edge: weighted louvain must bind 5 to the heavy side. (The
    # optimum here is {1,2,3,4} | {5,6} | {7,8,9} with Q=0.3194 — a
    # heavy pair out-modularizes joining the whole right clique, the
    # classic resolution behavior; hand-check: merging {5,6} into
    # {6,7,8,9} gives Q=0.2334.)
    pairs = _clique([1, 2, 3, 4]) + _clique([6, 7, 8, 9])
    rows = [(a, b, 1.0) for a, b in pairs] + [(4, 5, 1.0), (5, 6, 30.0)]
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    assign, hist = louvain(e, weight_col="w", return_history=True)
    m = {r["id"]: r["community"] for r in assign.collect()}
    assert m[5] == m[6] != m[4]
    assert m[1] == m[2] == m[3] == m[4]
    assert m[7] == m[8] == m[9]
    assert hist[-1] == pytest.approx(0.319362, abs=1e-6)


def test_louvain_edgeless_and_single_edge(spark):
    e0 = spark.createDataFrame([], "src long, dst long")
    out = louvain(e0)
    assert out.count() == 0
    e1 = _edges(spark, [(1, 2)])
    rows = {r["id"]: r["community"] for r in louvain(e1).collect()}
    assert rows == {1: 1, 2: 1}


def test_louvain_uniform_weights_equal_unweighted(spark):
    """weight_col of all-1.0 must reproduce the unweighted run
    bit-for-bit (the graph_wpagerank discipline applied to louvain —
    pins that the weighted path shares every code path, not a fork)."""
    pairs = (_clique([1, 2, 3]) + _clique([4, 5, 6]) + [(3, 4)]
             + _clique([7, 8, 9]) + [(6, 7)])
    uw, uh = louvain(_edges(spark, pairs), return_history=True)
    w = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, w double")
    ww, wh = louvain(w, weight_col="w", return_history=True)
    assert uh == wh
    assert sorted(map(tuple, uw.collect())) == sorted(
        map(tuple, ww.collect()))
