"""Round-14 optimization pins: each test locks an internals change of
an UNCHANGED-results operator (the optimization round's contract) —
plan-shape regressions here mean a future edit silently reintroduced
the pathology the round removed.

1. Generate barrier (q63/q172/q176): predicate pushdown must NOT fold
   the array_intersect back into the nested-loop join condition — the
   r13 plans evaluated it three times per candidate pair, ahead of the
   cheap length prefilter.
2. Link-prediction adjacency fast path (q100/q171): the under-gate
   array expansion must agree exactly with the windowed pair-relation
   plan that remains the 100-TB path.
3. Spearman rank maps: the per-VALUE rank-map join must reproduce the
   per-ROW window ranks exactly, ties included.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q63_intersect_stays_out_of_join_condition(spark):
    from puregraphdb_spark.operators.llm import q63_ngram_jaccard

    plan = _physical(q63_ngram_jaccard(spark, SF_DIR))
    join_cond = [ln for ln in plan.splitlines()
                 if "BroadcastNestedLoopJoin" in ln]
    assert join_cond, "expected the gated nested-loop join"
    assert all("array_intersect" not in ln for ln in join_cond)
    # exactly one evaluation site (inside the Generate), not three
    assert plan.count("array_intersect") == 1


def test_q172_intersect_stays_out_of_join_condition(spark):
    from puregraphdb_spark.operators.llm import q172_dedup_threshold_curve

    plan = _physical(q172_dedup_threshold_curve(spark, SF_DIR))
    join_cond = [ln for ln in plan.splitlines()
                 if "BroadcastNestedLoopJoin" in ln and "Cross" not in ln]
    assert join_cond
    assert all("array_intersect" not in ln for ln in join_cond)
    assert plan.count("array_intersect") == 1


def test_q176_single_intersect_evaluation(spark):
    from puregraphdb_spark.operators.similarity import q176_allpairs_jaccard

    plan = _physical(q176_allpairs_jaccard(spark, SF_DIR))
    assert plan.count("array_intersect") == 1


def test_q171_adjacency_path_equals_window_path(spark):
    # q171 keeps the adjacency-array fast path (its 1/deg weight reads
    # size(ss) off the array for free); q100 measured slower on it and
    # stays on the pair relation — only q171's two shapes need pinning.
    from puregraphdb_spark.operators.graph import q171_resource_allocation

    fast = q171_resource_allocation(spark, SF_DIR).toPandas()
    # skew_cap_bytes=0 defeats the gate: window-capped pair relation
    # with a cap far above every fixture degree ≡ exact
    slow = q171_resource_allocation(
        spark, SF_DIR, max_neighborhood=1 << 30,
        skew_cap_bytes=0).toPandas()
    assert fast.equals(slow)


def test_q171_fast_path_has_no_pair_self_join(spark):
    from puregraphdb_spark.operators.graph import q171_resource_allocation

    plan = _physical(q171_resource_allocation(spark, SF_DIR))
    # the expansion is two nested generators off the adjacency array,
    # not a c-keyed self-join
    assert plan.count("Generate explode") >= 2


def test_spearman_rank_map_matches_window_ranks(spark):
    from puregraphdb_spark.operators.extras import spearman_corr

    rows = [("a", x, y) for x, y in
            [(1, 5), (1, 5), (2, 5), (2, 7), (3, 7), (3, 1), (3, 1)]]
    rows += [("b", x, x * x) for x in [4, 4, 4, 4]]        # all-tied x
    rows += [("c", x, 10 - x) for x in range(1, 6)]        # untied
    df = spark.createDataFrame(rows, ["g", "x", "y"])

    got = spearman_corr(df, "g", "x", "y").toPandas()
    got = got.sort_values("g").reset_index(drop=True)

    # reference: the retired per-row window formulation
    wx = Window.partitionBy("g").orderBy("x")
    wxt = Window.partitionBy("g", "x")
    wy = Window.partitionBy("g").orderBy("y")
    wyt = Window.partitionBy("g", "y")
    ranked = df.select(
        F.col("g").alias("grp"),
        (F.rank().over(wx) * 2 + F.count("*").over(wxt) - 1)
        .cast("long").alias("x"),
        (F.rank().over(wy) * 2 + F.count("*").over(wyt) - 1)
        .cast("long").alias("y"),
    )
    dec = "decimal(38,0)"
    mom = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).cast("double")
        .alias("syy"),
    )
    from puregraphdb_spark.functions.numeric import decimal_round

    nn = F.col("n").cast("double")
    dx = nn * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = nn * F.col("syy") - F.col("sy") * F.col("sy")
    rho = ((nn * F.col("sxy") - F.col("sx") * F.col("sy"))
           / (F.sqrt(dx) * F.sqrt(dy)))
    want = mom.select(
        F.col("grp").alias("g"), "n",
        F.when((dx == 0) | (dy == 0), F.lit(0.0))
        .otherwise(decimal_round(rho, 6, grid=10)).alias("rho"),
    ).toPandas().sort_values("g").reset_index(drop=True)

    assert got.equals(want)
    # group b is constant-x: the zero-variance guard must pin 0.0
    assert float(got[got.g == "b"].rho.iloc[0]) == 0.0


def test_q91_joins_are_shuffled_hash_under_gate(spark):
    # r14 (guide §3.1): q91's three pattern joins sit on
    # aggregate-derived relations with no usable size statistics, so
    # the static planner lands on SortMergeJoin; under the measured
    # 2 GiB lineitem gate the edge-weight relation carries a
    # SHUFFLE_HASH preference that removes both sort passes (rows
    # identical — oracle-pinned). The pin: no SortMergeJoin survives
    # at fixture scale, and the shuffles themselves stay (the hint
    # must not have turned anything into an unbounded broadcast).
    from puregraphdb_spark.operators.graph import q91_motif_weighted

    plan = _physical(q91_motif_weighted(spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert plan.count("ShuffledHashJoin") == 3


def test_semantic_prune_single_arrow_seam_and_projection(spark):
    # r14 (guide §4.2): the O(b²) pairwise cosines moved from an
    # interpreted per-pair zip_with/aggregate lambda to ONE
    # applyInPandas seam whose numpy kernel replays the JVM fold's
    # float sequence bit-exactly (oracle-pinned at sf0.01/sf1, plus
    # the brute-force hypothesis pin in test_round12_operators). The
    # pin here: exactly one Python eval node per prune, and only the
    # consumed columns cross the boundary (guide §4.1 pre-projection).
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q151_hash_semantic_dedup"](spark, SF_DIR)
    plan = _physical(df)
    assert plan.count("FlatMapGroupsInPandas") == 1
    # the seam consumes exactly the five columns the kernel needs
    seam = [ln for ln in plan.splitlines()
            if "FlatMapGroupsInPandas" in ln]
    assert seam and all(
        c in seam[0] for c in ("cluster", "__vid", "csim", "emb", "nrm"))


def test_gated_join_strategies_across_graph_surface(spark):
    # r14 (guide §3.1): the per-query measured join-strategy gates.
    # Each assertion pins the A/B'd winner at fixture scale (rows are
    # oracle-pinned separately); a regression here means a future edit
    # silently reverted a measured plan decision.
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def plan(name):
        return _physical(qs[name](spark, SF_DIR))

    # q85/q86/q65: gated SHUFFLE_HASH on the co-occurrence relations —
    # sorts gone, shuffles kept, nothing force-broadcast.
    for name, shj in (("q85_clustering_coeff", 3),
                      ("q86_reach2", 1),
                      ("q65_motif_wedge", 2)):
        p = plan(name)
        assert "SortMergeJoin" not in p, name
        assert p.count("ShuffledHashJoin") == shj, name

    # q100 (r15): under the gate the expansion rides the adjacency
    # arrays — no pair self-join at all (the SMJ is gone with its
    # exchange; 1.300 -> 1.151 s best-of-5 noop) — and deg attaches
    # by broadcast under the supplier gate. Past the gate the
    # window-capped pair relation keeps its deliberate sort-merge
    # (the SHUFFLE_HASH variant measured 1.30x slower, r14).
    p = plan("q100_link_prediction")
    assert "SortMergeJoin" not in p
    # 2 nested explodes for the s1<s2 expansion + 1 for the deg grain
    assert p.count("Generate") >= 3
    assert p.count("BroadcastHashJoin") >= 3

    # q99/q95: one-row-per-key relations broadcast under dim gates.
    for name in ("q99_modularity", "q95_degree_assortativity"):
        assert "SortMergeJoin" not in plan(name), name
