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
