"""Skew-mitigation utilities for heavy-hitter keys (SURVEY §4, the
100-TB posture). AQE's skew-join splitting handles sort-merge joins
automatically; these helpers cover the cases it doesn't:

- ``salted_aggregate``: two-phase aggregation for groupBys where one
  key dominates (partial agg per (key, salt), then final merge).
- ``salted_join``: explicit salting for a shuffle join against a
  skewed build side — the left side's hot keys are split across
  ``salt`` partitions, the right side replicated ``salt`` times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(df: DataFrame, key: str, aggs: list[Column],
                     merges: list[Column], salt: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` aggregate within (key, salt); ``merges`` combine the
    partials per key. Aliases must line up pairwise:

    >>> salted_aggregate(df, "k",
    ...     aggs=[F.sum("x").alias("s"), F.count("*").alias("n")],
    ...     merges=[F.sum("s").alias("s"), F.sum("n").alias("n")])

    The first shuffle spreads each hot key over ``salt`` reducers; the
    second merges ``salt`` rows per key — never a single giant
    partition.
    """
    salted = df.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(*aggs)
    return partial.groupBy(key).agg(*merges)


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi join with explicit salting: left rows get a random salt in
    [0, salt); the right side is replicated once per salt value, so a
    hot key's rows land on ``salt`` different reducers instead of one.

    Use when the right side is too big to broadcast and AQE's runtime
    skew split can't apply (e.g. the skewed side feeds a co-partitioned
    requirement downstream). Cost: right side shuffled ``salt``×.

    Only left-preserving joins are valid: with right/full outer joins
    each unmatched right row would surface once per salt replica.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-safe — unmatched "
            f"right rows would duplicate per replica. Allowed: {sorted(allowed)}"
        )
    lsalted = left.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    rreplicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lsalted.join(rreplicated, [key, "__salt"], how)
    return out.drop("__salt")


def key_skew_profile(df: DataFrame, key: str, topk: int = 10) -> DataFrame:
    """One-row skew diagnostic for a prospective shuffle key: key and
    row counts, the max/avg per-key ratio, and the share of rows held
    by the ``topk`` heaviest keys — the measurement that decides
    between plain shuffle, AQE skew split, and explicit salting
    (``salted_join``/``salted_aggregate`` above) BEFORE burning a
    cluster run on a hot key.

    Scale: one count aggregate on the key (map-side combine), a
    top-k over the (|keys|-row) count relation, and two single-row
    reductions crossed at the end — no full-data sort.
    """
    counts = df.groupBy(key).agg(F.count("*").alias("__c"))
    tot = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("__c").alias("n_rows"),
        F.max("__c").alias("max_per_key"),
    )
    top = (
        counts.orderBy(F.desc("__c"), key).limit(topk)
        .agg(F.sum("__c").alias("__topsum"))
    )
    # Empty input: sums aggregate to NULL and the ratios would be
    # 0/0 → NULL/NaN (ADVICE r6). Normalize to n_rows=0 with NULL
    # ratios — "no data" reads as explicitly-unknown skew, not NaN.
    n_rows = F.coalesce(F.col("n_rows"), F.lit(0).cast("long"))
    safe_div = lambda num: F.when(  # noqa: E731
        n_rows > 0, num / n_rows.cast("double")
    )
    return tot.crossJoin(top).select(
        "n_keys",
        n_rows.alias("n_rows"),
        "max_per_key",
        safe_div(
            F.col("max_per_key").cast("double")
            * F.col("n_keys").cast("double")
        ).alias("skew_ratio"),
        safe_div(F.col("__topsum").cast("double")).alias(f"top{topk}_share"),
    )


def q97_skew_profile(spark, sf_dir: str):
    """Skew profile of lineitem's supplier key — the pre-flight
    diagnostic for every l_suppkey shuffle in the suite (1 row:
    key/row counts, max/avg ratio, top-10 share). Exact integer counts
    crossed in two 1-row reductions; the two ratio doubles are single
    IEEE divisions snapped on both engines (q51 discipline).
    """
    from puregraphdb_spark.functions.numeric import decimal_round
    from puregraphdb_spark.sources.registry import load_table

    l = load_table(spark, sf_dir, "lineitem")
    raw = key_skew_profile(l, "l_suppkey", topk=10)
    return raw.select(
        "n_keys", "n_rows", "max_per_key",
        decimal_round(F.col("skew_ratio"), 4, grid=8).alias("skew_ratio"),
        decimal_round(F.col("top10_share"), 6, grid=10)
        .alias("top10_share"),
    )


def join_cardinality_profile(left: DataFrame, right: DataFrame,
                             key: str, topk: int = 10) -> DataFrame:
    """Pre-flight EXACT join-output profile: before running
    ``left ⋈ right`` on ``key``, compute per-key count products — the
    join's output contribution per key — and emit the ``topk``
    heaviest contributors (key, left count, right count, product,
    share of total output). The companion of ``key_skew_profile``
    for two-sided blowup: a key holding 1% of each side produces
    0.01% of a uniform join but can dominate the output when hot on
    BOTH sides; this is the measurement that picks plain shuffle vs
    AQE skew split vs ``salted_join`` vs dropping the key outright.

    Exact, not estimated: |A ⋈_k B| = Σ_k cA(k)·cB(k), computed by
    joining the two COUNT relations — |keys|-sized inputs, so the
    cost is two map-side-combined aggregates plus a tiny join, never
    the join itself. At 100 TB this runs in the time of two scans
    while the real join might not finish at all — that asymmetry is
    the point of a pre-flight.

    Output-size share is a snapped division of exact bigints; the
    total is a 1-row reduction of the per-key relation crossed back
    as a broadcast scalar (the q97 shape — both consumers reference
    the IDENTICAL aggregate subplan, so the exchange is reused, not
    re-executed; a whole-relation window here would funnel the
    |keys|-row relation through one partition, which does not scale).
    """
    from puregraphdb_spark.functions.numeric import decimal_round

    ca = left.groupBy(F.col(key)).agg(
        F.count("*").cast("long").alias("c_left"))
    cb = right.groupBy(F.col(key)).agg(
        F.count("*").cast("long").alias("c_right"))
    per_key = (
        ca.join(cb, key)
        .select(
            key, "c_left", "c_right",
            (F.col("c_left") * F.col("c_right")).cast("long")
            .alias("out_rows"),
        )
    )
    tot = per_key.agg(
        F.sum("out_rows").cast("long").alias("total_out_rows"))
    return (
        per_key.orderBy(F.desc("out_rows"), key).limit(topk)
        .crossJoin(F.broadcast(tot))
        .select(
            key, "c_left", "c_right", "out_rows", "total_out_rows",
            decimal_round(
                F.col("out_rows").cast("double")
                / F.col("total_out_rows").cast("double"), 6, grid=10,
            ).alias("out_share"),
        )
    )


def q165_join_cardinality(spark, sf_dir: str):
    """Exact pre-flight profile of the supplier-key self-join
    "all lineitem lines ⋈ returned lines on l_suppkey" (see
    ``join_cardinality_profile``) — the two-sided-blowup shape this
    repo's co-occurrence graphs actually shuffle: both sides hold
    hundreds of rows per supplier, so per-key products dominate the
    output and the top-10 table is the salting decision input."""
    from puregraphdb_spark.sources.registry import final_sort, load_table

    l = load_table(spark, sf_dir, "lineitem")
    lines = l.select(F.col("l_suppkey").alias("jk"))
    returns = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("jk"))
    res = join_cardinality_profile(lines, returns, "jk", topk=10)
    return final_sort(res, spark, sf_dir, "lineitem",
                      F.desc("out_rows"), "jk")
