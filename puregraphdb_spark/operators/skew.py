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
