"""Frequency sketches: Misra-Gries / space-saving heavy hitters.

The exact top-k (groupBy + count + orderBy.limit) is already first
class (q16); this module adds the SKETCHED path for when even the
(key, count) relation is too hot to materialize — e.g. "top URLs ever
seen" over a 100-TB corpus where the distinct-key space itself is
fact-scale and one counter per key would OOM the aggregation.

Misra-Gries fits Spark's execution model exactly because summaries
MERGE: each input partition is summarized independently with at most
``capacity`` counters (a pure map pass — mapInPandas, Arrow batches,
no shuffle), and the per-partition summaries — at most
``capacity + 1`` rows each — are then merged with a tiny ordinary
aggregation. The guarantee survives the merge:

    est(v) ≤ true(v) ≤ est(v) + Σ_p err_p

where ``err_p`` is partition p's decrement total (the mass MG
discarded there): within a partition true_p(v) − err_p ≤ est_p(v) ≤
true_p(v), including est_p(v) = 0 for values the summary dropped, so
summing over partitions bounds the global count with the SUM of the
per-partition errors. Any value with true frequency > Σ err_p is
guaranteed present in the merged summary. err_p ≤ n_p/(capacity+1),
so the global error is at most n/(capacity+1) regardless of how many
partitions the data arrives in.

No cross-engine SQL oracle by design (the sketch's estimates depend
on partitioning) → rows-only entry; correctness is pinned by property
tests (bounds bracket exact counts on every tested layout; the sketch
finds every true heavy hitter) in tests/test_sketch.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUMMARY_SCHEMA = "value string, est long, err long"


def mg_ingest(counters: dict[str, int], values: pd.Series,
              capacity: int) -> int:
    """Fold one Arrow batch into a Misra-Gries summary IN PLACE;
    returns the decrement mass this batch added (the error-bound
    increment). Shared by the batch partition summarizer and the
    streaming stateful twin so both sketches are the same algorithm.

    Batch-local exact counts first: collapsing the batch before the
    counter loop makes the hot loop run per DISTINCT value per batch,
    not per row.
    """
    err = 0
    for value, cnt in values.value_counts().items():
        cnt = int(cnt)
        if value in counters:
            counters[value] += cnt
        elif len(counters) < capacity:
            counters[value] = cnt
        else:
            # decrement-by-min round: subtract as much as possible in
            # one step (space-saving-style batched MG)
            m = min(counters.values())
            dec = min(m, cnt)
            for v in [v for v, c in counters.items() if c <= dec]:
                del counters[v]
            for v in counters:
                counters[v] -= dec
            if cnt > dec:
                counters[value] = cnt - dec
            err += dec
    return err


def _misra_gries_partition(batches: Iterator[pd.DataFrame],
                           capacity: int) -> Iterator[pd.DataFrame]:
    """One MG summary per input partition (streamed over Arrow
    batches, O(capacity) state). Emits (value, est, 0) counter rows
    plus ONE (NULL, 0, err) row carrying the partition's decrement
    total — NULL can never collide with a real key."""
    counters: dict[str, int] = {}
    err = 0
    for pdf in batches:
        err += mg_ingest(counters, pdf["value"], capacity)
    out = pd.DataFrame(
        {"value": list(counters.keys()) + [None],
         "est": [int(c) for c in counters.values()] + [0],
         "err": [0] * len(counters) + [int(err)]}
    )
    yield out.astype({"est": "int64", "err": "int64"})


def heavy_hitters(df: DataFrame, col: str, k: int = 20,
                  capacity: int = 64) -> DataFrame:
    """Top-k heavy hitters of ``df[col]`` with deterministic count
    bounds: (value, count_lower, count_upper), count_lower ≤ true ≤
    count_upper, every value with true count > count_upper(missing)
    guaranteed present. See module docstring for why this shape (pure
    map + tiny merge) is the one that survives fact-scale key spaces.

    ADVICE r7 caveat — the presence guarantee applies to the MERGED
    SUMMARY, not to the top-k cut: the output is ordered by
    count_lower before ``limit(k)``, so a true heavy hitter that
    survived every partition summary can still be cut from the top-k
    by a value with a larger LOWER bound but smaller true count.
    Callers that need the guarantee end-to-end must either set
    ``k >= (capacity + 1) * n_partitions`` (emit the whole merged
    summary) or post-filter on ``count_upper`` instead of taking the
    head (the property test does exactly this with k=1000).
    """
    if k < 1 or capacity < 1:
        raise ValueError("heavy_hitters needs k >= 1 and capacity >= 1")
    summaries = (
        df.select(F.col(col).cast("string").alias("value"))
        .filter(F.col("value").isNotNull())
        .mapInPandas(
            lambda it: _misra_gries_partition(it, capacity),
            SUMMARY_SCHEMA,
        )
    )
    # total discarded mass across partitions — the global slack term.
    # The unpartitioned window runs on the SUMMARY relation (at most
    # (capacity+1)·n_partitions rows), never the data — one pass, no
    # recompute of the map stage.
    total_err = F.sum("err").over(Window.partitionBy()).cast("long")
    merged = (
        summaries.withColumn("__total_err", total_err)
        .filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(
            F.sum("est").cast("long").alias("count_lower"),
            (F.sum("est") + F.min("__total_err")).cast("long")
            .alias("count_upper"),
        )
    )
    return merged.orderBy(
        F.desc("count_lower"), F.desc("count_upper"), "value"
    ).limit(k)


def heavy_hitter_tokens(docs: DataFrame, k: int = 20,
                        capacity: int = 64,
                        text_col: str = "text") -> DataFrame:
    """Sketch entry point over a corpus: heavy-hitter TOKENS (the
    Zipf head) with count bounds — the vocabulary hot-list without
    materializing the full (token, count) relation."""
    from puregraphdb_spark.operators.pipeline import _nonempty_tokens

    tok = docs.select(F.explode(_nonempty_tokens(text_col)).alias("tok"))
    return heavy_hitters(tok, "tok", k=k, capacity=capacity)
