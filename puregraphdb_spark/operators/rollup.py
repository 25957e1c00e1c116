"""Hypertable-style continuous aggregate: multi-granularity time
rollups computed hierarchically — the finest level aggregates the raw
events ONCE; every coarser level re-aggregates the finest partials
(decomposable aggregates), never rescanning the source.

At 100 TB this is the difference between one full scan + tiny re-aggs
and one full scan PER granularity. The same shape runs incrementally
under Structured Streaming (watermark + append to the finest level,
coarser levels refresh from it).

Only decomposable measures are accepted (sum/count/min/max); derive
avg = sum/count at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "count": F.sum,  # counts merge by summing
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "count": lambda col: F.count("*" if col is None else col),
    "sum": lambda col: F.sum(col),
    "min": lambda col: F.min(col),
    "max": lambda col: F.max(col),
}


def time_rollup(events: DataFrame, ts_col: str,
                granularities: list[str],
                group_cols: list[str],
                measures: dict[str, tuple[str, str | None]]) -> DataFrame:
    """Rollup ``measures`` ({out_name: (fn, col)}) over every
    granularity (coarsest-compatible ordering required: each coarser
    window must align with the finest, e.g. 15m → 1h → 1d).

    Returns one DataFrame with a ``granularity`` column; bucket starts
    in ``bucket``. The finest granularity is the only scan of
    ``events``; each coarser level re-aggregates the finest result.
    """
    for name, (fn, _) in measures.items():
        if fn not in _PARTIAL:
            raise ValueError(
                f"measure {name!r}: {fn!r} is not decomposable "
                f"(use {sorted(_PARTIAL)})"
            )
    finest, *coarser = granularities
    level = (
        events.groupBy(
            F.window(ts_col, finest).start.alias("bucket"), *group_cols
        )
        .agg(*[
            _PARTIAL[fn](col).alias(name)
            for name, (fn, col) in measures.items()
        ])
    )
    out = level.withColumn("granularity", F.lit(finest))
    for g in coarser:
        level = (
            level.groupBy(
                F.window("bucket", g).start.alias("bucket"), *group_cols
            )
            .agg(*[
                _MERGE[fn](name).alias(name)
                for name, (fn, _) in measures.items()
            ])
        )
        out = out.unionByName(level.withColumn("granularity", F.lit(g)))
    return out.select("granularity", "bucket", *group_cols, *measures)
