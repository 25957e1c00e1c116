"""Z-order (Morton-interleaved) write layout: multi-dimensional data
clustering so parquet min/max stats prune files for filters on ANY of
the clustered columns — the layout tool next to hive partitioning
(one low-cardinality column) and bucketing (join co-location) in
``registry.write_partitioned``.

Why: a plain ``sortBy(x)`` write gives perfect x-pruning and ZERO
y-pruning (every file spans all of y). Interleaving the bits of the
columns' rank spaces gives every clustered column a span of roughly
range/√n_files per file (2-D case) — each file is a hypercube-ish
tile instead of a slab, so selective filters on either column skip
most files. The classic lakehouse layout technique (public Delta/
Iceberg OPTIMIZE ZORDER semantics), expressed here as plain Spark:
scale ranks → Morton code via shift/OR expressions (whole-stage
codegen, no UDF) → range partition + in-partition sort → write.

Scale: the min/max scaling aggregate is one 1-row broadcast
(parameter traffic); the range partition on the Morton code is the
same exchange a sorted write already pays; everything else is
map-side expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(scaled: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of the pre-scaled non-negative
    int columns into one long (column i contributes bit b to position
    b·len(scaled) + i). Pure shift/AND/OR expression tree — stays in
    whole-stage codegen.
    """
    n = len(scaled)
    if not 1 <= n <= 4:
        raise ValueError("morton_code interleaves 1-4 columns")
    if bits * n > 62:
        raise ValueError("bits * n_cols must fit a signed long")
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(scaled):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * n + i))
    return out


def zorder_column(df: DataFrame, cols: list[str],
                  bits: int = 16) -> tuple[DataFrame, str]:
    """Annotate ``df`` with a ``__zorder`` Morton code over ``cols``
    (each column min/max-scaled into [0, 2^bits)). Returns the
    annotated frame and the code column's name.

    The per-column min/max comes from ONE 1-row aggregate broadcast
    back into the plan (parameter traffic, the pagerank allowance) —
    no sort, no sampling pass.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__mx_{c}")]
    stats = df.agg(*aggs)
    top = (1 << bits) - 1
    annotated = df.crossJoin(F.broadcast(stats))
    scaled = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        # ADVICE r7: a NULL (or NaN) in ANY clustered column would
        # otherwise make the whole Morton code NULL, collapsing those
        # rows into one boundary range-partition and losing clustering
        # on every OTHER column too. Map null/NaN to the min-scaled
        # rank so the row still clusters on its remaining dimensions.
        val = F.col(c).cast("double")
        safe = F.when(val.isNull() | F.isnan(val), mn).otherwise(val)
        scaled.append(
            F.coalesce(
                F.least(
                    F.floor((safe - mn) / span
                            * F.lit(float(top + 1))).cast("long"),
                    F.lit(top),
                ),
                F.lit(0),  # all-null column: mn itself is NULL
            )
        )
    annotated = annotated.withColumn(
        "__zorder", morton_code(scaled, bits=bits)
    ).drop(*[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])
    return annotated, "__zorder"


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 16, bits: int = 16) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of
    ``cols``: range-partition on the Morton code into ``n_files``
    tasks, sort within each, drop the code, write. Each output file's
    (min, max) footprint on every clustered column is then a tile,
    not a slab — parquet stats prune files for filters on any of
    them (the layout property tests/test_layout.py measures).
    """
    annotated, zcol = zorder_column(df, cols, bits=bits)
    (
        annotated.repartitionByRange(n_files, F.col(zcol))
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite").parquet(path)
    )
