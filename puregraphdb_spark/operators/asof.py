"""As-of (temporal) join: for each left row, the latest right row with
``right_ts <= left_ts`` per key — the standard time-series enrichment
join (trades⋈quotes, events⋈dimensions-as-of).

Implementation is the union-window trick, NOT a range join: tag both
sides, union, and take ``last(right_cols) IGNORE NULLS`` over a
per-key window ordered by (ts, side). This is one shuffle on the key —
the same cost as a plain equi join — and never builds the
O(left×right-per-key) intermediate a naive inequality join would.
At 100 TB both sides shuffle once on the key; skewed keys split fine
under AQE because the window is per-key ordered, not cross-joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(left: DataFrame, right: DataFrame, on: str,
               left_ts: str, right_ts: str,
               right_cols: list[str], prefix: str = "asof_",
               direction: str = "backward") -> DataFrame:
    """For every left row, attach ``right_cols`` from the latest right
    row with ``right[right_ts] <= left[left_ts]`` matching ``on``
    (``direction="backward"``, the default), or from the EARLIEST
    right row with ``right[right_ts] >= left[left_ts]``
    (``direction="forward"`` — "what happened next": next purchase
    after a click, next quote after an order).

    Both directions are the same one-shuffle union-window plan; forward
    flips the frame ([current, unbounded following] + first instead of
    last) and sorts the right side AFTER left at equal timestamps so
    "at-or-after" includes same-instant right rows.

    Left rows with no prior (resp. following) right row carry nulls
    (left-outer semantics; filter afterwards for inner). Right-side
    ties on (key, ts) resolve to the row last (resp. first) in
    (ts, side) order — pre-dedup the right side if that matters.

    All ``right_cols`` are carried through the window as ONE struct, so
    every attached column comes from the SAME latest right row — and a
    genuine NULL in that row stays NULL (matching DuckDB ASOF JOIN /
    pandas merge_asof), instead of being backfilled from an older row
    as per-column ``last(ignorenulls)`` would do.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"as_of_join direction must be 'backward' or 'forward', "
            f"got {direction!r}"
        )
    backward = direction == "backward"
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        # backward: right sorts BEFORE left at equal ts (<=, last());
        # forward: right sorts AFTER left at equal ts (>=, first())
        F.lit(0 if backward else 2).alias("__side"),
        # the struct itself is never null for a right row (even when
        # every field is null) — it doubles as the non-null marker for
        # last(ignorenulls) below.
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    base = Window.partitionBy(on).orderBy("__ts", "__side")
    if backward:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last("__r", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first("__r", ignorenulls=True).over(w)
    filled = r.unionByName(l).select(
        "__side",
        *[F.col(f"__l_{c}").alias(c) for c in left.columns if c != on],
        F.col(on),
        pick.alias("__r"),
    )
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            *[c for c in left.columns if c != on],
            F.col(on),
            *[F.col("__r")[c].alias(f"{prefix}{c}") for c in right_cols],
        )
    )
