"""Oracle-stable rounding for monetary/measure expressions.

Problem (measured, SURVEY §7.4 round-2 correction): fixture prices and
discounts are exact 2-decimal values, so products like
``price·(1−discount)`` are exact 4-decimal numbers — and ~1% of them
sit EXACTLY on a 2-dp rounding half-boundary (….xx50). The binary
double for such a product lands a hair above or below the true .xx5,
and Spark (BigDecimal HALF_UP on the exact binary) vs DuckDB (scaled
double rounding) then disagree on ~half of those rows (129 rows of
q01 at sf0.1).

Fix: snap to the value's exact decimal grid BEFORE the final rounding,
on BOTH engines. ``decimal_round(col, 2, grid=4)`` casts to
decimal(28,4) — recovering the mathematically exact 4-dp value, since
FP noise ≪ the grid step — then rounds to 2 in decimal (half-up ==
half-away for positive values on both engines), then returns double.
For derived ratios (averages, interpolations) use a finer grid (6–8):
both engines see the identical input double, cast it to the identical
decimal, and round identically.

Aggregation variant: sum in decimal (``sum(col.cast(decimal))``) —
exact arithmetic, immune to summation order entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decimal_round(col: Column, scale: int = 2, grid: int = 4) -> Column:
    """round(col, scale) via the exact decimal grid; returns double."""
    return F.round(col.cast(f"decimal(28,{grid})"), scale).cast("double")


def decimal_sum_round(col: Column, scale: int = 2, grid: int = 4) -> Column:
    """Exact decimal sum then round; immune to FP summation order."""
    return F.round(F.sum(col.cast(f"decimal(28,{grid})")), scale).cast("double")


def oracle_round(expr: str, scale: int = 2, grid: int = 4) -> str:
    """The DuckDB-side spelling of decimal_round (keep in lockstep)."""
    return f"round(cast({expr} as decimal(28,{grid})), {scale})::DOUBLE"


def oracle_sum_round(expr: str, scale: int = 2, grid: int = 4) -> str:
    return f"round(sum(cast({expr} as decimal(28,{grid}))), {scale})::DOUBLE"
