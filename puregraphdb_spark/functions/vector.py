"""Vector math as pure Column expressions (no UDFs).

Spark SQL's higher-order functions (``zip_with`` + ``aggregate``) run
inside whole-stage codegen on the JVM — there is no Python/serialization
boundary, which is why these beat a pandas UDF for per-row vector math
and are mandatory for the 100-TB posture (SURVEY.md §2 q29 note).

All helpers cast to ``array<double>`` first: fixtures store
``array<float>``, and the DuckDB oracle is run with ``::DOUBLE[]`` casts,
so both engines do bit-identical double arithmetic in the same
(sequential) summation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array columns."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = a·b / (|a|·|b|) — matches DuckDB list_cosine_similarity."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_from_norms(a: Column | str, b: Column | str,
                      norm_a: Column, norm_b: Column) -> Column:
    """cos(a, b) with the norms already materialized as columns.

    Bit-identical to ``cosine_similarity`` (same factoring of the same
    doubles), but each side's norm is computed ONCE per row instead of
    once per pair — for a k-query × n-corpus scan that is 2·k·n array
    traversals replaced by k + n. Use whenever a side is reused across
    pairs (KNN scans, ANN re-rank)."""
    return dot(a, b) / (norm_a * norm_b)
