"""Plan inspection helpers: make plan-quality assertions first-class.

The 100-TB posture is enforced by tests, not prose: scans must show
PushedFilters, dim joins must broadcast, shuffle counts must match the
per-operator docstrings. These helpers read the physical plan so tests
(tests/test_plan_quality.py) can assert those properties and fail the
suite when a rewrite silently de-optimizes a query.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The physical plan as text (pre-execution; AQE not yet applied)."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of DISTINCT shuffle exchanges in the physical plan
    (broadcast exchanges excluded — they move only the small side).

    Distinct = unique after stripping expression ids/plan ids: the
    static plan textually duplicates shared subtrees, but AQE executes
    identical exchanges once (ReusedExchange), so unique shapes are the
    honest runtime shuffle count.
    """
    plan = physical_plan(df)
    shapes = set()
    for line in plan.splitlines():
        if ("Exchange" in line and "BroadcastExchange" not in line
                and "ReusedExchange" not in line):
            shapes.add(re.sub(r"#\d+L?|plan_id=\d+", "", line.strip(" :+-")))
    return len(shapes)


def broadcast_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan pushes a filter mentioning ``fragment``
    (checks the PushedFilters list of FileScan nodes)."""
    for line in physical_plan(df).splitlines():
        if "PushedFilters:" in line:
            pushed = line.split("PushedFilters:", 1)[1]
            if fragment in pushed:
                return True
    return False
