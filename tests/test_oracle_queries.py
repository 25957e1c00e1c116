"""Every declared query vs its DuckDB oracle at sf0.001 — the local
mirror of the driver's t2 correctness gate (SURVEY §5 layer 2).

Rows-only entries (iterative graph algorithms) are smoke-run instead:
deterministic row count across two invocations.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_frames_match

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
ORACLED = sorted(n for n in QUERIES if n in ORACLES)
ROWS_ONLY = sorted(n for n in QUERIES if n not in ORACLES)


def test_every_oracled_query_is_declared():
    # every oracle key must have an implementation
    assert set(ORACLES) <= set(QUERIES)
    # the 30-query SURVEY §2 contract is fully declared (+ extras)
    assert len(ORACLED) >= 30


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, oracle, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    odf = oracle.execute(ORACLES[name]).fetchdf()
    assert_frames_match(sdf, odf)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs_deterministically(spark, name):
    a = QUERIES[name](spark, SF_DIR)
    n1 = a.count()
    assert n1 > 0
    assert QUERIES[name](spark, SF_DIR).count() == n1


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
