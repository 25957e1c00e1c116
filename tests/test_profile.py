"""Unit checks for the data-profiling operators: null/distinct
accounting on a hand frame, and an FK audit with REAL orphans and
null FKs (the fixture is referentially clean, so the discriminating
branches need synthetic data).
"""

from __future__ import annotations

import pytest

from puregraphdb_spark.operators.profile import fk_integrity, table_profile


def test_table_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b")],
        ["x", "y"],
    )
    out = {r["col_name"]: r for r in table_profile(df).collect()}
    assert set(out) == {"x", "y"}
    assert out["x"]["n_rows"] == 4
    assert (out["x"]["n_nulls"], out["x"]["n_distinct"]) == (1, 3)
    assert (out["y"]["n_nulls"], out["y"]["n_distinct"]) == (1, 2)


def test_table_profile_column_subset_and_empty_raises(spark):
    df = spark.createDataFrame([(1, "a")], ["x", "y"])
    assert table_profile(df, ["y"]).collect()[0]["col_name"] == "y"
    with pytest.raises(ValueError):
        table_profile(df, [])


def test_fk_integrity_orphans_nulls_unreferenced(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, None)],
        ["id", "fk"],
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], ["pk"])
    row = fk_integrity(child, "fk", parent, "pk", rel="c->p").collect()[0]
    assert row["rel"] == "c->p"
    assert row["n_child"] == 5
    assert row["n_null_fk"] == 1          # fk=None
    assert row["n_child_keys"] == 3       # 10, 20, 99
    assert row["n_orphan_keys"] == 1      # 99 has no parent
    assert row["n_parents"] == 3
    assert row["n_unref_parents"] == 1    # 30 is childless
