"""Property tests for the size-invariant exact percentile operator
(VERDICT r2 item #4: exactness must hold across group sizes and
through forced multi-round refinement)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from puregraphdb_spark.operators.percentile import (
    _refinement_rounds, exact_percentile_cont,
)

PS = [0.0, 0.01, 0.5, 0.9, 1.0]


def _make_groups(spark, sizes: dict[str, int]):
    """Deterministic pseudo-random values (with duplicates) per group."""
    frames = []
    for gname, n in sizes.items():
        ids = np.arange(n, dtype=np.int64)
        vals = ((ids * 2654435761) % 1_000_003) / 1000.0
        frames.append(pd.DataFrame({"g": gname, "val": vals}))
    pdf = pd.concat(frames, ignore_index=True)
    return spark.createDataFrame(pdf), pdf


def _expected(pdf: pd.DataFrame) -> dict[tuple[str, float], float]:
    out = {}
    for gname, sub in pdf.groupby("g"):
        for p in PS:
            # numpy 'linear' interpolation == SQL percentile_cont
            out[(gname, p)] = float(np.percentile(sub["val"], p * 100))
    return out


def _check(df, pdf):
    got = {r["g"]: r for r in df.collect()}
    exp = _expected(pdf)
    for gname in pdf["g"].unique():
        for i, p in enumerate(PS):
            assert got[gname][f"p_{i}"] == pytest.approx(
                exp[(gname, p)], rel=0, abs=1e-9
            ), f"group={gname} p={p}"


def test_exact_across_group_sizes(spark):
    # spans the small-group cutoff (1000) and well past it
    sizes = {"a": 1, "b": 2, "c": 3, "d": 750, "e": 1001, "f": 10_000,
             "g": 100_000}
    df, pdf = _make_groups(spark, sizes)
    res = exact_percentile_cont(df, "g", "val", PS, n_estimate=len(pdf))
    _check(res, pdf)


def test_exact_with_forced_multiround_refinement(spark):
    # accuracy=100 + tiny band_target forces 2 grid-refinement rounds
    # (the 100-TB plan shape) on a 200k-row group; result must be
    # bit-identical to numpy regardless.
    sizes = {"big": 200_000, "side": 5_000}
    df, pdf = _make_groups(spark, sizes)
    assert _refinement_rounds(200_000, 100, 200) >= 2
    res = exact_percentile_cont(
        df, "g", "val", PS, accuracy=100, band_target=200,
        n_estimate=205_000,
    )
    _check(res, pdf)


def test_round_planner_is_size_invariant():
    # fixture scale: zero extra passes (plan unchanged vs round 2)
    assert _refinement_rounds(1_100_000, 1000, 100_000) == 0
    # 10^12 rows: a handful of sketch passes, never a giant band
    assert 1 <= _refinement_rounds(10**12, 1000, 100_000) <= 4
    # monotone: more data never means fewer passes
    prev = 0
    for n in (10**6, 10**8, 10**10, 10**12, 10**14):
        r = _refinement_rounds(n, 1000, 100_000)
        assert r >= prev
        prev = r


def test_duplicate_heavy_values(spark):
    # constant + two-valued groups: interpolation between equal values
    pdf = pd.concat([
        pd.DataFrame({"g": "const", "val": np.full(5000, 7.25)}),
        pd.DataFrame({"g": "two", "val": np.tile([1.0, 2.0], 3000)}),
    ], ignore_index=True)
    df = spark.createDataFrame(pdf)
    res = exact_percentile_cont(df, "g", "val", PS, n_estimate=len(pdf))
    _check(res, pdf)


def test_randomized_multiround_configs(spark):
    # randomized adversarial sweep: skewed sizes, duplicate-heavy
    # values, extreme percentiles, forced refinement — every config
    # must match numpy exactly (seeded, deterministic).
    rng = np.random.RandomState(7)
    for trial in range(4):
        sizes = {
            f"g{j}": int(rng.choice([1, 2, 17, 900, 1500, 30_000]))
            for j in range(4)
        }
        frames = []
        for gname, n in sizes.items():
            vals = np.round(rng.lognormal(4, 2, size=n), 2)
            dups = rng.choice(vals, size=n // 3) if n >= 3 else vals[:0]
            allv = np.concatenate([vals, dups])
            frames.append(pd.DataFrame({"g": gname, "val": allv}))
        pdf = pd.concat(frames, ignore_index=True)
        df = spark.createDataFrame(pdf)
        ps = [0.0, 0.25, 0.5, 0.75, 0.99, 1.0]
        res = exact_percentile_cont(
            df, "g", "val", ps, accuracy=150, band_target=120,
            small_group=20, n_estimate=len(pdf),
        )
        got = {r["g"]: r for r in res.collect()}
        for gname, sub in pdf.groupby("g"):
            for i, p in enumerate(ps):
                exp = float(np.percentile(sub["val"], p * 100))
                assert got[gname][f"p_{i}"] == pytest.approx(
                    exp, rel=0, abs=1e-9
                ), f"trial={trial} group={gname} p={p}"


def test_nulls_ignored_and_all_null_group_yields_null(spark):
    """percentile_cont ignores NULLs: the rank math must count VALUES,
    and an all-NULL group returns NULL instead of crashing on an
    element_at(0)."""
    from puregraphdb_spark.operators.percentile import (
        collect_exact_percentile_cont, exact_percentile_cont,
    )

    rows = [(1, None), (1, 10.0), (1, 20.0), (1, None), (2, None), (2, None)]
    df = spark.createDataFrame(rows, "g int, v double")
    for fn in (
        lambda: collect_exact_percentile_cont(df, "g", "v", [0.5]),
        lambda: exact_percentile_cont(df, "g", "v", [0.5], accuracy=100),
    ):
        got = {r["g"]: r["p_0"] for r in fn().collect()}
        assert got[1] == 15.0   # median of {10, 20}, NULLs ignored
        assert got[2] is None   # all-NULL group
