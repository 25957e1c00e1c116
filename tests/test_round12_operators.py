"""Round-12 operator pins.

embedding-drift small-drift regression (ADVICE r11, high): Spark types
a decimal(18,6) subtraction as decimal(19,6), and decimal(19,6)² needs
39 digits — past the 38-digit cap Spark silently re-typed the product
decimal(38,11), so a 2e-6 per-component diff squared to 4e-12 which
rounded to 0: drift_l2 returned 0.0 in exactly the small-drift regime
the monitor exists for, while the DuckDB oracle (whose 19+19=38-digit
product fits) returned the true value. The fix casts the difference
back to decimal(18,6) before squaring (square = decimal(37,12),
exact); these tests pin the small-drift regime on BOTH the DataFrame
path and the cross-engine compare.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from puregraphdb_spark.operators.extras import weighted_median
from puregraphdb_spark.operators.pipeline import embedding_drift


def _small_drift_rows():
    # Per-component diffs of 1e-6 / 2e-6 from an exactly-zero global
    # centroid: the regime the broken decimal(38,11) product zeroed.
    return (
        [("a", [1e-6, 2e-6, 0.0])] * 4
        + [("b", [-1e-6, -2e-6, 0.0])] * 4
    )


def test_embedding_drift_small_drift_nonzero(spark):
    sdf = spark.createDataFrame(
        _small_drift_rows(), "label string, embedding array<double>")
    out = embedding_drift(sdf, key_col="label").orderBy("label").collect()
    # sum d2 = 1e-12 + 4e-12 = 5e-12 (exact decimal);
    # sqrt = 2.2360…e-6 → 6-dp round → 0.000002 for both labels.
    assert [r["label"] for r in out] == ["a", "b"]
    assert [r["n_vecs"] for r in out] == [4, 4]
    assert [r["drift_l2"] for r in out] == [2e-6, 2e-6]


def test_embedding_drift_small_drift_matches_oracle(spark):
    import __spark_entry__ as entry

    rows = _small_drift_rows()
    sdf = spark.createDataFrame(
        rows, "label string, embedding array<double>")
    spark_out = (
        embedding_drift(sdf, key_col="label").orderBy("label").toPandas())

    con = duckdb.connect()
    try:
        con.register(
            "embeddings", pd.DataFrame(rows, columns=["label", "embedding"]))
        oracle_out = con.execute(
            entry.oracle_sql()["q150_embedding_drift"]).df()
    finally:
        con.close()

    assert list(spark_out["label"]) == list(oracle_out["label"])
    assert list(spark_out["n_vecs"]) == list(oracle_out["n_vecs"])
    assert list(spark_out["drift_l2"]) == list(oracle_out["drift_l2"])
    assert all(v != 0.0 for v in spark_out["drift_l2"])


def test_weighted_median_histogram_value_concentrated(spark):
    """ADVICE r11 (low): the histogram path's round count assumes
    value-domain bisection sheds rows ~n_buckets-fold per round; a
    distribution with many distinct values packed into a narrow slice
    of the range violates that. The safety round plus the bounded
    final fold must still produce the exact collect-path answer."""
    import random

    rng = random.Random(1207)
    rows = []
    # 4000 distinct-ish values inside [100.0, 100.0 + 1e-4] — the
    # whole mass in 1e-7 of the value range spanned by the outliers.
    rows += [("g", 100.0 + rng.random() * 1e-4, float(rng.randrange(1, 9)))
             for _ in range(4000)]
    rows += [("g", 0.0, 1.0), ("g", 1000.0, 1.0)]  # stretch the range
    # a second, tiny group keeps the multi-group bookkeeping honest
    rows += [("h", 5.0, 2.0), ("h", 7.0, 1.0)]
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    a = sorted(tuple(r) for r in
               weighted_median(df, "v", "w", "k").collect())
    b = sorted(tuple(r) for r in
               weighted_median(df, "v", "w", "k", collect_small=False,
                               n_estimate=5000, n_buckets=8,
                               band_target=50).collect())
    assert a == b
