"""Property-based checks (hypothesis) for the custom operators whose
semantics are NOT covered by a SQL oracle: the as-of join against
pandas' reference merge_asof, and the bracket-refinement exact
percentile against numpy's linear-interpolation quantile, on random
inputs (SURVEY §5's 'semantics by construction' layer).

Spark actions are expensive (~0.2 s each), so examples are kept small
and few — the value is in randomized shapes (dup keys, ties, empty
groups), not in volume.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from puregraphdb_spark.functions.numeric import decimal_round
from puregraphdb_spark.operators.asof import as_of_join

KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=50)
VAL = st.integers(min_value=-100, max_value=100)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=st.lists(st.tuples(KEYS, TS), min_size=1, max_size=12),
    right=st.lists(st.tuples(KEYS, TS, VAL), min_size=0, max_size=12),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k int, ts int, lid int"
    )
    rdf = spark.createDataFrame(right, "k int, ts int, v int")
    got = (
        as_of_join(ldf, rdf, on="k", left_ts="ts", right_ts="ts",
                   right_cols=["v"], prefix="r_")
        .select("lid", "r_v")
        .toPandas()
        .sort_values("lid", ignore_index=True)
    )

    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        columns=["k", "ts", "lid"],
    ).sort_values(["ts", "lid"], kind="stable", ignore_index=True)
    # reference: latest right row with right.ts <= left.ts per key; ties
    # on (k, ts) resolve to the last right row in (ts, input-order) —
    # same rule as the operator's (ts, side) window order.
    rp = pd.DataFrame(right, columns=["k", "ts", "v"]).sort_values(
        ["ts"], kind="stable", ignore_index=True
    )
    if len(rp):
        want = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    else:
        want = lp.assign(v=None)
    want = want.sort_values("lid", ignore_index=True)

    assert list(got["lid"]) == list(want["lid"])
    got_v = [None if pd.isna(x) else int(x) for x in got["r_v"]]
    want_v = [None if pd.isna(x) else int(x) for x in want["v"]]
    assert got_v == want_v


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.floats(min_value=-1e4, max_value=1e4,
                  allow_nan=False, allow_infinity=False, width=32),
        min_size=1, max_size=40,
    ),
    p=st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.9, 1.0]),
)
def test_bracket_percentile_matches_numpy(spark, vals, p):
    """The hybrid bracket+refinement construction used by q17, rebuilt
    on one group of random values, must reproduce numpy's
    linear-interpolation quantile exactly (same
    v_lo + frac*(v_hi - v_lo) arithmetic).

    Scaled-down parameters so 40-element inputs exercise BOTH paths
    soundly: acc=10 (eps=0.1) and small-group threshold 16 — groups
    above it satisfy the band guarantee 4*eps*n >= p+2 just like
    production groups do at acc=1000 / threshold 1000. This test
    caught two real bugs: Spark 4 element_at RAISING (not null) on
    out-of-bounds, and the band excluding the interpolation neighbor
    on small groups.
    """
    acc = 10
    small_threshold = 16
    margin = 5.0 / acc
    df = spark.createDataFrame([(float(v),) for v in vals], "val double")
    bounds = df.agg(
        F.percentile_approx(
            "val",
            F.array(F.lit(max(0.0, p - margin)), F.lit(min(1.0, p + margin))),
            F.lit(acc),
        ).alias("b"),
        F.count("*").alias("n_g"),
    ).select(F.col("b")[0].alias("lo"), F.col("b")[1].alias("hi"), "n_g")
    small = F.col("n_g") <= small_threshold
    agg = df.join(F.broadcast(bounds)).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(~small & (F.col("val") < F.col("lo")), 1).otherwise(0)
        ).alias("clt"),
        F.sort_array(
            F.collect_list(
                F.when(
                    small
                    | ((F.col("val") >= F.col("lo"))
                       & (F.col("val") <= F.col("hi"))),
                    F.col("val"),
                )
            )
        ).alias("band"),
    )
    pos = F.lit(p) * (F.col("n") - 1)
    lo_i = F.floor(pos)
    frac = pos - lo_i
    idx = (lo_i - F.col("clt")).cast("int")
    vlo = F.element_at(F.col("band"), idx + 1)
    vhi = F.coalesce(F.try_element_at(F.col("band"), idx + 2), vlo)
    [row] = agg.select((vlo + frac * (vhi - vlo)).alias("q")).collect()

    want = float(np.quantile(np.array(vals, dtype="float64"), p))
    assert math.isclose(row["q"], want, rel_tol=1e-12, abs_tol=1e-9)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),      # user
                  st.integers(min_value=0, max_value=10_000)),  # epoch sec
        min_size=1, max_size=25,
    ),
    gap_s=st.sampled_from([1, 60, 1800]),
)
def test_sessionize_matches_reference(spark, events, gap_s):
    """sessionize() vs a direct python gaps-and-islands reference:
    same session count per user and same per-session event counts,
    for random event sets and several gap widths (including duplicate
    timestamps, which must never split a session)."""
    from puregraphdb_spark.operators.events import sessionize

    df = spark.createDataFrame(
        [(u, t) for u, t in events], "user_id int, sec long"
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"))
    got = sessionize(df, gap=f"{gap_s} seconds").toPandas()

    want = {}
    by_user = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        ts.sort()
        sizes = []
        for i, t in enumerate(ts):
            if i == 0 or t - ts[i - 1] > gap_s:
                sizes.append(1)
            else:
                sizes[-1] += 1
        want[u] = sizes

    got_sizes = {
        int(u): [int(n) for _, n in sorted(
            ((r.sid, r.n_events) for r in grp.itertuples()), key=lambda x: x[0]
        )]
        for u, grp in got.groupby("user_id")
    }
    assert got_sizes == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(alphabet="abcdef ", min_size=10, max_size=30),
        min_size=2, max_size=6, unique=True,
    ),
    dup_idx=st.integers(min_value=0, max_value=5),
)
def test_minhash_always_pairs_exact_duplicates(spark, texts, dup_idx):
    """An exact duplicate has an identical shingle set, hence an
    identical MinHash signature, hence identical band buckets — LSH
    must surface the pair with est_jaccard == 1.0 regardless of
    banding. (Recall on exact dups is a guarantee, not a probability.)"""
    from puregraphdb_spark.operators.similarity import near_dup_pairs

    dup_idx = dup_idx % len(texts)
    rows = [(i, t) for i, t in enumerate(texts)]
    clone_id = len(texts)
    rows.append((clone_id, texts[dup_idx]))  # exact duplicate
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = near_dup_pairs(docs, jaccard_threshold=0.99).toPandas()
    assert ((got.a == dup_idx) & (got.b == clone_id)).any()
    dup_row = got[(got.a == dup_idx) & (got.b == clone_id)].iloc[0]
    assert dup_row.est_jaccard == 1.0


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    cents=st.lists(
        st.tuples(st.integers(0, 2),          # group
                  st.integers(0, 10**7),      # price in cents
                  st.integers(0, 99)),        # discount in percent
        min_size=1, max_size=40,
    )
)
def test_unscaled_sum_round_equals_decimal_sum_round(spark, cents):
    """The size-gated fast money sum must be bit-identical to the
    unbounded decimal form on exact-4-dp inputs (2-dp price × 2-dp
    factor), including half-boundary totals."""
    from puregraphdb_spark.functions.numeric import (
        decimal_sum_round, unscaled_sum_round,
    )

    rows = [(g, p / 100.0, d / 100.0) for g, p, d in cents]
    df = spark.createDataFrame(rows, "g int, price double, disc double")
    expr = F.col("price") * (1 - F.col("disc"))
    got = (
        df.groupBy("g")
        .agg(unscaled_sum_round(expr).alias("s"))
        .orderBy("g").toPandas()
    )
    want = (
        df.groupBy("g")
        .agg(decimal_sum_round(expr).alias("s"))
        .orderBy("g").toPandas()
    )
    assert got["s"].tolist() == want["s"].tolist()
