"""Incremental aggregate maintenance — materialized-view delta
refresh: given a maintained aggregate and a CDC batch (inserts +
deletes), produce the refreshed aggregate WITHOUT rescanning the
base table. The warehouse-engine feature that turns q113's CDC
snapshot diff into cheap continuously-maintained rollups (the
relational sibling of rollup.py's time-bucketed incremental refresh,
which maintains a time grain under a watermark; this maintains an
ARBITRARY group-by under explicit insert/delete deltas).

Correctness rests on the repo's exactness discipline: every measure
is summed in EXACT decimal, so addition is associative and
commutative — (old + Σinserts − Σdeletes) is bit-identical to a full
recompute over the final state, at any merge order. That identity is
what q164 hash-checks cross-engine (the maintained path on Spark vs
a full recompute in DuckDB) and what the Hypothesis pin replays on
random CDC batches. Counts ride signed longs the same way.

Scale: the delta aggregate shuffles ONLY the CDC batch (map-side
combine on the group keys); the merge is a keyed full-outer join of
two aggregate relations (|groups|-sized, ≪ base), broadcast when
small — the base table is never touched. This is the whole point:
refresh cost is O(|batch| + |groups|), not O(|base|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure spec: output name -> (source column, decimal scale).
#: Sums are carried as decimal(24, scale) — exact, order-immune.
MeasureSpec = dict[str, tuple[str, int]]


def _sum_type(scale: int) -> str:
    return f"decimal(24,{scale})"


def snapshot_aggregate(df: DataFrame, keys: list[str],
                       measures: MeasureSpec) -> DataFrame:
    """Full aggregate of a snapshot: per key tuple, the exact row
    count ``n`` and one exact decimal sum per measure. This is the
    relation ``incremental_agg_refresh`` maintains."""
    if not keys:
        raise ValueError("snapshot_aggregate needs group keys")
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for name, (col, scale) in measures.items():
        aggs.append(
            F.sum(F.col(col).cast(_sum_type(scale)))
            .cast(_sum_type(scale)).alias(name))
    return df.groupBy(*keys).agg(*aggs)


def delta_aggregate(inserts: DataFrame, deletes: DataFrame,
                    keys: list[str],
                    measures: MeasureSpec) -> DataFrame:
    """Signed aggregate of a CDC batch: inserts weigh +1, deletes −1.
    One shuffle over the BATCH only (map-side combine)."""
    signed = (
        inserts.withColumn("__w", F.lit(1))
        .unionByName(deletes.withColumn("__w", F.lit(-1)))
    )
    aggs = [F.sum("__w").cast("long").alias("n")]
    for name, (col, scale) in measures.items():
        aggs.append(
            F.sum(F.col("__w") * F.col(col).cast(_sum_type(scale)))
            .cast(_sum_type(scale)).alias(name))
    return signed.groupBy(*keys).agg(*aggs)


def incremental_agg_refresh(old_agg: DataFrame, inserts: DataFrame,
                            deletes: DataFrame, keys: list[str],
                            measures: MeasureSpec) -> DataFrame:
    """Refresh a maintained aggregate from a CDC batch: exact-decimal
    identity ``refresh(agg(S), ins, del) == agg(S \\ del ∪ ins)``.

    Groups whose refreshed count reaches 0 are dropped (fully deleted);
    groups born in this batch appear with their delta values. Callers
    must pass deletes that are actual members of the maintained
    snapshot — CDC streams guarantee this. A delete for an absent row
    would drive ``n`` negative; the refresh RAISES on any negative
    refreshed count (ADVICE r12: the previous ``n > 0`` filter let a
    lone bad delete vanish and partial over-deletes silently
    undercount — a contract violation must stop the refresh, not
    shrink the rollup).
    """
    d = delta_aggregate(inserts, deletes, keys, measures)
    names = ["n"] + list(measures)

    def pick(side: DataFrame, tag: str) -> DataFrame:
        ren = side
        for c in names:
            ren = ren.withColumnRenamed(c, f"{c}_{tag}")
        return ren

    merged = pick(old_agg, "o").join(pick(d, "d"), keys, "full_outer")
    out_cols = list(keys)
    zero = F.lit(0)
    n_new = (F.coalesce(F.col("n_o"), zero)
             + F.coalesce(F.col("n_d"), zero)).cast("long")
    # The guard is folded into the kept/filtered column so Catalyst
    # cannot prune it away; it costs one branch per group row.
    out_cols.append(
        F.when(n_new < 0, F.raise_error(F.concat(
            F.lit("incremental_agg_refresh: refreshed count went "
                  "negative (delete for a row absent from the "
                  "snapshot) for group "),
            F.to_json(F.struct(*keys)))).cast("long"))
        .otherwise(n_new).alias("n"))
    for name, (_, scale) in measures.items():
        z = F.lit(0).cast(_sum_type(scale))
        out_cols.append(
            (F.coalesce(F.col(f"{name}_o"), z)
             + F.coalesce(F.col(f"{name}_d"), z))
            .cast(_sum_type(scale)).alias(name))
    return merged.select(*out_cols).filter(F.col("n") > 0)


def q164_incremental_agg(spark, sf_dir: str) -> DataFrame:
    """ORACLED maintenance identity: a pricing summary maintained
    through a CDC batch must equal the full recompute over the final
    state — the DuckDB oracle IS that recompute, so the hash-match
    proves ``refresh(agg(base), ins, del) == agg(base \\ del ∪ ins)``
    cross-engine on real data.

    Deterministic CDC split of lineitem (q69 hash-split discipline):
    base = orderkey % 7 != 0 (the maintained snapshot), inserts =
    orderkey % 7 == 0, deletes = base rows with orderkey % 5 == 0.
    Final state = (% 7 == 0) ∪ (% 5 != 0).

    This wrapper scans lineitem for the base aggregate AND the deltas
    because the fixture has no persisted rollup; in deployment the
    old aggregate is the stored materialization and ONLY the CDC
    batch is read — the refresh plan here (delta shuffle + |groups|
    merge join) is exactly the deployed one.
    """
    from puregraphdb_spark.sources.registry import final_sort, load_table

    l = load_table(spark, sf_dir, "lineitem")
    ok = F.col("l_orderkey")
    base = l.filter(ok % 7 != 0)
    inserts = l.filter(ok % 7 == 0)
    deletes = base.filter(ok % 5 == 0)
    keys = ["l_returnflag", "l_linestatus"]
    measures: MeasureSpec = {
        "sum_qty": ("l_quantity", 2),
        "sum_price": ("l_extendedprice", 2),
    }
    old = snapshot_aggregate(base, keys, measures)
    res = incremental_agg_refresh(old, inserts, deletes, keys, measures)
    return final_sort(
        res.select(
            *keys, "n",
            F.round(F.col("sum_qty"), 2).cast("double").alias("sum_qty"),
            F.round(F.col("sum_price"), 2).cast("double")
            .alias("sum_price"),
        ),
        spark, sf_dir, "lineitem", *keys,
    )


def apply_cdc_upsert(dim: DataFrame, updates: DataFrame, key: str,
                     version_col: str) -> DataFrame:
    """SCD1 merge (upsert) of a CDC update batch into a dimension:
    any update for a key REPLACES the dimension row (update wins);
    within the batch the highest ``version_col`` wins. New keys
    insert. Returns the maintained dimension in the updates' schema.

    ``version_col`` must be unique per key WITHIN the batch (CDC
    streams carry an LSN/sequence that guarantees this); equal
    versions make the winner undefined, so a tie AT THE WINNING
    POSITION raises (ADVICE r12: ordering by version alone used to
    pick a nondeterministic winner silently — the loud review of the
    batch the contract promises actually happens now). The check is
    a ``lead`` over the same window — same shuffle, no extra pass.

    Scale: the untouched side is ONE left-anti join of the dimension
    against the batch's distinct keys (broadcast when the batch is
    small — the common case); the batch dedup windows over the BATCH
    only. The dimension is never sorted or windowed whole — that
    asymmetry vs the naive union+window-over-everything recompute is
    the point, and q167 hash-checks the two against each other
    cross-engine.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(version_col).desc())
    # Fold the duplicate-version guard into the KEPT key column so
    # Catalyst cannot prune the check away: if the winning row's
    # version equals the runner-up's, the winner is arbitrary — raise.
    latest = (
        updates.withColumn("__rn", F.row_number().over(w))
        .withColumn("__next_v", F.lead(version_col).over(w))
        .filter(F.col("__rn") == 1)
        .withColumn(
            key,
            F.when(
                F.col("__next_v").isNotNull()
                & (F.col("__next_v") == F.col(version_col)),
                F.raise_error(F.concat(
                    F.lit("apply_cdc_upsert: duplicate "),
                    F.lit(f"({key}, {version_col})"),
                    F.lit(" pair in batch for key "),
                    F.col(key).cast("string"),
                    F.lit(" — winner would be nondeterministic"))))
            .otherwise(F.col(key)))
        .drop("__rn", "__next_v")
    )
    untouched = dim.join(updates.select(key).distinct(), key,
                         "left_anti")
    return untouched.unionByName(latest)


def bitemporal_asof(versions: DataFrame, key_col: str,
                    valid_col: str, txn_col: str,
                    valid_as_of, txn_as_of) -> DataFrame:
    """Bitemporal point query: the state of each key AS OF a VALID
    time, AS KNOWN AT a transaction time — the two-axis lookup that
    separates "what was true on June 1" from "what we believed on
    June 1" and makes retroactive corrections auditable (the SQL:2011
    bitemporal-table semantics, reconstructed over a plain version
    relation).

    Selection rule: among versions with valid_from ≤ V and
    txn_ts ≤ T, the winner has the greatest valid_from, ties broken
    by the greatest txn_ts (the latest recorded belief about the
    governing validity period). (valid_from, txn_ts) must be unique
    per key — CDC version streams guarantee it.

    Scale: one filter (pushed to the scan) + one window on the key —
    the q54 dedup-latest shape; no joins, no state.
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(key_col)
         .orderBy(F.col(valid_col).desc(), F.col(txn_col).desc()))
    return (
        versions.filter((F.col(valid_col) <= F.lit(valid_as_of))
                        & (F.col(txn_col) <= F.lit(txn_as_of)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def q178_bitemporal_asof(spark, sf_dir: str) -> DataFrame:
    """ORACLED bitemporal point query (see ``bitemporal_asof``) over
    a version relation synthesized deterministically from sampled
    orders: every %10 order gets its original record (txn = valid =
    o_orderdate); %30 orders ALSO get a retroactive price correction
    (same valid_from, txn 20 days later — visible only to queries
    whose T passes it); %20 orders get a NEW validity period 10 days
    on (valid = txn = o_orderdate + 10 days). Querying V=1996-07-01,
    T=1996-07-15 exercises all three regimes: keys whose correction
    is not yet known at T, keys whose later period governs, and keys
    absent entirely (ordered after V)."""
    from puregraphdb_spark.sources.registry import final_sort, load_table

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 10 == 0
    ).select(F.col("o_orderkey").alias("k"),
             F.col("o_orderdate").alias("d"),
             F.col("o_totalprice").alias("p"))
    day = lambda n: F.expr(f"interval {n} days")  # noqa: E731
    v1 = o.select("k", F.col("d").alias("valid_from"),
                  F.col("d").alias("txn_ts"), F.col("p").alias("price"))
    v2 = o.filter(F.col("k") % 30 == 0).select(
        "k", F.col("d").alias("valid_from"),
        (F.col("d") + day(20)).alias("txn_ts"),
        (F.col("p") + F.lit(50.0)).alias("price"))
    v3 = o.filter(F.col("k") % 20 == 0).select(
        "k", (F.col("d") + day(10)).alias("valid_from"),
        (F.col("d") + day(10)).alias("txn_ts"),
        (F.col("p") + F.lit(100.0)).alias("price"))
    versions = v1.unionByName(v2).unionByName(v3)
    res = bitemporal_asof(
        versions, "k", "valid_from", "txn_ts",
        "1996-07-01 00:00:00", "1996-07-15 00:00:00")
    return final_sort(res, spark, sf_dir, "orders", "k")


def q167_scd1_upsert(spark, sf_dir: str) -> DataFrame:
    """ORACLED upsert identity: the maintained dimension (anti-join +
    batch-latest union — the plan that never windows the dimension)
    must equal the naive recompute (latest version per key over the
    FULL union), which is what the DuckDB oracle runs. Plants a
    deterministic CDC batch over orders: every %11 key gets a
    version-1 update (+10.00, status 'U1'); every %22 key also a
    version-2 update (+20.00, 'U2') — exercising update-wins,
    latest-of-batch, and untouched rows in one relation. The result
    is rolled up per status (count + exact decimal price sum) so the
    compared frame stays bounded at any scale while still pinning
    every maintained row's membership and values."""
    from puregraphdb_spark.sources.registry import final_sort, load_table

    o = load_table(spark, sf_dir, "orders")
    ok = F.col("o_orderkey")
    dim = o.select(
        ok.alias("k"), F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.lit(0).cast("long").alias("version"),
    )
    u1 = o.filter(ok % 11 == 0).select(
        ok.alias("k"), F.lit("U1").alias("status"),
        (F.col("o_totalprice") + 10.0).alias("price"),
        F.lit(1).cast("long").alias("version"),
    )
    u2 = o.filter(ok % 22 == 0).select(
        ok.alias("k"), F.lit("U2").alias("status"),
        (F.col("o_totalprice") + 20.0).alias("price"),
        F.lit(2).cast("long").alias("version"),
    )
    maintained = apply_cdc_upsert(dim, u1.unionByName(u2), "k",
                                  "version")
    res = (
        maintained.groupBy("status")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum(F.col("price").cast("decimal(24,2)")), 2)
            .cast("double").alias("sum_price"),
        )
    )
    return final_sort(res, spark, sf_dir, "orders", "status")
