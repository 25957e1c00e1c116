"""Data-profiling operators: per-column table profiles and foreign-key
integrity audits — the `SUMMARIZE` / data-quality surface a warehouse
engine exposes before any pipeline trusts a new load.

Both operators are exact (integer counts only, no formatted min/max
strings — cross-engine value formatting of decimals/timestamps is the
one thing that can NEVER hash-match, so the profile sticks to the
stats both engines compute identically).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from puregraphdb_spark.functions.numeric import decimal_round
from puregraphdb_spark.sources.registry import final_sort, load_table


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: row count, null count, exact distinct count.

    One aggregate pass computes every column's stats together; the
    single result row is then exploded into one output row per column
    (the stats live in an array of structs, so the reshape is a
    map-side explode of ONE row — no unpivot shuffle, no per-column
    scan).

    Scale: n columns of exact ``countDistinct`` in one aggregate plan
    as a single Expand (n× row multiplication) + one shuffle — the
    standard exact lowering. At 100 TB swap ``countDistinct`` for
    ``approx_count_distinct`` (HLL): the Expand disappears and the
    whole profile is one map-side-combined pass; exact is kept here
    because it is what a cross-engine oracle can verify.
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("table_profile needs at least one column")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"__nn_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
        )
        for c in cols
    ])
    return (
        one.select(F.col("n_rows").cast("long").alias("n_rows"),
                   F.explode(per_col).alias("s"))
        .select("s.col_name", "n_rows", "s.n_nulls", "s.n_distinct")
    )


def fk_integrity(child: DataFrame, child_key: str,
                 parent: DataFrame, parent_key: str,
                 rel: str, hint=None) -> DataFrame:
    """One-row referential-integrity audit for ``child.child_key →
    parent.parent_key``: child rows, null FKs, distinct child keys,
    orphaned child keys (no matching parent), parent keys, and
    unreferenced parents (childless).

    Orphans SHOULD be zero on a consistent warehouse — the audit's
    value is proving it, and the unreferenced-parent count (parts never
    ordered, customers who never bought) is the non-trivial number that
    makes the check discriminating.

    Scale: the child side collapses to its distinct key set first (one
    map-side-combined shuffle on the key — the only fact-wide
    exchange), then ONE full-outer key join against the distinct
    parent keys yields every set-level stat (child keys, orphans,
    parents, unreferenced) in a single aggregate — not four separate
    anti-join/count plans that each re-derive the key sets. The two
    1-row aggregates combine via a broadcast cross join (scalar
    composition, not a data join).

    ``hint`` optionally wraps the parent key set (a full-outer join
    cannot broadcast, but callers with a measured source size pass
    ``shuffle_hash_if_small`` to skip both SMJ sort passes — guide
    §3.1; unhinted keeps the spill-graceful sort-merge default).
    """
    ck = F.col(child_key)
    child_stats = child.agg(
        F.count(F.lit(1)).cast("long").alias("n_child"),
        F.sum(F.when(ck.isNull(), 1).otherwise(0))
        .cast("long").alias("n_null_fk"),
    )
    ckeys = (
        child.select(ck.alias("k")).filter(F.col("k").isNotNull())
        .distinct().withColumn("c", F.lit(1))
    )
    pkeys = (
        parent.select(F.col(parent_key).alias("k"))
        .distinct().withColumn("p", F.lit(1))
    )
    if hint is not None:
        pkeys = hint(pkeys)
    set_stats = (
        ckeys.join(pkeys, "k", "full_outer")
        .agg(
            F.sum(F.coalesce(F.col("c"), F.lit(0)))
            .cast("long").alias("n_child_keys"),
            F.sum(F.when(F.col("p").isNull(), 1).otherwise(0))
            .cast("long").alias("n_orphan_keys"),
            F.sum(F.coalesce(F.col("p"), F.lit(0)))
            .cast("long").alias("n_parents"),
            F.sum(F.when(F.col("c").isNull(), 1).otherwise(0))
            .cast("long").alias("n_unref_parents"),
        )
    )
    out = child_stats.crossJoin(F.broadcast(set_stats))
    return out.select(
        F.lit(rel).alias("rel"), "n_child", "n_null_fk",
        "n_child_keys", "n_orphan_keys", "n_parents", "n_unref_parents",
    )


def q117_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-column profile of `orders` — the first query anyone runs
    against a table they did not write."""
    res = table_profile(load_table(spark, sf_dir, "orders"))
    return final_sort(res, spark, sf_dir, "orders", "col_name")


#: The fixture schema's FK graph (child, child_key, parent, parent_key).
_FIXTURE_FKS = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
)


def q118_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the fixture's five FK edges.
    The unreferenced-parent counts (never-ordered parts, customers with
    no orders) are the discriminating values; orphan counts prove the
    zero the loader promises.
    """
    # The five full-outer key joins stay sort-merge DELIBERATELY
    # (r15, VERDICT r14 item 5 measured): a gated SHUFFLE_HASH on the
    # parent key sets was tried and measured SLOWER — isolated
    # interleaved best-of-5 noop 0.314 → 0.336 s (1.07×), faster on
    # only 1/5 runs. At this 0.3 s floor-dominated size the hash
    # build + full-outer probe bookkeeping costs more than the two
    # sort passes it removes; fk_integrity keeps the ``hint`` seam
    # for callers with a measured win.
    audits = [
        fk_integrity(
            load_table(spark, sf_dir, c), ck,
            load_table(spark, sf_dir, p), pk,
            rel=f"{c}.{ck}->{p}.{pk}",
        )
        for c, ck, p, pk in _FIXTURE_FKS
    ]
    res = reduce(DataFrame.unionByName, audits)
    return final_sort(res, spark, sf_dir, "lineitem", "rel")


def grouped_profile(df: DataFrame, batch_col: str,
                    columns: list[str]) -> DataFrame:
    """``table_profile`` at a batch grain: one aggregate pass computes
    every column's (n_rows, n_nulls, exact n_distinct) PER BATCH, then
    the per-batch row explodes map-side into one row per column —
    same single-Expand lowering as ``table_profile``, keyed shuffle on
    the batch column instead of a global aggregate.
    """
    if not columns:
        raise ValueError("grouped_profile needs at least one column")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in columns:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.groupBy(F.col(batch_col).alias("batch")).agg(*aggs)
    per_col = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"__nn_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
        )
        for c in columns
    ])
    return (
        one.select("batch", F.col("n_rows"),
                   F.explode(per_col).alias("s"))
        .select("batch", "s.col_name", "n_rows", "s.n_nulls",
                "s.n_distinct")
    )


def profile_drift(df: DataFrame, batch_col: str,
                  columns: list[str]) -> DataFrame:
    """Two-batch profile-drift report — the load-monitoring check a
    pipeline runs when a NEW batch of a feed lands: per column, the
    old/new row, null, and distinct counts side by side plus
    rows_ratio and distinct_ratio (a distinct_ratio far from
    rows_ratio flags key-space collapse or explosion — e.g. an
    upstream re-keying — before the batch is trusted). Exactly two
    batch values are expected; the lexicographically FIRST batch is
    the baseline ``a``.

    All counts are exact integers; the two ratios are quotients of
    exact longs (identical doubles both engines) decimal-snapped.

    Scale: one grouped profile pass (single Expand + one keyed
    shuffle); the a/b align is a conditional-aggregation pivot of the
    tiny profile relation — NOT two filters of the same lineage joined
    back together, which would re-execute the profile pass per side
    (the q153/r11 lineage-dedup rule).
    """
    prof = grouped_profile(df, batch_col, columns)
    from puregraphdb_spark.functions.numeric import decimal_round

    # fold each column's (exactly two) batch rows into a batch-sorted
    # struct array: element 1 is the baseline, element -1 the new
    # batch — prof has ONE consumer, so the profile pass (and the
    # scan under it) executes exactly once (a labels-aggregate or a
    # filter pair would be a second consumer re-running the lineage)
    folded = prof.groupBy("col_name").agg(
        F.array_sort(F.collect_list(F.struct(
            "batch", "n_rows", "n_nulls", "n_distinct"))).alias("r"))
    # single-batch input yields NO rows rather than silently comparing
    # a batch to itself (a vacuous "no drift" is the dangerous output
    # for a monitor); callers see an empty report until the second
    # batch lands
    folded = folded.filter(F.size("r") >= 2)
    a = F.element_at("r", 1)
    bb = F.element_at("r", -1)
    joined = folded.select(
        "col_name",
        a["n_rows"].alias("n_rows_a"), bb["n_rows"].alias("n_rows_b"),
        a["n_nulls"].alias("n_nulls_a"),
        bb["n_nulls"].alias("n_nulls_b"),
        a["n_distinct"].alias("n_distinct_a"),
        bb["n_distinct"].alias("n_distinct_b"),
    )
    return joined.select(
        "col_name", "n_rows_a", "n_rows_b", "n_nulls_a", "n_nulls_b",
        "n_distinct_a", "n_distinct_b",
        decimal_round(
            F.col("n_rows_b").cast("double")
            / F.col("n_rows_a").cast("double"), 6, grid=10,
        ).alias("rows_ratio"),
        decimal_round(
            F.col("n_distinct_b").cast("double")
            / F.col("n_distinct_a").cast("double"), 6, grid=10,
        ).alias("distinct_ratio"),
    )


def q155_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile drift between the first and second half-month of
    `events` (fixed boundary 2024-01-16, both engines compare the
    same µs NTZ instant) over the id/user/type/value columns. The
    LIVE sibling is streaming/quality.windowed_profile +
    profile_alerts (per-window HLL profile vs a reference); this is
    the exact batch-vs-batch comparison run at load time."""
    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"),
               F.lit("a")).otherwise(F.lit("b")).alias("batch"),
        "event_id", "user_id", "event_type", "value",
    )
    res = profile_drift(
        ev, "batch", ["event_id", "user_id", "event_type", "value"])
    return final_sort(res, spark, sf_dir, "events", "col_name")


def k_anonymity_report(df: DataFrame, quasi_cols: list[str],
                       k: int = 5, report_col: str | None = None)\
        -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple (Sweeney 2002):
    every row whose quasi-identifier equivalence class holds fewer
    than ``k`` rows is re-identifiable by linking those attributes —
    the release-gate check a curation pipeline runs on metadata
    columns BEFORE publishing a corpus, the tabular complement of the
    q146 PII content scan. Emits, per ``report_col`` (default: first
    quasi column): equivalence-class count, classes below k, rows at
    risk (members of small classes), the risk ratio, and the smallest
    class size observed.

    Exact end-to-end: every emitted number except the final snapped
    ratio is a bigint count.

    Scale: ONE shuffle to the equivalence-class grain with map-side
    combine (the class relation is |distinct quasi tuples|, ≪ rows),
    then a tiny-key rollup. No windows, no joins, no row collect.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity_report needs quasi columns")
    rc = report_col or quasi_cols[0]
    classes = (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").cast("long").alias("sz"))
    )
    return (
        classes.groupBy(rc)
        .agg(
            F.sum("sz").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_classes"),
            F.sum(F.when(F.col("sz") < k, 1).otherwise(0))
            .cast("long").alias("n_small_classes"),
            F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0))
            .cast("long").alias("n_rows_at_risk"),
            F.min("sz").cast("long").alias("min_class_size"),
        )
        .select(
            rc, "n_rows", "n_classes", "n_small_classes",
            "n_rows_at_risk", "min_class_size",
            decimal_round(
                F.col("n_rows_at_risk").cast("double")
                / F.col("n_rows").cast("double"), 6, grid=10,
            ).alias("risk_ratio"),
        )
    )


def l_diversity_report(df: DataFrame, quasi_cols: list[str],
                       sensitive_col: str, l: int = 2,
                       report_col: str | None = None) -> DataFrame:
    """l-diversity audit (Machanavajjhala 2007) — the attribute-
    disclosure sibling of ``k_anonymity_report``: a quasi-identifier
    class can be large (k-anonymous) yet reveal everyone's sensitive
    value if all its members SHARE that value. Emits, per
    ``report_col``: classes, classes with fewer than ``l`` distinct
    sensitive values, rows inside those low-diversity classes, the
    worst (minimum) diversity observed, and the exposure ratio —
    run together with the k-report as the release gate.

    Exact end-to-end: distinct counts and class sizes are bigints;
    ONE shuffle to the (quasi, —) grain with map-side combine (the
    countDistinct plans as two-phase partial aggregation), then a
    tiny-key rollup — the q161 plan shape with one extra grain.
    """
    if not quasi_cols:
        raise ValueError("l_diversity_report needs quasi columns")
    rc = report_col or quasi_cols[0]
    classes = (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").cast("long").alias("sz"),
             F.countDistinct(sensitive_col).cast("long").alias("lv"))
    )
    return (
        classes.groupBy(rc)
        .agg(
            F.sum("sz").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_classes"),
            F.sum(F.when(F.col("lv") < l, 1).otherwise(0))
            .cast("long").alias("n_low_diversity"),
            F.sum(F.when(F.col("lv") < l, F.col("sz")).otherwise(0))
            .cast("long").alias("n_rows_exposed"),
            F.min("lv").cast("long").alias("min_diversity"),
        )
        .select(
            rc, "n_rows", "n_classes", "n_low_diversity",
            "n_rows_exposed", "min_diversity",
            decimal_round(
                F.col("n_rows_exposed").cast("double")
                / F.col("n_rows").cast("double"), 6, grid=10,
            ).alias("exposure_ratio"),
        )
    )


def q175_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l=2 diversity audit of the documents metadata release: quasi
    identifiers (lang, length band) — sensitive attribute = source
    (see ``l_diversity_report``), reported per lang. Uses the q161
    banding (explicit floor: Spark's double→long cast truncates,
    DuckDB's rounds)."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "source",
        F.floor(F.col("n_chars") / F.lit(10)).cast("long")
        .alias("len_band"),
    )
    res = l_diversity_report(d, ["lang", "len_band"], "source", l=2)
    return final_sort(res, spark, sf_dir, "documents", "lang")


def q161_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=5 anonymity audit of the documents metadata release
    (lang × source × 10-char length band — see
    ``k_anonymity_report``), reported per lang. The length band is
    integer floor division, identical on both engines; no plant is
    needed — the natural (lang, source, band) classes already span
    both regimes (singleton long-doc bands and dense mid-bands)."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "source",
        # floor, not a double→long cast: Spark's cast truncates while
        # DuckDB's ROUNDS — explicit floor is the only spelling both
        # engines agree on.
        F.floor(F.col("n_chars") / F.lit(10)).cast("long")
        .alias("len_band"),
    )
    res = k_anonymity_report(d, ["lang", "source", "len_band"], k=5)
    return final_sort(res, spark, sf_dir, "documents", "lang")


#: log10(1 + 1/d) for d = 1..9, hardcoded as shared literals so no
#: libm runs in EITHER engine at query time (the q70 no-libm rule) —
#: the Benford reference distribution (Newcomb 1881 / Benford 1938).
_BENFORD = [0.301029995663981, 0.176091259055681, 0.124938736608300,
            0.096910013008056, 0.079181246047625, 0.066946789630613,
            0.057991946977687, 0.051152522447381, 0.045757490560675]


def benford_profile(df: DataFrame, val_col: str,
                    scale: int = 2) -> DataFrame:
    """First-significant-digit profile of a positive numeric column
    against Benford's law — the data-quality screen auditors run on
    monetary columns (fabricated or gridded data bends the curve).
    One row per digit 1-9: (digit, n, share, benford, delta).

    Cross-engine exactness: the digit comes from the DECIMAL STRING
    of the value (cast to decimal(18,scale) first — both engines
    print the same grid value identically; extracting the first
    [1-9] avoids the log10/floor libm path entirely, and handles
    values < 1 by skipping leading zeros). Counts are bigints; share
    is one division snapped; benford is a shared literal; delta is
    IEEE subtraction of identical doubles, snapped.

    Scale: one map (cast + regexp) + ONE shuffle to ≤ 9 groups with
    map-side partial aggregation.
    """
    digit = F.regexp_extract(
        F.col(val_col).cast(f"decimal(18,{scale})").cast("string"),
        "[1-9]", 0)
    counted = (
        df.select(digit.alias("digit"))
        .filter(F.col("digit") != "")
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    total = counted.agg(F.sum("n").cast("long").alias("total"))
    bref = F.element_at(
        F.array(*[F.lit(b) for b in _BENFORD]),
        F.col("digit").cast("int"))
    return (
        counted.crossJoin(F.broadcast(total))
        .select(
            F.col("digit").cast("int").alias("digit"), "n",
            decimal_round(
                F.col("n").cast("double")
                / F.col("total").cast("double"), 6, grid=10,
            ).alias("share"),
            F.round(bref, 6).alias("benford"),
            decimal_round(
                F.col("n").cast("double")
                / F.col("total").cast("double") - bref, 6, grid=10,
            ).alias("delta"),
        )
    )


def q184_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLED Benford first-digit audit of lineitem extended prices
    (see ``benford_profile``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return final_sort(benford_profile(li, "l_extendedprice"),
                      spark, sf_dir, "lineitem", "digit")
