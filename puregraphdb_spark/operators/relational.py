"""Relational core: scan/filter/project, aggregates, joins, windows,
set ops, top-k, percentiles, scalar functions (SURVEY.md §2 q01–q19).

Every function takes ``(spark, sf_dir)`` and returns a lazy DataFrame —
the exact signature the driver's correctness harness calls. All column
aliases are part of the oracle contract (SURVEY.md Appendix A).

Scale notes are per-query docstrings: shuffles counted, broadcast
decisions stated. Conventions used everywhere:

- Aggregates over doubles are rounded (2–4 dp) on BOTH engines so
  order-insensitive value hashes match despite float summation order
  (SURVEY.md §7.4.1).
- Integer-valued derived columns are cast to ``long`` because DuckDB
  returns BIGINT where Spark returns int (row_number, year, length).
- Every LIMIT carries a total-order tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from puregraphdb_spark.functions.numeric import (
    decimal_round, decimal_sum_round, unscaled_sum_round,
)
from puregraphdb_spark.sources.registry import (
    final_sort, load_table, table_bytes,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _money_sum(spark: SparkSession, sf_dir: str, col: F.Column) -> F.Column:
    """Exact 2-dp rounded sum of an exact-4-dp monetary expression —
    size-gated between the two bit-identical forms: unscaled-long sums
    under the gate (per-row decimal casts cost ~35% of a fixture-scale
    aggregation's wall time), unbounded decimal sums past it (long
    unscaled totals would overflow 2^53 exactness at cluster scale)."""
    if table_bytes(spark, sf_dir, "lineitem") < (32 << 20):
        return unscaled_sum_round(col)
    return decimal_sum_round(col)


def q01_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate filter + arithmetic projection on lineitem.

    Scale: 0 shuffles. Both predicates and the 5-column projection push
    into the parquet scan (PushedFilters + ReadSchema); at 100 TB this is
    a pure embarrassingly-parallel scan with row-group skipping on
    l_shipdate statistics.
    """
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") > 0.05)
            & (F.col("l_returnflag") == "R")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            # decimal grid: price·(1−disc) is an exact 4-dp number whose
            # half-boundary cases double-rounding would split with the
            # oracle (functions.numeric docstring).
            decimal_round(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("net_price"),
        )
    )


def q02_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style multi-aggregate group-by.

    Scale: 1 shuffle on (l_returnflag, l_linestatus) — 6 groups, so the
    partial (map-side) aggregation reduces ~everything before exchange;
    whole-stage codegen covers scan→partial-agg.
    """
    l = _t(spark, sf_dir, "lineitem")
    return final_sort(
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _money_sum(
                spark, sf_dir,
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        ),
        spark, sf_dir, "lineitem", "l_returnflag", "l_linestatus",
    )


def q03_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) on two columns per group.

    Scale: Spark's multi-distinct Expand plan — the stream is
    replicated once per distinct column through the first exchange,
    with map-side partial dedup on each (flag, key) replica. Measured
    against the two-single-distinct-aggs-joined alternative at sf0.1:
    Expand 0.19 s vs 0.29 s — one scan beats two, and at scale the
    post-dedup exchange sizes (≈|distinct| per column) are what cross
    the wire either way. Exact distinct is the contract here; the
    approx path (HLL sketches, 1 shuffle) is `approx_count_distinct` —
    not oracled (SURVEY §2.2).
    """
    l = _t(spark, sf_dir, "lineitem")
    # fold=True (r15): the sort key IS the grouping key and the final
    # count-merge above the last exchange is ~3 rows, so the
    # one-partition sort folds into the aggregate's own shuffle stage
    # (one fewer Exchange + one fewer scheduling round — guide §2.4).
    return final_sort(
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supp"),
        ),
        spark, sf_dir, "lineitem", "l_returnflag", fold=True,
    )


def q04_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(returnflag, linestatus) with 'ALL' placeholder rows.

    Scale: rollup = Expand (3 grouping sets) + 1 shuffle; group count is
    tiny so exchange volume is the number of sets × groups.
    """
    l = _t(spark, sf_dir, "lineitem")
    return final_sort(
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "sum_qty",
        ),
        spark, sf_dir, "lineitem", "rf", "ls",
    )


def q05_join_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join → group → top-10 by revenue (TPC-H Q3 shape).

    Scale: customer (filtered on segment) broadcasts under the 64 MB
    threshold → lineitem never shuffles for the join; 1 shuffle for the
    groupBy(o_orderkey); orderBy+limit compiles to TakeOrderedAndProject
    (per-partition top-k, no global sort). No forced hint — customer
    grows with the data, so the threshold decides from file size
    (broadcast here, custkey shuffle join at 100 TB).
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(_money_sum(
            spark, sf_dir,
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
        ).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def q06_join_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-table star join with a two-column join condition.

    Scale (round-3 rewrite): the dim chain customer⋈nation⋈region(ASIA)
    is PRE-COMPOSED into one custkey→(nationkey, n_name) map before it
    ever touches the fact stream — the fact side sees TWO broadcast
    probes (cdim, supplier) instead of four chained BroadcastExchange
    builds. The pre-composition joins run over dim-sized inputs only.
    cdim derives from customer (scale-growing), so its hint is
    size-aware (``broadcast_if_small`` on the measured customer bytes):
    broadcast at fixture scale, shuffle join at 100 TB. The
    s_nationkey=c_nationkey residual rides on the supplier broadcast.
    The only wide shuffles at scale: orders⋈lineitem (co-partitioned on
    orderkey) and the final 5-group agg.
    """
    from puregraphdb_spark.sources.registry import broadcast_if_small

    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cdim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name")
    )
    cdim = broadcast_if_small(cdim, spark, sf_dir, "customer")
    return final_sort(
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cdim, o.o_custkey == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey)
            & (s.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(_money_sum(
            spark, sf_dir,
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
        ).alias("revenue")),
        spark, sf_dir, "lineitem", F.desc("revenue"), "nation",
    )


def q07_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders (NOT EXISTS → left_anti).

    Scale: anti join shuffles both sides on custkey unless the right
    side broadcasts; orders' single projected column broadcasts far
    longer than the full table would.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return final_sort(
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name"),
        spark, sf_dir, "orders", "c_custkey",
    )


def q08_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count of customers having at least one 'F' order (EXISTS → left_semi).

    Returns a 1-row DataFrame (column n_cust) per the oracle contract.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count("*").alias("n_cust"))
    )


def q09_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order count including zero-order customers.

    F.count(col) is null-skipping (left-outer misses count as 0);
    sum over no rows is NULL → coalesce to 0 before rounding.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return final_sort(
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total"),
        ),
        spark, sf_dir, "orders", "c_custkey",
    )


def q10_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems shipped within 90 days of their order date.

    Scale: the equi key (orderkey) keeps this a hash join with the
    BETWEEN as a cheap residual predicate — NOT a cartesian range join.
    This is the pattern for any interval join that has a natural equi
    key; pure range joins without one need bucketized banding.
    """
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & l.l_shipdate.between(
                o.o_orderdate, o.o_orderdate + F.expr("INTERVAL 90 DAYS")
            ),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        )
    )


def q11_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (ranking window).

    Scale: 1 shuffle on the partition key + in-partition sort; rank
    filter applies before any downstream consumer. rn cast to long
    (DuckDB row_number → BIGINT).
    """
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return final_sort(
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3),
        spark, sf_dir, "orders", "o_custkey", "rn",
    )


def q12_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (frame-based window aggregate)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return final_sort(
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        ),
        spark, sf_dir, "orders", "o_custkey", "o_orderkey",
        row_preserving=True,
    )


def q13_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta vs previous order price (analytic lag window)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return final_sort(
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(w), 2
            ).alias("delta"),
        ),
        spark, sf_dir, "orders", "o_custkey", "o_orderkey",
        row_preserving=True,
    )


def q14_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations present among both customers and suppliers
    (IN-subqueries via left_semi, then INTERSECT)."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    in_cust = n.join(c, n.n_nationkey == c.c_nationkey, "left_semi").select("n_nationkey")
    in_supp = n.join(s, n.n_nationkey == s.s_nationkey, "left_semi").select("n_nationkey")
    return final_sort(in_cust.intersect(in_supp),
                      spark, sf_dir, "customer", "n_nationkey")


def q15_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct union of customer/supplier nations minus region-0 nations.

    SQL UNION is distinct; subtract() is EXCEPT DISTINCT — both match the
    oracle's set semantics.
    """
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    n0 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select(F.col("n_nationkey").alias("k"))
    )
    return final_sort(c.union(s).distinct().subtract(n0),
                      spark, sf_dir, "customer", "k")


def q16_topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 (brand, type) by shipped quantity.

    Scale: part broadcasts under the threshold (no forced hint — part
    grows with the data); 1 shuffle for the agg; top-k via
    TakeOrderedAndProject with full tiebreakers.
    """
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
        .orderBy(F.desc("qty"), "p_brand", "p_type")
        .limit(15)
    )


#: GK sketch accuracy for the percentile bracket: guaranteed rank error
#: ≤ n/_PCT_ACC per group. Coarser = cheaper sketch build/merge; the
#: exact refinement pass absorbs any band the bound permits (results
#: are identical for any valid accuracy — verified 100/200/400/1000 at
#: sf0.1). 400 measured fastest: the pass-1 GK insert cost dominates
#: the slightly wider (10n/acc) collected band.
_PCT_ACC = 400
#: Bracketing with a fixed ±5/_PCT_ACC percentile margin guarantees
#: the band covers ranks floor(pos)±1 when (5-1)·n/_PCT_ACC ≥ ~2 —
#: i.e. n ≳ _PCT_ACC/2. Groups at or below this threshold simply
#: collect all their values (bounded memory by construction) and index
#: exactly; found by the hypothesis property test on 2-element groups,
#: where the sketch bracket excluded the true interpolation neighbor.
_PCT_SMALL_GROUP = 1000


def q17_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + p90 per returnflag — size-gated dual plan.

    Measured-small inputs (gate, not hint): ONE collect-and-sort
    aggregation pass (collect_exact_percentile_cont, 0.31 s at sf0.1).
    Past the gate, the bracket-and-refine operator
    (operators/percentile.py): GK-sketch bracket → size-chosen
    grid-refinement rounds → exact bounded-band extraction + linear
    interpolation (DuckDB's percentile_cont arithmetic) — the number
    of refinement passes is derived from a METADATA row estimate, so
    the collected band is ≤ ~band_target values per group at ANY
    input size: at 10¹² rows, three extra sketch passes instead of a
    10¹⁰-value aggregation buffer. Both plans share the interpolation
    arithmetic and are property-tested equal.

    Alternatives measured (sf0.1, warm cache, fresh plans): row-level
    window sort 1.1 s (the 3-value group key serializes the sort into
    3 tasks); built-in F.percentile 0.85 s (whole value buffers cross
    the exchange); distinct-value histogram + cumulative window ~1.0 s
    (fixture prices are 97% distinct — no compression). Every pass here
    is a map-side-combining hash agg whose shuffle payload is a sketch
    (KB) or the bounded band, never the data.
    """
    from puregraphdb_spark.operators.percentile import (
        collect_exact_percentile_cont, estimate_rows, exact_percentile_cont,
    )
    from puregraphdb_spark.sources.registry import table_bytes

    l = _t(spark, sf_dir, "lineitem")
    vals = l.select("l_returnflag", F.col("l_extendedprice").alias("val"))
    if table_bytes(spark, sf_dir, "lineitem") < (32 << 20):
        # measured-small input: one collect-and-sort pass (the whole
        # input is megabytes — gate, not hint, decides; identical
        # interpolation arithmetic, verified equal by tests)
        res = collect_exact_percentile_cont(
            vals, "l_returnflag", "val", [0.5, 0.9]
        )
    else:
        res = exact_percentile_cont(
            vals, "l_returnflag", "val", [0.5, 0.9],
            accuracy=_PCT_ACC, small_group=_PCT_SMALL_GROUP,
            n_estimate=estimate_rows(spark, sf_dir, "lineitem"),
        )
    return final_sort(res.select(
        "l_returnflag",
        # grid=6: interpolated values are identical binary doubles on
        # both engines; the decimal snap makes the final 2-dp rounding
        # decision identical too (midpoints of 2-dp prices can be
        # exact .xx5).
        decimal_round(F.col("p_0"), 2, grid=6).alias("med_price"),
        decimal_round(F.col("p_1"), 2, grid=6).alias("p90"),
    ), spark, sf_dir, "lineitem", "l_returnflag")


def q18_string_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/date kitchen sink (upper/substr/length/concat,
    year/month). Integer-valued scalars cast to long to match DuckDB.

    No broadcast hint on customer: it grows with the data, and the
    64 MB autoBroadcastJoinThreshold picks the broadcast from measured
    file size — right at fixture scale, and still right at 100 TB where
    a forced hint would OOM the build side."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 1000 == 7)
    return final_sort(
        o.join(c, o.o_custkey == c.c_custkey),
        spark, sf_dir, "orders", "o_orderkey",
    ).select(
        F.upper(F.substring("c_name", 1, 8)).alias("cpfx"),
        F.length("c_name").cast("long").alias("nlen"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.concat_ws("-", "c_mktsegment", "o_orderpriority").alias("tag"),
    )


def q19_case_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation + math scalars (CASE WHEN, sqrt, abs)."""
    l = _t(spark, sf_dir, "lineitem")
    return final_sort(
        l.groupBy("l_linestatus")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(0.0)
                ),
                2,
            ).alias("hi_disc"),
            F.round(F.sum(F.sqrt("l_quantity")), 2).alias("sq"),
            F.round(F.sum(F.abs(F.col("l_tax") - 0.04)), 4).alias("tax_dev"),
        ),
        spark, sf_dir, "lineitem", "l_linestatus",
    )
