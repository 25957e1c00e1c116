"""Event-stream operators, batch-first (SURVEY.md §2 q20–q22).

Batch DataFrames here; the same logical shapes deploy as Structured
Streaming in puregraphdb_spark.streaming.windows (readStream +
watermark + window/session_window). The batch versions are the oracled
ones — the streaming versions share the column contracts.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from puregraphdb_spark.functions.intervals import interval_expr
from puregraphdb_spark.functions.numeric import decimal_round, decimal_sum_round
from puregraphdb_spark.sources.registry import final_sort, load_table


def tumbling_window(events: DataFrame, duration: str = "1 hour",
                    ordered: bool = True) -> DataFrame:
    """Epoch-aligned tumbling event-time buckets × event_type.

    F.window's bucket starts are epoch-aligned, matching DuckDB
    time_bucket semantics for whole-hour intervals.
    Scale: 1 shuffle on (win, event_type); partial agg first.
    ``ordered=False`` skips the final sort for callers that apply their
    own (the oracled wrapper uses the size-gated ``final_sort``).
    """
    res = (
        events.groupBy(
            F.window("ts", duration).start.alias("win"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            # value is exact 3-dp; decimal sum makes the .xx5-boundary
            # rounding identical to the oracle (functions.numeric).
            decimal_sum_round(F.col("value"), 2, grid=3).alias("sum_val"),
        )
    )
    return res.orderBy("win", "event_type") if ordered else res


_GAP_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _gap_seconds(gap: str) -> int:
    """Parse an interval string like '30 minutes' into seconds."""
    qty, _, unit = gap.strip().partition(" ")
    try:
        return int(qty) * _GAP_UNITS[unit.strip().lower()]
    except (ValueError, KeyError):
        raise ValueError(f"unsupported gap interval: {gap!r}") from None


def sessionize(events: DataFrame, gap: str = "30 minutes",
               ordered: bool = True) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap to the previous event of the same user exceeds ``gap``.

    Batch formulation: lag + cumulative sum over a per-user window —
    2 window passes over one shuffle on user_id (both windows share the
    partitioning, Catalyst plans a single exchange). Streaming-native
    equivalent: F.session_window (see streaming.windows).

    sid is cast to long on both engines (DuckDB sum(int) is HUGEINT).
    The gap compares exact epoch *microseconds* (``unix_micros`` — full
    TimestampType precision): fixture timestamps carry sub-second noise,
    and truncating to whole seconds would misclassify gaps within ±1 s of
    the threshold.
    """
    gap_us = _gap_seconds(gap) * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_s = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > F.lit(gap_us)),
        1,
    ).otherwise(0)
    res = (
        events.select("user_id", "ts", new_s.alias("new_s"))
        .select(
            "user_id",
            "ts",
            F.sum("new_s").over(wcum).cast("long").alias("sid"),
        )
        .groupBy("user_id", "sid")
        .agg(F.count("*").alias("n_events"))
    )
    return res.orderBy("user_id", "sid") if ordered else res


def q20_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return final_sort(
        tumbling_window(load_table(spark, sf_dir, "events"), ordered=False),
        spark, sf_dir, "events", "win", "event_type",
    )


def q21_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return final_sort(
        sessionize(load_table(spark, sf_dir, "events"), ordered=False),
        spark, sf_dir, "events", "user_id", "sid",
    )


def q22_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average of JSON field $.k per event_type — semi-structured props
    parsed on use (get_json_object stays JVM-side/codegen)."""
    e = load_table(spark, sf_dir, "events")
    return final_sort(
        e.groupBy("event_type")
        .agg(
            decimal_round(
                F.avg(F.get_json_object("props", "$.k").cast("double")),
                4, grid=8,
            ).alias("avg_k")
        ),
        spark, sf_dir, "events", "event_type",
    )


def funnel(events: DataFrame, stages: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           within: str | None = None) -> DataFrame:
    """Ordered-funnel stage table: for each user, the FIRST time they
    completed each stage strictly after completing the previous one
    (the standard product-analytics funnel with strict ordering).
    Returns (user, stage_index, stage, ts) rows for reached stages.

    ``within``: optional conversion window (e.g. ``'7 days'``) — each
    stage must complete within that interval AFTER the previous
    stage's completion, the bounded-funnel variant every product
    funnel eventually needs (unbounded funnels overcount conversions
    that happen months later). The FIRST qualifying event is still
    the completion; a user whose only stage-i events fall outside the
    window never reaches stage i (and so never reaches i+1).

    Scale: one min-agg + one co-keyed join per stage, all on the user
    key — with the events table bucketed by user the whole funnel is
    shuffle-free; no window over the full event stream is ever built.
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    reached: DataFrame | None = None
    out: DataFrame | None = None
    for i, stage in enumerate(stages):
        ev = events.filter(F.col(type_col) == stage)
        if reached is None:
            cur = ev.groupBy(user_col).agg(F.min(ts_col).alias("__t"))
        else:
            gate = F.col(ts_col) > F.col("__prev")
            if within is not None:
                gate = gate & (
                    F.col(ts_col)
                    <= F.col("__prev") + interval_expr(within)
                )
            cur = (
                ev.join(reached.select(user_col, "__t").withColumnRenamed(
                    "__t", "__prev"), user_col)
                .filter(gate)
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("__t"))
            )
        stage_rows = cur.select(
            user_col,
            F.lit(i).cast("long").alias("stage_index"),
            F.lit(stage).alias("stage"),
            F.col("__t").alias("ts"),
        )
        out = stage_rows if out is None else out.unionByName(stage_rows)
        reached = cur
    return out


def stage_frame(spark: SparkSession, stages: list[str]) -> DataFrame:
    """(stage_index, stage) frame as a LocalRelation (SQL VALUES).

    ``spark.createDataFrame`` parallelizes even a 3-row frame into a
    defaultParallelism-task ``Scan ExistingRDD`` — on q87 at sf0.1 that
    RDD scan (and the extra job barriers it forces around the zero-fill
    join) measured 0.37 s vs 0.18 s for this LocalRelation form, which
    codegens and broadcasts for free (VERDICT r6 regression item).
    Stage names are validated because they are interpolated into SQL.
    """
    for s in stages:
        if not re.fullmatch(r"[A-Za-z0-9_ .:-]+", s):
            raise ValueError(f"unsupported stage name: {s!r}")
    vals = ", ".join(f"({i}, '{s}')" for i, s in enumerate(stages))
    return spark.sql(
        "SELECT CAST(stage_index AS LONG) AS stage_index, stage "
        f"FROM VALUES {vals} AS t(stage_index, stage)"
    )


def q87_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel counts with strict temporal
    ordering (each stage's first completion must be strictly after the
    previous stage's): the canonical product-analytics query. Counts
    are exact integers → bit-identical across engines.

    Every declared stage emits a row even when no user reached it
    (n_users = 0): the aggregated counts are right-joined against the
    literal stage frame, matching the oracle's scalar-count shape on
    datasets where a stage never converts (ADVICE r5).
    """
    ev = load_table(spark, sf_dir, "events")
    stages = ["view", "click", "purchase"]
    f = funnel(ev, stages)
    counts = f.groupBy("stage_index", "stage").agg(
        F.count("*").alias("n_users")
    )
    frame = stage_frame(spark, stages)
    return final_sort(
        frame.join(counts, ["stage_index", "stage"], "left").select(
            "stage_index", "stage",
            F.coalesce("n_users", F.lit(0).cast("long")).alias("n_users"),
        ),
        spark, sf_dir, "events", "stage_index",
    )


def q94_bounded_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel: view → click → purchase where each stage
    must complete within 2 DAYS of the previous stage's completion —
    q87's conversion-window variant (the report product analytics
    actually ships: unbounded funnels credit conversions that happen
    months later). Emits every stage row (zero-filled) plus the
    bounded-over-unbounded retention ratio per stage, exact integer
    counts under the decimal snap.

    Scale: two funnel passes (bounded + unbounded), each the q87
    shape — per-stage min-agg + co-keyed user join, shuffle-free on a
    user-bucketed table; the final frame is 3 rows.
    """
    from puregraphdb_spark.functions.numeric import decimal_round

    ev = load_table(spark, sf_dir, "events")
    stages = ["view", "click", "purchase"]
    frame = stage_frame(spark, stages)

    def counts(within: str | None, alias: str) -> DataFrame:
        return (
            funnel(ev, stages, within=within)
            .groupBy("stage_index", "stage")
            .agg(F.count("*").alias(alias))
        )

    b = counts("2 days", "n_bounded")
    u = counts(None, "n_users")
    return final_sort(
        frame.join(b, ["stage_index", "stage"], "left")
        .join(u, ["stage_index", "stage"], "left")
        .select(
            "stage_index", "stage",
            F.coalesce("n_bounded", F.lit(0).cast("long"))
            .alias("n_bounded"),
            F.coalesce("n_users", F.lit(0).cast("long")).alias("n_users"),
            decimal_round(
                F.coalesce("n_bounded", F.lit(0).cast("long"))
                .cast("double")
                / F.greatest(
                    F.coalesce("n_users", F.lit(0).cast("long")),
                    F.lit(1).cast("long"),
                ).cast("double"),
                6, grid=10,
            ).alias("bounded_ratio"),
        ),
        spark, sf_dir, "events", "stage_index",
    )


def funnel_conversion_windows(stage_rows: DataFrame,
                              ts_col: str = "ts") -> DataFrame:
    """Windowed funnel conversion report over STAGE-COMPLETION rows
    (the output contract shared by ``funnel`` and the streaming
    ``funnel_stateful`` sink): per completion day × stage, the user
    count and the conversion ratio against the previous stage
    completed in the same day bucket (NULL for the first stage of a
    bucket). Read-side derivation — run it over the persisted stage
    table the streaming tracker appends to; that is what keeps it out
    of the streaming query itself (aggregation over a stateful
    operator's output is the unsupported-chain shape).

    Scale: one (day, stage) count aggregate with map-side combine,
    then a lag window over the tiny (days × stages) relation.
    """
    d = stage_rows.withColumn("day", F.date_trunc("day", ts_col))
    counts = d.groupBy("day", "stage_index", "stage").agg(
        F.count("*").alias("n_users")
    )
    w = Window.partitionBy("day").orderBy("stage_index")
    from puregraphdb_spark.functions.numeric import decimal_round

    return counts.withColumn(
        "conv_vs_prev",
        decimal_round(
            F.col("n_users").cast("double")
            / F.lag("n_users").over(w).cast("double"), 6, grid=10,
        ),
    )


def q98_funnel_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily funnel conversion report: q87's strict-ordered stage
    completions bucketed by completion DAY, with per-day stage counts
    and next-stage conversion ratios — the time-resolved view product
    analytics ships next to the total funnel. Exact integer counts;
    the ratio is one IEEE division under the decimal snap; a day's
    first observed stage has a NULL ratio on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    f = funnel(ev, ["view", "click", "purchase"])
    return final_sort(
        funnel_conversion_windows(f),
        spark, sf_dir, "events", "day", "stage_index",
    )


def q88_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-activity
    week, the fraction still active N weeks later — the standard
    growth-analytics query. Week bucketing is date_trunc('week')
    (Monday epoch in both engines); week_n is exact day arithmetic / 7;
    the retention ratio is an integer quotient under the decimal snap.

    Scale: one min-agg per user (co-keyed with the activity dedup),
    one join on user, then a tiny (cohort × week) aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    a = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    j = a.join(f, "user_id").select(
        "cohort",
        F.floor(F.datediff("wk", "cohort") / 7).cast("long").alias("week_n"),
    )
    cs = f.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    return final_sort(
        j.groupBy("cohort", "week_n")
        .agg(F.count("*").alias("n_active"))
        .join(cs, "cohort")
        .select(
            "cohort", "week_n", "n_active", "cohort_size",
            decimal_round(
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double"), 6, grid=10,
            ).alias("retention"),
        ),
        spark, sf_dir, "events", "cohort", "week_n",
    )


def q101_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the same
    user's LATEST click in the 3 days before it (strictly earlier);
    per purchase day: purchases, attributed purchases, and the
    attribution rate — the marketing-analytics join every event
    pipeline ships next to the funnel. Counts are exact integers; the
    rate is one snapped division.

    Scale: one user-keyed interval join (clicks per user in a 3-day
    window bound the fanout — the streaming twin is
    streaming/joins.interval_join with the same condition), a
    per-purchase max-agg, then a tiny per-day aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("user_id").alias("u"),
        F.col("ts").alias("pts"))
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("ts").alias("cts"))
    j = p.join(
        c,
        (p.u == c.u)
        & (c.cts < p.pts)
        & (c.cts >= p.pts - interval_expr("3 days")),
        "left",
    ).groupBy("pid", "pts").agg(F.max("cts").alias("last_click"))
    return final_sort(
        j.groupBy(F.date_trunc("day", "pts").alias("day")).agg(
            F.count("*").alias("n_purchases"),
            F.count("last_click").alias("n_attributed"),
            decimal_round(
                F.count("last_click").cast("double")
                / F.count("*").cast("double"), 6, grid=10,
            ).alias("attribution_rate"),
        ),
        spark, sf_dir, "events", "day",
    )


def markov_transitions(events: DataFrame) -> DataFrame:
    """Per-user event-type transition matrix: count and row-normalized
    probability of each (src -> dst) consecutive-event pair.

    The behavioral-sequence summary every event pipeline ships next to
    funnels: which action follows which, globally, with P(dst | src).

    Scale: the lag window partitions on user_id — the load-time
    partitioning of `events` already clusters on user_id, so the window
    needs NO exchange. The pair aggregation partial-aggregates map-side
    down to |types|^2 rows (25 here), and the per-src normalization
    window runs over that tiny aggregate. One shuffle total, on a
    25-row stream.

    Counts are exact integers; each probability is ONE division of
    exact integers snapped on the decimal grid (SURVEY §7.4).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull())
    )
    counts = (
        pairs.groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count("*").alias("n"))
    )
    wsrc = Window.partitionBy("src")
    return counts.select(
        "src", "dst", "n",
        decimal_round(
            F.col("n").cast("double")
            / F.sum("n").over(wsrc).cast("double"), 6, grid=10,
        ).alias("p"),
    )


def q104_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = markov_transitions(load_table(spark, sf_dir, "events"))
    return final_sort(res, spark, sf_dir, "events", "src", "dst")


def session_paths(events: DataFrame, gap: str = "30 minutes",
                  depth: int = 3, k: int = 20) -> DataFrame:
    """Top-k opening paths: the first ``depth`` event types of each
    session (>= depth events), concatenated 'a>b>c', counted across
    sessions.

    Uses the same gaps-and-islands sessionization as ``sessionize``
    (epoch-microsecond gap compare), with an event_id tiebreak so the
    path order is total even under timestamp ties.

    Scale: every window here partitions on user_id or (user_id, sid) —
    hash-clustering on user_id satisfies both, so all four window
    passes share the ONE exchange the events load already did. The
    path count partial-aggregates map-side (paths are |types|^depth at
    most); top-k plans as TakeOrderedAndProject.
    """
    gap_us = _gap_seconds(gap) * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_s = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > F.lit(gap_us)),
        1,
    ).otherwise(0)
    sess = (
        events.select("user_id", "ts", "event_id", "event_type",
                      new_s.alias("new_s"))
        .withColumn("sid", F.sum("new_s").over(wcum).cast("long"))
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    ranked = (
        sess.withColumn("rn", F.row_number().over(ws))
        .withColumn("n_ev", F.count("*").over(Window.partitionBy("user_id", "sid")))
        .filter((F.col("rn") <= depth) & (F.col("n_ev") >= depth))
    )
    # first-`depth` types pivoted positionally (max(when(rn=i)) — an
    # aggregation, not a collect_list, so no ordering ambiguity)
    slots = [F.max(F.when(F.col("rn") == i, F.col("event_type"))).alias(f"s{i}")
             for i in range(1, depth + 1)]
    paths = (
        ranked.groupBy("user_id", "sid").agg(*slots)
        .select(F.concat_ws(">", *[f"s{i}" for i in range(1, depth + 1)])
                .alias("path"))
    )
    return (
        paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path").limit(k)
    )


def q107_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_paths(load_table(spark, sf_dir, "events"))


def rolling_actives(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Rolling distinct actives: per activity day, the distinct users
    active that day AND over the trailing ``window_days`` — the
    DAU/WAU pair every event pipeline reports (distinct counts do NOT
    sum across days, so no prefix trick applies; this is the honest
    exact formulation).

    Exactness: days are date-truncated in both engines under the
    pinned-UTC session; counts are exact distinct integers.

    Scale: the (day, user) dedup is the one fact-wide shuffle; the
    trailing-window expansion is a MAP-SIDE ``sequence`` explode (each
    deduped row contributes to exactly its <= window_days forward
    day-buckets) — never a nested-loop range join against the day
    relation, whose condition count grows with rows × days; the day
    relation only LEFT-SEMI gates the exploded targets (bounded, one
    row per calendar day, broadcasts) so days with no activity of
    their own are not reported. For approximate-tolerant deployments
    swap the final countDistinct for HLL sketch union
    (approx_distinct_parts' machinery) and the fan-out disappears.
    """
    du = (
        events.select(
            F.date_trunc("day", "ts").alias("day"), "user_id")
        .distinct()
    )
    days = du.select("day").distinct()
    contrib = du.select(
        F.col("day").alias("a_day"), "user_id",
        F.explode(F.expr(
            f"sequence(day, day + interval {window_days - 1} day, "
            "interval 1 day)")).alias("day"),
    )
    return (
        contrib.join(F.broadcast(days), "day", "left_semi")
        .groupBy("day")
        .agg(
            F.countDistinct("user_id").alias("n_active_7d"),
            F.countDistinct(
                F.when(F.col("a_day") == F.col("day"), F.col("user_id"))
            ).alias("n_active_1d"),
        )
    )


def q115_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = rolling_actives(load_table(spark, sf_dir, "events"))
    return final_sort(res, spark, sf_dir, "events", "day")


def ab_split_conversion(events: DataFrame, buckets: int = 100,
                        treat_below: int = 50) -> DataFrame:
    """Deterministic A/B experiment readout: users split into variants
    by the portable multiplicative hash (q69's train/val/test split
    machinery re-used for experimentation — same hash, same
    cross-engine identity), then per variant the distinct users,
    viewers, purchasers, and the viewer→purchaser conversion rate.

    Exactness: the variant assignment is exact integer arithmetic
    (identical in both engines); the conversion is ONE snapped
    division of exact distinct counts.

    Scale: one user-keyed distinct aggregate (rides events' load
    clustering) + a 2-row variant rollup. The assignment never needs a
    lookup table — any node can recompute it from the id, which is
    the property that makes hash-based experimentation work at
    100 TB (no broadcast of an assignment map).
    """
    from puregraphdb_spark.operators.pipeline import _hash_bucket

    variant = F.when(
        _hash_bucket(F.col("user_id"), buckets) < treat_below, F.lit("A")
    ).otherwise(F.lit("B"))
    per_user = (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .alias("viewed"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .alias("purchased"),
        )
        .select(variant.alias("variant"), "viewed", "purchased")
    )
    return (
        per_user.groupBy("variant")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("viewed").cast("long").alias("n_viewers"),
            F.sum("purchased").cast("long").alias("n_purchasers"),
            decimal_round(
                F.sum(F.when(F.col("viewed") == 1, F.col("purchased"))
                      .otherwise(F.lit(0))).cast("double")
                / F.greatest(F.sum("viewed"), F.lit(1)).cast("double"),
                6, grid=10,
            ).alias("view_to_purchase"),
        )
    )


def q116_ab_split_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = ab_split_conversion(load_table(spark, sf_dir, "events"))
    return final_sort(res, spark, sf_dir, "events", "variant")


def scd2_intervals(events: DataFrame, state_col: str = "event_type",
                   ts_col: str = "ts", id_col: str = "user_id",
                   tiebreak: str = "event_id") -> DataFrame:
    """Slowly-changing-dimension (SCD2) history build: collapse an
    event stream into per-key validity intervals — one row per
    consecutive run of the same state, ``[valid_from, valid_to)``,
    with ``valid_to`` NULL for the key's current state. The warehouse
    operator that turns change events into a dimension history table.

    Gaps-and-islands: a change flag (lag over the (ts, tiebreak) total
    order) running-summed into a run id, then one aggregate per run;
    ``valid_to`` is the NEXT run's start (lead), so intervals tile the
    timeline exactly with no overlap by construction.

    Scale: all three windows and the aggregate share the SAME key
    partitioning (rides the events load clustering — no extra
    exchange); state per run is constant so min() is exact; timestamps
    compare at exact microseconds on both engines.
    """
    w = Window.partitionBy(id_col).orderBy(ts_col, tiebreak)
    prev = F.lag(state_col).over(w)
    runs = (
        events.withColumn(
            "__chg",
            F.when(prev.isNull() | (prev != F.col(state_col)), 1).otherwise(0))
        .withColumn("__run", F.sum("__chg").over(w))
    )
    per = runs.groupBy(id_col, "__run").agg(
        F.min(state_col).alias(state_col),
        F.min(ts_col).alias("valid_from"),
        F.count("*").cast("long").alias("n_events"),
    )
    w2 = Window.partitionBy(id_col).orderBy("__run")
    return (
        per.withColumn("valid_to", F.lead("valid_from").over(w2))
        .select(id_col, state_col, "valid_from", "valid_to", "n_events")
    )


def q120_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history for a 1-in-50 user sample of the event stream:
    each user's event-type runs as validity intervals."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 50 == 0
    ).select("user_id", "event_type", "ts", "event_id")
    res = scd2_intervals(ev)
    return final_sort(res, spark, sf_dir, "events",
                      "user_id", "valid_from")


def interval_union(events: DataFrame, duration_s: int = 300,
                   id_col: str = "user_id",
                   ts_col: str = "ts",
                   tiebreak: str = "event_id") -> DataFrame:
    """Per-key union length of overlapping activity intervals: each
    event opens a ``[ts, ts + duration_s)`` window; overlapping windows
    merge, and the operator returns per key the number of merged
    activity islands and the total covered time — the "true time spent"
    metric that naive ``count·duration`` overstates wherever events
    overlap.

    Gaps-and-islands on exact epoch microseconds: a window start opens
    a NEW island iff it begins strictly after the running max end of
    all earlier windows (lag-frame max over the (ts, tiebreak) TOTAL
    order — the explicit tiebreak keeps the flag pass and the island-
    numbering pass on the identical row order, without which equal
    timestamps could split coverage differently per engine); the flag
    running-sums into an island id, one aggregate per island gives
    ``[min start, max end)``, and per-key sums are pure bigint (no FP
    anywhere, so both engines agree bit-for-bit).

    Scale: both windows and both aggregates share the SAME key
    partitioning — one exchange on ``id_col`` total, then map-side
    partial aggregation for the final per-key rollup. State per window
    row is O(1); nothing global, nothing collected.
    """
    if duration_s < 1:
        raise ValueError(
            f"interval_union duration_s must be >= 1, got {duration_s}"
        )
    dur_us = duration_s * 1_000_000
    start = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(id_col).orderBy(ts_col, tiebreak)
    prev_max_end = F.max(start + F.lit(dur_us)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = events.select(
        id_col, F.col(tiebreak).alias("__tb"),
        start.alias("__s"), (start + F.lit(dur_us)).alias("__e"),
        F.when(
            prev_max_end.isNull() | (start > prev_max_end), 1
        ).otherwise(0).alias("__new"),
    ).withColumn(
        "__island",
        F.sum("__new").over(
            Window.partitionBy(id_col).orderBy("__s", "__tb")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    islands = flagged.groupBy(id_col, "__island").agg(
        F.min("__s").alias("__is"), F.max("__e").alias("__ie")
    )
    return islands.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_islands"),
        F.sum(F.col("__ie") - F.col("__is")).cast("long")
        .alias("covered_us"),
    )


def q123_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True per-user active time: 5-minute activity windows around each
    event, merged where they overlap (see ``interval_union``)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    res = interval_union(ev, duration_s=300)
    return final_sort(res, spark, sf_dir, "events", "user_id")


def conversion_latency(events: DataFrame, from_type: str = "signup",
                       to_type: str = "purchase",
                       id_col: str = "user_id") -> DataFrame:
    """Time-to-convert distribution: per key, the latency from the
    FIRST ``from_type`` event to the first ``to_type`` event at or
    after it, bucketed into whole hours — the activation-funnel
    histogram product teams read before picking a nudge window.

    Exactness: first-touch timestamps are min() aggregates at exact
    microseconds; the bucket is integer floor-division of the
    microsecond delta — no FP anywhere.

    Scale: the anchor (first ``from_type``) is an unordered-frame
    window min sharing the key exchange with the follow-up aggregate —
    ONE shuffle on ``id_col`` total, then a bucket rollup on the tiny
    histogram relation. Same single-exchange shape as q88 retention.
    """
    hour_us = 3_600 * 1_000_000
    anchor = F.min(
        F.when(F.col("event_type") == from_type, F.col("__t"))
    ).over(Window.partitionBy(id_col))
    anchored = (
        events.filter(F.col("event_type").isin(from_type, to_type))
        .select(id_col, "event_type",
                F.unix_micros(F.col("ts")).alias("__t"))
        .withColumn("__from", anchor)
        .filter((F.col("event_type") == to_type)
                & F.col("__from").isNotNull()
                & (F.col("__t") >= F.col("__from")))
        .groupBy(id_col)
        .agg(F.min("__t").alias("__to"), F.min("__from").alias("__f"))
    )
    return (
        anchored.select(
            F.floor((F.col("__to") - F.col("__f")) / F.lit(hour_us))
            .cast("long").alias("hours_bucket")
        )
        .groupBy("hours_bucket")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def q124_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase time-to-convert histogram in whole-hour buckets
    (see ``conversion_latency``)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    res = conversion_latency(ev)
    return final_sort(res, spark, sf_dir, "events", "hours_bucket")


def bounce_rate(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-day session bounce report: sessions starting that day,
    single-event ("bounce") sessions, and the bounce rate — the
    engagement KPI sessionization exists to feed.

    Same gaps-and-islands core as ``sessionize`` (exact-microsecond
    gap compare, lag flag → running-sum session id) but keeps the
    session START timestamp, which the q21 aggregate drops. All
    counts are integers; the rate is ONE snapped division.

    Scale: both windows and the session aggregate ride one user_id
    exchange; the per-day rollup is calendar-sized.
    """
    gap_us = _gap_seconds(gap) * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_s = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > F.lit(gap_us)),
        1,
    ).otherwise(0)
    sessions = (
        events.select("user_id", "ts", new_s.alias("__new"))
        .select("user_id", "ts",
                F.sum("__new").over(wcum).cast("long").alias("__sid"))
        .groupBy("user_id", "__sid")
        .agg(
            F.min("ts").alias("__start"),
            F.count("*").cast("long").alias("__n"),
        )
    )
    return (
        sessions.groupBy(F.date_trunc("day", "__start").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("__n") == 1, 1).otherwise(0)).cast("long")
            .alias("n_bounces"),
        )
        .select(
            "day", "n_sessions", "n_bounces",
            decimal_round(
                F.col("n_bounces").cast("double")
                / F.col("n_sessions").cast("double"), 6, grid=10,
            ).alias("bounce_rate"),
        )
    )


def q130_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily session bounce rate at the 30-minute session gap (see
    ``bounce_rate``)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return final_sort(bounce_rate(ev), spark, sf_dir, "events", "day")


def funnel_latency(events: DataFrame, stages: list[str],
                   user_col: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type") -> DataFrame:
    """Per-transition funnel latency distribution: for each
    consecutive stage pair (i → i+1), how long converting users took —
    n_users, median and p90 seconds. The "where does the funnel
    stall" report product teams read next to the q87 stage counts.

    Composes two existing cores: ``funnel`` (first-completion stage
    table, one min-agg + co-keyed join per stage) and the exact
    percentile machinery (operators/percentile.py — sketch-bracketed,
    size-invariant). Latencies are exact integer microseconds scaled
    to seconds by one IEEE division; the percentile interpolation is
    the cross-engine-pinned arithmetic q17 uses, snapped at 4dp.

    Scale: the stage table is user-keyed throughout (no new exchange
    shape); the transition self-join is co-partitioned on
    (user, stage); percentiles shuffle sketches, not values.
    """
    from puregraphdb_spark.operators.percentile import exact_percentile_cont

    fun = funnel(events, stages, user_col=user_col, ts_col=ts_col,
                 type_col=type_col)
    nxt = fun.select(
        user_col,
        (F.col("stage_index") - 1).alias("stage_index"),
        F.col("stage").alias("__next_stage"),
        F.col("ts").alias("__next_ts"),
    )
    trans = (
        fun.join(nxt, [user_col, "stage_index"])
        .select(
            F.concat(F.col("stage"), F.lit(">"), F.col("__next_stage"))
            .alias("transition"),
            ((F.unix_micros("__next_ts") - F.unix_micros("ts"))
             .cast("double") / F.lit(1e6)).alias("latency_s"),
        )
    )
    # include_count: the separate count branch re-executed the WHOLE
    # funnel lineage (measured r11: the plan carried 15 broadcast
    # joins — ~3 full funnel executions); the bracket pass already
    # counts per group.
    pct = exact_percentile_cont(
        trans, "transition", "latency_s", ps=[0.5, 0.9],
        include_count=True,
    )
    return pct.select(
        "transition", F.col("n").alias("n_users"),
        decimal_round(F.col("p_0"), 4, grid=6).alias("median_s"),
        decimal_round(F.col("p_1"), 4, grid=6).alias("p90_s"),
    )


def q132_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→click→purchase transition latencies (see
    ``funnel_latency``)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    res = funnel_latency(ev, ["view", "click", "purchase"])
    return final_sort(res, spark, sf_dir, "events", "transition")


def anomaly_mad_ts(events: DataFrame, ts_col: str = "ts",
                   nsigma: float = 3.5) -> DataFrame:
    """Robust time-series anomaly flags over the DAILY event volume:
    median/MAD control limits (the MAD-outlier discipline of
    q110_mad_outliers, applied to a time series instead of a value
    column). ``score = (cnt - median) / mad`` — transcendental-free
    and exact: daily counts are integers, so the interpolated median
    is an exact half-integer, the absolute deviations are exact, and
    the one final division is a single correctly-rounded IEEE op the
    oracle reproduces bit-identically.

    Scale: one shuffle to the per-day grain (map-side combine), then
    two order-statistic selections over the DAYS relation — bounded
    by the calendar (365 rows/year at any data scale), broadcast back
    as 1-row parameter traffic, never a data collect.
    """
    daily = (
        events.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    # median and MAD ride whole-relation windows over the DAYS
    # relation (bounded by the calendar, so the single window
    # partition is safe at any data scale) — the previous
    # aggregate + cross-join chain re-executed the events scan and
    # its per-day shuffle FOUR times (r11 lineage-dedup sweep)
    wall = Window.partitionBy()
    dev = daily.select(
        "day", "cnt",
        F.percentile(F.col("cnt"), F.lit(0.5)).over(wall).alias("med"),
    ).withColumn("dev", F.abs(F.col("cnt") - F.col("med")))
    return dev.withColumn(
        "mad", F.percentile(F.col("dev"), F.lit(0.5)).over(wall)
    ).select(
        "day", "cnt",
        decimal_round(F.col("med"), 4, grid=6).alias("med"),
        decimal_round(F.col("mad"), 4, grid=6).alias("mad"),
        decimal_round(
            F.when(F.col("mad") > 0,
                   (F.col("cnt") - F.col("med")) / F.col("mad"))
            .otherwise(F.lit(None).cast("double")),
            6, grid=8,
        ).alias("score"),
        F.when(
            (F.col("mad") > 0)
            & (F.abs((F.col("cnt") - F.col("med")) / F.col("mad"))
               > F.lit(nsigma)),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("is_anomaly"),
    )


def q135_anomaly_mad_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly report with median/MAD robust limits
    (see ``anomaly_mad_ts``)."""
    ev = load_table(spark, sf_dir, "events").select("ts")
    return final_sort(anomaly_mad_ts(ev), spark, sf_dir, "events",
                      "day")


def seasonal_dow(events: DataFrame, ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Day-of-week seasonality profile per event type: the share index
    ``7 * cnt / total`` (1.0 = flat week) that sizes weekday/weekend
    capacity and detects type-specific weekly cycles. ISO day numbers
    (Mon=1..Sun=7). Exact integer counts; the index is one snapped
    division.

    Scale: ONE shuffle on (type, isodow) — a ≤ 7×|types| relation —
    with the per-type total as a window sum over that tiny relation.
    """
    isodow = (F.pmod(F.dayofweek(F.col(ts_col)) + F.lit(5), F.lit(7))
              + F.lit(1)).cast("long")
    per = (
        events.groupBy(F.col(type_col).alias("event_type"),
                       isodow.alias("isodow"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = Window.partitionBy("event_type")
    return per.select(
        "event_type", "isodow", "cnt",
        decimal_round(
            (F.col("cnt") * F.lit(7)).cast("double")
            / F.sum("cnt").over(w).cast("double"),
            6, grid=8,
        ).alias("dow_index"),
    )


def q138_seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality index per event type (see ``seasonal_dow``)."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    return final_sort(seasonal_dow(ev), spark, sf_dir, "events",
                      "event_type", "isodow")


def burst_detection(events: DataFrame, ts_col: str = "ts",
                    type_col: str = "event_type",
                    z_threshold: float = 2.0) -> DataFrame:
    """Per-type hourly burst detector: z-score of each hour's count
    against that type's own hourly distribution, emitting the buckets
    past ``z_threshold`` — the traffic-spike / scraper-burst report.

    Determinism: sum and sum-of-squares are exact bigints, variance is
    ONE exact-integer division ``(n*sumsq - sum^2) / (n*(n-1))``, and
    sqrt/subtract/divide are single correctly-rounded IEEE ops — the
    oracle reproduces the z bit-identically with the same expression
    shape.

    Scale: one shuffle to the (type, hour) grain with map-side
    combine; the per-type moments are a window sum over the bucket
    relation (calendar-bounded rows per type). No percentile pass —
    moments suffice for the z-test and merge map-side.
    """
    per = (
        events.groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col)).alias("bucket"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = Window.partitionBy("event_type")
    per = per.select(
        "event_type", "bucket", "cnt",
        F.count("*").over(w).alias("n"),
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("ss"),
    ).filter(F.col("n") >= 2)
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        .cast("double")
        / (F.col("n") * (F.col("n") - F.lit(1))).cast("double")
    )
    z = (F.col("cnt").cast("double") - mean) / F.sqrt(var)
    return (
        per.filter((var > 0) & (z > F.lit(z_threshold)))
        .select(
            "event_type", "bucket", "cnt",
            decimal_round(mean, 4, grid=6).alias("hourly_mean"),
            decimal_round(z, 4, grid=6).alias("z"),
        )
    )


def q140_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume bursts per event type at z > 2 (see
    ``burst_detection``)."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    return final_sort(burst_detection(ev), spark, sf_dir, "events",
                      "event_type", "bucket")


def seasonal_burst_detection(events: DataFrame, ts_col: str = "ts",
                             type_col: str = "event_type",
                             z_threshold: float = 2.0) -> DataFrame:
    """Seasonally-adjusted burst detector: like ``burst_detection``
    but each hour's count is z-tested against the moments of ITS OWN
    (type, ISO-day-of-week) stratum — a Monday-morning spike is judged
    against Mondays, so weekly cycles stop masquerading as bursts
    (composition of q138's seasonality strata with q140's exact-moment
    z-test). Exact bigint moments per stratum; one exact-integer
    variance division; identical IEEE expression shape in the oracle.

    Scale: one shuffle to the (type, hour) grain with map-side
    combine; the stratum moments are window sums over the
    calendar-bounded bucket relation. No percentile pass.
    """
    isodow = (F.pmod(F.dayofweek(F.col("bucket")) + F.lit(5), F.lit(7))
              + F.lit(1)).cast("long")
    per = (
        events.groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col)).alias("bucket"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn("isodow", isodow)
    )
    w = Window.partitionBy("event_type", "isodow")
    per = per.select(
        "event_type", "isodow", "bucket", "cnt",
        F.count("*").over(w).alias("n"),
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("ss"),
    ).filter(F.col("n") >= 2)
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        .cast("double")
        / (F.col("n") * (F.col("n") - F.lit(1))).cast("double")
    )
    z = (F.col("cnt").cast("double") - mean) / F.sqrt(var)
    return (
        per.filter((var > 0) & (z > F.lit(z_threshold)))
        .select(
            "event_type", "isodow", "bucket", "cnt",
            decimal_round(mean, 4, grid=6).alias("stratum_mean"),
            decimal_round(z, 4, grid=6).alias("z"),
        )
    )


def q143_seasonal_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-seasonality-adjusted hourly bursts at z > 2 (see
    ``seasonal_burst_detection``)."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    return final_sort(seasonal_burst_detection(ev), spark, sf_dir,
                      "events", "event_type", "bucket")


def cusum_changepoint(events: DataFrame, ts_col: str = "ts",
                      type_col: str = "event_type",
                      value_col: str = "value") -> DataFrame:
    """Single-changepoint estimate per event type over the DAILY value
    series — the classic CUSUM location statistic: the day k maximizing
    |Σ_{i<=k}(x_i − mean)| splits the series at the most likely mean
    shift (Page 1954; the standard first pass before a full
    PELT/binary-segmentation sweep). Emits one row per type with the
    estimated changepoint day, the peak CUSUM deviation, and the
    pre/post segment means — the level-shift report that catches
    logging changes, deploy regressions and seasonality breaks that
    the pointwise detectors (q135 MAD, q140/q143 z-bursts) cannot,
    because a level SHIFT moves every subsequent point a little
    instead of one point a lot.

    Determinism (cross-engine exact): daily sums are exact decimals
    (3-dp fixture values), and the CUSUM is kept in the SCALED integer
    form ``S_k·n = n·P_k − k·T`` (P_k = prefix sum, T = total) — pure
    decimal arithmetic with explicitly sized operands
    (decimal(12,0)·decimal(24,3) → 37 digits, inside Spark's 38-digit
    cap: the q150 ADVICE overflow class is designed out, not hoped
    away). The argmax is selected on that exact quantity with an
    earliest-day tiebreak, so both engines pick the identical row;
    the reported means/CUSUM are single snapped divisions of exact
    operands.

    Scale: ONE shuffle to the (type, day) grain with map-side combine;
    every window after that runs over the per-type DAYS relation —
    calendar-bounded (≤ 365 rows/type/year) at ANY event volume, so
    the per-type window partition never grows with data size. The
    argmax is a rank-1 filter, not a sort of the full relation.
    """
    daily = (
        events.groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        )
        .agg(F.sum(F.col(value_col).cast("decimal(24,3)"))
             .cast("decimal(24,3)").alias("x"))
    )
    wt = Window.partitionBy("event_type")
    wp = (Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pre = daily.select(
        "event_type", "day",
        F.sum("x").over(wp).cast("decimal(24,3)").alias("p"),
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("day")).alias("k"),
        F.sum("x").over(wt).cast("decimal(24,3)").alias("t"),
        F.count("*").over(wt).alias("n"),
    ).filter(F.col("k") < F.col("n"))  # k = n has S = 0 by identity
    # scaled CUSUM: S_k·n = n·P_k − k·T  (exact decimal(38,3))
    s = (F.col("n").cast("decimal(12,0)") * F.col("p")
         - F.col("k").cast("decimal(12,0)") * F.col("t"))
    cand = pre.select(
        "event_type", "day", "k", "n", "p", "t", s.alias("s"),
        F.row_number().over(
            Window.partitionBy("event_type")
            .orderBy(F.abs(s).desc(), F.col("day").asc())
        ).alias("rn"),
    ).filter(F.col("rn") == 1)
    return cand.select(
        "event_type",
        F.col("day").alias("cp_day"),
        F.col("n").cast("long").alias("n_days"),
        decimal_round(
            F.col("s").cast("double") / F.col("n").cast("double"),
            4, grid=6).alias("cusum_peak"),
        decimal_round(
            F.col("p").cast("double") / F.col("k").cast("double"),
            4, grid=6).alias("pre_mean"),
        decimal_round(
            (F.col("t") - F.col("p")).cast("double")
            / (F.col("n") - F.col("k")).cast("double"),
            4, grid=6).alias("post_mean"),
    )


def q159_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily level-shift changepoint (see
    ``cusum_changepoint``). The fixture value column is stationary by
    construction, so a deterministic level shift is planted from
    event_id arithmetic (the q146/q152 synthetic-plant discipline):
    events from 2024-01-16 on (a FIXED boundary literal, the q155
    discipline — ADVICE r12: dayofyear(ts) > 15 was only a mid-series
    split because the fixture happens to span January; a calendar
    move would silently turn the plant all-or-nothing with the oracle
    still matching) get +2.5 added for two of the five types — the
    CUSUM argmax then lands on a real shift boundary for those types
    and on noise-scale peaks for the rest, exercising both regimes
    cross-engine."""
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type",
        (F.col("value")
         + F.when(
             F.col("event_type").isin("view", "purchase")
             & (F.col("ts") >= F.lit("2024-01-16").cast("timestamp")),
             F.lit(2.5))
         .otherwise(F.lit(0.0))).alias("value"),
    )
    return final_sort(cusum_changepoint(ev), spark, sf_dir, "events",
                      "event_type")


def _ledger_deltas(events: DataFrame, id_col: str, ts_col: str,
                   val_col: str, type_col: str, credit_type: str,
                   tiebreak: str) -> DataFrame:
    """Shared q180-family preamble: exact micros-long deltas.

    The micros long goes through an explicit decimal grid cast —
    ``cast(value as decimal(28,6)) * 1000000 → bigint`` — spelled
    identically in the DuckDB oracle (ADVICE r13: ``round(value·10⁶)``
    rounds Spark's shortest-decimal repr HALF_UP but DuckDB's raw
    binary double, a cross-engine tie hazard outside the decimal-grid
    discipline; the decimal cast recovers the exact ≤6-dp grid value
    in both engines, the numeric.py argument)."""
    return events.select(
        F.col(id_col).alias("user_id"),
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak).alias("__tb"),
        ((F.col(val_col).cast("decimal(28,6)") * F.lit(1000000))
         .cast("long")
         * F.when(F.col(type_col) == credit_type, F.lit(1))
         .otherwise(F.lit(-1))).alias("__delta"),
    )


def clamped_balance(events: DataFrame, id_col: str = "user_id",
                    ts_col: str = "ts", val_col: str = "value",
                    type_col: str = "event_type",
                    credit_type: str = "purchase",
                    tiebreak: str = "event_id") -> DataFrame:
    """Per-key zero-floored running balance bₖ = max(0, bₖ₋₁ + Δₖ) —
    credit ledgers, retry budgets, inventory with floor-at-zero.
    Emits per key: event count, final balance, reset count (clamps
    hit), max balance.

    Execution: pure JVM windows via the LINDLEY identity (VERDICT r13
    item 3 — the r13 docstring claimed windows cannot express this;
    that was wrong). The recurrence is the Lindley recursion, whose
    prefix-scan closed form is: with Sₖ the running delta sum and
    mₖ = min(0, min_{j≤k} Sⱼ), then bₖ = Sₖ − mₖ. Hence
      final_bal = Sₙ − mₙ  (= sum(Δ) − min(mₖ), mₖ non-increasing),
      max_bal   = maxₖ (Sₖ − mₖ),
      n_resets  = #{k : Sₖ < mₖ₋₁}   (strict new running minima
                  below zero; m₀ = 0).
    Check Δ=[+5,−7,+3]: S=[5,−2,1], m=[0,−2,−2] → b=[5,0,3],
    resets=1 — matches the fold. All arithmetic is exact bigints in
    whole-stage codegen: one running-sum window, two running-min
    windows (current / preceding frame) and a final groupBy that
    reuses the window's hash partitioning — ONE shuffle total, no
    Arrow seam, no Python.

    For the genuinely non-prefix-scan TWO-SIDED clamp (cap ceilings,
    token buckets with max capacity) see ``capped_balance``.

    q180 oracles this against a DuckDB RECURSIVE CTE fold — two
    independent strategies (window scan vs recursion) hash-agreeing;
    ``tests/test_round13_operators.py`` additionally pins the window
    plan ≡ the retired Arrow integer fold on hand cases, and
    streaming/ledger.py carries the incremental twin.
    """
    pre = _ledger_deltas(events, id_col, ts_col, val_col, type_col,
                         credit_type, tiebreak)
    w_cur = (
        Window.partitionBy("user_id").orderBy("__ts", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_prev = (
        Window.partitionBy("user_id").orderBy("__ts", "__tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    zero = F.lit(0).cast("long")
    run = pre.select(
        "user_id", "__ts", "__tb", "__delta",
        F.sum("__delta").over(w_cur).alias("__s"),
    )
    ann = run.select(
        "user_id", "__delta", "__s",
        F.least(zero, F.min("__s").over(w_cur)).alias("__m"),
        F.least(zero,
                F.coalesce(F.min("__s").over(w_prev), zero))
        .alias("__mprev"),
    )
    return ann.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        (F.sum("__delta") - F.min("__m")).cast("long")
        .alias("final_bal"),
        F.sum(F.when(F.col("__s") < F.col("__mprev"), F.lit(1))
              .otherwise(F.lit(0))).cast("long").alias("n_resets"),
        F.max(F.col("__s") - F.col("__m")).cast("long")
        .alias("max_bal"),
    )


def capped_balance(events: DataFrame, cap_micros: int,
                   id_col: str = "user_id", ts_col: str = "ts",
                   val_col: str = "value",
                   type_col: str = "event_type",
                   credit_type: str = "purchase",
                   tiebreak: str = "event_id") -> DataFrame:
    """Two-sided clamped balance bₖ = min(cap, max(0, bₖ₋₁ + Δₖ)) —
    token buckets with max capacity, bounded inventories, prepaid
    caps. Emits per key: event count, final balance, floor hits
    (n_resets), ceiling hits (n_caps), max balance (≤ cap).

    Unlike the zero-floor case (``clamped_balance``, Lindley prefix
    scan), the two-sided reflection map's closed form (Kruk-Lehoczky-
    Ramanan-Shreve 2007) composes a sup over suffixes of an inf term
    — a nested scan cumulative SQL windows cannot produce in one
    pass — so this keeps the sanctioned Arrow seam: ``applyInPandas``
    per key, plain integer loop over exact micros longs (no FP drift,
    bit-exact vs any engine's fold). Per-group memory is one key's
    events; one groupBy exchange, scale posture unchanged from the
    r13 fold it inherits.
    """
    if cap_micros <= 0:
        raise ValueError(f"cap_micros must be positive, got "
                         f"{cap_micros}")
    import pandas as pd

    from pyspark.sql.types import (
        LongType, StructField, StructType,
    )

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("final_bal", LongType()),
        StructField("n_resets", LongType()),
        StructField("n_caps", LongType()),
        StructField("max_bal", LongType()),
    ])
    pre = _ledger_deltas(events, id_col, ts_col, val_col, type_col,
                         credit_type, tiebreak)
    cap = int(cap_micros)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ts", "__tb"])
        bal = resets = caps = mx = 0
        for d in pdf["__delta"]:
            nb = bal + int(d)
            if nb < 0:
                resets += 1
                nb = 0
            elif nb > cap:
                caps += 1
                nb = cap
            bal = nb
            if bal > mx:
                mx = bal
        return pd.DataFrame(
            [[int(pdf["user_id"].iloc[0]), len(pdf), bal, resets,
              caps, mx]],
            columns=["user_id", "n_events", "final_bal", "n_resets",
                     "n_caps", "max_bal"])

    return pre.groupBy("user_id").applyInPandas(fold, out_schema)


def q180_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLED clamped running balance (see ``clamped_balance``) for
    the user_id % 20 sample: purchases credit value·10⁶ micros,
    every other event debits it; balance floors at zero."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 20 == 0)
    return final_sort(clamped_balance(ev), spark, sf_dir, "events",
                      "user_id")


def q181_capped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLED two-sided capped balance (see ``capped_balance``) for
    the q180 grain with a 50,000,000-micros ceiling — chosen BELOW
    every fixture user's uncapped max (94M–230M at sf0.01) so the
    ceiling binds for all of them while debits still drive floor
    resets; oracled by the same DuckDB recursive-CTE fold extended
    with the least(cap, ·) step. The Arrow integer loop vs the
    recursive CTE are fully independent strategies, so the hash match
    carries the same force as q180's did in r13."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 20 == 0)
    return final_sort(capped_balance(ev, cap_micros=50_000_000),
                      spark, sf_dir, "events", "user_id")


def m4_downsample(events: DataFrame, series_col: str = "event_type",
                  ts_col: str = "ts", val_col: str = "value",
                  bucket: str = "day") -> DataFrame:
    """M4 time-series downsampling: per (series, time bucket) the
    FOUR extreme points — first, last, min-value, max-value, each
    with its timestamp — the aggregation that renders an arbitrarily
    large series at pixel resolution with zero visual aliasing
    (Jugel et al., VLDB'14; what Grafana/TimescaleDB ship as the
    default raw-data rollup). A line chart drawn through the M4
    points is pixel-identical to one drawn through ALL points.

    Determinism: every point is picked by a row_number over a TOTAL
    order ((ts, event_id) for first/last, (value, ts, event_id) for
    min/max) — arg_min/max_by would tie-break arbitrarily, and the
    four windows share ONE partition key so they plan onto a single
    shuffle with four in-partition sorts (bucket populations are
    bounded by the bucket width — the natural grain).

    Scale: 1 shuffle on (series, bucket); output is 4-points-per-
    bucket regardless of input volume — the 100 TB render query.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    base = events.select(
        F.col(series_col).alias("series"), b,
        F.col(ts_col).alias("ts"), F.col(val_col).alias("v"),
        F.col("event_id").alias("eid"),
    )
    pk = ["series", "bucket"]
    w_first = Window.partitionBy(*pk).orderBy("ts", "eid")
    w_last = Window.partitionBy(*pk).orderBy(F.desc("ts"),
                                             F.desc("eid"))
    w_min = Window.partitionBy(*pk).orderBy("v", "ts", "eid")
    w_max = Window.partitionBy(*pk).orderBy(F.desc("v"), "ts", "eid")
    ann = base.select(
        *pk, "ts", "v",
        F.row_number().over(w_first).alias("r_f"),
        F.row_number().over(w_last).alias("r_l"),
        F.row_number().over(w_min).alias("r_n"),
        F.row_number().over(w_max).alias("r_x"),
    )
    pick = lambda r, c: F.max(F.when(F.col(r) == 1, F.col(c)))  # noqa: E731
    return (
        ann.groupBy(*pk)
        .agg(
            F.count("*").cast("long").alias("n_points"),
            pick("r_f", "ts").alias("ts_first"),
            pick("r_f", "v").alias("v_first"),
            pick("r_l", "ts").alias("ts_last"),
            pick("r_l", "v").alias("v_last"),
            pick("r_n", "ts").alias("ts_min"),
            pick("r_n", "v").alias("v_min"),
            pick("r_x", "ts").alias("ts_max"),
            pick("r_x", "v").alias("v_max"),
        )
    )


def q174_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLED M4 downsample of the events fixture at day grain (see
    ``m4_downsample``). No rounding anywhere: the output values are
    PICKED (not computed), so the identical input doubles hash equal
    across engines as-is."""
    ev = load_table(spark, sf_dir, "events")
    return final_sort(m4_downsample(ev), spark, sf_dir, "events",
                      "series", "bucket")


def arrival_regularity(events: DataFrame, ts_col: str = "ts",
                       user_col: str = "user_id",
                       min_events: int = 5, topk: int = 10) -> DataFrame:
    """Inter-arrival regularity profile — the bot/scripted-traffic
    signal: humans arrive with high inter-event variance (cv² ≈ 1 for
    Poisson-ish browsing), schedulers and scrapers arrive on a clock
    (cv² → 0). Emits the ``topk`` MOST regular users with at least
    ``min_events`` events: (user, event count, mean inter-arrival µs,
    cv² = variance/mean²) ordered by cv² ascending — the review queue
    for rate-limiting, not a hard verdict.

    Exactness: deltas are exact epoch-microsecond longs from a lag
    window; Σd rides decimal sums and Σd² squares decimal(18,0)
    operands (product 37 digits — inside the 38 cap per the q159
    sizing discipline; a µs delta needs 18 digits only past ~31,000
    years). cv² = n·(n·Σd² − S²) / ((n−1)·S²) is ONE division of
    exact decimals, snapped.

    Scale: one shuffle to the user partition for the lag window
    (each user's events sort within their partition — bounded by
    per-user activity, the natural grain), one map-side-combined
    aggregate to the user grain, then TakeOrderedAndProject for the
    top-k. No whole-relation windows.
    """
    # lag orders by the epoch value alone: with ties the SORTED delta
    # multiset is identical under any tie order, so the moments are
    # deterministic without an id tiebreaker.
    d = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.unix_micros(F.col(ts_col)).alias("__us"),
        )
        .withColumn("__d", F.col("__us") - F.lag("__us").over(
            Window.partitionBy("user_id").orderBy("__us")))
        .filter(F.col("__d").isNotNull())
    )
    dd = F.col("__d").cast("decimal(18,0)")
    per_user = (
        d.groupBy("user_id")
        .agg(
            (F.count("*") + 1).cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_deltas"),
            F.sum(dd).cast("decimal(38,0)").alias("s"),
            F.sum(dd * dd).cast("decimal(38,0)").alias("ss"),
        )
        .filter((F.col("n_events") >= min_events) & (F.col("s") > 0)
                & (F.col("n_deltas") >= 2))
    )
    n = F.col("n_deltas").cast("decimal(38,0)")
    cv2 = (
        (n * (n * F.col("ss") - F.col("s") * F.col("s"))).cast("double")
        / ((n - 1) * F.col("s") * F.col("s")).cast("double")
    )
    from puregraphdb_spark.functions.numeric import decimal_round
    scored = per_user.select(
        "user_id", "n_events",
        decimal_round(F.col("s").cast("double")
                      / F.col("n_deltas").cast("double"), 1, grid=4)
        .alias("mean_delta_us"),
        decimal_round(cv2, 6, grid=10).alias("cv2"),
    )
    return scored.orderBy(F.asc("cv2"), "user_id").limit(topk)


def q166_arrival_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most clock-regular users (see ``arrival_regularity``).
    The fixture's arrivals are Poisson-ish for every user, so the
    report surfaces the natural low-variance tail — the ordering and
    all four stats are exact/snapped, so the cross-engine hash pins
    the full arithmetic chain (lag deltas, decimal moments, cv²)."""
    ev = load_table(spark, sf_dir, "events").select("ts", "user_id")
    return arrival_regularity(ev)
