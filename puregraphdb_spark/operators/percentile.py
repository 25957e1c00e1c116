"""Exact distributed percentiles with size-invariant memory
(SURVEY §2 q17's engine; VERDICT r2 'what's wrong' #2).

``exact_percentile_cont`` computes exact ``percentile_cont``
(linear-interpolation) values per group without ever sorting a group or
collecting more than ``band_target`` values into one aggregation
buffer — at ANY input size. The algorithm is bracket-and-refine:

1. **Bracket** (1 pass): a Greenwald–Khanna sketch
   (``percentile_approx``, deterministic worst-case rank error
   ≤ n/accuracy) brackets each target percentile with a ±5/accuracy
   margin, so the bracketing values are GUARANTEED to straddle the
   exact order statistics. Band size ≤ ~10·n/accuracy rows.
2. **Refine** (K passes, K chosen driver-side from a metadata size
   estimate — no data is read to decide): each pass joins the bounded
   per-group bracket back onto the stream and, in ONE aggregation,
   (a) counts rows strictly below the bracket exactly, and (b) sketches
   the *in-band* distribution at a fixed φ-grid. A post-aggregation
   projection then picks the grid neighbors of the wanted in-band rank
   (``element_at`` with a computed index — constant-foldable quantile
   fractions, per-group ranks). Each round shrinks the band by
   ~(2/GRID + 6/accuracy): three rounds take 10¹² rows to a ≤10⁵-value
   band.
3. **Extract** (1 pass): count-below + collect + sort ONLY the in-band
   values, index the exact order statistics, interpolate.

Every pass is a map-side-combining hash aggregation whose shuffle
payload is a sketch (KB) or the final bounded band — never the data.
Groups at or below ``small_group`` rows skip the machinery and collect
everything (bounded by construction); the GK bracket guarantee needs
n ≳ 750 for a 5/1000 margin to cover ±2 ranks.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: φ-grid resolution for refinement rounds (GRID+1 sketch outputs per
#: group per percentile — a few KB).
GRID = 200


def _refinement_rounds(n_estimate: int, accuracy: int,
                       band_target: int) -> int:
    """How many grid-refinement passes until the band fits
    ``band_target``. Conservative: overestimating n only adds a cheap
    extra pass; the result is exact regardless."""
    band = 10.0 * max(n_estimate, 1) / accuracy
    shrink = 2.0 / GRID + 6.0 / accuracy
    rounds = 0
    while band > band_target and rounds < 8:
        band = band * shrink + 8  # +slack for the index-clamp steps
        rounds += 1
    return rounds


def exact_percentile_cont(vals: DataFrame, group_col: str, val_col: str,
                          ps: list[float], accuracy: int = 1000,
                          band_target: int = 100_000,
                          small_group: int = 1000,
                          n_estimate: int | None = None,
                          include_count: bool = False) -> DataFrame:
    """Exact percentile_cont(``p``) of ``val_col`` per ``group_col``
    for each p in ``ps``. Returns (group_col, p_0, p_1, ...) with
    column names ``p_<idx>`` — callers alias/round as needed.

    ``n_estimate``: estimated TOTAL row count, used only to pick the
    number of refinement passes (default: exact plans for ≤10⁷ rows
    with zero refinement). Pass a metadata-derived estimate
    (``table_bytes``/bytes-per-row) — never a data scan.

    ``include_count=True`` also returns the per-group non-null value
    count as ``n`` — it is already computed in the bracket pass, so
    callers that need (count, percentiles) together (q132) avoid a
    WHOLE extra execution of the input lineage (the count branch
    re-ran the entire upstream funnel there).
    """
    # The ±5/accuracy bracket carries (5−1)·n/accuracy ranks of slack
    # beyond the sketch's worst-case error; below n ≈ accuracy/2 that
    # is under 2 ranks and the bracket can EXCLUDE a true order
    # statistic (found by the randomized sweep: a 22-row group at
    # accuracy=150 bracketed past v[k0]). Such groups must collect
    # everything — enforce the floor (with 2× safety) instead of
    # trusting the caller to keep the two knobs consistent.
    small_group = max(small_group, accuracy)
    margin = 5.0 / accuracy
    g = group_col

    # -- pass 1: GK bracket + exact group counts ---------------------------
    targets: list[float] = []
    for p in ps:
        targets += [max(0.0, p - margin), min(1.0, p + margin)]
    bounds = (
        vals.groupBy(g)
        .agg(
            F.percentile_approx(
                # one array literal, not GRID py4j round-trips of F.lit
                val_col, F.lit(targets), F.lit(accuracy)
            ).alias("bnd"),
            # count the VALUES, not the rows: percentile_cont ignores
            # NULLs, so the rank arithmetic must too.
            F.count(val_col).alias("n_g"),
        )
        .select(
            F.col(g).alias("b_g"),
            *[F.col("bnd")[2 * i].alias(f"lo{i}") for i in range(len(ps))],
            *[F.col("bnd")[2 * i + 1].alias(f"hi{i}") for i in range(len(ps))],
            "n_g",
        )
    )

    rounds = _refinement_rounds(
        n_estimate if n_estimate is not None else 0, accuracy, band_target
    )

    small = F.col("n_g") <= small_group

    def in_band(i: int):
        return small | (
            (F.col(val_col) >= F.col(f"lo{i}"))
            & (F.col(val_col) <= F.col(f"hi{i}"))
        )

    def below(i: int):
        return F.when(
            ~small & (F.col(val_col) < F.col(f"lo{i}")), 1
        ).otherwise(0)

    def k0(i: int):
        # 0-indexed lower order-statistic position for target p_i
        return F.floor(F.lit(ps[i]) * (F.col("n_g") - 1))

    # -- refinement rounds: shrink each band by ~(2/GRID + 6/accuracy) -----
    # (the φ-grid literal is only built when a round actually runs — at
    # fixture sizes rounds == 0 and building a 201-element expression
    # would be pure plan-construction latency)
    for _ in range(rounds):
        grid_phis = F.lit([j / GRID for j in range(GRID + 1)])
        agg = (
            vals.join(F.broadcast(bounds), F.col(g) == F.col("b_g"))
            .groupBy(g)
            .agg(
                F.first("n_g").alias("n_g"),
                *[F.first(f"lo{i}").alias(f"plo{i}") for i in range(len(ps))],
                *[F.first(f"hi{i}").alias(f"phi{i}") for i in range(len(ps))],
                *[F.sum(below(i)).alias(f"cbl{i}") for i in range(len(ps))],
                *[
                    F.sum(in_band(i).cast("long")).alias(f"m{i}")
                    for i in range(len(ps))
                ],
                *[
                    F.percentile_approx(
                        F.when(in_band(i), F.col(val_col)),
                        grid_phis, F.lit(accuracy),
                    ).alias(f"grid{i}")
                    for i in range(len(ps))
                ],
            )
        )

        def new_bounds(i: int):
            # wanted 0-indexed in-band ranks: j0 = k0 - cbl and j0+1.
            # GK at grid point φ=j/GRID returns a value whose in-band
            # rank is within m/accuracy of φ·m; pick grid neighbors one
            # step (plus sketch slack) outside [j0, j0+1] so the new
            # bracket still provably contains both order statistics.
            j0 = k0(i) - F.col(f"cbl{i}")
            m = F.col(f"m{i}")
            i_lo = F.greatest(
                F.lit(0),
                (F.floor((j0 / m - 2.0 / accuracy) * GRID) - 1).cast("int"),
            )
            i_hi = F.least(
                F.lit(GRID),
                (F.ceil(((j0 + 2) / m + 2.0 / accuracy) * GRID) + 1).cast("int"),
            )
            lo = F.coalesce(
                F.try_element_at(F.col(f"grid{i}"), i_lo + 1),
                F.col(f"plo{i}"),
            )
            hi = F.coalesce(
                F.try_element_at(F.col(f"grid{i}"), i_hi + 1),
                F.col(f"phi{i}"),
            )
            return lo.alias(f"lo{i}"), hi.alias(f"hi{i}")

        sel = [F.col(g).alias("b_g"), F.col("n_g")]
        for i in range(len(ps)):
            lo, hi = new_bounds(i)
            sel += [lo, hi]
        bounds = agg.select(*sel)

    # -- final pass: exact count-below + bounded band collect --------------
    agg = (
        vals.join(F.broadcast(bounds), F.col(g) == F.col("b_g"))
        .groupBy(g)
        .agg(
            F.first("n_g").alias("n"),
            *[F.sum(below(i)).alias(f"cbl{i}") for i in range(len(ps))],
            *[
                F.sort_array(
                    F.collect_list(F.when(in_band(i), F.col(val_col)))
                ).alias(f"band{i}")
                for i in range(len(ps))
            ],
        )
    )

    def interp(i: int):
        pos = F.lit(ps[i]) * (F.col("n") - 1)  # 0-indexed fractional pos
        lo = F.floor(pos)
        frac = pos - lo
        idx = (lo - F.col(f"cbl{i}")).cast("int")  # 0-indexed in band
        vlo = F.element_at(F.col(f"band{i}"), idx + 1)  # 1-indexed
        # frac == 0 → the hi position may fall outside the band (its
        # frac·Δ term is 0); try_element_at: Spark 4 element_at RAISES
        # on out-of-bounds (ANSI) instead of returning null.
        vhi = F.coalesce(F.try_element_at(F.col(f"band{i}"), idx + 2), vlo)
        # all-NULL group (n = 0): percentile of no values is NULL —
        # guarded, because the element_at index would be 0 (invalid).
        return F.when(F.col("n") > 0, vlo + frac * (vhi - vlo))

    count_cols = [F.col("n").cast("long").alias("n")] if include_count else []
    return agg.select(
        g, *count_cols,
        *[interp(i).alias(f"p_{i}") for i in range(len(ps))]
    )


def collect_exact_percentile_cont(vals: DataFrame, group_col: str,
                                  val_col: str,
                                  ps: list[float]) -> DataFrame:
    """Single-pass exact percentile_cont for MEASURED-SMALL inputs:
    collect + sort each whole group in one aggregation, then index and
    interpolate. Same output contract as ``exact_percentile_cont``
    (columns ``p_<idx>``), same interpolation arithmetic.

    This is the latency plan of a size-gated dual: one shuffle whose
    payload is the group's values. Callers MUST gate it on a measured
    input size (the per-group buffer is O(group size)); past the gate,
    ``exact_percentile_cont`` is the size-invariant plan.
    """
    agg = vals.groupBy(group_col).agg(
        F.sort_array(F.collect_list(val_col)).alias("band"),
        F.count(val_col).alias("n"),
    )

    def interp(i: int):
        pos = F.lit(ps[i]) * (F.col("n") - 1)
        lo = F.floor(pos)
        frac = pos - lo
        vlo = F.element_at(F.col("band"), lo.cast("int") + 1)
        vhi = F.coalesce(
            F.try_element_at(F.col("band"), lo.cast("int") + 2), vlo
        )
        # all-NULL group (n = 0) → NULL, matching percentile_cont —
        # unguarded, the element_at index would be 0 (invalid).
        return F.when(F.col("n") > 0, vlo + frac * (vhi - vlo))

    return agg.select(
        group_col, *[interp(i).alias(f"p_{i}") for i in range(len(ps))]
    )


def estimate_rows(spark, sf_dir: str, table: str,
                  bytes_per_row: int = 10) -> int:
    """Metadata-only row estimate for refinement-round sizing:
    on-disk bytes / a conservative bytes-per-row. Overestimation only
    costs a cheap extra pass."""
    from puregraphdb_spark.sources.registry import table_bytes

    return max(1, math.ceil(table_bytes(spark, sf_dir, table) / bytes_per_row))
