"""Round-13 operator pins: resource-allocation link prediction
(q171) on the shared q100 co-supply core."""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

SF = "/root/testdata/sf0.001"


def test_q171_matches_exact_fraction_recompute(spark):
    """The integer-weight RA ranking must equal an independent
    exact-rational recompute (Fraction arithmetic driver-side on the
    small fixture) — pinning both the 10^12 div weight and the
    bigint-sum ordering."""
    from puregraphdb_spark.operators.graph import (
        _co_supply_pairs, q171_resource_allocation)

    rows = _co_supply_pairs(spark, SF, None, 0).collect()
    by_c = defaultdict(list)
    for r in rows:
        by_c[r["c"]].append(r["s"])
    w_int = defaultdict(int)      # what the operator sums (10^12//dz)
    cn = defaultdict(int)
    ra_frac = defaultdict(Fraction)
    for c, ss in by_c.items():
        dz = len(ss)
        for i, s1 in enumerate(sorted(ss)):
            for s2 in sorted(ss)[i + 1:]:
                w_int[(s1, s2)] += 10**12 // dz
                cn[(s1, s2)] += 1
                ra_frac[(s1, s2)] += Fraction(1, dz)
    want = sorted(w_int.items(),
                  key=lambda kv: (-kv[1], kv[0]))[:50]
    got = q171_resource_allocation(spark, SF).collect()
    assert len(got) == min(50, len(want))
    for g, (pair, w) in zip(got, want):
        assert (g["s1"], g["s2"]) == pair
        assert g["cn"] == cn[pair]
        # display score is the truncated-integer sum over 1e12,
        # within one truncation step of the exact rational
        assert abs(g["ra_score"] - float(ra_frac[pair])) < 1e-6


def test_q171_gate_parity_capped_vs_exact(spark):
    """q100 discipline applied to the RA twin: cap above every
    fixture degree (gate forced open) must be bit-identical to the
    exact path."""
    from puregraphdb_spark.operators.graph import (
        q171_resource_allocation)

    capped = sorted(map(tuple, q171_resource_allocation(
        spark, SF, max_neighborhood=512, skew_cap_bytes=0).collect()))
    exact = sorted(map(tuple, q171_resource_allocation(
        spark, SF, max_neighborhood=None).collect()))
    assert capped == exact


def test_q171_tiny_cap_bounds_expansion(spark):
    from puregraphdb_spark.operators.graph import (
        q171_resource_allocation)

    assert q171_resource_allocation(
        spark, SF, max_neighborhood=1, skew_cap_bytes=0).count() == 0


def test_q172_curve_is_monotone_and_matches_pair_recompute(spark):
    """The threshold curve must be monotone non-increasing in pairs
    and removals, and agree with a driver-side recompute from the
    exact q63-style pair relation at sf0.001."""
    from collections import defaultdict

    from puregraphdb_spark.operators.llm import (
        char_ngram_set, q172_dedup_threshold_curve)
    from puregraphdb_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    rows = q172_dedup_threshold_curve(spark, SF).collect()
    n_pairs = [r["n_pairs"] for r in rows]
    n_rm = [r["n_docs_removed"] for r in rows]
    assert n_pairs == sorted(n_pairs, reverse=True)
    assert n_rm == sorted(n_rm, reverse=True)
    assert all(r["n_docs_removed"] <= r["n_pairs"] for r in rows)

    # independent recompute: collect shingle sets, python set math
    d = load_table(spark, SF, "documents").select(
        "doc_id", char_ngram_set(F.col("text")).alias("sh")).collect()
    ref = {r["doc_id"]: set(r["sh"]) for r in d if r["doc_id"] % 100 == 0}
    new = {r["doc_id"]: set(r["sh"]) for r in d if r["doc_id"] % 100 != 0}
    want = defaultdict(lambda: [0, set()])
    for t in (0.5, 0.6, 0.7, 0.8, 0.9):
        for s, sa in ref.items():
            for dd, sb in new.items():
                i = len(sa & sb)
                u = len(sa | sb)
                if u and i / u >= t:
                    want[t][0] += 1
                    want[t][1].add(dd)
    got = {r["threshold"]: (r["n_pairs"], r["n_docs_removed"])
           for r in rows}
    assert got == {t: (c, len(ds)) for t, (c, ds) in want.items()}


def test_betweenness_source_batching_matches_unbatched(spark):
    """Source batching is a pure peak-footprint knob: batched runs
    must reproduce the unbatched scores (up to FP summation grouping
    — dependency sums are doubles)."""
    from puregraphdb_spark.operators import graph as G
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(a, b) for a, b in
         [(1, 2), (2, 3), (3, 4), (4, 5), (2, 5), (5, 6), (1, 6)]],
        "src long, dst long")
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    verts = und.select(F.col("src").alias("id")).distinct()
    g = G.Graph(verts, und)
    srcs = [1, 2, 3, 4, 5, 6]
    full = {r["id"]: r["betweenness"] for r in
            g.betweenness_centrality(srcs).collect()}
    batched = {r["id"]: r["betweenness"] for r in
               g.betweenness_centrality(srcs, source_batch=2).collect()}
    assert full.keys() == batched.keys()
    for k in full:
        assert abs(full[k] - batched[k]) < 1e-9, (k, full[k], batched[k])
    # scale multiplies through the batch sum exactly once
    scaled = {r["id"]: r["betweenness"] for r in
              g.betweenness_centrality(
                  srcs, scale=3.0, source_batch=4).collect()}
    for k in full:
        assert abs(scaled[k] - 3.0 * full[k]) < 1e-9


def test_embedding_dim_profile_hand_case(spark):
    from puregraphdb_spark.operators.pipeline import (
        embedding_dim_profile)

    df = spark.createDataFrame(
        [(1, [0.0, 2.0]), (2, [1.0, 4.0]), (3, [2.0, 0.0])],
        "vec_id long, embedding array<double>")
    out = {r["dim"]: r for r in
           embedding_dim_profile(df, dim=2).collect()}
    d0, d1 = out[0], out[1]
    assert d0["n"] == 3 and d0["mean"] == 1.0
    # population variance: ((0-1)^2+(1-1)^2+(2-1)^2)/3 = 2/3
    assert abs(d0["var"] - 2.0 / 3.0) < 1e-7
    assert d0["vmin"] == 0.0 and d0["vmax"] == 2.0
    assert abs(d0["int8_scale"] - 2.0 / 255.0) < 1e-8
    assert d1["mean"] == 2.0 and d1["vmax"] == 4.0


def test_m4_downsample_picks_deterministic_extremes(spark):
    from puregraphdb_spark.operators.events import m4_downsample

    rows = [
        # one series, one day; crafted ties everywhere
        (1, "a", "2024-01-01 00:00:00", 5.0),
        (2, "a", "2024-01-01 01:00:00", 1.0),   # min (first of tie)
        (3, "a", "2024-01-01 02:00:00", 1.0),   # min tie, later ts
        (4, "a", "2024-01-01 03:00:00", 9.0),   # max
        (5, "a", "2024-01-01 23:00:00", 7.0),   # last
        (6, "b", "2024-01-01 12:00:00", 2.0),   # singleton series
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["series"]: r for r in m4_downsample(df).collect()}
    a = out["a"]
    assert a["n_points"] == 5
    assert a["v_first"] == 5.0 and a["v_last"] == 7.0
    assert a["v_min"] == 1.0 and str(a["ts_min"]).startswith(
        "2024-01-01 01:")          # tie broken to the EARLIER point
    assert a["v_max"] == 9.0
    b = out["b"]
    # a singleton is simultaneously first/last/min/max
    assert (b["v_first"] == b["v_last"] == b["v_min"]
            == b["v_max"] == 2.0)
    assert b["n_points"] == 1


def test_m4_single_shuffle_plan(spark):
    """The four windows share one partition key → ONE exchange."""
    from puregraphdb_spark.operators.events import m4_downsample
    from puregraphdb_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    plan = m4_downsample(
        load_table(spark, SF_DIR, "events"))._jdf.queryExecution() \
        .executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2  # window exchange + final agg reuse


def test_l_diversity_hand_case(spark):
    from puregraphdb_spark.operators.profile import l_diversity_report

    rows = [
        # class (a, 1): 3 rows, all same sensitive value → exposed
        ("a", 1, "s1"), ("a", 1, "s1"), ("a", 1, "s1"),
        # class (a, 2): 2 rows, 2 distinct values → diverse
        ("a", 2, "s1"), ("a", 2, "s2"),
        # class (b, 1): singleton → trivially low diversity
        ("b", 1, "s9"),
    ]
    df = spark.createDataFrame(rows, "g string, band int, sens string")
    out = {r["g"]: r for r in l_diversity_report(
        df, ["g", "band"], "sens", l=2).collect()}
    a = out["a"]
    assert a["n_classes"] == 2 and a["n_low_diversity"] == 1
    assert a["n_rows_exposed"] == 3 and a["min_diversity"] == 1
    assert abs(a["exposure_ratio"] - 0.6) < 1e-9
    b = out["b"]
    assert b["n_low_diversity"] == 1 and b["n_rows_exposed"] == 1


def test_round13_call_doors(spark):
    from puregraphdb_spark.engine import Engine
    from tests.conftest import SF_DIR

    eng = Engine(spark, SF_DIR)
    ld = eng.sql("CALL l_diversity(table => 'documents',"
                 " quasi_cols => 'lang,source',"
                 " sensitive_col => 'doc_id', l => 2)")
    assert ld.count() > 0 and "exposure_ratio" in ld.columns
    m4 = eng.sql("CALL m4_downsample(events => 'events')")
    assert m4.count() > 0 and "v_max" in m4.columns
    ep = eng.sql("CALL embedding_dim_profile(dim => 64)")
    assert ep.count() == 64 and "int8_scale" in ep.columns


def test_allpairs_jaccard_prefix_filter_is_lossless(spark):
    """Brute-force all-pairs on random-ish sets == prefix-filtered
    result, pair for pair (the WWW'07 lemma checked in code)."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from puregraphdb_spark.operators.similarity import (
        allpairs_jaccard_join)

    # crafted universe: overlapping token sets of varied sizes,
    # including exact dups, near-dups, disjoint and tiny sets
    sets = {
        1: ["a", "b", "c", "d", "e"],
        2: ["a", "b", "c", "d", "f"],          # J=4/6 vs 1
        3: ["a", "b", "c", "d", "e"],          # dup of 1
        4: ["x", "y"],                          # tiny, disjoint
        5: ["x", "y", "z"],                     # J=2/3 vs 4
        6: ["q"],                               # singleton
        7: ["a", "m", "n", "o", "p", "r"],      # weak overlap
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in sets.items()], "doc_id long, sh array<string>")
    got = {(r["a"], r["b"]): r["jac"] for r in
           allpairs_jaccard_join(df).collect()}
    want = {}
    for x, y in combinations(sorted(sets), 2):
        i = len(set(sets[x]) & set(sets[y]))
        u = len(set(sets[x]) | set(sets[y]))
        if i * 5 >= u * 3:
            want[(x, y)] = round(i / u, 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_negative_sampling_determinism_and_flags(spark):
    from puregraphdb_spark.operators.graph import q177_negative_sampling

    a = q177_negative_sampling(spark, SF).collect()
    b = q177_negative_sampling(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # no RNG
    assert len(a) > 0 and len(a) % 3 == 0   # k=3 per sampled edge
    # candidates stay inside the supplier keyspace
    from puregraphdb_spark.sources.registry import load_table
    n_supp = load_table(spark, SF, "supplier").count()
    assert all(1 <= r["s_neg"] <= n_supp for r in a)
    # the flag is the exact membership answer
    from pyspark.sql import functions as F
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    edges = {(r["o_custkey"], r["l_suppkey"]) for r in
             o.join(l, o.o_orderkey == l.l_orderkey)
             .select("o_custkey", "l_suppkey").distinct().collect()}
    for r in a:
        assert r["is_true_edge"] == int((r["c"], r["s_neg"]) in edges)


def test_bitemporal_asof_hand_case(spark):
    """Three-regime hand case: correction visible only after its txn
    time; later validity period governs once V passes it."""
    from puregraphdb_spark.operators.incremental import bitemporal_asof

    rows = [
        # key 1: original + retroactive correction recorded later
        (1, "2024-01-01", "2024-01-01", 100.0),
        (1, "2024-01-01", "2024-02-01", 150.0),   # correction
        # key 2: two validity periods
        (2, "2024-01-01", "2024-01-01", 10.0),
        (2, "2024-03-01", "2024-03-01", 20.0),
    ]
    df = spark.createDataFrame(
        rows, "k long, valid_from string, txn_ts string, price double"
    ).selectExpr("k", "cast(valid_from as timestamp) valid_from",
                 "cast(txn_ts as timestamp) txn_ts", "price")

    def q(v, t):
        return {r["k"]: r["price"] for r in bitemporal_asof(
            df, "k", "valid_from", "txn_ts", v, t).collect()}

    # before the correction is KNOWN: old belief
    assert q("2024-01-15", "2024-01-15") == {1: 100.0, 2: 10.0}
    # after the correction lands: same valid time, new belief
    assert q("2024-01-15", "2024-02-15") == {1: 150.0, 2: 10.0}
    # V past key 2's second period: it governs
    assert q("2024-03-15", "2024-03-15") == {1: 150.0, 2: 20.0}
    # V before everything: empty state
    assert q("2023-12-01", "2024-12-01") == {}


def test_bitemporal_call_door(spark):
    from puregraphdb_spark.engine import Engine
    from tests.conftest import SF_DIR

    eng = Engine(spark, SF_DIR)
    spark.createDataFrame(
        [(1, "2024-01-01", "2024-01-01", 1.0),
         (1, "2024-01-01", "2024-02-01", 2.0)],
        "k long, valid_from string, txn_ts string, price double"
    ).selectExpr("k", "cast(valid_from as timestamp) valid_from",
                 "cast(txn_ts as timestamp) txn_ts", "price")\
        .createOrReplaceTempView("bt_versions")
    out = eng.sql(
        "CALL bitemporal_asof(versions => 'bt_versions',"
        " key_col => 'k', valid_col => 'valid_from',"
        " txn_col => 'txn_ts', valid_as_of => '2024-01-15',"
        " txn_as_of => '2024-03-01')").collect()
    assert len(out) == 1 and out[0]["price"] == 2.0


def test_source_overlap_containment_semantics(spark):
    from puregraphdb_spark.operators.pipeline import (
        source_overlap_matrix)

    rows = [
        # feed B is a strict subset re-crawl of feed A
        ("A", "x one"), ("A", "x two"), ("A", "x three"),
        ("B", "x one"), ("B", "x two"),
        # feed C disjoint
        ("C", "y other"),
        # exact dup INSIDE a feed counts once (distinct hash grain)
        ("A", "x one"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {(r["a"], r["b"]): r for r in
           source_overlap_matrix(df).collect()}
    ab = out[("A", "B")]
    assert ab["n_shared"] == 2 and ab["n_a"] == 3 and ab["n_b"] == 2
    assert ab["overlap"] == 1.0   # containment: B fully inside A
    assert ("A", "C") not in out and ("B", "C") not in out


def test_clamped_balance_hand_case(spark):
    """The clamp is non-linear: a prefix-sum window CANNOT produce
    these numbers (final would be -2 without the floor)."""
    from puregraphdb_spark.operators.events import clamped_balance

    rows = [
        # user 1: +5, -3, -4 (clamp), +2  → bal 2, resets 1, max 5
        (1, 1, "2024-01-01 00:00:00", "purchase", 5e-6),
        (2, 1, "2024-01-01 01:00:00", "view", 3e-6),
        (3, 1, "2024-01-01 02:00:00", "view", 4e-6),
        (4, 1, "2024-01-01 03:00:00", "purchase", 2e-6),
        # user 2: -1 first (clamp at step 1) → bal 0, resets 1
        (5, 2, "2024-01-01 00:00:00", "view", 1e-6),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts string, event_type string,"
        " value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["user_id"]: r for r in clamped_balance(df).collect()}
    u1 = out[1]
    assert (u1["n_events"], u1["final_bal"], u1["n_resets"],
            u1["max_bal"]) == (4, 2, 1, 5)
    u2 = out[2]
    assert (u2["final_bal"], u2["n_resets"], u2["max_bal"]) == (0, 1, 0)


def test_clamped_balance_call_door(spark):
    from puregraphdb_spark.engine import Engine
    from tests.conftest import SF_DIR

    eng = Engine(spark, SF_DIR)
    out = eng.sql("CALL clamped_balance(events => 'events')")
    assert out.count() > 0 and "n_resets" in out.columns
