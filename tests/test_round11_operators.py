"""Round-11 operator pins: winsorized-stats dual-path equivalence
(the sort-free rewrite, VERDICT r10 item 2) and the PII
detect/redact family — hand-computed ground truths on crafted text,
since the oracle sweep only proves cross-engine agreement, not that
the patterns find what a human calls PII.
"""

from __future__ import annotations

import random

import pytest

from puregraphdb_spark.operators.extras import winsorized_stats
from puregraphdb_spark.operators.pii import (
    pii_scan, plant_synthetic_pii, redact_pii,
)


def _rows():
    rng = random.Random(411)
    rows = []
    # g_big: 5000 rows > small_floor(=accuracy=1000) so the bracket
    # path runs its REAL band machinery, with heavy ties (200 distinct
    # values) so order statistics land inside tie runs.
    rows += [("g_big", float(rng.randrange(200))) for _ in range(5000)]
    # g_dup: every value identical — bounds, clips, and mean collapse.
    rows += [("g_dup", 7.25)] * 1500
    # g_small / g_one / g_two: below the small floor, the bracket
    # path's degenerate whole-group bands must still be exact.
    rows += [("g_small", float(v)) for v in range(1, 43)]
    rows += [("g_one", 3.5)]
    rows += [("g_two", 1.0), ("g_two", 2.0)]
    return rows


def test_winsorized_paths_equal(spark):
    df = spark.createDataFrame(_rows(), ["k", "v"])
    for lo, hi in [(5, 95), (0, 90), (25, 75), (0, 100)]:
        a = sorted(
            tuple(r) for r in
            winsorized_stats(df, "k", "v", lo, hi).collect())
        b = sorted(
            tuple(r) for r in
            winsorized_stats(df, "k", "v", lo, hi,
                             n_estimate=10_000).collect())
        assert a == b, (lo, hi, a, b)


# ------------------------------------------------------------------ pii

_PII_DOCS = [
    # (doc_id, text, source) — hand-counted below
    (1, "write to alice.smith+news@mail.example.org today", "a"),
    (2, "two mails: a@b.io and c_d%e@f-g.h.museum here", "a"),
    (3, "server at 10.0.255.3 and backup at 192.168.1.17", "a"),
    (4, "call +1-555-867-5309 or +44 207 946 0958 now", "b"),
    (5, "no pii here, just words and 42 numbers", "b"),
    (6, "mixed: bob@ex.co from 8.8.8.8 dial +1-555-000-1234", "b"),
]


def _pii_df(spark):
    return spark.createDataFrame(_PII_DOCS, ["doc_id", "text", "source"])


def test_pii_scan_hand_counts(spark):
    rows = {r.source: r for r in pii_scan(_pii_df(spark)).collect()}
    a, b = rows["a"], rows["b"]
    # source a: doc1 email, doc2 two emails, doc3 two IPs
    assert (a.n_docs, a.docs_with_pii) == (3, 3)
    assert (a.n_email, a.n_phone, a.n_ipv4) == (3, 0, 2)
    # source b: doc4 one phone (the +44-spaced one matches too),
    # doc5 clean, doc6 one of each
    assert (b.n_docs, b.docs_with_pii) == (3, 2)
    assert (b.n_email, b.n_phone, b.n_ipv4) == (1, 3, 1)
    assert a.pii_doc_ratio == 1.0
    assert b.pii_doc_ratio == pytest.approx(0.666667)


def test_redact_pii_replaces_and_counts(spark):
    out = {r.doc_id: r for r in redact_pii(_pii_df(spark)).collect()}
    assert out[1].text == "write to [EMAIL] today"
    assert out[4].text == "call [PHONE] or [PHONE] now"
    assert out[6].text == "mixed: [EMAIL] from [IP] dial [PHONE]"
    assert out[5].text == _PII_DOCS[4][1]  # untouched
    assert out[6].n_redactions == 3
    assert out[5].n_redactions == 0
    # redaction is idempotent: a second pass finds nothing
    again = redact_pii(redact_pii(_pii_df(spark)).drop("n_redactions"))
    assert all(r.n_redactions == 0 for r in again.collect())


def test_redact_pii_kinds_subset_and_validation(spark):
    out = {r.doc_id: r
           for r in redact_pii(_pii_df(spark), kinds=["email"]).collect()}
    assert out[6].text == "mixed: [EMAIL] from 8.8.8.8 dial +1-555-000-1234"
    assert out[6].n_redactions == 1
    with pytest.raises(ValueError):
        redact_pii(_pii_df(spark), kinds=["ssn"])


def test_plant_then_scan_matches_residue_arithmetic(spark):
    # 1001 docs with ids 0..1000: plant guarantees exactly the
    # residue-class counts, scan must find exactly those.
    df = spark.createDataFrame(
        [(i, "plain words only", "s") for i in range(1001)],
        ["doc_id", "text", "source"])
    r = pii_scan(plant_synthetic_pii(df)).collect()[0]
    n7 = sum(1 for i in range(1001) if i % 7 == 0)
    n11 = sum(1 for i in range(1001) if i % 11 == 0)
    n13 = sum(1 for i in range(1001) if i % 13 == 0)
    assert (r.n_email, r.n_phone, r.n_ipv4) == (n7, n11, n13)
    hit = sum(1 for i in range(1001)
              if i % 7 == 0 or i % 11 == 0 or i % 13 == 0)
    assert r.docs_with_pii == hit
    # ... and redaction drives the planted corpus back to zero hits
    clean = pii_scan(
        redact_pii(plant_synthetic_pii(df)).drop("n_redactions"))
    c = clean.collect()[0]
    assert (c.n_email, c.n_phone, c.n_ipv4, c.docs_with_pii) == (0, 0, 0, 0)


# ---------------------------------------------- weighted median dual


def test_weighted_median_paths_equal(spark):
    """The collect path (q136 lesson applied to q122) must equal the
    window path exactly, including tie pileups and single-row groups."""
    from puregraphdb_spark.operators.extras import weighted_median

    rng = random.Random(122)
    rows = [("g1", float(rng.randrange(50)), float(rng.randrange(1, 9)))
            for _ in range(4000)]
    rows += [("g_tie", 5.0, 2.5)] * 300 + [("g_tie", 7.0, 1.0)] * 100
    rows += [("g_one", 3.25, 0.5)]
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    a = sorted(tuple(r) for r in weighted_median(
        df, "v", "w", "k", collect_small=True).collect())
    b = sorted(tuple(r) for r in weighted_median(
        df, "v", "w", "k", collect_small=False).collect())
    assert a == b


def test_weighted_median_histogram_path_equal(spark):
    """The size-invariant histogram-refine path must equal the collect
    path exactly — forced through REAL refinement rounds (small
    buckets + band target), on skewed ties, heavy single-value
    concentration inside the crossing bucket, and all-equal groups."""
    from puregraphdb_spark.operators.extras import weighted_median

    rng = random.Random(1222)
    rows = [("g1", float(rng.randrange(500)), float(rng.randrange(1, 9)))
            for _ in range(5000)]
    # concentration: one hot value owns most of the weight mid-range
    rows += [("g_hot", 250.0, 1.0)] * 2000
    rows += [("g_hot", float(v), 1.0) for v in range(500)]
    rows += [("g_all_tie", 9.5, 3.0)] * 400   # collapses round 0
    rows += [("g_two", 1.0, 1.0), ("g_two", 2.0, 1.0)]
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    want = sorted(tuple(r) for r in weighted_median(
        df, "v", "w", "k", collect_small=True).collect())
    for n_buckets, band in [(4, 100), (1024, 100_000)]:
        got = sorted(tuple(r) for r in weighted_median(
            df, "v", "w", "k", collect_small=False,
            n_estimate=10 ** 7, n_buckets=n_buckets,
            band_target=band).collect())
        assert got == want, (n_buckets, band, got, want)


# -------------------------------------------------- doc stitching


def test_doc_stitching_hand_pairs(spark):
    """Hand-built fragments: A's tail == B's head stitches; same-edge
    self-pairs and short docs do not."""
    from puregraphdb_spark.operators.pipeline import doc_stitching_report

    docs = spark.createDataFrame([
        (1, "intro words here page one ends mid sentence", "a"),
        #       tail of 1 = "ends mid sentence" == head of 2
        (2, "ends mid sentence and the story goes on", "b"),
        (3, "totally unrelated document content right here", "a"),
        (4, "short one", "a"),                    # < 2k tokens: skipped
        (5, "ends mid sentence only five tokens x", "b"),  # also stitches
    ], ["doc_id", "text", "source"])
    got = {(r.src_from, r.src_to): (r.n_pairs, r.n_from_docs, r.n_to_docs)
           for r in doc_stitching_report(docs, k=3).collect()}
    # doc1 (a) tail -> doc2 (b) head AND doc5 (b) head == same edge
    assert got == {("a", "b"): (2, 1, 2)}


# ------------------------------------------- benchmark attribution


def test_benchmark_attribution_hand_grid(spark):
    """Hand-computed (source, bench) grid: which eval suite leaked
    into which feed, zero cells kept."""
    from puregraphdb_spark.operators.text import benchmark_attribution

    run = "alpha beta gamma delta epsilon"          # one shared 5-gram
    run2 = "one two three four five six"            # two 5-grams
    corpus = spark.createDataFrame([
        (1, f"{run} tail words here", "a"),
        (2, "totally clean document text here", "a"),
        (3, f"lead in {run2}", "b"),
        (4, f"{run2} again and again", "b"),
    ], ["doc_id", "text", "source"])
    benches = spark.createDataFrame([
        ("X", run), ("Y", run2), ("Z", "no overlap at all whatsoever"),
    ], ["bench", "text"])
    got = {(r.source, r.bench): (r.n_docs, r.n_contaminated)
           for r in benchmark_attribution(corpus, benches).collect()}
    assert got == {
        ("a", "X"): (2, 1), ("a", "Y"): (2, 0), ("a", "Z"): (2, 0),
        ("b", "X"): (2, 0), ("b", "Y"): (2, 2), ("b", "Z"): (2, 0),
    }


# ------------------------------------------- token length profile dual


def test_token_length_profile_paths_equal(spark):
    """The bracket path must pick the exact same order statistics as
    the collect path, on a >small_floor group with heavy ties plus
    degenerate small groups."""
    from puregraphdb_spark.operators.pipeline import token_length_profile

    rng = random.Random(147)
    rows = [("big", "w " * rng.randrange(1, 40)) for _ in range(5000)]
    rows += [("tiny", "a b c")] * 3 + [("one", "x y")]
    df = spark.createDataFrame(rows, ["source", "text"])
    a = sorted(tuple(r) for r in token_length_profile(df).collect())
    b = sorted(tuple(r) for r in token_length_profile(
        df, n_estimate=10_000).collect())
    assert a == b
    c = sorted(tuple(r) for r in token_length_profile(
        df, n_estimate=10 ** 9).collect())  # autoscaled accuracy
    assert a == c


# -------------------------------------------------- MAD outliers dual


def test_mad_outliers_paths_equal(spark):
    """The one-aggregation collect path must equal the two-window
    plan exactly, including tie pileups at the median."""
    from puregraphdb_spark.operators.pipeline import mad_outliers

    rng = random.Random(110)
    rows = [("A", float(rng.randrange(100)), i, 1)
            for i in range(3001)]
    rows += [("B", 5.0, i, 1) for i in range(500)]          # all ties
    rows += [("C", float(v), v, 1) for v in (1, 2, 1000)]   # heavy tail
    df = spark.createDataFrame(
        rows, ["l_returnflag", "l_extendedprice",
               "l_orderkey", "l_linenumber"])
    a = sorted(tuple(r) for r in mad_outliers(
        df, collect_small=True).collect())
    b = sorted(tuple(r) for r in mad_outliers(
        df, collect_small=False).collect())
    assert a == b
    # size-invariant bracket plan (5 bounded scans, no sorts): exact
    # on the same adversarial shapes, incl. autoscaled accuracy
    for est in (10_000, 10 ** 9):
        c = sorted(tuple(r) for r in mad_outliers(
            df, collect_small=False, n_estimate=est).collect())
        assert c == a, (est, c, a)


# --------------------------------------------- mix allocation exactness


def test_mix_allocation_exact_past_2_53(spark):
    """ADVICE r9: the redistribution used to route long arithmetic
    through doubles (floor(a*b/c)), losing exactness past 2^53. The
    decimal(38,0) remainder-based floor division must match Python
    integer arithmetic bit-for-bit on >2^53 token counts."""
    from puregraphdb_spark.operators.pipeline import mix_allocation

    data = [("a", 10, 2 ** 61), ("b", 5, 3 ** 38),
            ("c", 7, 2 ** 53 + 1), ("d", 1, 12345)]
    pct = 50
    tot = sum(t for _, _, t in data)
    budget, k = tot * pct // 100, len(data)
    fair = budget // k
    alloc1 = {s: min(t, fair) for s, _, t in data}
    leftover = budget - sum(alloc1.values())
    cap = {s: t - alloc1[s] for s, _, t in data}
    cap_total = sum(cap.values())
    want = {
        s: alloc1[s] + (min(cap[s], leftover * cap[s] // cap_total)
                        if cap_total > 0 else 0)
        for s, _, t in data
    }
    df = spark.createDataFrame(data, ["source", "n_docs", "tokens"])
    got = {r.source: r.alloc_tokens
           for r in mix_allocation(df, pct).collect()}
    assert got == want


# ------------------------------------- apply_substring_dedup (q145 cut)

_SHARED = " ".join(f"w{i}" for i in range(1, 11))  # 10 shared tokens


def _span_docs(spark):
    rows = [
        (1, f"a1 a2 a3 {_SHARED} a4 a5", "s"),
        (2, f"b1 {_SHARED} b2 b3 b4", "s"),
        (3, _SHARED, "s"),                      # fully covered
        (4, "clean  doc   with odd   spacing", "s"),  # untouched
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_apply_substring_dedup_cuts_exact_spans(spark):
    from puregraphdb_spark.operators.pipeline import apply_substring_dedup

    out = {r.doc_id: r
           for r in apply_substring_dedup(_span_docs(spark)).collect()}
    assert out[1].text == "a1 a2 a3 a4 a5"
    assert out[2].text == "b1 b2 b3 b4"
    assert out[3].text == ""                     # whole doc was a dup
    assert out[4].text == "clean  doc   with odd   spacing"  # verbatim
    assert (out[1].n_spans_cut, out[1].n_tokens_cut) == (1, 10)
    assert (out[3].n_spans_cut, out[3].n_tokens_cut) == (1, 10)
    assert (out[4].n_spans_cut, out[4].n_tokens_cut) == (0, 0)


def test_apply_substring_dedup_token_conservation(spark):
    """tokens_out = tokens_in − dup_tokens, on the real fixture corpus
    against the q145 report's own accounting."""
    from pyspark.sql import functions as F

    from puregraphdb_spark.operators.pipeline import (
        _nonempty_tokens, apply_substring_dedup, substring_dedup_report,
    )
    from puregraphdb_spark.sources.registry import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "source", "text")

    def total_tokens(df):
        return df.select(
            F.sum(F.size(_nonempty_tokens("text")))).collect()[0][0]

    rep = substring_dedup_report(docs).agg(
        F.sum("total_tokens"), F.sum("dup_tokens")).collect()[0]
    out = apply_substring_dedup(docs)
    cut = out.agg(F.sum("n_tokens_cut")).collect()[0][0]
    assert total_tokens(docs) == rep[0]
    assert cut == rep[1]
    assert total_tokens(out) == rep[0] - rep[1]


def test_winsorized_bracket_autoscales_accuracy(spark):
    # a huge n_estimate must raise accuracy so bands stay bounded —
    # and the result must still be exact on the actual (small) data,
    # where every group then falls under the raised small floor.
    df = spark.createDataFrame(_rows(), ["k", "v"])
    a = sorted(tuple(r) for r in winsorized_stats(df, "k", "v").collect())
    b = sorted(
        tuple(r) for r in
        winsorized_stats(df, "k", "v", n_estimate=10**9).collect())
    assert a == b
