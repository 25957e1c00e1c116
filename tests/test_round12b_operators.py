"""Round-12 continuation operator pins: CUSUM changepoint (q159),
corpus-LM transition score (q160), k-anonymity audit (q161),
Gopher-rule attribution (q162), and the ANN recall evaluator.

Each operator gets (a) hand-computable fixtures pinning the exact
arithmetic, (b) edge-regime cases, and (c) its CALL door.
"""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------- CUSUM

def _ts(day: int, hour: int = 0):
    return datetime.datetime(2024, 1, day, hour, 0, 0)


def test_cusum_finds_planted_level_shift(spark):
    from puregraphdb_spark.operators.events import cusum_changepoint

    # 10 days at 1.0/day, then 10 days at 5.0/day → the CUSUM argmax
    # must sit exactly on day 10 (the last pre-shift day).
    rows = [( _ts(d), "t", 1.0) for d in range(1, 11)]
    rows += [(_ts(d), "t", 5.0) for d in range(11, 21)]
    ev = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double")
    out = cusum_changepoint(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cp_day"] == _ts(10)
    assert r["n_days"] == 20
    assert r["pre_mean"] == 1.0
    assert r["post_mean"] == 5.0
    # S_10 = 10·(sum_pre) − 10·mean·10 … scaled form: |S|/n =
    # |P_k − k·T/n| = |10 − 10·60/20| = 20 → peak −20 (pre below mean)
    assert r["cusum_peak"] == -20.0


def test_cusum_flat_series_zero_peak_earliest_day(spark):
    from puregraphdb_spark.operators.events import cusum_changepoint

    ev = spark.createDataFrame(
        [(_ts(d), "t", 2.5) for d in range(1, 6)],
        "ts timestamp, event_type string, value double")
    r = cusum_changepoint(ev).collect()[0]
    # every S_k = 0 → tiebreak picks the EARLIEST day
    assert r["cusum_peak"] == 0.0 and r["cp_day"] == _ts(1)
    assert r["pre_mean"] == 2.5 and r["post_mean"] == 2.5


def test_cusum_single_day_type_emits_nothing(spark):
    from puregraphdb_spark.operators.events import cusum_changepoint

    ev = spark.createDataFrame(
        [(_ts(1), "solo", 1.0), (_ts(1, 5), "solo", 2.0)],
        "ts timestamp, event_type string, value double")
    # n = 1 day → k < n never holds → no changepoint row (correct:
    # a one-point series has no interior split)
    assert cusum_changepoint(ev).count() == 0


def test_cusum_intraday_events_aggregate_to_daily_grain(spark):
    from puregraphdb_spark.operators.events import cusum_changepoint

    rows = [(_ts(d, h), "t", 1.0) for d in (1, 2, 3) for h in (0, 12)]
    rows += [(_ts(d, h), "t", 3.0) for d in (4, 5, 6) for h in (0, 12)]
    ev = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double")
    r = cusum_changepoint(ev).collect()[0]
    assert r["cp_day"] == _ts(3)
    assert r["pre_mean"] == 2.0 and r["post_mean"] == 6.0


# -------------------------------------------------- LM transition score

def test_lm_transition_score_hand_counts(spark):
    from puregraphdb_spark.operators.pipeline import lm_transition_score

    docs = spark.createDataFrame(
        [(1, "s", "a b"), (2, "s", "a b"), (3, "s", "a c")],
        "doc_id long, source string, text string")
    r = lm_transition_score(docs).collect()[0]
    # model: c(a,b)=2, c(a,c)=1, c(a,·)=3
    # docs 1,2: num=2 den=3 score=2/3; doc 3: num=1 den=3 score=1/3
    assert r["n_docs"] == 3 and r["n_transitions"] == 3
    assert r["micro_score"] == round(5 / 9, 6)
    assert r["min_score"] == round(1 / 3, 6)
    assert r["max_score"] == round(2 / 3, 6)


def test_lm_transition_score_repeated_bigram_multiplicity(spark):
    from puregraphdb_spark.operators.pipeline import lm_transition_score

    # "a b a b" has transitions (a,b)×2, (b,a)×1 — multiplicity m
    # must weight both the model counts and the doc sums.
    docs = spark.createDataFrame(
        [(1, "s", "a b a b")], "doc_id long, source string, text string")
    r = lm_transition_score(docs).collect()[0]
    # c(a,b)=2 cu(a)=2 ; c(b,a)=1 cu(b)=1
    # num = 2·2 + 1·1 = 5 ; den = 2·2 + 1·1 = 5 → score 1.0
    assert r["n_transitions"] == 3
    assert r["micro_score"] == 1.0
    assert r["min_score"] == 1.0 and r["max_score"] == 1.0


def test_lm_transition_score_short_docs_excluded(spark):
    from puregraphdb_spark.operators.pipeline import lm_transition_score

    docs = spark.createDataFrame(
        [(1, "s", "single"), (2, "s", ""), (3, "s", "a b")],
        "doc_id long, source string, text string")
    r = lm_transition_score(docs).collect()[0]
    assert r["n_docs"] == 1  # only the 2-token doc scores


def test_lm_transition_score_perfect_predictability_is_one(spark):
    from puregraphdb_spark.operators.pipeline import lm_transition_score

    # every prefix has exactly one continuation corpus-wide → 1.0
    docs = spark.createDataFrame(
        [(1, "s", "x y z"), (2, "s", "x y z"), (3, "t", "x y")],
        "doc_id long, source string, text string")
    out = {r["source"]: r for r in lm_transition_score(docs).collect()}
    assert out["s"]["micro_score"] == 1.0
    assert out["t"]["micro_score"] == 1.0


# ---------------------------------------------------------- k-anonymity

def test_k_anonymity_hand_classes(spark):
    from puregraphdb_spark.operators.profile import k_anonymity_report

    rows = ([("en", "a")] * 7          # class of 7 — safe at k=5
            + [("en", "b")] * 2        # class of 2 — at risk
            + [("fr", "a")] * 1)       # class of 1 — at risk
    df = spark.createDataFrame(rows, "lang string, src string")
    out = {r["lang"]: r for r in
           k_anonymity_report(df, ["lang", "src"], k=5).collect()}
    en = out["en"]
    assert en["n_rows"] == 9 and en["n_classes"] == 2
    assert en["n_small_classes"] == 1 and en["n_rows_at_risk"] == 2
    assert en["min_class_size"] == 2
    assert en["risk_ratio"] == round(2 / 9, 6)
    fr = out["fr"]
    assert fr["n_rows_at_risk"] == 1 and fr["min_class_size"] == 1
    assert fr["risk_ratio"] == 1.0


def test_k_anonymity_all_safe_zero_risk(spark):
    from puregraphdb_spark.operators.profile import k_anonymity_report

    df = spark.createDataFrame([("en", "a")] * 5, "lang string, src string")
    r = k_anonymity_report(df, ["lang", "src"], k=5).collect()[0]
    assert r["n_small_classes"] == 0 and r["risk_ratio"] == 0.0


def test_k_anonymity_requires_quasi_cols(spark):
    from puregraphdb_spark.operators.profile import k_anonymity_report

    df = spark.createDataFrame([("en",)], "lang string")
    with pytest.raises(ValueError):
        k_anonymity_report(df, [], k=5)


def test_k_anonymity_report_col_override(spark):
    from puregraphdb_spark.operators.profile import k_anonymity_report

    df = spark.createDataFrame(
        [("en", "a"), ("en", "b"), ("fr", "a")], "lang string, src string")
    out = k_anonymity_report(df, ["lang", "src"], k=2,
                             report_col="src").collect()
    assert {r["src"] for r in out} == {"a", "b"}


# --------------------------------------------------------- Gopher rules

def _gopher(spark, rows):
    from puregraphdb_spark.operators.pipeline import gopher_rules_report

    df = spark.createDataFrame(rows, "source string, text string")
    return {r["source"]: r for r in gopher_rules_report(
        df, min_words=3, max_words=6).collect()}


def test_gopher_rules_attribute_each_rule(spark):
    ok_text = "the cat and dog sat"          # 5 words, all rules pass
    out = _gopher(spark, [
        ("s", ok_text),
        ("s", "the cat"),                    # < 3 words → wordcount
        ("s", "the extraordinarily magnificent hippopotamus conservation"),
        # mean word len (2+15+11+12+12)/5 = 10.4 > 10 → meanlen
        ("s", "the and ## !! -- sitting"),   # 3 symbol / 6 words → symbol
        # (sumlen 19 ≥ 3·6 keeps meanlen green; 'the','and' keep the
        # stopword rule green — the symbol rule fails ALONE)
        ("s", "cat dog bird fish"),          # 0 stopwords → stopword
    ])
    r = out["s"]
    assert r["n_docs"] == 5
    assert r["n_fail_wordcount"] == 1
    assert r["n_fail_meanlen"] == 1
    assert r["n_fail_symbol"] == 1
    # "the cat" (2 stop-hits? 'the' only → 1 < 2 → also fails stopword)
    # and "cat dog bird fish" → 2 docs fail the stopword rule; the
    # meanlen doc has only 'the' → also a stopword fail
    assert r["n_fail_stopword"] == 3
    assert r["n_fail_any"] == 4
    assert r["n_fail_multi"] == 2  # wordcount+stop, meanlen+stop
    assert r["reject_ratio"] == round(4 / 5, 6)


def test_gopher_rules_exact_boundaries_pass(spark):
    # mean word length exactly 3 and exactly 10 must PASS (closed
    # interval), pinned via cross-multiplied integer comparison
    out = _gopher(spark, [
        ("lo", "the aaa bbb ccc"),   # 4 words sumlen 12 → mean exactly 3
        ("hi", "the aaaaaaaaaaaaaaa abcdefghijkl"),
        # 3 words sumlen 3+15+12 = 30 → mean exactly 10
    ])
    assert out["lo"]["n_fail_meanlen"] == 0
    assert out["hi"]["n_fail_meanlen"] == 0


def test_gopher_symbol_rule_integer_threshold(spark):
    # exactly 10% symbols must PASS (strict >), 1 of 10 words
    text_pass = "the of and cat dog bird fish cow pig ##"
    # 2 of 10 words = 20% must FAIL
    text_fail = "the of and cat dog bird fish cow ## ##"
    out = _gopher(spark, [("p", text_pass), ("f", text_fail)])
    assert out["p"]["n_fail_symbol"] == 0
    assert out["f"]["n_fail_symbol"] == 1


# ----------------------------------------------------------- ANN recall

def _vec_corpus(spark, n=40, dim=8):
    import random

    rng = random.Random(1212)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)])
            for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


def test_ann_recall_exact_results_give_recall_one(spark):
    from puregraphdb_spark.operators.similarity import (
        ann_recall_report, exact_cosine_topk)

    corpus = _vec_corpus(spark)
    q = corpus.filter(F.col("vec_id") < 5)
    exact = exact_cosine_topk(q, corpus, k=5)
    r = ann_recall_report(q, corpus, exact, k=5,
                          method="self").collect()[0]
    assert r["micro_recall"] == 1.0
    assert r["min_recall"] == 1.0 and r["max_recall"] == 1.0
    assert r["n_perfect"] == r["n_queries"] == 5


def test_ann_recall_empty_ann_results_zero(spark):
    from puregraphdb_spark.operators.similarity import (
        ann_recall_report, exact_cosine_topk)

    corpus = _vec_corpus(spark)
    q = corpus.filter(F.col("vec_id") < 3)
    empty = exact_cosine_topk(q, corpus, k=5).filter(F.lit(False))
    r = ann_recall_report(q, corpus, empty, k=5).collect()[0]
    assert r["micro_recall"] == 0.0 and r["n_perfect"] == 0
    assert r["min_recall"] == 0.0 and r["max_recall"] == 0.0


def test_ann_recall_exhaustive_ivf_is_perfect(spark):
    from puregraphdb_spark.operators import similarity

    corpus = _vec_corpus(spark, n=30)
    q = corpus.filter(F.col("vec_id") < 4)
    cents = similarity.kmeans_centroids(corpus, k=3, iters=1, dim=8)
    # nprobe == n_clusters → every candidate is searched → exact
    ann = similarity.ivf_cosine_topk(q, corpus, cents, k=5, nprobe=3)
    r = similarity.ann_recall_report(q, corpus, ann, k=5).collect()[0]
    assert r["micro_recall"] == 1.0 and r["n_perfect"] == 4


def test_ann_recall_nprobe_monotone(spark):
    from puregraphdb_spark.operators import similarity

    corpus = _vec_corpus(spark, n=60)
    q = corpus.filter(F.col("vec_id") < 6)
    cents = similarity.kmeans_centroids(corpus, k=4, iters=2, dim=8)

    def recall(nprobe):
        ann = similarity.ivf_cosine_topk(q, corpus, cents, k=5,
                                         nprobe=nprobe)
        return similarity.ann_recall_report(
            q, corpus, ann, k=5).collect()[0]["micro_recall"]

    r1, r2, r4 = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= r4 == 1.0


# ------------------------------------------------------------ CALL doors

def test_round12b_call_doors(spark):
    from puregraphdb_spark.engine import Engine
    from tests.conftest import SF_DIR

    eng = Engine(spark, SF_DIR)
    c = eng.sql("CALL cusum_changepoint(events => 'events')")
    assert {"event_type", "cp_day", "cusum_peak"} <= set(c.columns)
    assert c.count() > 0

    lm = eng.sql("CALL lm_transition_score(docs => 'documents')")
    assert "micro_score" in lm.columns and lm.count() > 0

    ka = eng.sql(
        "CALL k_anonymity(table => 'documents',"
        " quasi_cols => 'lang,source', k => 5)")
    assert "risk_ratio" in ka.columns and ka.count() > 0

    gr = eng.sql("CALL gopher_rules(docs => 'documents')")
    assert "n_fail_any" in gr.columns and gr.count() > 0

    spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0, 0.5]) for i in range(25)],
        "vec_id long, embedding array<float>",
    ).createOrReplaceTempView("ann_q")
    ar = eng.sql(
        "CALL ann_recall(queries => 'ann_q', corpus => 'ann_q',"
        " method => 'ivf', k => 3, dim => 4, n_clusters => 2,"
        " nprobe => 2)")
    row = ar.collect()[0]
    assert row["method"] == "ivf_nprobe2"
    assert row["micro_recall"] == 1.0  # nprobe == n_clusters


# ------------------------------------------------------ selection curve

def test_selection_curve_monotone_and_exact(spark):
    from puregraphdb_spark.operators.pipeline import selection_curve

    docs = spark.createDataFrame(
        [(1, "s", "a b"), (2, "s", "a b"), (3, "s", "a c")],
        "doc_id long, source string, text string")
    # doc scores: 2/3, 2/3, 1/3 (q160 hand fixture)
    out = {r["thr"]: r for r in
           selection_curve(docs, [0.2, 0.5, 0.9]).collect()}
    assert out[0.2]["n_docs_kept"] == 3
    assert out[0.5]["n_docs_kept"] == 2
    assert out[0.5]["n_trans_kept"] == 2
    assert out[0.9]["n_docs_kept"] == 0
    # kept counts are monotone non-increasing in the threshold
    kept = [out[t]["n_docs_kept"] for t in (0.2, 0.5, 0.9)]
    assert kept == sorted(kept, reverse=True)
    assert out[0.5]["kept_ratio"] == round(2 / 3, 6)


def test_selection_curve_boundary_is_inclusive(spark):
    from puregraphdb_spark.operators.pipeline import selection_curve

    docs = spark.createDataFrame(
        [(1, "s", "a b"), (2, "s", "a b"), (3, "s", "a c")],
        "doc_id long, source string, text string")
    # threshold exactly equal to a doc score (1/3) keeps that doc
    r = selection_curve(docs, [1 / 3]).collect()[0]
    assert r["n_docs_kept"] == 3


def test_selection_curve_requires_thresholds(spark):
    from puregraphdb_spark.operators.pipeline import selection_curve

    docs = spark.createDataFrame(
        [(1, "s", "a b")], "doc_id long, source string, text string")
    with pytest.raises(ValueError):
        selection_curve(docs, [])


def test_selection_curve_call_door(spark):
    from puregraphdb_spark.engine import Engine
    from tests.conftest import SF_DIR

    eng = Engine(spark, SF_DIR)
    out = eng.sql(
        "CALL selection_curve(docs => 'documents',"
        " thresholds => '0.0,1.1')")
    rows = out.collect()
    lo = [r for r in rows if r["thr"] == 0.0]
    hi = [r for r in rows if r["thr"] == 1.1]
    assert all(r["kept_ratio"] == 1.0 for r in lo)   # keep everything
    assert all(r["n_docs_kept"] == 0 for r in hi)    # keep nothing


# -------------------------------------------- entity resolution (apply)

def _er_records(spark):
    return spark.createDataFrame(
        [(1, "acme corp", "us"), (2, "acme corp.", "us"),
         (3, "acme inc", "us"), (4, "zenith ltd", "us"),
         (5, "acme corp", "eu")],
        "rec_id long, name string, region string")


def test_apply_entity_resolution_keeps_one_per_entity(spark):
    from puregraphdb_spark.operators.similarity import (
        apply_entity_resolution, entity_resolution)

    df = _er_records(spark)
    out = apply_entity_resolution(df, "rec_id", "name", ["region"],
                                  max_distance=2)
    rep = entity_resolution(df, "rec_id", "name", ["region"],
                            max_distance=2).toPandas()
    survivors = set(rep[rep.is_survivor == 1].rec_id)
    got = out.collect()
    assert {r["rec_id"] for r in got} == survivors
    # original schema + entity metadata, one row per entity
    assert {"rec_id", "name", "region", "entity_id",
            "cluster_size"} == set(out.columns)
    assert len(got) == rep.entity_id.nunique()


def test_apply_entity_resolution_call_door(spark):
    from puregraphdb_spark.engine import Engine
    from tests.conftest import SF_DIR

    eng = Engine(spark, SF_DIR)
    _er_records(spark).createOrReplaceTempView("er_recs")
    out = eng.sql(
        "CALL apply_entity_resolution(table => 'er_recs',"
        " id_col => 'rec_id', text_col => 'name',"
        " block_cols => 'region', max_distance => 2)")
    assert out.count() >= 2  # ≥ the zenith singleton + one acme


# ------------------------------------------- brute-force Hypothesis pins

def test_cusum_matches_bruteforce_hypothesis(spark):
    # Pin the changepoint argmax + reported stats against a pure-python
    # CUSUM over random small daily series (values on the 3-dp grid).
    from fractions import Fraction

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from puregraphdb_spark.operators.events import cusum_changepoint

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(vals=st.lists(
        st.integers(min_value=-2000, max_value=9000).map(
            lambda v: v / 1000.0),
        min_size=2, max_size=12))
    def run(vals):
        rows = [(datetime.datetime(2024, 1, d + 1), "t", v)
                for d, v in enumerate(vals)]
        ev = spark.createDataFrame(
            rows, "ts timestamp, event_type string, value double")
        r = cusum_changepoint(ev).collect()[0]
        # exact rational reference
        xs = [Fraction(round(v * 1000), 1000) for v in vals]
        n, tot = len(xs), sum(xs)
        best_k, best_s = None, None
        for k in range(1, n):
            p = sum(xs[:k])
            s = n * p - k * tot
            if best_s is None or abs(s) > abs(best_s):
                best_k, best_s = k, s
        assert r["cp_day"] == datetime.datetime(2024, 1, best_k)
        assert r["n_days"] == n
        pre = sum(xs[:best_k]) / best_k
        post = (tot - sum(xs[:best_k])) / (n - best_k)
        assert abs(r["pre_mean"] - float(pre)) < 5e-4, vals
        assert abs(r["post_mean"] - float(post)) < 5e-4, vals
        assert abs(r["cusum_peak"] - float(Fraction(best_s, n))) < 5e-4

    run()


def test_lm_score_matches_bruteforce_hypothesis(spark):
    # Pin per-source micro/min/max against a pure-python bigram model
    # over random small corpora.
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from puregraphdb_spark.operators.pipeline import lm_transition_score

    VOCAB = ["a", "b", "c"]

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(docs=st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=2, max_size=6),
        min_size=1, max_size=8))
    def run(docs):
        rows = [(i, "s", " ".join(toks)) for i, toks in enumerate(docs)]
        sdf = spark.createDataFrame(
            rows, "doc_id long, source string, text string")
        r = lm_transition_score(sdf).collect()[0]
        # reference model
        cb, cu = {}, {}
        for toks in docs:
            for w1, w2 in zip(toks, toks[1:]):
                cb[(w1, w2)] = cb.get((w1, w2), 0) + 1
                cu[w1] = cu.get(w1, 0) + 1
        nums, dens, scores = 0, 0, []
        for toks in docs:
            num = sum(cb[(w1, w2)] for w1, w2 in zip(toks, toks[1:]))
            den = sum(cu[w1] for w1, _ in zip(toks, toks[1:]))
            nums += num
            dens += den
            scores.append(num / den)
        assert r["n_docs"] == len(docs)
        assert r["n_transitions"] == sum(len(t) - 1 for t in docs)
        assert abs(r["micro_score"] - nums / dens) < 5e-6, docs
        assert abs(r["min_score"] - min(scores)) < 5e-6
        assert abs(r["max_score"] - max(scores)) < 5e-6

    run()


# -------------------------------------- incremental aggregate refresh

def test_incremental_refresh_equals_recompute_hypothesis(spark):
    # The maintenance identity on random CDC batches: refresh of the
    # base aggregate through (inserts, deletes) equals the snapshot
    # aggregate of the final state — including groups that die (fully
    # deleted) and groups born in the batch.
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from puregraphdb_spark.operators.incremental import (
        incremental_agg_refresh, snapshot_aggregate)

    KEYS = ["a", "b"]
    MEAS = {"s": ("v", 2)}
    row = st.tuples(st.sampled_from(["a", "b"]),
                    st.integers(min_value=-500, max_value=500).map(
                        lambda v: v / 100.0))

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(base=st.lists(row, min_size=0, max_size=12),
           ins=st.lists(row, min_size=0, max_size=6),
           n_del=st.integers(min_value=0, max_value=12))
    def run(base, ins, n_del):
        dels = base[:n_del]          # deletes must exist in base
        final = base[n_del:] + ins
        schema = "k string, v double"

        def df(rows):
            return spark.createDataFrame(rows, schema) if rows else \
                spark.createDataFrame([], schema)

        old = snapshot_aggregate(df(base), ["k"], MEAS)
        got = sorted(
            (r["k"], r["n"], float(r["s"])) for r in
            incremental_agg_refresh(old, df(ins), df(dels), ["k"],
                                    MEAS).collect())
        want = sorted(
            (r["k"], r["n"], float(r["s"])) for r in
            snapshot_aggregate(df(final), ["k"], MEAS).collect()
            if r["n"] > 0)
        assert got == want, (base, ins, n_del)

    run()


def test_incremental_refresh_drops_dead_and_births_new(spark):
    from puregraphdb_spark.operators.incremental import (
        incremental_agg_refresh, snapshot_aggregate)

    schema = "k string, v double"
    base = spark.createDataFrame([("dies", 1.5), ("stays", 2.0)], schema)
    ins = spark.createDataFrame([("born", 3.25)], schema)
    dels = spark.createDataFrame([("dies", 1.5)], schema)
    old = snapshot_aggregate(base, ["k"], {"s": ("v", 2)})
    out = {r["k"]: (r["n"], float(r["s"])) for r in
           incremental_agg_refresh(old, ins, dels, ["k"],
                                   {"s": ("v", 2)}).collect()}
    assert out == {"stays": (1, 2.0), "born": (1, 3.25)}


def test_incremental_refresh_raises_on_negative_count(spark):
    # ADVICE r12: a delete for an absent row must stop the refresh
    # loudly, not vanish through the n > 0 filter.
    import pytest

    from puregraphdb_spark.operators.incremental import (
        incremental_agg_refresh, snapshot_aggregate)

    schema = "k string, v double"
    base = spark.createDataFrame([("x", 1.0)], schema)
    ins = spark.createDataFrame([], schema)
    dels = spark.createDataFrame([("ghost", 9.0)], schema)  # not in base
    old = snapshot_aggregate(base, ["k"], {"s": ("v", 2)})
    with pytest.raises(Exception, match="negative"):
        incremental_agg_refresh(old, ins, dels, ["k"],
                                {"s": ("v", 2)}).collect()


def test_incremental_refresh_call_door(spark):
    from puregraphdb_spark.engine import Engine
    from puregraphdb_spark.operators.incremental import (
        snapshot_aggregate)
    from tests.conftest import SF_DIR

    eng = Engine(spark, SF_DIR)
    schema = "k string, v double"
    base = spark.createDataFrame([("x", 1.0), ("y", 2.0)], schema)
    snapshot_aggregate(base, ["k"], {"s": ("v", 2)})\
        .createOrReplaceTempView("ia_old")
    spark.createDataFrame([("x", 0.5)], schema)\
        .createOrReplaceTempView("ia_ins")
    spark.createDataFrame([("y", 2.0)], schema)\
        .createOrReplaceTempView("ia_del")
    out = {r["k"]: (r["n"], float(r["s"])) for r in eng.sql(
        "CALL incremental_agg_refresh(old_agg => 'ia_old',"
        " inserts => 'ia_ins', deletes => 'ia_del',"
        " keys => 'k', measures => 's:v:2')").collect()}
    assert out == {"x": (2, 1.5)}


# ---------------------------------------------- join cardinality profile

def test_join_cardinality_exact_products(spark):
    from puregraphdb_spark.operators.skew import join_cardinality_profile

    left = spark.createDataFrame(
        [("k1",)] * 3 + [("k2",)] * 2 + [("only_left",)], "jk string")
    right = spark.createDataFrame(
        [("k1",)] * 4 + [("k2",)] * 1 + [("only_right",)], "jk string")
    out = {r["jk"]: r for r in
           join_cardinality_profile(left, right, "jk").collect()}
    # keys on one side only contribute nothing and never appear
    assert set(out) == {"k1", "k2"}
    assert (out["k1"]["c_left"], out["k1"]["c_right"],
            out["k1"]["out_rows"]) == (3, 4, 12)
    assert out["k2"]["out_rows"] == 2
    assert out["k1"]["total_out_rows"] == 14
    assert out["k1"]["out_share"] == round(12 / 14, 6)
    # the profile equals the materialized join's true size
    assert left.join(right, "jk").count() == 14


def test_join_cardinality_topk_orders_by_product(spark):
    from puregraphdb_spark.operators.skew import join_cardinality_profile

    rows_l = [(f"k{i}",) for i in range(20) for _ in range(i + 1)]
    left = spark.createDataFrame(rows_l, "jk string")
    out = join_cardinality_profile(left, left, "jk", topk=3).collect()
    assert [r["jk"] for r in out] == ["k19", "k18", "k17"]
    assert out[0]["out_rows"] == 20 * 20


def test_join_cardinality_call_door(spark):
    from puregraphdb_spark.engine import Engine
    from tests.conftest import SF_DIR

    eng = Engine(spark, SF_DIR)
    spark.createDataFrame([("a",)] * 3 + [("b",)], "jk string")\
        .createOrReplaceTempView("jc_l")
    spark.createDataFrame([("a",)] * 2, "jk string")\
        .createOrReplaceTempView("jc_r")
    out = eng.sql(
        "CALL join_cardinality(left => 'jc_l', right => 'jc_r',"
        " key => 'jk', topk => 5)").collect()
    assert len(out) == 1
    assert out[0]["out_rows"] == 6 and out[0]["out_share"] == 1.0


# ------------------------------------------------- arrival regularity

def test_arrival_regularity_bot_ranks_first(spark):
    from puregraphdb_spark.operators.events import arrival_regularity

    base = datetime.datetime(2024, 1, 1)
    # bot: perfectly regular 60s clock → cv2 == 0
    rows = [(base + datetime.timedelta(seconds=60 * i), 1)
            for i in range(10)]
    # human: irregular gaps (10s, 300s, 45s, ...)
    gaps = [10, 300, 45, 700, 5, 120, 80, 400, 33]
    t = base
    rows.append((t, 2))
    for g in gaps:
        t = t + datetime.timedelta(seconds=g)
        rows.append((t, 2))
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long")
    out = arrival_regularity(ev, min_events=5, topk=10).collect()
    assert [r["user_id"] for r in out] == [1, 2]
    assert out[0]["cv2"] == 0.0
    assert out[0]["mean_delta_us"] == 60_000_000.0
    assert out[1]["cv2"] > 0.5  # irregular human far from the clock


def test_arrival_regularity_hand_cv2(spark):
    from puregraphdb_spark.operators.events import arrival_regularity

    base = datetime.datetime(2024, 1, 1)
    # deltas: 1s, 3s, 2s, 2s  (n=4, S=8e6, mean=2e6)
    offs = [0, 1, 4, 6, 8]
    ev = spark.createDataFrame(
        [(base + datetime.timedelta(seconds=o), 7) for o in offs],
        "ts timestamp, user_id long")
    r = arrival_regularity(ev, min_events=5).collect()[0]
    # var = (4*Σd²−S²)/(4·3); Σd²=(1+9+4+4)e12=18e12
    # cv2 = 4*(4*18e12−64e12)/((4−1)*64e12) = 4*8e12/192e12 = 1/6
    assert r["n_events"] == 5
    assert r["mean_delta_us"] == 2_000_000.0
    assert r["cv2"] == round(1 / 6, 6)


def test_arrival_regularity_filters_thin_users(spark):
    from puregraphdb_spark.operators.events import arrival_regularity

    base = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(base + datetime.timedelta(seconds=i), 1) for i in range(3)],
        "ts timestamp, user_id long")
    assert arrival_regularity(ev, min_events=5).count() == 0


def test_arrival_regularity_call_door(spark):
    from puregraphdb_spark.engine import Engine
    from tests.conftest import SF_DIR

    eng = Engine(spark, SF_DIR)
    out = eng.sql("CALL arrival_regularity(events => 'events',"
                  " topk => 3)")
    rows = out.collect()
    assert len(rows) == 3
    cvs = [r["cv2"] for r in rows]
    assert cvs == sorted(cvs)


# ---------------------------------------------------- SCD1 upsert apply

def test_apply_cdc_upsert_semantics(spark):
    from puregraphdb_spark.operators.incremental import apply_cdc_upsert

    schema = "k long, val string, version long"
    dim = spark.createDataFrame(
        [(1, "old1", 0), (2, "old2", 0), (3, "old3", 0)], schema)
    updates = spark.createDataFrame(
        [(1, "upd1a", 1), (1, "upd1b", 2),   # latest-of-batch wins
         (4, "new4", 1)], schema)            # new key inserts
    out = {r["k"]: r["val"] for r in
           apply_cdc_upsert(dim, updates, "k", "version").collect()}
    assert out == {1: "upd1b", 2: "old2", 3: "old3", 4: "new4"}


def test_apply_cdc_upsert_matches_naive_recompute_hypothesis(spark):
    # maintained (anti-join + batch-latest) == naive latest-per-key
    # over the full union, on random dims/batches.
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from puregraphdb_spark.operators.incremental import apply_cdc_upsert

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(dim_keys=st.lists(st.integers(0, 6), min_size=0, max_size=6,
                             unique=True),
           upd=st.lists(st.integers(0, 6), min_size=0, max_size=6,
                        unique=True))
    def run(dim_keys, upd):
        schema = "k long, val string, version long"
        dim = spark.createDataFrame(
            [(k, f"d{k}", 0) for k in dim_keys], schema)
        # two versioned updates per key — versions unique per key
        ups = spark.createDataFrame(
            [(k, f"u{k}v{v}", v) for k in upd for v in (1, 2)], schema)
        got = {(r["k"], r["val"]) for r in
               apply_cdc_upsert(dim, ups, "k", "version").collect()}
        want = {(k, f"d{k}") for k in dim_keys if k not in upd}
        want |= {(k, f"u{k}v2") for k in upd}
        assert got == want, (dim_keys, upd)

    run()


def test_apply_cdc_upsert_raises_on_tied_winner(spark):
    # ADVICE r12: equal versions at the winning position used to pick
    # a nondeterministic winner silently — now the batch is rejected.
    import pytest

    from puregraphdb_spark.operators.incremental import apply_cdc_upsert

    schema = "k long, val string, version long"
    dim = spark.createDataFrame([(1, "old", 0)], schema)
    tied = spark.createDataFrame(
        [(1, "a", 5), (1, "b", 5)], schema)  # duplicate (key, version)
    with pytest.raises(Exception, match="nondeterministic"):
        apply_cdc_upsert(dim, tied, "k", "version").collect()
    # a tie BELOW the winner does not corrupt the result: versions
    # (1, 1, 2) have a unique maximum and must pass.
    ok = spark.createDataFrame(
        [(1, "l1a", 1), (1, "l1b", 1), (1, "top", 2)], schema)
    out = apply_cdc_upsert(dim, ok, "k", "version").collect()
    assert [(r["k"], r["val"]) for r in out] == [(1, "top")]


def test_apply_cdc_upsert_call_door(spark):
    from puregraphdb_spark.engine import Engine
    from tests.conftest import SF_DIR

    eng = Engine(spark, SF_DIR)
    schema = "k long, val string, version long"
    spark.createDataFrame([(1, "old", 0)], schema)\
        .createOrReplaceTempView("up_dim")
    spark.createDataFrame([(1, "new", 1)], schema)\
        .createOrReplaceTempView("up_upd")
    out = eng.sql("CALL apply_cdc_upsert(dim => 'up_dim',"
                  " updates => 'up_upd', key => 'k',"
                  " version_col => 'version')").collect()
    assert [(r["k"], r["val"]) for r in out] == [(1, "new")]


# ------------------------------------------------ multimodal inventory

def test_asset_profile_exact_counts(spark):
    from puregraphdb_spark.operators.multimodal import asset_profile

    rows = [
        (1, "image", "image/png", bytearray(b"aaa")),
        (2, "image", "image/png", bytearray(b"aaa")),   # exact dup
        (3, "image", "image/png", bytearray(b"bbbb")),
        (4, "image", "image/png", None),                # missing
        (5, "audio", "audio/wav", bytearray(b"cc")),
    ]
    df = spark.createDataFrame(
        rows, "asset_id long, modality string, media_type string,"
              " payload binary")
    out = {(r["modality"], r["media_type"]): r for r in
           asset_profile(df).collect()}
    img = out[("image", "image/png")]
    assert img["n_assets"] == 4
    assert img["total_bytes"] == 3 + 3 + 4
    assert img["n_distinct_payloads"] == 2
    assert img["n_missing"] == 1
    assert img["n_removable"] == 1            # one of the two 'aaa'
    assert img["dup_ratio"] == 0.25
    aud = out[("audio", "audio/wav")]
    assert (aud["n_assets"], aud["n_removable"]) == (1, 0)


def test_asset_profile_call_door(spark):
    from puregraphdb_spark.engine import Engine
    from tests.conftest import SF_DIR

    eng = Engine(spark, SF_DIR)
    spark.createDataFrame(
        [(1, "image", "image/png", bytearray(b"x"))],
        "asset_id long, modality string, media_type string,"
        " payload binary",
    ).createOrReplaceTempView("ap_assets")
    out = eng.sql("CALL asset_profile(assets => 'ap_assets')").collect()
    assert out[0]["n_assets"] == 1 and out[0]["total_bytes"] == 1


# ---------------------------------------------------- vector hygiene

def test_vector_hygiene_defect_classes(spark):
    from puregraphdb_spark.operators.similarity import (
        vector_hygiene_report)

    rows = [
        (1, [3.0, 4.0], 0),              # healthy, norm2 = 25
        (2, [0.0, 0.0], 0),              # zero vector
        (3, [1.0, float("nan")], 0),     # non-finite
        (4, [1.0, 2.0, 3.0], 0),         # wrong dim
        (5, [1.0, 0.0], 0),              # healthy, norm2 = 1
        (6, None, 0),                    # NULL vector (ADVICE r12)
        (7, [float("inf"), 0.0], 1),     # non-finite (inf)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    out = {r["label"]: r for r in
           vector_hygiene_report(df, dim=2).collect()}
    r0 = out[0]
    assert r0["n_vecs"] == 6
    assert r0["n_null"] == 1
    assert r0["n_bad_dim"] == 1
    assert r0["n_nonfinite"] == 1
    assert r0["n_zero"] == 1
    # the defect classes + healthy partition n_vecs exactly: a NULL
    # vector may not vanish from the census (ADVICE r12).
    assert (r0["n_null"] + r0["n_bad_dim"] + r0["n_nonfinite"]
            + r0["n_zero"]) == 4   # 6 vecs - 2 healthy
    assert r0["min_norm2"] == 1.0 and r0["max_norm2"] == 25.0
    r1 = out[1]
    assert r1["n_nonfinite"] == 1 and r1["n_null"] == 0
    assert r1["min_norm2"] is None  # no healthy vectors in label 1


def test_vector_hygiene_clean_corpus_all_healthy(spark):
    from puregraphdb_spark.operators.similarity import (
        vector_hygiene_report)
    from puregraphdb_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    out = vector_hygiene_report(emb, dim=64).collect()
    assert all(r["n_bad_dim"] == 0 and r["n_nonfinite"] == 0
               and r["n_zero"] == 0 and r["n_null"] == 0 for r in out)
    assert all(r["min_norm2"] > 0 for r in out)


def test_vector_hygiene_call_door(spark):
    from puregraphdb_spark.engine import Engine
    from tests.conftest import SF_DIR

    eng = Engine(spark, SF_DIR)
    out = eng.sql("CALL vector_hygiene(embeddings => 'embeddings',"
                  " dim => 64)")
    assert out.count() > 0 and "n_nonfinite" in out.columns
