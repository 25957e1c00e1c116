"""CALL-door parity for the time-series/custom operators (VERDICT r3
gap #2): as_of_join, time_rollup, sessionize, percentile_cont must be
reachable from EP2 and produce exactly what the Python surface does.
"""

from __future__ import annotations

import pandas as pd

from puregraphdb_spark.engine import Engine
from puregraphdb_spark.sources.registry import load_table
from tests.conftest import SF_DIR, assert_frames_match


def _engine(spark) -> Engine:
    return Engine(spark, SF_DIR)  # registers fixture views


def test_call_as_of_join_matches_python(spark):
    from pyspark.sql import functions as F

    from puregraphdb_spark.operators.asof import as_of_join

    eng = _engine(spark)
    ev = load_table(spark, SF_DIR, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value")
    p.createOrReplaceTempView("asof_left")
    c.createOrReplaceTempView("asof_right")

    via_call = eng.sql(
        "CALL as_of_join(left => 'asof_left', right => 'asof_right', "
        "on => 'user_id', left_ts => 'ts', right_ts => 'ts', "
        "right_cols => 'ts,value')"
    ).toPandas()
    direct = as_of_join(p, c, on="user_id", left_ts="ts", right_ts="ts",
                        right_cols=["ts", "value"]).toPandas()
    assert_frames_match(via_call, direct)
    assert len(direct) > 0


def test_call_time_rollup_matches_python(spark):
    from puregraphdb_spark.operators.rollup import time_rollup

    eng = _engine(spark)
    via_call = eng.sql(
        "CALL time_rollup(events => 'events', ts_col => 'ts', "
        "granularities => '15 minutes,1 hour,1 day', "
        "group_cols => 'event_type', "
        "measures => 'n:count,sum_val:sum:value')"
    ).toPandas()
    direct = time_rollup(
        load_table(spark, SF_DIR, "events"), "ts",
        ["15 minutes", "1 hour", "1 day"], ["event_type"],
        {"n": ("count", None), "sum_val": ("sum", "value")},
    ).toPandas()
    assert_frames_match(via_call, direct)
    assert set(via_call["granularity"]) == {"15 minutes", "1 hour", "1 day"}


def test_call_sessionize_matches_python(spark):
    from puregraphdb_spark.operators.events import sessionize

    eng = _engine(spark)
    via_call = eng.sql(
        "CALL sessionize(events => 'events', gap => '30 minutes')"
    ).toPandas()
    direct = sessionize(load_table(spark, SF_DIR, "events"),
                        gap="30 minutes").toPandas()
    assert_frames_match(via_call, direct)
    assert len(direct) > 0


def test_call_percentile_cont_matches_python(spark):
    from puregraphdb_spark.operators.percentile import exact_percentile_cont

    eng = _engine(spark)
    via_call = eng.sql(
        "CALL percentile_cont(table => 'lineitem', "
        "group_col => 'l_returnflag', val_col => 'l_extendedprice', "
        "ps => '0.5,0.9')"
    ).toPandas()
    direct = exact_percentile_cont(
        load_table(spark, SF_DIR, "lineitem"), "l_returnflag",
        "l_extendedprice", [0.5, 0.9],
    ).toPandas()
    assert_frames_match(via_call, direct)
    # cross-check p50 against the SQL door's own median
    med = eng.sql(
        "select l_returnflag, median(l_extendedprice) as m "
        "from lineitem group by l_returnflag"
    ).toPandas().set_index("l_returnflag")["m"]
    got = via_call.set_index("l_returnflag")["p_0"]
    for k in got.index:
        assert abs(got[k] - med[k]) < 1e-6


def test_call_bad_measures_raises(spark):
    import pytest

    eng = _engine(spark)
    with pytest.raises(ValueError, match="bad measure"):
        eng.sql(
            "CALL time_rollup(events => 'events', ts_col => 'ts', "
            "granularities => '1 hour', measures => 'oops')"
        )


def test_call_find_motifs_matches_graph_api(spark):
    from puregraphdb_spark.operators.graph import Graph

    eng = _engine(spark)
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3)], ["src", "dst"]
    )
    e.createOrReplaceTempView("motif_edges")
    via_call = eng.sql(
        "CALL find_motifs(edges => 'motif_edges', "
        "pattern => '(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)')"
    ).toPandas()
    v = (
        e.selectExpr("src as id").union(e.selectExpr("dst as id")).distinct()
    )
    direct = Graph(v, e).find(
        "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)"
    ).toPandas()
    key = lambda df: sorted(  # noqa: E731
        (r["a"]["id"], r["b"]["id"], r["c"]["id"])
        for _, r in df.iterrows()
    )
    assert key(via_call) == key(direct)
    # 1→2→3 is closed by the 1→3 edge; 1→3→4 and 2→3→4 stay open
    assert key(via_call) == [(1, 3, 4), (2, 3, 4)]


def test_call_contamination_report_matches_python(spark):
    from pyspark.sql import functions as F

    from puregraphdb_spark.operators.text import contamination_report
    from puregraphdb_spark.sources.registry import load_table

    eng = _engine(spark)
    d = load_table(spark, SF_DIR, "documents")
    bench = d.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.substring("text", 5, 120).alias("text")
    )
    bench.createOrReplaceTempView("bench_docs")
    via_call = eng.sql(
        "CALL contamination_report(corpus => 'documents', "
        "benchmark => 'bench_docs')"
    ).toPandas().sort_values("corpus_id", ignore_index=True)
    direct = contamination_report(d, bench).toPandas().sort_values(
        "corpus_id", ignore_index=True
    )
    assert_frames_match(via_call, direct)
    assert len(direct) > 0


def test_call_weighted_graph_params(spark):
    eng = _engine(spark)
    e = spark.createDataFrame(
        [(1, 2, 9.0), (1, 3, 1.0)], ["src", "dst", "w"]
    )
    e.createOrReplaceTempView("wedges")
    pr = eng.sql(
        "CALL pagerank(edges => 'wedges', max_iter => 3, "
        "weight_col => 'w')"
    ).toPandas().set_index("id")["pagerank"]
    assert pr[2] > pr[3]
    spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 10.0)], ["src", "dst", "w"]
    ).createOrReplaceTempView("sp_edges")
    sp = eng.sql(
        "CALL shortest_paths(edges => 'sp_edges', landmarks => '3', "
        "weight_col => 'w')"
    ).toPandas().set_index("id")["dist"]
    assert sp[1] == 2.0  # detour 1→2→3 (1+1) beats the w=10 direct edge


def test_call_sequence_pack_matches_python(spark):
    from puregraphdb_spark.operators.pipeline import sequence_pack

    eng = _engine(spark)
    via_call = eng.sql(
        "CALL sequence_pack(docs => 'documents', budget => 128)"
    ).toPandas()
    direct = sequence_pack(
        load_table(spark, SF_DIR, "documents"), budget=128
    ).toPandas()
    assert_frames_match(via_call, direct)


def test_call_betweenness_and_minhop_reach(spark):
    from pyspark.sql import functions as F

    eng = _engine(spark)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2)], ["src", "dst"]
    )
    edges.createOrReplaceTempView("proc_bc_edges")
    got = {
        r["id"]: r["betweenness"]
        for r in eng.sql(
            "CALL betweenness(edges => 'proc_bc_edges', "
            "sources => '0,1,2,3')"
        ).collect()
    }
    # path 0→1→2→3 with the 0→2 shortcut: 1 carries nothing 0-rooted
    # (0 reaches 2 directly); dependencies: δ0(2)=1 (to 3), δ1(2)=1
    assert got == {0: 0.0, 1: 0.0, 2: 2.0, 3: 0.0}
    reach23 = sorted(
        (r["src"], r["dst"])
        for r in eng.sql(
            "CALL reach(edges => 'proc_bc_edges', max_hops => 3, "
            "min_hops => 2)"
        ).collect()
    )
    # dist: (0,1)=1 (0,2)=1 (0,3)=2 (1,2)=1 (1,3)=2 (2,3)=1
    assert reach23 == [(0, 3), (1, 3)]


def test_call_round9_doors_match_python(spark):
    """EP2 parity for the round-9 CALL doors: each procedure must
    return exactly what the Python operator surface does."""
    from puregraphdb_spark.operators.events import (
        anomaly_mad_ts, burst_detection, seasonal_dow,
    )
    from puregraphdb_spark.operators.extras import winsorized_stats
    from puregraphdb_spark.operators.llm import cross_source_shingles
    from puregraphdb_spark.operators.pipeline import (
        class_balance_plan, source_mix_budget,
    )

    eng = _engine(spark)
    ev = load_table(spark, SF_DIR, "events")
    docs = load_table(spark, SF_DIR, "documents")
    li = load_table(spark, SF_DIR, "lineitem")

    for call, direct in [
        ("CALL anomaly_mad(events => 'events')",
         anomaly_mad_ts(ev)),
        ("CALL seasonal_dow(events => 'events')",
         seasonal_dow(ev)),
        ("CALL burst_detection(events => 'events')",
         burst_detection(ev)),
        ("CALL winsorized_stats(table => 'lineitem', "
         "group_col => 'l_returnflag', value_col => 'l_extendedprice')",
         winsorized_stats(li, "l_returnflag", "l_extendedprice")),
        ("CALL source_mix_budget(docs => 'documents')",
         source_mix_budget(docs)),
        ("CALL class_balance(docs => 'documents')",
         class_balance_plan(docs)),
        ("CALL cross_source_shingles(docs => 'documents')",
         cross_source_shingles(docs)),
    ]:
        assert_frames_match(eng.sql(call).toPandas(), direct.toPandas())


def test_call_node2vec_pq1_matches_random_walks(spark):
    eng = _engine(spark)
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)], ["src", "dst"])
    e.createOrReplaceTempView("n2v_edges")
    def corpus(df):
        # the walk column is an array — flatten for comparability
        # (assert_frames_match's sort can't hash ndarray cells)
        return sorted(
            (r["start_id"], r["walk_no"], tuple(r["path"]))
            for r in df.collect()
        )

    uni = corpus(eng.sql(
        "CALL random_walks(edges => 'n2v_edges', walk_length => 4, "
        "walks_per_node => 2, seed => 5)"))
    n2v = corpus(eng.sql(
        "CALL node2vec_walks(edges => 'n2v_edges', walk_length => 4, "
        "walks_per_node => 2, seed => 5, p => 1, q => 1)"))
    assert uni == n2v and len(uni) > 0
    biased = eng.sql(
        "CALL node2vec_walks(edges => 'n2v_edges', walk_length => 4, "
        "walks_per_node => 2, seed => 5, p => 0.25, q => 4.0)")
    assert biased.count() == len(uni)


def test_call_split_contamination_and_vocab_growth(spark):
    from puregraphdb_spark.operators.pipeline import (
        split_contamination, vocab_growth,
    )

    eng = _engine(spark)
    docs = load_table(spark, SF_DIR, "documents")
    assert_frames_match(
        eng.sql("CALL split_contamination(docs => 'documents')")
        .toPandas(),
        split_contamination(docs).toPandas())
    assert_frames_match(
        eng.sql("CALL vocab_growth(docs => 'documents')").toPandas(),
        vocab_growth(docs).toPandas())


def test_call_seasonal_burst_and_dedup_impact(spark):
    from puregraphdb_spark.operators.events import seasonal_burst_detection
    from puregraphdb_spark.operators.pipeline import dedup_impact_by_source

    eng = _engine(spark)
    ev = load_table(spark, SF_DIR, "events")
    docs = load_table(spark, SF_DIR, "documents")
    assert_frames_match(
        eng.sql("CALL seasonal_burst(events => 'events')").toPandas(),
        seasonal_burst_detection(ev).toPandas())
    assert_frames_match(
        eng.sql("CALL dedup_impact(docs => 'documents')").toPandas(),
        dedup_impact_by_source(docs).toPandas())
