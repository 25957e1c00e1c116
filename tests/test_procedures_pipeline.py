"""CALL-door parity for the training-pipeline operators (round-5
generic cores): chunk_documents, hash_split, stratified_sample,
content_hash_dedup, zscore_outliers, simhash_topk must be reachable
from EP2 and produce exactly what the Python surface does — and the
oracled qNN entries must be pure bindings of those same cores.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from puregraphdb_spark.engine import Engine
from puregraphdb_spark.sources.registry import load_table
from tests.conftest import SF_DIR, assert_frames_match


def _engine(spark) -> Engine:
    return Engine(spark, SF_DIR)  # registers fixture views


def test_call_chunk_documents_matches_python(spark):
    from puregraphdb_spark.operators.pipeline import chunk_documents

    eng = _engine(spark)
    via_call = eng.sql(
        "CALL chunk_documents(docs => 'documents', size => 16, "
        "stride => 8)"
    ).toPandas()
    direct = chunk_documents(
        load_table(spark, SF_DIR, "documents"), size=16, stride=8
    ).toPandas()
    assert_frames_match(via_call, direct)
    assert len(direct) > 0
    # chunks cover the doc: max start + chunk length reaches the end
    assert (direct["n_tokens"] >= 1).all()


def test_call_hash_split_is_deterministic_partition(spark):
    eng = _engine(spark)
    out = eng.sql(
        "CALL hash_split(table => 'documents', id_col => 'doc_id', "
        "train_pct => 70, val_pct => 20)"
    )
    counts = dict(
        out.groupBy("split").count().collect()
        and [(r["split"], r["count"]) for r in
             out.groupBy("split").count().collect()]
    )
    n = sum(counts.values())
    assert set(counts) <= {"train", "val", "test"}
    assert n == load_table(spark, SF_DIR, "documents").count()
    # same assignment on re-run (pure arithmetic, no RNG)
    again = eng.sql(
        "CALL hash_split(table => 'documents', id_col => 'doc_id', "
        "train_pct => 70, val_pct => 20)"
    )
    assert (
        out.select("doc_id", "split").exceptAll(
            again.select("doc_id", "split")).count() == 0
    )


def test_call_stratified_sample_rates(spark):
    eng = _engine(spark)
    sampled = eng.sql(
        "CALL stratified_sample(table => 'documents', "
        "strata_col => 'lang', rates => 'en:0.0', "
        "default_rate => 1.0)"
    )
    # en entirely dropped, every other stratum fully kept
    assert sampled.filter(F.col("lang") == "en").count() == 0
    d = load_table(spark, SF_DIR, "documents")
    assert (
        sampled.count()
        == d.filter(F.col("lang") != "en").count()
    )


def test_call_content_hash_dedup_matches_q77(spark):
    import __spark_entry__ as em

    eng = _engine(spark)
    via_call = eng.sql(
        "CALL content_hash_dedup(docs => 'documents')"
    ).toPandas()
    q77 = em.queries()["q77_content_hash_dedup"](spark, SF_DIR).toPandas()
    assert_frames_match(via_call, q77)


def test_call_zscore_outliers_matches_python(spark):
    from puregraphdb_spark.operators.pipeline import zscore_outliers

    eng = _engine(spark)
    via_call = eng.sql(
        "CALL zscore_outliers(table => 'events', "
        "partition_cols => 'event_type', val_col => 'value', "
        "id_cols => 'event_id', threshold => 2.5)"
    ).toPandas()
    direct = zscore_outliers(
        load_table(spark, SF_DIR, "events"), ["event_type"], "value",
        ["event_id"], threshold=2.5,
    ).toPandas()
    assert_frames_match(via_call, direct)


def test_call_simhash_topk_matches_q67(spark):
    import __spark_entry__ as em

    eng = _engine(spark)
    spark.table("embeddings").filter(
        F.col("vec_id") < 10
    ).createOrReplaceTempView("sh_queries")
    via_call = eng.sql(
        "CALL simhash_topk(queries => 'sh_queries', "
        "corpus => 'embeddings', k => 5)"
    ).toPandas()
    q67 = em.queries()["q67_simhash_hamming"](spark, SF_DIR).toPandas()
    assert_frames_match(via_call, q67)


def test_call_funnel_matches_q87(spark):
    import __spark_entry__ as em

    eng = _engine(spark)
    via_call = (
        eng.sql(
            "CALL funnel(events => 'events', "
            "stages => 'view,click,purchase')"
        )
        .groupBy("stage_index", "stage")
        .count()
        .withColumnRenamed("count", "n_users")
        .toPandas()
    )
    q87 = em.queries()["q87_funnel"](spark, SF_DIR).toPandas()
    assert_frames_match(via_call, q87)


def test_call_reach_and_harmonic(spark):
    from puregraphdb_spark.operators.graph import Graph

    eng = _engine(spark)
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    e.createOrReplaceTempView("reach_edges")
    r = eng.sql("CALL reach(edges => 'reach_edges', max_hops => 2)")
    assert {(x["src"], x["dst"]) for x in r.collect()} == {
        (1, 2), (2, 3), (3, 4), (1, 3), (2, 4)}
    h = eng.sql(
        "CALL harmonic_centrality(edges => 'reach_edges', "
        "landmarks => '4')")
    got = {x["id"]: round(x["harmonic"], 6) for x in h.collect()}
    assert got == {1: round(1 / 3, 6), 2: 0.5, 3: 1.0}


def test_call_weighted_median_matches_q122(spark):
    import __spark_entry__ as em

    eng = _engine(spark)
    via_call = eng.sql(
        "CALL weighted_median(table => 'lineitem', "
        "value_col => 'l_extendedprice', weight_col => 'l_quantity', "
        "group_cols => 'l_returnflag')"
    ).toPandas()
    direct = em.queries()["q122_weighted_median"](spark, SF_DIR).toPandas()
    got = dict(zip(via_call["l_returnflag"], via_call["w_median"]))
    want = dict(zip(direct["l_returnflag"], direct["w_median"]))
    assert got == want


def test_call_interval_union_matches_q123(spark):
    import __spark_entry__ as em

    eng = _engine(spark)
    via_call = eng.sql(
        "CALL interval_union(events => 'events', duration_s => 300)"
    ).toPandas().sort_values("user_id").reset_index(drop=True)
    direct = em.queries()["q123_interval_union"](spark, SF_DIR).toPandas()
    assert_frames_match(via_call, direct)


def test_call_conversion_latency_matches_q124(spark):
    import __spark_entry__ as em

    eng = _engine(spark)
    via_call = eng.sql(
        "CALL conversion_latency(events => 'events')"
    ).toPandas().sort_values("hours_bucket").reset_index(drop=True)
    direct = em.queries()["q124_time_to_convert"](spark, SF_DIR).toPandas()
    assert_frames_match(via_call, direct)


def test_call_sorted_neighborhood_matches_q125(spark):
    import __spark_entry__ as em

    eng = _engine(spark)
    via_call = eng.sql(
        "CALL sorted_neighborhood(table => 'part', key_col => 'p_name', "
        "id_col => 'p_partkey', window => 3, max_dist => 8)"
    ).toPandas().sort_values(["id1", "id2"]).reset_index(drop=True)
    direct = em.queries()["q125_sorted_neighborhood"](spark, SF_DIR).toPandas()
    assert_frames_match(via_call, direct)


def test_call_token_diversity_matches_q126(spark):
    import __spark_entry__ as em

    eng = _engine(spark)
    via_call = eng.sql(
        "CALL token_diversity(docs => 'documents')"
    ).toPandas().sort_values("source").reset_index(drop=True)
    direct = em.queries()["q126_token_diversity"](spark, SF_DIR).toPandas()
    assert_frames_match(via_call, direct)


def test_call_heavy_hitters_matches_entry(spark):
    import __spark_entry__ as em

    eng = _engine(spark)
    # documents isn't pre-tokenized, so CALL over a token view
    from puregraphdb_spark.operators.pipeline import _nonempty_tokens

    load_table(spark, SF_DIR, "documents").select(
        F.explode(_nonempty_tokens()).alias("tok")
    ).createOrReplaceTempView("doc_tokens")
    via_call = eng.sql(
        "CALL heavy_hitters(table => 'doc_tokens', col => 'tok', "
        "k => 20, capacity => 64)"
    ).toPandas()
    direct = em.queries()["heavy_hitter_tokens"](spark, SF_DIR).toPandas()
    assert list(via_call["value"]) == list(direct["value"])


def test_call_gini_hhi_bounce_and_forward_asof(spark):
    import __spark_entry__ as em

    eng = _engine(spark)
    g = eng.sql("CALL gini(table => 'orders')").toPandas()
    dg = em.queries()["q128_gini_concentration"](spark, SF_DIR).toPandas()
    assert_frames_match(g, dg)

    h = eng.sql(
        "CALL bounce_rate(events => 'events')"
    ).toPandas().sort_values("day").reset_index(drop=True)
    dh = em.queries()["q130_bounce_rate"](spark, SF_DIR).toPandas()
    assert_frames_match(h, dh)

    # forward direction reaches through the existing as_of_join door
    fwd = eng.sql(
        "CALL as_of_join(left => 'events', right => 'events', "
        "on => 'user_id', left_ts => 'ts', right_ts => 'ts', "
        "right_cols => 'event_id', prefix => 'n_', "
        "direction => 'forward')"
    )
    assert fwd.count() > 0
