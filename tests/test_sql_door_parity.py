"""EP1 ≡ EP2 self-consistency (SURVEY §5): every oracle SQL statement
whose dialect Spark shares runs verbatim through the SQL door and must
produce the same result as the DataFrame implementation.

Statements using DuckDB-only constructs (time_bucket, string_split /
unnest, list_cosine_similarity, json_extract_string, ASOF JOIN,
varchar casts) are skipped by name — the point is that everything else
IS plain ANSI both engines share.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from puregraphdb_spark.engine import Engine
from tests.conftest import SF_DIR, assert_frames_match

DUCKDB_ONLY = {
    "q20_tumbling_window",   # time_bucket
    "q22_json_extract",      # json_extract_string
    "q27_text_tokens",       # unnest/string_split
    "q28_text_stats",        # len(string_split(...))
    "q29_knn_cosine",        # list_cosine_similarity
    "q30_knn_label",         # list_cosine_similarity
    "q31_asof_join",         # ASOF JOIN
    "q35_string_date",       # cast(.. as varchar)
    "q37_regex",             # regexp_matches
    "q39_array_agg",         # string_agg(.. order by ..) inline order
    "q40_grouping_sets",     # grouping(a, b) two-arg bit field
    "q49_array_ops",         # list_sort/list()/list_intersect/len
    "q50_gap_fill",          # unnest(generate_series(...))
    "q53_array_hof",         # list_max/list_filter/len
    "sliding_window_counts",  # unnest(generate_series(time_bucket ...))
    "hypertable_rollup",     # time_bucket
    "q58_bigrams",           # unnest/generate_subscripts positional join
    "q62_json_typed",        # json_extract_string
    "q63_ngram_jaccard",     # list_transform/list_intersect/len
    "q64_regex_tokens",      # len()/list_distinct over regex lists
    "q66_contamination",     # string_split/list_transform/unnest
    "q67_simhash_hamming",   # list_filter lambda with [i] indexing
    "q68_doc_chunks",        # string_split/list_slice/unnest
    "q70_tfidf",             # unnest/string_split
    "q71_quality_filter",    # list_sum/list_transform/list_filter
    "q72_langid_confusion",  # list_intersect/string_split_regex
    "q74_minhash_vocab",     # unnest/string_split
    "q75_pmi_bigrams",       # struct_pack/list_transform/unnest
    "q76_embed_quantize",    # list_max/list_transform/::DOUBLE[]
    "q77_content_hash_dedup",  # regexp_replace 'g' flag argument
    "q79_vocab_coverage",    # unnest/arg_min/VALUES p(pct)
    "q80_doc_embedding_join",  # list_inner_product/list_filter
    "q81_repetition_filter",   # nested list lambdas/[] literal
    "q82_cosine_pairs",      # list_cosine_similarity
    "q84_winnow_fingerprint",  # list_transform/list_min/[] literal
    "q88_retention",         # date_diff('day', ...) 3-arg signature
    "q92_sequence_pack",     # list_filter/string_split
    "q93_minhash_bands",     # unnest/string_split
    "q96_embedding_centroids",  # unnest/generate_subscripts
    "q102_boilerplate_shingles",  # string_split/list_slice/unnest
    "q108_reorder_intervals",  # date_diff('day', ...) 3-arg signature
    "q109_cohort_ltv",       # // integer-division operator
    "q123_interval_union",   # epoch_us
    "q124_time_to_convert",  # epoch_us
    "q126_token_diversity",  # unnest/string_split + hugeint
    "q127_asof_forward",     # first_value(.. ignore nulls) dialect
    "q128_gini_concentration",  # // integer-division operator
    "q131_dup_cluster_histogram",  # regexp_replace 'g' flag argument
    "q132_funnel_latency",   # epoch_us + quantile_cont
    "q133_chi_square",       # count(distinct ..) over () window
    "q134_cross_source_shingles",  # string_split/list_slice/unnest
    "q135_anomaly_mad_ts",   # quantile_cont
    "q137_source_mix_budget",  # list_filter/string_split/len
    "q138_seasonal_dow",     # isodow()
    "q141_split_contamination",  # string_split/list_slice/unnest
    "q142_vocab_growth",     # unnest/string_split
    "q143_seasonal_burst",   # isodow()
    "q144_dedup_impact",     # regexp_replace 'g' flag argument
    "q145_substring_dedup",  # string_split/list_slice/unnest
    "q146_pii_scan",         # len(regexp_extract_all(..)) / varchar
    "q147_token_length_profile",  # list_filter/string_split/len
    "q148_benchmark_attribution",  # string_split/list_slice/unnest
    "q149_doc_stitching",    # list_filter/string_split/list_slice
    "q150_embedding_drift",  # generate_subscripts/unnest/::DOUBLE[]
    "q151_hash_semantic_dedup",  # list_cosine_similarity/list(order by)
    "q152_tokenizer_fertility",  # list_filter/string_split/len
    "q153_provenance_dedup",     # regexp_replace 'g' flag argument
    "q154_bm25_topk",            # list_filter/string_split/len
    "q156_dedup_keepers",        # regexp_replace 'g' flag argument
    "q157_shingle_compressibility",  # unnest/generate_series slicing
    "q160_lm_transition_score",  # string_split/list_filter/unnest
    "q162_gopher_rules",  # list_sum/list_transform/regexp_full_match
    "q163_selection_curve",  # string_split/unnest([..]) threshold grid
    "q166_arrival_regularity",  # epoch_us
    "q158_temporal_reach2",  # date_diff('day', ...) 3-arg signature
    "q168_asset_profile",  # encode()/['a','b'][i] list indexing
    "q169_vector_hygiene",  # ::DOUBLE[]/list_inner_product/isinf
    "text_profile",  # list_filter/regexp_split_to_array/list_min
    "text_quality_report",  # same shared profile CTE chain
    "q170_payload_dedup",  # ['a','b'][i] list indexing (q168 family)
    "q171_resource_allocation",  # // integer division
    "q172_dedup_threshold_curve",  # list_*/generate_series/unnest grid
    "q173_embedding_dim_profile",  # range(64) + 1-based list indexing
    "q176_allpairs_jaccard",  # list_*/generate_series shingles
    "q177_negative_sampling",  # unnest([..]) rank grid
    "q179_source_overlap",  # regexp_replace 'g' flag argument
    "q182_langid_kappa",   # list_intersect/string_split_regex CTE
    "q183_mann_whitney",   # unnest([..]) comparison-type grid
    "q184_benford",        # 2-arg regexp_extract default-group
    "q186_ks_statistic",   # unnest([..]) comparison-type grid
}

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()
PARITY = sorted(set(ORACLES) - DUCKDB_ONLY)


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark, SF_DIR)


@pytest.mark.parametrize("name", PARITY)
def test_sql_door_matches_dataframe_door(engine, spark, name):
    ep2 = engine.sql(ORACLES[name]).toPandas()
    ep1 = QUERIES[name](spark, SF_DIR).toPandas()
    assert_frames_match(ep1, ep2)


def test_call_door_pagerank_matches_graph_api(engine, spark):
    # EP2 CALL ≡ EP3: same star graph, procedure vs Graph method
    from puregraphdb_spark.operators.graph import Graph
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [(i, 1) for i in range(2, 7)], ["src", "dst"])
    v = spark.createDataFrame([(i,) for i in range(1, 7)], ["id"])
    e.createOrReplaceTempView("pr_edges")
    v.createOrReplaceTempView("pr_verts")
    ep2 = engine.sql(
        "CALL pagerank(edges => 'pr_edges', vertices => 'pr_verts', "
        "max_iter => 5)"
    ).toPandas()
    ep3 = Graph(v, e).pagerank(max_iter=5).toPandas()
    assert_frames_match(ep3, ep2)


def test_call_door_dedup_and_triangles(engine, spark):
    from tests.conftest import SF_DIR as _sf  # noqa: F401 (docs view exists)

    pairs = engine.sql(
        "CALL near_dup_pairs(docs => 'documents', num_hashes => 32, "
        "bands => 16, jaccard_threshold => 0.9)"
    )
    assert set(pairs.columns) == {"a", "b", "est_jaccard"}
    assert pairs.count() >= 0  # runs end-to-end over the fixture view

    e = spark.createDataFrame(
        [(u, v) for u in range(1, 5) for v in range(u + 1, 5)],
        ["src", "dst"])
    e.createOrReplaceTempView("tri_edges")
    n = engine.sql("CALL triangle_count(edges => 'tri_edges')").collect()
    assert n[0]["n_triangles"] == 4  # K4


def test_call_door_rejects_unknown_and_malformed(engine):
    with pytest.raises(ValueError, match="available"):
        engine.sql("CALL nonsense(x => 1)")
    with pytest.raises(ValueError, match="bad arguments"):
        engine.sql("CALL pagerank(bogus_param => 3)")
    with pytest.raises(ValueError, match="cannot parse"):
        engine.sql("CALL pagerank(edges => unquoted string)")


def test_call_door_louvain_and_modularity(engine, spark):
    """EP2 CALL ≡ Python API for the round-7 community procedures."""
    from pyspark.sql import functions as F

    from puregraphdb_spark.operators.community import louvain, modularity

    rows = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a < b]
    rows += [(a, b) for a in (4, 5, 6) for b in (4, 5, 6) if a < b]
    rows += [(3, 4)]
    e = spark.createDataFrame(rows, ["src", "dst"])
    e.createOrReplaceTempView("cm_edges")
    got = engine.sql(
        "CALL louvain(edges => 'cm_edges', max_sweeps => 6)").toPandas()
    want = louvain(e, max_sweeps=6).toPandas()
    assert_frames_match(want, got)

    a = spark.createDataFrame(
        [(i, 1 if i <= 3 else 4) for i in range(1, 7)],
        ["id", "community"])
    a.createOrReplaceTempView("cm_assign")
    got_q = engine.sql(
        "CALL modularity(edges => 'cm_edges', assignment => 'cm_assign')"
    ).collect()[0]
    want_q = modularity(e, a).collect()[0]
    assert got_q["q"] == want_q["q"] and got_q["m"] == want_q["m"]


def test_call_door_betweenness_sampled(engine, spark):
    from puregraphdb_spark.operators.graph import Graph

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["src", "dst"])
    v = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    e.createOrReplaceTempView("bs_edges")
    v.createOrReplaceTempView("bs_verts")
    got = engine.sql(
        "CALL betweenness_sampled(edges => 'bs_edges', "
        "vertices => 'bs_verts', eps => 0.1, delta => 0.1)").toPandas()
    want = Graph(v, e).betweenness_sampled(eps=0.1, delta=0.1).toPandas()
    assert_frames_match(want, got)


def test_call_door_anf(engine, spark):
    from puregraphdb_spark.operators.graph import Graph

    # symmetrized P4 — known closure at t=3
    pairs = [(1, 2), (2, 3), (3, 4)]
    sym = pairs + [(b, a) for a, b in pairs]
    e = spark.createDataFrame(sym, ["src", "dst"])
    e.createOrReplaceTempView("anf_edges")
    got = engine.sql(
        "CALL anf(edges => 'anf_edges', rel_tol => 0.0, max_iter => 5)"
    ).toPandas()
    v = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], ["id"])
    want_nf = Graph(v, e).anf(m=64, max_iter=5, rel_tol=0.0)
    assert list(got["t"]) == [t for t, _ in want_nf]
    assert list(got["est_pairs"]) == pytest.approx(
        [n for _, n in want_nf])
    assert got["frac_of_final"].iloc[-1] == 1.0


def test_call_door_random_walks(engine, spark):
    from puregraphdb_spark.operators.graph import Graph

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], ["src", "dst"])
    v = spark.createDataFrame([(i,) for i in range(3)], ["id"])
    e.createOrReplaceTempView("rw_edges")
    v.createOrReplaceTempView("rw_verts")
    got = engine.sql(
        "CALL random_walks(edges => 'rw_edges', vertices => 'rw_verts', "
        "walk_length => 4, walks_per_node => 2, seed => 5)").toPandas()
    want = Graph(v, e).random_walks(
        walk_length=4, walks_per_node=2, seed=5).toPandas()
    key = lambda df: sorted(
        (r.start_id, r.walk_no, tuple(r.path)) for r in df.itertuples())
    assert key(got) == key(want)


def test_call_door_ktruss(engine, spark):
    from puregraphdb_spark.operators.graph import Graph

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    e = spark.createDataFrame(k4 + [(4, 9)], ["src", "dst"])
    v = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 9)], ["id"])
    e.createOrReplaceTempView("kt_edges")
    got = engine.sql("CALL ktruss(edges => 'kt_edges', k => 4)").toPandas()
    want = Graph(v, e).ktruss(4).toPandas()
    key = lambda df: sorted(map(tuple, df[["u", "v", "support"]].values))
    assert key(got) == key(want)
    assert key(got) == sorted((a, b, 2) for a, b in k4)


def test_call_door_hits(engine, spark):
    """EP2 CALL ≡ Python API for the HITS procedure."""
    from pyspark.sql import functions as F

    from puregraphdb_spark.operators.graph import Graph

    e = spark.createDataFrame(
        [(1, 20), (2, 20), (3, 20), (3, 21)], ["src", "dst"])
    e.createOrReplaceTempView("hits_edges")
    got = engine.sql(
        "CALL hits(edges => 'hits_edges', max_iter => 6)").toPandas()
    v = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    want = Graph(v, e).hits(max_iter=6).toPandas()
    assert_frames_match(want, got)
