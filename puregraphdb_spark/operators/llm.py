"""LLM-data-pipeline operators: dedup, text analysis, similarity search
(SURVEY.md §2 q26–q30, §7.3 scale paths).

These are the training-data-pipeline primitives the engine adds beyond
the reference's graph surface (BASELINE.json driver brief). Everything
is pure DataFrame/Column expressions — zero Python UDFs:

- exact-key dedup (q26) — groupBy + having; the trivially-correct path.
- term frequencies (q27) / corpus stats (q28) — explode/split, all
  JVM-side with whole-stage codegen.
- cosine KNN (q29, q30) — higher-order-function dot products
  (functions.vector), broadcast of the tiny query side.

Scale posture per query in the docstrings. The *scale* variants of
dedup (MinHash-LSH) and similarity (random-hyperplane LSH) live in
operators/similarity.py — at 100 TB you never run an O(n²) pair join;
here q29/q30 bound the query side (1 and 20 vectors), so the "naive"
join is actually a broadcast map-side scan, which is the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from puregraphdb_spark.functions.numeric import decimal_round
from puregraphdb_spark.functions.vector import cosine_from_norms, l2_norm
from puregraphdb_spark.sources.registry import final_sort, load_table


def q26_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-key near-dup candidate groups by (lang, n_chars); keeper is
    the smallest doc_id.

    Scale: 1 shuffle on the group key with map-side partial agg; the
    HAVING filter runs post-agg on the already-tiny grouped set. At
    100 TB the same shape runs with a content-hash key (e.g.
    xxhash64(text)) — see similarity.minhash_signatures for the
    near-dup path.
    """
    d = load_table(spark, sf_dir, "documents")
    return final_sort(
        d.groupBy("lang", "n_chars")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_dupes"),
        )
        .filter(F.col("n_dupes") > 1),
        spark, sf_dir, "documents", "lang", "n_chars",
    )


def q27_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 term frequencies over the corpus.

    Scale: explode is a flatMap (no shuffle); 1 shuffle for the token
    groupBy with map-side combine doing most of the reduction (token
    frequency follows Zipf — partial agg collapses the head); top-k via
    TakeOrderedAndProject, no global sort.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.desc("tf"), "tok")
        .limit(20)
    )


def q28_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc count, avg chars, avg whitespace tokens.

    token count = size(split(text, ' ')) — same element count as the
    oracle's len(string_split(..)) including empties. 1 shuffle on lang.
    """
    d = load_table(spark, sf_dir, "documents")
    return final_sort(
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            decimal_round(F.avg("n_chars"), 2, grid=6).alias("avg_chars"),
            decimal_round(
                F.avg(F.size(F.split("text", " "))), 2, grid=6
            ).alias("avg_tokens"),
        ),
        spark, sf_dir, "documents", "lang",
    )


def q29_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors of vec_id 0 (brute-force baseline).

    Scale: the query side is 1 row → broadcast; the "join" is a
    map-side scan of the corpus computing one JVM-side HOF dot product
    per row, then TakeOrderedAndProject top-k. No shuffle of the corpus.
    For many-query / billion-vector workloads use
    similarity.ann_cosine_topk (hyperplane-LSH bucketed candidates) or
    similarity.ivf_cosine_topk (cluster-probed), not this.
    """
    e = load_table(spark, sf_dir, "embeddings")
    # norms materialized per side (once per row, not per pair) — same
    # doubles, same factoring as cosine_similarity, so oracle-identical.
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"),
        l2_norm("embedding").alias("q_nrm"),
    )
    c = e.select("vec_id", "embedding", l2_norm("embedding").alias("nrm"))
    return (
        c.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "vec_id",
            F.round(
                cosine_from_norms(F.col("q_emb"), F.col("embedding"),
                                  F.col("q_nrm"), F.col("nrm")), 4
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


def q30_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN label votes for each query vector (vec_id < 20).

    Scale: 20 query rows broadcast → corpus-side map scan computes all
    20×n similarities without shuffling the corpus; one shuffle for the
    per-query row_number window (partitioned by src), one for the vote
    groupBy. The unrounded similarity orders the window (both engines
    order on exact doubles), rounding only affects emitted values — here
    none are emitted.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("src"),
        F.col("label").alias("src_label"),
        F.col("embedding").alias("q_emb"),
        l2_norm("embedding").alias("q_nrm"),
    )
    c = e.select("vec_id", "label", "embedding",
                 l2_norm("embedding").alias("nrm"))
    w = Window.partitionBy("src").orderBy(F.desc("cs"), "vec_id")
    sims = (
        c.join(F.broadcast(q), F.col("vec_id") != F.col("src"))
        .select(
            "src",
            "src_label",
            F.col("label").alias("nbr_label"),
            cosine_from_norms(F.col("q_emb"), F.col("embedding"),
                              F.col("q_nrm"), F.col("nrm")).alias("cs"),
            "vec_id",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )
    return final_sort(
        sims.groupBy("src", "src_label", "nbr_label")
        .agg(F.count("*").alias("votes")),
        spark, sf_dir, "embeddings", "src", F.desc("votes"), "nbr_label",
    )
