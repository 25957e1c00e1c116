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


def char_ngram_set(col, n: int = 3):
    """Distinct character n-gram (shingle) set of a lowercased string —
    a pure Column expression (transform over sequence, Column.substr
    with Column offsets; JVM-side, no UDF). The exact-Jaccard building
    block; the MinHash pipeline in operators/similarity.py approximates
    the same set semantics at corpus scale."""
    lowered = F.lower(col)
    # Texts shorter than n chars have NO n-grams. Without the guard,
    # sequence(1, 0) yields a DESCENDING [1, 0] (Spark semantics), which
    # would fabricate a non-empty shingle set for short/empty docs —
    # DuckDB's generate_series(1, 0) yields [] and disagrees.
    return F.when(
        F.length(lowered) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(lowered) - (n - 1)),
                lambda i: lowered.substr(i, F.lit(n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def q63_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT character-3-gram Jaccard near-dup pairs for sampled source
    docs (doc_id % 100 = 0) against the whole corpus — the verification
    half of the MinHash-LSH dedup family, oracled against DuckDB's
    list_intersect/list_union arithmetic.

    Scale: the shingle sets build map-side (one transform per doc, no
    shuffle); the bounded sample side (1% of docs) broadcasts under the
    measured gate, and the corpus side is widened to core width first —
    the per-pair array intersect is the compute-bound stage (measured
    sf0.1: 12.0 s at the load-time 8 partitions on 32 cores → 1.4 s
    widened + 1%-sampled), mirroring q24's probe widening. Jaccard is
    a ratio of integer cardinalities — bit-identical across engines —
    so the threshold filter selects the identical pair set. At 100 TB
    you band first (similarity.near_dup_pairs) and run THIS arithmetic
    only inside candidate buckets; the operator is that verify step as
    a standalone oracled query.

    sf1 verification cost, measured r11: 180 s Spark + 160 s DuckDB —
    the 1.43M true ≥0.6 pairs of the pathologically self-similar
    synthetic corpus make the RESULT the work on both engines (not
    the Arrow fetch, as r10 guessed). The default two-scale sweep
    therefore verifies this entry at sf0.1 (full frame compare) and
    folds it engine-side at sf1 under ``--full``
    (tools/verify_all.FOLD_AT_SF1).
    """
    from puregraphdb_spark.sources.registry import broadcast_if_small, table_bytes

    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", char_ngram_set(F.col("text")).alias("sh"))
    a = (
        sh.filter(F.col("doc_id") % 100 == 0)
        .select(F.col("doc_id").alias("src"), F.col("sh").alias("sh_a"),
                F.size("sh").alias("na"))
    )
    b = sh.select(F.col("doc_id").alias("dst"), F.col("sh").alias("sh_b"),
                  F.size("sh").alias("nb"))
    if table_bytes(spark, sf_dir, "documents") < (2 << 30):
        # compute-bound probe: inherit-width would idle most cores
        b = b.repartition(spark.sparkContext.defaultParallelism)
    # |A∪B| = |A| + |B| − |A∩B| for the (already-distinct) shingle
    # sets — the union ARRAY is never materialized, halving the
    # per-pair array work (array_union allocates + dedups a combined
    # array as expensive as the intersect itself).
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    # Sound size prefilter: J(A,B) ≥ 0.6 ⟹ |A∩B| ≥ 0.6·|A∪B| ⟹
    # min(|A|,|B|) ≥ 0.6·max(|A|,|B|), checked as 5·min ≥ 3·max in
    # EXACT integer arithmetic (no float boundary). The two set sizes
    # are computed once per doc BELOW the join, so each candidate pair
    # pays one integer compare before the array intersect — the
    # standard length filter of similarity-join literature. Semantics
    # unchanged: every pair at or above the threshold survives.
    prefilter = (
        F.least("na", "nb") * 5 >= F.greatest("na", "nb") * 3
    )
    return final_sort(
        b.join(broadcast_if_small(a, spark, sf_dir, "documents"),
               F.col("dst") != F.col("src"))
        .filter(prefilter)
        # STAGE the intersect behind a Generate BARRIER (r14). A plain
        # `inter.alias("__i")` project is NOT enough: predicate
        # pushdown substitutes the alias back into the `__i > 0` and
        # `jac >= 0.6` filters and then folds BOTH into the
        # BroadcastNestedLoopJoin CONDITION — the r13 plan evaluated
        # array_intersect THREE times per candidate pair, and ahead of
        # the cheap length prefilter in the conjunction (every one of
        # the |A|×|B| pairs paid the intersect, not just prefilter
        # survivors). explode(array(i)) is semantically the identity,
        # but the downstream filters reference the GENERATED column,
        # which cannot be pushed through a Generate — so the join
        # condition keeps only (dst != src AND prefilter) and the
        # intersect runs ONCE per surviving pair, in the codegen'd
        # Generate stage. Measured sf0.1 (interleaved best-of-5, noop
        # sink, loaded host): 10.56 → 6.37 s — plan diff: join
        # condition 3×array_intersect → none.
        .select("src", "dst", "na", "nb",
                F.explode(F.array(inter)).alias("__i"))
        # Positivity guard (ADVICE r13): two sub-3-char docs have
        # empty shingle sets, so na=nb=__i=0 and the division is 0/0
        # — DIVIDE_BY_ZERO under ANSI mode, NaN otherwise (and NaN
        # compares GREATER than any double in Spark, silently passing
        # the threshold). A pair with zero intersection can never
        # reach the 0.6 floor, so the guard is also what makes this
        # pair relation semantically identical to the inverted-index
        # oracle, which only ever forms pairs sharing a token.
        .filter(F.col("__i") > 0)
        .select(
            "src", "dst",
            (F.col("__i").cast("double")
             / (F.col("na") + F.col("nb") - F.col("__i"))
             .cast("double")).alias("jac_raw"),
        )
        .filter(F.col("jac_raw") >= 0.6)
        .select(
            "src", "dst",
            decimal_round(F.col("jac_raw"), 6, grid=10).alias("jac"),
        ),
        spark, sf_dir, "documents", "src", "dst",
    )


def q172_dedup_threshold_curve(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Reference-corpus dedup threshold curve — the knob-tuning query
    run BEFORE committing a near-dup threshold: incoming docs are
    compared against a reference set (here the doc_id % 100 sample,
    the q63 grain) by exact char-3-gram Jaccard, and for each
    candidate threshold the curve reports how many pairs fire and how
    many non-reference docs would be removed. Pick the knee, then run
    the dedup once at the chosen threshold (q63 / the MinHash band
    path are the execution half; this is the calibration half —
    the dedup sibling of q163's quality-selection curve).

    Exactness: Jaccard is one division of exact integer cardinalities
    (identical doubles both engines); thresholds are shared literals;
    counts are bigints; removal is pure integer id logic (a non-
    reference doc with ANY pair ≥ t is removed — the keep-reference
    rule, no transitive closure needed).

    Scale: the q63 posture verbatim (map-side shingle sets, bounded
    reference side broadcast under the measured gate, probe widened
    to core width, EXACT integer length prefilter 2·min ≥ max sound
    for the 0.5 grid floor, intersect staged once); the curve then
    costs one grid explode over the BOUNDED pair relation (pairs
    survive a 0.5 floor — orders of magnitude smaller than the
    candidate stream) + one 5-group aggregate.
    """
    from puregraphdb_spark.sources.registry import (
        broadcast_if_small, table_bytes,
    )

    d = load_table(spark, sf_dir, "documents")
    n_new = d.filter(F.col("doc_id") % 100 != 0).agg(
        F.count("*").alias("n_new"))
    sh = d.select("doc_id", char_ngram_set(F.col("text")).alias("sh"))
    a = (
        sh.filter(F.col("doc_id") % 100 == 0)
        .select(F.col("doc_id").alias("src"),
                F.col("sh").alias("sh_a"), F.size("sh").alias("na"))
    )
    b = (
        sh.filter(F.col("doc_id") % 100 != 0)
        .select(F.col("doc_id").alias("dst"),
                F.col("sh").alias("sh_b"), F.size("sh").alias("nb"))
    )
    if table_bytes(spark, sf_dir, "documents") < (2 << 30):
        b = b.repartition(spark.sparkContext.defaultParallelism)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    prefilter = F.least("na", "nb") * 2 >= F.greatest("na", "nb")
    # dst != src is vacuously true (disjoint % classes) but keeps the
    # q63 join shape: BroadcastNestedLoopJoin under the gate, never a
    # bare CartesianProduct (the full-surface guard forbids those)
    pairs = (
        b.join(broadcast_if_small(a, spark, sf_dir, "documents"),
               F.col("dst") != F.col("src"))
        .filter(prefilter)
        # Generate barrier, same rationale as q63 (r14): without it
        # predicate pushdown folds the `__i > 0` and `jac >= 0.5`
        # filters into the nested-loop join condition and the
        # intersect runs three times per candidate pair.
        .select("src", "dst", "na", "nb",
                F.explode(F.array(inter)).alias("__i"))
        # Positivity guard (ADVICE r13, same shape as q63): empty
        # shingle sets give 0/0 — ANSI crash or NaN-passes-threshold.
        # Zero-intersection pairs can never reach the 0.5 floor.
        .filter(F.col("__i") > 0)
        .select(
            "src", "dst",
            (F.col("__i").cast("double")
             / (F.col("na") + F.col("nb") - F.col("__i"))
             .cast("double")).alias("jac"),
        )
        .filter(F.col("jac") >= 0.5)
    )
    grid = F.array(*[F.lit(t) for t in (0.5, 0.6, 0.7, 0.8, 0.9)])
    curve = (
        pairs.select("src", "dst", "jac",
                     F.explode(grid).alias("threshold"))
        .filter(F.col("jac") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.countDistinct("dst").cast("long").alias("n_docs_removed"),
        )
        .crossJoin(F.broadcast(n_new))
        .select(
            "threshold", "n_pairs", "n_docs_removed",
            decimal_round(
                F.col("n_docs_removed").cast("double")
                / F.col("n_new").cast("double"), 6, grid=10,
            ).alias("removal_ratio"),
        )
    )
    return final_sort(curve, spark, sf_dir, "documents", "threshold")


def q64_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization profile per language: alpha runs,
    digit runs, and single punctuation marks as separate tokens
    (regexp_extract_all — JVM-side codegen in Spark, RE2 in DuckDB;
    the pattern uses only character classes so both dialects agree).

    Scale: 1 shuffle on lang (5 groups) after a map-side tokenize+count
    — the token arrays never cross the exchange, only the per-doc
    counts do.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(
        F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
    )
    per_doc = d.select(
        "lang",
        F.size(toks).cast("long").alias("n_toks"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
    )
    return final_sort(
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("tot_tokens"),
            decimal_round(F.avg("n_toks"), 4, grid=8).alias("avg_tokens"),
            decimal_round(
                F.avg(F.col("n_uniq").cast("double")
                      / F.col("n_toks").cast("double")), 6, grid=10,
            ).alias("avg_uniq_ratio"),
        ),
        spark, sf_dir, "documents", "lang",
    )


def q66_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination report: corpus docs sharing word 5-grams
    with a simulated benchmark (1%-sampled docs' excerpts, chars
    10-209) — operators/text.contamination_report as an oracled query.

    Each sampled doc is contaminated by its own excerpt (ratio < 1:
    the excerpt covers only part of the doc), plus any cross-doc
    verbatim overlap. Scale: the bounded benchmark side explodes to a
    distinct gram table under the measured broadcast gate; corpus
    grams build and filter map-side; only matches shuffle (per-doc
    agg). Ratio is an integer-cardinality quotient → decimal snap is
    engine-stable.
    """
    from puregraphdb_spark.operators.text import contamination_report
    from puregraphdb_spark.sources.registry import table_bytes

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0).select(
        "doc_id", F.substring("text", 10, 200).alias("text")
    )
    bounded = table_bytes(spark, sf_dir, "documents") < (2 << 30)
    rep = contamination_report(d, bench, n=5,
                               broadcast_benchmark=bounded)
    return final_sort(
        rep.select(
            "corpus_id", "n_ngrams", "n_matched", "n_bench_docs",
            decimal_round(
                F.col("n_matched").cast("double")
                / F.col("n_ngrams").cast("double"), 6, grid=10,
            ).alias("contam_ratio"),
        ),
        spark, sf_dir, "documents", "corpus_id",
    )


def q148_benchmark_attribution(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Per (source, benchmark) contamination attribution over THREE
    simulated benchmarks (residue-class excerpts at distinct offsets,
    the q66 synthesis extended) — see ``text.benchmark_attribution``.

    r12 lineage-dedup: the three benchmarks build in ONE corpus scan
    (a per-row array of matching (bench, excerpt) structs, exploded
    map-side) instead of three filtered scans unioned — which,
    consumed twice inside benchmark_attribution (gram explode + grid
    axis), cost SIX corpus re-reads; the grid axis is now the static
    label list. Scans: benches 1 + corpus grams 1 + totals 1.
    """
    from puregraphdb_spark.operators.text import benchmark_attribution
    from puregraphdb_spark.sources.registry import table_bytes

    d = load_table(spark, sf_dir, "documents")
    specs = [("bench_a", 97, 10), ("bench_b", 89, 30),
             ("bench_c", 83, 50)]
    per_row = F.filter(
        F.array(*[
            F.when(
                F.col("doc_id") % mod == 0,
                F.struct(F.lit(label).alias("bench"),
                         F.substring("text", off, 200).alias("text")),
            )
            for label, mod, off in specs
        ]),
        lambda x: x.isNotNull(),
    )
    benches = d.select(F.explode(per_row).alias("b")).select(
        "b.bench", "b.text")
    bounded = table_bytes(spark, sf_dir, "documents") < (2 << 30)
    rep = benchmark_attribution(d, benches, n=5,
                                broadcast_benchmark=bounded,
                                labels=[s[0] for s in specs])
    return final_sort(rep, spark, sf_dir, "documents", "source", "bench")


def q102_boilerplate_shingles(spark, sf_dir: str):
    """Cross-document boilerplate detector: per language, how many
    distinct 4-token shingles exist and how many appear in MORE THAN
    ONE document — the corpus-level repetition measure that sizes a
    boilerplate-removal pass (q63 scores pairwise similarity; q81
    screens INTRA-doc repetition; this is the cross-doc share). Exact
    integer counts; the shared ratio is one snapped division.

    Scale: shingling is a map-side explode (sequence + slice in
    codegen); ONE shuffle on (lang, shingle) with distinct-doc
    aggregation; the per-lang rollup is tiny.
    """
    from puregraphdb_spark.functions.numeric import decimal_round
    from puregraphdb_spark.sources.registry import final_sort, load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("toks"))
    d = d.filter(F.size("toks") >= 4)
    sh = d.select(
        "doc_id", "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 3),
                lambda i: F.concat_ws(" ", F.slice("toks", i, 4)),
            )
        ).alias("sh"),
    )
    per_sh = sh.groupBy("lang", "sh").agg(
        F.countDistinct("doc_id").alias("nd"))
    return final_sort(
        per_sh.groupBy("lang").agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long").alias("n_shared"),
            decimal_round(
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("double") / F.count("*").cast("double"),
                6, grid=10,
            ).alias("shared_ratio"),
        ),
        spark, sf_dir, "documents", "lang",
    )


def cross_source_shingles(docs: DataFrame, source_col: str = "source",
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          n: int = 4) -> DataFrame:
    """Cross-SOURCE contamination matrix: for every pair of corpus
    sources, how many distinct n-token shingles they share and the
    Jaccard overlap of their shingle vocabularies — the
    source-provenance twin of q102 (which measures cross-DOC sharing
    within a language) and the planning input for source-level dedup
    ordering. Exact integer counts; Jaccard is one snapped division.

    Scale (r11 rewrite): shingling is a map-side explode; ONE shuffle
    folds each shingle's SOURCE SET (bounded by |sources|, so no skew
    risk and no payload blow-up — a Zipf-head shingle is one short
    array row); the pair counts then come from a map-side
    combinations explode of those tiny arrays — the round-9 plan's
    shingle-keyed SELF-JOIN (which re-exchanged the whole distinct
    vocabulary by shingle on both sides) is gone. Per-source vocab
    sizes ride the same per-shingle relation. Output stays at most
    |sources|² rows.
    """
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.split(F.col(text_col), " ").alias("toks"),
    ).filter(F.size("toks") >= n)
    sh = toks.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
            )
        ).alias("sh"),
    )
    per_sh = sh.groupBy("sh").agg(
        F.sort_array(F.collect_set("source")).alias("srcs"))
    vocab = (
        per_sh.select(F.explode("srcs").alias("source"))
        .groupBy("source").agg(F.count("*").cast("long").alias("n_sh"))
    )
    pair_arr = F.flatten(F.transform(
        "srcs",
        lambda a: F.transform(
            F.filter("srcs", lambda b: b > a),
            lambda b: F.struct(a.alias("src_a"), b.alias("src_b")),
        ),
    ))
    overlap = (
        per_sh.select(F.explode(pair_arr).alias("p"))
        .select("p.src_a", "p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    va = vocab.select(F.col("source").alias("src_a"),
                      F.col("n_sh").alias("n_a"))
    vb = vocab.select(F.col("source").alias("src_b"),
                      F.col("n_sh").alias("n_b"))
    return (
        overlap.join(F.broadcast(va), "src_a")
        .join(F.broadcast(vb), "src_b")
        .select(
            "src_a", "src_b", "n_a", "n_b", "n_shared",
            decimal_round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b")
                   - F.col("n_shared")).cast("double"),
                6, grid=10,
            ).alias("jaccard"),
        )
    )


def q134_cross_source_shingles(spark, sf_dir: str):
    """Source-pair shingle contamination matrix (see
    ``cross_source_shingles``)."""
    d = load_table(spark, sf_dir, "documents").select("source", "text")
    return final_sort(cross_source_shingles(d), spark, sf_dir,
                      "documents", "src_a", "src_b")


def bm25_topk(docs: DataFrame, query_tokens: list[str],
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75,
              k: int = 20) -> DataFrame:
    """BM25-class retrieval scoring (rational-idf variant, the q70
    discipline): rank documents against a fixed token query — the
    retrieval-eval primitive a training-data pipeline runs to mine
    hard negatives, sanity-check an index, or dedup a corpus against
    eval queries. Robertson/Sparck-Jones BM25 with the log dropped
    from the idf: idf_t = (N - df_t + 0.5)/(df_t + 0.5) — exact
    rational arithmetic over exact integer corpus statistics, so the
    score is a sum of quotients of identical doubles on both engines
    (ln would pull in libm rounding differences; the monotone shape
    per term is preserved, cross-term weighting is more aggressive
    than log-BM25 — documented, deliberate).

    score(d) = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    summed in the fixed query-token order (engine-identical fp).

    Scale: per-doc tf/dl are map-side array ops (one filter per query
    token over ONE staged token array — the r9 staged-projection
    rule); N/avgdl/df fold to a 1-row global aggregate broadcast back
    (the scalar-parameter pattern); top-k is TakeOrderedAndProject.
    Query length is the plan width — fine for the 10²-token queries
    retrieval eval uses; an inverted-index join is the path for
    query SETS (compose q70's grain).
    """
    toks = F.filter(F.split(F.lower(text_col), " "),
                    lambda t: t != "")

    def tf_of(tok):
        # one-arg lambda per token (a default-arg lambda would be
        # 2-arity and PySpark would pass the element INDEX into it)
        return F.size(F.filter("__toks", lambda t: t == F.lit(tok)))

    per_doc = docs.select(
        F.col(id_col), toks.alias("__toks"),
    ).select(
        id_col,
        F.size("__toks").cast("long").alias("dl"),
        *[
            tf_of(tok).cast("long").alias(f"tf{i}")
            for i, tok in enumerate(query_tokens)
        ],
    )
    stats = per_doc.agg(
        F.count("*").cast("long").alias("n_corpus"),
        F.sum("dl").cast("long").alias("total_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(query_tokens))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    avgdl = (F.col("total_dl").cast("double")
             / F.col("n_corpus").cast("double"))
    score = None
    for i in range(len(query_tokens)):
        tf = F.col(f"tf{i}").cast("double")
        idf = ((F.col("n_corpus") - F.col(f"df{i}")).cast("double")
               + F.lit(0.5)) / (F.col(f"df{i}").cast("double")
                                + F.lit(0.5))
        den = tf + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                                + F.lit(b) * F.col("dl").cast("double")
                                / avgdl)
        term = idf * (tf * F.lit(k1 + 1.0)) / den
        score = term if score is None else score + term
    ranked = scored.select(
        id_col, "dl",
        *[f"tf{i}" for i in range(len(query_tokens))],
        decimal_round(score, 6, grid=10).alias("score"),
    )
    return (
        ranked.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), F.col(id_col))
            ).cast("long").alias("rank"),
            id_col, "dl",
            *[F.col(f"tf{i}").alias(f"tf_{i}")
              for i in range(len(query_tokens))],
            "score",
        )
    )


def q154_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (rational-idf) top-20 for a fixed 3-token query over the
    fixture vocabulary (see ``bm25_topk``)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(d, ["spark", "join", "fast"], k=20)
