"""Tests for the scale-path LLM-pipeline operators: MinHash/LSH
near-dup detection, SimHash, n-gram Jaccard, hyperplane ANN, text
analysis heuristics.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from puregraphdb_spark.operators import similarity as sim
from puregraphdb_spark.operators import text as txt


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    rows = [
        (1, base),
        (2, base),  # exact duplicate of 1
        (3, base.replace("lazy", "sleepy")),  # near-duplicate of 1
        (4, "completely different words about spark dataframes and shuffles"),
        (5, "der hund ist nicht mit der katze und das ist gut"),
        (6, ""),  # empty doc must not crash anything
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_identical_docs_identical_signatures(corpus):
    sigs = sim.minhash_signatures(corpus, num_hashes=32).collect()
    by_id = {r["id"]: r["sig"] for r in sigs}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[4]
    assert len(by_id[1]) == 32


def test_near_dup_pairs_finds_dup_and_neardup(corpus):
    pairs = sim.near_dup_pairs(
        corpus, num_hashes=32, bands=16, jaccard_threshold=0.3
    ).collect()
    found = {(r["a"], r["b"]): r["est_jaccard"] for r in pairs}
    assert found.get((1, 2)) == 1.0  # exact dup: full signature agreement
    assert (1, 4) not in found and (2, 4) not in found
    near = [p for p in found if 3 in p]
    assert near, "near-duplicate (lazy→sleepy) should share LSH buckets"


def test_dedup_minhash_clusters(corpus):
    res = sim.dedup_minhash(
        corpus, num_hashes=32, bands=16, jaccard_threshold=0.3
    ).collect()
    keep = {r["id"]: r["keep_id"] for r in res}
    # 1,2(,3) form one cluster kept under min id 1; 4/5 are clean
    assert keep[1] == 1 and keep[2] == 1
    assert 4 not in keep and 5 not in keep


def test_simhash_near_dups_close_in_hamming(spark, corpus):
    d = corpus.filter(F.col("doc_id").isin(1, 3, 4)).select(
        "doc_id", sim.simhash("text", bits=32).alias("sh")
    ).collect()
    sh = {r["doc_id"]: r["sh"] for r in d}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sh[1], sh[3]) < ham(sh[1], sh[4])


def test_simhash_default_width_includes_sign_bit(corpus):
    # bits=64 exercises the i=63 sign-bit weight: a Python 2**63
    # literal overflows Long.MAX_VALUE (Py4J error); shiftleft wraps
    # correctly. Exact dups must still collide at the default width.
    d = corpus.select("doc_id", sim.simhash("text").alias("sh")).collect()
    sh = {r["doc_id"]: r["sh"] for r in d}
    assert sh[1] == sh[2]
    assert any(v < 0 for v in sh.values()) or all(
        isinstance(v, int) for v in sh.values()
    )  # sign bit may or may not be set; the point is it computes


def test_near_dup_pairs_rejects_indivisible_band_split(corpus):
    with pytest.raises(ValueError, match="divisible"):
        sim.near_dup_pairs(corpus, num_hashes=30, bands=16)


def test_simhash_near_dup_pairs_equals_bruteforce(spark):
    # Hamming-LSH must return EXACTLY the brute-force pair set:
    # pigeonhole banding guarantees recall, bit_count verify precision.
    rows = [(i, " ".join(
        f"w{(i * 7 + j * 13) % 23}" for j in range(12)
    )) for i in range(24)]
    rows += [(100, rows[0][1]), (101, rows[0][1] + " extra")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in sim.simhash_near_dup_pairs(docs, max_hamming=7).collect()
    }
    sh = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", sim.simhash("text").alias("sh")).collect()}
    ids = sorted(sh)
    brute = {
        (a, b): bin(sh[a] ^ sh[b]).count("1")
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin(sh[a] ^ sh[b]).count("1") <= 7
    }
    assert got == brute
    assert got[(0, 100)] == 0  # exact dup collides at distance 0


def test_simhash_near_dup_rejects_indivisible_blocks(corpus):
    with pytest.raises(ValueError, match="divisible"):
        sim.simhash_near_dup_pairs(corpus, bits=64, max_hamming=4)


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(
        [("a b c d e", "a b c d e"), ("a b c d e", "x y z w q")],
        ["ta", "tb"],
    )
    vals = df.select(sim.ngram_jaccard(F.col("ta"), F.col("tb")).alias("j")).collect()
    assert vals[0]["j"] == 1.0
    assert vals[1]["j"] == 0.0


def test_ann_cosine_topk_recovers_exact_neighbor(spark):
    # corpus of near-orthogonal one-hot vectors + one vector almost equal
    # to the query: ANN must rank the near-twin first.
    dim = 8
    rows = []
    for i in range(dim):
        v = [0.0] * dim
        v[i] = 1.0
        rows.append((i, v))
    twin = [0.0] * dim
    twin[0] = 0.99
    twin[1] = 0.01
    rows.append((100, twin))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = emb.filter(F.col("vec_id") == 0)
    res = sim.ann_cosine_topk(q, emb, k=3, dim=dim, num_planes=4).collect()
    assert res, "bucket join found no candidates"
    best = max(res, key=lambda r: r["cos_sim"])
    assert best["vec_id"] == 100


def test_embedding_near_dup_pairs(spark):
    # 100, 101 are near-identical vectors; others near-orthogonal
    dim = 8
    rows = []
    for i in range(dim):
        v = [0.0] * dim
        v[i] = 1.0
        rows.append((i, v))
    rows.append((100, [1.0, 0.02, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    rows.append((101, [1.0, 0.03, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    from puregraphdb_spark.operators.similarity import embedding_near_dup_pairs

    pairs = {(r["a"], r["b"]): r["cos_sim"]
             for r in embedding_near_dup_pairs(
                 emb, threshold=0.95, dim=dim, num_planes=4).collect()}
    assert (100, 101) in pairs and pairs[(100, 101)] > 0.99
    assert all({a, b} == {100, 101} or (a, b) == (0, 100) or (a, b) == (0, 101)
               for a, b in pairs), f"unexpected high-cos pair: {pairs}"


def test_ivf_topk_recovers_exact_neighbor(spark):
    from puregraphdb_spark.operators.similarity import (
        ivf_cosine_topk, kmeans_centroids,
    )

    dim = 8
    rows = []
    # two tight families around axis 0 and axis 4
    for i in range(20):
        v = [0.0] * dim
        v[0] = 1.0
        v[1] = 0.001 * i
        rows.append((i, v))
    for i in range(20, 40):
        v = [0.0] * dim
        v[4] = 1.0
        v[5] = 0.001 * i
        rows.append((i, v))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_centroids(emb, k=2, iters=2, dim=dim)
    assert len(cents) == 2 and all(len(c) == dim for c in cents)

    from pyspark.sql import functions as Fn
    q = emb.filter(Fn.col("vec_id") == 0)
    res = ivf_cosine_topk(q, emb, cents, k=5, nprobe=1).collect()
    assert len(res) == 5
    # all neighbors must come from the same (axis-0) family
    assert all(r["vec_id"] < 20 for r in res)
    assert res[0]["cos_sim"] > 0.999


def test_ivf_centroids_deterministic(spark):
    from puregraphdb_spark.operators.similarity import kmeans_centroids

    dim = 8
    rows = [(i, [float(i % 3 == j) for j in range(dim)]) for i in range(30)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a = kmeans_centroids(emb, k=3, iters=2, dim=dim)
    b = kmeans_centroids(emb, k=3, iters=2, dim=dim)
    assert a == b


def test_detect_language(spark):
    df = spark.createDataFrame(
        [(1, "the cat is in the house and that is fine"),
         (2, "der hund ist nicht mit der katze und ein vogel"),
         (3, "el perro y la casa de los gatos es una maravilla"),
         (4, "zzz qqq xxx")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["lang"] for r in df.select(
        "doc_id", txt.detect_language("text").alias("lang")).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "es"
    assert out[4] == "und"


def test_token_counts_and_quality(spark):
    df = spark.createDataFrame([(1, "Hello, world! This is the test."),
                                (2, "!!! ??? ...")], ["doc_id", "text"])
    r = {x["doc_id"]: x for x in df.select(
        "doc_id",
        txt.token_count_ws("text").alias("ws"),
        txt.token_count_bpe("text").alias("bpe"),
        txt.quality_score("text").alias("q"),
    ).collect()}
    assert r[1]["ws"] == 6
    assert r[1]["bpe"] > r[1]["ws"]  # punctuation split out
    assert 0.0 <= r[2]["q"] < r[1]["q"] <= 1.0  # junk scores lower


def test_fingerprint_stability_and_sensitivity(spark):
    long_a = " ".join(f"tok{i}" for i in range(40))
    long_b = " ".join(f"tok{i}" for i in range(40) if i != 37) + " changed"
    df = spark.createDataFrame(
        [(1, long_a), (2, long_a), (3, long_b)], ["doc_id", "text"])
    fps = {r["doc_id"]: r["fp"] for r in df.select(
        "doc_id", txt.fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2]
    # same min-window may survive a tail edit; at minimum it's defined
    assert isinstance(fps[3], int)


def test_profile_documents_runs_on_fixture(spark):
    from puregraphdb_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    prof = txt.profile_documents(docs)
    row = prof.limit(1).collect()[0]
    assert set(prof.columns) == {
        "doc_id", "lang_detected", "n_tokens_ws", "n_tokens_bpe",
        "quality", "fingerprint",
    }
    assert row["n_tokens_ws"] > 0
    report = txt.corpus_quality_report(docs)
    assert report.count() > 0


def test_profile_portable_and_fast_paths_agree(spark):
    """The xxhash64 fast path and the md5 portable path must agree on
    every column EXCEPT the fingerprint representation (long vs hex
    string) — and both must cluster identical docs identically."""
    from puregraphdb_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    p = {r["doc_id"]: r for r in
         txt.profile_documents(docs, portable=True).collect()}
    f = {r["doc_id"]: r for r in
         txt.profile_documents(docs, portable=False).collect()}
    assert p.keys() == f.keys()
    for k in p:
        assert p[k]["lang_detected"] == f[k]["lang_detected"]
        assert p[k]["n_tokens_ws"] == f[k]["n_tokens_ws"]
        assert p[k]["n_tokens_bpe"] == f[k]["n_tokens_bpe"]
        # quality: decimal snap vs F.round — equal to the 4dp they
        # both round to (the snap only guards ties)
        assert abs(p[k]["quality"] - f[k]["quality"]) < 1e-9
        assert isinstance(p[k]["fingerprint"], str)
        assert isinstance(f[k]["fingerprint"], int)
    # fingerprint equality classes coincide across hash families
    from collections import defaultdict
    cp, cf = defaultdict(set), defaultdict(set)
    for k in p:
        cp[p[k]["fingerprint"]].add(k)
        cf[f[k]["fingerprint"]].add(k)
    assert sorted(map(sorted, cp.values())) == \
        sorted(map(sorted, cf.values()))


def test_fingerprint_md5_stability_and_edge_cases(spark):
    long_a = " ".join(f"tok{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, long_a), (2, long_a), (3, "short text"), (4, "")],
        ["doc_id", "text"])
    staged = df.select(
        "doc_id", txt.tokens("text").alias("toks"))
    fps = {r["doc_id"]: r["fp"] for r in staged.select(
        "doc_id", txt.fingerprint_md5(F.col("toks")).alias("fp"))
        .collect()}
    assert fps[1] == fps[2]                    # identical docs agree
    assert len(fps[3]) == 32                   # <8 tokens: one window
    # empty text fingerprints md5('') — defined, deterministic
    assert fps[4] == "d41d8cd98f00b204e9800998ecf8427e"


def test_apply_dedup_returns_cleaned_corpus(corpus):
    """End-to-end dedup: one keeper per duplicate cluster, all
    unclustered docs untouched, schema preserved."""
    cleaned = sim.apply_dedup(corpus, jaccard_threshold=0.5)
    assert cleaned.columns == corpus.columns
    kept = {r["doc_id"] for r in cleaned.collect()}
    # doc 2 is an exact duplicate of 1 -> only the min-id keeper stays
    assert 1 in kept and 2 not in kept
    # singletons survive
    assert {4, 5, 6} <= kept
    # cleaned corpus is a subset of the input with no new rows
    assert kept <= {1, 2, 3, 4, 5, 6}


def test_char_ngram_set_short_docs_are_empty(spark):
    """Texts shorter than n chars have NO n-grams. Spark's
    sequence(1, 0) is DESCENDING ([1, 0]) — unguarded it fabricates a
    shingle set for short/empty docs while DuckDB's generate_series
    yields [] (ADVICE r4, medium)."""
    from puregraphdb_spark.operators.llm import char_ngram_set

    df = spark.createDataFrame(
        [("",), ("a",), ("ab",), ("abc",), ("abcd",)], ["t"]
    )
    rows = df.select(
        "t", char_ngram_set(F.col("t")).alias("sh")
    ).orderBy(F.length("t")).collect()
    assert rows[0]["sh"] == []          # ""
    assert rows[1]["sh"] == []          # "a"
    assert rows[2]["sh"] == []          # "ab"
    assert rows[3]["sh"] == ["abc"]
    assert sorted(rows[4]["sh"]) == ["abc", "bcd"]


def test_contamination_report(spark):
    """A corpus doc containing a benchmark excerpt verbatim is flagged
    with the right gram counts; clean docs and sub-n-token docs are
    absent."""
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
            (3, "too short"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "beta gamma delta epsilon zeta eta")],
        ["doc_id", "text"],
    )
    rep = {
        r["corpus_id"]: r
        for r in txt.contamination_report(corpus, bench, n=5).collect()
    }
    assert set(rep) == {1}
    # doc 1 has 4 distinct 5-grams; the excerpt's 2 grams both match
    assert rep[1]["n_ngrams"] == 4
    assert rep[1]["n_matched"] == 2
    assert rep[1]["n_bench_docs"] == 1


def test_word_ngrams_short_text_empty(spark):
    rows = (
        spark.createDataFrame([("a b c d",), ("a b c d e",)], ["t"])
        .select(F.size(txt.word_ngrams("t", 5)).alias("n"))
        .collect()
    )
    assert sorted(r["n"] for r in rows) == [0, 1]


def test_ivf_plan_size_flat_in_k(spark):
    """The k-scaling contract (VERDICT r4): centroids are DATA in a
    broadcast relation, not plan literals — a 32× bigger k must not
    grow the query plan materially."""
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(20)],
        ["vec_id", "embedding"],
    )
    q = corpus.limit(2)

    def plan_len(k):
        cents = [[float(j % 7), float(j % 3), 1.0, 0.0] for j in range(k)]
        df = sim.ivf_cosine_topk(q, corpus, cents, k=3, nprobe=2)
        return len(df._jdf.queryExecution().optimizedPlan().toString())

    small, big = plan_len(8), plan_len(256)
    assert big < small * 1.5, (small, big)


def test_ivf_persisted_index_round_trip(spark, tmp_path):
    """write_ivf_index → read_ivf_index → serve: identical top-k to the
    in-session index, and the vector files are cluster-partitioned."""
    import os

    corpus = spark.createDataFrame(
        [(i, [math.cos(i * 0.7), math.sin(i * 0.7), float(i % 3), 1.0])
         for i in range(30)],
        ["vec_id", "embedding"],
    )
    cents = sim.kmeans_centroids(corpus, k=3, iters=2, dim=4)
    q = corpus.filter(F.col("vec_id") < 4)
    live = sim.ivf_cosine_topk(q, corpus, cents, k=5, nprobe=2)

    path = str(tmp_path / "ivf")
    sim.write_ivf_index(corpus, cents, path)
    vectors, cents_back = sim.read_ivf_index(spark, path)
    assert cents_back == cents
    assert any(
        d.startswith("cluster=")
        for d in os.listdir(os.path.join(path, "vectors"))
    )
    served = sim.ivf_cosine_topk(q, vectors, cents_back, k=5, nprobe=2)
    key = lambda r: (r["src"], r["rn"])  # noqa: E731
    assert sorted(
        [(r["src"], r["rn"], r["vec_id"], round(r["cos_sim"], 10))
         for r in served.collect()]
    ) == sorted(
        [(r["src"], r["rn"], r["vec_id"], round(r["cos_sim"], 10))
         for r in live.collect()]
    )


def test_blocked_fuzzy_pairs_blocking_and_threshold(spark):
    import puregraphdb_spark.operators.similarity as sim

    rows = [
        (1, "red widget", "A"), (2, "red widgets", "A"),  # dist 1
        (3, "red widget", "B"),   # same name, DIFFERENT block → excluded
        (4, "blue bolt", "A"),    # far from everything in A
        (5, "red widget", "A"),   # exact dup of 1 in A
    ]
    df = spark.createDataFrame(rows, ["id", "name", "blk"])
    got = {
        (r["a_id"], r["b_id"]): r["distance"]
        for r in sim.blocked_fuzzy_pairs(
            df, "id", "name", ["blk"], max_distance=2).collect()
    }
    assert got == {(1, 2): 1, (1, 5): 0, (2, 5): 1}

    # thresholded 3-arg levenshtein accepts exactly the <= d set the
    # plain distance would
    full = sim.blocked_fuzzy_pairs(
        df, "id", "name", ["blk"], max_distance=100).collect()
    want = {(r["a_id"], r["b_id"]) for r in full if r["distance"] <= 2}
    assert set(got) == want

    with pytest.raises(ValueError):
        sim.blocked_fuzzy_pairs(df, "id", "name", [], max_distance=2)
