"""IVF index maintenance: append → drift detection → incremental
refresh. Pins that refresh touches ONLY affected cluster partitions,
that emptied clusters are removed, and that the index stays consistent
(every stored cluster id = nearest centroid) afterwards.
"""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from puregraphdb_spark.operators.similarity import (
    append_to_ivf_index, ivf_assign, ivf_cosine_topk, ivf_drift_report,
    kmeans_centroids, read_ivf_index, refresh_ivf_index, write_ivf_index,
)

DIM = 8


def _blob(center, n, rnd, start_id):
    rows = []
    for i in range(n):
        v = [c + rnd.uniform(-0.5, 0.5) for c in center]
        rows.append((start_id + i, v))
    return rows


def _centers():
    c0 = [10.0] + [0.0] * (DIM - 1)
    c1 = [0.0, 10.0] + [0.0] * (DIM - 2)
    c2 = [0.0, 0.0, 10.0] + [0.0] * (DIM - 3)
    return c0, c1, c2


def _build_index(spark, tmp_path):
    rnd = random.Random(0)
    c0, c1, c2 = _centers()
    rows = _blob(c0, 20, rnd, 0) + _blob(c1, 20, rnd, 100) + \
        _blob(c2, 20, rnd, 200)
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    cents = kmeans_centroids(corpus, k=3, iters=3, dim=DIM)
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, cents, path)
    return path, corpus, cents


def _listing(path):
    return sorted(
        (f, os.path.getmtime(os.path.join(path, f)))
        for f in os.listdir(path) if f.endswith(".parquet")
    )


def _assert_consistent(spark, path):
    """Every stored cluster id equals the nearest-centroid assignment
    under the CURRENT centroid table."""
    vectors, cents = read_ivf_index(spark, path)
    re = ivf_assign(
        vectors.select("vec_id", "embedding")
        .withColumnRenamed("embedding", "embedding"), cents)
    stored = {r["vec_id"]: r["cluster"] for r in vectors.collect()}
    fresh = {r["vec_id"]: r["cluster"] for r in re.collect()}
    assert stored == fresh


def test_fresh_index_has_no_drift(spark, tmp_path):
    path, _, _ = _build_index(spark, tmp_path)
    out = refresh_ivf_index(spark, path, drift_threshold=0.02)
    assert out["refreshed"] == [] and out["n_reassigned"] == 0
    assert out["max_drift"] < 0.02
    _assert_consistent(spark, path)


def test_append_then_refresh_updates_only_drifted_cluster(spark, tmp_path):
    path, _, cents = _build_index(spark, tmp_path)
    c0, _, _ = _centers()
    # the appended blob sits between c0 and the axis-1 direction: still
    # nearest to c0's centroid, but it drags that cluster's mean
    shifted = [10.0, 6.0] + [0.0] * (DIM - 2)
    rnd = random.Random(1)
    new = spark.createDataFrame(
        _blob(shifted, 40, rnd, 1000), "vec_id long, embedding array<double>")
    n = append_to_ivf_index(new, path)
    assert n == 40

    report = {r["cluster"]: r for r in ivf_drift_report(spark, path)}
    drifted = [c for c, r in report.items() if r["drift"] > 0.02]
    assert len(drifted) == 1
    target = drifted[0]

    # stable partitions must not be rewritten
    vec_dir = os.path.join(path, "vectors")
    stable = [c for c in (0, 1, 2) if c != target]
    before = {c: _listing(os.path.join(vec_dir, f"cluster={c}"))
              for c in stable}

    out = refresh_ivf_index(spark, path, drift_threshold=0.02)
    assert out["refreshed"] == [target]
    assert out["n_reassigned"] == 60  # 20 original + 40 appended
    for c in stable:
        assert _listing(os.path.join(vec_dir, f"cluster={c}")) == before[c]

    # centroid moved to the member mean; index consistent; no new drift
    _assert_consistent(spark, path)
    report2 = ivf_drift_report(spark, path)
    assert max(r["drift"] for r in report2) < 1e-9
    # search over the refreshed index still returns top-k per query
    vectors, cents2 = read_ivf_index(spark, path)
    q = spark.createDataFrame(
        [(9999, [10.0, 3.0] + [0.0] * (DIM - 2))],
        "vec_id long, embedding array<double>")
    hits = ivf_cosine_topk(q, vectors, cents2, k=5, nprobe=2).collect()
    assert len(hits) == 5


def test_refresh_removes_emptied_cluster_dir(spark, tmp_path):
    # hand-built aged index: cluster 1's members are EXACTLY cluster
    # 0's centroid vector, so after refresh they tie onto cluster 0
    # (smallest-idx tie rule) and cluster 1 is emptied
    cA = [1.0] + [0.0] * (DIM - 1)
    cB = [0.0, 1.0] + [0.0] * (DIM - 2)
    rows0 = [(i, list(cA), 0) for i in range(5)]
    rows1 = [(100 + i, list(cA), 1) for i in range(5)]
    path = str(tmp_path / "aged")
    spark.createDataFrame(
        rows0 + rows1, "vec_id long, embedding array<double>, cluster int"
    ).write.partitionBy("cluster").parquet(os.path.join(path, "vectors"))
    spark.createDataFrame(
        [(0, cA), (1, cB)], "cluster int, cvec array<double>"
    ).coalesce(1).write.parquet(os.path.join(path, "centroids"))

    out = refresh_ivf_index(spark, path, drift_threshold=0.02)
    assert out["refreshed"] == [1]
    assert out["n_moved"] == 5
    assert not os.path.exists(os.path.join(path, "vectors", "cluster=1"))
    vectors, _ = read_ivf_index(spark, path)
    assert vectors.count() == 10
    assert vectors.filter(F.col("cluster") == 0).count() == 10


def test_append_preserves_stored_embedding_dtype(spark, tmp_path):
    # index written with float vectors (the fixture dtype); appends cast
    # to match so the partition directory stays schema-uniform
    rnd = random.Random(2)
    c0, c1, _ = _centers()
    corpus = spark.createDataFrame(
        _blob(c0, 10, rnd, 0) + _blob(c1, 10, rnd, 100),
        "vec_id long, embedding array<float>")
    cents = kmeans_centroids(corpus, k=2, iters=2, dim=DIM)
    path = str(tmp_path / "fl")
    write_ivf_index(corpus, cents, path)
    new = spark.createDataFrame(
        _blob(c0, 5, rnd, 1000), "vec_id long, embedding array<double>")
    append_to_ivf_index(new, path)
    vectors, _ = read_ivf_index(spark, path)
    assert dict(vectors.dtypes)["embedding"] == "array<float>"
    assert vectors.count() == 25


def test_call_door_ivf_drift_and_refresh(spark, tmp_path):
    from puregraphdb_spark.engine import Engine
    from tests.conftest import SF_DIR

    path, _, _ = _build_index(spark, tmp_path)
    eng = Engine(spark, SF_DIR)
    drift = eng.sql(f"CALL ivf_drift(path => '{path}')").collect()
    assert {r["cluster"] for r in drift} == {0, 1, 2}
    out = eng.sql(f"CALL ivf_refresh(path => '{path}')").collect()[0]
    assert out["refreshed"] == "" and out["n_reassigned"] == 0
