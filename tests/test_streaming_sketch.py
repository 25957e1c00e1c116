"""Streaming heavy-hitters sketch ≡/⊇ the batch contract:

- exact regime (capacity ≥ distinct values per bucket): the merged
  stream state equals the exact batch counts after ANY trigger split
  (no decrements ever happen → lower == upper == true);
- decremented regime: the merged bounds bracket the exact counts and
  every true heavy hitter (count > its bucket's error mass) appears;
- the seq/max-seq contract really drops evicted counters from older
  emissions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from puregraphdb_spark.operators.pipeline import _nonempty_tokens
from puregraphdb_spark.sources.registry import load_table
from puregraphdb_spark.streaming import windows as sw
from puregraphdb_spark.streaming.sketch import (
    heavy_hitters_stateful,
    merged_heavy_hitters,
)
from tests.conftest import SF_DIR


def _token_stream_path(spark, tmp_path, n_files=1):
    docs = load_table(spark, SF_DIR, "documents")
    pos_tok = docs.select(
        F.posexplode(_nonempty_tokens()).alias("pos", "tok")
    )
    tok = pos_tok.select("tok")
    path = str(tmp_path / "tokens")
    if n_files == 1:
        tok.coalesce(1).write.parquet(path)
    else:
        # split on token POSITION parity: occurrences of the SAME
        # token land in both files, so every counter accumulates
        # across triggers (a value-hash split would deliver each
        # token in a single trigger and never exercise cross-trigger
        # accumulation)
        pos_tok.filter(F.col("pos") % 2 == 0).select("tok").coalesce(
            1).write.parquet(path)
        pos_tok.filter(F.col("pos") % 2 == 1).select("tok").coalesce(
            1).write.mode("append").parquet(path)
    return path, tok


def _run(spark, path, schema, name, capacity, per_trigger=None):
    stream = sw.read_parquet_stream(
        spark, path, schema, max_files_per_trigger=per_trigger)
    q = (
        heavy_hitters_stateful(stream, "tok", capacity=capacity,
                               n_buckets=8)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return q


def test_stream_exact_regime_matches_batch_counts(spark, tmp_path):
    path, tok = _token_stream_path(spark, tmp_path, n_files=2)
    q = _run(spark, path, tok.schema, "t_hh1", capacity=512,
             per_trigger=1)
    assert len(q.recentProgress) >= 2  # really ran as >= 2 batches
    exact = {r["tok"]: r["n"] for r in
             tok.groupBy("tok").agg(F.count("*").alias("n")).collect()}
    merged = merged_heavy_hitters(spark.table("t_hh1"), k=1000).collect()
    got = {r.value: (r.count_lower, r.count_upper) for r in merged}
    assert got == {v: (n, n) for v, n in exact.items()}


def test_stream_decremented_regime_bounds_bracket(spark, tmp_path):
    path, tok = _token_stream_path(spark, tmp_path, n_files=2)
    _run(spark, path, tok.schema, "t_hh2", capacity=3, per_trigger=1)
    exact = {r["tok"]: r["n"] for r in
             tok.groupBy("tok").agg(F.count("*").alias("n")).collect()}
    merged = merged_heavy_hitters(spark.table("t_hh2"), k=1000).collect()
    assert len(merged) > 0
    for r in merged:
        assert r.count_lower <= exact.get(r.value, 0) <= r.count_upper, (
            r.value, r.count_lower, exact.get(r.value), r.count_upper)
    # max-seq filtering really dropped older emissions: the raw sink
    # holds multiple seqs per bucket after two triggers
    sink = spark.table("t_hh2").toPandas()
    assert sink.groupby("bucket")["seq"].nunique().max() >= 2


def test_stream_rejects_bad_capacity(spark, tmp_path):
    path, tok = _token_stream_path(spark, tmp_path)
    stream = sw.read_parquet_stream(spark, path, tok.schema)
    import pytest

    with pytest.raises(ValueError):
        heavy_hitters_stateful(stream, "tok", capacity=0)


def test_heavy_hitters_stateful_rejects_zero_buckets(spark):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(F.lit("a").alias("tok"))
    )
    with pytest.raises(ValueError, match="n_buckets"):
        heavy_hitters_stateful(stream, "tok", capacity=4, n_buckets=0)
