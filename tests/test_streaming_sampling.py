"""Streaming A-ES weighted reservoir ≡ batch weighted_sample (q112):
same deterministic keys, so the upserted reservoir after ANY trigger
split equals the batch top-k over everything seen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from puregraphdb_spark.operators.pipeline import weighted_sample
from puregraphdb_spark.sources.registry import load_table
from puregraphdb_spark.streaming import windows as sw
from puregraphdb_spark.streaming.sampling import weighted_reservoir_stateful
from tests.conftest import SF_DIR


def _final_reservoir(spark, table: str) -> list[tuple]:
    """Memory sink in update mode appends each re-emission; the live
    reservoir is the LAST row per (lang, rk)."""
    pdf = spark.table(table).toPandas()
    pdf = pdf.drop_duplicates(["lang", "rk"], keep="last")
    return sorted(map(tuple, pdf[["lang", "rk", "doc_id"]].values))


def _batch_sample(spark, docs) -> list[tuple]:
    return sorted(
        (r["lang"], r["rk"], r["doc_id"])
        for r in weighted_sample(docs, k=10).collect()
    )


def test_streaming_reservoir_matches_batch_single_trigger(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_all")
    docs.write.parquet(path)

    stream = sw.read_parquet_stream(spark, path, docs.schema)
    q = (
        weighted_reservoir_stateful(stream, k=10)
        .writeStream.format("memory").queryName("t_resv1")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert _final_reservoir(spark, "t_resv1") == _batch_sample(spark, docs)


def test_streaming_reservoir_incremental_across_triggers(spark, tmp_path):
    """Docs split into two files → two micro-batches (one availableNow
    run, maxFilesPerTrigger=1): the second batch must EVICT
    first-batch picks that a better-keyed later doc displaces — the
    final upserted reservoir still equals the one-shot batch sample
    over the union."""
    docs = load_table(spark, SF_DIR, "documents")
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "docs_split")
    half1.coalesce(1).write.parquet(path)
    half2.coalesce(1).write.mode("append").parquet(path)

    stream = sw.read_parquet_stream(
        spark, path, docs.schema, max_files_per_trigger=1)
    query = (
        weighted_reservoir_stateful(stream, k=10)
        .writeStream.format("memory").queryName("t_resv2")
        .outputMode("update").trigger(availableNow=True).start()
    )
    query.awaitTermination()
    assert len(query.recentProgress) >= 2  # really ran as >=2 batches

    sink = spark.table("t_resv2").toPandas()
    # re-emission happened: some (lang, rk) slot was re-stated when a
    # later batch displaced or re-ranked earlier picks
    assert len(sink) > len(sink.drop_duplicates(["lang", "rk"]))
    assert _final_reservoir(spark, "t_resv2") == _batch_sample(spark, docs)
    # ... and the split genuinely changed the intermediate picture
    assert _batch_sample(spark, half1) != _batch_sample(spark, docs)


def test_streaming_reservoir_rejects_bad_k(spark, tmp_path):
    import pytest

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_k")
    docs.limit(5).write.parquet(path)
    stream = sw.read_parquet_stream(spark, path, docs.schema)
    with pytest.raises(ValueError):
        weighted_reservoir_stateful(stream, k=0)
