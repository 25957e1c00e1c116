"""Streaming dedup: duplicated input drained through the stream must
equal the batch distinct-on-keys result; the watermark variant must
drop in-window repeats too.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from puregraphdb_spark.sources.registry import load_table
from puregraphdb_spark.streaming import windows as sw
from puregraphdb_spark.streaming.dedup import (
    content_key, dedup_stream, dedup_stream_within_watermark,
)
from tests.conftest import SF_DIR


def _drain(df, name: str):
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def test_dedup_stream_equals_batch_distinct(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type")
    path = str(tmp_path / "dup_events")
    # simulate a re-crawl: every event delivered twice
    ev.unionByName(ev).write.parquet(path)

    raw = spark.read.parquet(path)
    assert raw.count() == 2 * ev.count()
    stream = sw.read_parquet_stream(spark, path, raw.schema)
    got = _drain(dedup_stream(stream, ["event_id"]), "t_dedup_exact")
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()


def test_dedup_stream_within_watermark_drops_repeats(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts")
    path = str(tmp_path / "dup_events_wm")
    ev.unionByName(ev).write.parquet(path)

    raw = spark.read.parquet(path)
    stream = sw.read_parquet_stream(spark, path, raw.schema)
    # the whole fixture fits inside one watermark window when drained
    # as a single availableNow batch, so all repeats are in-window
    got = _drain(
        dedup_stream_within_watermark(stream, ["event_id"], "ts",
                                      delay="365 days"),
        "t_dedup_wm",
    )
    assert got.count() == ev.count()


def test_content_key_identity(spark):
    d = load_table(spark, SF_DIR, "documents")
    with_key = d.select(content_key("text").alias("k"), "text")
    # same text -> same key; distinct keys <= distinct texts
    n_text = d.select("text").distinct().count()
    assert with_key.select("k").distinct().count() == n_text


def test_dedup_stream_requires_keys(spark):
    import pytest

    from puregraphdb_spark.sources.registry import load_table as lt

    ev = lt(spark, SF_DIR, "events")
    with pytest.raises(ValueError):
        dedup_stream(ev, [])
    with pytest.raises(ValueError):
        dedup_stream_within_watermark(ev, [])
