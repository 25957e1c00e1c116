"""applyInPandasWithState sessionizer: emitted closed sessions must
equal the batch sessionization minus each user's final (still-open)
session.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from puregraphdb_spark.operators.events import sessionize
from puregraphdb_spark.sources.registry import load_table
from puregraphdb_spark.streaming import windows as sw
from puregraphdb_spark.streaming.stateful import sessionize_stateful
from tests.conftest import SF_DIR


def test_stateful_sessionizer_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_state")
    ev.write.parquet(path)

    stream = sw.read_parquet_stream(spark, path, ev.schema)
    closed = sessionize_stateful(stream, gap_seconds=1800)
    q = (
        closed.writeStream.format("memory")
        .queryName("t_closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_closed_sessions")

    batch = sessionize(ev, "30 minutes")
    n_users = ev.select("user_id").distinct().count()
    # every user's last session never closes within the stream
    assert got.count() == batch.count() - n_users

    # per-session event counts must agree with the batch closed set:
    # drop each user's final (max sid) session from the batch result.
    w_last = batch.groupBy("user_id").agg(F.max("sid").alias("last_sid"))
    batch_closed = (
        batch.join(w_last, "user_id")
        .filter(F.col("sid") != F.col("last_sid"))
    )
    got_counts = sorted(
        (r["user_id"], r["n_events"]) for r in got.collect()
    )
    want_counts = sorted(
        (r["user_id"], r["n_events"]) for r in batch_closed.collect()
    )
    assert got_counts == want_counts
