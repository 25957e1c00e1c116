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


def test_stateful_funnel_matches_batch(spark, tmp_path):
    """Streaming funnel ≡ batch funnel on the fixture (availableNow)."""
    from puregraphdb_spark.operators.events import funnel
    from puregraphdb_spark.streaming.funnel import funnel_stateful

    stages = ["view", "click", "purchase"]
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_funnel")
    ev.write.parquet(path)

    stream = sw.read_parquet_stream(spark, path, ev.schema)
    q = (
        funnel_stateful(stream, stages)
        .writeStream.format("memory")
        .queryName("t_funnel")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["user_id"], r["stage_index"], r["stage"], r["ts"])
        for r in spark.table("t_funnel").collect()
    )
    want = sorted(
        (r["user_id"], r["stage_index"], r["stage"], r["ts"])
        for r in funnel(ev, stages).collect()
    )
    assert got == want and len(got) > 0


def test_stateful_funnel_incremental_across_triggers(spark, tmp_path):
    """State carries the funnel position across triggers: a time-split
    two-file stream (maxFilesPerTrigger=1, in event-time order) must
    emit exactly the batch funnel — completions spanning the split
    depend on state from trigger 1."""
    from puregraphdb_spark.operators.events import funnel
    from puregraphdb_spark.streaming.funnel import funnel_stateful

    stages = ["view", "click", "purchase"]
    ev = load_table(spark, SF_DIR, "events").persist()
    mid = ev.select(
        F.percentile_approx("ts", 0.5).cast("timestamp")
    ).collect()[0][0]
    path = str(tmp_path / "events_funnel_inc")
    # lexicographic file order must equal time order for in-order arrival
    ev.filter(F.col("ts") <= F.lit(mid)).coalesce(1).write.parquet(
        path + "/b=0")
    ev.filter(F.col("ts") > F.lit(mid)).coalesce(1).write.parquet(
        path + "/b=1")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(path + "/b=*")
    )
    for c, d in stream.dtypes:
        if d == "timestamp_ntz":
            stream = stream.withColumn(c, F.col(c).cast("timestamp"))
    q = (
        funnel_stateful(stream, stages)
        .writeStream.format("memory")
        .queryName("t_funnel_inc")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["user_id"], r["stage_index"], r["stage"], r["ts"])
        for r in spark.table("t_funnel_inc").collect()
    )
    want = sorted(
        (r["user_id"], r["stage_index"], r["stage"], r["ts"])
        for r in funnel(ev, stages).collect()
    )
    ev.unpersist()
    assert got == want and len(got) > 0


def test_stateful_bounded_funnel_matches_batch(spark, tmp_path):
    """within window parity: streaming tracker with within_seconds ≡
    batch funnel with the same interval (q94's conversion window)."""
    from puregraphdb_spark.operators.events import funnel
    from puregraphdb_spark.streaming.funnel import funnel_stateful

    stages = ["view", "click", "purchase"]
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_funnel_b")
    ev.write.parquet(path)

    stream = sw.read_parquet_stream(spark, path, ev.schema)
    q = (
        funnel_stateful(stream, stages, within_seconds=2 * 86400)
        .writeStream.format("memory")
        .queryName("t_funnel_b")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["user_id"], r["stage_index"], r["ts"])
        for r in spark.table("t_funnel_b").collect()
    )
    want = sorted(
        (r["user_id"], r["stage_index"], r["ts"])
        for r in funnel(ev, stages, within="2 days").collect()
    )
    unbounded = funnel(ev, stages).count()
    assert got == want and len(got) > 0
    assert len(got) < unbounded  # the window genuinely bites


def test_conversion_report_over_streaming_tracker_output(spark, tmp_path):
    """The windowed conversion report composes with the streaming
    funnel: report(drained tracker output) ≡ report(batch funnel) —
    the read-side derivation the tracker's sink feeds."""
    from puregraphdb_spark.operators.events import (
        funnel, funnel_conversion_windows,
    )
    from puregraphdb_spark.streaming.funnel import funnel_stateful

    stages = ["view", "click", "purchase"]
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_conv")
    ev.write.parquet(path)
    stream = sw.read_parquet_stream(spark, path, ev.schema)
    q = (
        funnel_stateful(stream, stages)
        .writeStream.format("memory")
        .queryName("t_conv_stages")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in funnel_conversion_windows(
            spark.table("t_conv_stages")
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in funnel_conversion_windows(funnel(ev, stages)).collect()
    )
    assert got == want and len(got) > 0


def test_streaming_conversion_latency_matches_batch(spark, tmp_path):
    """report(conversion tracker sink) ≡ batch conversion_latency
    (q124) on the fixture, availableNow."""
    from puregraphdb_spark.operators.events import conversion_latency
    from puregraphdb_spark.streaming.reports import (
        conversion_latency_report, conversion_stateful,
    )

    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_convlat")
    ev.write.parquet(path)
    stream = sw.read_parquet_stream(spark, path, ev.schema)
    q = (
        conversion_stateful(stream)
        .writeStream.format("memory")
        .queryName("t_convlat")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in conversion_latency_report(
            spark.table("t_convlat")).collect()
    )
    want = sorted(tuple(r) for r in conversion_latency(ev).collect())
    assert got == want and len(got) > 0


def test_streaming_conversion_incremental_across_triggers(spark, tmp_path):
    """The anchor (first from-event) carried in state must complete
    conversions whose to-event arrives in a later trigger."""
    from puregraphdb_spark.operators.events import conversion_latency
    from puregraphdb_spark.streaming.reports import (
        conversion_latency_report, conversion_stateful,
    )

    ev = load_table(spark, SF_DIR, "events").persist()
    mid = ev.select(
        F.percentile_approx("ts", 0.5).cast("timestamp")
    ).collect()[0][0]
    path = str(tmp_path / "events_convlat_inc")
    ev.filter(F.col("ts") <= F.lit(mid)).coalesce(1).write.parquet(
        path + "/b=0")
    ev.filter(F.col("ts") > F.lit(mid)).coalesce(1).write.parquet(
        path + "/b=1")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(path + "/b=*")
    )
    for c, d in stream.dtypes:
        if d == "timestamp_ntz":
            stream = stream.withColumn(c, F.col(c).cast("timestamp"))
    q = (
        conversion_stateful(stream)
        .writeStream.format("memory")
        .queryName("t_convlat_inc")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in conversion_latency_report(
            spark.table("t_convlat_inc")).collect()
    )
    want = sorted(tuple(r) for r in conversion_latency(ev).collect())
    ev.unpersist()
    assert got == want and len(got) > 0


def test_streaming_bounce_rate_matches_batch(spark, tmp_path):
    """bounce_report(sessionizer sink) ≡ batch bounce_rate (q130).
    A sentinel event per user one day past the stream's end closes
    every real session (the sentinel's own 1-event session stays open
    in state and is never emitted), so the closed-session sink covers
    exactly the batch session set."""
    from puregraphdb_spark.operators.events import bounce_rate
    from puregraphdb_spark.streaming.reports import bounce_report

    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts")
    sentinel = (
        ev.groupBy("user_id")
        .agg((F.max("ts") + F.expr("interval 1 day")).alias("ts"))
        .select("user_id", "ts")
    )
    path = str(tmp_path / "events_bounce")
    # sentinel in a SECOND file so in-order arrival holds trivially
    ev.coalesce(1).write.parquet(path + "/b=0")
    sentinel.coalesce(1).write.parquet(path + "/b=1")
    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(path + "/b=*")
    )
    for c, d in stream.dtypes:
        if d == "timestamp_ntz":
            stream = stream.withColumn(c, F.col(c).cast("timestamp"))
    q = (
        sessionize_stateful(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("t_bounce_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in bounce_report(spark.table("t_bounce_sessions")).collect()
    )
    want = sorted(tuple(r) for r in bounce_rate(ev).collect())
    assert got == want and len(got) > 0
