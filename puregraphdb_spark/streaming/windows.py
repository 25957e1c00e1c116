"""Structured-Streaming deployment of the event-window operators.

The batch versions in ``operators.events`` are the oracled ones; these
mirror their column contracts on unbounded streams (SURVEY §7.5):

- tumbling:  (win, event_type, n, sum_val)        — same as q20
- session:   (user_id, session_start, session_end, n_events)
  (streaming session windows are keyed by real time intervals, not the
  batch lag-derived ordinal ``sid`` — documented divergence: a stream
  cannot assign stable per-user ordinals without total history.)

Watermarks bound state: events later than ``watermark`` behind the max
seen event time are dropped and their windows finalized. At scale the
shuffle is keyed by the window/group columns exactly like the batch
plans — state store size, not shuffle width, is the capacity knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_parquet_stream(spark: SparkSession, path: str,
                        schema: StructType,
                        max_files_per_trigger: int | None = None) -> DataFrame:
    """File-arrival stream over a parquet directory (schema required by
    Structured Streaming; take it from a batch read of the same data).

    TIMESTAMP_NTZ columns are normalized to TimestampType, mirroring
    ``sources.registry.load_table``: event-time operators (watermarks,
    windows) reject NTZ, and the engine pins the session to UTC so the
    cast is value-preserving wall-clock."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    for c, d in df.dtypes:
        if d == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def tumbling_window_stream(events: DataFrame, duration: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming mirror of events.tumbling_window (q20 contract).

    Groups on the WINDOW STRUCT (not ``.start``) — extracting the
    start inside the groupBy severs watermark propagation to the
    aggregation, and append-mode (durable-sink) queries are then
    rejected; the start is projected after the agg instead.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_val"),
        )
        .select(F.col("w.start").alias("win"), "event_type", "n", "sum_val")
    )


def session_window_stream(events: DataFrame, gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization via F.session_window (native state-store
    sessions; batch equivalent is events.sessionize)."""
    sw = F.session_window("ts", gap)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", sw)
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def write_stream_parquet(stream_df: DataFrame, path: str,
                         checkpoint: str, mode: str = "append",
                         trigger_available_now: bool = False):
    """Durable streaming sink: parquet files + checkpointed offsets —
    the deployment shape (exactly-once via the checkpoint's WAL; the
    output directory is the downstream batch engine's source). Append
    mode requires a watermarked aggregation upstream (finalized windows
    only); ``trigger_available_now`` drains-and-stops for backfills.
    Returns the StreamingQuery handle.
    """
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def run_available_now(stream_df: DataFrame, table_name: str) -> None:
    """Drain everything currently available into an in-memory sink table
    (batch-equivalent execution of the streaming plan; used by tests and
    backfills). Blocks until the drain completes."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
