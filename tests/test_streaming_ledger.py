"""Streaming ledger twin (streaming/ledger.py): the last emitted
snapshot per key must equal the batch clamped/capped balance — single
trigger AND across a two-trigger event-time split (state carries the
fold)."""

from __future__ import annotations

from pyspark.sql import functions as F

from puregraphdb_spark.operators.events import (
    capped_balance, clamped_balance)
from puregraphdb_spark.sources.registry import load_table
from puregraphdb_spark.streaming import windows as sw
from puregraphdb_spark.streaming.ledger import ledger_stateful
from tests.conftest import SF_DIR

CAP = 50_000_000


def _last_snapshot(spark, table):
    """Final emitted row per user = the one with max n_events (the
    snapshot counter is strictly monotone per key)."""
    best: dict = {}
    for r in spark.table(table).collect():
        cur = best.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            best[r["user_id"]] = r
    return best


def _batch_expected(ev, cap=None):
    if cap is None:
        return {r["user_id"]: r for r in clamped_balance(ev).collect()}
    return {r["user_id"]: r
            for r in capped_balance(ev, cap_micros=cap).collect()}


def test_streaming_ledger_matches_batch_clamped(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("user_id") % 5 == 0)
    path = str(tmp_path / "events_ledger")
    ev.write.parquet(path)
    stream = sw.read_parquet_stream(spark, path, ev.schema)
    q = (
        ledger_stateful(stream)
        .writeStream.format("memory").queryName("t_ledger")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = _last_snapshot(spark, "t_ledger")
    want = _batch_expected(ev)
    assert set(got) == set(want) and len(got) > 0
    for uid, w in want.items():
        g = got[uid]
        assert (g["n_events"], g["final_bal"], g["n_resets"],
                g["max_bal"]) == (
            w["n_events"], w["final_bal"], w["n_resets"],
            w["max_bal"]), uid
        assert g["n_caps"] == 0


def test_streaming_ledger_incremental_across_triggers(spark, tmp_path):
    """Two-file stream in event-time order (maxFilesPerTrigger=1):
    trigger-2 folds must start from trigger-1 state — balances that
    dip or peak across the split are wrong without carried state."""
    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("user_id") % 5 == 0).persist()
    mid = ev.select(
        F.percentile_approx("ts", 0.5).cast("timestamp")
    ).collect()[0][0]
    path = str(tmp_path / "events_ledger_inc")
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
        ledger_stateful(stream, cap_micros=CAP)
        .writeStream.format("memory").queryName("t_ledger_inc")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = _last_snapshot(spark, "t_ledger_inc")
    want = _batch_expected(ev, cap=CAP)
    ev.unpersist()
    assert set(got) == set(want) and len(got) > 0
    for uid, w in want.items():
        g = got[uid]
        assert (g["n_events"], g["final_bal"], g["n_resets"],
                g["n_caps"], g["max_bal"]) == (
            w["n_events"], w["final_bal"], w["n_resets"],
            w["n_caps"], w["max_bal"]), uid
    # the split must actually have produced two emissions for some key
    emitted = spark.table("t_ledger_inc").count()
    assert emitted > len(want)
