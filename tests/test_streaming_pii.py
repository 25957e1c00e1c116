"""Streaming PII monitor: the batch run of windowed_pii_scan IS the
oracle for the streaming run (same plan, F.window groups both), plus
the redact-before-sink composition and alert guardrails.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from puregraphdb_spark.operators.pii import plant_synthetic_pii, redact_pii
from puregraphdb_spark.sources.registry import load_table
from puregraphdb_spark.streaming import windows as sw
from puregraphdb_spark.streaming.pii_monitor import (
    pii_alerts, windowed_pii_scan,
)
from tests.conftest import SF_DIR


def _planted_docs(spark):
    """Fixture docs + deterministic PII plant + synthetic event time
    (doc_id minutes past a base — spreads docs across windows)."""
    d = plant_synthetic_pii(
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text", "source"))
    base = F.lit(dt.datetime(2024, 1, 1)).cast("timestamp")
    return d.withColumn(
        "ts", base + F.make_interval(mins=F.col("doc_id") % 180))


def _norm(rows):
    return sorted(
        (r["window_start"], r["source"], r["n_docs"], r["docs_with_pii"],
         r["n_email"], r["n_phone"], r["n_ipv4"]) for r in rows)


def test_stream_pii_matches_batch(spark, tmp_path):
    docs = _planted_docs(spark)
    path = str(tmp_path / "pii_docs")
    docs.write.parquet(path)

    want = _norm(windowed_pii_scan(docs).collect())
    assert any(r[3] > 0 for r in want)  # the plant actually planted
    stream = sw.read_parquet_stream(spark, path, docs.schema)
    sw.run_available_now(windowed_pii_scan(stream), "t_pii_stream")
    got = _norm(spark.table("t_pii_stream").collect())
    assert got == want and len(got) > 0


def test_stream_pii_incremental_across_triggers(spark, tmp_path):
    """Micro-batches split WITHIN windows: the scalar counters must
    merge incrementally to the same finalized totals."""
    docs = _planted_docs(spark)
    path = str(tmp_path / "pii_docs2")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(path)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(path)
    stream = sw.read_parquet_stream(spark, path, docs.schema,
                                    max_files_per_trigger=1)
    sw.run_available_now(windowed_pii_scan(stream), "t_pii_stream2")
    want = _norm(windowed_pii_scan(docs).collect())
    assert _norm(spark.table("t_pii_stream2").collect()) == want


def test_redact_then_monitor_is_clean(spark):
    """The redact-before-sink composition: monitoring AFTER
    redact_pii (a pure projection, streamable as-is) reports zero."""
    docs = redact_pii(_planted_docs(spark)).drop("n_redactions")
    out = windowed_pii_scan(docs).collect()
    assert len(out) > 0
    assert all(r["docs_with_pii"] == 0 for r in out)
    assert pii_alerts(windowed_pii_scan(docs)).count() == 0


def test_pii_alerts_fire_on_dirty_windows(spark):
    docs = _planted_docs(spark)
    mon = windowed_pii_scan(docs)
    alerts = pii_alerts(mon).collect()
    assert len(alerts) > 0
    assert all(r["pii_doc_ratio"] > 0 for r in alerts)
