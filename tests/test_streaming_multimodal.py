"""Streaming window operators (batch-equivalence via availableNow) and
multimodal decode plumbing (Arrow batch flow through mapInPandas).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from puregraphdb_spark.operators import multimodal as mm
from puregraphdb_spark.operators.events import tumbling_window
from puregraphdb_spark.sources.registry import load_table
from puregraphdb_spark.streaming import windows as sw
from tests.conftest import SF_DIR


def test_streaming_tumbling_equals_batch(spark, tmp_path):
    # materialize the converted events as a streamable directory
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_stream")
    ev.write.parquet(path)

    stream = sw.read_parquet_stream(spark, path, ev.schema)
    agg = sw.tumbling_window_stream(stream, "1 hour", watermark="30 days")
    sw.run_available_now(agg, "t_stream_q20")
    got = spark.table("t_stream_q20").orderBy("win", "event_type").collect()
    want = tumbling_window(ev).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_streaming_session_window_runs(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_stream2")
    ev.write.parquet(path)
    stream = sw.read_parquet_stream(spark, path, ev.schema)
    agg = sw.session_window_stream(stream, "30 minutes", watermark="30 days")
    sw.run_available_now(agg, "t_stream_sessions")
    out = spark.table("t_stream_sessions")
    assert out.count() > 0
    assert set(out.columns) == {"user_id", "session_start", "session_end", "n_events"}
    # sessions end after they start, and no user has overlapping sessions
    bad = out.filter(F.col("session_end") <= F.col("session_start")).count()
    assert bad == 0


@pytest.fixture(scope="module")
def assets(spark):
    return mm.synthetic_assets(spark, 48)


def test_decode_images_schema_and_determinism(assets):
    out = mm.decode_images(assets, feature_dim=8)
    rows = out.collect()
    assert len(rows) == assets.filter(F.col("modality") == "image").count()
    r0 = rows[0]
    assert len(r0["features"]) == 8
    assert all(0.0 <= x <= 1.0 for x in r0["features"])
    assert r0["n_pixels"] == r0["width"] * r0["height"]
    # deterministic: same payload → same features
    again = {r["asset_id"]: r["features"] for r in mm.decode_images(assets, 8).collect()}
    assert again[r0["asset_id"]] == r0["features"]


def test_sample_frames_shape(assets):
    frames = mm.sample_frames(assets, every_ms=1000, max_frames=4)
    rows = frames.collect()
    assert rows, "video assets should produce frames"
    by_asset: dict[int, list] = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r)
    for aid, fs in by_asset.items():
        idxs = sorted(f["frame_index"] for f in fs)
        assert idxs == list(range(len(idxs)))  # dense 0..n-1
        assert len(fs) <= 4
        assert all(f["ts_ms"] == f["frame_index"] * 1000 for f in fs)


def test_resize_metadata(assets):
    out = mm.resize_images(assets, 16, 16).select("width", "scale").collect()
    for r in out:
        assert r["scale"] <= 1.0  # fixture images are larger than 16px


def test_decode_raises_on_missing_payload():
    with pytest.raises(NotImplementedError):
        mm._decode_image_bytes(None)


def test_extract_audio_features(assets):
    out = mm.extract_audio_features(assets, feature_dim=8).collect()
    # synthetic_assets makes every third asset audio
    assert len(out) == sum(1 for r in assets.collect() if r["modality"] == "audio")
    for r in out:
        assert r["n_samples"] == 128  # 32-byte digest * 4
        assert 0.0 <= r["zero_crossing_rate"] <= 1.0
        assert r["rms_energy"] > 0
        assert len(r["features"]) == 8
    # determinism: same payloads -> same features on a re-run
    again = mm.extract_audio_features(assets, feature_dim=8).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))


def test_streaming_parquet_sink_roundtrip(spark, tmp_path):
    """Watermarked tumbling agg -> parquet sink (availableNow drain) ->
    batch read-back: finalized windows only, durable layout."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    ev = load_table(spark, SF_DIR, "events")
    ev.write.parquet(src)
    stream = sw.read_parquet_stream(spark, src, ev.schema)
    agg = sw.tumbling_window_stream(stream, "1 hour", watermark="0 seconds")
    q = sw.write_stream_parquet(agg, out, ck, trigger_available_now=True)
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert set(got.columns) == {"win", "event_type", "n", "sum_val"}
    # append mode emits only watermark-finalized windows; with a zero
    # watermark every window except the open tail is final
    batch = tumbling_window(ev).count()
    assert 0 < got.count() <= batch
