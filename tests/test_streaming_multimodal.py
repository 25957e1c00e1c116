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


# -- real codecs (functions/codecs.py) ---------------------------------------


def _checker(h, w, ch=3):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    base = ((yy + xx) % 2 * 255).astype("uint8")
    return np.stack([base] * ch, axis=2) if ch > 1 else base[:, :, None]


def test_png_round_trip_exact():
    import numpy as np

    from puregraphdb_spark.functions import codecs

    for ch in (1, 3, 4):
        px = _checker(5, 7, ch)
        back = codecs.decode_png(codecs.encode_png(px))
        assert back.shape == (5, 7, ch)
        assert np.array_equal(back, px)


def test_png_decoder_handles_all_filters():
    """Hand-build one PNG per scanline filter type and check exact
    pixel recovery — the decoder must implement the full spec, not
    just the filter-0 path our encoder emits."""
    import struct
    import zlib

    import numpy as np

    from puregraphdb_spark.functions import codecs

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(4, 6, 3)).astype("uint8")
    h, w, ch = px.shape

    def paeth(a, b, c):
        p = int(a) + int(b) - int(c)
        pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    for filt in (0, 1, 2, 3, 4):
        raw = b""
        prev = np.zeros(w * ch, dtype=np.uint8)
        for y in range(h):
            line = px[y].ravel()
            enc = np.empty_like(line)
            for x in range(w * ch):
                left = int(line[x - ch]) if x >= ch else 0
                up = int(prev[x])
                ul = int(prev[x - ch]) if x >= ch else 0
                if filt == 0:
                    pred = 0
                elif filt == 1:
                    pred = left
                elif filt == 2:
                    pred = up
                elif filt == 3:
                    pred = (left + up) >> 1
                else:
                    pred = paeth(left, up, ul)
                enc[x] = (int(line[x]) - pred) & 0xFF
            raw += bytes([filt]) + enc.tobytes()
            prev = line

        def chunk(ctype, data):
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

        payload = (
            codecs.PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(codecs.decode_png(payload), px), filt


def test_png_decoder_rejects_non_png_and_bad_profile():
    import pytest as _pytest

    from puregraphdb_spark.functions import codecs

    assert codecs.decode_png(b"not a png at all") is None
    assert codecs.decode_png(None) is None
    # 16-bit depth is outside the supported profile
    import struct
    import zlib

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    bad = (codecs.PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)))
    with _pytest.raises(ValueError, match="unsupported"):
        codecs.decode_png(bad)


def test_wav_round_trip_and_features():
    import math as m

    import numpy as np

    from puregraphdb_spark.functions import codecs

    tone = np.sin(np.arange(1600) * 2 * m.pi * 440 / 16000)
    payload = codecs.encode_wav(tone, rate=16000)
    x, rate = codecs.decode_wav(payload)
    assert rate == 16000 and x.size == 1600
    # 16-bit quantization: correlation with the source stays ~1
    assert np.corrcoef(x, tone)[0, 1] > 0.9999
    assert codecs.decode_wav(b"RIFX" + payload[4:]) is None


def test_decode_images_real_png_through_spark(spark):
    """A REAL PNG payload must yield pixel-derived dims and features
    (not the digest fallback), alongside fallback rows in one batch."""
    import numpy as np

    from puregraphdb_spark.functions import codecs

    px = _checker(12, 9, 3)
    real = codecs.encode_png(px)
    fake = b"\xde\xad\xbe\xef" * 8
    df = spark.createDataFrame(
        [
            (1, "image", "image/png", bytearray(real), 999, 999, None),
            (2, "image", "image/x-fake", bytearray(fake), 10, 8, None),
        ],
        mm.ASSET_SCHEMA,
    )
    rows = {r["asset_id"]: r for r in mm.decode_images(df, 8).collect()}
    # real PNG: dims come from the pixels, not the (wrong) metadata
    assert rows[1]["width"] == 9 and rows[1]["height"] == 12
    assert rows[1]["n_pixels"] == 108
    # checkerboard grayscale mean ≈ 0.5 in every block bucket
    assert all(abs(f - 0.5) < 0.2 for f in rows[1]["features"])
    # fallback row: metadata preserved, digest features
    assert rows[2]["width"] == 10 and rows[2]["n_pixels"] == 80


def test_extract_audio_features_real_wav(spark):
    import numpy as np

    from puregraphdb_spark.functions import codecs

    tone = np.sin(np.arange(3200) * 2 * np.pi * 440 / 16000)
    df = spark.createDataFrame(
        [(5, "audio", "audio/wav", bytearray(codecs.encode_wav(tone)),
          None, None, 200)],
        mm.ASSET_SCHEMA,
    )
    row = mm.extract_audio_features(df, feature_dim=4).collect()[0]
    assert row["n_samples"] == 3200
    # 440 Hz sine at 16 kHz: zcr ≈ 2*440/16000 = 0.055
    assert abs(row["zero_crossing_rate"] - 0.055) < 0.01
    # RMS of a full-scale sine ≈ 32767/sqrt(2)
    assert abs(row["rms_energy"] - 32767 / np.sqrt(2)) < 200


def test_resize_image_payloads_real(spark):
    import numpy as np

    from puregraphdb_spark.functions import codecs

    px = _checker(16, 16, 3)
    df = spark.createDataFrame(
        [(1, "image", "image/png", bytearray(codecs.encode_png(px)),
          16, 16, None),
         (2, "image", "image/x-fake", bytearray(b"zz" * 20), 7, 7, None)],
        mm.ASSET_SCHEMA,
    )
    rows = {r["asset_id"]: r
            for r in mm.resize_image_payloads(df, 4, 6).collect()}
    assert rows[1]["resized"] == "true"
    out = codecs.decode_png(bytes(rows[1]["payload"]))
    assert out.shape == (6, 4, 3)
    assert rows[2]["resized"] == "false" and rows[2]["width"] == 7


# ------------------------------------------------ payload dedup (r13)

def test_asset_payload_dedup_decisions(spark):
    rows = [
        (1, "image", "image/png", bytearray(b"aaa"), None, None, None),
        (2, "image", "image/png", bytearray(b"aaa"), None, None, None),
        (3, "image", "image/png", bytearray(b"bbb"), None, None, None),
        (4, "audio", "audio/wav", bytearray(b"aaa"), None, None, None),
        (5, "image", "image/png", None, None, None, None),  # missing
    ]
    df = spark.createDataFrame(rows, mm.ASSET_SCHEMA)
    out = {r["asset_id"]: r
           for r in mm.asset_payload_dedup(df).collect()}
    # (image, aaa) cluster: ids 1,2 — keeper is min id
    assert out[1]["cluster_size"] == 2 and out[1]["is_keeper"] == 1
    assert out[2]["cluster_size"] == 2 and out[2]["is_keeper"] == 0
    assert out[1]["payload_hash"] == out[2]["payload_hash"]
    # same bytes, different modality → SEPARATE cluster
    assert out[4]["cluster_size"] == 1 and out[4]["is_keeper"] == 1
    assert out[3]["cluster_size"] == 1 and out[3]["is_keeper"] == 1
    # missing payload: not dedupable — never a keeper of nothing
    assert out[5]["payload_hash"] is None
    assert out[5]["cluster_size"] == 0 and out[5]["is_keeper"] == 0


def test_asset_payload_dedup_call_door(spark):
    from puregraphdb_spark.engine import Engine
    from tests.conftest import SF_DIR

    eng = Engine(spark, SF_DIR)
    spark.createDataFrame(
        [(1, "image", "image/png", bytearray(b"x"), None, None, None),
         (2, "image", "image/png", bytearray(b"x"), None, None, None)],
        mm.ASSET_SCHEMA).createOrReplaceTempView("apd_assets")
    out = {r["asset_id"]: r for r in eng.sql(
        "CALL asset_payload_dedup(assets => 'apd_assets')").collect()}
    assert out[1]["is_keeper"] == 1 and out[2]["is_keeper"] == 0


# -------------------------------------------- image near-dup (r13)

def test_png_manifest_real_roundtrip(spark):
    from puregraphdb_spark.functions import codecs

    docs = spark.createDataFrame([(i,) for i in range(10)],
                                 "doc_id long")
    assets = mm.png_manifest(docs).collect()
    assert len(assets) == 10
    px = codecs.decode_png(bytes(assets[0]["payload"]))
    assert px.shape == (8, 8, 3)  # REAL PNGs, not digest fakes


def test_image_near_dup_finds_intra_pattern_pairs_only(spark):
    # 85 distinct (pattern, perturb) images; intra-pattern cosine
    # ≥ 0.998, cross-pattern ≤ 0.95 (measured) — 0.995 separates.
    docs = spark.createDataFrame([(i,) for i in range(85)],
                                 "doc_id long")
    pairs = mm.image_near_dup_pairs(mm.png_manifest(docs),
                                    threshold=0.995,
                                    num_planes=0).collect()
    assert pairs, "near-duplicates must be found"
    assert all(p["a"] % 5 == p["b"] % 5 for p in pairs), \
        "cross-pattern images are NOT near-duplicates"
    # every image distinct here → exact-collapse keeps them all
    assert all(p["a_members"] == 1 and p["b_members"] == 1
               for p in pairs)


def test_image_near_dup_exact_collapse_carries_multiplicity(spark):
    # ids 0 and 85·k share (pattern, perturb) → byte-identical PNGs
    # collapse to ONE representative with n_members > 1.
    docs = spark.createDataFrame(
        [(0,), (85,), (170,), (1,)], "doc_id long")
    pairs = mm.image_near_dup_pairs(mm.png_manifest(docs),
                                    threshold=0.0,
                                    num_planes=0).collect()
    members = {}
    for p in pairs:
        members[p["a"]] = p["a_members"]
        members[p["b"]] = p["b_members"]
    assert members[0] == 3  # 0, 85, 170 collapsed, rep = min id
    assert members[1] == 1
    assert 85 not in members and 170 not in members
