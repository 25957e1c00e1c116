"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (driver brief). The Spark-side plumbing — schemas, Arrow batch
flow through mapInPandas, partitioning — is real and tested. The codec
seam now carries REAL decoders for the formats stdlib+numpy can parse
from first principles (PNG via zlib + scanline-filter reconstruction,
WAV via RIFF/PCM — functions/codecs.py); payloads in any other format
fall back to the deterministic digest transform, clearly marked, so a
deployment only swaps the fallback for Pillow/ffmpeg without touching
any Spark code.

Scale posture: decode/feature-extraction is a pure map — mapInPandas
streams Arrow batches through one Python worker per core with zero
shuffles; ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
per-batch memory for fat binary columns. Repartition upstream only to
even out file skew.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

#: Canonical multimodal asset schema: opaque payload + typed metadata.
ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("modality", StringType(), False),   # image | audio | video
    StructField("media_type", StringType(), True),  # e.g. image/png
    StructField("payload", BinaryType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
])

DECODED_IMAGE_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_pixels", LongType(), True),
    StructField("features", ArrayType(FloatType()), True),
])

FRAME_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("frame_index", IntegerType(), False),
    StructField("ts_ms", LongType(), False),
    StructField("frame_payload", BinaryType(), True),
])


def _decode_image_bytes(payload: bytes, dim: int = 16) -> list[float]:
    """CODEC SEAM fallback — deterministic feature vector derived from
    the payload digest, for formats the built-in decoder can't parse
    (i.e. anything but PNG). Replace with Pillow in deployments; the
    Spark plumbing around it is unchanged. Raises on None to mirror
    real decoder behavior."""
    if payload is None:
        raise NotImplementedError("no payload: nothing to decode")
    digest = hashlib.sha256(payload).digest()
    return [digest[i % len(digest)] / 255.0 for i in range(dim)]


def _pixel_features(px, dim: int) -> list[float]:
    """Block-mean grayscale envelope of a decoded (h, w, ch) uint8
    array at fixed dim — a real, content-sensitive image feature."""
    import numpy as np

    g = px.astype("float32").mean(axis=2).ravel() / 255.0
    pad = (-g.size) % dim
    env = np.pad(g, (0, pad)).reshape(dim, -1).mean(axis=1)
    return env.astype("float32").tolist()


def decode_images(assets: DataFrame, feature_dim: int = 16) -> DataFrame:
    """Decode image assets into feature vectors via mapInPandas (Arrow
    batches, one Python worker per task — the sanctioned slow path for
    work the JVM can't express).

    PNG payloads are REALLY decoded (functions/codecs.decode_png:
    zlib + filter reconstruction) — width/height/n_pixels come from
    the pixel data itself and features are pixel statistics; non-PNG
    payloads keep the declared metadata and the digest fallback."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from puregraphdb_spark.functions.codecs import decode_png

        for pdf in batches:
            widths, heights, npix, feats = [], [], [], []
            for p, w0, h0 in zip(pdf["payload"], pdf["width"],
                                 pdf["height"]):
                px = None
                if p is not None:
                    try:
                        px = decode_png(p)
                    except ValueError:
                        px = None  # corrupt/unsupported → fallback
                if px is not None:
                    h, w = px.shape[:2]
                    widths.append(w)
                    heights.append(h)
                    npix.append(w * h)
                    feats.append(_pixel_features(px, feature_dim))
                else:
                    widths.append(None if pd.isna(w0) else int(w0))
                    heights.append(None if pd.isna(h0) else int(h0))
                    npix.append(
                        None if (pd.isna(w0) or pd.isna(h0))
                        else int(w0) * int(h0)
                    )
                    feats.append(
                        _decode_image_bytes(p, feature_dim)
                        if p is not None else None
                    )
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "width": pd.array(widths, dtype="Int32"),
                "height": pd.array(heights, dtype="Int32"),
                "n_pixels": pd.array(npix, dtype="Int64"),
                "features": feats,
            })

    return (
        assets.filter(F.col("modality") == "image")
        .select("asset_id", "payload", "width", "height")
        .mapInPandas(decode, DECODED_IMAGE_SCHEMA)
    )


def sample_frames(assets: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8) -> DataFrame:
    """Frame-sampling plan for video assets: one output row per sampled
    timestamp. Frame extraction itself is the codec seam (payload is
    a deterministic slice here); the explode/partitioning shape is the
    real pipeline's."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # vectorized explode: frames-per-row n, then a repeated row
            # index + per-row frame counter (arange minus each row's
            # offset) — no per-row Python iteration for the metadata.
            dur = pd.to_numeric(pdf["duration_ms"], errors="coerce") \
                .fillna(0).astype("int64").to_numpy()
            n = np.minimum(max_frames, np.maximum(dur // every_ms, 0))
            idx = np.repeat(np.arange(len(pdf)), n)
            fi = (
                np.arange(int(n.sum()), dtype="int64")
                - np.repeat(np.cumsum(n) - n, n)
            )
            # the byte slice is the codec seam (a real decoder replaces
            # it); binary payloads are Python objects, so this one
            # comprehension over OUTPUT rows is irreducible here.
            payloads = pdf["payload"].to_numpy(dtype=object)
            frame_payloads = [
                bytes(payloads[r][i: i + 16])
                if payloads[r] is not None else None
                for r, i in zip(idx.tolist(), fi.tolist())
            ]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"].to_numpy()[idx],
                "frame_index": fi.astype("int32"),
                "ts_ms": fi * every_ms,
                "frame_payload": frame_payloads,
            })

    return (
        assets.filter(F.col("modality") == "video")
        .select("asset_id", "payload", "duration_ms")
        .mapInPandas(sample, FRAME_SCHEMA)
    )


AUDIO_FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("n_samples", LongType(), True),
    StructField("rms_energy", FloatType(), True),
    StructField("zero_crossing_rate", FloatType(), True),
    StructField("features", ArrayType(FloatType()), True),
])


def extract_audio_features(assets: DataFrame, feature_dim: int = 16) -> DataFrame:
    """Audio feature extraction over opaque payloads via mapInPandas.

    RIFF/WAVE payloads are REALLY decoded (functions/codecs.decode_wav:
    stdlib wave → PCM, multi-channel downmixed); other payloads fall
    back to interpreting raw bytes as int8 samples (the documented
    seam a deployment replaces with ffmpeg/soundfile). Per-asset
    features: RMS energy, zero-crossing rate, and a fixed-dim
    block-mean envelope — all numpy-vectorized per payload, no Python
    inner loops. Pure map, zero shuffles.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        from wave import Error as wave_error

        from puregraphdb_spark.functions.codecs import decode_wav

        def feats(payload):
            if payload is None or len(payload) == 0:
                return None, None, None, None
            decoded = None
            try:
                decoded = decode_wav(payload)
            except (ValueError, EOFError, wave_error):
                decoded = None  # malformed RIFF → fallback
            if decoded is not None:
                x = decoded[0]
            else:
                # CODEC SEAM fallback: raw bytes as int8 samples.
                x = np.frombuffer(payload, dtype=np.int8).astype(np.float32)
            n = x.size
            rms = float(np.sqrt(np.mean(x * x)))
            zcr = float(np.count_nonzero(np.diff(np.signbit(x))) / max(n - 1, 1))
            # block-mean envelope at fixed dim (pad to a multiple)
            pad = (-n) % feature_dim
            env = np.pad(np.abs(x), (0, pad)).reshape(feature_dim, -1).mean(axis=1)
            return n, rms, zcr, env.astype(np.float32).tolist()

        for pdf in batches:
            cols = [feats(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "n_samples": pd.array([c[0] for c in cols], dtype="Int64"),
                "rms_energy": [c[1] for c in cols],
                "zero_crossing_rate": [c[2] for c in cols],
                "features": [c[3] for c in cols],
            })

    return (
        assets.filter(F.col("modality") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(extract, AUDIO_FEATURE_SCHEMA)
    )


def resize_image_payloads(assets: DataFrame, width: int,
                          height: int) -> DataFrame:
    """REAL pixel resample for PNG payloads: decode → nearest-neighbor
    resample → re-encode, inside the same mapInPandas seam (pure map,
    zero shuffles). Non-PNG payloads pass through unchanged with
    resized=false, so the operator is safe on mixed-format corpora.
    Returns (asset_id, payload, width, height, resized)."""
    out_schema = StructType([
        StructField("asset_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("resized", StringType(), False),  # 'true' | 'false'
    ])

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from puregraphdb_spark.functions.codecs import (
            decode_png, encode_png, resize_nearest,
        )

        for pdf in batches:
            payloads, ws, hs, done = [], [], [], []
            for p, w0, h0 in zip(pdf["payload"], pdf["width"],
                                 pdf["height"]):
                px = None
                if p is not None:
                    try:
                        px = decode_png(p)
                    except ValueError:
                        px = None
                if px is not None:
                    payloads.append(
                        encode_png(resize_nearest(px, width, height))
                    )
                    ws.append(width)
                    hs.append(height)
                    done.append("true")
                else:
                    payloads.append(p)
                    ws.append(None if pd.isna(w0) else int(w0))
                    hs.append(None if pd.isna(h0) else int(h0))
                    done.append("false")
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "payload": payloads,
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "resized": done,
            })

    return (
        assets.filter(F.col("modality") == "image")
        .select("asset_id", "payload", "width", "height")
        .mapInPandas(resize, out_schema)
    )


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plan: metadata math JVM-side; the pixel resample is
    resize_image_payloads (payload passed through here)."""
    return (
        assets.filter(F.col("modality") == "image")
        .withColumn("target_width", F.lit(width))
        .withColumn("target_height", F.lit(height))
        .withColumn(
            "scale",
            F.round(F.least(
                F.lit(width) / F.greatest("width", F.lit(1)),
                F.lit(height) / F.greatest("height", F.lit(1)),
            ), 6),
        )
    )


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic in-memory asset table for tests/demos (the
    container ships no media fixtures)."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        payload = bytes(hashlib.sha256(str(i).encode()).digest() * 4)
        rows.append((
            i, modality, f"{modality}/x-fake", payload,
            32 + i % 8 if modality == "image" else None,
            24 + i % 8 if modality == "image" else None,
            (i % 7) * 1500 if modality != "image" else None,
        ))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def asset_profile(assets: DataFrame,
                  modality_col: str = "modality",
                  type_col: str = "media_type",
                  payload_col: str = "payload") -> DataFrame:
    """Per-(modality, media type) asset inventory — the profile a
    multimodal ingest runs BEFORE any decode pass: asset and byte
    volumes (what the decode fleet will cost), exact distinct payload
    count via md5 over the raw bytes (exact-dup rate per container —
    re-crawled images/clips are the cheapest multimodal dedup win),
    and missing-payload counts (manifest rows whose bytes never
    landed). Everything is exact bigints on the opaque BINARY column;
    no decode, no Python — this is the rare multimodal operator that
    is pure JVM expression, and therefore the family's ORACLED member
    (q168; the decode/feature ops stay suite-tested behind the codec
    seam by design).

    Scale: md5 + byte length are map-side projections; ONE shuffle to
    the (modality, type, md5) grain with map-side combine, then a
    tiny-key rollup. Payload bytes never move twice.
    """
    from puregraphdb_spark.functions.numeric import decimal_round

    per_payload = (
        assets.select(
            F.col(modality_col).alias("modality"),
            F.col(type_col).alias("media_type"),
            F.md5(F.col(payload_col)).alias("h"),  # null stays null
            F.coalesce(F.length(F.col(payload_col)),
                       F.lit(0)).cast("long").alias("nb"),
        )
        .groupBy("modality", "media_type", "h")
        .agg(F.count("*").cast("long").alias("c"),
             F.sum("nb").cast("long").alias("b"))
    )
    return (
        per_payload.groupBy("modality", "media_type")
        .agg(
            F.sum("c").cast("long").alias("n_assets"),
            F.sum("b").cast("long").alias("total_bytes"),
            F.sum(F.when(F.col("h").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_distinct_payloads"),
            F.sum(F.when(F.col("h").isNull(), F.col("c")).otherwise(0))
            .cast("long").alias("n_missing"),
            (F.sum(F.when(F.col("h").isNotNull(), F.col("c"))
                   .otherwise(0))
             - F.sum(F.when(F.col("h").isNotNull(), 1).otherwise(0)))
            .cast("long").alias("n_removable"),
        )
        .select(
            "modality", "media_type", "n_assets", "total_bytes",
            "n_distinct_payloads", "n_missing", "n_removable",
            decimal_round(
                F.col("n_removable").cast("double")
                / F.col("n_assets").cast("double"), 6, grid=10,
            ).alias("dup_ratio"),
        )
    )


def _doc_asset_manifest(spark, sf_dir: str) -> DataFrame:
    """Deterministic multimodal manifest synthesized from documents —
    the SHARED input of the oracled multimodal entries (q168, q170):
    binary payload = UTF-8 bytes of text (identical bytes on both
    engines, so Spark's md5(binary) equals DuckDB's md5(varchar)
    which hashes UTF-8; DuckDB 1.0 has no md5(BLOB), found at the
    q168 gate). Plants: %13 docs lose their payload (missing bytes),
    %37 docs share one of three boilerplate payloads (exact-dup
    clusters), modality and media type derive from doc_id
    arithmetic. Single-sourced so the two oracles can never drift."""
    from puregraphdb_spark.sources.registry import load_table

    i = F.col("doc_id")
    return load_table(spark, sf_dir, "documents").select(
        i.alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (i % 3 + 1).cast("int")).alias("modality"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"),
                    F.lit("video/mp4")),
            (i % 3 + 1).cast("int")).alias("media_type"),
        F.when(i % 13 == 0, F.lit(None).cast("string"))
        .when(i % 37 == 0,
              F.concat(F.lit("shared-asset-"),
                       (i % 3).cast("string")))
        .otherwise(F.col("text")).cast("binary").alias("payload"),
    )


def q168_asset_profile(spark, sf_dir: str) -> DataFrame:
    """ORACLED multimodal asset inventory (see ``asset_profile``) over
    the shared synthesized manifest (``_doc_asset_manifest``)."""
    from puregraphdb_spark.sources.registry import final_sort

    return final_sort(
        asset_profile(_doc_asset_manifest(spark, sf_dir)),
        spark, sf_dir, "documents", "modality", "media_type")


def asset_payload_dedup(assets: DataFrame,
                        id_col: str = "asset_id",
                        modality_col: str = "modality",
                        payload_col: str = "payload") -> DataFrame:
    """Per-modality exact payload dedup decisions — the q77
    content-hash discipline lifted to the opaque BINARY column: every
    asset annotated with its payload md5, its (modality, hash)
    cluster size, and the keeper decision (min asset id per cluster).
    Assets with a MISSING payload are not dedupable: they get a NULL
    hash, cluster_size 0 and is_keeper 0 (grouping them into one
    "cluster" would crown an arbitrary keeper of nothing).

    This is the decision table q168's inventory summarizes
    (n_removable = Σ per-cluster (size-1)); downstream joins fan the
    keeper's payload back to the absorbed duplicates.

    Scale: md5 is a map-side projection over bytes that never move
    twice; ONE shuffle on the (modality, hash) window key — md5 keys
    are uniform, no skew by construction. Pure JVM (the multimodal
    family's second oracled member).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(modality_col, "payload_hash")
    ann = assets.select(
        F.col(id_col), F.col(modality_col),
        F.md5(F.col(payload_col)).alias("payload_hash"),
    )
    has = F.col("payload_hash").isNotNull()
    return ann.select(
        id_col, modality_col, "payload_hash",
        F.when(has, F.count("*").over(w)).otherwise(0)
        .cast("long").alias("cluster_size"),
        F.when(has & (F.col(id_col) == F.min(id_col).over(w)), 1)
        .otherwise(0).cast("long").alias("is_keeper"),
    )


def q170_payload_dedup(spark, sf_dir: str) -> DataFrame:
    """ORACLED per-modality payload dedup decisions (see
    ``asset_payload_dedup``) over the shared synthesized manifest —
    the %37 boilerplate plant produces real multi-member clusters and
    the %13 missing-payload plant exercises the not-dedupable rule."""
    from puregraphdb_spark.sources.registry import final_sort

    return final_sort(
        asset_payload_dedup(_doc_asset_manifest(spark, sf_dir)),
        spark, sf_dir, "documents", "asset_id")


def image_near_dup_pairs(assets: DataFrame, threshold: float = 0.92,
                         feature_dim: int = 16, num_planes: int = 8,
                         seed: int = 7) -> DataFrame:
    """Image near-duplicate pairs: decode → block-mean grayscale
    features → EXACT-collapse identical feature vectors → hyperplane
    LSH near-dup pairs over the distinct representatives.

    The exact-collapse stage (md5 of the feature array, keeper = min
    asset id) is load-bearing at scale: re-crawled byte-identical and
    pixel-identical images otherwise form Θ(k²) intra-cluster pairs
    in the LSH buckets — the lineage-dedup sweep discipline applied
    to pixels. The pair join then runs over DISTINCT images only,
    with cluster sizes carried so a_members·b_members recovers the
    full pair multiplicity.

    Rows-only by design: the PNG decode (functions/codecs.decode_png)
    and xxhash-free but float-formatted feature signature have no
    DuckDB twin. Scale: decode is mapInPandas (Arrow, zero shuffle);
    collapse is ONE uniform-hash shuffle; the LSH bucket join is the
    embedding_near_dup_pairs core (similarity.py) on dim=feature_dim.
    """
    from puregraphdb_spark.operators.similarity import (
        embedding_near_dup_pairs)

    feats = decode_images(assets, feature_dim)
    sig = feats.filter(F.col("features").isNotNull()).select(
        "asset_id",
        F.col("features").cast("array<double>").alias("features"),
    ).select(
        "asset_id", "features",
        F.md5(F.to_json(F.col("features"))).alias("sig"),
    )
    reps = (
        sig.groupBy("sig")
        .agg(F.min("asset_id").alias("rep_id"),
             F.count("*").cast("long").alias("n_members"),
             F.first("features").alias("features"))
    )
    pairs = embedding_near_dup_pairs(
        reps, threshold=threshold, dim=feature_dim,
        num_planes=num_planes, seed=seed,
        id_col="rep_id", emb_col="features",
    )
    na = reps.select(F.col("rep_id").alias("a"),
                     F.col("n_members").alias("a_members"))
    nb = reps.select(F.col("rep_id").alias("b"),
                     F.col("n_members").alias("b_members"))
    return (
        pairs.join(na, "a").join(nb, "b")
        .select("a", "b", "cos_sim", "a_members", "b_members")
    )


#: 8×8 base patterns for the deterministic PNG manifest (one per
#: pattern class); perturbation index shifts one channel of one pixel
#: so images within a class are NEAR-duplicates, not exact ones.
_PNG_PATTERNS = 5
_PNG_PERTURBS = 17


def _png_pixels(pattern: int, perturb: int):
    """Deterministic 8×8 RGB uint8 image for (pattern, perturb)."""
    import numpy as np

    idx = np.arange(64, dtype=np.int64).reshape(8, 8)
    px = np.stack([
        (pattern * 40 + idx * 3) % 256,
        (pattern * 80 + idx * 7) % 256,
        (pattern * 160 + idx * 11) % 256,
    ], axis=2).astype(np.uint8)
    r, c = perturb % 8, (perturb * 3) % 8
    px[r, c, 2] = (int(px[r, c, 2]) + 16 + perturb) % 256
    return px


def png_manifest(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-PNG asset table derived from doc ids: each
    doc becomes an 8×8 RGB PNG whose pixels are a pure function of
    (doc_id % patterns, doc_id % perturbs) — so the DISTINCT image
    count is bounded at patterns·perturbs regardless of corpus size,
    images within a pattern class are near-duplicates (one perturbed
    pixel), and across classes they are far apart. Encoded with the
    in-repo codec (functions/codecs.encode_png), decoded back by
    decode_images — the full plumbing is real.

    Scale: pure mapInPandas over doc ids (Arrow batches, zero
    shuffles); payload bytes are born distributed, never collected.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from puregraphdb_spark.functions.codecs import encode_png

        cache: dict[tuple[int, int], bytes] = {}
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                key = (int(i) % _PNG_PATTERNS, int(i) % _PNG_PERTURBS)
                if key not in cache:
                    cache[key] = encode_png(_png_pixels(*key))
                payloads.append(cache[key])
            yield pd.DataFrame({
                "asset_id": pdf["doc_id"],
                "modality": "image",
                "media_type": "image/png",
                "payload": payloads,
                "width": pd.array([8] * len(pdf), dtype="Int32"),
                "height": pd.array([8] * len(pdf), dtype="Int32"),
                "duration_ms": pd.array([None] * len(pdf),
                                        dtype="Int64"),
            })

    return docs.select("doc_id").mapInPandas(gen, ASSET_SCHEMA)


def image_near_dup(spark, sf_dir: str) -> DataFrame:
    """Rows-only image near-dup entry: REAL 8×8 PNGs (one per doc,
    ``png_manifest``) are encoded AND decoded by the in-repo codec,
    block-mean features extracted, exact-duplicate images collapsed,
    and near-dup pairs found via the hyperplane-LSH core — the whole
    image pipeline end-to-end with zero fake seams. The %4 doc sample
    bounds the Python decode fleet; the distinct-image bound
    (patterns·perturbs = 85) keeps the pair relation tiny at every
    scale while the per-class perturbation makes the found pairs
    REAL near-duplicates, not exact ones."""
    from puregraphdb_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 0)
    return (
        image_near_dup_pairs(png_manifest(docs), threshold=0.995)
        .orderBy("a", "b")
    )
