"""Real media codecs for the multimodal seam — stdlib + numpy only
(this container ships no Pillow/ffmpeg; PNG is zlib-compressed filtered
scanlines and WAV is RIFF-framed PCM, both decodable from first
principles, so the codec seam gets REAL decoders for those formats and
keeps the deterministic fallback for everything else).

Scope (documented, tested):
- PNG: 8-bit greyscale/RGB/RGBA (+alpha-less palette excluded),
  non-interlaced — the overwhelmingly common case; all five scanline
  filters (None/Sub/Up/Average/Paeth) are implemented per the spec.
- WAV: integer PCM (8/16/32-bit), any channel count (downmixed by
  mean).
Both run inside mapInPandas batches: per-payload numpy work, no Spark
coupling, no network, no temp files.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # grey, RGB, grey+A, RGBA


def decode_png(payload: bytes) -> np.ndarray | None:
    """Decode a PNG payload to an (h, w, channels) uint8 array.

    Returns None when the payload is not a PNG (callers fall back to
    the synthetic path); raises ValueError for PNGs outside the
    supported profile (non-8-bit, interlaced, palette)."""
    if payload is None or len(payload) < 8 or payload[:8] != PNG_MAGIC:
        return None
    pos, idat = 8, []
    w = h = None
    color_type = bit_depth = interlace = 0
    while pos + 8 <= len(payload):
        (length,), ctype = (
            struct.unpack(">I", payload[pos:pos + 4]),
            payload[pos + 4:pos + 8],
        )
        chunk = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if w is None:
        raise ValueError("PNG without IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG profile (depth={bit_depth}, "
            f"color={color_type}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).copy()
        if f == 0:  # None
            pass
        elif f == 2:  # Up (uint8 wraparound == mod-256 per spec)
            line += prev
        elif f == 1:  # Sub — sequential left dependency
            li = line.astype(np.int32)
            for x in range(ch, stride):
                li[x] = (li[x] + li[x - ch]) & 0xFF
            line = li.astype(np.uint8)
        elif f == 3:  # Average
            li = line.astype(np.int32)
            pi = prev.astype(np.int32)
            for x in range(stride):
                left = li[x - ch] if x >= ch else 0
                li[x] = (li[x] + ((left + pi[x]) >> 1)) & 0xFF
            line = li.astype(np.uint8)
        elif f == 4:  # Paeth
            li = line.astype(np.int32)
            pi = prev.astype(np.int32)
            for x in range(stride):
                a = li[x - ch] if x >= ch else 0
                b = pi[x]
                c = pi[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                li[x] = (li[x] + pred) & 0xFF
            line = li.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = line
        prev = out[y]
    return out.reshape(h, w, ch)


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, channels) uint8 array as a PNG (filter 0 on
    every scanline — spec-valid, decodable by any reader; used to
    produce real image fixtures in tests and as the resize sink)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pure index math."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Decode a RIFF/WAVE integer-PCM payload to (float32 mono samples,
    sample_rate). Returns None when the payload is not a WAV."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return None
    with wave.open(io.BytesIO(payload), "rb") as wf:
        ch = wf.getnchannels()
        sw = wf.getsampwidth()
        rate = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    if sw == 1:  # unsigned 8-bit per spec
        x = np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0
    elif sw == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32)
    elif sw == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode float/int samples as 16-bit mono PCM WAV (test fixtures)."""
    x = np.asarray(samples)
    if x.dtype.kind == "f":
        x = np.clip(x, -1.0, 1.0) * 32767.0
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(x.astype(np.int16).tobytes())
    return buf.getvalue()
