"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode/feature-extraction as Arrow-batched Pandas UDFs.

Decode support is tiered by what pure numpy can do:

- **ppm** (binary P6) and **bmp** (uncompressed 24-bit BI_RGB) decode
  FOR REAL — header parse + numpy reshape, both formats are public
  fixed-layout specs — returning H×W×3 uint8 RGB arrays, and
  ``resize_pixels`` runs a real nearest-neighbor resample over them.
- compressed formats (png/jpeg/wav/mp4…) need a codec library (PIL/
  ffmpeg) that this container doesn't have: they raise
  NotImplementedError with a clear message. Swapping those arms of
  ``_decode_payload`` for a PIL call is the only change needed on a
  real cluster.
- the ``fake`` format decodes deterministically (payload bytes as the
  sample array) so plumbing tests don't depend on any codec.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media table schema: payload is opaque bytes; meta is typed
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("format", StringType(), False),  # fake|png|jpeg|wav|mp4...
        StructField("payload", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("feature_hash", StringType()),
    ]
)


def synthesize_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media rows for exercising the pipeline."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
        meta = (64 + i % 32, 48 + i % 24, 1000 * (1 + i % 30))
        rows.append((i, kind, "fake", bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def encode_ppm(img: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB → binary PPM (P6). Inverse of the ppm decode."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_ppm expects an H×W×3 array")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB → uncompressed 24-bit BI_RGB BMP (bottom-up,
    BGR, rows padded to 4 bytes) — the layout ``_decode_bmp`` reads."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp expects an H×W×3 array")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    data_off = 14 + 40
    header = (
        b"BM"
        + (data_off + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


def synthesize_images(spark: SparkSession, n: int = 24) -> DataFrame:
    """Deterministic REAL image rows (alternating ppm/bmp payloads of
    gradient patterns) in the canonical media schema — every payload
    decodes through the pure-numpy arms."""
    rows = []
    for i in range(n):
        w, h = 8 + (i * 5) % 41, 6 + (i * 7) % 29
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                (xx * 255 // max(w - 1, 1)).astype(np.uint8),
                (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                np.full((h, w), i * 11 % 256, dtype=np.uint8),
            ],
            axis=2,
        )
        fmt = "ppm" if i % 2 == 0 else "bmp"
        payload = encode_ppm(img) if fmt == "ppm" else encode_bmp(img)
        rows.append((i, "image", fmt, bytearray(payload), (w, h, None)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6): magic, then whitespace/comment-separated
    width/height/maxval tokens, one whitespace byte, then w*h*3 RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (8-bit only)")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP: little-endian headers (pixel
    offset at byte 10, width/height at 18/22, bpp at 28, compression
    at 30), rows padded to 4 bytes, stored BGR and (for positive
    height) bottom-up — returned as H×W×3 RGB top-down."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")

    def _i32(off: int) -> int:
        return int.from_bytes(payload[off : off + 4], "little", signed=True)

    data_off = _i32(10)
    w, h = _i32(18), _i32(22)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = _i32(30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP decode supports uncompressed 24-bit only (got bpp={bpp},"
            f" compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[..., ::-1]  # BGR → RGB


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(frames,) or (frames, channels) int16 PCM → RIFF/WAVE bytes —
    the layout ``_decode_wav`` reads."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    frames, channels = s.shape
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt_chunk = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    data_chunk = b"data" + len(data).to_bytes(4, "little") + data
    body = b"WAVE" + fmt_chunk + data_chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/WAVE with 16-bit integer PCM (format tag 1): walk the
    even-padded chunk list for fmt/data, return (frames, channels)
    int16. Compressed or float WAVs stay stubbed."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if tag != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV decode supports 16-bit integer PCM only (got format"
            f" tag={tag}, bits={bits})"
        )
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, channels)


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n, H, W, 3) uint8 RGB → YUV4MPEG2 (C444 planar) — the layout
    ``_decode_y4m`` reads. C444 keeps the round-trip exact (no chroma
    subsampling loss); BT.601 full-range conversion."""
    f = np.asarray(frames, dtype=np.float64)
    n, h, w = f.shape[:3]
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 128.0 + (b - y) * 0.564
    v = 128.0 + (r - y) * 0.713
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for i in range(n):
        out.append(b"FRAME\n")
        for plane in (y[i], u[i], v[i]):
            out.append(np.clip(plane.round(), 0, 255).astype(np.uint8).tobytes())
    return b"".join(out)


def _decode_y4m(payload: bytes) -> np.ndarray:
    """YUV4MPEG2 (C444 or C420) → (frames, H, W, 3) uint8 RGB. Stream
    header tokens are space-separated (W/H required); each frame is a
    FRAME line + planar YUV. 4:2:0 chroma upsamples by pixel-doubling;
    BT.601 full-range inverse."""
    nl = payload.index(b"\n")
    header = payload[:nl].split(b" ")
    if header[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    colorspace = b"C420"
    for tok in header[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            colorspace = tok
    if w is None or h is None:
        raise ValueError("YUV4MPEG2 header missing W/H")
    if colorspace.startswith(b"C444"):
        subsampled = False
    elif colorspace.startswith(b"C420"):
        subsampled = True
    else:
        raise NotImplementedError(
            f"y4m colorspace {colorspace!r} unsupported (C444/C420 only)"
        )
    luma = w * h
    chroma = (w // 2) * (h // 2) if subsampled else luma
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed y4m FRAME marker")
        pos = fnl + 1
        y = np.frombuffer(payload, np.uint8, luma, pos).reshape(h, w)
        u = np.frombuffer(payload, np.uint8, chroma, pos + luma)
        v = np.frombuffer(payload, np.uint8, chroma, pos + luma + chroma)
        pos += luma + 2 * chroma
        if subsampled:
            u = u.reshape(h // 2, w // 2).repeat(2, 0).repeat(2, 1)
            v = v.reshape(h // 2, w // 2).repeat(2, 0).repeat(2, 1)
        else:
            u, v = u.reshape(h, w), v.reshape(h, w)
        yf, uf, vf = y.astype(np.float64), u.astype(np.float64) - 128.0, v.astype(np.float64) - 128.0
        rgb = np.stack(
            [yf + 1.403 * vf, yf - 0.344 * uf - 0.714 * vf, yf + 1.773 * uf],
            axis=2,
        )
        frames.append(np.clip(rgb.round(), 0, 255).astype(np.uint8))
    return np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8)


def extract_frames(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame extraction for y4m rows: decode → take every
    ``every_n``-th frame → re-encode each as PPM. Arrow-batched
    mapInPandas; non-y4m rows are filtered before the Python stage."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("payload", BinaryType()),  # PPM frame
        ]
    )
    decodable = df.filter(F.col("format") == "y4m")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = _decode_y4m(bytes(payload))
                for idx in range(0, len(frames), every_n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["payload"].append(encode_ppm(frames[idx]))
            yield pd.DataFrame(out)

    return decodable.mapInPandas(run, schema=schema)


def _decode_payload(fmt: str, payload: bytes) -> np.ndarray:
    """Byte→sample decode. ppm/bmp images, PCM wav audio, and y4m
    video decode for real (pure numpy — public fixed layouts);
    compressed codecs are unavailable in this environment."""
    if fmt == "fake":
        return np.frombuffer(payload, dtype=np.uint8)
    if fmt == "ppm":
        return _decode_ppm(bytes(payload))
    if fmt == "bmp":
        return _decode_bmp(bytes(payload))
    if fmt == "wav":
        return _decode_wav(bytes(payload))
    if fmt == "y4m":
        return _decode_y4m(bytes(payload))
    raise NotImplementedError(
        f"decode for format {fmt!r} requires an image/audio codec library "
        "(PIL/ffmpeg) not present in this environment; plug it into "
        "_decode_payload on a real cluster"
    )


def _resample_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample of an H×W×3 array to th×tw×3."""
    h, w = img.shape[:2]
    iy = (np.arange(th) * h) // th
    ix = (np.arange(tw) * w) // tw
    return img[iy][:, ix]


def extract_features(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches, one python
    worker per partition — scales with executor count, no driver path).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [
                _decode_payload(fmt, bytes(p))
                for fmt, p in zip(pdf["format"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    # decoded SAMPLE count (pixels×channels for images)
                    "n_bytes": [int(a.size) for a in arrs],
                    "mean_byte": [float(a.mean()) if a.size else 0.0 for a in arrs],
                    "feature_hash": [
                        hashlib.md5(a.tobytes()).hexdigest() for a in arrs
                    ],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Sampled frame timeline for video rows — pure built-ins (sequence
    + explode), no decode required; the downstream decode of individual
    frames would go through extract_features."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),  # re-encoded PPM
    ]
)


def resize_pixels(df: DataFrame, max_side: int = 32) -> DataFrame:
    """REAL pixel resample for decodable image formats (ppm/bmp):
    decode → aspect-preserving nearest-neighbor downscale to
    ``max_side`` → re-encode as PPM. Arrow-batched mapInPandas, one
    Python worker per partition — the same executor-parallel shape a
    PIL-backed resize would use on a real cluster; only the
    per-payload decode arm differs. Rows whose format has no pure-
    numpy decoder are dropped (filtered BEFORE the Python stage so
    undecodable payloads never cross Arrow)."""

    decodable = df.filter(F.col("format").isin("ppm", "bmp"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "payload": []}
            for mid, fmt, payload in zip(
                pdf["media_id"], pdf["format"], pdf["payload"]
            ):
                img = _decode_payload(fmt, bytes(payload))
                h, w = img.shape[:2]
                scale = min(max_side / w, max_side / h, 1.0)
                tw, th = max(int(w * scale), 1), max(int(h * scale), 1)
                resized = _resample_nearest(img, tw, th)
                out["media_id"].append(mid)
                out["width"].append(tw)
                out["height"].append(th)
                out["payload"].append(encode_ppm(resized))
            yield pd.DataFrame(out)

    return decodable.mapInPandas(run, schema=RESIZED_SCHEMA)


def resize_meta(df: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning as metadata arithmetic (aspect-preserving target
    dims); the pixel resample itself is part of the stubbed decode."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return df.select(
        "media_id",
        "kind",
        w.alias("width"),
        h.alias("height"),
        F.greatest(F.floor(w * scale), F.lit(1)).cast("int").alias("target_width"),
        F.greatest(F.floor(h * scale), F.lit(1)).cast("int").alias("target_height"),
    )
