"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode/feature-extraction as Arrow-batched Pandas UDFs.

Decode support is tiered by what pure numpy can do:

- **ppm** (binary P6), **bmp** (uncompressed 24-bit BI_RGB), **png**
  (8/16-bit grey/RGB/grey-alpha/RGBA + palette 1/2/4/8 + Adam7
  interlace — stdlib zlib inflate + numpy unfilter), and **jpeg**
  (baseline/extended sequential AND progressive DCT incl. 4:2:0 and
  restart markers — functions/jpeg.py, pure numpy huffman + IDCT)
  decode FOR REAL, returning H×W×3 uint8 RGB, and ``resize_pixels``
  runs a real nearest-neighbor resample over them. **wav** (16-bit
  PCM and 32-bit IEEE float) and **y4m** (C444/C420) decode for real
  too.
- the remaining stubs are genuinely environmental: mp3/mp4 need a
  codec library (ffmpeg) this container doesn't have — they raise
  NotImplementedError with a clear message, and swapping those arms
  of ``_decode_payload`` for an ffmpeg call is the only change needed
  on a real cluster.
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
        # decoded SAMPLE count: pixels×channels for images,
        # frames×channels for audio/video (equals payload byte length
        # only for the 'fake' format, whose samples ARE the bytes)
        StructField("n_samples", LongType()),
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
    """Deterministic REAL image rows (cycling ppm/bmp/png payloads of
    gradient patterns) in the canonical media schema — every payload
    decodes through the pure-numpy arms."""
    encoders = [("ppm", encode_ppm), ("bmp", encode_bmp), ("png", encode_png)]
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
        fmt, enc = encoders[i % 3]
        rows.append((i, "image", fmt, bytearray(enc(img)), (w, h, None)))
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

    dib_size = _i32(14)
    if dib_size < 40:
        # BITMAPCOREHEADER (12-byte) lays out dims/bpp at different
        # offsets — reading them as BITMAPINFOHEADER would misparse
        raise NotImplementedError(
            f"BMP DIB header size {dib_size} unsupported (BITMAPINFOHEADER"
            " (>=40 bytes) only)"
        )
    data_off = _i32(10)
    w, h = _i32(18), _i32(22)
    if w <= 0 or h == 0 or data_off <= 0 or data_off > len(payload):
        raise ValueError(
            f"BMP header invalid (width={w}, height={h}, data offset={data_off})"
        )
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


def encode_png(img: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB → PNG (8-bit truecolor, filter 0 scanlines, one
    zlib IDAT) — a layout ``_decode_png`` reads. stdlib zlib only."""
    import struct
    import zlib

    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_png expects an H×W×3 array")
    h, w = img.shape[:2]
    px = np.ascontiguousarray(img, dtype=np.uint8)
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(h))

    def chunk(typ: bytes, body: bytes) -> bytes:
        c = typ + body
        return (
            len(body).to_bytes(4, "big")
            + c
            + (zlib.crc32(c) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


#: samples (channels) per pixel for the non-palette PNG color types
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters (spec §6: None/Sub/Up/
    Average/Paeth) over ``h`` scanlines of ``1 + stride`` bytes each.
    Filters 0–2 reconstruct vectorized; 3/4 depend on the in-scanline
    left neighbor, so they fall back to a per-byte loop on just the
    scanlines that use them (encoders emitting all-filter-0 — ours
    included — never hit the loop)."""
    lines = raw.reshape(h, 1 + stride)
    ftypes, data = lines[:, 0], lines[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        f = int(ftypes[r])
        cur = data[r]
        prior = out[r - 1] if r else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[r] = cur
        elif f == 1:  # Sub: cumulative sum per byte lane, mod 256
            lanes = cur.reshape(-1, bpp)
            out[r] = np.add.accumulate(lanes, axis=0, dtype=np.uint8).reshape(-1)
        elif f == 2:  # Up
            out[r] = cur + prior
        elif f in (3, 4):  # Average / Paeth: left-dependent, per byte
            line = out[r]
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                if f == 3:
                    line[x] = (int(cur[x]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(out[r - 1][x - bpp]) if (r and x >= bpp) else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG scanline filter {f} invalid (0-4)")
    return out


def _png_samples(
    rows: np.ndarray, w: int, depth: int, color_type: int, plte: bytes | None
) -> np.ndarray:
    """Unfiltered scanline BYTES (h, stride) → (h, w, 3) uint8 RGB:
    palette lookup (MSB-first sub-byte unpack, spec §7.2), 16-bit
    high-byte downshift (§7.1 big-endian sample order), grey/alpha
    channel normalization. Shared by the sequential and Adam7 paths —
    each interlace pass is its own little image of this exact shape."""
    h = rows.shape[0]
    if color_type == 3:
        if plte is None:
            raise ValueError("paletted PNG missing its PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if depth == 8:
            idx = rows[:, :w]
        else:
            bits = np.unpackbits(rows, axis=1)[:, : w * depth]
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
            idx = (bits.reshape(h, w, depth) * weights).sum(axis=2)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("PNG palette index out of range")
        return pal[idx]
    if depth == 16:
        px = rows.reshape(h, w, _PNG_CHANNELS[color_type], 2)[..., 0]
    else:
        px = rows.reshape(h, w, _PNG_CHANNELS[color_type])
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 2:
        return px
    if color_type == 4:  # grey + alpha → replicate grey, drop alpha
        return np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3]  # RGBA → drop alpha


#: Adam7 pass grid: (x0, y0, dx, dy) per pass (spec §8.2 starting_row/
#: starting_col/row_increment/col_increment)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _decode_png(payload: bytes) -> np.ndarray:
    """PNG → H×W×3 uint8 RGB, pure stdlib-zlib + numpy: signature +
    chunk walk (CRC-checked), IDAT concatenation, zlib inflate,
    per-scanline unfilter, then channel normalization (greyscale
    replicates to RGB, alpha is dropped). Covers 8- and 16-bit color
    types 0/2/4/6 (16-bit downshifts the big-endian high byte, spec
    §7.1 sample order), palette images (color type 3, PLTE lookup)
    at depths 1/2/4/8 (spec §7.2 MSB-first bit packing), and Adam7
    interlacing (§8.2: seven independently-filtered reduced images
    scattered onto the pass grid) — the full baseline a codec-less
    container can honour from the public spec."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload (bad signature)")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            if length % 3:
                raise ValueError("PNG PLTE length must be a multiple of 3")
            plte = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    paletted = color_type == 3
    supported = (
        (color_type in _PNG_CHANNELS and depth in (8, 16))
        or (paletted and depth in (1, 2, 4, 8))
    )
    if not supported or comp or filt or interlace not in (0, 1):
        raise NotImplementedError(
            f"PNG decode supports 8/16-bit color types"
            f" {sorted(_PNG_CHANNELS)} and 1/2/4/8-bit palette (type 3)"
            f" (got depth={depth}, color_type={color_type},"
            f" interlace={interlace})"
        )

    # filters operate on BYTES; bpp rounds up to one for sub-byte
    # depths (spec §9)
    def line_geom(width: int) -> tuple[int, int]:
        if paletted:
            return 1, (width * depth + 7) // 8
        b = _PNG_CHANNELS[color_type] * (depth // 8)
        return b, width * b

    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if not interlace:
        bpp, stride = line_geom(w)
        if raw.size != h * (1 + stride):
            raise ValueError(
                f"PNG pixel data is {raw.size} bytes, expected {h * (1 + stride)}"
            )
        rows = _png_unfilter(raw, h, stride, bpp)
        return _png_samples(rows, w, depth, color_type, plte)
    # Adam7: seven reduced images, each filtered INDEPENDENTLY (the
    # unfilter's prior row is the pass's own previous scanline),
    # scattered onto the (x0 + i*dx, y0 + j*dy) grid; empty passes
    # contribute zero bytes (spec §8.2)
    out = np.zeros((h, w, 3), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        bpp, stride = line_geom(wp)
        end = pos + hp * (1 + stride)
        if end > raw.size:
            raise ValueError("PNG interlaced pixel data truncated")
        rows = _png_unfilter(raw[pos:end], hp, stride, bpp)
        out[y0::dy, x0::dx] = _png_samples(rows, wp, depth, color_type, plte)
        pos = end
    if pos != raw.size:
        raise ValueError(
            f"PNG interlaced pixel data is {raw.size} bytes, expected {pos}"
        )
    return out


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(frames,) or (frames, channels) PCM → RIFF/WAVE bytes — the
    layouts ``_decode_wav`` reads. Float32 input writes an IEEE-float
    WAV (format tag 3, 32-bit); everything else encodes as int16 PCM
    (format tag 1)."""
    arr = np.asarray(samples)
    if arr.dtype == np.float32:
        s, tag, width = arr.astype("<f4"), 3, 4
    else:
        s, tag, width = arr.astype("<i2"), 1, 2
    if s.ndim == 1:
        s = s[:, None]
    frames, channels = s.shape
    data = s.tobytes()
    byte_rate = sample_rate * channels * width
    # WAVE_FORMAT_IEEE_FLOAT (tag 3) requires an 18-byte fmt chunk
    # (cbSize=0) plus a fact chunk with the frame count; plain PCM
    # (tag 1) keeps the classic 16-byte fmt and no fact chunk.
    fmt_body = (
        tag.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (channels * width).to_bytes(2, "little")
        + (8 * width).to_bytes(2, "little")
    )
    fact_chunk = b""
    if tag == 3:
        fmt_body += (0).to_bytes(2, "little")  # cbSize = 0
        fact_chunk = (
            b"fact" + (4).to_bytes(4, "little") + int(frames).to_bytes(4, "little")
        )
    fmt_chunk = b"fmt " + len(fmt_body).to_bytes(4, "little") + fmt_body
    data_chunk = b"data" + len(data).to_bytes(4, "little") + data
    body = b"WAVE" + fmt_chunk + fact_chunk + data_chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/WAVE: walk the even-padded chunk list for fmt/data. 16-bit
    integer PCM (format tag 1) returns (frames, channels) int16;
    32-bit IEEE float (format tag 3) returns (frames, channels)
    float32. Compressed WAVs stay stubbed."""
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
    if tag == 1 and bits == 16:
        return np.frombuffer(data, dtype="<i2").reshape(-1, channels)
    if tag == 3 and bits == 32:
        return np.frombuffer(data, dtype="<f4").reshape(-1, channels)
    raise NotImplementedError(
        f"WAV decode supports 16-bit integer PCM and 32-bit IEEE float"
        f" only (got format tag={tag}, bits={bits})"
    )


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
        if w % 2 or h % 2:
            raise ValueError(
                f"C420 requires even dimensions (got W={w} H={h}): the"
                " half-resolution chroma planes cannot tile an odd frame"
            )
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
    # only media_id + payload cross the Arrow boundary (r14, guide §4.1)
    decodable = df.filter(F.col("format") == "y4m").select("media_id", "payload")

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
    if fmt == "png":
        return _decode_png(bytes(payload))
    if fmt in ("jpeg", "jpg"):
        from miso_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(bytes(payload))
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
                    "n_samples": [int(a.size) for a in arrs],
                    "mean_byte": [float(a.mean()) if a.size else 0.0 for a in arrs],
                    "feature_hash": [
                        hashlib.md5(a.tobytes()).hexdigest() for a in arrs
                    ],
                }
            )

    # the featurizer reads exactly these four columns; dropping meta
    # before the Arrow boundary keeps the scan pruned (r14, guide §4.1)
    return df.select("media_id", "kind", "format", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


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

    # project to the three columns the Python stage reads BEFORE the
    # Arrow boundary (r14, guide §4.1: mapInPandas is opaque to column
    # pruning — without this, kind + the meta struct cross Arrow and
    # defeat pruning at the scan)
    decodable = df.filter(
        F.col("format").isin("ppm", "bmp", "png", "jpeg", "jpg")
    ).select("media_id", "format", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "payload": []}
            for mid, fmt, payload in zip(
                pdf["media_id"], pdf["format"], pdf["payload"]
            ):
                img = _decode_payload(fmt, bytes(payload))
                h, w = img.shape[:2]
                # integer math so the long side lands on max_side
                # exactly (float-truncation gave max_side-1 for many
                # inputs); never upscale
                if max(w, h) > max_side:
                    tw = max(w * max_side // max(w, h), 1)
                    th = max(h * max_side // max(w, h), 1)
                else:
                    tw, th = w, h
                resized = _resample_nearest(img, tw, th)
                out["media_id"].append(mid)
                out["width"].append(tw)
                out["height"].append(th)
                out["payload"].append(encode_ppm(resized))
            yield pd.DataFrame(out)

    return decodable.mapInPandas(run, schema=RESIZED_SCHEMA)


def resize_meta(df: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning as metadata arithmetic (aspect-preserving target
    dims, never upscaling) — the same integer formula
    ``side * max_side div max(w, h)`` as ``resize_pixels``, so the long
    side lands on ``max_side`` exactly."""
    w, h = F.col("meta.width"), F.col("meta.height")
    long_side = F.greatest(w, h)

    def target(side):
        scaled = F.greatest((side * max_side).cast("long") / long_side, F.lit(1))
        return (
            F.when(long_side > max_side, F.floor(scaled)).otherwise(side).cast("int")
        )

    return df.select(
        "media_id",
        "kind",
        w.alias("width"),
        h.alias("height"),
        target(w).alias("target_width"),
        target(h).alias("target_height"),
    )
