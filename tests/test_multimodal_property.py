"""Property tests for the pure-numpy multimodal decoders.

The uncompressed formats (PPM P6, 24-bit BI_RGB BMP, 16-bit PCM WAV,
YUV4MPEG2) are fixed public layouts, so encode → decode must be the
identity over ARBITRARY shapes — hypothesis drives sizes that hit
BMP's 4-byte row padding in every residue class, WAV's word-aligned
chunk padding, and y4m's odd-dimension C444 frames. No Spark session:
these run the byte layer the Arrow batchers call per row.
"""

from __future__ import annotations

import os

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

#: suite-runtime budget (r15, VERDICT r14 #1): the pure-Python JPEG
#: round-trips run at ~100 KB/s-1 MB/s per core, and the full-size
#: example counts helped push the suite past pytest.ini's 900 s
#: faulthandler_timeout on a contended host. Default scale keeps the
#: same shape coverage (strategies unchanged) at a quarter of the
#: examples; set SPARK_GRAFT_PROPERTY_SCALE=1.0 for the deep
#: pre-release sweep.
_SCALE = float(os.environ.get("SPARK_GRAFT_PROPERTY_SCALE", "0.25"))


def _ex(n: int) -> int:
    return max(8, round(n * _SCALE))

from miso_spark.functions.multimodal import (
    _decode_payload,
    _png_unfilter,
    encode_bmp,
    encode_png,
    encode_ppm,
    encode_wav,
    encode_y4m,
)


def _img(w: int, h: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


@settings(max_examples=_ex(120), deadline=None)
@given(
    w=st.integers(1, 41),
    h=st.integers(1, 33),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_bmp_png_roundtrip_any_shape(w, h, seed):
    img = _img(w, h, seed)
    assert (_decode_payload("ppm", encode_ppm(img)) == img).all()
    # w % 4 ∈ {0,1,2,3} all hit distinct BMP padding widths
    assert (_decode_payload("bmp", encode_bmp(img)) == img).all()
    # png exercises the zlib inflate + chunk/CRC walk + unfilter path
    assert (_decode_payload("png", encode_png(img)) == img).all()


@settings(max_examples=_ex(120), deadline=None)
@given(
    frames=st.integers(1, 400),
    channels=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_shape(frames, channels, seed):
    s = np.random.RandomState(seed).randint(
        -32768, 32767, size=(frames, channels), dtype=np.int16
    )
    assert (_decode_payload("wav", encode_wav(s)) == s).all()
    # float32 input routes through the IEEE-float arm (format tag 3)
    f = np.random.RandomState(seed).uniform(-1, 1, size=(frames, channels)).astype(
        np.float32
    )
    dec = _decode_payload("wav", encode_wav(f))
    assert dec.dtype == np.float32 and (dec == f).all()


@settings(max_examples=_ex(80), deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    channels=st.sampled_from([1, 2, 3, 4]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=16),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_all_filters_and_color_types_decode(w, h, channels, filters, seed):
    """Hand-build a PNG whose scanlines use ARBITRARY filter types
    (our encoder only emits 0) and any supported color type, apply the
    spec's forward filters, and require the decoder to reconstruct the
    original samples — pins the Sub/Up/Average/Paeth unfilter arms and
    the grey/alpha channel normalization."""
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w * channels), dtype=np.uint8)
    raw = bytearray()
    prior = np.zeros(w * channels, dtype=np.uint8)
    for r in range(h):
        f = filters[r % len(filters)]
        raw.append(f)
        line, enc = px[r], np.zeros(w * channels, dtype=np.uint8)
        for x in range(w * channels):
            a = int(line[x - channels]) if x >= channels else 0
            b = int(prior[x])
            c = int(prior[x - channels]) if x >= channels else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (int(line[x]) - pred) & 0xFF
        raw.extend(enc.tobytes())
        prior = line

    def chunk(typ, body):
        cc = typ + body
        return len(body).to_bytes(4, "big") + cc + (
            zlib.crc32(cc) & 0xFFFFFFFF
        ).to_bytes(4, "big")

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    dec = _decode_payload("png", payload)
    full = px.reshape(h, w, channels)
    if channels >= 3:  # RGB / RGBA → first three channels
        assert (dec == full[..., :3]).all()
    else:  # grey / grey+alpha → grey replicated
        assert (dec == np.repeat(full[..., :1], 3, axis=2)).all()


def test_png_unfilter_rejects_bad_filter_type():
    raw = np.array([7, 1, 2, 3], dtype=np.uint8)  # filter byte 7: invalid
    try:
        _png_unfilter(raw, 1, 3, 3)
    except ValueError as e:
        assert "filter" in str(e)
    else:
        raise AssertionError("filter type 7 must raise")


@settings(max_examples=_ex(60), deadline=None)
@given(
    n=st.integers(1, 4),
    w=st.integers(1, 17),
    h=st.integers(1, 13),
    seed=st.integers(0, 2**31 - 1),
)
def test_y4m_c444_roundtrip_within_bt601_rounding(n, w, h, seed):
    fr = np.random.RandomState(seed).randint(
        0, 256, size=(n, h, w, 3), dtype=np.uint8
    )
    dec = _decode_payload("y4m", encode_y4m(fr))
    assert dec.shape == fr.shape
    assert np.abs(dec.astype(int) - fr.astype(int)).max() <= 3
    # gray input has centered chroma → exact round-trip
    gray = np.repeat(fr[..., :1], 3, axis=3)
    assert (_decode_payload("y4m", encode_y4m(gray)) == gray).all()


def test_float_wav_spec_structure():
    """WAVE_FORMAT_IEEE_FLOAT payloads carry the spec-required 18-byte
    fmt chunk (cbSize=0) and a fact chunk with the frame count
    (external decoders reject tag-3 files without them); PCM keeps the
    classic 16-byte fmt and no fact chunk."""
    f = np.zeros((7, 2), dtype=np.float32)
    b = encode_wav(f, sample_rate=8000)
    assert b[12:16] == b"fmt "
    assert int.from_bytes(b[16:20], "little") == 18
    assert int.from_bytes(b[20:22], "little") == 3  # format tag
    assert int.from_bytes(b[36:38], "little") == 0  # cbSize
    assert b[38:42] == b"fact"
    assert int.from_bytes(b[46:50], "little") == 7  # frame count
    p = encode_wav(np.zeros((7, 2), dtype=np.int16))
    assert int.from_bytes(p[16:20], "little") == 16
    assert b"fact" not in p[:44]


def _png_forward_filter(rows: np.ndarray, filters, bpp: int) -> bytearray:
    """Apply the spec's forward scanline filters (§9) over raw BYTE
    rows of shape (h, stride) — shared by the 16-bit and palette
    arms below (filters always operate on bytes, with bpp rounded up
    to one for sub-byte depths)."""
    h, stride = rows.shape
    raw = bytearray()
    prior = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        f = filters[r % len(filters)]
        raw.append(f)
        line, enc = rows[r], np.zeros(stride, dtype=np.uint8)
        for x in range(stride):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prior[x])
            c = int(prior[x - bpp]) if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (int(line[x]) - pred) & 0xFF
        raw.extend(enc.tobytes())
        prior = line
    return raw


def _png_payload(w, h, depth, color_type, raw: bytearray, plte: bytes | None = None):
    import struct
    import zlib

    def chunk(typ, body):
        cc = typ + body
        return len(body).to_bytes(4, "big") + cc + (
            zlib.crc32(cc) & 0xFFFFFFFF
        ).to_bytes(4, "big")

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    )
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


@settings(max_examples=_ex(60), deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    channels=st.sampled_from([1, 2, 3, 4]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=8),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_16bit_decode(w, h, channels, filters, seed):
    """16-bit PNGs (all four non-palette color types, arbitrary
    filters) decode to the big-endian HIGH byte of each sample — the
    spec's 16→8 downshift (§7.1 sample order)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    rng = np.random.RandomState(seed)
    px16 = rng.randint(0, 65536, size=(h, w * channels), dtype=np.uint16)
    rows = np.frombuffer(
        px16.astype(">u2").tobytes(), dtype=np.uint8
    ).reshape(h, w * channels * 2)
    raw = _png_forward_filter(rows, filters, bpp=channels * 2)
    dec = _decode_payload("png", _png_payload(w, h, 16, color_type, raw))
    hi = (px16 >> 8).astype(np.uint8).reshape(h, w, channels)
    if channels >= 3:
        assert (dec == hi[..., :3]).all()
    else:
        assert (dec == np.repeat(hi[..., :1], 3, axis=2)).all()


@settings(max_examples=_ex(60), deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 12),
    depth=st.sampled_from([1, 2, 4, 8]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=8),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_palette_decode(w, h, depth, filters, seed):
    """Paletted PNGs (color type 3) at depths 1/2/4/8 decode through
    the PLTE lookup, including the spec's MSB-first sub-byte packing
    (§7.2) and byte-level filtering with bpp=1 (§9)."""
    rng = np.random.RandomState(seed)
    n_pal = 2 ** depth
    pal = rng.randint(0, 256, size=(n_pal, 3), dtype=np.uint8)
    idx = rng.randint(0, n_pal, size=(h, w), dtype=np.uint8)
    stride = (w * depth + 7) // 8
    if depth == 8:
        rows = idx
    else:
        per_px_bits = np.unpackbits(
            idx[..., None], axis=2, count=8
        )[..., 8 - depth:]  # low `depth` bits of each index, MSB first
        bitrows = per_px_bits.reshape(h, w * depth)
        pad = stride * 8 - w * depth
        if pad:
            bitrows = np.concatenate(
                [bitrows, np.zeros((h, pad), dtype=np.uint8)], axis=1
            )
        rows = np.packbits(bitrows, axis=1)
    raw = _png_forward_filter(rows.astype(np.uint8), filters, bpp=1)
    dec = _decode_payload(
        "png", _png_payload(w, h, depth, 3, raw, plte=pal.tobytes())
    )
    assert (dec == pal[idx]).all()


def test_png_palette_errors():
    import pytest

    # missing PLTE
    rows = np.zeros((2, 2), dtype=np.uint8)
    raw = _png_forward_filter(rows, [0], bpp=1)
    with pytest.raises(ValueError, match="missing its PLTE"):
        _decode_payload("png", _png_payload(2, 2, 8, 3, raw))
    # index past the palette
    rows = np.full((1, 1), 9, dtype=np.uint8)
    raw = _png_forward_filter(rows, [0], bpp=1)
    pal = np.zeros((4, 3), dtype=np.uint8).tobytes()
    with pytest.raises(ValueError, match="palette index out of range"):
        _decode_payload("png", _png_payload(1, 1, 8, 3, raw, plte=pal))
    # truncated interlaced pixel data is a loud error, not garbage
    import struct
    import zlib

    def chunk(typ, body):
        cc = typ + body
        return len(body).to_bytes(4, "big") + cc + (
            zlib.crc32(cc) & 0xFFFFFFFF
        ).to_bytes(4, "big")

    truncated = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truncated"):
        _decode_payload("png", truncated)


def _adam7_payload(px: np.ndarray, depth: int, color_type: int, filters,
                   plte: bytes | None = None, idx: np.ndarray | None = None):
    """Build an interlaced PNG: slice the image into the seven Adam7
    reduced images, forward-filter each independently, concatenate."""
    from miso_spark.functions.multimodal import _ADAM7

    if color_type == 3:
        h, w = idx.shape
    else:
        h, w, channels = px.shape
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        if color_type == 3:
            sub = idx[y0::dy, x0::dx]
            stride = (wp * depth + 7) // 8
            if depth == 8:
                rows = sub
            else:
                bits = np.unpackbits(
                    sub[..., None].astype(np.uint8), axis=2, count=8
                )[..., 8 - depth:].reshape(hp, wp * depth)
                pad = stride * 8 - wp * depth
                if pad:
                    bits = np.concatenate(
                        [bits, np.zeros((hp, pad), dtype=np.uint8)], axis=1
                    )
                rows = np.packbits(bits, axis=1)
            bpp = 1
        else:
            sub = px[y0::dy, x0::dx]  # (hp, wp, channels)
            if depth == 16:
                rows = np.frombuffer(
                    sub.astype(">u2").tobytes(), dtype=np.uint8
                ).reshape(hp, wp * channels * 2)
                bpp = channels * 2
            else:
                rows = sub.reshape(hp, wp * channels)
                bpp = channels
        raw += _png_forward_filter(rows.astype(np.uint8), filters, bpp=bpp)
    return raw


@settings(max_examples=_ex(60), deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 14),
    channels=st.sampled_from([1, 2, 3, 4]),
    depth=st.sampled_from([8, 16]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=8),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_adam7_interlaced_decode(w, h, channels, depth, filters, seed):
    """Adam7 PNGs decode identically to their sequential twins: seven
    independently-filtered reduced images scattered on the pass grid
    (spec §8.2), any color type, 8- or 16-bit, arbitrary filters."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    rng = np.random.RandomState(seed)
    if depth == 16:
        px = rng.randint(0, 65536, size=(h, w, channels), dtype=np.uint16)
        expect = (px >> 8).astype(np.uint8)
    else:
        px = rng.randint(0, 256, size=(h, w, channels), dtype=np.uint8)
        expect = px
    raw = _adam7_payload(px if depth == 8 else px, depth, color_type, filters)
    payload = _png_payload_interlaced(w, h, depth, color_type, raw)
    dec = _decode_payload("png", payload)
    if channels >= 3:
        assert (dec == expect[..., :3]).all()
    else:
        assert (dec == np.repeat(expect[..., :1], 3, axis=2)).all()


@settings(max_examples=_ex(40), deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 14),
    depth=st.sampled_from([1, 2, 4, 8]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=8),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_adam7_palette_decode(w, h, depth, filters, seed):
    rng = np.random.RandomState(seed)
    n_pal = 2 ** depth
    pal = rng.randint(0, 256, size=(n_pal, 3), dtype=np.uint8)
    idx = rng.randint(0, n_pal, size=(h, w), dtype=np.uint8)
    raw = _adam7_payload(None, depth, 3, filters, idx=idx)
    payload = _png_payload_interlaced(w, h, depth, 3, raw, plte=pal.tobytes())
    assert (_decode_payload("png", payload) == pal[idx]).all()


def _png_payload_interlaced(w, h, depth, color_type, raw, plte=None):
    import struct
    import zlib

    def chunk(typ, body):
        cc = typ + body
        return len(body).to_bytes(4, "big") + cc + (
            zlib.crc32(cc) & 0xFFFFFFFF
        ).to_bytes(4, "big")

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 1)
    )
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


# ---------------------------------------------------------------------------
# baseline JPEG (functions/jpeg.py — r14): pure-numpy T.81 sequential
# codec. No codec library exists in this container, so coverage comes
# from (a) encoder↔decoder round-trips at bounded error (the lossy
# channel crosses the real byte format: canonical huffman, zigzag,
# quantization, byte stuffing, markers), (b) a hand-assembled DC-only
# fixture with independently computed expected pixels, and (c) the
# structural error paths.


@settings(max_examples=_ex(60), deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    quality=st.integers(70, 100),
    seed=st.integers(0, 2**31),
)
def test_jpeg_roundtrip_smooth_bounded_error(w, h, quality, seed):
    from miso_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    # smooth field: random low-frequency cosines (JPEG's design target)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (127 + 90 * np.cos(xx / rng.uniform(6, 20) + rng.uniform(0, 6))
             * np.cos(yy / rng.uniform(6, 20))).clip(0, 255)
            for _ in range(3)
        ],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality))
    assert out.shape == (h, w, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    # q≥70 on a smooth field: small quantization error only
    assert err.mean() <= 4.0, (err.mean(), quality)
    assert err.max() <= 40, (err.max(), quality)


@settings(max_examples=_ex(40), deadline=None)
@given(
    w=st.integers(1, 33),
    h=st.integers(1, 33),
    seed=st.integers(0, 2**31),
    subsampling=st.sampled_from(["444", "420"]),
    restart=st.integers(0, 4),
)
def test_jpeg_constant_color_exact_all_paths(w, h, seed, subsampling, restart):
    """A constant image is DC-only: every path (4:2:0 interleave,
    restart resets, padding) must reproduce it EXACTLY after the
    ±rounding of the color transform (≤1/255 per channel)."""
    from miso_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    color = rng.integers(0, 256, 3)
    img = np.broadcast_to(color, (h, w, 3)).astype(np.uint8)
    out = decode_jpeg(
        encode_jpeg(img, 95, subsampling=subsampling, restart_interval=restart)
    )
    assert out.shape == (h, w, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 2, (color.tolist(), err.max())


@settings(max_examples=_ex(30), deadline=None)
@given(
    w=st.integers(1, 25),
    h=st.integers(1, 25),
    seed=st.integers(0, 2**31),
    restart=st.integers(0, 3),
)
def test_jpeg_grayscale_roundtrip(w, h, seed, restart):
    from miso_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    g = (127 + 100 * np.cos(xx / 7) * np.cos(yy / 9)).clip(0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, 95, restart_interval=restart))
    assert out.shape == (h, w, 3)
    # grayscale bypasses the color transform: tight bound
    err = np.abs(out.astype(int) - np.stack([g] * 3, axis=-1).astype(int))
    assert err.max() <= 8, err.max()


def test_jpeg_handbuilt_dc_only_fixture():
    """A JPEG assembled byte-by-byte, independent of encode_jpeg: one
    8×8 grayscale block, flat quant table (all 16), a 2-symbol DC
    huffman table, AC table with EOB only. DC value 4 → dequantized 64
    → IDCT of a DC-only block is the constant 64/8 = 8 → +128 = 136
    everywhere."""
    import struct

    from miso_spark.functions.jpeg import decode_jpeg

    out = bytearray(b"\xff\xd8")
    # DQT id 0: all 16s (zigzag order of a constant table is itself)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([16] * 64)
    # SOF0: 8-bit, 8×8, 1 component (id 1, sampling 1×1, qtable 0)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    # DHT DC table 0: one 3-bit code for symbol 3 (category 3)
    bits = [0, 0, 1] + [0] * 13
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1) + b"\x00" + bytes(bits) + bytes([3])
    # DHT AC table 0: one 2-bit code for symbol 0 (EOB)
    bits = [0, 1] + [0] * 14
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1) + b"\x10" + bytes(bits) + bytes([0])
    # SOS: 1 component, DC 0 / AC 0
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3f\x00"
    # entropy: DC code '000' (3 bits, symbol=category 3), value bits
    # 100 (=4), AC EOB '00' → 000 100 00 = 0b00010000 = 0x10
    out += bytes([0x10])
    out += b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    assert img.shape == (8, 8, 3)
    # DC=4 dequant → 64; IDCT: C(0)^2/4 · 64 · cos0·cos0 = 64/8 = 8;
    # +128 = 136 across the block
    assert (img == 136).all(), img[0, 0]


def test_jpeg_error_paths():
    import struct

    import pytest

    from miso_spark.functions.jpeg import JpegError, decode_jpeg, encode_jpeg

    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02\x03")
    # arithmetic-coded sequential (SOF9): explicit NotImplementedError
    ar = bytearray(b"\xff\xd8")
    ar += b"\xff\xc9" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg(bytes(ar))
    with pytest.raises(ValueError, match="empty"):
        encode_jpeg(np.zeros((0, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(np.zeros((4, 4, 3), dtype=np.uint8), subsampling="422")


@settings(max_examples=_ex(40), deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    quality=st.integers(50, 100),
    seed=st.integers(0, 2**31),
    subsampling=st.sampled_from(["444", "420"]),
    restart=st.integers(0, 4),
)
def test_jpeg_progressive_decodes_identical_to_baseline(
    w, h, quality, seed, subsampling, restart
):
    """The progressive writer (SOF2: DC first/refine at Al=1, AC band
    splits at Al=1, AC refinement — EOB runs, correction-bit buffers)
    serializes the SAME quantized coefficients as the baseline writer,
    so decoding both must be BIT-IDENTICAL — any slip in the
    successive-approximation bit accounting breaks equality. Random
    noise maximizes coefficient churn."""
    from miso_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    kw = dict(subsampling=subsampling, restart_interval=restart)
    base = decode_jpeg(encode_jpeg(img, quality, **kw))
    prog = decode_jpeg(encode_jpeg(img, quality, progressive=True, **kw))
    assert np.array_equal(base, prog)


@settings(max_examples=_ex(20), deadline=None)
@given(
    w=st.integers(1, 30),
    h=st.integers(1, 30),
    seed=st.integers(0, 2**31),
    restart=st.integers(0, 3),
)
def test_jpeg_progressive_grayscale_identical(w, h, seed, restart):
    from miso_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, (h, w), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(g, 90, restart_interval=restart))
    prog = decode_jpeg(
        encode_jpeg(g, 90, restart_interval=restart, progressive=True)
    )
    assert np.array_equal(base, prog)


def test_jpeg_flows_through_extract_features(spark):
    """The mapInPandas decode path accepts format='jpeg' end-to-end."""
    from miso_spark.functions.jpeg import encode_jpeg
    from miso_spark.functions.multimodal import MEDIA_SCHEMA, extract_features

    img = np.full((12, 9, 3), 77, dtype=np.uint8)
    rows = [
        (1, "image", "jpeg", bytearray(encode_jpeg(img, 95)), (9, 12, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(df).collect()
    assert len(feats) == 1
    assert feats[0]["n_samples"] == 12 * 9 * 3
    assert abs(feats[0]["mean_byte"] - 77.0) <= 2.0
    # and through the resize stage (jpeg is in its decodable set)
    from miso_spark.functions.multimodal import resize_pixels

    r = resize_pixels(df, max_side=6).collect()
    assert len(r) == 1 and max(r[0]["width"], r[0]["height"]) == 6
