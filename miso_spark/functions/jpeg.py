"""JPEG (ITU-T T.81 / JFIF) codec in pure numpy.

Closes the last pure-python-feasible multimodal stub (r13 verdict #8
stretch): huffman-coded DCT decode — marker walk, canonical huffman
entropy decode, dequantize + zigzag + vectorized 8×8 IDCT, chroma
upsampling, JFIF YCbCr→RGB — plus matching encoders so the property
suite can round-trip arbitrary shapes without any codec library.
Everything here derives from the public T.81 spec text (marker
layout, tables K.1-K.5, the F.2.2 decode and G.1.2 progressive
procedures).

Supported decode: SOF0 (baseline), SOF1 (extended sequential) and
SOF2 (PROGRESSIVE — spectral selection + successive approximation,
DC/AC first and refinement scans, EOB runs), 8-bit, grayscale or
3-component YCbCr with any h/v sampling factors ≤ 4, restart
intervals, 16-bit DQT precision. The encoder writes baseline or
progressive (``progressive=True``) streams over 4:4:4 or 4:2:0 with
optional restart markers; both serialize the SAME quantized
coefficients, so the pair decodes bit-identically — the round-trip
oracle the tests pin. Arithmetic coding, hierarchical and 12-bit
modes raise NotImplementedError with a clear message.

This is the documented SLOW PATH: a pure-Python huffman loop decodes
~100KB/s-1MB/s per core. It exists for correctness coverage and
environments without PIL; the Arrow-batched mapInPandas plumbing in
multimodal.py is unchanged and swaps to PIL transparently when
available.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants

#: zigzag order: ZZ[i] = (row, col) of the i-th coefficient (T.81 §A.3.6)
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

#: inverse permutation: natural index -> zigzag position
_UNZIGZAG = np.argsort(_ZIGZAG)


def _dct_matrix() -> np.ndarray:
    """8×8 DCT-II basis T with T[u, x] = C(u)/2 · cos((2x+1)uπ/16);
    spatial = T.T @ coeff @ T is the IDCT, coeff = T @ spatial @ T.T
    the FDCT (orthonormal — T @ T.T = I)."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    t = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    t[0, :] *= 1.0 / np.sqrt(2.0)
    return t


_DCT_T = _dct_matrix()

# Annex K.1 quantization tables (luminance, chrominance), natural order
_STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K.3: typical huffman tables — (BITS counts per code length
# 1..16, HUFFVAL symbol list)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


class JpegError(ValueError):
    """Malformed or unsupported-but-detected JPEG structure."""


# ---------------------------------------------------------------------------
# huffman tables

class _HuffDecoder:
    """Canonical huffman decode state (T.81 F.2.2.3 DECODE): per code
    length L keep mincode/maxcode and an index into the symbol list."""

    __slots__ = ("mincode", "maxcode", "valptr", "huffval")

    def __init__(self, bits: list[int], huffval: list[int]):
        if sum(bits) != len(huffval):
            raise JpegError("DHT: BITS total != symbol count")
        self.huffval = huffval
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


def _huff_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for the encoder (canonical assignment)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# decoder

class _BitReader:
    """MSB-first bit reader over unstuffed entropy bytes."""

    __slots__ = ("data", "pos", "cur", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                # past-the-end pad bits read as 1s (T.81 F.1.2.3 fills
                # the final byte with 1s; decoders that overrun on the
                # last EOB see only padding)
                return 1
            self.cur = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(r: _BitReader, t: _HuffDecoder) -> int:
    code = r.read_bit()
    length = 1
    while code > t.maxcode[length]:
        code = (code << 1) | r.read_bit()
        length += 1
        if length > 16:
            raise JpegError("corrupt entropy stream: code length > 16")
    return t.huffval[t.valptr[length] + code - t.mincode[length]]


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.read_bits(s)
    if v < (1 << (s - 1)):  # T.81 F.2.2.1 EXTEND
        v -= (1 << s) - 1
    return v


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the scan's entropy bytes from ``start``, splitting at
    restart markers (FFD0-FFD7). Returns (segments, index of the
    terminating marker's 0xFF)."""
    segs: list[bytearray] = [bytearray()]
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:  # stuffed FF
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytearray())
            i += 2
        else:
            break
    return [bytes(s) for s in segs], i


class _DecodeState:
    """Frame geometry + per-component coefficient accumulators. Every
    scan (baseline's single one, or progressive's many) writes
    quantized zigzag coefficients here; the pixel transform happens
    once at EOI."""

    def __init__(self, h_img, w_img, comps, progressive, qtables):
        self.h_img, self.w_img = h_img, w_img
        self.progressive = progressive
        self.qtables = qtables
        self.hmax = max(h for _, h, _, _ in comps)
        self.vmax = max(v for _, _, v, _ in comps)
        self.mcus_x = -(-w_img // (8 * self.hmax))
        self.mcus_y = -(-h_img // (8 * self.vmax))
        self.comps = []
        self.by_id = {}
        for cid, hs, vs, tq in comps:
            # component dimensions (T.81 A.1.1) and its real block grid
            cw = -(-w_img * hs // self.hmax)
            ch = -(-h_img * vs // self.vmax)
            c = {
                "cid": cid, "hs": hs, "vs": vs, "tq": tq,
                "cbw": -(-cw // 8), "cbh": -(-ch // 8),
                # MCU-padded grid (interleaved scans cover it whole)
                "coef": np.zeros(
                    (self.mcus_y * vs, self.mcus_x * hs, 64), dtype=np.int32
                ),
            }
            self.comps.append(c)
            self.by_id[cid] = c


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline or progressive JPEG bytes to an H×W×3 uint8
    RGB array (grayscale replicates into 3 channels)."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffDecoder] = {}
    ac_tables: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    st: _DecodeState | None = None
    scanned = False
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise JpegError(f"expected marker at byte {i}")
        marker = data[i + 1]
        if marker == 0xD8:  # stray SOI
            i += 2
            continue
        if marker == 0xD9:  # EOI
            if not scanned:
                raise JpegError("EOI before SOS")
            break
        if 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            raise JpegError("truncated marker segment")
        seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq == 0:
                    q = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.float64)
                    j += 64
                elif pq == 1:
                    q = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.float64)
                    j += 128
                else:
                    raise JpegError(f"DQT precision {pq}")
                # tables arrive in zigzag order — store natural
                nat = np.empty(64)
                nat[_ZIGZAG] = q
                qtables[tq] = nat
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                cnt = sum(bits)
                vals = list(seg[j + 17 : j + 17 + cnt])
                (dc_tables if tc == 0 else ac_tables)[th] = _HuffDecoder(bits, vals)
                j += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG sample precision")
            h_, w_ = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            if h_ == 0 or w_ == 0:
                raise JpegError("zero image dimension")
            st = _DecodeState(h_, w_, comps, marker == 0xC2, qtables)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} coding process is not "
                "baseline/extended/progressive huffman"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if st is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tbl = seg[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cs, tbl >> 4, tbl & 15))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            segs, end = _split_entropy(data, i + 2 + seglen)
            _decode_scan_into(
                st, scan_comps, ss, se, ahal >> 4, ahal & 15,
                segs, dc_tables, ac_tables, restart_interval,
            )
            scanned = True
            i = end
            continue
        # APPn / COM / anything else: skip
        i += 2 + seglen
    if st is None or not scanned:
        raise JpegError("no SOS marker found")
    return _finish(st)


def _decode_scan_into(st, scan_comps, ss, se, ah, al, segs,
                      dc_tables, ac_tables, restart_interval) -> None:
    """Decode one entropy-coded scan into ``st``'s coefficient
    accumulators. Covers baseline's single full scan and progressive's
    DC/AC first/refinement scans (T.81 F.2.2 + G.1.2), interleaved or
    single-component, with restart segmentation."""
    members = []
    for cs, td, ta in scan_comps:
        if cs not in st.by_id:
            raise JpegError(f"scan references unknown component {cs}")
        members.append((st.by_id[cs], dc_tables.get(td), ac_tables.get(ta)))
    interleaved = len(members) > 1
    if st.progressive:
        if ss == 0 and se != 0:
            raise JpegError("progressive DC scan with Se != 0")
        if ss > 0 and interleaved:
            raise JpegError("progressive AC scan must be single-component")
        if ss > se or se > 63:
            raise JpegError(f"bad spectral band {ss}..{se}")
    else:
        ss, se, ah, al = 0, 63, 0, 0

    if interleaved:
        total = st.mcus_x * st.mcus_y
    else:
        comp = members[0][0]
        total = comp["cbw"] * comp["cbh"]

    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = [0] * len(members)
    eobrun = 0
    for unit in range(total):
        if restart_interval and unit and unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise JpegError("missing restart marker segment")
            reader = _BitReader(segs[seg_idx])
            preds = [0] * len(members)
            eobrun = 0
        if interleaved:
            my, mx = divmod(unit, st.mcus_x)
            blocks = [
                (ci, comp, dct, act,
                 comp["coef"][my * comp["vs"] + by, mx * comp["hs"] + bx])
                for ci, (comp, dct, act) in enumerate(members)
                for by in range(comp["vs"])
                for bx in range(comp["hs"])
            ]
        else:
            comp, dct, act = members[0]
            by, bx = divmod(unit, comp["cbw"])
            blocks = [(0, comp, dct, act, comp["coef"][by, bx])]
        for ci, comp, dct, act, coef in blocks:
            if not st.progressive:
                preds[ci] = _block_baseline(reader, dct, act, coef, preds[ci])
            elif ss == 0:
                if ah == 0:  # DC first
                    s = _huff_decode(reader, dct)
                    preds[ci] += _receive_extend(reader, s)
                    coef[0] = preds[ci] << al
                else:  # DC refinement: one raw bit per block
                    if reader.read_bit():
                        coef[0] |= 1 << al
            elif ah == 0:
                eobrun = _block_ac_first(reader, act, coef, ss, se, al, eobrun)
            else:
                eobrun = _block_ac_refine(reader, act, coef, ss, se, al, eobrun)


def _block_baseline(reader, dct, act, coef, pred) -> int:
    s = _huff_decode(reader, dct)
    pred += _receive_extend(reader, s)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(reader, act)
        rr, s = rs >> 4, rs & 15
        if s == 0:
            if rr == 15:
                k += 16
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise JpegError("AC run past block end")
        coef[k] = _receive_extend(reader, s)
        k += 1
    return pred


def _block_ac_first(reader, act, coef, ss, se, al, eobrun) -> int:
    """Progressive AC first scan for one block (G.1.2.2 semantics):
    values arrive point-transformed (÷2^Al toward zero), EOBn codes
    carry a run of all-zero BANDS across blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, act)
        rr, s = rs >> 4, rs & 15
        if s == 0:
            if rr != 15:
                # EOBn: (1<<r)-1 + extra-bits FURTHER blocks after this
                return (1 << rr) - 1 + (reader.read_bits(rr) if rr else 0)
            k += 16  # ZRL
            continue
        k += rr
        if k > se:
            raise JpegError("AC run past band end")
        coef[k] = _receive_extend(reader, s) << al
        k += 1
    return 0


def _block_ac_refine(reader, act, coef, ss, se, al, eobrun) -> int:
    """Progressive AC refinement for one block (T.81 G.1.2.3): one
    correction bit per already-significant coefficient, run-coded
    newly-significant ±2^Al insertions, EOB runs spanning blocks."""
    p1 = 1 << al
    m1 = -p1

    def correct(k):
        # correction bit: advance magnitude toward the next precision
        if reader.read_bit() and (coef[k] & p1) == 0:
            coef[k] += p1 if coef[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, act)
            rr, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if rr != 15:
                    # EOBn: includes THIS block's tail (handled below)
                    eobrun = (1 << rr) + (reader.read_bits(rr) if rr else 0)
                    break
                # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise JpegError("AC refinement magnitude != 1")
                newval = p1 if reader.read_bit() else m1
            # advance over rr zero-HISTORY positions, emitting
            # correction bits for significant ones passed on the way
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        # inside an EOB run: only correction bits for the rest of band
        while k <= se:
            if coef[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _finish(st) -> np.ndarray:
    """Dequantize + IDCT every component, upsample, color-transform."""
    full = []
    for comp in st.comps:
        qt_zz = st.qtables[comp["tq"]][_ZIGZAG]
        coef = comp["coef"].astype(np.float64) * qt_zz  # (bh, bw, 64) zigzag
        bh, bw = coef.shape[:2]
        nat = np.zeros_like(coef)
        nat[:, :, _ZIGZAG] = coef  # de-zigzag (scatter to natural order)
        blocks = nat.reshape(bh, bw, 8, 8)
        # vectorized IDCT over every block at once
        spatial = np.einsum("ux,ijuv,vy->ijxy", _DCT_T, blocks, _DCT_T) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        if comp["hs"] != st.hmax or comp["vs"] != st.vmax:
            plane = np.repeat(
                np.repeat(plane, st.vmax // comp["vs"], axis=0),
                st.hmax // comp["hs"], axis=1,
            )
        full.append(plane[: st.h_img, : st.w_img])
    if len(full) == 1:
        g = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG (CMYK?)")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline 4:4:4, Annex K tables)

class _BitWriter:
    __slots__ = ("out", "cur", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.cur = 0
                self.nbits = 0

    def flush(self) -> None:
        # pad the final byte with 1s (T.81 F.1.2.3)
        if self.nbits:
            self.cur = (self.cur << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.cur)
            if self.cur == 0xFF:
                self.out.append(0x00)
            self.cur = 0
            self.nbits = 0


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality→scaling mapping."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, value-bits) for a coefficient (T.81 F.1.2.1.2/F.1.4)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_block(w: _BitWriter, coef_zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    dc = int(coef_zz[0])
    s, bits = _magnitude(dc - pred)
    code, length = dc_codes[s]
    w.write(code, length)
    if s:
        w.write(bits, s)
    run = 0
    last_nz = 0
    nz = np.nonzero(coef_zz[1:])[0]
    if nz.size:
        last_nz = int(nz[-1]) + 1
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        s, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        w.write(code, length)
        w.write(bits, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return dc


def _catch_all_ac_table() -> tuple[list[int], list[int]]:
    """A fixed prefix-free AC table containing EVERY symbol the
    progressive writer can emit (EOBn r=0..14, ZRL, all (r, s≤10)) —
    the Annex K tables lack the EOBn family, and per-scan optimized
    tables (libjpeg's route) would need a frequency pass. 150 codes at
    8 bits + 26 at 9 keeps the Kraft sum at 0.64, a valid canonical
    assignment any T.81 decoder accepts."""
    syms = [r << 4 for r in range(15)] + [0xF0]
    syms += [(r << 4) | s for r in range(16) for s in range(1, 11)]
    bits = [0] * 16
    bits[7] = 150
    bits[8] = len(syms) - 150
    return bits, syms


_AC_CATCH_ALL = _catch_all_ac_table()


class _ProgWriter:
    """Entropy emission state for one progressive scan segment:
    huffman symbols, an accumulating EOB run, and the refinement
    correction-bit buffer that rides with the next flushed symbol
    (T.81 G.1.2.2 order: symbol, extension bits, then buffered
    correction bits)."""

    def __init__(self, codes):
        self.codes = codes
        self.w = _BitWriter()
        self.out = bytearray()
        self.eobrun = 0
        #: correction bits riding with the pending EOB run (the spec's
        #: BE buffer: bits from blocks already absorbed into eobrun)
        self.be: list[int] = []
        #: correction bits of the CURRENT block since the last emitted
        #: symbol (the spec's BR buffer) — these ride with the next
        #: ZRL / newly-significant symbol, NOT with the EOB run
        self.br: list[int] = []
        self.rst = 0

    def sym(self, s):
        code, length = self.codes[s]
        self.w.write(code, length)

    def bits(self, v, n):
        if n:
            self.w.write(v, n)

    def flush_br(self):
        for b in self.br:
            self.w.write(b, 1)
        self.br = []

    def end_block_eob(self):
        """This block's band tail folds into the EOB run: its pending
        correction bits ride with that run."""
        self.eobrun += 1
        self.be += self.br
        self.br = []
        if self.eobrun == 0x7FFF or len(self.be) > 900:
            self.flush_eob()

    def flush_eob(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.sym(r << 4)
            self.bits(self.eobrun - (1 << r), r)
            self.eobrun = 0
            for b in self.be:
                self.w.write(b, 1)
            self.be = []

    def restart(self):
        self.flush_eob()
        self.w.flush()
        self.out += self.w.out
        self.out += bytes([0xFF, 0xD0 + self.rst])
        self.rst = (self.rst + 1) & 7
        self.w = _BitWriter()

    def finish(self) -> bytes:
        self.flush_eob()
        self.w.flush()
        self.out += self.w.out
        return bytes(self.out)


def _prog_ac_first_block(pw: _ProgWriter, zz, ss, se, al) -> None:
    vals = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        m = abs(v) >> al  # AC point transform: ÷2^Al toward zero
        vals.append(m if v >= 0 else -m)
    last = -1
    for idx, v in enumerate(vals):
        if v:
            last = idx
    if last < 0:
        pw.end_block_eob()
        return
    pw.flush_eob()
    r = 0
    for idx in range(last + 1):
        v = vals[idx]
        if v == 0:
            r += 1
            continue
        while r > 15:
            pw.sym(0xF0)
            r -= 16
        s, bits = _magnitude(v)
        pw.sym((r << 4) | s)
        pw.bits(bits, s)
        r = 0
    if last < len(vals) - 1:
        pw.end_block_eob()


def _prog_ac_refine_block(pw: _ProgWriter, zz, ss, se, al) -> None:
    absvals = []
    eob = -1
    for idx, k in enumerate(range(ss, se + 1)):
        t = abs(int(zz[k])) >> al
        absvals.append(t)
        if t == 1:
            eob = idx  # last NEWLY-significant position
    r = 0
    for idx, t in enumerate(absvals):
        if t == 0:
            r += 1
            continue
        # emit pending ZRLs FIRST (for any nonzero, spec figure G.7) —
        # unless they can fold into the EOB run (idx > eob)
        while r > 15 and idx <= eob:
            pw.flush_eob()
            pw.sym(0xF0)
            r -= 16
            pw.flush_br()
        if t > 1:
            # already significant: buffer its correction bit
            pw.br.append(t & 1)
            continue
        # newly significant (±1 at this precision)
        pw.flush_eob()
        pw.sym((r << 4) | 1)
        pw.bits(1 if int(zz[ss + idx]) >= 0 else 0, 1)
        pw.flush_br()
        r = 0
    if r > 0 or pw.br:
        pw.end_block_eob()


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """Encode an H×W×3 (RGB) or H×W (grayscale) uint8 array as a JFIF
    JPEG. ``subsampling``: "444" (one block per component per MCU) or
    "420" (2×2 Y blocks + averaged-downsampled Cb/Cr per MCU).
    ``restart_interval`` > 0 emits RSTn markers every N MCUs (blocks,
    in non-interleaved progressive scans) and resets DC prediction.
    ``progressive=True`` writes an SOF2 stream with spectral selection
    + successive approximation (DC first/refine at Al=1, per-component
    AC bands 1-5 / 6-63 at Al=1, then an AC refinement scan) — the
    same quantized coefficients as the baseline stream, so both decode
    to identical pixels."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError(f"expected H×W[×1|×3] image, got shape {img.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling {subsampling!r} (expected 444 or 420)")
    h_img, w_img = img.shape[:2]
    if h_img == 0 or w_img == 0:
        raise ValueError("cannot encode an empty image")
    rgb = img.astype(np.float64)
    if img.shape[2] == 3:
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [rgb[:, :, 0]]
    ncomp = len(planes)

    # per-component sampling factors
    if ncomp == 3 and subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * ncomp
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))

    luma_q = _quality_scale(_STD_LUMA_Q, quality)
    chroma_q = _quality_scale(_STD_CHROMA_Q, quality)
    qts = [luma_q] + ([chroma_q] if ncomp == 3 else [])

    # pad each plane to its MCU-covered extent (edge replication),
    # downsampling chroma first when subsampled (2×2 box average),
    # then compute EVERY block's quantized zigzag coefficients once —
    # baseline and progressive writers serialize the same arrays
    comps_zz = []
    cb_dims = []  # (cbh, cbw): the REAL block grid (non-interleaved scans)
    for ci, ((hs, vs), p) in enumerate(zip(samp, planes)):
        if hs != hmax or vs != vmax:
            fy, fx = vmax // vs, hmax // hs
            pe = np.pad(
                p, ((0, (-h_img) % fy), (0, (-w_img) % fx)), mode="edge"
            )
            p = pe.reshape(pe.shape[0] // fy, fy, pe.shape[1] // fx, fx).mean(
                axis=(1, 3)
            )
        cb_dims.append((-(-p.shape[0] // 8), -(-p.shape[1] // 8)))
        th_, tw_ = mcus_y * vs * 8, mcus_x * hs * 8
        p = np.pad(p, ((0, th_ - p.shape[0]), (0, tw_ - p.shape[1])), mode="edge")
        bh, bw = th_ // 8, tw_ // 8
        blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
        coef = np.einsum("ux,ijxy,vy->ijuv", _DCT_T, blocks, _DCT_T)
        quant = np.round(
            coef.reshape(bh, bw, 64) / qts[min(ci, 1)]
        ).astype(np.int64)
        comps_zz.append(quant[:, :, _ZIGZAG])

    if progressive:
        scans = _write_progressive_scans(
            comps_zz, samp, cb_dims, mcus_x, mcus_y, restart_interval
        )
    else:
        scans = [(
            list(range(ncomp)), 0, 63, 0, 0,
            _baseline_entropy(comps_zz, samp, mcus_x, mcus_y, restart_interval),
        )]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, qt in enumerate(qts):
        zzq = qt[_ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 3 + 64) + bytes([tq]) + zzq
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sof = 0xC2 if progressive else 0xC0
    out += bytes([0xFF, sof]) + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h_img, w_img, ncomp)
    for c in range(ncomp):
        hs, vs = samp[c]
        out += bytes([c + 1, (hs << 4) | vs, min(c, 1)])  # id, sampling, qtable
    tables = [(0, 0, _DC_LUMA)]
    if ncomp == 3:
        tables.append((0, 1, _DC_CHROMA))
    if progressive:
        tables.append((1, 0, _AC_CATCH_ALL))
    else:
        tables.append((1, 0, _AC_LUMA))
        if ncomp == 3:
            tables.append((1, 1, _AC_CHROMA))
    for tc, th, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    for comp_ids, ss, se, ah, al, entropy in scans:
        ns = len(comp_ids)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comp_ids:
            if progressive:
                td, ta = min(ci, 1), 0  # catch-all AC table id 0
            else:
                td = ta = min(ci, 1)
            out += bytes([ci + 1, (td << 4) | ta])
        out += bytes([ss, se, (ah << 4) | al])
        out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _baseline_entropy(comps_zz, samp, mcus_x, mcus_y, restart_interval) -> bytes:
    ncomp = len(comps_zz)
    dc_l = _huff_codes(*_DC_LUMA)
    ac_l = _huff_codes(*_AC_LUMA)
    dc_c = _huff_codes(*_DC_CHROMA)
    ac_c = _huff_codes(*_AC_CHROMA)
    w = _BitWriter()
    entropy = bytearray()
    preds = [0] * ncomp
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            w.flush()
            entropy += w.out
            entropy += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            w = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcus_x)
        for ci, ((hs, vs), zz) in enumerate(zip(samp, comps_zz)):
            for by in range(vs):
                for bx in range(hs):
                    preds[ci] = _encode_block(
                        w, zz[my * vs + by, mx * hs + bx], preds[ci],
                        dc_l if ci == 0 else dc_c, ac_l if ci == 0 else ac_c,
                    )
    w.flush()
    entropy += w.out
    return bytes(entropy)


def _write_progressive_scans(comps_zz, samp, cb_dims, mcus_x, mcus_y,
                             restart_interval):
    """The scan script: DC first (Al=1, interleaved) → DC refine →
    per component AC 1-5 then 6-63 (first, Al=1) → per component AC
    refinement (Ah=1, Al=0). Returns (comp_ids, Ss, Se, Ah, Al,
    entropy bytes) tuples."""
    ncomp = len(comps_zz)
    dc_codes = [_huff_codes(*(_DC_LUMA if ci == 0 else _DC_CHROMA)) for ci in range(ncomp)]
    ac_codes = _huff_codes(*_AC_CATCH_ALL)
    scans = []

    # --- DC first, interleaved, Al=1
    pw = _ProgWriter(ac_codes)
    preds = [0] * ncomp
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            pw.restart()
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcus_x)
        for ci, ((hs, vs), zz) in enumerate(zip(samp, comps_zz)):
            for by in range(vs):
                for bx in range(hs):
                    v = int(zz[my * vs + by, mx * hs + bx, 0]) >> 1  # DC: arithmetic shift
                    diff = v - preds[ci]
                    preds[ci] = v
                    s, bits = _magnitude(diff)
                    code, length = dc_codes[ci][s]
                    pw.w.write(code, length)
                    pw.bits(bits, s)
    scans.append((list(range(ncomp)), 0, 0, 0, 1, pw.finish()))

    # --- DC refine, interleaved, Ah=1 Al=0 (one raw bit per block)
    pw = _ProgWriter(ac_codes)
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            pw.restart()
        my, mx = divmod(mcu, mcus_x)
        for ci, ((hs, vs), zz) in enumerate(zip(samp, comps_zz)):
            for by in range(vs):
                for bx in range(hs):
                    pw.bits(int(zz[my * vs + by, mx * hs + bx, 0]) & 1, 1)
    scans.append((list(range(ncomp)), 0, 0, 1, 0, pw.finish()))

    # --- AC first scans per component (band split), Al=1
    for ss_, se_ in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            cbh, cbw = cb_dims[ci]
            pw = _ProgWriter(ac_codes)
            for blk in range(cbh * cbw):
                if restart_interval and blk and blk % restart_interval == 0:
                    pw.restart()
                by, bx = divmod(blk, cbw)
                _prog_ac_first_block(pw, comps_zz[ci][by, bx], ss_, se_, 1)
            scans.append(([ci], ss_, se_, 0, 1, pw.finish()))

    # --- AC refinement per component, Ah=1 Al=0
    for ci in range(ncomp):
        cbh, cbw = cb_dims[ci]
        pw = _ProgWriter(ac_codes)
        for blk in range(cbh * cbw):
            if restart_interval and blk and blk % restart_interval == 0:
                pw.restart()
            by, bx = divmod(blk, cbw)
            _prog_ac_refine_block(pw, comps_zz[ci][by, bx], 1, 63, 0)
        scans.append(([ci], 1, 63, 1, 0, pw.finish()))
    return scans
