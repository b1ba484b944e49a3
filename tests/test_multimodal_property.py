"""Property tests for the pure-numpy multimodal decoders.

The uncompressed formats (PPM P6, 24-bit BI_RGB BMP, 16-bit PCM WAV,
YUV4MPEG2) are fixed public layouts, so encode → decode must be the
identity over ARBITRARY shapes — hypothesis drives sizes that hit
BMP's 4-byte row padding in every residue class, WAV's word-aligned
chunk padding, and y4m's odd-dimension C444 frames. No Spark session:
these run the byte layer the Arrow batchers call per row.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from miso_spark.functions.multimodal import (
    _decode_payload,
    encode_bmp,
    encode_ppm,
    encode_wav,
    encode_y4m,
)


def _img(w: int, h: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


@settings(max_examples=120, deadline=None)
@given(
    w=st.integers(1, 41),
    h=st.integers(1, 33),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_bmp_roundtrip_any_shape(w, h, seed):
    img = _img(w, h, seed)
    assert (_decode_payload("ppm", encode_ppm(img)) == img).all()
    # w % 4 ∈ {0,1,2,3} all hit distinct BMP padding widths
    assert (_decode_payload("bmp", encode_bmp(img)) == img).all()


@settings(max_examples=120, deadline=None)
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


@settings(max_examples=60, deadline=None)
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
