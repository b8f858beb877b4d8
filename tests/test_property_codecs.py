"""Property tests for the native media codecs (X5).

Round-trip laws the stdlib/numpy codecs must satisfy on
hypothesis-generated inputs — no Spark jobs here (the codecs are pure
functions; the Spark plumbing is covered in test_multimodal.py):

- BMP and PNG: encode → decode is pixel-identical for any uint8 RGB
  raster (PNG additionally decodes hand-filtered files — covered by
  the directed tests; here the encoder's filter-0 path).
- GIF: index raster + palette round-trip exactly for any palette size
  ≤ 256; LZW encode → decode is the identity on any index stream.
- JPEG: lossy, so the law is bounded error on SMOOTH images (per-block
  constant rasters: error ≤ quant-table step) plus structural validity
  for arbitrary rasters (decodes to the right shape, no exception).
- WAV resample: identity at equal rates for any PCM16 signal;
  mono-mix averages exactly.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from logsqlite_spark.operators.jpeg import decode_jpeg, encode_jpeg
from logsqlite_spark.operators.multimodal import (
    _decode_bmp,
    _decode_gif_indexed,
    _decode_png,
    _decode_wav,
    _encode_bmp,
    _encode_gif,
    _encode_png,
    _encode_wav,
    _lzw_decode,
    _lzw_encode_literals,
)

_dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


def _raster(seed: int, h: int, w: int):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31), _dims)
def test_bmp_roundtrip_any_raster(seed, dims):
    img = _raster(seed, *dims)
    assert (_decode_bmp(_encode_bmp(img)) == img).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31), _dims)
def test_png_roundtrip_any_raster(seed, dims):
    img = _raster(seed, *dims)
    assert (_decode_png(_encode_png(img)) == img).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31), _dims, st.integers(1, 256))
def test_gif_roundtrip_any_palette(seed, dims, n_colors):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, dims, dtype=np.uint8)
    got_idx, got_pal = _decode_gif_indexed(_encode_gif(idx, pal))
    assert (got_idx == idx).all()
    assert (got_pal[:n_colors] == pal).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 7), min_size=1, max_size=2000),
       st.integers(3, 6))
def test_lzw_literals_identity(indices, min_code):
    data = bytes(indices)
    assert _lzw_decode(_lzw_encode_literals(data, min_code),
                       min_code) == data


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31), st.integers(1, 3), st.integers(1, 3))
def test_jpeg_blockwise_constant_error_bound(seed, bh, bw):
    """Per-8x8-block constant images: every DCT coefficient except DC
    is 0, so the only loss is DC quantization — error ≤ ~step/2 per
    channel after color round-trips (flat luma step 16, chroma 24)."""
    rng = np.random.default_rng(seed)
    blocks = rng.integers(16, 240, (bh, bw, 3), dtype=np.uint8)
    img = np.kron(blocks, np.ones((8, 8, 1), np.uint8)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 24, err.max()


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**31), _dims)
def test_jpeg_decodes_arbitrary_rasters_structurally(seed, dims):
    img = _raster(seed, *dims)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(img, subsample=sub))
        assert out.shape == img.shape and out.dtype == np.uint8


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31), st.integers(1, 500), st.integers(1, 2))
def test_wav_roundtrip_any_signal(seed, n, ch):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32767, (n, ch)).astype(np.int16)
    got, rate = _decode_wav(_encode_wav(s, 8000))
    assert rate == 8000 and (got == s).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31), _dims, st.booleans())
def test_webp_vp8l_roundtrip_any_raster(seed, dims, lz77):
    from logsqlite_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    img = _raster(seed, *dims)
    got = decode_webp(encode_webp_lossless(img, use_lz77=lz77))
    assert (got == img).all()


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31), st.integers(1, 16), st.integers(2, 20))
def test_webp_vp8l_lz77_on_tiled_rasters(seed, w, reps):
    """Vertical tilings exercise the backward-reference emitter; the
    decode must be identical whichever path encoded each pixel."""
    from logsqlite_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    row = np.random.default_rng(seed).integers(
        0, 256, (1, w, 3), dtype=np.uint8)
    img = np.tile(row, (reps, 1, 1))
    assert (decode_webp(encode_webp_lossless(img)) == img).all()
