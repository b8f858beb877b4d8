"""Native VP8L (WEBP-lossless) codec: encoder round-trips plus
hand-crafted spec streams for the decoder paths our encoder doesn't
emit (transforms, color cache, meta prefix groups)."""

import numpy as np
import pytest

from logsqlite_spark.operators.webp import (
    _BitWriter,
    _cache_key,
    _canonical,
    _ENC_BYTE,
    _ENC_GREEN,
    _s8,
    _write_flat_code,
    decode_webp,
    encode_webp_lossless,
)


def _riff(body: bytes) -> bytes:
    chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _simple1(bw: _BitWriter, sym: int) -> None:
    """Simple prefix code, one symbol (zero bits per read)."""
    bw.write(1, 1)
    bw.write(0, 1)           # num_symbols - 1 = 0
    if sym > 1:
        bw.write(1, 1)       # 8-bit symbol
        bw.write(sym, 8)
    else:
        bw.write(0, 1)
        bw.write(sym, 1)


def _subimage_constant(bw: _BitWriter, argb: int, n_px: int) -> None:
    """An entropy-coded sub-image whose every pixel is ``argb``: all
    five codes single-symbol, so the pixels cost zero bits."""
    bw.write(0, 1)  # no color cache
    _simple1(bw, (argb >> 8) & 0xFF)    # green
    _simple1(bw, (argb >> 16) & 0xFF)   # red
    _simple1(bw, argb & 0xFF)           # blue
    _simple1(bw, (argb >> 24) & 0xFF)   # alpha
    _simple1(bw, 0)                     # distance (unused)
    del n_px  # zero bits per pixel — nothing to emit


def _literal_codes(bw: _BitWriter) -> None:
    """The encoder's flat literal codes (280-green + 3 byte codes +
    trivial distance)."""
    _write_flat_code(bw, [8 if s < 232 else 9 for s in range(280)],
                     (8, 9))
    for _ in range(3):
        _write_flat_code(bw, [8] * 256, (0, 8))
    _simple1(bw, 0)


def _emit_literal(bw: _BitWriter, a: int, r: int, g: int,
                  b: int) -> None:
    code, n = _ENC_GREEN[g]
    bw.write_code(code, n)
    for ch in (r, b, a):
        code, n = _ENC_BYTE[ch]
        bw.write_code(code, n)


def test_roundtrip_random_images():
    rng = np.random.default_rng(11)
    for (h, w) in [(1, 1), (2, 3), (7, 5), (16, 16), (9, 31)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for lz in (False, True):
            got = decode_webp(encode_webp_lossless(img, use_lz77=lz))
            assert (got == img).all(), (h, w, lz)


def test_lz77_row_copies_compress_and_roundtrip():
    rng = np.random.default_rng(3)
    img = np.tile(rng.integers(0, 256, (1, 24, 3), dtype=np.uint8),
                  (10, 1, 1))
    small = encode_webp_lossless(img, use_lz77=True)
    big = encode_webp_lossless(img, use_lz77=False)
    assert len(small) < len(big) / 2
    assert (decode_webp(small) == img).all()


def test_lossy_vp8_routes_to_integration_point():
    payload = (b"RIFF" + (12).to_bytes(4, "little") + b"WEBP"
               + b"VP8 " + (0).to_bytes(4, "little"))
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_webp(payload)


def test_not_webp_raises():
    with pytest.raises(ValueError, match="not a WEBP"):
        decode_webp(b"RIFF....WAVE")


def test_vp8x_container_walk_finds_vp8l():
    img = np.full((2, 2, 3), 9, np.uint8)
    plain = encode_webp_lossless(img)
    # splice a VP8X chunk ahead of the VP8L chunk
    vp8l_chunk = plain[12:]  # strip RIFF+size+WEBP, keep VP8L chunk
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + b"\x00" * 10
    riff = b"WEBP" + vp8x + vp8l_chunk
    payload = b"RIFF" + len(riff).to_bytes(4, "little") + riff
    assert (decode_webp(payload) == img).all()


def test_subtract_green_transform():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _literal_codes(bw)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            _emit_literal(bw, 255, (r - g) & 0xFF, g, (b - g) & 0xFF)
    assert (decode_webp(_riff(bytes(bw.out))) == img).all()


def test_predictor_transform_mode_top():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)      # PREDICTOR
    bw.write(2, 3)      # size_bits = 4 -> one 1x1 tile for a 4x4 img
    _subimage_constant(bw, 0xFF000200, 1)  # green=2: mode T
    bw.write(0, 1)      # no more transforms
    bw.write(0, 1)
    bw.write(0, 1)
    _literal_codes(bw)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            if x == 0 and y == 0:
                pa, pr, pg, pb = 0xFF, 0, 0, 0
            elif y == 0:
                pr, pg, pb = (int(v) for v in img[y, x - 1])
                pa = 0xFF
            elif x == 0:
                pr, pg, pb = (int(v) for v in img[y - 1, x])
                pa = 0xFF
            else:  # mode 2: top
                pr, pg, pb = (int(v) for v in img[y - 1, x])
                pa = 0xFF
            _emit_literal(bw, (255 - pa) & 0xFF, (r - pr) & 0xFF,
                          (g - pg) & 0xFF, (b - pb) & 0xFF)
    assert (decode_webp(_riff(bytes(bw.out))) == img).all()


def test_color_transform_roundtrip():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    g2r, g2b, r2b = 0x23, 0xE9, 0x5C  # arbitrary signed 8-bit deltas
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)      # COLOR_TRANSFORM
    bw.write(2, 3)      # size_bits = 4 -> one tile
    _subimage_constant(bw, 0xFF000000 | (g2r << 16) | (g2b << 8) | r2b, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    _literal_codes(bw)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            rr = (r - ((_s8(g2r) * _s8(g)) >> 5)) & 0xFF
            bb = (b - ((_s8(g2b) * _s8(g)) >> 5)
                  - ((_s8(r2b) * _s8(r)) >> 5)) & 0xFF
            _emit_literal(bw, 255, rr, g, bb)
    assert (decode_webp(_riff(bytes(bw.out))) == img).all()


def test_color_indexing_bundled():
    pal = np.array([[10, 20, 30], [200, 100, 0],
                    [1, 2, 3], [250, 250, 250]], np.uint8)
    idx = np.array([[0, 1, 2, 3, 3, 1], [2, 2, 0, 1, 0, 3]], np.uint8)
    img = pal[idx]
    h, w = idx.shape
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(3, 2)          # COLOR_INDEXING
    bw.write(3, 8)          # palette size - 1
    # palette as a 4x1 entropy image, DELTA-coded between entries
    bw.write(0, 1)          # palette sub-image: no cache
    _literal_codes(bw)
    prev = (0, 0, 0)
    for i in range(4):
        r, g, b = (int(v) for v in pal[i])
        _emit_literal(bw, 0 if i else 255, (r - prev[0]) & 0xFF,
                      (g - prev[1]) & 0xFF, (b - prev[2]) & 0xFF)
        prev = (r, g, b)
    bw.write(0, 1)          # end of transforms
    bw.write(0, 1)          # no cache (spatial)
    bw.write(0, 1)          # no meta
    _literal_codes(bw)
    # 4-color palette -> 2 bits per index, 4 indices per green byte
    packed_w = -(-w // 4)
    for y in range(h):
        for px in range(packed_w):
            v = 0
            for k in range(4):
                x = px * 4 + k
                if x < w:
                    v |= int(idx[y, x]) << (2 * k)
            _emit_literal(bw, 255, 0, v, 0)
    assert (decode_webp(_riff(bytes(bw.out))) == img).all()


def test_color_cache_hit():
    h, w = 1, 3
    cache_bits = 4
    argb = 0xFF112233
    key = _cache_key(argb, cache_bits)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)            # no transforms
    bw.write(1, 1)            # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)            # no meta
    # green alphabet = 256 + 24 + 16 = 296: flat complete code
    n8 = 512 - 296
    _write_flat_code(bw, [8 if s < n8 else 9 for s in range(296)],
                     (8, 9))
    for _ in range(3):
        _write_flat_code(bw, [8] * 256, (0, 8))
    _simple1(bw, 0)
    green = _canonical({s: (8 if s < n8 else 9) for s in range(296)})

    def lit(a, r, g, b):
        code, n = green[g]
        bw.write_code(code, n)
        for ch in (r, b, a):
            code, n = _ENC_BYTE[ch]
            bw.write_code(code, n)

    lit(0xFF, 0x11, 0x22, 0x33)       # the cached pixel
    lit(0xFF, 9, 9, 9)                # a different pixel
    code, n = green[280 + key]        # cache reference
    bw.write_code(code, n)
    got = decode_webp(_riff(bytes(bw.out)))
    assert (got[0, 0] == (0x11, 0x22, 0x33)).all()
    assert (got[0, 1] == (9, 9, 9)).all()
    assert (got[0, 2] == (0x11, 0x22, 0x33)).all()


def test_meta_prefix_groups():
    """8x1 image, meta tiles of 4 px: tile 0 -> group 0 (solid A),
    tile 1 -> group 1 (solid B)."""
    w, h = 8, 1
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)        # no transforms
    bw.write(0, 1)        # no cache
    bw.write(1, 1)        # meta prefix groups present
    bw.write(0, 3)        # meta_bits = 2 -> 2x1 entropy image
    # entropy image: pixel k has (r<<8)|g = group index k
    bw.write(0, 1)        # entropy sub-image: no cache
    _literal_codes(bw)
    _emit_literal(bw, 255, 0, 0, 0)   # group 0
    _emit_literal(bw, 255, 0, 1, 0)   # group 1
    for argb in (0xFFAA1122, 0xFF334455):   # two groups' codes
        _simple1(bw, (argb >> 8) & 0xFF)
        _simple1(bw, (argb >> 16) & 0xFF)
        _simple1(bw, argb & 0xFF)
        _simple1(bw, (argb >> 24) & 0xFF)
        _simple1(bw, 0)
    # pixels cost zero bits (all codes single-symbol)
    got = decode_webp(_riff(bytes(bw.out)))
    assert (got[0, :4] == (0xAA, 0x11, 0x22)).all()
    assert (got[0, 4:] == (0x33, 0x44, 0x55)).all()


def test_lz77_linear_distance_beyond_map():
    """Distance codes above 120 are linear distances (code - 120):
    hand-craft a copy with distance 130 on a 1x200 image."""
    from logsqlite_spark.operators.webp import (
        _prefix_encode_value,
        _write_flat_code,
    )

    w, h = 200, 1
    rng = np.random.default_rng(4)
    first = rng.integers(0, 256, (130, 3))
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _write_flat_code(bw, [8 if s < 232 else 9 for s in range(280)],
                     (8, 9))
    for _ in range(3):
        _write_flat_code(bw, [8] * 256, (0, 8))
    # distance: flat complete 40-symbol code (24@5 bits + 16@6)
    _write_flat_code(bw, [5 if s < 24 else 6 for s in range(40)],
                     (5, 6))
    dist_canon = _canonical({s: (5 if s < 24 else 6)
                             for s in range(40)})
    for r, g, b in first:
        _emit_literal(bw, 255, int(r), int(g), int(b))
    # copy 70 px from distance 130 (code 250 -> linear 130)
    lcode, lbits, lextra = _prefix_encode_value(70)
    gc, gn = _ENC_GREEN[256 + lcode]
    bw.write_code(gc, gn)
    if lbits:
        bw.write(lextra, lbits)
    dcode, dbits, dextra = _prefix_encode_value(250)
    c, n = dist_canon[dcode]
    bw.write_code(c, n)
    if dbits:
        bw.write(dextra, dbits)
    got = decode_webp(_riff(bytes(bw.out)))
    assert (got[0, :130] == first).all()
    assert (got[0, 130:] == first[:70]).all()
