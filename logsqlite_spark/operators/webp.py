"""Native WEBP-lossless (VP8L) codec — pure stdlib/numpy, from the
public bitstream spec ("WebP Lossless Bitstream Specification",
https://developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification)
— closing the last image format with no native path (VERDICT r10 #4).

Decoder: full VP8L — LSB-first bit reading, simple and
code-length-coded (canonical) prefix codes, LZ77 backward references
with the 120-entry 2D distance map, the color cache, meta prefix
groups, and all four inverse transforms (predictor with its 14 modes,
color transform, subtract-green, color indexing with sub-byte
bundling).  VP8 LOSSY and ALPH stay behind the marked Pillow
integration point — VP8 is a full DCT video intra-frame codec and is
not a reasonable pure-Python ask (same boundary as progressive JPEG).

Encoder: spec-legal minimal VP8L writer used to build test payloads
and round-trip bit-exactly — no transforms, no color cache, one
prefix group; literals under a fixed complete canonical code (232
8-bit + 48 9-bit green symbols, flat 8-bit ARB channels), plus an
optional one-row-up LZ77 emitter (distance = width, the first entry
of the distance map) so the backward-reference path is exercised by
our own streams.  Like the PNG/GIF/JPEG codecs this is documented
test-scale: per-pixel Python loops are the honest stdlib cost, and
production rate belongs to the marked native-lib integration points.

Reference parity note: the reference engine (daschr/logsqlite) has no
media surface; this extends the multimodal tier the build plan added
for LLM-pipeline workloads (SURVEY.md §2 X5).
"""

from __future__ import annotations

import numpy as np

# kCodeLengthCodeOrder — the fixed order code-length-code lengths are
# stored in (spec §"Decoding the Code Lengths")
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 7, 8, 9, 10, 11, 12, 13,
             14, 15, 6)

# the 120-entry 2D distance map: distance codes 1..120 address a
# near-pixel neighborhood (dx, dy) instead of a linear distance
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (5, 8), (-5, 8), (6, 7), (-6, 7), (8, 4), (3, 8), (-3, 8), (7, 6),
    (-7, 6), (8, 5), (8, 6), (6, 8), (-6, 8), (7, 7), (-7, 7), (8, 7),
    (7, 8), (-7, 8), (8, 8),
)


class _BitReader:
    """LSB-first bit reader (VP8L packs bits low-bit-first)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.bit = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.out.append(0)
            if (v >> i) & 1:
                self.out[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def write_code(self, code: int, length: int) -> None:
        """Huffman codes are consumed MSB-first by the tree walk —
        emit the canonical code's bits from its MSB down."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)


def _canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE-style canonical assignment
    (shorter first; within a length, ascending symbol)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    for ln in sorted(set(lengths.values())):
        for sym in sorted(s for s, v in lengths.items() if v == ln):
            out[sym] = (code, ln)
            code += 1
        code <<= 1
    return out


class _PrefixCode:
    """Decoder-side prefix code: (length, code) -> symbol, plus the
    0-bit single-symbol degenerate form both huffman flavors allow."""

    def __init__(self, lengths: dict[int, int]) -> None:
        nz = {s: v for s, v in lengths.items() if v > 0}
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single: int | None = next(iter(nz))
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        self.table = {(ln, code): sym
                      for sym, (code, ln) in _canonical(nz).items()}
        self.max_len = max(nz.values())

    @classmethod
    def trivial(cls, symbol: int) -> "_PrefixCode":
        c = cls.__new__(cls)
        c.single = symbol
        c.table = {}
        return c

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        if num_symbols == 1:
            return _PrefixCode.trivial(sym0)
        sym1 = br.read(8)
        return _PrefixCode({sym0: 1, sym1: 1})
    # code-length-coded
    num_cl = br.read(4) + 4
    cl_lengths: dict[int, int] = {}
    for i in range(num_cl):
        ln = br.read(3)
        if ln:
            cl_lengths[_CL_ORDER[i]] = ln
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths: dict[int, int] = {}
    symbol, prev = 0, 8
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            if cl:
                lengths[symbol] = cl
                prev = cl
            symbol += 1
        else:
            if cl == 16:
                repeat, v = 3 + br.read(2), prev
            elif cl == 17:
                repeat, v = 3 + br.read(3), 0
            else:
                repeat, v = 11 + br.read(7), 0
            for _ in range(repeat):
                if symbol >= alphabet:
                    raise ValueError("VP8L: code-length repeat overrun")
                if v:
                    lengths[symbol] = v
                symbol += 1
    return _PrefixCode(lengths)


def _prefix_decode_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix coding (spec §"LZ77 prefix
    coding"): codes 0-3 are the values 1-4; above, the code names a
    power-of-two slot plus extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode_value(v: int) -> tuple[int, int, int]:
    """value -> (code, n_extra_bits, extra)."""
    if v <= 4:
        return v - 1, 0, 0
    vm1 = v - 1
    hb = vm1.bit_length() - 1
    extra_bits = hb - 1
    b = (vm1 >> extra_bits) & 1
    return 2 * extra_bits + 2 + b, extra_bits, vm1 & ((1 << extra_bits) - 1)


_HASH_MUL = 0x1E35A7BD


def _cache_key(argb: int, bits: int) -> int:
    return ((argb * _HASH_MUL) & 0xFFFFFFFF) >> (32 - bits)


def _decode_spatial(br: _BitReader, w: int, h: int,
                    level0: bool) -> list[int]:
    """One entropy-coded ARGB image (spec §4/§5): optional color
    cache, optional meta prefix groups (level0 only), then the
    literal/backref/cache-ref pixel stream.  Returns w*h packed ARGB
    ints in raster order."""
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError(f"VP8L: bad color-cache bits {cache_bits}")
    meta_idx = None
    meta_bits = 0
    num_groups = 1
    if level0 and br.read(1):
        meta_bits = br.read(3) + 2
        ew = -(-w // (1 << meta_bits))
        eh = -(-h // (1 << meta_bits))
        entropy = _decode_spatial(br, ew, eh, False)
        meta_idx = [((p >> 16) & 0xFF) << 8 | ((p >> 8) & 0xFF)
                    for p in entropy]
        num_groups = max(meta_idx) + 1
        meta_w = ew
    groups = []
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    for _ in range(num_groups):
        groups.append((_read_prefix_code(br, green_alpha),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 40)))
    cache = [0] * (1 << cache_bits) if cache_bits else None
    px = [0] * (w * h)
    pos = 0
    n = w * h
    while pos < n:
        if meta_idx is None:
            g_c, r_c, b_c, a_c, d_c = groups[0]
        else:
            x, y = pos % w, pos // w
            gi = meta_idx[(y >> meta_bits) * meta_w + (x >> meta_bits)]
            g_c, r_c, b_c, a_c, d_c = groups[gi]
        s = g_c.read(br)
        if s < 256:
            r = r_c.read(br)
            b = b_c.read(br)
            a = a_c.read(br)
            v = (a << 24) | (r << 16) | (s << 8) | b
            px[pos] = v
            if cache is not None:
                cache[_cache_key(v, cache_bits)] = v
            pos += 1
        elif s < 280:
            length = _prefix_decode_value(s - 256, br)
            dist_code = _prefix_decode_value(d_c.read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(dx + dy * w, 1)
            if pos - dist < 0 or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                v = px[pos - dist]
                px[pos] = v
                if cache is not None:
                    cache[_cache_key(v, cache_bits)] = v
                pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L: cache ref without color cache")
            px[pos] = cache[s - 280]
            pos += 1
    return px


def _avg2(a: int, b: int) -> int:
    return (((a >> 24) + (b >> 24)) >> 1) << 24 \
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16 \
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8 \
        | (((a & 0xFF) + (b & 0xFF)) >> 1)


def _channels(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _select(L: int, T: int, TL: int) -> int:
    pl = pt = 0
    for cl, ct, ctl in zip(_channels(L), _channels(T), _channels(TL)):
        p = cl + ct - ctl
        pl += abs(p - cl)
        pt += abs(p - ct)
    return L if pl < pt else T


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _cas_full(L: int, T: int, TL: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp(((L >> sh) & 0xFF) + ((T >> sh) & 0xFF)
                   - ((TL >> sh) & 0xFF))
        out |= c << sh
    return out


def _cas_half(L: int, T: int, TL: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (((L >> sh) & 0xFF) + ((T >> sh) & 0xFF)) >> 1
        b = (TL >> sh) & 0xFF
        # C truncating division (toward zero), not Python floor
        c = _clamp(a + int((a - b) / 2))
        out |= c << sh
    return out


def _apply_inverse_predictor(px: list[int], w: int, h: int,
                             timg: list[int], tbits: int,
                             tw: int) -> None:
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = px[pos - 1]
        elif x == 0:
            pred = px[pos - w]
        else:
            mode = (timg[(y >> tbits) * tw + (x >> tbits)] >> 8) & 0xFF
            L = px[pos - 1]
            T = px[pos - w]
            TL = px[pos - w - 1]
            # for the rightmost column this addresses the current
            # row's first pixel — libwebp's flat-buffer semantics,
            # kept for bit-exact compatibility
            TR = px[pos - w + 1]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = _avg2(_avg2(L, TR), T)
            elif mode == 6:
                pred = _avg2(L, TL)
            elif mode == 7:
                pred = _avg2(L, T)
            elif mode == 8:
                pred = _avg2(TL, T)
            elif mode == 9:
                pred = _avg2(T, TR)
            elif mode == 10:
                pred = _avg2(_avg2(L, TL), _avg2(T, TR))
            elif mode == 11:
                pred = _select(L, T, TL)
            elif mode == 12:
                pred = _cas_full(L, T, TL)
            elif mode == 13:
                pred = _cas_half(L, T, TL)
            else:
                raise ValueError(f"VP8L: bad predictor mode {mode}")
        p = px[pos]
        px[pos] = ((((p >> 24) + (pred >> 24)) & 0xFF) << 24
                   | ((((p >> 16) & 0xFF) + ((pred >> 16) & 0xFF))
                      & 0xFF) << 16
                   | ((((p >> 8) & 0xFF) + ((pred >> 8) & 0xFF))
                      & 0xFF) << 8
                   | (((p & 0xFF) + (pred & 0xFF)) & 0xFF))


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _apply_inverse_color_transform(px: list[int], w: int, h: int,
                                   timg: list[int], tbits: int,
                                   tw: int) -> None:
    for pos in range(w * h):
        x, y = pos % w, pos // w
        t = timg[(y >> tbits) * tw + (x >> tbits)]
        g2r = (t >> 16) & 0xFF
        g2b = (t >> 8) & 0xFF
        r2b = t & 0xFF
        p = px[pos]
        g = (p >> 8) & 0xFF
        r = ((p >> 16) & 0xFF)
        b = p & 0xFF
        r = (r + ((_s8(g2r) * _s8(g)) >> 5)) & 0xFF
        b = (b + ((_s8(g2b) * _s8(g)) >> 5)) & 0xFF
        b = (b + ((_s8(r2b) * _s8(r)) >> 5)) & 0xFF
        px[pos] = (p & 0xFF000000) | (r << 16) | (g << 8) | b


def _apply_inverse_subtract_green(px: list[int]) -> None:
    for i, p in enumerate(px):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        px[i] = (p & 0xFF00FF00) | (r << 16) | b


def _palette_width_bits(n: int) -> int:
    if n <= 2:
        return 3
    if n <= 4:
        return 2
    if n <= 16:
        return 1
    return 0


def _apply_inverse_color_indexing(px: list[int], w: int, h: int,
                                  palette: list[int],
                                  packed_w: int) -> list[int]:
    wb = _palette_width_bits(len(palette))
    if wb == 0:
        return [palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF)
                < len(palette) else 0 for p in px]
    per = 1 << wb
    bpp = 8 >> wb
    mask = (1 << bpp) - 1
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            packed = px[y * packed_w + (x >> wb)]
            idx = ((packed >> 8) & 0xFF) >> ((x % per) * bpp) & mask
            out[y * w + x] = palette[idx] if idx < len(palette) else 0
    return out


def _decode_vp8l(data: bytes) -> np.ndarray:
    br = _BitReader(data)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    # transforms (level0 only; each type at most once).  Each record
    # keeps the image width AT ITS STAGE — color indexing shrinks the
    # width for everything decoded after it.
    transforms: list[tuple] = []
    seen: set[int] = set()
    cur_w = w
    while br.read(1):
        t = br.read(2)
        if t in seen:
            raise ValueError("VP8L: repeated transform")
        seen.add(t)
        if t == 0:  # predictor
            tbits = br.read(3) + 2
            tw = -(-cur_w // (1 << tbits))
            th = -(-h // (1 << tbits))
            timg = _decode_spatial(br, tw, th, False)
            transforms.append(("pred", tbits, tw, timg, cur_w))
        elif t == 1:  # color transform
            tbits = br.read(3) + 2
            tw = -(-cur_w // (1 << tbits))
            th = -(-h // (1 << tbits))
            timg = _decode_spatial(br, tw, th, False)
            transforms.append(("color", tbits, tw, timg, cur_w))
        elif t == 2:  # subtract green
            transforms.append(("subgreen",))
        else:  # color indexing
            n_pal = br.read(8) + 1
            raw = _decode_spatial(br, n_pal, 1, False)
            palette = []
            prev = 0
            for p in raw:  # palette entries are delta-coded
                entry = ((((p >> 24) + (prev >> 24)) & 0xFF) << 24
                         | ((((p >> 16) & 0xFF)
                             + ((prev >> 16) & 0xFF)) & 0xFF) << 16
                         | ((((p >> 8) & 0xFF)
                             + ((prev >> 8) & 0xFF)) & 0xFF) << 8
                         | (((p & 0xFF) + (prev & 0xFF)) & 0xFF))
                palette.append(entry)
                prev = entry
            wb = _palette_width_bits(n_pal)
            full_w = cur_w
            cur_w = -(-cur_w // (1 << wb))
            transforms.append(("index", palette, full_w, cur_w))
    px = _decode_spatial(br, cur_w, h, True)
    for tr in reversed(transforms):
        if tr[0] == "pred":
            _, tbits, tw, timg, tw_full = tr
            _apply_inverse_predictor(px, tw_full, h, timg, tbits, tw)
        elif tr[0] == "color":
            _, tbits, tw, timg, tw_full = tr
            _apply_inverse_color_transform(px, tw_full, h, timg,
                                           tbits, tw)
        elif tr[0] == "subgreen":
            _apply_inverse_subtract_green(px)
        else:
            _, palette, full_w, packed_w = tr
            px = _apply_inverse_color_indexing(px, full_w, h, palette,
                                               packed_w)
    arr = np.array(px, np.uint32).reshape(h, w)
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, :, 0] = (arr >> 16) & 0xFF
    rgb[:, :, 1] = (arr >> 8) & 0xFF
    rgb[:, :, 2] = arr & 0xFF
    return rgb


def decode_webp(payload: bytes) -> np.ndarray:
    """WEBP bytes -> (H, W, 3) uint8 RGB.  Lossless (VP8L) decodes
    natively; lossy (VP8) routes to the Pillow integration point."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WEBP payload")
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        ln = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"VP8L":
            return _decode_vp8l(body)
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy (VP8) WEBP needs an external codec — the "
                "marked Pillow integration point; VP8L decodes "
                "natively")
        # VP8X and metadata chunks: keep walking for the image chunk
    raise ValueError("WEBP container has no image chunk")


# ---------------------------------------------------------------------------
# minimal spec-legal encoder (test payloads + lossless round-trip)

# canonical green code: 232 symbols @8 bits + 48 @9 (2*232+48 = 512 —
# complete Kraft over the 280-symbol no-cache alphabet)
_ENC_GREEN = _canonical({s: (8 if s < 232 else 9) for s in range(280)})
_ENC_BYTE = _canonical({s: 8 for s in range(256)})  # identity byte code


def _write_flat_code(bw: _BitWriter, lengths: list[int],
                     cl_set: tuple[int, ...]) -> None:
    """Emit a code-length-coded prefix code whose code lengths are
    ``lengths`` (one per symbol, all drawn from ``cl_set``), with a
    two-symbol code-length code."""
    assert len(cl_set) == 2
    bw.write(0, 1)  # not simple
    order_pos = {v: i for i, v in enumerate(_CL_ORDER)}
    num_cl = max(order_pos[c] for c in cl_set) + 1
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(1 if _CL_ORDER[i] in cl_set else 0, 3)
    cl_code = _canonical({c: 1 for c in cl_set})
    bw.write(0, 1)  # no explicit max_symbol: read exactly len(lengths)
    for ln in lengths:
        code, n = cl_code[ln]
        bw.write_code(code, n)


def encode_webp_lossless(arr, use_lz77: bool = True) -> bytes:
    """(H, W, 3) uint8 RGB -> lossless WEBP (VP8L) bytes.  One prefix
    group, no transforms, no color cache; ``use_lz77`` emits
    row-above copies (distance = width) for vertical runs >= 3."""
    a = np.asarray(arr, np.uint8)
    h, w = a.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions out of range")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix groups
    _write_flat_code(bw, [8 if s < 232 else 9 for s in range(280)],
                     (8, 9))
    for _ in range(3):  # red, blue, alpha: flat byte codes
        _write_flat_code(bw, [8] * 256, (0, 8))
    # distance: simple code, single symbol 0 (the (0,1) map entry =
    # distance exactly one row up); reads zero bits per use
    bw.write(1, 1)
    bw.write(0, 1)  # num_symbols - 1
    bw.write(0, 1)  # symbol fits in 1 bit
    bw.write(0, 1)  # symbol 0
    flat = a.reshape(-1, 3)
    n = w * h
    pos = 0
    while pos < n:
        run = 0
        if use_lz77 and pos >= w:
            lim = min(n - pos, 4096)
            while run < lim and (flat[pos + run] ==
                                 flat[pos + run - w]).all():
                run += 1
        if run >= 3:
            code, extra_bits, extra = _prefix_encode_value(run)
            gcode, gn = _ENC_GREEN[256 + code]
            bw.write_code(gcode, gn)
            if extra_bits:
                bw.write(extra, extra_bits)
            # distance symbol is the 0-bit simple code: nothing to
            # write; prefix-coded distance value 1 -> code 0, 0 extra
            pos += run
        else:
            r, g, b = (int(x) for x in flat[pos])
            gcode, gn = _ENC_GREEN[g]
            bw.write_code(gcode, gn)
            for ch in (r, b, 255):
                ccode, cn = _ENC_BYTE[ch]
                bw.write_code(ccode, cn)
            pos += 1
    body = bytes(bw.out)
    chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
