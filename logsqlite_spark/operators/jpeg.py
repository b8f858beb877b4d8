"""Baseline JPEG codec in pure numpy + stdlib — no Pillow/libjpeg.

Everything here is the public ITU-T T.81 spec: marker segments, 8×8
DCT-II, zigzag, magnitude categories, canonical Huffman from
BITS/HUFFVAL, byte stuffing, restart markers, JFIF BT.601 color.

Decoder (:func:`decode_jpeg`): baseline sequential (SOF0) with
arbitrary DQT/DHT tables, interleaved scans, sampling factors in
{1, 2} (4:4:4 / 4:2:2 / 4:2:0), restart markers. Progressive (SOF2),
arithmetic coding, and 12-bit precision raise ``NotImplementedError``
— they route to the Pillow integration point upstream.

Encoder (:func:`encode_jpeg`): baseline sequential with FLAT custom
quant tables and FIXED-LENGTH custom Huffman tables (every symbol at
one canonical length — a valid DHT that sidesteps transcribing Annex
K's 162-entry tables while keeping the DECODER fully general; the
bitstream is a little larger, which a data pipeline's resize path
doesn't care about). 4:4:4 or 4:2:0.

Like the PNG/GIF twins in ``multimodal.py``, the per-block Python
loops are the honest cost of a stdlib-only codec: correct and
deterministic for feature extraction and resize at test scale;
production-rate decode still wants a native library at the marked
integration point.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# shared constants

_ZZ = []
for _s in range(15):
    _rng = range(max(0, _s - 7), min(_s, 7) + 1)
    _ZZ += [(r, _s - r) for r in
            (reversed(_rng) if _s % 2 == 0 else _rng)]
ZIGZAG = np.array([r * 8 + c for r, c in _ZZ])        # block idx -> zz pos
UNZIGZAG = np.argsort(ZIGZAG)                          # zz pos -> block idx

_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def dct2(block):
    """8×8 forward DCT-II (orthonormal JPEG normalization)."""
    return _A @ block @ _A.T


def idct2(coef):
    return _A.T @ coef @ _A


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend(bits_val: int, t: int) -> int:
    """Magnitude-category decode (spec F.12): t read bits -> value."""
    if t == 0:
        return 0
    return bits_val if bits_val >= (1 << (t - 1)) else \
        bits_val - (1 << t) + 1


# ---------------------------------------------------------------------------
# encoder

_Q_LUMA = 16    # flat quant steps — custom tables are spec-legal
_Q_CHROMA = 24


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:          # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _fixed_huff(symbols):
    """All ``symbols`` at one canonical code length L (spec-legal DHT:
    L chosen so the all-ones code stays unused). Returns
    (bits[16], huffval, {sym: (code, L)})."""
    syms = sorted(symbols)
    L = max(2, (len(syms) + 1 - 1).bit_length())
    while (1 << L) - 1 < len(syms):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(syms)
    enc = {s: (i, L) for i, s in enumerate(syms)}
    return bits, syms, enc


def _encode_blocks(plane, q):
    """float plane (multiple-of-8 dims) -> list of zigzagged quantized
    int coefficient vectors."""
    h, w = plane.shape
    out = []
    shifted = plane - 128.0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            coef = dct2(shifted[by:by + 8, bx:bx + 8])
            qc = np.round(coef / q).astype(np.int32)
            out.append(qc.reshape(-1)[ZIGZAG])  # raster -> zigzag
    return out


def encode_jpeg(arr, subsample: str = "444") -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes."""
    arr = np.asarray(arr, np.float64)
    h, w = arr.shape[:2]
    r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    if subsample == "420":
        hs = vs = 2
        ph, pw = -(-h // 2), -(-w // 2)
        pad = np.zeros((ph * 2, pw * 2))
        pad[:h, :w] = cb
        pad[h:, :w] = cb[-1:, :]
        pad[:h, w:] = pad[:h, w - 1:w]
        # odd-h x odd-w corner cell: edge-replicate, not zero (ADVICE
        # r10 — a zero mixed into the corner 2x2 chroma average)
        pad[h:, w:] = pad[h - 1, w - 1]
        cb_s = pad.reshape(ph, 2, pw, 2).mean(axis=(1, 3))
        pad[:h, :w] = cr
        pad[h:, :w] = cr[-1:, :]
        pad[:h, w:] = pad[:h, w - 1:w]
        pad[h:, w:] = pad[h - 1, w - 1]
        cr_s = pad.reshape(ph, 2, pw, 2).mean(axis=(1, 3))
    elif subsample == "444":
        hs = vs = 1
        cb_s, cr_s = cb, cr
    else:
        raise ValueError(f"unsupported subsample {subsample!r}")

    def padded(p):
        ph = -(-p.shape[0] // 8) * 8
        pw = -(-p.shape[1] // 8) * 8
        out = np.zeros((ph, pw))
        out[:p.shape[0], :p.shape[1]] = p
        out[p.shape[0]:, :p.shape[1]] = p[-1:, :]
        out[:, p.shape[1]:] = out[:, p.shape[1] - 1:p.shape[1]]
        return out

    planes = [padded(y), padded(cb_s), padded(cr_s)]
    qts = [_Q_LUMA, _Q_CHROMA, _Q_CHROMA]
    blocks = [_encode_blocks(p, q) for p, q in zip(planes, qts)]

    # interleave into MCU order
    hmax, vmax = hs, vs
    comp_hv = [(hs, vs), (1, 1), (1, 1)] if subsample == "420" \
        else [(1, 1), (1, 1), (1, 1)]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component block grid dims
    dims = []
    for p in planes:
        dims.append((p.shape[0] // 8, p.shape[1] // 8))

    # symbol streams first (to build the Huffman tables), then emit
    dc_syms = [[], []]
    ac_syms = [[], []]
    seq = []     # (comp, block) in scan order
    prev_dc = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (ch, cv) in enumerate(comp_hv):
                for byy in range(cv):
                    for bxx in range(ch):
                        gy = min(my * cv + byy, dims[ci][0] - 1)
                        gx = min(mx * ch + bxx, dims[ci][1] - 1)
                        blk = blocks[ci][gy * dims[ci][1] + gx]
                        seq.append((ci, blk))
    for ci, blk in seq:
        t = 0 if ci == 0 else 1
        diff = int(blk[0]) - prev_dc[ci]
        prev_dc[ci] = int(blk[0])
        dc_syms[t].append(_category(diff))
        run = 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms[t].append(0xF0)
                run -= 16
            ac_syms[t].append((run << 4) | _category(v))
            run = 0
        if run:
            ac_syms[t].append(0x00)

    tables = []
    for t in range(2):
        tables.append((_fixed_huff(set(dc_syms[t]) | {0}),
                       _fixed_huff(set(ac_syms[t]) | {0x00})))

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    for ci, blk in seq:
        t = 0 if ci == 0 else 1
        (_, _, dc_enc), (_, _, ac_enc) = tables[t]
        diff = int(blk[0]) - prev_dc[ci]
        prev_dc[ci] = int(blk[0])
        cat = _category(diff)
        code, ln = dc_enc[cat]
        bw.put(code, ln)
        if cat:
            bw.put(diff if diff > 0 else diff + (1 << cat) - 1, cat)
        run = 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[0xF0]
                bw.put(code, ln)
                run -= 16
            cat = _category(v)
            code, ln = ac_enc[(run << 4) | cat]
            bw.put(code, ln)
            bw.put(v if v > 0 else v + (1 << cat) - 1, cat)
            run = 0
        if run:
            code, ln = ac_enc[0x00]
            bw.put(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") \
            + body

    out = bytearray(b"\xff\xd8")                       # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in ((0, _Q_LUMA), (1, _Q_CHROMA)):
        tbl = np.full(64, q, np.uint8)
        out += seg(0xDB, bytes([tid]) + tbl.tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([3])
    for ci, (ch, cv) in enumerate(comp_hv):
        sof += bytes([ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    for t in range(2):
        (dbits, dvals, _), (abits, avals, _) = tables[t]
        out += seg(0xC4, bytes([t]) + bytes(dbits) + bytes(dvals))
        out += seg(0xC4, bytes([0x10 | t]) + bytes(abits) + bytes(avals))
    sos = bytes([3])
    for ci in range(3):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder

class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG scan data exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) \
                    else 0
                if nxt == 0x00:
                    self.pos += 1          # stuffed byte
                else:
                    raise ValueError("marker inside entropy data")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.n = 0


def _huff_decoder(bits, vals):
    """BITS/HUFFVAL -> {(length, code): symbol} canonical map."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid Huffman code in JPEG scan")


def decode_jpeg(payload: bytes):
    """Baseline JFIF/JPEG bytes -> (H, W, 3) uint8 RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    restart = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # spec-legal 0xFF fill bytes before a marker (T.81 B.1.1.2):
        # skip repeats so they don't misparse as a length segment
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        ln = int.from_bytes(payload[pos:pos + 2], "big")
        body = payload[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 0x0F
                p += 1
                if prec:
                    raise NotImplementedError("16-bit DQT")
                tbl = np.frombuffer(body, np.uint8, 64, p).astype(np.int32)
                p += 64
                full = np.zeros(64, np.int32)
                full[ZIGZAG] = tbl          # zz order -> block order
                qt[tid] = full.reshape(8, 8)
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                p += 17 + n
                (huff_dc if cls == 0 else huff_ac)[tid] = \
                    _huff_decoder(bits, vals)
        elif marker == 0xC0:
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0) JPEG decodes natively"
                " — progressive/arithmetic route to the Pillow point")
        elif marker == 0xDD:
            restart = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i:3 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0x0F))
            if len(scan) != len(frame[2]):
                # a multi-scan non-interleaved baseline file: decoding
                # the first scan as an all-components interleave would
                # silently mis-decode with wrong MCU geometry — route
                # to the Pillow point like progressive does
                raise NotImplementedError(
                    "non-interleaved (multi-scan) baseline JPEG routes"
                    " to the Pillow integration point")
            return _decode_scan(payload, pos, frame, scan, qt,
                                huff_dc, huff_ac, restart)
    raise ValueError("JPEG has no scan")


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart):
    h, w, comps = frame
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))

    br = _BitReader(payload[pos:])
    pred = {c["id"]: 0 for c in comps}
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                br.align()
                # skip the RSTn marker bytes
                while br.pos + 1 < len(br.data) and \
                        br.data[br.pos] == 0xFF and \
                        0xD0 <= br.data[br.pos + 1] <= 0xD7:
                    br.pos += 2
                    break
                pred = {c["id"]: 0 for c in comps}
            for cid, td, ta in scan:
                c = by_id[cid]
                q = qt[c["tq"]]
                for byy in range(c["v"]):
                    for bxx in range(c["h"]):
                        coef = np.zeros(64, np.int32)
                        t = _read_symbol(br, huff_dc[td])
                        diff = _extend(br.bits(t), t) if t else 0
                        pred[cid] += diff
                        coef[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, huff_ac[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break        # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block")
                            coef[k] = _extend(br.bits(s), s)
                            k += 1
                        block = np.zeros(64, np.int32)
                        block[ZIGZAG] = coef  # zz order -> raster
                        px = idct2(block.reshape(8, 8) * q) + 128.0
                        y0 = (my * c["v"] + byy) * 8
                        x0 = (mx * c["h"] + bxx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = px
            mcu_i += 1

    out = []
    for c in comps:
        p = planes[c["id"]]
        ch = -(-w * c["h"] // hmax)
        cv = -(-h * c["v"] // vmax)
        p = p[:cv, :ch]
        ys = (np.arange(h) * c["v"]) // vmax
        xs = (np.arange(w) * c["h"]) // hmax
        out.append(p[ys][:, xs])
    y = out[0]
    if len(out) == 3:
        cb, cr = out[1] - 128.0, out[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=2)
    else:
        rgb = np.repeat(y[:, :, None], 3, axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
