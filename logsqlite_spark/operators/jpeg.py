"""Baseline JPEG codec in pure numpy + stdlib — no Pillow/libjpeg.

Everything here is the public ITU-T T.81 spec: marker segments, 8×8
DCT-II, zigzag, magnitude categories, canonical Huffman from
BITS/HUFFVAL, byte stuffing, restart markers, JFIF BT.601 color.

Decoder (:func:`decode_jpeg`): baseline sequential (SOF0) with
arbitrary DQT/DHT tables, interleaved scans, sampling factors in
{1, 2} (4:4:4 / 4:2:2 / 4:2:0), restart markers — and, since r16
(VERDICT r15 #4), PROGRESSIVE (SOF2) per T.81 Annex G: spectral
selection + successive approximation, interleaved or single-component
DC scans, EOB runs. Arithmetic coding and 12-bit precision raise
``NotImplementedError`` — they route to the Pillow integration point
upstream.

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
    """Baseline (SOF0) or progressive (SOF2) JFIF/JPEG bytes ->
    (H, W, 3) uint8 RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    restart = 0
    progressive = False
    coefs: dict | None = None
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
        elif marker in (0xC0, 0xC2):
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            progressive = marker == 0xC2
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) JPEG "
                "decode natively — arithmetic/lossless/hierarchical "
                "route to the Pillow point")
        elif marker == 0xDD:
            restart = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i:3 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0x0F))
            if progressive:
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                if coefs is None:
                    coefs = {c["id"]: np.zeros(
                        (_geom(frame, c)[3] * _geom(frame, c)[2], 64),
                        np.int32) for c in frame[2]}
                consumed = _decode_prog_scan(
                    payload[pos:], frame, scan, ss, se,
                    ahal >> 4, ahal & 0x0F, coefs,
                    huff_dc, huff_ac, restart)
                pos += consumed
                continue
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
    if progressive and coefs is not None:
        return _reconstruct_progressive(frame, coefs, qt)
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

    return _planes_to_rgb(frame, planes)


def _planes_to_rgb(frame, planes):
    """Component planes (MCU-padded) -> (H, W, 3) uint8 RGB: crop,
    nearest-neighbor chroma upsample, BT.601 — shared by the baseline
    and progressive reconstructions."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
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


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — r16, VERDICT r15 #4.
#
# Spectral selection + successive approximation per ITU-T T.81 Annex G
# (public spec; control flow follows G.1.2 / G.2 — the same algorithm
# every independent decoder implements).  Scans accumulate into
# per-component zigzag coefficient stores; dequant + IDCT happen once
# at EOI.  Supported: Huffman progressive, interleaved or single-
# component DC scans, single-component AC scans, EOB runs, restart
# markers.  Arithmetic coding still routes to the Pillow point.


def _geom(frame, c):
    """(bw_ni, bh_ni, bw_pad, bh_pad) block-grid dims of component
    ``c``: the non-interleaved grid from the component's own size, and
    the MCU-padded grid interleaved scans index."""
    h, w, comps = frame
    hmax = max(x["h"] for x in comps)
    vmax = max(x["v"] for x in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    cw = -(-w * c["h"] // hmax)
    chh = -(-h * c["v"] // vmax)
    return (-(-cw // 8), -(-chh // 8), mcux * c["h"], mcuy * c["v"])


def _decode_prog_scan(data, frame, scan, ss, se, ah, al, coefs,
                      huff_dc, huff_ac, restart) -> int:
    """Decode ONE progressive scan from ``data`` (payload after the
    SOS segment) into the coefficient stores; returns bytes consumed
    up to (not including) the next marker."""
    h, w, comps = frame
    by_id = {c["id"]: c for c in comps}
    br = _BitReader(data)
    pred = {cid: 0 for cid, _, _ in scan}
    state = {"eobrun": 0}

    def maybe_restart(unit_i: int) -> None:
        if restart and unit_i and unit_i % restart == 0:
            br.align()
            if br.pos + 1 < len(br.data) and \
                    br.data[br.pos] == 0xFF and \
                    0xD0 <= br.data[br.pos + 1] <= 0xD7:
                br.pos += 2
            for k in pred:
                pred[k] = 0
            state["eobrun"] = 0

    if ss == 0:
        # DC scan (spec: Se must be 0 here)
        if len(scan) > 1:
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            mcu_i = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart(mcu_i)
                    for cid, td, _ in scan:
                        c = by_id[cid]
                        _, _, bwp, _ = _geom(frame, c)
                        for byy in range(c["v"]):
                            for bxx in range(c["h"]):
                                bi = (my * c["v"] + byy) * bwp \
                                    + (mx * c["h"] + bxx)
                                _dc_unit(br, coefs[cid][bi], pred, cid,
                                         huff_dc.get(td), ah, al)
                    mcu_i += 1
        else:
            cid, td, _ = scan[0]
            c = by_id[cid]
            bw_ni, bh_ni, bwp, _ = _geom(frame, c)
            unit = 0
            for by in range(bh_ni):
                for bx in range(bw_ni):
                    maybe_restart(unit)
                    _dc_unit(br, coefs[cid][by * bwp + bx], pred, cid,
                             huff_dc.get(td), ah, al)
                    unit += 1
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be "
                             "single-component (T.81 G.1.1.1)")
        cid, _, ta = scan[0]
        c = by_id[cid]
        bw_ni, bh_ni, bwp, _ = _geom(frame, c)
        tbl = huff_ac[ta]
        unit = 0
        for by in range(bh_ni):
            for bx in range(bw_ni):
                maybe_restart(unit)
                cf = coefs[cid][by * bwp + bx]
                if ah == 0:
                    _ac_first(br, cf, ss, se, al, tbl, state)
                else:
                    _ac_refine(br, cf, ss, se, al, tbl, state)
                unit += 1
    br.align()
    return br.pos


def _dc_unit(br, cf, pred, cid, tbl, ah, al) -> None:
    if ah == 0:
        t = _read_symbol(br, tbl)
        diff = _extend(br.bits(t), t) if t else 0
        pred[cid] += diff
        cf[0] = pred[cid] << al
    else:
        if br.bit():
            cf[0] = int(cf[0]) | (1 << al)


def _ac_first(br, cf, ss, se, al, tbl, state) -> None:
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _read_symbol(br, tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16        # ZRL
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.bits(r)
            break              # EOBn: this block is done
        k += r
        if k > se:
            raise ValueError("AC run past spectral band")
        cf[k] = _extend(br.bits(s), s) << al
        k += 1


def _ac_refine(br, cf, ss, se, al, tbl, state) -> None:
    """Successive-approximation AC refinement (T.81 G.1.2.3): newly
    significant coefficients arrive as ±1<<Al; every already-nonzero
    coefficient passed over reads one correction bit."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k: int) -> None:
        if br.bit() and (abs(int(cf[k])) & p1) == 0:
            cf[k] = int(cf[k]) + (p1 if cf[k] >= 0 else m1)

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _read_symbol(br, tbl)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    # NOTE the convention difference vs _ac_first:
                    # here the run INCLUDES the current block — its
                    # remaining correction bits are consumed by the
                    # unconditional tail below, which then decrements
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.bits(r)
                    break      # correction tail handled below
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("AC refine magnitude must be 1")
                newval = p1 if br.bit() else m1
            while k <= se:
                if cf[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                cf[k] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if cf[k] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


def _reconstruct_progressive(frame, coefs, qt):
    h, w, comps = frame
    planes = {}
    for c in comps:
        _, _, bwp, bhp = _geom(frame, c)
        q = qt[c["tq"]]
        plane = np.zeros((bhp * 8, bwp * 8))
        store = coefs[c["id"]]
        for by in range(bhp):
            for bx in range(bwp):
                zz = store[by * bwp + bx]
                block = np.zeros(64, np.int32)
                block[ZIGZAG] = zz
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    idct2(block.reshape(8, 8) * q) + 128.0
        planes[c["id"]] = plane
    return _planes_to_rgb(frame, planes)


# ---------------------------------------------------------------------------
# progressive (SOF2) encoder — fixture generator + roundtrip twin for
# the decoder above.  Emits a full successive-approximation scan
# script (DC first Al=1 -> DC refine -> per-component AC first Al=1 ->
# per-component AC refine), so every decoder path — DC/AC first and
# refine, EOB runs, correction bits — is exercised without Pillow.
# 4:4:4 only (fixtures don't need subsampling; the decode paths under
# test are the entropy/SA layers, which are sampling-independent).


def encode_jpeg_progressive(arr) -> bytes:
    """(H, W, 3) uint8 RGB -> progressive (SOF2) JFIF bytes.

    Same flat quant tables as :func:`encode_jpeg`; identical
    quantized coefficients, so ``decode_jpeg(encode_jpeg_progressive(
    x))`` is BIT-IDENTICAL to ``decode_jpeg(encode_jpeg(x))`` — the
    roundtrip test pins exactly that."""
    arr = np.asarray(arr, np.float64)
    h, w = arr.shape[:2]
    r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    def padded(p):
        ph = -(-p.shape[0] // 8) * 8
        pw = -(-p.shape[1] // 8) * 8
        out = np.zeros((ph, pw))
        out[:p.shape[0], :p.shape[1]] = p
        out[p.shape[0]:, :p.shape[1]] = p[-1:, :]
        out[:, p.shape[1]:] = out[:, p.shape[1] - 1:p.shape[1]]
        return out

    planes = [padded(y), padded(cb), padded(cr)]
    qts = [_Q_LUMA, _Q_CHROMA, _Q_CHROMA]
    blocks = [_encode_blocks(p, q) for p, q in zip(planes, qts)]
    nb = len(blocks[0])      # 4:4:4 — same grid for every component

    def trunc_div2(v: int) -> int:
        return -((-v) >> 1) if v < 0 else v >> 1  # toward zero (AC)

    # --- scan emitters over an abstract sink ---------------------------
    # sink.sym(tkey, s): Huffman symbol; sink.bits(v, n): raw bits.

    def scan_dc_first(sink):
        pred = [0, 0, 0]
        for bi in range(nb):
            for ci in range(3):
                tkey = "dc0" if ci == 0 else "dc1"
                v = int(blocks[ci][bi][0]) >> 1        # Al=1 (G.1.2.1)
                diff = v - pred[ci]
                pred[ci] = v
                cat = _category(diff)
                sink.sym(tkey, cat)
                if cat:
                    sink.bits(diff if diff > 0
                              else diff + (1 << cat) - 1, cat)

    def scan_dc_refine(sink):
        for bi in range(nb):
            for ci in range(3):
                sink.bits(int(blocks[ci][bi][0]) & 1, 1)

    def scan_ac_first(sink, ci, tkey):
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if not eobrun:
                return
            rr = eobrun.bit_length() - 1
            sink.sym(tkey, rr << 4)
            if rr:
                sink.bits(eobrun - (1 << rr), rr)
            eobrun = 0

        for bi in range(nb):
            band = [trunc_div2(int(v)) for v in blocks[ci][bi][1:64]]
            if not any(band):
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            last_nz = max(k for k, v in enumerate(band) if v)
            for k, v in enumerate(band[:last_nz + 1]):
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    sink.sym(tkey, 0xF0)
                    run -= 16
                cat = _category(v)
                sink.sym(tkey, (run << 4) | cat)
                sink.bits(v if v > 0 else v + (1 << cat) - 1, cat)
                run = 0
            if last_nz < 62:
                eobrun += 1      # this block's tail rides the EOB run
        flush_eob()

    def scan_ac_refine(sink, ci, tkey):
        # T.81 G.1.2.3 emit order == the decoder's read order: EOBn
        # symbol, its extension bits, then the buffered correction
        # bits of the run's blocks in sequence.
        eobrun = 0
        be: list[int] = []

        def flush_eob():
            nonlocal eobrun
            if not eobrun:
                return
            rr = eobrun.bit_length() - 1
            sink.sym(tkey, rr << 4)
            if rr:
                sink.bits(eobrun - (1 << rr), rr)
            for bit in be:
                sink.bits(bit, 1)
            be.clear()
            eobrun = 0

        for bi in range(nb):
            coefv = [int(v) for v in blocks[ci][bi][1:64]]
            absv = [abs(v) for v in coefv]           # Al = 0
            news = [k for k, a in enumerate(absv) if a == 1]
            pos = 0
            for k in news:
                flush_eob()
                run = 0
                br_bits: list[int] = []
                j = pos
                while j < k:
                    if absv[j] == 0:
                        run += 1
                        if run == 16:
                            sink.sym(tkey, 0xF0)
                            for bit in br_bits:
                                sink.bits(bit, 1)
                            br_bits = []
                            run = 0
                    else:                             # history nonzero
                        br_bits.append(absv[j] & 1)
                    j += 1
                sink.sym(tkey, (run << 4) | 1)
                sink.bits(1 if coefv[k] > 0 else 0, 1)
                for bit in br_bits:
                    sink.bits(bit, 1)
                pos = k + 1
            tail = [absv[j] & 1 for j in range(pos, 63) if absv[j] > 1]
            if pos < 63 or tail:
                if pos < 63 or tail:
                    eobrun += 1
                    be.extend(tail)
                    if eobrun == 0x7FFF:
                        flush_eob()
            # pos == 63 and no tail: block fully covered, no EOB
        flush_eob()

    # --- two passes: collect symbols -> build tables -> emit -----------

    class _Collect:
        def __init__(self):
            self.syms: dict[str, set] = {}

        def sym(self, tkey, s):
            self.syms.setdefault(tkey, set()).add(s)

        def bits(self, v, n):
            pass

    scans = [
        ("dcf", scan_dc_first),
        ("dcr", scan_dc_refine),
        ("acf0", lambda s: scan_ac_first(s, 0, "acf0")),
        ("acf1", lambda s: scan_ac_first(s, 1, "acf1")),
        ("acf2", lambda s: scan_ac_first(s, 2, "acf1")),
        ("acr0", lambda s: scan_ac_refine(s, 0, "acr0")),
        ("acr1", lambda s: scan_ac_refine(s, 1, "acr1")),
        ("acr2", lambda s: scan_ac_refine(s, 2, "acr1")),
    ]
    col = _Collect()
    for _, fn in scans:
        fn(col)
    tables = {k: _fixed_huff(v | ({0} if k.startswith("dc") else
                                  {0x00}))
              for k, v in col.syms.items()}

    class _Emit:
        def __init__(self):
            self.bw = _BitWriter()

        def sym(self, tkey, s):
            code, ln = tables[tkey][2][s]
            self.bw.put(code, ln)

        def bits(self, v, n):
            if n:
                self.bw.put(v, n)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) \
            + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in ((0, _Q_LUMA), (1, _Q_CHROMA)):
        out += seg(0xDB, bytes([tid]) + np.full(64, q, np.uint8)
                   .tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([3])
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)
    # DHT: dc classes 0/1; ac ids 0-3 (first luma/chroma, refine
    # luma/chroma) — progressive allows four AC table slots
    dht_ids = {"dc0": (0, 0), "dc1": (0, 1), "acf0": (1, 0),
               "acf1": (1, 1), "acr0": (1, 2), "acr1": (1, 3)}
    for tkey, (cls, tid) in dht_ids.items():
        if tkey not in tables:
            continue
        bits16, vals, _ = tables[tkey]
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits16)
                   + bytes(vals))

    def sos(comps_tt, ss, se, ah, al) -> bytes:
        body = bytes([len(comps_tt)])
        for cid, tt in comps_tt:
            body += bytes([cid, tt])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    def emit_scan(fn) -> bytes:
        em = _Emit()
        fn(em)
        em.bw.flush()
        return bytes(em.bw.out)

    out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, 1)
    out += emit_scan(scan_dc_first)
    out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 1, 0)
    out += emit_scan(scan_dc_refine)
    for ci, ta in ((1, 0x00), (2, 0x01), (3, 0x01)):
        out += sos([(ci, ta)], 1, 63, 0, 1)
        out += emit_scan(lambda s, c=ci - 1, t="acf0" if ci == 1
                         else "acf1": scan_ac_first(s, c, t))
    for ci, ta in ((1, 0x02), (2, 0x03), (3, 0x03)):
        out += sos([(ci, ta)], 1, 63, 1, 0)
        out += emit_scan(lambda s, c=ci - 1, t="acr0" if ci == 1
                         else "acr1": scan_ac_refine(s, c, t))
    out += b"\xff\xd9"
    return bytes(out)
