"""Multimodal plumbing (X5): schema, batch shape, stubbed codecs."""

import pytest

from logsqlite_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_media,
    media_stats,
    resize_images,
    sample_frames,
)

@pytest.fixture()
def media(spark):
    rows = [
        (1, 10, b"\x89PNG fake bytes", ("image", "png", 640, 480, None, None)),
        (2, 11, b"RIFF fake wav", ("audio", "wav", None, None, 2_000, 44100)),
        (3, 12, b"\x00\x00ftyp fake mp4", ("video", "mp4", 1920, 1080, 3_500, None)),
        (4, 13, None, ("image", "png", 8, 8, None, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

def test_decode_shapes_and_determinism(media):
    out = decode_media(media).collect()
    assert len(out) == 4
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == 15
    assert len(by_id[1]["feature"]) == FEATURE_DIM
    assert by_id[4]["feature"] == [0.0] * FEATURE_DIM  # null payload
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in decode_media(media).collect()}
    assert again == {r["media_id"]: r["feature"] for r in out}

def test_decode_real_path_is_marked_todo(media):
    with pytest.raises(Exception) as ei:
        decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)

def test_resize_updates_meta_only(media):
    out = resize_images(media, 224, 224).collect()
    m = {r["media_id"]: r for r in out}
    assert m[1]["meta"]["width"] == 224 and m[1]["meta"]["height"] == 224
    assert m[1]["payload"] == b"\x89PNG fake bytes"  # payload untouched

def test_sample_frames_cadence(media):
    out = sample_frames(media, every_ms=1000).collect()
    # only the video row explodes; 3500ms at 1000ms cadence -> 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in sorted(out, key=lambda r: r["frame_ts_ms"])] \
        == [0, 1000, 2000, 3000]
    assert {r["media_id"] for r in out} == {3}

def test_bytestat_features_pinned():
    # the supported codec-free featurizer is exact: pin its values so
    # any change to the byte fold is a deliberate, visible break
    from logsqlite_spark.operators.multimodal import (
        FEATURE_DIM,
        _bytestat_features,
    )

    assert _bytestat_features(b"") == [0.0] * FEATURE_DIM
    f = _bytestat_features(b"abc")
    assert f[0] == 97 / 100_000 and f[1] == 98 / 100_000
    assert f[3] == 0.0
    # stripe wrap: byte 16 folds into stripe 0 as (97*31 + 113) % 1e5
    g = _bytestat_features(b"a" * 16 + b"q")
    assert g[0] == ((97 * 31 + 113) % 100_000) / 100_000

def test_media_from_documents_deterministic(spark):
    from logsqlite_spark.operators.multimodal import media_from_documents

    docs = spark.createDataFrame(
        [(0, "alpha", 5), (1, "beta", 4), (2, "gamma", 5)],
        "doc_id long, text string, n_chars long")
    rows = {r["media_id"]: r for r in media_from_documents(docs).collect()}
    assert bytes(rows[0]["payload"]) == b"alpha"
    assert rows[0]["meta"]["media_type"] == "image"
    assert rows[1]["meta"]["media_type"] == "audio"
    assert rows[1]["meta"]["sample_rate"] == 16000
    assert rows[1]["meta"]["duration_ms"] == 40
    assert rows[2]["meta"]["media_type"] == "video"
    assert rows[2]["meta"]["width"] == 66 and rows[2]["meta"]["height"] == 66

def test_media_stats_prunes_payload(spark, media, tmp_path):
    path = str(tmp_path / "media")
    media.write.parquet(path)
    df = media_stats(spark.read.parquet(path))
    got = {r["media_type"]: (r["n"], r["total_duration_ms"]) for r in df.collect()}
    assert got == {"image": (2, 0), "audio": (1, 2000), "video": (1, 3500)}
    # column pruning: the parquet ReadSchema must exclude payload pages
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "payload" not in read_schema[0]


def test_bytestat_vectorized_matches_python_fold():
    """The numpy mat-vec featurizer must be bit-identical to the
    per-byte Python fold it replaced (same integer recurrence)."""
    import random

    from logsqlite_spark.operators.multimodal import (
        _bytestat_features, _bytestat_features_py)

    rng = random.Random(42)
    cases = [b"", b"x", bytes(range(16)), bytes(range(17)),
             bytes(255 for _ in range(16 * 1250 + 7))]
    cases += [bytes(rng.randrange(256) for _ in range(n))
              for n in (1, 15, 16, 31, 32, 1000, 12345)]
    for payload in cases:
        assert _bytestat_features(payload) == \
            _bytestat_features_py(payload), len(payload)


def _make_bmp(h, w, rgb):
    """Solid-color 24bpp BMP via the module's own encoder twin."""
    import numpy as np

    from logsqlite_spark.operators.multimodal import _encode_bmp

    arr = np.zeros((h, w, 3), np.uint8)
    arr[:, :] = rgb
    return _encode_bmp(arr)


def _make_wav(rate, samples):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    return (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
            + b"data" + len(data).to_bytes(4, "little") + data)


def test_bmp_roundtrip_and_native_decode():
    """The numpy BMP codec round-trips pixel-exactly (incl. the 4-byte
    row padding of non-multiple-of-4 widths) and native features carry
    real dimensions + channel stats."""
    import numpy as np

    from logsqlite_spark.operators.multimodal import (
        _decode_bmp, _encode_bmp, _native_features)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)  # w=7: padded
    assert (_decode_bmp(_encode_bmp(img)) == img).all()

    kind, f = _native_features(_make_bmp(4, 6, (10, 200, 30)))
    assert kind == "image"
    assert f[0] == 1.0 and f[1] == 4.0 and f[2] == 6.0
    assert f[3:6] == [10.0, 200.0, 30.0]   # exact channel means
    assert f[6:9] == [0.0, 0.0, 0.0]       # solid color -> zero std


def test_wav_native_decode():
    from logsqlite_spark.operators.multimodal import _native_features

    kind, f = _native_features(_make_wav(8000, [0, 1000, -1000, 1000]))
    assert kind == "audio"
    assert f[0] == 2.0 and f[1] == 8000.0 and f[2] == 4.0 and f[3] == 1.0
    assert abs(f[4] - (3 * 1000**2 / 4) ** 0.5) < 1e-9  # exact RMS


def test_native_decode_and_real_resize_through_spark(spark):
    """End-to-end through mapInPandas: native decode classifies by
    magic bytes; real resize produces a decodable BMP at the target
    dimensions with preserved solid color."""
    from logsqlite_spark.operators.multimodal import (
        _decode_bmp, decode_media, resize_images)

    rows = [
        (1, 10, _make_bmp(8, 8, (255, 0, 0)),
         {"media_type": "image", "width": 8, "height": 8}),
        (2, 20, _make_wav(16000, [100, -100] * 50),
         {"media_type": "audio", "duration_ms": 100}),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, doc_id long, payload binary, "
        "meta map<string,string>")
    got = {r["media_id"]: r for r in
           decode_media(media, codec="native").collect()}
    assert got[1]["media_type"] == "image" and got[1]["feature"][1] == 8.0
    assert got[2]["media_type"] == "audio" and got[2]["feature"][1] == 16000.0

    imgs = media.filter("media_id = 1")
    out = resize_images(imgs, 4, 2, fake=False).collect()[0]
    arr = _decode_bmp(bytes(out["payload"]))
    assert arr.shape == (2, 4, 3)
    assert (arr == (255, 0, 0)).all()

    # entropy-coded formats without a native codec (WEBP) still raise
    # at the integration point; a malformed JPEG now hits the NATIVE
    # parser's error, not the Pillow fallback
    webp = spark.createDataFrame(
        [(3, 30, b"RIFF\x10\x00\x00\x00WEBPVP8 junk", None)],
        "media_id long, doc_id long, payload binary, meta map<string,string>")
    import pytest as _pytest
    with _pytest.raises(Exception, match="integration point|Pillow"):
        decode_media(webp, codec="native").collect()
    junk = spark.createDataFrame(
        [(4, 40, b"\xff\xd8\xff\xe0JFIF-not-really", None)],
        "media_id long, doc_id long, payload binary, meta map<string,string>")
    with _pytest.raises(Exception, match="JPEG"):
        decode_media(junk, codec="native").collect()


def test_native_empty_payload_explicit(spark):
    """ADVICE r7: empty/None payloads on the native path return
    ("empty", zeros) explicitly instead of a misleading codec error."""
    from logsqlite_spark.operators.multimodal import _native_features

    assert _native_features(b"") == ("empty", [0.0] * FEATURE_DIM)

    media = spark.createDataFrame(
        [(1, 10, None, None), (2, 20, b"", None)],
        "media_id long, doc_id long, payload binary, "
        "meta map<string,string>")
    got = {r["media_id"]: r for r in
           decode_media(media, codec="native").collect()}
    for r in got.values():
        assert r["media_type"] == "empty"
        assert r["feature"] == [0.0] * FEATURE_DIM
        assert r["n_bytes"] == 0


def test_magic_dispatch_names_detected_format():
    """Magic-byte dispatch recognizes the public signatures and the
    unsupported paths raise naming what was detected."""
    from logsqlite_spark.operators.multimodal import _magic_kind

    assert _magic_kind(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) == "png"
    assert _magic_kind(b"\xff\xd8\xff\xe0" + b"\x00" * 8) == "jpeg"
    assert _magic_kind(b"GIF89a" + b"\x00" * 8) == "gif"
    assert _magic_kind(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "webp"
    assert _magic_kind(b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00") == "mp4"
    assert _magic_kind(b"BM" + b"\x00" * 12) == "bmp"
    assert _magic_kind(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "wav"
    assert _magic_kind(b"plain text") == "unknown"
    assert _magic_kind(b"") == "empty"


def test_resize_compressed_dispatches_not_bmp_error(spark):
    """A 16-BIT PNG payload under real resize decodes NATIVELY since
    r16 (re-encoded 8-bit truecolor like every other PNG resize) —
    never the BMP codec's 'not a BMP' error; an mp4 payload must
    raise naming the detected format."""
    import zlib

    def chunk(typ, body):
        return (len(body).to_bytes(4, "big") + typ + body
                + (zlib.crc32(typ + body) & 0xFFFFFFFF)
                .to_bytes(4, "big"))

    png16 = (b"\x89PNG\r\n\x1a\n"
             + chunk(b"IHDR", (2).to_bytes(4, "big")
                     + (2).to_bytes(4, "big") + bytes([16, 2, 0, 0, 0]))
             + chunk(b"IDAT", zlib.compress(b"\x00" * 26))
             + chunk(b"IEND", b""))
    mp4 = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 16
    media = spark.createDataFrame(
        [(1, 10, png16, None), (2, 20, mp4, None)],
        "media_id long, doc_id long, payload binary, "
        "meta map<string,string>")

    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False

    out = resize_images(media.filter("media_id = 1"), 4, 4,
                        fake=False).collect()[0]
    from logsqlite_spark.operators.multimodal import _decode_png

    resized = _decode_png(bytes(out["payload"]))
    assert resized.shape == (4, 4, 3)
    with pytest.raises(Exception, match="mp4"):
        resize_images(media.filter("media_id = 2"), 4, 4,
                      fake=False).collect()


def test_pillow_backed_resize_roundtrip(spark):
    """Runs only where Pillow exists (skipped in this container): a
    real PNG resizes through the conditional-import path."""
    PIL = pytest.importorskip("PIL")  # noqa: N806
    import io

    import numpy as np
    from PIL import Image

    from logsqlite_spark.operators.multimodal import decode_media

    buf = io.BytesIO()
    Image.fromarray(np.full((8, 8, 3), (0, 128, 255), np.uint8)) \
        .save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, 10, buf.getvalue(), None)],
        "media_id long, doc_id long, payload binary, "
        "meta map<string,string>")
    out = resize_images(media, 4, 2, fake=False).collect()[0]
    resized = Image.open(io.BytesIO(bytes(out["payload"])))
    assert resized.size == (4, 2)
    dec = decode_media(media, codec="native").collect()[0]
    assert dec["media_type"] == "image"
    assert dec["feature"][1] == 8.0


def _filtered_png(img, filters):
    """Hand-build a PNG whose row y uses filter type filters[y] —
    exercises every unfilter branch against the reference encode."""
    import zlib

    import numpy as np

    h, w, _ = img.shape
    bpp = 3

    def chunk(typ, body):
        return (len(body).to_bytes(4, "big") + typ + body
                + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    rows = []
    prev = np.zeros(w * bpp, np.int32)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        f = filters[y]
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - upleft))
            pr = np.where((pa <= pb) & (pa <= pc), left,
                          np.where(pb <= pc, prev, upleft))
            enc = cur - pr
        rows.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b""))


def test_png_roundtrip_and_all_filters():
    """The stdlib PNG codec: encode->decode is pixel-exact, and a
    hand-filtered file exercising every filter type (None/Sub/Up/
    Average/Paeth) reconstructs the same raster."""
    import numpy as np

    from logsqlite_spark.operators.multimodal import (
        _decode_png, _encode_png, _native_features)

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    assert (_decode_png(_encode_png(img)) == img).all()

    hand = _filtered_png(img, [0, 1, 2, 3, 4])
    assert (_decode_png(hand) == img).all()

    kind, f = _native_features(_encode_png(
        np.full((4, 6, 3), (10, 200, 30), np.uint8)))
    assert kind == "image"
    assert f[0] == 1.0 and f[1] == 4.0 and f[2] == 6.0
    assert f[3:6] == [10.0, 200.0, 30.0]
    assert f[6:9] == [0.0, 0.0, 0.0]


def test_png_color_types_resolve_to_rgb():
    """Gray, palette, gray+alpha and RGBA variants all decode to the
    same RGB raster the truecolor file carries."""
    import zlib

    import numpy as np

    from logsqlite_spark.operators.multimodal import _decode_png

    def chunk(typ, body):
        return (len(body).to_bytes(4, "big") + typ + body
                + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    def build(ctype, raster_rows, plte=None):
        ihdr = ((3).to_bytes(4, "big") + (2).to_bytes(4, "big")
                + bytes([8, ctype, 0, 0, 0]))
        body = b"".join(b"\x00" + r for r in raster_rows)
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(body)) + chunk(b"IEND", b"")

    gray = build(0, [bytes([1, 2, 3]), bytes([4, 5, 6])])
    assert (_decode_png(gray)[:, :, 0] == [[1, 2, 3], [4, 5, 6]]).all()
    assert (_decode_png(gray)[:, :, 1] == _decode_png(gray)[:, :, 2]).all()

    ga = build(4, [bytes([1, 9, 2, 9, 3, 9]), bytes([4, 9, 5, 9, 6, 9])])
    assert (_decode_png(ga) == _decode_png(gray)).all()

    rgba = build(6, [bytes([1, 1, 1, 9, 2, 2, 2, 9, 3, 3, 3, 9]),
                     bytes([4, 4, 4, 9, 5, 5, 5, 9, 6, 6, 6, 9])])
    want = np.repeat(np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
                     [:, :, None], 3, axis=2)
    assert (_decode_png(rgba) == want).all()

    pal = build(3, [bytes([0, 1, 2]), bytes([2, 1, 0])],
                plte=bytes([10, 11, 12, 20, 21, 22, 30, 31, 32]))
    out = _decode_png(pal)
    assert tuple(out[0, 0]) == (10, 11, 12) and tuple(out[1, 0]) == (30, 31, 32)


def test_png_native_resize_through_spark(spark):
    """Real resize of a PNG payload runs the stdlib codec end-to-end
    through mapInPandas and re-emits a decodable PNG of the target
    geometry."""
    import numpy as np

    from logsqlite_spark.operators.multimodal import (
        _decode_png, _encode_png, resize_images)

    img = np.zeros((8, 8, 3), np.uint8)
    img[:4] = (255, 0, 0)
    img[4:] = (0, 0, 255)
    media = spark.createDataFrame(
        [(1, 10, _encode_png(img), None)],
        "media_id long, doc_id long, payload binary, "
        "meta map<string,string>")
    out = resize_images(media, 4, 4, fake=False).collect()[0]
    small = _decode_png(bytes(out["payload"]))
    assert small.shape == (4, 4, 3)
    assert tuple(small[0, 0]) == (255, 0, 0)
    assert tuple(small[3, 3]) == (0, 0, 255)


def test_gif_roundtrip_decode_and_lzw():
    """The stdlib GIF codec: encode->decode round-trips the index
    raster and palette exactly; LZW decode handles table growth
    (compressed data from a real encoder pattern) and the
    uncompressed-literals encoder stays decodable at every width."""
    import numpy as np

    from logsqlite_spark.operators.multimodal import (
        _decode_gif, _decode_gif_indexed, _encode_gif,
        _lzw_decode, _lzw_encode_literals, _native_features)

    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 13), dtype=np.uint8)
    gif = _encode_gif(idx, pal)
    got_idx, got_pal = _decode_gif_indexed(gif)
    assert (got_idx == idx).all()
    assert (got_pal[:16] == pal).all()
    assert (_decode_gif(gif) == pal[idx]).all()

    # LZW inverse pair over a long run (forces periodic clears)
    seq = rng.integers(0, 4, 3000, dtype=np.uint8)
    assert _lzw_decode(_lzw_encode_literals(seq, 2), 2) == seq.tobytes()

    kind, f = _native_features(gif)
    assert kind == "image" and f[1] == 9.0 and f[2] == 13.0


def test_gif_interlaced_decodes():
    """An interlaced GIF (4-pass row order) reconstructs the same
    raster as its sequential twin."""
    import numpy as np

    from logsqlite_spark.operators.multimodal import (
        _decode_gif_indexed, _encode_gif, _lzw_encode_literals)

    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (11, 5), dtype=np.uint8)
    h, w = idx.shape
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    lzw = _lzw_encode_literals(idx[order].reshape(-1), 2)
    blocks = b"".join(bytes([len(lzw[i:i + 255])]) + lzw[i:i + 255]
                      for i in range(0, len(lzw), 255)) + b"\x00"
    gif = (b"GIF87a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
           + bytes([0x81, 0, 0]) + pal.tobytes()
           + b"\x2c" + b"\x00" * 4
           + w.to_bytes(2, "little") + h.to_bytes(2, "little")
           + bytes([0x40])  # interlace flag, no local table
           + bytes([2]) + blocks + b"\x3b")
    got, _ = _decode_gif_indexed(gif)
    assert (got == idx).all()


def test_gif_native_resize_through_spark(spark):
    """Real resize of a GIF payload: index-raster nearest-neighbor,
    original palette preserved verbatim."""
    import numpy as np

    from logsqlite_spark.operators.multimodal import (
        _decode_gif_indexed, _encode_gif, resize_images)

    pal = np.array([[255, 0, 0], [0, 0, 255]], np.uint8)
    idx = np.zeros((8, 8), np.uint8)
    idx[4:] = 1
    media = spark.createDataFrame(
        [(1, 10, _encode_gif(idx, pal), None)],
        "media_id long, doc_id long, payload binary, "
        "meta map<string,string>")
    out = resize_images(media, 4, 4, fake=False).collect()[0]
    small, got_pal = _decode_gif_indexed(bytes(out["payload"]))
    assert small.shape == (4, 4)
    assert (got_pal[:2] == pal).all()
    assert small[0, 0] == 0 and small[3, 3] == 1


def test_lzw_decode_against_real_compressor():
    """_lzw_decode against a REAL (string-table) GIF-LZW compressor
    written here as the reference: exercises dictionary growth, the
    code-width bump, and the KwKwK corner (code == table size) that
    the uncompressed-literals encoder never produces."""
    import numpy as np

    from logsqlite_spark.operators.multimodal import _lzw_decode

    def compress(data: bytes, min_code: int) -> bytes:
        clear, end = 1 << min_code, (1 << min_code) + 1
        code_size = min_code + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code = end + 1
        acc = bits = 0
        out = bytearray()

        def emit(c: int) -> None:
            nonlocal acc, bits
            acc |= c << bits
            bits += code_size
            while bits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                bits -= 8

        emit(clear)
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
                continue
            emit(table[w])
            table[wc] = next_code
            next_code += 1
            # GIF late-change: width bumps once entry 2^width exists
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
            w = bytes([ch])
        if w:
            emit(table[w])
        emit(end)
        if bits:
            out.append(acc & 0xFF)
        return bytes(out)

    # KwKwK: 'abababab...' over a 2-symbol alphabet
    kwk = bytes([0, 1] * 40)
    assert _lzw_decode(compress(kwk, 2), 2) == kwk

    # long repetitive + random mix forces several width bumps
    rng = np.random.default_rng(13)
    data = (bytes(rng.integers(0, 8, 500, dtype=np.uint8).tolist())
            + bytes([3, 4, 5] * 300)
            + bytes(rng.integers(0, 8, 500, dtype=np.uint8).tolist()))
    assert _lzw_decode(compress(data, 3), 3) == data


def test_jpeg_codec_roundtrip_and_spec_pieces():
    """The numpy baseline-JPEG codec: DCT/IDCT inverse pair, zigzag is
    the spec permutation, encode->decode within the flat quant table's
    error bound on smooth and solid images, 4:2:0 path included."""
    import numpy as np

    from logsqlite_spark.operators.jpeg import (
        ZIGZAG, dct2, decode_jpeg, encode_jpeg, idct2)

    rng = np.random.default_rng(5)
    blk = rng.normal(0, 50, (8, 8))
    assert np.allclose(idct2(dct2(blk)), blk, atol=1e-9)
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]  # spec head

    solid = np.full((16, 16, 3), (200, 30, 90), np.uint8)
    assert np.abs(decode_jpeg(encode_jpeg(solid)).astype(int)
                  - solid.astype(int)).max() <= 3

    yy, xx = np.mgrid[0:24, 0:20]
    grad = np.stack([np.clip(yy * 5, 0, 255), np.clip(xx * 6, 0, 255),
                     np.clip(yy * 2 + xx * 2, 0, 255)],
                    axis=2).astype(np.uint8)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(grad, subsample=sub))
        err = np.abs(out.astype(int) - grad.astype(int))
        assert err.mean() < 5 and err.max() <= 16, sub


def test_jpeg_native_feature_and_resize_through_spark(spark):
    """JPEG payloads flow through native feature extraction and real
    resize end-to-end (decode -> nearest-neighbor -> re-encode),
    emitting a decodable baseline JPEG of the target geometry."""
    import numpy as np

    from logsqlite_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from logsqlite_spark.operators.multimodal import (
        _native_features, resize_images)

    img = np.zeros((16, 16, 3), np.uint8)
    img[:8] = (250, 10, 10)
    img[8:] = (10, 10, 250)
    payload = encode_jpeg(img)
    assert payload[:3] == b"\xff\xd8\xff"

    kind, f = _native_features(payload)
    assert kind == "image" and f[1] == 16.0 and f[2] == 16.0

    media = spark.createDataFrame(
        [(1, 10, payload, None)],
        "media_id long, doc_id long, payload binary, "
        "meta map<string,string>")
    out = resize_images(media, 8, 8, fake=False).collect()[0]
    small = decode_jpeg(bytes(out["payload"]))
    assert small.shape == (8, 8, 3)
    assert small[0, 0, 0] > 200 and small[0, 0, 2] < 60
    assert small[7, 7, 2] > 200 and small[7, 7, 0] < 60


def test_resample_audio_identity_mono_and_rates(spark):
    """Audio normalization twin: same-rate resample is bit-identical;
    mono mix averages channels exactly; 2x upsample of a constant
    signal stays constant and doubles the sample count; downsample
    halves it; non-WAV payloads raise naming the format."""
    import numpy as np
    import pytest as _pytest

    from logsqlite_spark.operators.multimodal import (
        _decode_wav, _encode_wav, resample_audio)

    stereo = np.stack([np.full(100, 1000, np.int16),
                       np.full(100, 3000, np.int16)], axis=1)
    payload = _encode_wav(stereo, 8000)
    mk = lambda p: spark.createDataFrame(  # noqa: E731
        [(1, 10, p, None)],
        "media_id long, doc_id long, payload binary, "
        "meta map<string,string>")

    same = resample_audio(mk(payload), 8000).collect()[0]
    s, r = _decode_wav(bytes(same["payload"]))
    assert r == 8000 and (s == stereo).all()
    assert same["meta"]["sample_rate"] == 8000

    mono = resample_audio(mk(payload), 8000, mono=True).collect()[0]
    s, _ = _decode_wav(bytes(mono["payload"]))
    assert s.shape == (100, 1) and (s == 2000).all()

    up = resample_audio(mk(payload), 16000).collect()[0]
    s, r = _decode_wav(bytes(up["payload"]))
    assert r == 16000 and s.shape == (200, 2)
    assert (s[:, 0] == 1000).all() and (s[:, 1] == 3000).all()

    down = resample_audio(mk(payload), 4000).collect()[0]
    s, r = _decode_wav(bytes(down["payload"]))
    assert r == 4000 and s.shape == (50, 2) and (s[:, 0] == 1000).all()

    bad = mk(b"BM" + b"\x00" * 60)
    with _pytest.raises(Exception, match="bmp"):
        resample_audio(bad, 8000).collect()


def test_resample_audio_linear_interpolation_exact(spark):
    """A linear ramp resamples onto the same line (linear interp is
    exact for affine signals, away from the clamped tail)."""
    import numpy as np

    from logsqlite_spark.operators.multimodal import (
        _decode_wav, _encode_wav, resample_audio)

    ramp = (np.arange(64, dtype=np.int16) * 100).reshape(-1, 1)
    media = spark.createDataFrame(
        [(1, 10, _encode_wav(ramp, 8000), None)],
        "media_id long, doc_id long, payload binary, "
        "meta map<string,string>")
    out = resample_audio(media, 16000).collect()[0]
    s, r = _decode_wav(bytes(out["payload"]))
    assert r == 16000 and len(s) == 128
    want = np.rint(np.arange(126) * 50).astype(int)
    assert (s[:126, 0].astype(int) == want).all()


def _make_mp4(duration_ms, timescale=1000, w=0, h=0, version=0):
    """Minimal ISO BMFF: ftyp + moov(mvhd [+ trak(tkhd)])."""
    def box(typ, body):
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    dur = duration_ms * timescale // 1000
    if version == 1:
        mvhd = (bytes([1, 0, 0, 0]) + b"\x00" * 16
                + timescale.to_bytes(4, "big") + dur.to_bytes(8, "big")
                + b"\x00" * 80)
    else:
        mvhd = (bytes([0, 0, 0, 0]) + b"\x00" * 8
                + timescale.to_bytes(4, "big") + dur.to_bytes(4, "big")
                + b"\x00" * 80)
    moov_body = box(b"mvhd", mvhd)
    if w and h:
        tkhd = (bytes([0, 0, 0, 0]) + b"\x00" * 72
                + (w << 16).to_bytes(4, "big")
                + (h << 16).to_bytes(4, "big"))
        moov_body += box(b"trak", box(b"tkhd", tkhd))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isom") + box(b"moov", moov_body)


def test_mp4_container_parse_and_real_frame_sampling(spark):
    """The ISO BMFF box walk reads real duration/dimensions (both mvhd
    versions, 16.16 fixed-point tkhd geometry); sample_frames
    fake=False samples from the PARSED duration, ignoring meta."""
    from logsqlite_spark.operators.multimodal import (
        parse_mp4_meta, sample_frames)

    p = _make_mp4(3500, timescale=600, w=1920, h=1080)
    got = parse_mp4_meta(p)
    assert got["duration_ms"] == 3500
    assert (got["width"], got["height"]) == (1920, 1080)
    assert parse_mp4_meta(_make_mp4(2000, version=1))["duration_ms"] == 2000

    # meta LIES (10s); the parser's 3.5s wins under fake=False
    media = spark.createDataFrame(
        [(1, 10, p, {"media_type": "video", "duration_ms": "10000"}),
         (2, 20, b"not video at all", {"media_type": "video"})],
        "media_id long, doc_id long, payload binary, "
        "meta map<string,string>")
    out = sample_frames(media, every_ms=1000, fake=False).collect()
    assert sorted(r["frame_ts_ms"] for r in out) == [0, 1000, 2000, 3000]
    assert {r["media_id"] for r in out} == {1}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="mvhd"):
        parse_mp4_meta(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00")


def _make_mp4_with_samples(deltas, timescale=1000, sizes=None,
                           offsets=None, mvhd_duration_ms=None):
    """ISO BMFF with a full sample table: ftyp + moov(mvhd +
    trak(mdia(mdhd + minf(stbl(stts + stsz + stco))))).  ``deltas``
    are per-sample durations in mdhd timescale units (run-length
    collapsed into stts entries)."""
    def box(typ, body):
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    total = sum(deltas)
    dur_ms = mvhd_duration_ms if mvhd_duration_ms is not None \
        else total * 1000 // timescale
    mvhd_dur = dur_ms * timescale // 1000
    mvhd = (bytes([0, 0, 0, 0]) + b"\x00" * 8
            + timescale.to_bytes(4, "big") + mvhd_dur.to_bytes(4, "big")
            + b"\x00" * 80)
    mdhd = (bytes([0, 0, 0, 0]) + b"\x00" * 8
            + timescale.to_bytes(4, "big") + total.to_bytes(4, "big")
            + b"\x00" * 4)
    # run-length collapse the deltas into stts (count, delta) entries
    entries = []
    for d in deltas:
        if entries and entries[-1][1] == d:
            entries[-1][0] += 1
        else:
            entries.append([1, d])
    stts = (b"\x00" * 4 + len(entries).to_bytes(4, "big")
            + b"".join(c.to_bytes(4, "big") + d.to_bytes(4, "big")
                       for c, d in entries))
    sizes = sizes or [100] * len(deltas)
    stsz = (b"\x00" * 4 + (0).to_bytes(4, "big")
            + len(sizes).to_bytes(4, "big")
            + b"".join(s.to_bytes(4, "big") for s in sizes))
    offsets = offsets or [4096]
    stco = (b"\x00" * 4 + len(offsets).to_bytes(4, "big")
            + b"".join(o.to_bytes(4, "big") for o in offsets))
    stbl = box(b"stbl", box(b"stts", stts) + box(b"stsz", stsz)
               + box(b"stco", stco))
    mdia = box(b"mdia", box(b"mdhd", mdhd) + box(b"minf", stbl))
    moov = box(b"moov", box(b"mvhd", mvhd) + box(b"trak", mdia))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isom") + moov


def test_mp4_sample_table_parse():
    """stts run-length deltas cumulate to per-sample ms timestamps
    against the mdhd timescale; stsz and stco come along."""
    from logsqlite_spark.operators.multimodal import (
        parse_mp4_sample_table)

    # irregular durations: 0.3s, 0.3s, 1.1s, 0.25s @ timescale 600
    p = _make_mp4_with_samples([180, 180, 660, 150], timescale=600,
                               sizes=[11, 22, 33, 44],
                               offsets=[64, 2048])
    st = parse_mp4_sample_table(p)
    assert st is not None
    assert st["timescale"] == 600
    assert st["sample_times_ms"] == [0, 300, 600, 1700]
    assert st["sample_sizes"] == [11, 22, 33, 44]
    assert st["chunk_offsets"] == [64, 2048]

    # a container with no stbl parses as None (fallback contract)
    assert parse_mp4_sample_table(_make_mp4(2000)) is None


def test_mp4_frame_sampling_uses_true_sample_times(spark):
    """With an stts present, fake=False emits the TRUE decode
    timestamp of the latest sample at-or-before each cadence tick —
    irregular durations land on real frame times (deduped), never
    invented round numbers."""
    from logsqlite_spark.operators.multimodal import sample_frames

    # samples at 0, 300, 600, 1700 ms; duration 1950 ms
    p = _make_mp4_with_samples([180, 180, 660, 150], timescale=600)
    media = spark.createDataFrame(
        [(1, 10, p, {"media_type": "video", "duration_ms": "9999"})],
        "media_id long, doc_id long, payload binary, "
        "meta map<string,string>")
    out = sample_frames(media, every_ms=500, fake=False).collect()
    # ticks 0, 500, 1000, 1500 -> samples 0, 300, 600, 600 (dedup)
    assert sorted(r["frame_ts_ms"] for r in out) == [0, 300, 600]

    # tighter cadence reaches the late sample too
    out = sample_frames(media, every_ms=100, fake=False).collect()
    assert sorted(r["frame_ts_ms"] for r in out) == [0, 300, 600, 1700]

    # no sample table -> duration-derived spacing (old behavior)
    plain = _make_mp4(1950, timescale=600)
    media2 = spark.createDataFrame(
        [(2, 20, plain, {"media_type": "video"})],
        "media_id long, doc_id long, payload binary, "
        "meta map<string,string>")
    out = sample_frames(media2, every_ms=500, fake=False).collect()
    assert sorted(r["frame_ts_ms"] for r in out) == [0, 500, 1000, 1500]


# ---------------------------------------------------------------------------
# Round 14 (VERDICT r13 #7): native-lib parity, capability-skipped.
# These run wherever Pillow / PyAV are deployed (skipped cleanly in
# this container) and pin the pure-Python decoders ≡ the native ones
# on the overlap formats, plus Pillow-fallback coverage of the lossy
# formats the pure decoders refuse.


def _rand_rgb(h, w, seed=14):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_pure_decoders_match_pillow_on_overlap_formats():
    PIL = pytest.importorskip("PIL")  # noqa: N806, F841
    import io

    import numpy as np
    from PIL import Image

    from logsqlite_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from logsqlite_spark.operators.multimodal import (
        _decode_bmp,
        _decode_gif,
        _decode_png,
        _encode_png,
    )
    from logsqlite_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    img = _rand_rgb(17, 23)

    def pil_bytes(arr, fmt, **kw):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format=fmt, **kw)
        return buf.getvalue()

    def pil_rgb(payload):
        return np.asarray(
            Image.open(io.BytesIO(payload)).convert("RGB"), np.uint8)

    # PNG 8-bit: exact both directions
    p = pil_bytes(img, "PNG")
    assert np.array_equal(_decode_png(p), pil_rgb(p))
    ours = _encode_png(img)
    assert np.array_equal(pil_rgb(ours), img)

    # BMP: exact both directions
    b = pil_bytes(img, "BMP")
    assert np.array_equal(_decode_bmp(b), pil_rgb(b))

    # GIF (palette-quantized by PIL; both decoders see the SAME file)
    g = pil_bytes(img, "GIF")
    assert np.array_equal(_decode_gif(g), pil_rgb(g))

    # WEBP lossless (VP8L): exact both directions
    wl = pil_bytes(img, "WEBP", lossless=True)
    assert np.array_equal(decode_webp(wl), pil_rgb(wl))
    ours_w = encode_webp_lossless(img)
    assert np.array_equal(pil_rgb(ours_w), img)

    # JPEG baseline: lossy — pin both decoders within IDCT tolerance
    for payload in (encode_jpeg(img),
                    pil_bytes(img, "JPEG", quality=92)):
        a = decode_jpeg(payload).astype(np.int32)
        bb = pil_rgb(payload).astype(np.int32)
        diff = np.abs(a - bb)
        assert diff.mean() <= 1.5 and diff.max() <= 24, \
            (diff.mean(), diff.max())


def test_pillow_fallback_covers_lossy_formats(spark):
    """media_decode_features must cover lossy-VP8 WebP through the
    Pillow integration point (the pure decoder genuinely refuses it) —
    and, since r16, progressive JPEG and 16-bit PNG decode NATIVELY:
    where Pillow exists this pins the native decodes against Pillow's
    on Pillow-GENERATED files (real-world bitstreams, not just our own
    encoder's)."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from logsqlite_spark.operators.jpeg import decode_jpeg
    from logsqlite_spark.operators.multimodal import _decode_png, decode_media
    from logsqlite_spark.operators.webp import decode_webp

    img = _rand_rgb(16, 16)

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", progressive=True)
    prog_jpeg = buf.getvalue()
    # native progressive decode ≡ Pillow within IDCT tolerance (r16)
    ours = decode_jpeg(prog_jpeg).astype(np.int32)
    theirs = np.asarray(Image.open(io.BytesIO(prog_jpeg))
                        .convert("RGB"), np.uint8).astype(np.int32)
    diff = np.abs(ours - theirs)
    assert diff.mean() <= 1.5 and diff.max() <= 24, \
        (diff.mean(), diff.max())

    buf = io.BytesIO()
    Image.fromarray((img[:, :, 0].astype(np.uint16) * 257)).save(
        buf, format="PNG")  # 16-bit grayscale PNG
    png16 = buf.getvalue()
    # native 16-bit PNG decode ≡ Pillow's I;16→RGB exactly (r16)
    exp = np.asarray(Image.open(io.BytesIO(png16)).convert("RGB"),
                     np.uint8)
    assert np.array_equal(_decode_png(png16), exp)

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="WEBP", lossless=False,
                              quality=80)
    vp8 = buf.getvalue()
    with pytest.raises(NotImplementedError):
        decode_webp(vp8)

    media = spark.createDataFrame(
        [(i, i, p, None) for i, p in
         enumerate((prog_jpeg, png16, vp8))],
        "media_id long, doc_id long, payload binary, "
        "meta map<string,string>")
    out = {r["media_id"]: r for r in
           decode_media(media, codec="native").collect()}
    for i in range(3):
        assert out[i]["media_type"] == "image"
    assert out[0]["feature"][1] == 16.0  # H of the progressive JPEG
    assert out[2]["feature"][1] == 16.0  # H of the lossy WebP


def test_pyav_backed_mp4_pixel_decode(spark):
    """Runs only where PyAV/ffmpeg exists: decode_media(native) serves
    video pixel statistics from the first frame (media_type 'video'),
    closing the marked integration point."""
    av = pytest.importorskip("av")
    import io

    import numpy as np

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=4)
        stream.width, stream.height = 32, 16
        stream.pix_fmt = "yuv420p"
        for k in range(4):
            frame = av.VideoFrame.from_ndarray(
                np.full((16, 32, 3), k * 40, np.uint8), format="rgb24")
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    payload = buf.getvalue()

    from logsqlite_spark.operators.multimodal import decode_media

    media = spark.createDataFrame(
        [(1, 1, payload, None)],
        "media_id long, doc_id long, payload binary, "
        "meta map<string,string>")
    row = decode_media(media, codec="native").collect()[0]
    assert row["media_type"] == "video"
    assert row["feature"][0] == 3.0
    assert (row["feature"][1], row["feature"][2]) == (16.0, 32.0)


def _png16_gray(w: int = 16, h: int = 16) -> bytes:
    """Hand-built, fully VALID 16-bit grayscale PNG (no Pillow needed
    to generate it) — deterministic pixels (r*w+c)*97 mod 65536."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    rows = b"".join(
        b"\x00" + b"".join(
            (((r * w + c) * 97) % 65536).to_bytes(2, "big")
            for c in range(w))
        for r in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b""))


def _arith_jpeg_header() -> bytes:
    """SOI + SOF9 (extended sequential, ARITHMETIC coding) header —
    enough for the pure decoder to identify a coding mode it does not
    implement and route to the Pillow point (progressive SOF2 decodes
    natively since r16, so the arithmetic mode is the remaining
    refusal fixture)."""
    sof9_body = bytes([8]) + (16).to_bytes(2, "big") \
        + (16).to_bytes(2, "big") + bytes([1, 1, 0x11, 0])
    return (b"\xff\xd8\xff\xc9"
            + (len(sof9_body) + 2).to_bytes(2, "big") + sof9_body)


def _lossy_webp_stub() -> bytes:
    """RIFF/WEBP container holding a 'VP8 ' (lossy) chunk — the pure
    decoder must refuse at the chunk tag, never parse the payload."""
    body = b"\x00" * 16
    chunk = b"VP8 " + len(body).to_bytes(4, "little") + body
    return (b"RIFF" + (4 + len(chunk)).to_bytes(4, "little")
            + b"WEBP" + chunk)


def test_decode_media_integration_points_without_native_libs():
    """VERDICT r14 #7: the Pillow/PyAV integration points of
    ``decode_media`` exercised IN THIS container via vendored
    real-format fixtures.  Every fixture must (a) be refused by the
    pure decoder FOR THE DOCUMENTED REASON — not a parse crash — and
    (b) flow through ``_native_features`` to the conditional-import
    point: a full decode when the native lib is importable, else the
    documented NotImplementedError naming the lib.  Green either way,
    so the dispatch chain is pinned even where Pillow/PyAV are absent
    (the byte-level Pillow/PyAV parity pins stay in the
    capability-gated tests above)."""
    import pytest as _pytest

    from logsqlite_spark.operators.jpeg import decode_jpeg
    from logsqlite_spark.operators.multimodal import (
        _native_features,
        _decode_png,
    )
    from logsqlite_spark.operators.webp import decode_webp

    try:
        import PIL  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False

    png16, arith, vp8 = _png16_gray(), _arith_jpeg_header(), \
        _lossy_webp_stub()

    # (a) the pure decoders that still route to Pillow refuse for the
    # documented reasons (progressive JPEG / 16-bit PNG decode
    # natively since r16 — covered by the fixture tests below)
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(arith)
    with _pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(vp8)

    # 16-bit PNG: NATIVE decode, no Pillow in the path (r16)
    import numpy as _np

    got = _decode_png(png16)
    exp = _np.array([[(((r * 16 + c) * 97) % 65536) >> 8
                      for c in range(16)] for r in range(16)],
                    _np.uint8)
    assert _np.array_equal(got, _np.repeat(exp[:, :, None], 3, axis=2))
    kind, f = _native_features(png16)
    assert kind == "image" and f[1] == 16.0 and f[2] == 16.0

    # (b) the remaining fallback formats reach the conditional-import
    # point
    for payload in (arith, vp8):
        if not have_pil:
            with _pytest.raises(NotImplementedError, match="Pillow"):
                _native_features(payload)

    # mp4 dispatch reaches the PyAV point the same way
    mp4 = (b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00"
           b"isomiso2avc1mp41")
    try:
        import av  # noqa: F401
        have_av = True
    except ImportError:
        have_av = False
    if not have_av:
        with _pytest.raises(NotImplementedError, match="PyAV"):
            _native_features(mp4)


# --- r16 VERDICT #4: native progressive JPEG + 16-bit PNG, byte-pinned


def test_progressive_jpeg_decodes_natively_roundtrip():
    """Progressive (SOF2) JPEG decodes natively (T.81 Annex G:
    spectral selection + successive approximation + EOB runs).  The
    progressive encoder emits the SAME quantized coefficients as the
    baseline encoder, so the two decodes must be BIT-IDENTICAL — an
    end-to-end pin of every scan type (DC first/refine, AC
    first/refine) without Pillow."""
    import numpy as np

    from logsqlite_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(14)
    for shape in ((16, 16), (17, 23), (24, 9)):
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        prog = encode_jpeg_progressive(img)
        assert b"\xff\xc2" in prog                 # really SOF2
        assert np.array_equal(decode_jpeg(prog),
                              decode_jpeg(encode_jpeg(img)))
    # near-flat content: sparse significance + long EOB runs in the
    # refinement scans (the fiddly correction-bit paths)
    nearly = (np.full((48, 32, 3), 128)
              + rng.integers(-2, 3, size=(48, 32, 3))).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_progressive(nearly)),
                          decode_jpeg(encode_jpeg(nearly)))


def test_committed_fixture_decodes_are_byte_pinned():
    """The COMMITTED binary fixtures (tests/fixtures/) decode to
    byte-pinned outputs — drift in either the fixture bytes or the
    decoders fails loudly, independent of the encoders."""
    import hashlib
    import pathlib

    from logsqlite_spark.operators.jpeg import decode_jpeg
    from logsqlite_spark.operators.multimodal import (
        _decode_png,
        _native_features,
    )

    fx = pathlib.Path(__file__).parent / "fixtures"

    prog = (fx / "progressive_17x23.jpg").read_bytes()
    assert hashlib.sha256(prog).hexdigest() == \
        "f40db20bb98c7b9ee1897a9f4967bbc69aec9b82f959d37cd159547e380eb5b2"
    dec = decode_jpeg(prog)
    assert dec.shape == (17, 23, 3)
    assert hashlib.sha256(dec.tobytes()).hexdigest() == \
        "23bd88e3a55aedc3fa9a0bc546fc6e692b77af089e5208e51864ef1d953f641e"
    kind, f = _native_features(prog)
    assert kind == "image" and (f[1], f[2]) == (17.0, 23.0)

    png16 = (fx / "gray16_16x16.png").read_bytes()
    assert hashlib.sha256(png16).hexdigest() == \
        "e324526c7b7b60f3cbd78c77a128700cdd8c89949e0332907a008272c21f005c"
    dec2 = _decode_png(png16)
    assert dec2.shape == (16, 16, 3)
    assert hashlib.sha256(dec2.tobytes()).hexdigest() == \
        "26349fe9e6a4e11f522781c692c85eaffabcfd9ecebfc70a451da12f11f73251"
    kind2, f2 = _native_features(png16)
    assert kind2 == "image" and (f2[1], f2[2]) == (16.0, 16.0)


def test_decode_media_serves_progressive_and_png16_natively(spark):
    """decode_media(codec='native') serves progressive JPEG and
    16-bit PNG rows with NO media library in the container — the
    r15 'fallback branch' fixtures are now first-class decodes."""
    import pathlib

    from logsqlite_spark.operators.multimodal import decode_media

    fx = pathlib.Path(__file__).parent / "fixtures"
    rows = [(1, 10, (fx / "progressive_17x23.jpg").read_bytes(), None),
            (2, 20, (fx / "gray16_16x16.png").read_bytes(), None)]
    media = spark.createDataFrame(
        rows, "media_id long, doc_id long, payload binary, "
              "meta map<string,string>")
    out = {r["media_id"]: r for r in
           decode_media(media, codec="native").collect()}
    assert out[1]["media_type"] == "image"
    assert (out[1]["feature"][1], out[1]["feature"][2]) == (17.0, 23.0)
    assert out[2]["media_type"] == "image"
    assert (out[2]["feature"][1], out[2]["feature"][2]) == (16.0, 16.0)
