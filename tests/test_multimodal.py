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
