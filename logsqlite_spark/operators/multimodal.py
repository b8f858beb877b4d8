"""Multimodal columns (SURVEY.md §2.8 X5): binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns with a typed metadata struct, and runs decode /
feature-extract / resize / frame-sample as Arrow-batched pandas
functions over ``mapInPandas``. The Spark-side plumbing here — schema,
partitioning, UDF signatures, batch shapes — is real and tested; the
actual codec calls are STUBBED (this container has no image/audio
libraries): ``decode_media`` produces a deterministic fake decode when
``fake=True`` and raises ``NotImplementedError`` otherwise, marking
exactly where PIL/ffmpeg plug in.

Design rules at scale:
- media rows are large -> keep ``maxRecordsPerFile`` low on write and
  NEVER collect payloads to the driver;
- transformations go through ``mapInPandas`` so payload bytes move
  driver-free, Arrow batch by Arrow batch, and the decode library is
  initialized once per executor task, not per row;
- metadata-only queries must not touch payload bytes: parquet column
  pruning serves ``meta.*`` without reading ``payload`` pages.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),   # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_TYPE, True),
    ]
)

FEATURE_DIM = 16

DECODED_SCHEMA = (
    "media_id long, doc_id long, media_type string, "
    "n_bytes long, feature array<float>"
)

def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decode+embed: a tiny rolling
    statistic per byte stripe. Stable across runs and engines."""
    if not payload:
        return [0.0] * FEATURE_DIM
    acc = [0] * FEATURE_DIM
    for i, b in enumerate(payload):
        acc[i % FEATURE_DIM] = (acc[i % FEATURE_DIM] * 31 + b) % 100_000
    return [v / 100_000.0 for v in acc]

def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode payloads to fixed-width features, executor-side.

    With ``fake=False`` this is the integration point for a real codec
    (PIL / torchaudio / pyav): swap ``_fake_decode`` for the library
    call inside the same batch loop — the Spark plumbing is identical.
    """

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding needs an image/audio library; "
                    "install one and replace _fake_decode"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] if m is not None else None
                                   for m in pdf["meta"]],
                    "n_bytes": [len(p) if p is not None else 0
                                for p in pdf["payload"]],
                    "feature": [_fake_decode(bytes(p) if p is not None else b"")
                                for p in pdf["payload"]],
                }
            )
            yield out

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)

def resize_images(media: DataFrame, width: int, height: int,
                  fake: bool = True) -> DataFrame:
    """Resize image payloads (stub). Plumbing: payload->payload map
    with updated meta, executor-side, Arrow-batched."""

    def resize_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError("real resize needs PIL/opencv")
            # fake: payload unchanged, meta records the new dimensions
            metas = []
            for m in pdf["meta"]:
                m = dict(m) if m is not None else {}
                m["width"], m["height"] = width, height
                metas.append(m)
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return media.mapInPandas(resize_batches, MEDIA_SCHEMA)

def sample_frames(media: DataFrame, every_ms: int = 1000,
                  fake: bool = True) -> DataFrame:
    """Video -> frame rows (1:N explode), stubbed: emits frame indexes
    at the requested cadence from meta.duration_ms without decoding."""

    def sample_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame sampling needs ffmpeg/pyav")
            rows = []
            for mid, doc, meta in zip(pdf["media_id"], pdf["doc_id"], pdf["meta"]):
                if meta is None or meta.get("media_type") != "video":
                    continue
                duration = meta.get("duration_ms") or 0
                for t in range(0, int(duration), every_ms):
                    rows.append((mid, doc, t))
            yield pd.DataFrame(rows, columns=["media_id", "doc_id", "frame_ts_ms"])

    return media.mapInPandas(sample_batches,
                             "media_id long, doc_id long, frame_ts_ms long")

def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation — never touches payload pages
    (column pruning: check ReadSchema excludes ``payload``)."""
    return (
        media.groupBy(F.col("meta.media_type").alias("media_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.coalesce(F.col("meta.duration_ms"), F.lit(0)))
            .cast("long").alias("total_duration_ms"),
        )
    )
