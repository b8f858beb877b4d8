"""Streaming deduplication — the ingest-time twin of operators/dedup.

An at-least-once ingest path (ours is exactly that across crash
replay until the manifest commit lands, see streaming/ingest.py)
can hand duplicates to downstream consumers that read the stream
directly. ``dropDuplicatesWithinWatermark`` removes them with state
bounded by the watermark horizon: a key is remembered only until the
event-time watermark passes its first arrival + delay, so state is
O(arrival rate × watermark), not O(stream history) — the property
that makes streaming dedup viable at 100 TB/day. (Plain
``dropDuplicates`` on a stream keeps every key forever.)

Keys default to a content digest + container: duplicate *delivery*
(same line re-sent) dedups; identical text in different containers
does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "10 minutes"


def streaming_dedup_exact(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Drop re-deliveries whose keys repeat within the watermark window.

    ``key_cols=None`` dedups on (container_id, md5(line)) — the wire
    identity of a log row. The returned stream is append-mode safe.
    """
    if key_cols is None:
        stream = stream.withColumn("__digest", F.md5(F.col("line")))
        key_cols = ["container_id", "__digest"]
        out = (
            stream.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols)
            .drop("__digest")
        )
        return out
    return (
        stream.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )
