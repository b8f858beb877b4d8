"""Wire-parity emit path (S3/S8).

The reference stores the re-encoded length-prefixed LogEntry frame and
streams it back to Docker verbatim (/root/reference/src/logger.rs:125-128,
395-455; docker.rs:187). We store typed columns instead, so the wire
read path *re-derives* frames on demand: a ``mapInPandas`` projection
(executor-side, Arrow-batched). Frames only reach the driver through
``toLocalIterator`` at the API edge, mirroring the reference's
row-at-a-time HTTP body without materializing the result.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logsqlite_spark.sources.frames import LogEntry, PartialMeta

WIRE_SCHEMA = "container_id string, seq long, frame binary"


def entry_of(source, time_nano, line, partial, meta):
    """One row's LogEntry under the engine's coercion rules — the ONE
    copy of the row→wire contract, shared by the distributed encoder
    below and the server's driver-side follow encoder (a second copy
    would silently drift when the wire contract changes).  Called
    per-row on the executor hot path: the frames import is module-
    level, not in-function."""
    pm = None
    # a pandas NULL struct arrives as NaN (float); a Spark Row or a
    # plain dict both expose the same keys
    if meta is not None and not isinstance(meta, float):
        m = meta.asDict() if hasattr(meta, "asDict") else dict(meta)
        pm = PartialMeta(last=bool(m.get("last") or False),
                         id=m.get("id") or "",
                         ordinal=int(m.get("ordinal") or 0))
    return LogEntry(source=source or "",
                    time_nano=int(time_nano or 0),
                    line=(line or "").encode("utf-8"),
                    partial=bool(partial or False),
                    partial_meta=pm)

def to_wire_frames(logs: DataFrame) -> DataFrame:
    """logs rows -> (container_id, seq, frame): the exact on-wire bytes
    the reference would store and serve for each row."""

    def encode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        from logsqlite_spark.sources.frames import encode_frame

        for pdf in batches:
            frames = [
                encode_frame(entry_of(src, tn, line, partial, meta))
                for src, line, partial, meta, tn in zip(
                    pdf["source"], pdf["line"], pdf["partial"],
                    pdf["partial_meta"], pdf["ts_nanos"],
                )
            ]
            yield pd.DataFrame(
                {
                    "container_id": pdf["container_id"],
                    "seq": pdf["seq"],
                    "frame": frames,
                }
            )

    base = logs
    for col, default in (("partial", F.lit(False)),
                         ("partial_meta", F.lit(None)),
                         ("ts_nanos", F.lit(0))):
        if col not in base.columns:
            base = base.withColumn(col, default)
    return base.select("container_id", "seq", "source", "line", "partial",
                       "partial_meta", "ts_nanos") \
               .mapInPandas(encode_batches, WIRE_SCHEMA)

def stream_wire_frames(logs: DataFrame):
    """S8 bounded emit: ordered frames, pulled partition-by-partition
    (never a full collect)."""
    return to_wire_frames(logs).orderBy("seq").toLocalIterator()
