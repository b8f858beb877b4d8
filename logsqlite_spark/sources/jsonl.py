"""JSONL spool source — the JVM-native alternate wire format.

The reference speaks only Docker's protobuf FIFO framing, but generic
log shippers (fluentd/vector/filebeat) emit JSON lines. Supporting
them as a first-class spool format has a performance bonus: Spark's
native JSON reader decodes *inside the JVM* (whole-stage codegen, no
Python in the loop), unlike the protobuf codec which needs
``mapInPandas``. At 100 TB the JSONL path is the faster ingest.

Record shape (one JSON object per line):

    {"n": 0, "source": "stdout", "time_nano": 1704067200000000000,
     "line": "payload", "partial": false,
     "partial_meta": {"last": false, "id": "", "ordinal": 0}}

``n`` is the writer-assigned index within the file — JSON lines carry
no implicit order once Spark splits a file, so arrival order must be
explicit in the record (the protobuf path gets it from frame position).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

JSONL_SCHEMA = (
    "n long, source string, time_nano long, line string, partial boolean, "
    "partial_meta struct<last:boolean,id:string,ordinal:int>, "
    "_corrupt string"
)

class JsonlSpoolWriter:
    """Burst writer for the JSONL format (shipper stand-in)."""

    def __init__(self, spool_dir: str, container_id: str):
        self.dir = Path(spool_dir) / container_id
        self.dir.mkdir(parents=True, exist_ok=True)
        self._counter = 0

    def write_burst(self, records: Iterable[dict],
                    compress: bool = False) -> str:
        lines = []
        for i, rec in enumerate(records):
            rec = dict(rec)
            rec.setdefault("n", i)
            lines.append(json.dumps(rec))
        blob = ("\n".join(lines) + "\n").encode("utf-8")
        if compress:
            import gzip

            blob = gzip.compress(blob)
        stem = f"{time.time_ns():020d}-{self._counter:06d}"
        ext = "jsonl.gz" if compress else "jsonl"
        name = self.dir / f"{stem}.{ext}"
        tmp = self.dir / f".{stem}.{ext}.tmp"
        tmp.write_bytes(blob)
        os.rename(tmp, name)
        self._counter += 1
        return str(name)

def read_jsonl_spool_batch(spark: SparkSession, spool_dir: str,
                           container_id: str | None = None,
                           paths: list[str] | None = None) -> DataFrame:
    """Decode JSONL spool files to the same shape the protobuf decode
    yields (path, container_id, ..., frame_no) — fully JVM-side.
    ``paths``: exact file list from a driver-side listing (skips a
    second Spark directory listing and pins the read set)."""
    # *.jsonl* also matches .jsonl.gz — Spark's json reader gunzips
    # by file extension natively, so the JVM path stays codec-free
    src = paths or f"{spool_dir}/{container_id or '*'}/*.jsonl*"
    raw = (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(src)
        .withColumn("path", F.input_file_name())
    )
    return _to_entry_shape(raw)

def read_jsonl_spool_stream(spark: SparkSession, spool_dir: str,
                            max_bytes_per_trigger: int | None = None,
                            container_id: str | None = None) -> DataFrame:
    reader = (
        spark.readStream.schema(JSONL_SCHEMA)
        .option("pathGlobFilter", "*.jsonl*")
        .option("maxFileAge", "3650d")
        .option("cleanSource", "delete")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
    )
    if max_bytes_per_trigger is not None:
        reader = reader.option("maxBytesPerTrigger", str(max_bytes_per_trigger))
    raw = reader.json(f"{spool_dir}/{container_id or '*'}/").withColumn(
        "path", F.input_file_name())
    return _to_entry_shape(raw)

def _to_entry_shape(raw: DataFrame) -> DataFrame:
    """Canonicalize (S2) + derive container_id from the path, matching
    sources/spool.DECODED_SCHEMA so the ingest pipeline is shared.
    Unparseable lines flow into the same '__decode_error__' quarantine
    as corrupt protobuf frames (T4 policy, one place downstream)."""
    corrupt = F.col("_corrupt").isNotNull()
    return raw.select(
        # plain-filesystem path form, matching sources/spool
        # (_finish_decoded) — see the watermark-portability note there
        F.regexp_replace("path", r"^file:/+", "/").alias("path"),
        F.element_at(F.split(F.col("path"), "/"), -2).alias("container_id"),
        F.when(corrupt, F.lit("__decode_error__"))
        .otherwise(F.coalesce(F.col("source"), F.lit(""))).alias("source"),
        F.coalesce(F.col("time_nano"), F.lit(0)).alias("time_nano"),
        F.when(corrupt, F.concat(F.col("_corrupt"), F.lit("\n")))
        .when(F.col("line").endswith("\n"), F.col("line"))
        .otherwise(F.concat(F.coalesce(F.col("line"), F.lit("")),
                            F.lit("\n"))).alias("line"),
        F.coalesce(F.col("partial"), F.lit(False)).alias("partial"),
        F.col("partial_meta"),
        F.when(corrupt, F.lit(-1))
        .otherwise(F.col("n")).alias("frame_no"),
    )
