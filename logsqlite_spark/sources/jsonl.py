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


def _decoded_input_file_name() -> F.Column:
    """``input_file_name()``, percent-DECODED to the raw posix form.

    Unlike ``binaryFile``'s path column (plain: a warehouse dir with a
    space comes back with a literal space), ``input_file_name()``
    yields the URI-encoded spelling (space -> %20, %% -> %25).  The
    last_file watermark, the stale-file compare, and the batch-pull
    read-coverage guard all compare this column against raw
    driver-side listings, so without decoding a single escapable
    character in the spool path makes every file look uncovered and
    permanently blocks the pull (round-15 ADVICE, reproduced with a
    space in the warehouse dir).

    ``url_decode`` is form-decoding ('+' -> space), but
    ``input_file_name()`` leaves a literal '+' unescaped — protect it
    as %2B first and the two decodings agree.  Every '%' in the input
    is a valid escape because the URI form is Spark-generated."""
    return F.url_decode(
        F.regexp_replace(F.input_file_name(), r"\+", "%2B"))

JSONL_SCHEMA = (
    "n long, source string, time_nano long, line string, partial boolean, "
    "partial_meta struct<last:boolean,id:string,ordinal:int>, "
    "_corrupt string"
)

class JsonlSpoolWriter:
    """Burst writer for the JSONL format (shipper stand-in)."""

    def __init__(self, spool_dir: str, container_id: str):
        from logsqlite_spark.sources.spool import seed_last_mtime_ms

        self.dir = Path(spool_dir) / container_id
        self.dir.mkdir(parents=True, exist_ok=True)
        self._counter = 0
        self._last_mtime_ms = seed_last_mtime_ms(self.dir)

    def write_burst(self, records: Iterable[dict],
                    compress: bool = False) -> str:
        from logsqlite_spark.sources.spool import space_mtime_ms

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
        # mtime spacing: see spool.space_mtime_ms (stream delivery
        # order is ms-mtime order; ties reorder arbitrarily)
        self._last_mtime_ms = space_mtime_ms(tmp, self._last_mtime_ms)
        os.rename(tmp, name)
        self._counter += 1
        return str(name)

_GZ_SPLIT_DDL = "path string, raw string"


def _split_jsonl_gz_arrow(batches):
    """mapInArrow body for ``.jsonl.gz`` spool files: per-file gunzip
    + line split (the JSON field decode stays JVM-side via
    ``from_json``).  Spark's native json reader gunzips by extension
    via the Hadoop codec, which THROWS on a corrupt/truncated stream
    (ignoreCorruptFiles=false) — one bad rotated-shipper file would
    fail the whole pull and be retried forever (the watermark never
    advances past it).  Routing gz files through the same
    ``_gunzip_buf`` quarantine policy as ``.plog.gz`` makes a corrupt
    file yield ONE unparseable sentinel line instead: ``from_json``
    marks it ``_corrupt`` and it flows into the decode-error
    quarantine while the pull proceeds."""
    import pyarrow as pa

    from logsqlite_spark.sources.spool import _BAD_GZIP_SENTINEL, _gunzip_buf

    schema = pa.schema([("path", pa.string()), ("raw", pa.string())])
    from logsqlite_spark.sources.spool import _verify_content_lengths

    for batch in batches:
        _verify_content_lengths(batch)
        contents = batch.column("content")
        out_p: list[str] = []
        out_r: list[str] = []
        for i, p in enumerate(batch.column("path").to_pylist()):
            raw = contents[i].as_py()
            buf = _gunzip_buf(p, raw)
            if buf == _BAD_GZIP_SENTINEL:
                out_p.append(p)
                # never valid JSON; carries the COMPRESSED length the
                # read saw, so a mismatch with the on-disk size is
                # direct evidence of a short content read
                out_r.append(
                    f"\x00 corrupt gzip stream (read {len(raw)} bytes)")
                continue
            for ln in buf.decode("utf-8", "replace").split("\n"):
                ln = ln.rstrip("\r")
                if ln.strip():  # the native reader skips blank lines too
                    out_p.append(p)
                    out_r.append(ln)
        yield pa.RecordBatch.from_arrays(
            [pa.array(out_p, pa.string()), pa.array(out_r, pa.string())],
            schema=schema)


def _jsonl_gz_raw(binary_df: DataFrame) -> DataFrame:
    """(path, content) of ``.jsonl.gz`` files -> the native json
    reader's raw shape (so ``_to_entry_shape`` is shared)."""
    rec = F.from_json(
        "raw", JSONL_SCHEMA,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    ).alias("rec")
    split = binary_df.mapInArrow(_split_jsonl_gz_arrow, _GZ_SPLIT_DDL) \
        .select("path", "raw", rec)
    # from_json yields a NULL struct (not a populated _corrupt) on some
    # unparseable inputs — coalesce so either form quarantines
    corrupt = F.coalesce(
        F.col("rec._corrupt"),
        F.when(F.col("rec").isNull(), F.col("raw")))
    return split.select(
        F.col("rec.n").alias("n"),
        F.col("rec.source").alias("source"),
        F.col("rec.time_nano").alias("time_nano"),
        F.col("rec.line").alias("line"),
        F.col("rec.partial").alias("partial"),
        F.col("rec.partial_meta").alias("partial_meta"),
        corrupt.alias("_corrupt"),
        "path",
    )


def read_jsonl_spool_batch(spark: SparkSession, spool_dir: str,
                           container_id: str | None = None,
                           paths: list[str] | None = None) -> DataFrame:
    """Decode JSONL spool files to the same shape the protobuf decode
    yields (path, container_id, ..., frame_no).  Plain ``.jsonl``
    files decode fully JVM-side; ``.jsonl.gz`` files gunzip through
    the Arrow quarantine path (see ``_split_jsonl_gz_arrow`` — the
    native codec turns one corrupt shipper file into a poison pill).
    ``paths``: exact file list from a driver-side listing (skips a
    second Spark directory listing and pins the read set)."""
    if paths is None:
        import glob as _glob

        paths = sorted(
            _glob.glob(f"{spool_dir}/{container_id or '*'}/*.jsonl*"))
    plain = [p for p in paths if not p.endswith(".gz")]
    gz = [p for p in paths if p.endswith(".gz")]
    parts = []
    if plain:
        parts.append(
            spark.read.schema(JSONL_SCHEMA)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .json(plain)
            .withColumn("path", _decoded_input_file_name())
        )
    if gz:
        parts.append(_jsonl_gz_raw(
            spark.read.format("binaryFile").load(gz)
            .select("path", "length", "content")))
    if not parts:
        parts.append(spark.createDataFrame(
            [], JSONL_SCHEMA + ", path string"))
    raw = parts[0]
    for extra in parts[1:]:
        raw = raw.unionByName(extra)
    return _to_entry_shape(raw)

def read_jsonl_spool_stream(spark: SparkSession, spool_dir: str,
                            max_bytes_per_trigger: int | None = None,
                            container_id: str | None = None) -> DataFrame:
    """Streaming decode: ONE ``binaryFile`` source for plain ``.jsonl``
    AND ``.jsonl.gz``, split+gunzipped Arrow-side with the JSON field
    decode JVM-side via ``from_json`` — mirroring the plog stream.

    This MUST be a single file source (round-15 stream-soak finding,
    caught in 7 kill cycles): the previous design unioned the native
    json reader for plain files with a binaryFile source for gz, and
    the two sources checkpoint their file offsets INDEPENDENTLY — one
    source could deliver a newer-named file in an earlier micro-batch
    than the other source's older file, violating per-container
    arrival order.  The monotonicity guard then stale-quarantined the
    late file and its rows never reached the table (8 rows lost per
    incident, shifting every later seq).  One source = one
    globally-ordered file sequence per container, the invariant the
    watermark is built on.

    Corrupt gz files still quarantine as ONE decode-error row instead
    of failing micro-batches forever (``_gunzip_buf`` sentinel), and a
    corrupt plain line flows into the same ``_corrupt`` path as the
    batch reader's PERMISSIVE mode."""
    src = f"{spool_dir}/{container_id or '*'}/"
    reader = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .option("pathGlobFilter", "*.jsonl*")
        .option("latestFirst", "false")
        .option("maxFileAge", "3650d")
        .option("cleanSource", "delete")
    )
    if max_bytes_per_trigger is not None:
        reader = reader.option("maxBytesPerTrigger",
                               str(max_bytes_per_trigger))
    raw = _jsonl_gz_raw(reader.load(src)
                        .select("path", "length", "content"))
    return _to_entry_shape(raw)

def _to_entry_shape(raw: DataFrame) -> DataFrame:
    """Canonicalize (S2) + derive container_id from the path, matching
    sources/spool.DECODED_SCHEMA so the ingest pipeline is shared.
    Unparseable lines flow into the same '__decode_error__' quarantine
    as corrupt protobuf frames (T4 policy, one place downstream)."""
    corrupt = F.col("_corrupt").isNotNull()
    return raw.select(
        # plain-filesystem path form, matching sources/spool
        # (_finish_decoded) — the scheme strip covers the binaryFile
        # (.gz) side; the input_file_name side arrives pre-decoded via
        # _decoded_input_file_name (see its escaping note)
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
