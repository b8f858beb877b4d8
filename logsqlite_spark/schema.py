"""Engine schemas.

The reference's storage schema is two opaque columns —
``logs(ts NUMBER, message BLOB)`` with an index on ``ts``
(/root/reference/src/logger.rs:146-147) — where ``message`` is a
re-encoded protobuf frame. A columnar engine inverts that: the LogEntry
fields (/root/reference/src/entry.proto:5-17) become first-class typed
columns so scans prune and predicates push down; the wire frame can be
re-derived on demand (sources/frames.py).

Physical layout of the unified logs table:
``logs/container_id=<id>/date=<yyyy-mm-dd>/*.parquet``
- ``container_id`` partition column replaces one-SQLite-file-per-container
  (logger.rs:250-251): per-container isolation, pruning, O(1) drop.
- ``date`` partition column + parquet min/max stats on ``ts_nanos``
  replace the ``idx_ts`` B-tree for since/until seeks.
- ``seq``: explicit per-container contiguous monotonic long replacing
  SQLite's hidden ROWID (arrival order, cursor key, retention key).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Partial-log metadata (entry.proto:13-17).
PARTIAL_META_TYPE = T.StructType(
    [
        T.StructField("last", T.BooleanType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("ordinal", T.IntegerType(), True),
    ]
)

# Columns as stored in parquet data files (partition cols excluded).
LOGS_DATA_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("ts_nanos", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("line", T.StringType(), True),
        T.StructField("partial", T.BooleanType(), True),
        T.StructField("partial_meta", PARTIAL_META_TYPE, True),
    ]
)

# Full logical schema including partition columns.
LOGS_SCHEMA = T.StructType(
    list(LOGS_DATA_SCHEMA.fields)
    + [
        T.StructField("container_id", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
    ]
)

# Decoded wire record, before seq assignment (ingest-time shape).
LOG_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("container_id", T.StringType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("time_nano", T.LongType(), False),
        T.StructField("line", T.StringType(), True),
        T.StructField("partial", T.BooleanType(), True),
        T.StructField("partial_meta", PARTIAL_META_TYPE, True),
        # arrival order within the spool file (frame index) — drives seq
        T.StructField("frame_no", T.LongType(), False),
    ]
)

LOG_CONF_TYPE = T.StructType(
    [
        T.StructField("max_lines_per_tx", T.LongType(), True),
        T.StructField("max_size_per_tx", T.LongType(), True),
        T.StructField("message_read_timeout_ms", T.LongType(), True),
        T.StructField("cleanup_age_s", T.LongType(), True),
        T.StructField("cleanup_max_lines", T.LongType(), True),
        T.StructField("cleanup_interval_s", T.LongType(), True),
        T.StructField("delete_when_stopped", T.BooleanType(), True),
    ]
)

# Control table replacing active_fetches(container_id, fifo, log_conf BLOB)
# (/root/reference/src/statehandler.rs:83-87); the bincode blob becomes a
# typed struct.
ACTIVE_STREAMS_SCHEMA = T.StructType(
    [
        T.StructField("container_id", T.StringType(), False),
        T.StructField("fifo", T.StringType(), True),
        T.StructField("log_conf", LOG_CONF_TYPE, True),
    ]
)
