"""logsqlite_spark — a PySpark-native log analytics engine.

A from-scratch re-expression of the capabilities of ``daschr/logsqlite``
(a Docker logging-driver plugin storing per-container logs in SQLite,
reference at /root/reference) as an idiomatic Apache Spark engine:

- unbounded log ingestion  -> Structured Streaming micro-batches
- one-SQLite-DB-per-container -> one Parquet table partitioned by
  (container_id, date)
- hidden ROWID arrival order -> explicit per-container contiguous ``seq``
- ``idx_ts`` B-tree index   -> Parquet row-group min/max stats + dynamic
  partition pruning on ``date``
- docker-logs query surface (since/until/tail/follow) -> batch DataFrame
  pipelines + a follow-mode streaming reader
- retention (age / max-lines) -> partition drops + boundary-file rewrites

Beyond the reference surface, the engine ships LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale: built-in JVM expressions first, Arrow-batched
pandas UDFs only where unavoidable, no driver-side row loops.
"""

from logsqlite_spark.config import LogConfig, parse_duration_s, parse_size_bytes
from logsqlite_spark.session import get_spark

__all__ = [
    "LogConfig",
    "get_spark",
    "parse_duration_s",
    "parse_size_bytes",
]

__version__ = "0.1.0"
