"""Streaming quality monitor over the logs table (§2.8 extension).

Operationalizes the data-quality tier for the live ingest path: a
Structured Streaming query computes per-(window, container) health
metrics — row counts, empty/oversized-line counts, HLL distinct
sources — and appends ALERT rows for windows that violate the
declared thresholds to a plain parquet alert table the operator (or
the cleaner-cadence jobs) can tail. This is the "quarantine the bad
window before publication" loop of the batch ``operators.checks``
suite, kept streaming-shaped:

- state per live (window, container) is a handful of counters plus a
  fixed-size sketch — the watermark expires it, so an unbounded
  stream holds bounded state;
- thresholds evaluate in ``foreachBatch`` on the handful of finalized
  metric rows, never against the stream itself;
- the alert sink is idempotent per (window, container): append-mode
  windows finalize exactly once when the watermark passes, and a
  replayed micro-batch OVERWRITES its own ``batch_id=<id>`` partition
  of the alert table instead of appending duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logsqlite_spark.schema import LOGS_SCHEMA


def windowed_log_health(stream: DataFrame,
                        window: str = "5 minutes",
                        watermark: str = "10 minutes",
                        max_line_bytes: int = 16384) -> DataFrame:
    """Per-(window, container) health metrics for the logs stream."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "container_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.count(F.when(F.length("line") == 0, 1))
             .cast("long").alias("n_empty"),
             F.count(F.when(F.length("line") > max_line_bytes, 1))
             .cast("long").alias("n_oversized"),
             F.hll_sketch_estimate(
                 F.hll_sketch_agg("source", F.lit(12)))
             .cast("long").alias("est_sources"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "container_id", "n", "n_empty", "n_oversized",
                "est_sources")
    )


def _emit_alerts(df: DataFrame, batch_id: int, alerts_dir: str,
                 max_empty_ratio: float) -> None:
    """Threshold the finalized metric rows and write violations.

    Idempotent under micro-batch replay: foreachBatch is
    at-least-once, so a crash between the write and the checkpoint
    commit re-delivers the same batch_id. Each batch writes to its
    own ``batch_id=<id>`` partition with overwrite, so redelivery
    rewrites the same rows instead of appending a second copy.
    Readers just ``spark.read.parquet(alerts_dir)`` — batch_id
    surfaces as a discovered partition column they can ignore."""
    alerts = (
        df.withColumn(
            "rule",
            F.when(F.col("n_empty").cast("double")
                   > F.lit(max_empty_ratio) * F.col("n"),
                   F.lit("empty_ratio"))
            .when(F.col("n_oversized") > 0, F.lit("oversized_line")))
        .filter(F.col("rule").isNotNull())
    )
    if alerts.take(1):
        _migrate_flat_alerts(alerts_dir, df.sparkSession)
        alerts.write.mode("overwrite").parquet(
            f"{alerts_dir}/batch_id={int(batch_id)}")


def _migrate_flat_alerts(alerts_dir: str,
                         spark: SparkSession | None = None) -> None:
    """Adopt pre-partitioned-layout alert files (flat part-*.parquet
    written by the append-mode sink) into a ``batch_id=-1`` partition:
    mixing flat files with batch_id=N dirs would fail Spark's
    partition discovery and make the whole alert history unreadable
    on upgrade.

    Scheme-aware (ADVICE r6, carried): a local path migrates with
    os/shutil; any other URI (hdfs://, s3a://, ...) goes through the
    Hadoop FileSystem API of the active session — an unknown or
    unreachable filesystem raises instead of silently skipping the
    migration and corrupting partition discovery on the next write."""
    import os
    import shutil
    from urllib.parse import urlparse

    # Scheme sniffing hardened (ADVICE r8): urlparse alone misroutes a
    # relative local path containing a colon ('out:dir/alerts' parses
    # with scheme 'out' and would die in Hadoop's "No FileSystem for
    # scheme"), so only strings with a real authority separator
    # ('://') leave the local branch; and a file: URI with a non-empty
    # host ('file://host/path') must not silently drop the netloc —
    # there is no remote-file protocol here, so it raises.
    parsed = urlparse(alerts_dir)
    if parsed.scheme == "file" and parsed.netloc:
        raise ValueError(
            f"file: URI with a host is not supported: {alerts_dir!r}")
    if parsed.scheme in ("", "file") or "://" not in alerts_dir:
        local_dir = parsed.path if parsed.scheme == "file" else alerts_dir
        try:
            entries = os.listdir(local_dir)
        except FileNotFoundError:
            return
        legacy = [e for e in entries
                  if e.endswith(".parquet") and not e.startswith("batch_id=")]
        if legacy:
            dest = os.path.join(local_dir, "batch_id=-1")
            os.makedirs(dest, exist_ok=True)
            for e in legacy:
                shutil.move(os.path.join(local_dir, e),
                            os.path.join(dest, e))
        return

    if spark is None:
        raise ValueError(
            f"migrating legacy alerts at non-local URI {alerts_dir!r} "
            f"requires an active SparkSession (Hadoop FS access)")
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(alerts_dir)
    # raises (e.g. "No FileSystem for scheme") rather than no-op'ing
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return
    legacy_paths = [
        s.getPath() for s in fs.listStatus(p)
        if s.isFile() and s.getPath().getName().endswith(".parquet")
        and not s.getPath().getName().startswith("batch_id=")
    ]
    if legacy_paths:
        dest = jvm.org.apache.hadoop.fs.Path(p, "batch_id=-1")
        fs.mkdirs(dest)
        for lp in legacy_paths:
            target = jvm.org.apache.hadoop.fs.Path(dest, lp.getName())
            if not fs.rename(lp, target):
                raise OSError(
                    f"failed to migrate legacy alert file {lp} -> {target}")


def start_quality_monitor(spark: SparkSession, logs_dir: str,
                          alerts_dir: str,
                          checkpoint_dir: str,
                          window: str = "5 minutes",
                          watermark: str = "10 minutes",
                          max_empty_ratio: float = 0.5,
                          max_line_bytes: int = 16384,
                          query_name: str = "logsqlite-quality-monitor"):
    """Start the monitor: finalized windows violating a threshold are
    appended to ``alerts_dir`` with the violated rule named. Append
    output mode = a window alerts at most once (on watermark close)."""
    stream = (
        spark.readStream.schema(LOGS_SCHEMA)
        .option("maxFilesPerTrigger", "512")
        .parquet(logs_dir)
    )
    health = windowed_log_health(stream, window, watermark,
                                 max_line_bytes)

    def emit(df: DataFrame, batch_id: int) -> None:
        _emit_alerts(df, batch_id, alerts_dir, max_empty_ratio)

    return (
        health.writeStream.foreachBatch(emit)
        .outputMode("append")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
