"""SparkSession factory with scale-oriented defaults.

Local tests run on ``local[N]`` but every knob here is chosen for the
1000-executor / 100 TB case and merely *parameterized* down for tests:

- AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  means the same plan survives a 100x scale-up without retuning.
- ``spark.sql.shuffle.partitions`` from env (32 locally; thousands on a
  real cluster) — AQE coalesces down, so oversizing is safe.
- Arrow enabled for the few pandas-UDF paths (vectorized Python).
- ``spark.sql.legacy.parquet.nanosAsLong`` — the engine's native time
  column is epoch-*nanoseconds* stored as INT64 (the reference stores
  ``time_nano`` from Docker's LogEntry, /root/reference/src/logger.rs:130),
  and Spark timestamps are only µs; reading TIMESTAMP(NANOS) parquet as
  LongType preserves full precision end to end.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Parquet pushdown In-predicate ceiling, defined ONCE (ADVICE r16):
#: a pushed In compiles to a left-deep parquet OR tree whose evaluation
#: recurses once per value — ~2000 values StackOverflowErrors the scan
#: task (measured at sf0.1).  Collected-key probes that want their In
#: to reach row-group stats must stay at or below this; dedup's
#: ``_BANDED_KEY_PROBE_CAP`` imports it so the invariant can't drift
#: apart silently.
PARQUET_IN_FILTER_THRESHOLD = 1024

def get_spark(app_name: str = "logsqlite-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle_parts = os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # batch band-key probes travel as ~1k-entry In predicates;
        # the parquet pushdown default gives up past 10 values and
        # degrades to a min/max range check, which a uniform hash key
        # never prunes (r16 — the sorted bands artifact).  Ceiling
        # rationale on PARQUET_IN_FILTER_THRESHOLD above.
        .config("spark.sql.parquet.pushdown.inFilterThreshold",
                str(PARQUET_IN_FILTER_THRESHOLD))
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # batch pulls hand Spark an explicit spool file list; above 32
        # paths the default launches a DISTRIBUTED listing job whose
        # scheduling costs ~0.3 s — driver-side stat of O(100) local
        # files is microseconds.  Raised, not disabled: a genuinely
        # huge list (cloud object stores) still goes parallel.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
                "10000")
        .config("spark.ui.enabled", "false")
        # PySpark's per-API-call origin capture (a stack walk on EVERY
        # DataFrame/Column call, purely driver-side) exists for error
        # messages; plan-heavy operators make thousands of such calls
        # per query construction (~25 ms/query measured at r16). The
        # upstream docs flag this conf as the way to trade the nicer
        # error frames for construction speed; it is scale-independent
        # (driver plan-build cost, identical on a 1000-executor
        # cluster).
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()

def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Set runtime-settable confs this engine relies on.

    Called defensively at every public entry point because the driver
    harness may hand us a session built elsewhere.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")
    try:
        spark.conf.set(
            "spark.sql.parquet.pushdown.inFilterThreshold",
            str(PARQUET_IN_FILTER_THRESHOLD))
    except Exception:  # noqa: BLE001 — static on some builds
        pass
    return spark
