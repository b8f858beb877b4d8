"""Loaders for the driver-provided testdata tables (TESTDATA.md).

``events.parquet`` carries TIMESTAMP(NANOS) which Spark reads as a
LongType of epoch-nanos under ``spark.sql.legacy.parquet.nanosAsLong``
— exactly the engine's native ``ts_nanos`` representation.

``events_as_logs`` maps the events table onto the engine's logs model
(FIXTURES.md role mapping): ``event_id`` = arrival ``seq``, ``ts`` =
``ts_nanos``, ``user_id`` = ``container_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logsqlite_spark.session import ensure_engine_confs

# Pushdown twin of a normalized timestamp column — see
# _normalize_ts_nanos. apply_read_filters looks for this name.
TS_RAW_COL = "__ts_raw"

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Constructed-DataFrame memo (r16): spark.read.parquet lists the
# directory and reads footers ON THE DRIVER at construction — ~150 ms
# per call at sf0.1, paid by EVERY registry query per invocation
# (the bench measured it as the largest single cost of the quantile
# rollup). The driver testdata is immutable for a session, so the
# resolved plan is reusable verbatim. Keyed by applicationId so a
# restarted session never serves a stale JVM's plan. NOT used for
# the warehouse logs table — that listing changes per commit and
# goes through ManifestTable.read_df.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        ensure_engine_confs(spark)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = _normalize_ts_nanos(df)
        _TABLE_CACHE[key] = df
    return df


def _normalize_ts_nanos(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize ``ts`` to the engine's native epoch-nanos LongType.

    The driver's testdata has shipped the events timestamp in two
    physical encodings across rounds: parquet TIMESTAMP(NANOS), which
    Spark reads as a LongType of epoch-nanos under ``nanosAsLong``,
    and plain µs TIMESTAMP / TIMESTAMP_NTZ. Accept both so every
    downstream operator keeps the reference's ``time_nano`` model
    (/root/reference/src/logger.rs:130). The NTZ→TZ cast is identity
    under the engine's pinned UTC session timezone.

    A filter on the *computed* nanos column cannot be translated into
    a parquet scan filter (PushedFilters only takes plain column
    comparisons), which would cost row-group pruning on every
    time-range read at scale. So the raw physical column is kept
    alongside as ``__ts_raw``: ``apply_read_filters`` puts widened
    native-type twin predicates on it (those DO reach the scan) while
    the exact nanos predicates keep the semantics. Projections that
    select explicit columns drop ``__ts_raw`` automatically, and it is
    the same physical column ``ts`` derives from, so carrying it reads
    no extra bytes.
    """
    from pyspark.sql.types import TimestampNTZType, TimestampType

    if ts_col not in df.columns:
        return df
    dt = df.schema[ts_col].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        df = df.withColumn(TS_RAW_COL, F.col(ts_col))
        nanos = (F.unix_micros(F.col(ts_col).cast("timestamp")) * F.lit(1000)).cast("long")
        df = df.withColumn(ts_col, nanos)
    return df

_SCAN_WRAPPER_NODES = frozenset((
    "Project", "Filter", "SubqueryAlias", "GlobalLimit", "LocalLimit",
    "Repartition", "RepartitionByExpression", "ResolvedHint",
))
_SCAN_LEAF_NODES = frozenset((
    "LogicalRelation", "DataSourceV2Relation", "DataSourceV2ScanRelation",
    "HiveTableRelation",
    # in-memory frames have no upstream shuffle either — probing them
    # can't trigger eager stage execution, and skipping them regressed
    # the parallelism of createDataFrame-backed corpora (review r5)
    "LocalRelation", "LogicalRDD",
))


def _is_simple_file_scan(df: DataFrame) -> bool:
    """True iff ``df`` is a bare file scan under projection/filter
    wrappers — the only shape whose partition count is worth probing."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            name = node.getClass().getSimpleName()
            if name in _SCAN_LEAF_NODES:
                continue
            if name not in _SCAN_WRAPPER_NODES:
                return False
            it = node.children().iterator()
            while it.hasNext():
                stack.append(it.next())
        return True
    except Exception:  # noqa: BLE001 — unknown plan shape: don't probe
        return False


def spread_for_checkpoint(df: DataFrame) -> DataFrame:
    """Round-robin a batch-sized frame to session parallelism BEFORE
    ``localCheckpoint`` materializes it.

    A small join/window output gets AQE-coalesced to ONE partition, and
    an eager checkpoint freezes that layout — every downstream per-row
    compute over the checkpointed batch (minhash md5 of each shingle,
    k-gram hashing) then runs single-task no matter how many cores the
    session has (measured: the banded incremental batch's minhash took
    1.0s single-task vs ~0.1s spread at sf0.1). The repartition
    shuffles only the batch (O(micro-batch) bytes, the same bytes the
    checkpoint itself writes), and an explicit repartition is exempt
    from AQE coalescing, so the materialized layout keeps all cores
    busy. Row order changes; every caller is order-insensitive
    (hash/join/aggregate consumers)."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def rebalance_for_compute(df: DataFrame) -> DataFrame:
    """Spread a CPU-bound projection across every core.

    A small corpus arrives as one parquet file -> one input split, so
    an expression-heavy operator (per-shingle md5 in minhash/winnow,
    per-token folds in simhash) runs single-task no matter how many
    cores the session has. Repartition to the session's default
    parallelism ONLY when the scan has fewer partitions than that —
    at scale a 100 TB input already has thousands of splits and this
    is a no-op, so no shuffle of raw text is ever added where it
    would hurt. Row order changes; callers are order-insensitive
    (hashing projections feeding aggregations/joins).

    Only bare file scans are probed: ``df.rdd.getNumPartitions()``
    finalizes the adaptive plan, which on a derived frame (joins,
    aggregates) eagerly EXECUTES every upstream shuffle stage at
    DataFrame-construction time and then recomputes it when the query
    runs (ADVICE r4 #2 — prepare_corpus passing decontaminate output).
    Derived frames come out of a shuffle already at the session's
    shuffle parallelism, so the rebalance is structurally a no-op for
    them anyway; returning them untouched loses nothing.
    """
    if df.isStreaming:  # .rdd is undefined for streaming frames
        return df
    if not _is_simple_file_scan(df):
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def frames_fingerprint(*dfs: DataFrame) -> str:
    """Identity of DataFrames for process-lifetime caches (the
    materialized corpus, the auto-persisted IVF index).

    Folds in (a) each backing file's path, size, and mtime — a
    rewritten file at the same path never aliases — and (b) the
    normalized analyzed logical plan (expression ids stripped), so two
    LOGICALLY different frames over the same files (a filtered corpus
    vs the full one, different projections) never alias either; the
    round-5 review reproduced a filtered-corpus IVF index being served
    for full-corpus queries when the key was files-only. In-memory
    frames contribute no files and a literal plan; streaming frames
    contribute neither — callers must add their own discriminator
    (documented on materialized_corpus).
    """
    import hashlib
    import os
    import re

    parts = []
    for df in dfs:
        try:
            files = sorted(df.inputFiles())
        except Exception:  # noqa: BLE001 — e.g. streaming frames
            files = []
        for f in files:
            local = f[len("file:"):] if f.startswith("file:") else f
            try:
                st = os.stat(local)
                parts.append(f"{f}|{st.st_size}|{st.st_mtime_ns}")
            except OSError:
                parts.append(f)
        try:
            plan = df._jdf.queryExecution().analyzed().toString()
            parts.append(re.sub(r"#\d+", "", plan))
        except Exception:  # noqa: BLE001 — streaming/foreign frames
            pass
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:16]


def events_as_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table viewed through the engine's logs schema."""
    e = table(spark, sf_dir, "events")
    cols = [
        F.col("event_id").alias("seq"),
        F.col("ts").alias("ts_nanos"),
        F.col("user_id").cast("string").alias("container_id"),
        F.col("event_type").alias("source"),
        F.concat(F.col("props"), F.lit("\n")).alias("line"),
        F.col("value"),
    ]
    if TS_RAW_COL in e.columns:
        cols.append(F.col(TS_RAW_COL))
    return e.select(*cols)
