"""Batch query surface — the ReadLogs path (SURVEY.md §2.2-2.4, §3.1).

Reference behavior being re-expressed (not ported):

- ``WHERE ROWID >= ?cursor [AND ts >= ?since] [AND ts <= ?until]`` with
  both time bounds *inclusive* (/root/reference/src/logger.rs:320-343).
- tail-N is resolved *after* the time filters: a count + ``LIMIT 1
  OFFSET (count - tail)`` probe finds the first kept row
  (logger.rs:347-376). In Spark that two-query plan is unnecessary:
  ``orderBy(desc(seq)).limit(N)`` compiles to TakeOrderedAndProject — a
  distributed top-k (per-partition partial top-k, final merge on the
  driver) that never materializes the full result. For "tail N per
  container" a ranking window bounded by N does the same in one shuffle.
- results stream back in ROWID (arrival) order, never ts order
  (logger.rs:379); out-of-order timestamps stay out of order. Parquet
  scan order is not guaranteed, so the ordering must be explicit.

Scale notes (100 TB): since/until on ``ts_nanos`` push down to parquet
row-group stats, and ``container_id``/``date`` predicates prune
partitions before any task launches — the moral equivalent of the
reference's ``idx_ts`` B-tree, but free and distributed. The final
``orderBy(seq)`` is the only shuffle, and only over rows that survived
pruning; tail queries avoid even that via top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from logsqlite_spark.functions.time import normalize_read_params

def apply_read_filters(
    logs: DataFrame,
    container_id: str | None = None,
    since_nanos: int | None = None,
    until_nanos: int | None = None,
    cursor: int | None = None,
    ts_col: str = "ts_nanos",
    seq_col: str = "seq",
    container_col: str = "container_id",
) -> DataFrame:
    """P3-P5 predicates; all pushdown-friendly range filters.

    When the source carries a ``__ts_raw`` pushdown twin (the events
    loader keeps the raw parquet timestamp column next to the computed
    epoch-nanos ``ts`` — see ``tables._normalize_ts_nanos``), widened
    native-type bounds go on the raw column too. Those are plain
    column-vs-literal comparisons, so they reach the parquet scan as
    PushedFilters and prune row groups; the exact nanos predicates
    stay authoritative for semantics (inclusive bounds at full nanos,
    logger.rs:320-343). floor/ceil µs alignment keeps the twin bounds
    implied-by (never tighter than) the nanos bounds.
    """
    from logsqlite_spark.tables import TS_RAW_COL

    df = logs
    has_raw = TS_RAW_COL in df.columns
    if container_id is not None:
        df = df.filter(F.col(container_col) == container_id)
    if cursor is not None:
        df = df.filter(F.col(seq_col) >= F.lit(int(cursor)))
    if since_nanos is not None:
        df = df.filter(F.col(ts_col) >= F.lit(int(since_nanos)))
        if has_raw:
            lo_us = int(since_nanos) // 1000  # floor → widened
            df = df.filter(F.col(TS_RAW_COL)
                           >= F.timestamp_micros(F.lit(lo_us))
                           .cast(df.schema[TS_RAW_COL].dataType))
    if until_nanos is not None:
        df = df.filter(F.col(ts_col) <= F.lit(int(until_nanos)))
        if has_raw:
            hi_us = -((-int(until_nanos)) // 1000)  # ceil → widened
            df = df.filter(F.col(TS_RAW_COL)
                           <= F.timestamp_micros(F.lit(hi_us))
                           .cast(df.schema[TS_RAW_COL].dataType))
    return df

def tail_global(df: DataFrame, n: int, seq_col: str = "seq") -> DataFrame:
    """Last ``n`` rows by arrival order — distributed top-k.

    TakeOrderedAndProject: each partition keeps its local top-n, the
    driver merges; no full sort, no full shuffle.
    """
    return df.orderBy(F.col(seq_col).desc()).limit(int(n))

def tail_per_container(
    df: DataFrame,
    n: int,
    seq_col: str = "seq",
    container_col: str = "container_id",
) -> DataFrame:
    """Last ``n`` rows per container (the reference's tail, which is
    always per-container because each container is its own database).

    One hash-shuffle on container_id; rank() is pipelined after the
    sort within each partition. AQE splits skewed containers.
    """
    w = Window.partitionBy(container_col).orderBy(F.col(seq_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(n))
        .drop("__rn")
    )

def read_logs(
    logs: DataFrame,
    container_id: str | None = None,
    since: str | None = None,
    until: str | None = None,
    tail: int | None = None,
    cursor: int | None = None,
    ordered: bool = True,
    **cols: str,
) -> DataFrame:
    """Full ReadLogs pipeline: normalize -> filter -> tail -> order.

    ``since``/``until`` are RFC3339 strings straight off the wire;
    sentinel values and unparseable strings drop the predicate, and
    ``tail < 1`` means "all" (docker.rs:144-166 normalization).

    ``ordered=False`` skips the final sort for callers that only count
    or re-aggregate (saves the shuffle).
    """
    seq_col = cols.get("seq_col", "seq")
    since_n, until_n, tail_n = normalize_read_params(since, until, tail)
    df = apply_read_filters(
        logs,
        container_id=container_id,
        since_nanos=since_n,
        until_nanos=until_n,
        cursor=cursor,
        **cols,
    )
    if tail_n is not None:
        if container_id is not None:
            df = tail_global(df, tail_n, seq_col=seq_col)
        else:
            df = tail_per_container(df, tail_n, seq_col=seq_col,
                                    container_col=cols.get("container_col", "container_id"))
    if ordered:
        df = df.orderBy(seq_col)
    return df

def count_logs(
    logs: DataFrame,
    container_id: str | None = None,
    since: str | None = None,
    until: str | None = None,
    cursor: int | None = None,
    **cols: str,
) -> int:
    """A1: ``SELECT count(*) FROM logs WHERE <cond>`` (logger.rs:347-355)."""
    since_n, until_n, _ = normalize_read_params(since, until, None)
    df = apply_read_filters(
        logs,
        container_id=container_id,
        since_nanos=since_n,
        until_nanos=until_n,
        cursor=cursor,
        **cols,
    )
    return df.count()

def count_per_container(
    logs: DataFrame, container_col: str = "container_id"
) -> DataFrame:
    """A2 done the Spark way: one job over every container instead of
    the reference's per-database loop (cleaner.rs:50-61). Partial
    (map-side) aggregation makes this a tiny shuffle regardless of table
    size.
    """
    return logs.groupBy(container_col).agg(F.count(F.lit(1)).alias("n_lines"))
