"""Retention — the cleaner (SURVEY.md §2.2 P7-P9, A2; /root/reference/src/cleaner.rs).

Reference semantics, pinned from cleaner.rs:46-131:

- keep-last-N boundary: ``boundary = ROWID at OFFSET max(count - N, 0)``
  over the *unfiltered* table, then ``DELETE ... ROWID < boundary`` —
  strict ``<``, so the boundary row itself survives and exactly
  ``min(count, N)`` rows remain.
- age: ``DELETE ... ts < now - cleanup_age`` — strict ``<``, rows with
  ``ts == cutoff`` survive.
- both: one pass, ``DELETE WHERE ts < cutoff OR ROWID < boundary``.

Spark has no row-level DELETE on plain parquet, and at 100 TB you do not
want one: the physical job is (a) drop whole ``date`` partitions whose
max ts is below the cutoff — a metadata-only operation, zero data read —
and (b) rewrite only the boundary partitions, filtered to survivors.
The survivor predicate itself is expressed once, logically, and reused
by both the logical API (``retention_survivors``) and the physical
rewrite (``apply_retention``).
"""

from __future__ import annotations

import shutil
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logsqlite_spark.config import LogConfig

def retention_survivors(
    logs: DataFrame,
    now_nanos: int | None = None,
    cleanup_age_s: int | None = None,
    cleanup_max_lines: int | None = None,
    ts_col: str = "ts_nanos",
    seq_col: str = "seq",
    container_col: str = "container_id",
) -> DataFrame:
    """Rows that survive a cleanup pass (logical view of P7-P9).

    Delete = ``ts < cutoff OR rank_from_end >= N`` per container, so
    survive = ``ts >= cutoff AND rank_from_end <= N`` — the exact
    complement of cleaner.rs:97-127 including the boundary row's
    survival (row_number() == N corresponds to the OFFSET row, which the
    strict ``ROWID <`` keeps).
    """
    df = logs
    if cleanup_max_lines is not None:
        w = Window.partitionBy(container_col).orderBy(F.col(seq_col).desc())
        df = (
            df.withColumn("__rank_from_end", F.row_number().over(w))
            .filter(F.col("__rank_from_end") <= int(cleanup_max_lines))
            .drop("__rank_from_end")
        )
    if cleanup_age_s is not None:
        if now_nanos is None:
            now_nanos = int(datetime.now(timezone.utc).timestamp() * 1e9)
        cutoff = int(now_nanos) - int(cleanup_age_s) * 1_000_000_000
        df = df.filter(F.col(ts_col) >= F.lit(cutoff))
    return df

def apply_retention(
    spark: SparkSession,
    logs_dir: str,
    container_id: str,
    conf: LogConfig,
    now_nanos: int | None = None,
) -> dict:
    """Physical cleanup of one container's partition tree.

    Strategy (scale-first):
    1. Partition-prune to ``container_id=<id>`` — other containers are
       never touched (the reference's per-database isolation).
    2. Age limit: ``date`` partitions entirely older than the cutoff
       date are deleted without reading a byte (directory drop ==
       the reference's O(1) ``rm dbfile``); only the single boundary
       date needs a filtered rewrite.
    3. Max-lines limit: compute the boundary seq with a count + top-k
      (the reference's count + OFFSET probe, cleaner.rs:46-74, as one
       distributed agg), then rewrite only partitions containing rows
       below it.
    Rewrites are write-temp-then-atomic-swap so concurrent readers see
    either the old or the new file set.
    """
    if conf.cleanup_age_s is None and conf.cleanup_max_lines is None:
        return {"dropped_partitions": 0, "rewritten_partitions": 0, "deleted_rows": 0}

    root = Path(logs_dir) / f"container_id={container_id}"
    if not root.exists():
        return {"dropped_partitions": 0, "rewritten_partitions": 0, "deleted_rows": 0}

    if now_nanos is None:
        now_nanos = int(datetime.now(timezone.utc).timestamp() * 1e9)

    cutoff_nanos = None
    if conf.cleanup_age_s is not None:
        cutoff_nanos = int(now_nanos) - conf.cleanup_age_s * 1_000_000_000

    date_dirs = sorted(p for p in root.iterdir() if p.name.startswith("date="))
    dropped = 0

    # --- step 2: metadata-only partition drops for the age limit ---
    if cutoff_nanos is not None:
        cutoff_date = datetime.fromtimestamp(
            cutoff_nanos / 1e9, tz=timezone.utc
        ).date()
        keep_dirs = []
        for p in date_dirs:
            part_date = datetime.strptime(p.name.split("=", 1)[1], "%Y-%m-%d").date()
            if part_date < cutoff_date:
                shutil.rmtree(p)
                dropped += 1
            else:
                keep_dirs.append(p)
        date_dirs = keep_dirs

    if not date_dirs:
        return {"dropped_partitions": dropped, "rewritten_partitions": 0, "deleted_rows": 0}

    def read_container() -> DataFrame:
        # basePath keeps the partition columns in scope while scanning
        # only this container's tree (partition pruning by path).
        return (
            spark.read.option("basePath", logs_dir)
            .parquet(str(root))
        )

    # --- boundary seq for max-lines (count + top-k, one pass) ---
    boundary_seq = None
    if conf.cleanup_max_lines is not None:
        n = int(conf.cleanup_max_lines)
        df = read_container()
        total = df.count()
        if total > n:
            # seq of the first kept row == the (count-N)-th row 0-indexed
            # == the N-th largest seq. Distributed top-k, tiny result.
            kept_min = (
                df.select("seq").orderBy(F.col("seq").desc()).limit(n)
                .agg(F.min("seq").alias("m")).collect()[0]["m"]
            )
            boundary_seq = kept_min

    # --- which date partitions need a rewrite? ---
    # Use parquet stats via a cheap per-partition min aggregation.
    df = read_container()
    cond_del = F.lit(False)
    if cutoff_nanos is not None:
        cond_del = cond_del | (F.col("ts_nanos") < F.lit(cutoff_nanos))
    if boundary_seq is not None:
        cond_del = cond_del | (F.col("seq") < F.lit(int(boundary_seq)))

    affected = (
        df.filter(cond_del).select(F.col("date").cast("string").alias("d"))
        .distinct().collect()
    )
    affected_dates = sorted(r["d"] for r in affected)

    rewritten = 0
    deleted_rows = 0
    for d in affected_dates:
        part_dir = root / f"date={d}"
        part_df = (
            spark.read.option("basePath", logs_dir).parquet(str(part_dir))
        )
        survivors = part_df.filter(~cond_del).drop("container_id", "date")
        n_before = part_df.count()
        n_after = survivors.count()
        deleted_rows += n_before - n_after
        tmp_dir = root / f".tmp-date={d}"
        if n_after > 0:
            survivors.write.mode("overwrite").parquet(str(tmp_dir))
            # atomic-ish swap: move old out, tmp in, then delete old
            old_dir = root / f".old-date={d}"
            part_dir.rename(old_dir)
            tmp_dir.rename(part_dir)
            shutil.rmtree(old_dir)
            # drop spark's _SUCCESS marker noise is harmless; leave it
        else:
            shutil.rmtree(part_dir)
            dropped += 1
            continue
        rewritten += 1

    return {
        "dropped_partitions": dropped,
        "rewritten_partitions": rewritten,
        "deleted_rows": deleted_rows,
    }

def drop_container(logs_dir: str, container_id: str) -> bool:
    """``delete_when_stopped`` — the reference deletes the SQLite file
    (statehandler.rs:176-181); here we drop the container's partition
    subtree. O(1) metadata, no data read."""
    root = Path(logs_dir) / f"container_id={container_id}"
    if root.exists():
        shutil.rmtree(root)
        return True
    return False
