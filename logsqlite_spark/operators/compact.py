"""Partition compaction — maintenance for a micro-batched parquet sink.

A streaming sink committing every ``message_read_timeout`` (100 ms
default) writes many small files per (container, date) partition; at
100 TB that kills scan performance (file-listing cost, tiny row
groups, no effective min/max stats). The reference has no analogue
(SQLite appends to one B-tree), so this is engine-native maintenance,
run alongside retention on the cleaner schedule.

Strategy per partition directory:
- skip partitions already compact (fewer than ``min_files`` files);
- rewrite the rest sorted by ``seq`` (restores arrival clustering →
  tight parquet min/max on both seq and ts_nanos, so cursor and time
  filters skip row groups) into ``target_records``-sized files;
- temp-write + atomic rename swap, same reader contract as retention.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import SparkSession

def compact_container(
    spark: SparkSession,
    logs_dir: str,
    container_id: str,
    min_files: int = 4,
    target_records: int = 4_000_000,
) -> dict:
    """Compact every date partition of one container that needs it."""
    root = Path(logs_dir) / f"container_id={container_id}"
    if not root.exists():
        return {"compacted_partitions": 0, "files_before": 0, "files_after": 0}

    compacted = files_before = files_after = 0
    for part_dir in sorted(root.glob("date=*")):
        files = [p for p in part_dir.glob("*.parquet")]
        if len(files) < min_files:
            continue
        files_before += len(files)
        df = spark.read.parquet(str(part_dir))
        n = df.count()
        n_out = max(1, -(-n // target_records))  # ceil
        tmp = root / f".compact-{part_dir.name}"
        (
            df.repartitionByRange(n_out, "seq")
            .sortWithinPartitions("seq")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", target_records)
            .parquet(str(tmp))
        )
        old = root / f".old-{part_dir.name}"
        part_dir.rename(old)
        tmp.rename(part_dir)
        shutil.rmtree(old)
        files_after += len(list(part_dir.glob("*.parquet")))
        compacted += 1
    return {
        "compacted_partitions": compacted,
        "files_before": files_before,
        "files_after": files_after,
    }

def compact_all(spark: SparkSession, logs_dir: str, **kw) -> dict:
    root = Path(logs_dir)
    if not root.exists():
        return {}
    return {
        p.name.split("=", 1)[1]: compact_container(
            spark, logs_dir, p.name.split("=", 1)[1], **kw)
        for p in sorted(root.glob("container_id=*"))
    }
