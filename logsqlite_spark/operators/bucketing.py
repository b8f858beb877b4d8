"""Bucketed-table layout: pre-shuffled storage for co-located joins.

The 100 TB join story has three tiers: broadcast (small dim), shuffle
(AQE-planned, the default), and **bucketed** — when two big tables are
joined on the same key repeatedly (logs ⋈ per-container state, docs ⋈
doc-features), paying the shuffle once at WRITE time and never again.
``bucketBy(n, key)`` hash-partitions rows into a fixed number of
buckets per partition-directory and records the bucket spec in the
catalog; a join of two tables bucketed on the same key with the same
bucket count reads bucket i against bucket i directly — the physical
plan has NO Exchange on either side (pinned in
``tests/test_bucketing.py``).

``sortBy`` within buckets additionally lets the sort-merge join skip
its sort. This is Spark's native equivalent of the reference's
single-file-per-container layout (logger.rs keeps one SQLite file per
container: all rows for a key co-located) — generalized to N keys per
bucket and a cluster.

Caveats encoded here rather than left to folklore:
- both sides must have the SAME bucket count (or a multiple, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- bucketed writes go through ``saveAsTable`` (the bucket spec lives in
  the catalog, not the parquet footers);
- broadcast would bypass bucket advantages for genuinely small dims —
  disable autoBroadcast when demonstrating, as the test does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 8, sort: bool = True,
                   mode: str = "overwrite",
                   path: str | None = None) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) on ``key``.

    ``path`` makes it an external table at that location (the session
    warehouse dir is a static conf and can't be retargeted at
    runtime); the bucket spec lives in the catalog either way.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back (bucket spec comes from the catalog)."""
    return spark.table(table_name)
