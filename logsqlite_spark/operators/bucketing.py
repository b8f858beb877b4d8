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


# ---------------------------------------------------------------------------
# Z-order (Morton) layout: multi-dimensional file pruning

ZORDER_BITS = 21


def _clamped(col: str, bits: int) -> str:
    # identical spelling in Spark SQL and DuckDB (least/greatest/cast)
    return f"least(greatest(cast({col} as bigint), 0), {(1 << bits) - 1})"


def morton_sql_spark(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    """Bit-interleaved (Morton / Z-order) key as a Spark SQL
    expression — pure integer arithmetic in whole-stage codegen."""
    a, b = _clamped(a, bits), _clamped(b, bits)
    terms = [f"shiftleft(shiftright({a}, {i}) & 1, {2 * i})"
             for i in range(bits)]
    terms += [f"shiftleft(shiftright({b}, {i}) & 1, {2 * i + 1})"
              for i in range(bits)]
    return "(" + " + ".join(terms) + ")"


def morton_sql_duckdb(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    """The same key in DuckDB's operator spelling — the disjoint-bit
    terms sum to the identical integer, so the oracle hash-matches."""
    a, b = _clamped(a, bits), _clamped(b, bits)
    terms = [f"((({a} >> {i}) & 1) << {2 * i})" for i in range(bits)]
    terms += [f"((({b} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
    return "(" + " + ".join(terms) + ")"


def zorder_key(df: DataFrame, col_a: str, col_b: str,
               bits: int = ZORDER_BITS, out_col: str = "z") -> DataFrame:
    """Append the Z-order key over two non-negative integer columns
    (values clamp into ``bits`` bits)."""
    from pyspark.sql import functions as F

    return df.withColumn(
        out_col,
        F.expr(morton_sql_spark(col_a, col_b, bits)).cast("long"))


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   n_files: int = 16, bits: int = ZORDER_BITS) -> None:
    """Write ``df`` range-partitioned and sorted on the Z-order key of
    (col_a, col_b) — the Delta/Iceberg ``OPTIMIZE ZORDER`` layout,
    from first principles.

    Why a 100 TB table wants this: parquet readers prune FILES by
    footer min/max. A linear sort on (a, b) gives perfect pruning on
    ``a`` and none on ``b`` (every file spans the full b range); the
    Morton curve interleaves the bits so each file covers a small
    RECTANGLE in (a, b) space — predicates on EITHER column skip most
    files (pinned in ``test_bucketing.py``). The write itself is the
    one wide exchange any clustering costs (range-partition on z +
    in-partition sort, whole-stage codegen key).
    """
    from pyspark.sql import functions as F

    # Normalize each dimension into the full bit budget first — raw
    # interleaving of unequal domains degenerates to a linear sort on
    # the wider column (a 6-bit user id contributes nothing against a
    # 16-bit minute; probed). Min/max is a one-row control-plane
    # aggregate; the scaled rank only shapes the LAYOUT, so double
    # math is fine here (the oracle-exact integer key is
    # ``zorder_key``).
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    top = (1 << bits) - 1

    def _scaled(col, lo, hi):
        span = max(int(hi) - int(lo), 1)
        return (f"cast(floor((cast({col} as double) - {int(lo)}) "
                f"* {top} / {span}) as bigint)")

    keyed = df.withColumn(
        "__z",
        F.expr(morton_sql_spark(_scaled(col_a, lo_a, hi_a),
                                _scaled(col_b, lo_b, hi_b), bits))
        .cast("long"))
    (keyed.repartitionByRange(n_files, "__z")
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode("overwrite").parquet(path))


def _q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from logsqlite_spark.tables import table

    # minutes since the corpus epoch (2024-01-01): 30 days = 43200,
    # comfortably inside the 21-bit budget (absolute epoch-minutes
    # would clamp)
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.expr("(ts - 1704067200000000000) div 60000000000")
        .alias("minute"))
    out = zorder_key(ev, "user_id", "minute")
    return out.select(F.col("event_id").cast("long"),
                      F.col("z").cast("long"))


QUERIES = {
    "events_zorder_key": _q_zorder_key,
}

ORACLES = {
    "events_zorder_key": (
        "SELECT event_id, CAST("
        + morton_sql_duckdb("user_id", "((epoch_us(ts) - 1704067200000000) // 60000000)")
        + " AS BIGINT) AS z FROM events"
    ),
}
