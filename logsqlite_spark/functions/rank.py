"""Distributed exact global ranking.

A ``row_number() OVER (ORDER BY ...)`` with no partition spec funnels
every row through ONE task — the single-partition sort that kills a
100 TB job. When the order key is unique (callers append a tiebreaker
id), the same exact rank distributes as two passes:

1. range-partition on the order key (total order across partitions),
2. rank locally per partition, then add per-partition row-count
   offsets.

The only driver-size state is one row PER SHUFFLE PARTITION (the
offsets table), which is bounded by configuration, not data — safe to
broadcast and to cumulative-sum in a single-partition window.

Used by ``analytics.conversion_times`` (funnel percentile ranks) and
``textstats.quality_percentile`` (corpus percent_rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Persisted range exchanges, least-recently-used first. Persisting is
# belt-and-suspenders on top of the pinned partition count (the
# REPARTITION_BY_NUM exchange is AQE-exempt and plan-reused), but an
# unbounded cache would leak one copy of the caller's frame per call
# for the session's lifetime — so older entries are unpersisted once a
# few newer calls exist. A long-retained result frame re-evaluated
# after eviction recomputes through the SAME pinned exchange (reused
# within the action), so correctness does not depend on the cache.
#
# LRU by PLAN IDENTITY, not by call (r17, VERDICT r16 #7): Spark's
# CacheManager keys cached data by canonicalized plan, so N calls with
# the same input frame share ONE cache entry — but a naive append
# counted them as N list slots and evicted the SHARED entry mid-run
# the moment a 5th call landed (measured as events_conversion_time's
# 1.18 s rep spike: the bench's identical reps thrashed their own
# cache).  A repeat call now just refreshes its entry's recency; only
# genuinely distinct plans compete for the _PERSIST_KEEP slots, so
# repeated serving of the same query never unpersists itself and the
# session-lifetime persist count stays bounded by distinct callers.
_PERSISTED: list[DataFrame] = []
_PERSIST_KEEP = 4


def _bound_persisted(df: DataFrame) -> None:
    try:
        plan = df._jdf.queryExecution().analyzed()
        for i, old in enumerate(_PERSISTED):
            if old._jdf.queryExecution().analyzed().sameResult(plan):
                _PERSISTED.append(_PERSISTED.pop(i))
                return
    except Exception:  # noqa: BLE001 — plan probe is best-effort;
        pass           # fall back to plain bounded-append semantics
    _PERSISTED.append(df)
    while len(_PERSISTED) > _PERSIST_KEEP:
        _PERSISTED.pop(0).unpersist(blocking=False)


def with_global_rank(df: DataFrame, order_cols: list[str],
                     rank_col: str = "rn", n_col: str = "n",
                     n_parts: int | None = None) -> DataFrame:
    """Add ``rank_col`` (1-based exact global row_number over
    ``order_cols``) and ``n_col`` (total row count) to ``df``.

    ``order_cols`` must form a unique key (append an id column as the
    final tiebreaker) — uniqueness is what makes the rank independent
    of where the range partitioner draws its boundaries.

    The range exchange is consumed by TWO branches (the offsets table
    and the local ranking), and its boundaries come from nondeterministic
    sampling, so both branches MUST observe one materialization: the
    partition count is pinned explicitly (REPARTITION_BY_NUM is exempt
    from AQE partition coalescing, which could otherwise merge the two
    reads differently) and the exchange output is persisted so a failed
    exchange-reuse can never resample boundaries and diverge
    ``spark_partition_id()`` between the branches (ADVICE r4 #1). The
    persisted footprint is one pass of the caller's (narrow) frame.

    The local rank costs NO window: a ``partitionBy(_pid)`` window
    would demand hashpartitioning(_pid) — a second full-data exchange
    right after the range exchange (measured on the r9 plan). Instead
    the cached partitions are sorted in place and
    ``monotonically_increasing_id`` is projected on top: its lower 33
    bits are exactly the row's offset in sort order within the task's
    partition, so ``_lrn`` is a narrow expression. (The id's upper
    bits are the task partition index — identical to ``_pid`` from
    the materialization because a cache scan preserves partition
    indices — but the join keeps using the persisted ``_pid``
    column.) Partitions beyond 2^33 rows would wrap — a partition
    that large is already unusable, and the range partitioner exists
    to prevent it.
    """
    from pyspark.storagelevel import StorageLevel

    if n_parts is None:
        n_parts = int(df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "200"))
    parts = (df.repartitionByRange(n_parts, *order_cols)
             .withColumn("_pid", F.spark_partition_id())
             .persist(StorageLevel.MEMORY_AND_DISK))
    _bound_persisted(parts)
    counts = parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    # bounded: one row per shuffle partition
    offsets = counts.select(
        "_pid",
        (F.sum("_c").over(Window.orderBy("_pid")) - F.col("_c"))
        .alias("_off"),
        F.sum("_c").over(Window.partitionBy()).alias(n_col))
    local = (
        parts.sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_lrn", (F.col("_mid")
                             .bitwiseAND(F.lit((1 << 33) - 1)) + F.lit(1))
                    .cast("int"))
        .drop("_mid"))
    return (local.join(F.broadcast(offsets), "_pid")
            .withColumn(rank_col,
                        F.col("_lrn").cast("long") + F.col("_off"))
            .drop("_pid", "_lrn", "_off"))
