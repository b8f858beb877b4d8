"""Mergeable sketch tier #2 — quantiles (KLL) and set operations (Theta).

:func:`analytics.distinct_users_hll_rollup` established the pattern:
replace cardinality-sized exact state with fixed-size mergeable
sketches so rollups merge KBs instead of re-scanning raw data. This
module extends the tier with the other two sketch families a 100 TB
log/metrics pipeline needs (both Datasketches builtins in Spark 4.x):

- **KLL quantile sketches** (`kll_sketch_agg_bigint`): per-day value
  percentiles whose aggregation state is O(k·log n) items regardless
  of row count, and whose daily sketches merge into weekly/overall
  percentiles WITHOUT re-reading events. The exact alternative
  (``events_conversion_time``-style distributed rank) is one full
  shuffle of every row per grain served; this is one scan total.
- **Theta sketches** (`theta_sketch_agg`): distinct-count sketches
  that support INTERSECTION and DIFFERENCE, which HLL cannot.
- **Frequent-items sketches** (`approx_top_k_accumulate/combine/
  estimate`, Datasketches ItemsSketch — round 9): WHICH values
  dominate, per day and overall, from one scan; daily sketches merge
  into any grain. Below tracking capacity the sketch never evicts and
  every count is exact (the Theta exactness policy), so the registry
  query carries a full oracle.
  Day-over-day retention ("how many of yesterday's users returned
  today?") and audience overlap between event-type segments become
  pairwise operations over a tiny daily-sketch table — the raw events
  are scanned exactly once.

Determinism / oracle policy (registry.py docstring contract):

- Theta sketching is deterministic (seeded murmur hashing, no RNG) and
  **exact below the nominal-entries threshold** (2^lg_k = 4096 at the
  default lg_k=12): every distinct id is retained, theta stays 1.0,
  and intersection/difference estimates are the TRUE cardinalities.
  The driver's sf0.01 gate (≤150 distinct users/day) and sf0.1 bench
  (≤1500) both sit far below that, so ``events_retention_overlap``
  and ``events_segment_overlap`` carry FULL DuckDB oracles; at
  production scale the same plan degrades gracefully to bounded-error
  estimates (documented, and error-bounded in ``test_sketches.py``).
- KLL compaction is randomized by design, so quantile estimates are
  rows-only for the driver; ``test_sketches.py`` pins the normalized
  rank error against exact quantiles and merge self-consistency,
  mirroring the HLL policy in ``test_hll.py``.

Reference parity: none — the reference (logsqlite, ~1.4k LoC Rust) has
no approximate aggregation; this is §2.8 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logsqlite_spark.tables import table

_CENTS = "cast(floor(cast(value as double) * 100 + 0.5) as bigint)"

_QS: tuple[float, ...] = (0.5, 0.9, 0.99)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "user_id", "event_type",
        F.to_date(F.timestamp_micros(F.expr("ts div 1000"))).alias("day"),
        F.expr(_CENTS).alias("value_c"),
    )


# ---------------------------------------------------------------------------
# KLL quantile sketches


def _kll_quantiles(sketch, qs: tuple[float, ...] = _QS) -> list:
    return [
        F.kll_sketch_get_quantile_bigint(sketch, F.lit(q))
        .cast("long").alias(f"p{int(q * 100)}_c")
        for q in qs
    ]


def value_quantile_rollup(events: DataFrame, k: int = 200,
                          qs: tuple[float, ...] = _QS) -> DataFrame:
    """Per-day + overall value percentiles from ONE scan.

    Same ``rollup(day)`` + ``grouping()`` shape as
    ``distinct_users_hll_rollup``: a single Expand feeds a map-side-
    combinable sketch aggregation, so both grains cost one scan and
    one KB-sized shuffle. An exact per-day percentile would shuffle
    every row; serving the overall row exactly on top of daily exacts
    would re-scan, because exact quantiles don't merge.
    """
    return (
        events
        .rollup("day")
        # grouping(), not coalesce: a genuine NULL-day group must not
        # collide with the grand-total row (same trap as the HLL rollup)
        .agg(F.kll_sketch_agg_bigint("value_c", F.lit(k)).alias("sk"),
             F.grouping("day").alias("_g"))
        .select(
            F.when(F.col("_g") == 1, F.lit("ALL"))
            .otherwise(F.col("day").cast("string")).alias("day"),
            F.kll_sketch_get_n_bigint("sk").cast("long").alias("n"),
            *_kll_quantiles(F.col("sk"), qs))
    )


def daily_value_sketches(events: DataFrame, k: int = 200) -> DataFrame:
    """The materialized daily quantile rollup: one fixed-size KLL
    sketch per day. Any coarser grain (week / month / all-time) is
    served by merging these sketches — never by re-scanning events."""
    return (
        events.groupBy("day")
        .agg(F.kll_sketch_agg_bigint("value_c", F.lit(k)).alias("sketch"))
    )


def merge_daily_value_sketches(daily: DataFrame,
                               qs: tuple[float, ...] = _QS) -> DataFrame:
    """Overall percentiles from the daily sketch table — merges a few
    KB per day (``kll_merge_agg_bigint``), no raw-data re-scan."""
    merged = daily.agg(F.kll_merge_agg_bigint("sketch").alias("sk"))
    return merged.select(
        F.kll_sketch_get_n_bigint("sk").cast("long").alias("n"),
        *_kll_quantiles(F.col("sk"), qs))


def update_daily_value_sketches(daily: DataFrame, new_events: DataFrame,
                                k: int = 200) -> DataFrame:
    """Incremental maintenance of the daily quantile table: sketch
    only the new rows, merge per day (``kll_merge_agg_bigint``). KLL
    merge carries the same rank-error guarantee as a fresh sketch
    (pinned in ``test_sketches.py``), so history is never re-scanned —
    the property exact quantiles fundamentally lack."""
    fresh = daily_value_sketches(new_events, k)
    return (
        daily.unionByName(fresh)
        .groupBy("day")
        .agg(F.kll_merge_agg_bigint("sketch").alias("sketch"))
    )


# ---------------------------------------------------------------------------
# Theta sketches — set operations over daily user sets


def daily_user_theta(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """One Theta sketch of the distinct user set per day. Unlike the
    HLL twin (`analytics.daily_user_sketches`) these support
    intersection/difference downstream; the cost is a slightly larger
    sketch (up to 2^lg_k retained hashes vs fixed registers)."""
    return (
        events.groupBy("day")
        .agg(F.theta_sketch_agg("user_id", F.lit(lg_k)).alias("sketch"))
    )


def retention_overlap(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """Day-over-day audience movement: for every day with a preceding
    active day, the returning / new / churned user counts.

    Plan shape — ONE scan, ONE shuffle, no join. A first cut built the
    daily theta table and equi-joined it against itself shifted by one
    day; the join itself was O(days), but the self-joined aggregate
    lineage re-scanned events for each side (AQE exchange-stage reuse
    did not dedupe it — verified on the adaptive final plan). Instead,
    each event row is Expanded into (day, shifted=false) and
    (day+1, shifted=true), and one ``groupBy(day)`` builds BOTH the
    day's own sketch and the previous day's sketch as conditional
    aggregations. The Expand doubles map-side rows, but partial sketch
    aggregation collapses them before the shuffle, so the exchange
    still carries O(days) KB-sized sketch states — at 100 TB the
    second *scan* is what hurts, never the doubled in-memory rows.
    The movement columns are then pure sketch arithmetic:
    ``theta_intersection`` (returning), ``theta_difference`` in both
    directions (new / churned) — the operations HLL cannot do.

    Exact (and driver-oracled) below 2^lg_k distinct users/day; see
    module docstring.
    """
    tagged = events.select(
        "user_id",
        F.explode(F.array(
            F.struct(F.col("day").alias("day"),
                     F.lit(False).alias("shifted")),
            F.struct(F.date_add("day", 1).alias("day"),
                     F.lit(True).alias("shifted")),
        )).alias("t"),
    ).select("user_id", F.col("t.day").alias("day"), "t.shifted")
    daily = (
        tagged
        .where(F.col("day").isNotNull())
        .groupBy("day")
        .agg(
            F.theta_sketch_agg(
                F.when(~F.col("shifted"), F.col("user_id")),
                F.lit(lg_k)).alias("sketch"),
            F.theta_sketch_agg(
                F.when(F.col("shifted"), F.col("user_id")),
                F.lit(lg_k)).alias("prev_sketch"),
            # a day qualifies only if it AND its predecessor had real
            # activity (the join semantics of the two-sided form)
            F.max(F.when(~F.col("shifted"), 1).otherwise(0)).alias("_t"),
            F.max(F.when(F.col("shifted"), 1).otherwise(0)).alias("_p"))
        .where((F.col("_t") == 1) & (F.col("_p") == 1))
    )
    est = F.theta_sketch_estimate
    return daily.select(
        F.col("day").cast("string").alias("day"),
        est("sketch").cast("long").alias("active"),
        est(F.theta_intersection("sketch", "prev_sketch"))
        .cast("long").alias("returning"),
        est(F.theta_difference("sketch", "prev_sketch"))
        .cast("long").alias("new_users"),
        est(F.theta_difference("prev_sketch", "sketch"))
        .cast("long").alias("churned"))


def weekly_active_theta(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """Weekly active users served from the DAILY theta sketch table —
    the merge path: one scan builds daily sketches, and every coarser
    grain (week here; month/all-time identically) is a
    ``theta_union_agg`` over a handful of KB-sized sketches, never a
    re-scan. Below 2^lg_k distinct users the union estimate is the
    EXACT weekly distinct count (set union of exact sketches), so the
    query carries a full DuckDB oracle — the property that makes the
    daily-sketch materialization strategy auditable end to end."""
    daily = daily_user_theta(events, lg_k)
    return (
        daily.where(F.col("day").isNotNull())
        .groupBy(F.date_trunc("week", F.col("day").cast("timestamp"))
                 .cast("date").cast("string").alias("week"))
        .agg(F.theta_sketch_estimate(
            F.theta_union_agg("sketch", F.lit(lg_k)))
            .cast("long").alias("est_users"))
    )


def segment_overlap(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """Audience overlap between event-type segments: distinct users
    active in BOTH segments, for every unordered type pair.

    One scan builds a sketch per segment (a handful of rows); the
    pairwise intersection is a trivial self-join of that table with
    ``type_a < type_b``. The exact equivalent is a distinct-pairs
    self-join of the events table on user_id — O(users × types²) rows
    through a shuffle — which this replaces with O(types²) sketch
    intersections. Exact below 2^lg_k distinct users per segment.
    """
    seg = (events.groupBy("event_type")
           .agg(F.theta_sketch_agg("user_id", F.lit(lg_k)).alias("sketch")))
    a, b = seg.alias("a"), seg.alias("b")
    return (
        a.join(b, F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.theta_sketch_estimate(
                F.theta_intersection("a.sketch", "b.sketch"))
            .cast("long").alias("est_both"))
    )


TOPK_MAX_TRACKED = 64
TOPK_K = 32


def daily_type_topk_sketches(events: DataFrame,
                             max_tracked: int = TOPK_MAX_TRACKED
                             ) -> DataFrame:
    """Per-day frequent-items sketches over the event-type column —
    the materialized daily table any coarser grain merges from
    without re-reading events (the `daily_user_sketches` pattern,
    fourth sketch family)."""
    return events.groupBy("day").agg(
        F.expr(f"approx_top_k_accumulate(event_type, {max_tracked})")
        .alias("sk"))


def type_topk_rollup(events: DataFrame, k: int = TOPK_K,
                     max_tracked: int = TOPK_MAX_TRACKED) -> DataFrame:
    """Heavy hitters per day AND overall from ONE scan — the fourth
    Datasketches family (frequent-items / ItemsSketch, Spark 4.1's
    ``approx_top_k_accumulate/combine/estimate``), completing the
    mergeable tier: HLL answers "how many distinct", KLL "what
    distribution", Theta "which sets overlap", and this one "WHICH
    values dominate" — the skew monitor that tells you what to salt.

    The raw events aggregate once into per-day sketches (map-side
    combinable, fixed-size state); the overall row merges those
    sketches (KBs, never a re-scan). Exactness: an ItemsSketch
    tracking ``max_tracked`` items with a smaller actual domain
    never evicts, so every count is the TRUE count — the event-type
    domain is a handful of values, so the registry query carries a
    FULL DuckDB oracle (the Theta-exactness policy); above capacity
    the same plan degrades to the documented count-error bound,
    pinned in ``test_sketches.py``.
    """
    daily = daily_type_topk_sketches(events, max_tracked)
    per_day = (
        daily.select(
            F.col("day").cast("string").alias("day"),
            F.explode(F.expr(f"approx_top_k_estimate(sk, {k})"))
            .alias("e"))
        .select("day", F.col("e.item").alias("item"),
                F.col("e.count").cast("long").alias("n")))
    # repartition(1) before combine: approx_top_k_combine's partial
    # buffer cannot serialize from an EMPTY partition (Spark 4.1
    # genSketchSerDe MatchError on the null item type — probed, and
    # the daily table behind a 32-partition shuffle has mostly-empty
    # partitions). The sketch table is O(days) rows, so one partition
    # IS the right physical shape for its grand total anyway.
    overall = (
        daily.repartition(1)
        .agg(F.expr(f"approx_top_k_combine(sk, {max_tracked})")
             .alias("csk"))
        .select(F.explode(F.expr(f"approx_top_k_estimate(csk, {k})"))
                .alias("e"))
        .select(F.lit("ALL").alias("day"),
                F.col("e.item").alias("item"),
                F.col("e.count").cast("long").alias("n")))
    return per_day.unionByName(overall)


# ---------------------------------------------------------------------------
# registry surface


def _q_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_quantile_rollup(_events(spark, sf_dir))


def _q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_overlap(_events(spark, sf_dir))


def _q_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return segment_overlap(_events(spark, sf_dir))


def _q_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weekly_active_theta(_events(spark, sf_dir))


def _q_type_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return type_topk_rollup(_events(spark, sf_dir))


QUERIES = {
    # rows-only by design: KLL compaction is randomized (no DuckDB twin);
    # error-bounded vs exact quantiles in test_sketches.py
    "events_value_quantiles": _q_quantile_rollup,
    # full oracles: theta is exact below 2^12 distinct users per group,
    # which holds at the driver's sf0.01 gate (see module docstring)
    "events_retention_overlap": _q_retention,
    "events_segment_overlap": _q_segments,
    "events_weekly_active": _q_weekly,
    # full oracle: ItemsSketch below tracking capacity never evicts,
    # so every count is exact (event-type domain ≪ max_tracked)
    "events_type_topk": _q_type_topk,
}

ORACLES = {
    "events_type_topk": (
        "WITH e AS (SELECT CAST(CAST(date_trunc('day', ts) AS DATE) "
        "AS VARCHAR) AS day, event_type AS item FROM events), "
        "d AS (SELECT day, item, count(*) AS n FROM e GROUP BY day, item) "
        "SELECT day, item, n FROM d "
        "UNION ALL "
        "SELECT 'ALL' AS day, item, CAST(sum(n) AS BIGINT) AS n "
        "FROM d GROUP BY item"
    ),
    "events_retention_overlap": (
        "WITH act AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id "
        "  FROM events), "
        "today AS (SELECT d, count(*) AS active FROM act GROUP BY d), "
        "ret AS (SELECT a.d, count(*) AS returning FROM act a "
        "  JOIN act p ON p.user_id = a.user_id AND p.d = a.d - 1 "
        "  GROUP BY a.d) "
        "SELECT CAST(t.d AS VARCHAR) AS day, "
        "CAST(t.active AS BIGINT) AS active, "
        "CAST(COALESCE(r.returning, 0) AS BIGINT) AS returning, "
        "CAST(t.active - COALESCE(r.returning, 0) AS BIGINT) AS new_users, "
        "CAST(p.active - COALESCE(r.returning, 0) AS BIGINT) AS churned "
        "FROM today t JOIN today p ON p.d = t.d - 1 "
        "LEFT JOIN ret r ON r.d = t.d"
    ),
    "events_weekly_active": (
        "SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS VARCHAR) "
        "  AS week, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS est_users "
        "FROM events WHERE ts IS NOT NULL "
        "GROUP BY date_trunc('week', CAST(ts AS DATE))"
    ),
    "events_segment_overlap": (
        "WITH s AS (SELECT DISTINCT event_type, user_id FROM events) "
        "SELECT a.event_type AS type_a, b.event_type AS type_b, "
        "CAST(count(*) AS BIGINT) AS est_both "
        "FROM s a JOIN s b ON a.user_id = b.user_id "
        "AND a.event_type < b.event_type "
        "GROUP BY a.event_type, b.event_type"
    ),
}
