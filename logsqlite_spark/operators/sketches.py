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

from pyspark.sql import DataFrame, SparkSession, Window
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
# Portable sketches — same mergeable shapes, engine-independent math
#
# The Datasketches HLL/KLL queries above are rows-only for the driver
# because their estimates are engine-internal (Datasketches register
# packing / randomized KLL compaction have no DuckDB twin). These
# portable variants close that gap the same way `ann_lsh_portable`
# closed it for ML LSH: the sketch is defined purely in terms of md5
# hex strings and integer arithmetic BOTH engines compute bit-for-bit,
# so the full estimate replays in DuckDB SQL and the registry entries
# are hash-matched end-to-end.
#
# - Portable HLL (Flajolet et al. 2007, HyperLogLog): register index =
#   first 3 md5 hex chars (p=12, m=4096 registers), rho = leading-zero
#   rank of the next 12 hex chars (w=48 bits) = 49 - bitlength. The
#   harmonic sum is kept as the EXACT integer sum(2^(49-M_j)) (max
#   m·2^49 = 2^61 < int64), so the only floating step is the final
#   alpha·m²·2^49/S division (and ln() in the small-range linear-
#   counting branch) — rounded to 4 decimals, far inside the 9-sig-fig
#   compare window. Registers merge by max(), so the per-day register
#   table is the mergeable artifact: ALL-grain = max-merge of daily
#   registers, never a re-scan.
# - Portable KMV quantiles (bottom-k / k-minimum-values): the per-day
#   sample is the k rows with the smallest md5(event_id) — a uniform
#   mergeable sample (bottom-k of a union == bottom-k of the unioned
#   bottom-k's), ordered by the fixed-width hex string itself so no
#   parse is needed. Percentiles are lower-nearest-rank over the
#   sample with (value, event_id) tie-breaks: every output is an exact
#   BIGINT, deterministic in both engines. Exact when a day has ≤ k
#   rows; rank error ~1/sqrt(k) beyond (pinned in test_sketches.py).
#
# Scale: the HLL path is one scan + a (day, j) group-by bounded by
# m·days rows; the KMV path's rn<=k filter compiles to Spark's
# WindowGroupLimit (per-partition group top-k before the shuffle, the
# same physical shape the tail-N reads pin), and the ALL-grain sample
# sorts only days·k pre-sampled rows.

_HLL_P = 12                      # 3 hex chars -> 4096 registers
_HLL_M = 1 << _HLL_P
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
_HLL_RMAX = 49                   # w=48 rho bits -> rho in [1, 49]


def hll_portable_registers(events: DataFrame,
                           key_col: str = "user_id",
                           day_col: str = "day") -> DataFrame:
    """Per-(day, register) max-rho table — the mergeable HLL state.

    md5 is computed on the key's canonical string form so Spark and
    DuckDB hash identical bytes. Registers merge by ``max`` (set-union
    semantics), so any coarser grain is served from this table.
    """
    h = F.md5(F.col(key_col).cast("string"))
    j = F.conv(F.substring(h, 1, 3), 16, 10).cast("long")
    v = F.conv(F.substring(h, 4, 12), 16, 10).cast("long")
    # bitlength via bin(): bin(0)='0' would read as length 1, so the
    # all-zero suffix (probability 2^-48) is pinned to rho = 49.
    rho = (F.when(v == 0, F.lit(_HLL_RMAX))
           .otherwise(F.lit(_HLL_RMAX) - F.length(F.bin(v))))
    return (events
            .select(F.col(day_col).cast("string").alias("day"),
                    j.alias("j"), rho.alias("rho"))
            .groupBy("day", "j")
            .agg(F.max("rho").alias("m_j")))


def hll_merge_all_grain(regs: DataFrame) -> DataFrame:
    """ALL-grain register rows: max-merge of the per-day registers
    (the one merge every serving path shares — rollup, inc twin, and
    the streaming snapshot report)."""
    return (regs.groupBy("j").agg(F.max("m_j").alias("m_j"))
            .select(F.lit("ALL").alias("day"), "j", "m_j"))


def hll_portable_estimate(regs: DataFrame,
                          grain_col: str = "day") -> DataFrame:
    """HLL estimate per grain from a register table.

    ``s_scaled`` = sum over all m registers of 2^(49 - M_j) with empty
    registers at M_j = 0 — an exact int64 the oracle reproduces
    bit-for-bit. Small-range (linear counting) correction applies when
    E_raw <= 2.5m and empty registers exist, as in the HLL paper.
    """
    m, rmax = _HLL_M, _HLL_RMAX
    ag = (regs.groupBy(grain_col)
          .agg(F.count("*").alias("regs"),
               F.sum(F.expr(
                   f"shiftleft(1L, cast({rmax} - m_j as int))")).alias("sp")))
    s_scaled = (F.col("sp")
                + (F.lit(m) - F.col("regs")) * F.lit(1 << rmax)).cast("long")
    ag = ag.withColumn("s_scaled", s_scaled)
    e_raw = (F.lit(_HLL_ALPHA * m * m * float(1 << rmax))
             / F.col("s_scaled").cast("double"))
    zeros = (F.lit(m) - F.col("regs")).cast("double")
    est = (F.when((e_raw <= F.lit(2.5 * m)) & (F.col("regs") < m),
                  F.lit(float(m)) * F.log(F.lit(float(m)) / zeros))
           .otherwise(e_raw))
    return ag.select(
        F.col(grain_col),
        F.col("regs").cast("long").alias("regs"),
        F.col("s_scaled"),
        F.round(est, 4).alias("est_r4"))


def distinct_users_hll_portable(events: DataFrame) -> DataFrame:
    """Per-day + overall distinct-user estimates, fully oracled.

    The ALL row is a max-merge of the DAILY register table (KBs), not
    a second scan — the same merge the nightly rollup would run.
    """
    daily = hll_portable_registers(events)
    return hll_portable_estimate(
        daily.unionByName(hll_merge_all_grain(daily)))


def _hll_portable_sql() -> str:
    m, rmax, alpha = _HLL_M, _HLL_RMAX, _HLL_ALPHA
    # one pre-multiplied numerator, emitted in scientific notation so
    # DuckDB parses a DOUBLE (a plain decimal literal would become a
    # DECIMAL and overflow when divided against the BIGINT sum)
    num = repr(alpha * m * m * float(1 << rmax))  # exact round-trip
    return (
        "WITH e AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, "
        "  md5(CAST(user_id AS VARCHAR)) AS h FROM events), "
        "hx AS (SELECT day, "
        "  CAST(concat('0x', substr(h, 1, 3)) AS BIGINT) AS j, "
        "  CAST(concat('0x', substr(h, 4, 12)) AS BIGINT) AS v FROM e), "
        f"rr AS (SELECT day, j, CASE WHEN v = 0 THEN {rmax} "
        f"  ELSE {rmax} - length(bin(v)) END AS rho FROM hx), "
        "dreg AS (SELECT day, j, max(rho) AS m_j FROM rr GROUP BY 1, 2), "
        "reg AS (SELECT * FROM dreg UNION ALL "
        "  SELECT 'ALL' AS day, j, max(m_j) AS m_j FROM dreg GROUP BY j), "
        "ag AS (SELECT day, count(*) AS regs, "
        f"  sum(CAST(1 AS BIGINT) << ({rmax} - m_j)) AS sp "
        "  FROM reg GROUP BY day), "
        "s AS (SELECT day, regs, "
        f"  CAST(sp + ({m} - regs) * (CAST(1 AS BIGINT) << {rmax}) "
        "  AS BIGINT) AS s_scaled FROM ag) "
        "SELECT day, CAST(regs AS BIGINT) AS regs, s_scaled, "
        f"round(CASE WHEN {num} / s_scaled <= {2.5 * m} AND regs < {m} "
        f"  THEN {float(m)} * ln(CAST({m} AS DOUBLE) / ({m} - regs)) "
        f"  ELSE {num} / s_scaled END, 4) AS est_r4 "
        "FROM s"
    )


_KMV_K = 256


def kmv_bottom_k(events: DataFrame, k: int = _KMV_K,
                 day_col: str = "day") -> DataFrame:
    """Per-day bottom-k hash sample: the k rows with the smallest
    md5(event_id). The fixed-width hex string IS the sort key (lexico-
    graphic == numeric), and ``rn <= k`` over the per-day window
    compiles to WindowGroupLimit — partial top-k before the shuffle.
    """
    w = (Window.partitionBy(day_col)
         .orderBy(F.col("hk"), F.col("event_id")))
    return (events
            .withColumn("hk", F.md5(F.col("event_id").cast("string")))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn"))


def _events_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events keyed by event_id (the KMV sample identity)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_date(F.timestamp_micros(F.expr("ts div 1000"))).alias("day"),
        F.expr(_CENTS).alias("value_c"),
    )


def _kmv_inline_rollup(samp_d: DataFrame, e: DataFrame, grain,
                       out_col: str, k: int = _KMV_K,
                       qs: tuple[float, ...] = _QS) -> DataFrame:
    """Grain rollup + IN-ROW nearest-rank percentiles over maintained
    per-day bottom-k samples (VERDICT r15 #3, redesigned).

    The r15 serving path (kmv_report) built a heavyweight plan — four
    Windows, two unions, two joins — whose per-call analysis alone
    cost ~1 s at sf0.1, dwarfing execution.  This plan has exactly
    two aggregations and one tiny join:

    - ``grain`` + ALL rows come from ONE Expand over the day sample
      (2× of a days×k-row input, never of events);
    - the per-grain bottom-k re-rank is a sorted-array slice INSIDE
      the aggregate (group input ≤ days×k rows — state-sized at any
      corpus scale), exact by the bottom-k merge law;
    - percentiles are extracted in-row: re-sort the ≤k sample by
      (value_c, event_id), ``element_at`` the nearest-rank positions
      (rank = floor(q·(ns-1)) + 1) — no Window, no union, no
      per-quantile join;
    - exact counts are ONE column-pruned pass over events with the
      same Expand, so the grain + ALL totals partial-aggregate
      map-side into ≤ grains+1 rows.

    The raw-event bottom-k itself stays :func:`kmv_bottom_k`
    (WindowGroupLimit: partial top-k BEFORE the shuffle — fusing the
    count into that window would force the full table through
    WindowExec, and fusing via collect_list partials would shuffle
    whole partitions as single rows; both are 100 TB anti-plans).
    The count rows ride the SAME aggregate via a tagged union (null
    sample struct — collect_list skips nulls, sum counts the tag), so
    there is no counts⋈quantiles join at all; the count branch still
    partial-aggregates map-side into ≤ grains+1 rows per task."""
    sample_rows = samp_d.select(
        F.explode(F.array(grain, F.lit("ALL"))).alias(out_col),
        F.struct("hk", "event_id", "value_c").alias("s"),
        F.lit(0).cast("long").alias("one"))
    count_rows = e.select(
        F.explode(F.array(grain, F.lit("ALL"))).alias(out_col),
        F.lit(None).cast(sample_rows.schema["s"].dataType).alias("s"),
        F.lit(1).cast("long").alias("one"))
    quant = (sample_rows.unionByName(count_rows)
             .groupBy(out_col)
             .agg(F.sum("one").alias("n"),
                  F.slice(F.array_sort(F.collect_list("s")), 1, k)
                  .alias("sv"))
             .withColumn("sv2", F.expr(
                 "array_sort(transform(sv, x -> "
                 "struct(x.value_c AS value_c, x.event_id AS event_id)))"))
             .withColumn("ns", F.size("sv2")))
    picks = [
        F.expr(f"element_at(sv2, CAST(floor({q} * (ns - 1)) AS INT) "
               "+ 1).value_c")
        .cast("long").alias(f"p{int(q * 100)}_c")
        for q in qs
    ]
    return quant.select(out_col, F.col("n").cast("long").alias("n"),
                        *picks)


def kmv_value_quantiles(events: DataFrame, k: int = _KMV_K,
                        qs: tuple[float, ...] = _QS) -> DataFrame:
    """Per-day + overall value percentiles from bottom-k samples.

    Lower-nearest-rank over the sample (rank = floor(q·(ns-1)) + 1,
    ties broken by event_id) — every output an exact BIGINT. The ALL
    sample is the bottom-k of the unioned daily samples (mergeability
    of bottom-k), so the overall row never re-reads events.
    """
    e = events.select(F.col("day").cast("string").alias("day"),
                      "value_c", "event_id")
    samp_d = kmv_bottom_k(e, k)
    return _kmv_inline_rollup(samp_d, e, F.col("day"), "day", k, qs)


def kmv_report(samp_d: DataFrame, n_d: DataFrame, k: int = _KMV_K,
               qs: tuple[float, ...] = _QS) -> DataFrame:
    """The serving query over maintained KMV state: per-day bottom-k
    samples (``day, value_c, event_id, hk``) + exact per-day counts
    (``day, n``) → per-day + ALL percentiles. Touches only state
    (days·k sample rows + days count rows), never raw events — the
    incremental twin calls this on O(batch)-maintained state."""
    w_all = Window.orderBy(F.col("hk"), F.col("event_id"))
    samp_a = (samp_d
              .withColumn("rn", F.row_number().over(w_all))
              .filter(F.col("rn") <= k).drop("rn")
              .withColumn("day", F.lit("ALL")))
    samp = samp_d.unionByName(samp_a)

    wq = Window.partitionBy("day").orderBy("value_c", "event_id")
    ranked = (samp
              .withColumn("rv", F.row_number().over(wq))
              .withColumn("ns", F.count("*").over(Window.partitionBy("day"))))
    picks = [
        F.max(F.when(
            F.col("rv") == (F.floor(F.lit(q) * (F.col("ns") - 1)) + 1),
            F.col("value_c"))).alias(f"p{int(q * 100)}_c")
        for q in qs
    ]
    quant = ranked.groupBy("day").agg(*picks)

    n_all = n_d.agg(F.sum("n").alias("n")).select(
        F.lit("ALL").alias("day"), F.col("n"))
    counts = n_d.unionByName(n_all)
    return (counts.join(quant, "day")
            .select("day", F.col("n").cast("long").alias("n"),
                    *[F.col(f"p{int(q * 100)}_c").cast("long")
                      for q in qs]))


def update_hll_registers(registers: DataFrame,
                         new_events: DataFrame) -> DataFrame:
    """O(batch) maintenance of the portable-HLL register table: sketch
    only the new rows, max-merge per (day, register). Identical to a
    from-scratch rebuild by max-associativity (merge law pinned in
    ``test_sketches.py``) — history is never re-hashed."""
    fresh = hll_portable_registers(new_events)
    return (registers.unionByName(fresh)
            .groupBy("day", "j").agg(F.max("m_j").alias("m_j")))


def update_kmv_samples(samples: DataFrame, new_events: DataFrame,
                       k: int = _KMV_K) -> DataFrame:
    """O(batch) maintenance of the per-day bottom-k sample table:
    bottom-k of (kept samples ∪ the batch's own bottom-k). EXACT by
    the bottom-k merge law — the maintained sample equals the one a
    full re-scan would draw, so the serving percentiles are identical.
    Only the batch is hashed; the union ranks days·k + batch-k rows."""
    fresh = kmv_bottom_k(
        new_events.select(F.col("day").cast("string").alias("day"),
                          "value_c", "event_id"), k)
    return kmv_bottom_k(samples.unionByName(fresh), k)


def kmv_weekly_value_quantiles(events: DataFrame, k: int = _KMV_K,
                               qs: tuple[float, ...] = _QS) -> DataFrame:
    """Weekly + overall value percentiles served by MERGING the
    per-day bottom-k state to the week grain — the coarser-grain
    serving path the sketch tier exists for (the nightly state is
    per-day; week/month/all-time reports merge it, never re-scan
    events).

    Correctness rides the bottom-k merge law: bottom-k(week) ==
    bottom-k(union of its days' bottom-k) at the same k, so the
    DuckDB oracle recomputes the weekly sample DIRECTLY from raw
    events and the hash-match certifies the merge end-to-end.
    ``date_trunc('week')`` is ISO-Monday in both engines.

    VERDICT r15 #3: served through :func:`_kmv_inline_rollup` — the
    week + ALL grains come from one Expand over the per-day sample,
    the re-rank and percentile extraction are in-row array ops, and
    the exact counts are one column-pruned pass; the r15 kmv_report
    plan's per-call analysis cost alone exceeded this plan's total."""
    e = events.select(F.col("day").cast("string").alias("day"),
                      "value_c", "event_id")
    samp_d = kmv_bottom_k(e, k)          # the maintained per-day state
    wk = (F.date_trunc("week", F.to_date(F.col("day")))
          .cast("date").cast("string"))
    return _kmv_inline_rollup(samp_d, e, wk, "week", k, qs)


def _kmv_weekly_quantiles_sql(k: int = _KMV_K,
                              qs: tuple[float, ...] = _QS) -> str:
    """Oracle for the weekly rollup: the weekly bottom-k is drawn in
    ONE pass from raw events (no day intermediate), so a hash-match
    proves the engine's merged-state serving equals a from-scratch
    recompute — the merge law, certified by the driver gate."""
    picks = ", ".join(
        f"max(CASE WHEN rv = CAST(floor({q} * (ns - 1)) AS BIGINT) + 1 "
        f"THEN value_c END) AS p{int(q * 100)}_c"
        for q in qs)
    return (
        "WITH e AS (SELECT CAST(CAST(date_trunc('week', CAST(ts AS "
        "DATE)) AS DATE) AS VARCHAR) AS week, "
        f"  {_CENTS_DUCK} AS value_c, event_id, "
        "  md5(CAST(event_id AS VARCHAR)) AS hk FROM events), "
        "sw AS (SELECT week, value_c, event_id, hk FROM "
        "  (SELECT week, value_c, event_id, hk, "
        "  row_number() OVER (PARTITION BY week ORDER BY hk, event_id) "
        f"  AS rn FROM e) WHERE rn <= {k}), "
        "sa AS (SELECT 'ALL' AS week, value_c, event_id, hk FROM "
        "  (SELECT *, row_number() OVER (ORDER BY hk, event_id) AS rn2 "
        f"  FROM sw) WHERE rn2 <= {k}), "
        "samp AS (SELECT week, value_c, event_id FROM sw "
        "  UNION ALL SELECT week, value_c, event_id FROM sa), "
        "ranked AS (SELECT week, value_c, "
        "  row_number() OVER (PARTITION BY week ORDER BY value_c, event_id) "
        "  AS rv, count(*) OVER (PARTITION BY week) AS ns FROM samp), "
        f"quant AS (SELECT week, {picks} FROM ranked GROUP BY week), "
        "nd AS (SELECT week, count(*) AS n FROM e GROUP BY week), "
        "cnt AS (SELECT week, n FROM nd UNION ALL "
        "  SELECT 'ALL', sum(n) FROM nd) "
        "SELECT c.week, CAST(c.n AS BIGINT) AS n, "
        + ", ".join(f"CAST(q.p{int(q_ * 100)}_c AS BIGINT) "
                    f"AS p{int(q_ * 100)}_c" for q_ in qs)
        + " FROM cnt c JOIN quant q ON q.week = c.week"
    )


def _kmv_quantiles_sql(k: int = _KMV_K,
                       qs: tuple[float, ...] = _QS) -> str:
    picks = ", ".join(
        f"max(CASE WHEN rv = CAST(floor({q} * (ns - 1)) AS BIGINT) + 1 "
        f"THEN value_c END) AS p{int(q * 100)}_c"
        for q in qs)
    return (
        "WITH e AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, "
        f"  {_CENTS_DUCK} AS value_c, event_id, "
        "  md5(CAST(event_id AS VARCHAR)) AS hk FROM events), "
        # NOTE: sd must NOT re-expose its rn — sa's WHERE would bind to
        # the stale column and silently skip the ALL-grain resample.
        "sd AS (SELECT day, value_c, event_id, hk FROM "
        "  (SELECT day, value_c, event_id, hk, "
        "  row_number() OVER (PARTITION BY day ORDER BY hk, event_id) "
        f"  AS rn FROM e) WHERE rn <= {k}), "
        "sa AS (SELECT 'ALL' AS day, value_c, event_id, hk FROM "
        "  (SELECT *, row_number() OVER (ORDER BY hk, event_id) AS rn2 "
        f"  FROM sd) WHERE rn2 <= {k}), "
        "samp AS (SELECT day, value_c, event_id FROM sd "
        "  UNION ALL SELECT day, value_c, event_id FROM sa), "
        "ranked AS (SELECT day, value_c, "
        "  row_number() OVER (PARTITION BY day ORDER BY value_c, event_id) "
        "  AS rv, count(*) OVER (PARTITION BY day) AS ns FROM samp), "
        f"quant AS (SELECT day, {picks} FROM ranked GROUP BY day), "
        "nd AS (SELECT day, count(*) AS n FROM e GROUP BY day), "
        "cnt AS (SELECT day, n FROM nd UNION ALL "
        "  SELECT 'ALL', sum(n) FROM nd) "
        "SELECT c.day, CAST(c.n AS BIGINT) AS n, "
        + ", ".join(f"CAST(q.p{int(q_ * 100)}_c AS BIGINT) "
                    f"AS p{int(q_ * 100)}_c" for q_ in qs)
        + " FROM cnt c JOIN quant q ON q.day = c.day"
    )


_CENTS_DUCK = ("CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) "
               "AS BIGINT)")


# ---------------------------------------------------------------------------
# registry surface


def _q_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly+ALL rollup served from merged per-day bottom-k state
    (VERDICT r14 #8: the headline quantile-rollup entry is now fully
    DuckDB-oracled; the randomized-KLL rollup stays the engine-native
    path — value_quantile_rollup / daily_value_sketches /
    merge_daily_value_sketches, error-bound-pinned in
    test_sketches.py and exercised by the streaming KLL lifecycle)."""
    return kmv_weekly_value_quantiles(_events_id(spark, sf_dir))


def _q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_overlap(_events(spark, sf_dir))


def _q_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return segment_overlap(_events(spark, sf_dir))


def _q_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weekly_active_theta(_events(spark, sf_dir))


def _q_type_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return type_topk_rollup(_events(spark, sf_dir))


def _q_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_users_hll_portable(_events(spark, sf_dir))


def _q_kmv_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmv_value_quantiles(_events_id(spark, sf_dir))


def _q_hll_portable_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental twin (the registry's %4 batch convention): history
    registers are maintained state; only the batch rows are hashed.
    Equal to the full rollup by the register merge law, so the oracle
    is the full-corpus SQL."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.to_date(F.timestamp_micros(F.expr("ts div 1000"))).alias("day"))
    hist = ev.filter(F.col("event_id") % 4 != 0)
    batch = ev.filter(F.col("event_id") % 4 == 0)
    regs = update_hll_registers(hll_portable_registers(hist), batch)
    return hll_portable_estimate(
        regs.unionByName(hll_merge_all_grain(regs)))


def _q_kmv_quantiles_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental twin: maintained bottom-k samples + exact count
    deltas; serving touches only state. Equal to the full rollup by
    the bottom-k merge law (same oracle)."""
    ev = _events_id(spark, sf_dir)
    hist = ev.filter(F.col("event_id") % 4 != 0)
    batch = ev.filter(F.col("event_id") % 4 == 0)
    e_h = hist.select(F.col("day").cast("string").alias("day"),
                      "value_c", "event_id")
    samp = update_kmv_samples(kmv_bottom_k(e_h), batch)
    n_h = e_h.groupBy("day").agg(F.count("*").alias("n"))
    n_b = (batch.select(F.col("day").cast("string").alias("day"))
           .groupBy("day").agg(F.count("*").alias("n")))
    n_d = (n_h.unionByName(n_b).groupBy("day")
           .agg(F.sum("n").alias("n")))
    return kmv_report(samp, n_d)


QUERIES = {
    # full oracle since r15: weekly rollup from merged per-day
    # bottom-k state (the KLL twin stays engine-native, pytest-pinned)
    "events_value_quantiles": _q_quantile_rollup,
    # full oracles: md5-defined sketch math both engines replay
    # bit-for-bit (see "Portable sketches" section)
    "events_distinct_hll_portable": _q_hll_portable,
    "events_value_quantiles_portable": _q_kmv_quantiles,
    "events_distinct_hll_portable_inc": _q_hll_portable_inc,
    "events_value_quantiles_portable_inc": _q_kmv_quantiles_inc,
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
    "events_value_quantiles": _kmv_weekly_quantiles_sql(),
    "events_distinct_hll_portable": _hll_portable_sql(),
    "events_value_quantiles_portable": _kmv_quantiles_sql(),
    # inc twins equal the full rollups by the merge laws, so they
    # carry the SAME full-corpus oracle — the hash-match certifies the
    # O(batch) maintenance path end-to-end
    "events_distinct_hll_portable_inc": _hll_portable_sql(),
    "events_value_quantiles_portable_inc": _kmv_quantiles_sql(),
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
