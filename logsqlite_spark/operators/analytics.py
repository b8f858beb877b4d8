"""Window-function analytics surface over ``events`` (engine health).

Running aggregates, lag deltas, and per-group ranking — the window
shapes a log-analytics user reaches for right after filters and
group-bys. Not reference parity (logsqlite has no window functions);
they pin Spark's WindowExec paths with exact oracles.

Oracle determinism: every windowed value is computed on exact integers
(floor-quantized cents, epoch-micros) with a total order inside each
partition (tiebreak on ``event_id``), so running sums and ranks are
bit-identical across engines regardless of physical row order — the
FP-summation order trap (ADR in tpch.py) never arises.

Scale notes: all three queries are a single hash-partition shuffle on
``user_id`` (or none when the source is already bucketed by user);
WindowExec sorts within partitions — skew is bounded by events-per-
user, and a hot user salts the same way a hot container does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logsqlite_spark.tables import table

_CENTS = "cast(floor(cast(value as double) * 100 + 0.5) as bigint)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id", "user_id", "event_type",
        F.expr("ts div 1000").alias("ts_us"),
        F.expr(_CENTS).alias("value_c"),
    )


def running_value(events: DataFrame) -> DataFrame:
    """Cumulative spend per user in arrival order — integer-exact."""
    w = (Window.partitionBy("user_id")
         .orderBy("ts_us", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return events.select(
        F.col("event_id").cast("long"), F.col("user_id").cast("long"),
        "ts_us",
        F.sum("value_c").over(w).cast("long").alias("cum_value_c"),
    )


def lag_delta(events: DataFrame) -> DataFrame:
    """Inter-event gap per user (µs); first event has no predecessor."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return events.select(
        F.col("event_id").cast("long"), F.col("user_id").cast("long"),
        (F.col("ts_us") - F.lag("ts_us").over(w)).cast("long")
        .alias("delta_us"),
    )


def top_events_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k events by value within each user — WindowGroupLimit shape:
    the rank filter is pushed into the window sort, so each partition
    keeps k rows instead of ranking everything."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("value_c").desc(), F.col("event_id"))
    return (
        events.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("user_id").cast("long"), F.col("event_id").cast("long"),
                F.col("value_c").cast("long"), F.col("rnk").cast("int"))
    )


def trailing_hour_value(events: DataFrame) -> DataFrame:
    """Trailing-1h spend per event — a RANGE (time-based) window frame,
    not ROWS: the frame is defined by the ts value, so ties at the
    same microsecond are all peers and the result is independent of
    physical row order. Sums are exact integers (cents).

    Scale: one shuffle on user_id; WindowExec's sliding range frame
    advances two pointers over the sorted partition — O(n) per user,
    no re-scan per row.
    """
    hour_us = 3_600_000_000
    w = (Window.partitionBy("user_id").orderBy("ts_us")
         .rangeBetween(-(hour_us - 1), 0))
    return events.select(
        F.col("event_id").cast("long"), F.col("user_id").cast("long"),
        "ts_us",
        F.sum("value_c").over(w).cast("long").alias("hour_value_c"),
        F.count(F.lit(1)).over(w).cast("long").alias("hour_events"),
    )


def activity_gaps(events: DataFrame, start: str = "2024-01-01",
                  end: str = "2024-01-30") -> DataFrame:
    """Days with NO events per user over a calendar spine — the
    data-freshness / silent-source monitor a log pipeline runs daily.

    The spine is generated (``sequence`` of dates exploded per user),
    so absence is representable — you cannot group your way to a row
    that isn't there. The anti-join against the observed (user, day)
    set is one shuffle on a tiny distinct table; the spine is
    users × days, linear in users.
    """
    spine = (
        events.select(F.col("user_id").cast("long")).distinct()
        .select("user_id", F.explode(F.expr(
            f"sequence(to_date('{start}'), to_date('{end}'))")).alias("day"))
    )
    active = (
        events.select(
            F.col("user_id").cast("long"),
            F.to_date(F.timestamp_micros(F.col("ts_us"))).alias("day"))
        .distinct()
    )
    return (
        spine.join(active, ["user_id", "day"], "left_anti")
        .select("user_id", F.col("day").cast("string").alias("day"))
    )


def activity_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity day,
    distinct actives counted per (cohort day, days-since) cell — the
    standard product-retention rollup.

    Two aggregations + one join: first-activity is a groupBy(user)
    min, broadcast back onto the distinct (user, day) activity set.
    countDistinct is exact (two-phase distinct aggregation). All
    outputs are integers/dates — no FP anywhere.
    """
    ev = events.select(
        F.col("user_id").cast("long"),
        F.to_date(F.timestamp_micros(F.col("ts_us"))).alias("day"))
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.distinct()
    # first is one row PER USER — unbounded, so no forced broadcast;
    # both sides are user-keyed and AQE broadcasts when small.
    return (
        active.join(first, "user_id")
        .groupBy("cohort_day",
                 F.datediff(F.col("day"), F.col("cohort_day"))
                 .cast("int").alias("day_offset"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .select(F.col("cohort_day").cast("string").alias("cohort_day"),
                "day_offset", "n_users")
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def _funnel_frontiers(events: DataFrame,
                      steps: tuple[str, ...]) -> DataFrame:
    """One row per user with the funnel frontier times t1..tK:
    t1 = min ts of step1; t{i} = min ts of step{i} with ts > t{i-1}.

    JOIN-FREE: the step-{i} minimum needs the step-{i-1} frontier of
    the same user, which is a window aggregate, not a join — so the
    chain is K conditional ``min() over (partition by user_id)``
    windows with the SAME partition spec. Catalyst plans that as ONE
    hash exchange + one sort, with every window and the per-user
    collapse pipelined after it; the old join-chain formulation
    shuffled the filtered events AND the frontier once per step. A
    user never reaching step i gets a null t{i} (null > comparison),
    exactly the reference CTE-chain semantics.
    """
    ev = events.select(F.col("user_id").cast("long"),
                       "event_type", "ts_us")
    w = Window.partitionBy("user_id")
    df = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == steps[0],
                           F.col("ts_us"))).over(w))
    prev_t = "t1"
    for i, step in enumerate(steps[1:], start=2):
        df = df.withColumn(
            f"t{i}",
            F.min(F.when((F.col("event_type") == step)
                         & (F.col("ts_us") > F.col(prev_t)),
                         F.col("ts_us"))).over(w))
        prev_t = f"t{i}"
    # same key as the window partitioning — no second data shuffle
    return df.groupBy("user_id").agg(
        *[F.max(f"t{i}").alias(f"t{i}")
          for i in range(1, len(steps) + 1)])


def funnel(events: DataFrame,
              steps: tuple[str, ...] = FUNNEL_STEPS) -> DataFrame:
    """Single-plan funnel (no driver-side counts — one job): per-user
    frontier times from the join-free window chain, then one global
    count per step. Two exchanges total: the user-keyed data shuffle
    and the one-row final aggregate."""
    per_user = _funnel_frontiers(events, steps)
    aggs = [F.count(f"t{i + 1}").cast("long").alias(f"n_{s}")
            for i, s in enumerate(steps)]
    return per_user.agg(*aggs)


def conversion_times(events: DataFrame,
                     steps: tuple[str, ...] = FUNNEL_STEPS) -> DataFrame:
    """Time-to-convert distribution for funnel completers: exact
    discrete p50/p90/p99 of (last-step ts − first-step ts), in
    microseconds. Composes the funnel frontier chain with the same
    type-1 percentile construction as ``length_quantiles`` — integer
    end to end.
    """
    last_t = f"t{len(steps)}"
    done = (_funnel_frontiers(events, steps)
            .filter(F.col(last_t).isNotNull())
            .select("user_id",
                    (F.col(last_t) - F.col("t1")).alias("dt_us")))
    # Exact global rank WITHOUT a single-partition sort: converter count
    # is ~user-cardinality, so Window.orderBy() over all of them would
    # funnel 1e9 rows through one task at scale. Two-pass distributed
    # rank (functions/rank.py); ties broken by user_id so the order
    # key is unique.
    from logsqlite_spark.functions.rank import with_global_rank

    ranked = with_global_rank(done, ["dt_us", "user_id"]).select(
        "dt_us", "rn", "n")
    aggs = [
        F.max(F.when(F.col("rn") == F.ceil(F.col("n") * F.lit(p)),
                     F.col("dt_us"))).cast("long").alias(f"p{int(p * 100)}_us")
        for p in (0.5, 0.9, 0.99)
    ]
    return ranked.agg(F.max("n").cast("long").alias("n_converted"), *aggs)


def distinct_users_hll_rollup(events: DataFrame,
                              lg_k: int = 12) -> DataFrame:
    """Distinct users per day + overall, via mergeable HLL sketches
    (Spark's Datasketches builtins) — the 100 TB distinct-count shape.

    An exact countDistinct is a full shuffle of every (day, user)
    pair, and rolling daily exacts up to a weekly/overall count must
    re-scan raw data because exact distincts don't merge. Sketches
    fix both: the per-day ``hll_sketch_agg`` is one map-side-
    combinable aggregation whose state is a fixed 2^lg_k-register
    sketch regardless of cardinality, and the overall row is
    ``hll_union_agg`` over the DAILY SKETCHES — merging a few KB per
    day, never touching raw events again. This is how a production
    pipeline serves "uniques by day, week, all-time" from one daily
    rollup table.

    Deterministic (Datasketches hashing has no RNG and register-max
    merging is order-independent) but engine-specific: DuckDB's
    approx_count_distinct is a different HLL implementation, so the
    driver check is rows-only by design; the pytest asserts <2%
    relative error against exact counts and sketch-merge
    self-consistency instead.

    Both grains come from ONE ``rollup`` aggregation — a single scan
    with an Expand feeding partial sketch aggregation (a first cut
    unioned two branches and scanned events twice). The ALL row's
    sketch over raw ids is bit-identical to unioning the daily
    sketches (register-max), which :func:`merge_daily_sketches` does
    against an already-materialized daily table.
    """
    return (
        events.select(
            F.to_date(F.timestamp_micros(F.col("ts_us"))).alias("day"),
            "user_id")
        .rollup("day")
        # grouping(), not coalesce(day, 'ALL'): a genuine NULL-ts day
        # group must not collide with the grand-total row
        .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sketch"),
             F.grouping("day").alias("_g"))
        .select(
            F.when(F.col("_g") == 1, F.lit("ALL"))
            .otherwise(F.col("day").cast("string")).alias("day"),
            F.hll_sketch_estimate("sketch").cast("long")
            .alias("est_users"))
    )


def daily_user_sketches(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """The materialized daily rollup: one fixed-size HLL sketch per
    day. This is the table a pipeline persists; any coarser grain is
    served by merging these sketches, never by re-scanning events."""
    return (
        events.select(
            F.to_date(F.timestamp_micros(F.col("ts_us"))).alias("day"),
            "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sketch"))
    )


def merge_daily_sketches(daily: DataFrame) -> DataFrame:
    """Overall distinct estimate from the daily sketch table — merges
    a few KB per day (``hll_union_agg``), no raw-data re-scan."""
    return (
        daily.agg(F.hll_union_agg("sketch").alias("u"))
        .select(F.hll_sketch_estimate("u").cast("long")
                .alias("est_users"))
    )


def update_daily_sketches(daily: DataFrame, new_events: DataFrame,
                          lg_k: int = 12) -> DataFrame:
    """Incremental maintenance of the materialized daily table: fold a
    new batch in by sketching ONLY the new rows and union-merging per
    day. Register-max merging makes this exact maintenance — a day
    split across the old table and the new batch ends up with the
    identical sketch a full recompute would build (pinned in
    ``test_hll.py``), so the nightly job appends instead of
    re-scanning history. This is the sketch tier's whole point:
    exact distincts can't be maintained this way at all."""
    fresh = daily_user_sketches(new_events, lg_k)
    return (
        daily.unionByName(fresh)
        .groupBy("day")
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )


def _q_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    return running_value(_events(spark, sf_dir))


def _q_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lag_delta(_events(spark, sf_dir))


def _q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_events_per_user(_events(spark, sf_dir))


def _q_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trailing_hour_value(_events(spark, sf_dir))


def _q_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return activity_gaps(_events(spark, sf_dir))


def _q_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return activity_cohorts(_events(spark, sf_dir))


def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel(_events(spark, sf_dir))


def _q_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conversion_times(_events(spark, sf_dir))


def _q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_users_hll_rollup(_events(spark, sf_dir))


def user_activity_entropy(events: DataFrame) -> DataFrame:
    """Per-user Shannon entropy of the event-type mix (nats) — the
    behavioral-diversity signal: bots and scripted traffic hammer one
    type (entropy ≈ 0), organic users spread across the catalog.

    One map-side-combinable (user, type) count, then an entropy
    reduction over the per-user handful of type rows — the shuffle
    carries counts, never events.  Exact integer counts; the single
    ln per type row is IEEE-identical, rounded to 6.
    """
    counts = (events.groupBy("user_id", "event_type")
              .agg(F.count(F.lit(1)).cast("long").alias("n")))
    tot = counts.groupBy("user_id").agg(
        F.sum("n").alias("tot"),
        F.count(F.lit(1)).cast("int").alias("n_types"))
    p = F.col("n").cast("double") / F.col("tot").cast("double")
    return (counts.join(tot, "user_id")
            .select("user_id", "n_types", "tot", (-p * F.log(p))
                    .alias("__term"))
            .groupBy("user_id")
            .agg(F.max("n_types").alias("n_types"),
                 F.max("tot").cast("long").alias("n_events"),
                 F.round(F.sum("__term"), 6).alias("entropy")))


def _q_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_activity_entropy(_events(spark, sf_dir))


def user_activity_gini(events: DataFrame) -> DataFrame:
    """Gini coefficient of per-user event counts — the one-number
    load-skew summary (0 = perfectly even, → 1 = one user dominates).
    The quantitative companion to the salting tier (`operators/
    skew.py`): a pipeline owner reads this to decide whether hot-key
    mitigation is worth wiring in.

    Exact rank formula on ascending counts: ``G = 2·Σ(i·xᵢ)/(n·Σx)
    − (n+1)/n`` — all integer sums, one final division.  Ranking over
    USERS (one count row each — the aggregate of the corpus, not the
    corpus) still must not be a single-partition ``Window.orderBy``
    at 1e9 users, so it goes through the distributed two-pass rank
    (``functions/rank.py``), ties broken by user_id; any tie order
    yields the same G (tied x's swap freely in Σi·xᵢ)."""
    from logsqlite_spark.functions.rank import with_global_rank

    per_user = (events.groupBy("user_id")
                .agg(F.count(F.lit(1)).cast("long").alias("x")))
    ranked = with_global_rank(per_user, ["x", "user_id"],
                              rank_col="i", n_col="__n")
    return (ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("n_events"),
        F.sum(F.col("i") * F.col("x")).cast("long").alias("__ix"))
        .select("n_users", "n_events",
                F.round(2.0 * F.col("__ix").cast("double")
                        / (F.col("n_users") * F.col("n_events"))
                        .cast("double")
                        - (F.col("n_users") + 1).cast("double")
                        / F.col("n_users").cast("double"), 6)
                .alias("gini")))


def _q_user_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_activity_gini(_events(spark, sf_dir))


QUERIES = {
    "user_activity_entropy": _q_user_entropy,
    "user_activity_gini": _q_user_gini,
    "events_running_value": _q_running,
    "events_lag_delta": _q_lag,
    "events_topk_per_user": _q_topk,
    "events_trailing_hour": _q_trailing,
    "events_activity_gaps": _q_gaps,
    "events_cohorts": _q_cohorts,
    "events_funnel": _q_funnel,
    "events_conversion_time": _q_conversion,
    # rows-only by design: Datasketches HLL estimates are
    # deterministic but engine-specific (no DuckDB twin)
    "events_distinct_hll": _q_hll_rollup,
}

_EV = ("SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
       "CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS value_c "
       "FROM events")

ORACLES = {
    "user_activity_gini": (
        "WITH pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x "
        "  FROM events GROUP BY 1), "
        "r AS (SELECT x, row_number() OVER (ORDER BY x, user_id) AS i "
        "  FROM pu) "
        "SELECT CAST(count(*) AS BIGINT) AS n_users, "
        "CAST(sum(x) AS BIGINT) AS n_events, "
        "round(2.0 * CAST(sum(i * x) AS DOUBLE) "
        "  / (count(*) * CAST(sum(x) AS DOUBLE)) "
        "  - CAST(count(*) + 1 AS DOUBLE) / count(*), 6) AS gini "
        "FROM r"
    ),
    "user_activity_entropy": (
        "WITH c AS (SELECT user_id, event_type, "
        "  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
        "t AS (SELECT user_id, sum(n) AS tot, "
        "  CAST(count(*) AS INT) AS n_types FROM c GROUP BY 1) "
        "SELECT c.user_id, max(n_types) AS n_types, "
        "CAST(max(tot) AS BIGINT) AS n_events, "
        "round(sum(-(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)) "
        "  * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))), 6) AS entropy "
        "FROM c JOIN t USING (user_id) GROUP BY 1"
    ),
    "events_running_value": (
        f"WITH ev AS ({_EV}) "
        "SELECT event_id, user_id, ts_us, "
        "CAST(sum(value_c) OVER (PARTITION BY user_id ORDER BY ts_us, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS cum_value_c FROM ev"
    ),
    "events_lag_delta": (
        f"WITH ev AS ({_EV}) "
        "SELECT event_id, user_id, "
        "CAST(ts_us - lag(ts_us) OVER (PARTITION BY user_id "
        "ORDER BY ts_us, event_id) AS BIGINT) AS delta_us FROM ev"
    ),
    "events_topk_per_user": (
        f"WITH ev AS ({_EV}), r AS (SELECT user_id, event_id, value_c, "
        "row_number() OVER (PARTITION BY user_id ORDER BY value_c DESC, "
        "event_id) AS rnk FROM ev) "
        "SELECT user_id, event_id, value_c, CAST(rnk AS INT) AS rnk "
        "FROM r WHERE rnk <= 3"
    ),
    "events_trailing_hour": (
        f"WITH ev AS ({_EV}) "
        "SELECT event_id, user_id, ts_us, "
        "CAST(sum(value_c) OVER (PARTITION BY user_id ORDER BY ts_us "
        "RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS hour_value_c, "
        "CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts_us "
        "RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS hour_events FROM ev"
    ),
    "events_cohorts": (
        "WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events), "
        "fst AS (SELECT user_id, min(day) AS cohort_day FROM ev "
        "GROUP BY user_id), "
        "act AS (SELECT DISTINCT user_id, day FROM ev) "
        "SELECT CAST(cohort_day AS VARCHAR) AS cohort_day, "
        "CAST(datediff('day', cohort_day, day) AS INT) AS day_offset, "
        "count(DISTINCT act.user_id) AS n_users "
        "FROM act JOIN fst ON act.user_id = fst.user_id "
        "GROUP BY cohort_day, datediff('day', cohort_day, day)"
    ),
    "events_funnel": (
        "WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us "
        "FROM events), "
        "s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev "
        "  WHERE event_type = 'view' GROUP BY user_id), "
        "s2 AS (SELECT ev.user_id, min(ts_us) AS t2 FROM ev "
        "  JOIN s1 ON ev.user_id = s1.user_id "
        "  WHERE event_type = 'click' AND ts_us > t1 GROUP BY ev.user_id), "
        "s3 AS (SELECT ev.user_id, min(ts_us) AS t3 FROM ev "
        "  JOIN s2 ON ev.user_id = s2.user_id "
        "  WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY ev.user_id) "
        "SELECT (SELECT count(*) FROM s1) AS n_view, "
        "(SELECT count(*) FROM s2) AS n_click, "
        "(SELECT count(*) FROM s3) AS n_purchase"
    ),
    "events_conversion_time": (
        "WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us "
        "FROM events), "
        "s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev "
        "  WHERE event_type = 'view' GROUP BY user_id), "
        "s2 AS (SELECT ev.user_id, t1, min(ts_us) AS t2 FROM ev "
        "  JOIN s1 ON ev.user_id = s1.user_id "
        "  WHERE event_type = 'click' AND ts_us > t1 "
        "  GROUP BY ev.user_id, t1), "
        "s3 AS (SELECT ev.user_id, t1, min(ts_us) AS t3 FROM ev "
        "  JOIN s2 ON ev.user_id = s2.user_id "
        "  WHERE event_type = 'purchase' AND ts_us > t2 "
        "  GROUP BY ev.user_id, t1), "
        "done AS (SELECT user_id, t3 - t1 AS dt_us FROM s3), "
        "r AS (SELECT dt_us, row_number() OVER (ORDER BY dt_us, user_id) "
        "  AS rn, count(*) OVER () AS n FROM done) "
        "SELECT CAST(max(n) AS BIGINT) AS n_converted, "
        "CAST(max(CASE WHEN rn = ceil(n * 0.5) THEN dt_us END) AS BIGINT) AS p50_us, "
        "CAST(max(CASE WHEN rn = ceil(n * 0.9) THEN dt_us END) AS BIGINT) AS p90_us, "
        "CAST(max(CASE WHEN rn = ceil(n * 0.99) THEN dt_us END) AS BIGINT) AS p99_us "
        "FROM r"
    ),
    "events_activity_gaps": (
        "WITH users AS (SELECT DISTINCT user_id FROM events), "
        "spine AS (SELECT user_id, CAST(d.day AS DATE) AS day FROM users, "
        "  unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30', "
        "  INTERVAL 1 DAY)) AS d(day)), "
        "active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
        "  FROM events) "
        "SELECT user_id, CAST(day AS VARCHAR) AS day FROM spine "
        "WHERE NOT EXISTS (SELECT 1 FROM active a "
        "  WHERE a.user_id = spine.user_id AND a.day = spine.day)"
    ),
}
