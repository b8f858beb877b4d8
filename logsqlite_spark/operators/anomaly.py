"""Anomaly surface over ``events`` — outlier flagging and histograms.

The ops-page queries a log-analytics engine serves right after counts:
"which events are abnormal for this container" and "what does the
value distribution look like". Both are built on exact integer sums so
the DuckDB oracle agrees bit-for-bit:

z-score without FP drift: with value in cents ``v``, per-key count
``n``, sum ``S`` and sum-of-squares ``SS`` (all exact int64 —
cents² × rows stays far below 2^63 at any per-key cardinality that
fits an executor),

    z = (v - S/n) / sqrt((n·SS - S²)/n²) = (v·n - S) / sqrt(n·SS - S²)

— the right side is one double division of exact integers and one
sqrt of an exact integer: IEEE-identical in any engine. No streaming
mean/variance accumulation order to diverge.

Scale shape: one hash shuffle on the group key for the window sums;
the histogram is a map-side-combinable groupBy on (type, bin). Skewed
keys behave like any hot group-by key (salt via operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logsqlite_spark.tables import table

Z_CUTOFF = 2.5
BIN_WIDTH_C = 1000  # cents per histogram bin

_CENTS = "cast(floor(cast(value as double) * 100 + 0.5) as bigint)"


def value_outliers(events: DataFrame, cutoff: float = Z_CUTOFF,
                   key_col: str = "user_id") -> DataFrame:
    """Events whose value is ≥ ``cutoff`` population-σ from their
    container's mean. Output is the (small) outlier set."""
    ev = events.select(
        "event_id", F.col(key_col).alias("key"),
        F.expr(_CENTS).alias("v"),
    )
    w = Window.partitionBy("key")
    stats = ev.select(
        "event_id", "key", "v",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("v").over(w).alias("s"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("ss"),
    )
    disc = (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    z = ((F.col("v") * F.col("n") - F.col("s")).cast("double")
         / F.sqrt(disc.cast("double")))
    return (
        stats.filter(disc > 0)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= cutoff)
        .select(F.col("event_id").cast("long"),
                F.col("key").cast("long").alias("user_id"),
                F.col("v").cast("long").alias("value_c"),
                F.round("z", 6).alias("z"))
    )


def value_histogram(events: DataFrame,
                    bin_width_c: int = BIN_WIDTH_C) -> DataFrame:
    """Value histogram per event type: fixed-width integer bins.

    Map-side-combinable groupBy — the shuffle carries one row per
    (type, bin) per partition regardless of input size."""
    ev = events.select(
        "event_type",
        F.floor(F.expr(_CENTS) / F.lit(bin_width_c)).cast("long").alias("bin"),
    )
    return (
        ev.groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select("event_type", "bin",
                (F.col("bin") * bin_width_c).cast("long").alias("bin_lo_c"),
                "n")
    )


PSI_SPLIT_US = 1705363200000000  # 2024-01-16T00:00:00Z (mid-corpus)
PSI_BINS = 20
PSI_BIN_W = 25.0


def value_psi(events: DataFrame, split_us: int = PSI_SPLIT_US,
              n_bins: int = PSI_BINS, bin_w: float = PSI_BIN_W
              ) -> DataFrame:
    """Population Stability Index of the value distribution per event
    type: reference window (before ``split_us``) vs current window —
    the DISTRIBUTION face of drift monitoring (``metric_drift`` sees
    volume and mix; a payment processor whose amounts silently shift
    from $10 to $100 keeps identical volume and fails only here).

    PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) over fixed-width value bins
    (clamped to ``n_bins``), Laplace-smoothed (+1 per bin) so empty
    bins are defined.  Conventional gates: <0.1 stable, 0.1–0.25
    drifting, >0.25 shifted.

    Scale shape: ONE scan into a map-side-combinable
    (type, period, bin) count — the shuffle carries ≤ 2·n_bins rows
    per type per map task; the PSI reduction runs over that
    control-plane-sized table (dense bin grid via a broadcast
    sequence cross-join, so both engines see identical smoothing).
    Deterministic: counts are exact integers; the single ln/division
    per bin is IEEE-identical, rounded to 6.
    """
    return value_psi_from_counts(
        psi_bin_counts(events, split_us, n_bins, bin_w), n_bins)


def ewma_smooth(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key exponentially weighted moving average of the event value
    (α = 1/2) — the classic online smoother behind spike detection.

    The recurrence ``s_t = (s_{t-1} + x_t) / 2`` is inherently
    sequential, so it runs as a per-key ``applyInPandas`` walk (state
    is one double per key; keys process in parallel, exactly like the
    sequence packer). α = 1/2 is deliberate: the halving step is an
    exact binary-exponent decrement, and the remaining add rounds
    identically (IEEE round-half-even) in any engine that executes the
    same operand sequence — which the DuckDB recursive-CTE oracle
    does, step for step. Emitted deviation = x_t − s_{t−1} feeds a
    spike threshold downstream.
    """
    import pandas as pd

    schema = ("user_id long, event_id long, ts_us long, value_c long, "
              "ewma_c double, dev_c double")

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        s = None
        ew, dev = [], []
        for x in pdf["value_c"]:
            x = float(x)
            if s is None:
                dev.append(0.0)
                s = x
            else:
                dev.append(x - s)
                s = (s + x) / 2
            ew.append(s)
        pdf["ewma_c"] = ew
        pdf["dev_c"] = dev
        return pdf[["user_id", "event_id", "ts_us", "value_c",
                    "ewma_c", "dev_c"]]

    prepped = events.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col("event_id").cast("long"),
        F.expr("ts div 1000").cast("long").alias("ts_us"),
        F.expr(_CENTS).alias("value_c"),
    )
    return prepped.groupBy("user_id").applyInPandas(walk, schema)


def _ewma_sql() -> str:
    """Recursive-CTE twin: replay the halving recurrence per key."""
    return (
        "WITH RECURSIVE ev AS (SELECT user_id, event_id, "
        "  epoch_us(ts) AS ts_us, "
        "  CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS value_c, "
        "  row_number() OVER (PARTITION BY user_id "
        "    ORDER BY epoch_us(ts), event_id) AS rn "
        "  FROM events), "
        "walk AS ( "
        "  SELECT user_id, event_id, ts_us, value_c, rn, "
        "    CAST(value_c AS DOUBLE) AS s, CAST(0 AS DOUBLE) AS dev "
        "  FROM ev WHERE rn = 1 "
        "  UNION ALL "
        "  SELECT e.user_id, e.event_id, e.ts_us, e.value_c, e.rn, "
        "    (w.s + CAST(e.value_c AS DOUBLE)) / 2 AS s, "
        "    CAST(e.value_c AS DOUBLE) - w.s AS dev "
        "  FROM walk w JOIN ev e ON e.user_id = w.user_id "
        "  AND e.rn = w.rn + 1) "
        "SELECT user_id, event_id, ts_us, value_c, "
        "s AS ewma_c, dev AS dev_c FROM walk"
    )


SEASONAL_FACTOR = 2


def seasonal_volume_anomaly(events: DataFrame,
                            factor: int = SEASONAL_FACTOR) -> DataFrame:
    """Hourly log-volume anomalies against a day-of-week × hour
    seasonal baseline — the monitor that catches the Saturday-3am
    burst a global z-score dilutes away (weekday mornings and weekend
    nights have different normals).

    Two map-side-combinable aggregations: hourly counts (one row per
    observed hour), then the (dow, hour) baseline over that tiny
    table; the flag comparison is INTEGER cross-multiplication
    (``n·cells > factor·total`` for a spike, ``n·cells·factor <
    total`` for a drop), so the verdict is engine-exact with no
    float division anywhere. The expected rate is exposed
    milli-quantized for the same reason. At 100 TB the corpus scan
    is the only data-sized stage — everything after is calendar-
    sized.
    """
    hourly = (
        events.select(
            F.to_date(F.timestamp_micros(F.expr("ts div 1000")))
            .alias("day"),
            F.expr("dayofweek(timestamp_micros(ts div 1000))")
            .alias("dow"),
            F.expr("hour(timestamp_micros(ts div 1000))").alias("hour"))
        .groupBy("day", "dow", "hour")
        .agg(F.count(F.lit(1)).alias("n")))
    base = (hourly.groupBy("dow", "hour")
            .agg(F.sum("n").alias("total"),
                 F.count(F.lit(1)).alias("cells")))
    f = int(factor)
    return (
        hourly.join(F.broadcast(base), ["dow", "hour"])
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("hour").cast("int").alias("hour"),
            F.col("n").cast("long").alias("n"),
            F.expr("total * 1000 div cells").cast("long")
            .alias("expected_milli"),
            F.when(F.expr(f"n * cells > {f} * total"), F.lit("spike"))
            .when(F.expr(f"n * cells * {f} < total"), F.lit("drop"))
            .otherwise(F.lit("normal")).alias("flag"))
    )


BURST_LOOKBACK = 7
BURST_CUTOFF = 2.5


def daily_burst_zscore(events: DataFrame,
                       lookback: int = BURST_LOOKBACK,
                       cutoff: float = BURST_CUTOFF) -> DataFrame:
    """Per-type daily-count burst detector: each day's event count
    z-scored against its type's TRAILING ``lookback``-day window —
    the temporal complement of :func:`seasonal_volume_anomaly` (that
    one asks "is this hour abnormal for a Saturday 3am", this one
    asks "did type X suddenly spike vs its own recent history").

    Exactness: the module's integer z formulation — with window
    count n, sum S, sum-of-squares SS over the trailing days (all
    exact int64), ``z = (v·n − S) / sqrt(n·SS − S²)`` is one double
    division of exact integers and one sqrt of an exact integer,
    IEEE-identical in DuckDB.  Days with fewer than 3 prior days or
    zero variance emit no row (disc > 0 guard, the value_outliers
    rule).

    Scale: one map-side-combinable (type, day) count — the only
    data-sized stage — then a per-type window over CALENDAR DAYS
    (bounded rows), never over events.
    """
    daily = (events.select(
        F.col("event_type"),
        F.to_date(F.timestamp_micros(F.expr("ts div 1000")))
        .alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n")))
    return daily_burst_from_counts(daily, lookback, cutoff)


def daily_burst_from_counts(counts: DataFrame,
                            lookback: int = BURST_LOOKBACK,
                            cutoff: float = BURST_CUTOFF) -> DataFrame:
    """The burst report served from (possibly merged) daily counts —
    identical math to :func:`daily_burst_zscore` from the window
    down.  ``counts`` is ``(event_type, day, n)`` with exact integer
    n, mergeable by sum: the streaming state
    (``streaming.partials.daily_counts_sink``)."""
    daily = counts.select("event_type", "day",
                          F.col("n").cast("long").alias("v"))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-lookback, -1))
    stats = daily.select(
        "event_type", "day", "v",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("v").over(w).alias("s"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("ss"))
    disc = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    z = ((F.col("v") * F.col("n") - F.col("s")).cast("double")
         / F.sqrt(disc.cast("double")))
    return (stats.filter((F.col("n") >= 3) & (disc > 0))
            .select("event_type",
                    F.col("day").cast("string").alias("day"),
                    F.col("v").alias("n_events"),
                    F.round(z, 6).alias("z"),
                    F.when(F.abs(z) >= cutoff, F.lit("burst"))
                    .otherwise(F.lit("normal")).alias("flag")))


def _q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_outliers(table(spark, sf_dir, "events"))


def _q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ewma_smooth(table(spark, sf_dir, "events"))

def _q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_histogram(table(spark, sf_dir, "events"))


def _q_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_volume_anomaly(table(spark, sf_dir, "events"))


def psi_bin_counts(events: DataFrame, split_us: int = PSI_SPLIT_US,
                   n_bins: int = PSI_BINS, bin_w: float = PSI_BIN_W
                   ) -> DataFrame:
    """The PSI sufficient statistics — exact integer
    ``(event_type, cur, bin, n)`` counts.  They merge by associative
    sum, so the streaming/incremental state is this table and nothing
    else (the ngram-partials idiom); :func:`value_psi_from_counts`
    serves the report from any merged snapshot."""
    return (events
            .filter(F.col("value").isNotNull())
            .select("event_type",
                    (F.expr("ts div 1000") >= F.lit(int(split_us)))
                    .alias("cur"),
                    F.greatest(
                        F.lit(0),
                        F.least(F.floor(F.col("value")
                                        / F.lit(float(bin_w))),
                                F.lit(n_bins - 1))).cast("int")
                    .alias("bin"))
            .groupBy("event_type", "cur", "bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))


def value_psi_from_counts(counts: DataFrame,
                          n_bins: int = PSI_BINS) -> DataFrame:
    """The PSI report served from (possibly merged) bin counts —
    identical math to :func:`value_psi` from the dense grid down.

    ``counts`` feeds FOUR consumers (the type grid, the ref and cur
    splits, the totals); evaluated lazily each re-derives it from the
    corpus scan (the first-cut plan read the events parquet 7×).  It
    is control-plane-sized (≤ 2·n_bins rows per event type), so it is
    materialized once — the topv/centroid checkpoint rule."""
    counts = counts.localCheckpoint(eager=True)
    grid = (counts.select("event_type").distinct()
            .crossJoin(counts.sparkSession.range(n_bins)
                       .select(F.col("id").cast("int").alias("bin"))))
    ref = counts.filter(~F.col("cur")).select(
        "event_type", "bin", F.col("n").alias("n_ref"))
    cur = counts.filter(F.col("cur")).select(
        "event_type", "bin", F.col("n").alias("n_cur"))
    cells = (grid.join(ref, ["event_type", "bin"], "left")
             .join(cur, ["event_type", "bin"], "left")
             .select("event_type", "bin",
                     F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                     F.coalesce("n_cur", F.lit(0)).alias("n_cur")))
    tot = cells.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur"))
    p = (F.col("n_ref") + 1).cast("double") / \
        (F.col("t_ref") + n_bins).cast("double")
    q = (F.col("n_cur") + 1).cast("double") / \
        (F.col("t_cur") + n_bins).cast("double")
    return (cells.join(F.broadcast(tot), "event_type")
            .select("event_type", "t_ref", "t_cur",
                    ((p - q) * F.log(p / q)).alias("__term"))
            .groupBy("event_type")
            .agg(F.max("t_ref").cast("long").alias("n_ref"),
                 F.max("t_cur").cast("long").alias("n_cur"),
                 F.round(F.sum("__term"), 6).alias("psi")))


def _q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_psi(table(spark, sf_dir, "events"))


def _q_psi_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental twin: bin-count partials from two event_id-split
    batches merged by sum — exact integers, so the report is
    BIT-IDENTICAL to the one-shot query (oracle shared verbatim with
    events_value_psi, the dedup_incremental_idx pattern)."""
    ev = table(spark, sf_dir, "events")
    parts = psi_bin_counts(ev.filter(F.col("event_id") % 2 == 0)) \
        .unionByName(psi_bin_counts(ev.filter(F.col("event_id") % 2 == 1)))
    merged = (parts.groupBy("event_type", "cur", "bin")
              .agg(F.sum("n").cast("long").alias("n")))
    return value_psi_from_counts(merged)


DOC_PSI_BINS = 20
DOC_PSI_BIN_W = 100.0


def doc_length_psi(docs: DataFrame, n_bins: int = DOC_PSI_BINS,
                   bin_w: float = DOC_PSI_BIN_W) -> DataFrame:
    """Distribution drift of DOCUMENT LENGTH per language between the
    first and second half of arrivals (doc_id split) — the documents-
    table face of PSI (the events face is :func:`value_psi`).  A feed
    that starts emitting boilerplate stubs or concatenated pages
    moves this number long before quality gates flip.

    Same exact-integer sufficient statistics as the events PSI
    ((lang, cur, bin) counts, merge-by-sum) and the same dense-grid
    Laplace-smoothed reduction — :func:`value_psi_from_counts` is
    reused verbatim with lang standing in the type slot.  One corpus
    scan; everything after is (languages × bins)-sized.
    """
    cutoff = int(docs.agg(F.max("doc_id")).collect()[0][0]) // 2
    counts = (docs.select(
        F.col("lang").alias("event_type"),
        (F.col("doc_id") > cutoff).alias("cur"),
        F.greatest(
            F.lit(0),
            F.least(F.floor(F.col("n_chars").cast("double")
                            / F.lit(float(bin_w))),
                    F.lit(n_bins - 1))).cast("int").alias("bin"))
        .groupBy("event_type", "cur", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n")))
    return (value_psi_from_counts(counts, n_bins)
            .withColumnRenamed("event_type", "lang"))


def _q_daily_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_burst_zscore(table(spark, sf_dir, "events"))


def _q_doc_length_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_length_psi(table(spark, sf_dir, "documents"))


def _q_daily_burst_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin under the driver's oracle: two event_id-split
    micro-batches fold through ``daily_counts_sink``'s exactly-once
    pointer protocol and the burst report is served FROM the snapshot
    — bit-identical to one-shot (counts merge by exact integer sum),
    oracle shared verbatim."""
    import tempfile

    from logsqlite_spark.streaming.partials import (
        daily_counts_sink, snapshot_daily_counts)

    ev = table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="burst-stream-q-")
    sink = daily_counts_sink(root)
    sink(ev.filter(F.col("event_id") % 2 == 0), 0)
    sink(ev.filter(F.col("event_id") % 2 == 1), 1)
    return daily_burst_from_counts(snapshot_daily_counts(spark, root))


QUERIES = {
    "events_ewma": _q_ewma,
    "value_outliers": _q_outliers,
    "value_histogram": _q_histogram,
    "events_seasonal_anomaly": _q_seasonal,
    "events_value_psi": _q_psi,
    "events_value_psi_inc": _q_psi_inc,
    "events_daily_burst": _q_daily_burst,
    "doc_length_psi": _q_doc_length_psi,
    "events_daily_burst_stream": _q_daily_burst_stream,
}

_CENTS_SQL = "CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)"

ORACLES = {
    "events_value_psi": (
        "WITH e AS (SELECT event_type, "
        f"  epoch_us(ts) >= {PSI_SPLIT_US} AS cur, "
        "  CAST(greatest(0, least(floor(CAST(value AS DOUBLE) / "
        f"{PSI_BIN_W}), {PSI_BINS - 1})) AS INT) AS bin "
        "  FROM events WHERE value IS NOT NULL), "
        "c AS (SELECT event_type, cur, bin, count(*) AS n "
        "  FROM e GROUP BY 1, 2, 3), "
        "grid AS (SELECT DISTINCT event_type, g.i AS bin FROM c, "
        f"  (SELECT unnest(generate_series(0, {PSI_BINS - 1})) AS i) g), "
        "cells AS (SELECT grid.event_type, grid.bin, "
        "  COALESCE(r.n, 0) AS n_ref, COALESCE(u.n, 0) AS n_cur "
        "  FROM grid "
        "  LEFT JOIN c r ON r.event_type = grid.event_type "
        "    AND r.bin = grid.bin AND NOT r.cur "
        "  LEFT JOIN c u ON u.event_type = grid.event_type "
        "    AND u.bin = grid.bin AND u.cur), "
        "tot AS (SELECT event_type, sum(n_ref) AS t_ref, "
        "  sum(n_cur) AS t_cur FROM cells GROUP BY 1) "
        "SELECT cells.event_type, "
        "CAST(max(t_ref) AS BIGINT) AS n_ref, "
        "CAST(max(t_cur) AS BIGINT) AS n_cur, "
        "round(sum(((n_ref + 1) / CAST(t_ref + "
        f"{PSI_BINS} AS DOUBLE) - (n_cur + 1) / CAST(t_cur + "
        f"{PSI_BINS} AS DOUBLE)) * ln(((n_ref + 1) / CAST(t_ref + "
        f"{PSI_BINS} AS DOUBLE)) / ((n_cur + 1) / CAST(t_cur + "
        f"{PSI_BINS} AS DOUBLE)))), 6) AS psi "
        "FROM cells JOIN tot USING (event_type) GROUP BY 1"
    ),
    # dow spellings differ across engines (Spark 1-7 vs DuckDB 0-6)
    # but dow is only a JOIN key with identical equivalence classes,
    # never an output column
    "events_seasonal_anomaly": (
        "WITH h AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, "
        "dayofweek(ts) AS dow, hour(ts) AS hour, count(*) AS n "
        "FROM events GROUP BY 1, 2, 3), "
        "b AS (SELECT dow, hour, sum(n) AS total, count(*) AS cells "
        "FROM h GROUP BY dow, hour) "
        "SELECT day, CAST(hour AS INT) AS hour, CAST(n AS BIGINT) AS n, "
        "CAST((total * 1000) // cells AS BIGINT) AS expected_milli, "
        f"CASE WHEN n * cells > {SEASONAL_FACTOR} * total THEN 'spike' "
        f"WHEN n * cells * {SEASONAL_FACTOR} < total THEN 'drop' "
        "ELSE 'normal' END AS flag "
        "FROM h JOIN b USING (dow, hour)"
    ),
    "events_ewma": _ewma_sql(),
    "value_outliers": (
        f"WITH ev AS (SELECT event_id, user_id, {_CENTS_SQL} AS v FROM events), "
        "st AS (SELECT event_id, user_id, v, "
        "  count(*) OVER (PARTITION BY user_id) AS n, "
        "  sum(v) OVER (PARTITION BY user_id) AS s, "
        "  sum(v * v) OVER (PARTITION BY user_id) AS ss FROM ev) "
        "SELECT event_id, user_id, v AS value_c, "
        "round(CAST(v * n - s AS DOUBLE) / sqrt(CAST(n * ss - s * s AS DOUBLE)), 6) AS z "
        "FROM st WHERE n * ss - s * s > 0 "
        "AND abs(CAST(v * n - s AS DOUBLE) / sqrt(CAST(n * ss - s * s AS DOUBLE))) "
        f">= {Z_CUTOFF!r}"
    ),
    "value_histogram": (
        f"WITH ev AS (SELECT event_type, "
        f"CAST(floor({_CENTS_SQL} / {BIN_WIDTH_C}) AS BIGINT) AS bin FROM events) "
        f"SELECT event_type, bin, CAST(bin * {BIN_WIDTH_C} AS BIGINT) AS bin_lo_c, "
        "count(*) AS n FROM ev GROUP BY event_type, bin"
    ),
}

# the incremental twin's counts merge by exact integer sum, so its
# report is bit-identical to the one-shot query — oracle shared
# verbatim (the dedup_incremental_idx pattern)
ORACLES["events_value_psi_inc"] = ORACLES["events_value_psi"]

_DOC_P = f"(CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + {DOC_PSI_BINS} AS DOUBLE))"
_DOC_Q = f"(CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + {DOC_PSI_BINS} AS DOUBLE))"
ORACLES["doc_length_psi"] = (
    "WITH mx AS (SELECT max(doc_id) // 2 AS cut FROM documents), "
    "c AS (SELECT lang, doc_id > (SELECT cut FROM mx) AS cur, "
    "  CAST(greatest(0, least(floor(CAST(n_chars AS DOUBLE) / "
    f"{DOC_PSI_BIN_W}), {DOC_PSI_BINS - 1})) AS INT) AS bin, "
    "  CAST(count(*) AS BIGINT) AS n "
    "  FROM documents GROUP BY 1, 2, 3), "
    "grid AS (SELECT DISTINCT lang FROM c), "
    f"bins AS (SELECT CAST(k AS INT) AS bin "
    f"  FROM generate_series(0, {DOC_PSI_BINS - 1}) t(k)), "
    "cells AS (SELECT g.lang, b.bin, "
    "  coalesce(r.n, 0) AS n_ref, coalesce(u.n, 0) AS n_cur "
    "  FROM grid g CROSS JOIN bins b "
    "  LEFT JOIN c r ON r.lang = g.lang AND r.bin = b.bin "
    "    AND NOT r.cur "
    "  LEFT JOIN c u ON u.lang = g.lang AND u.bin = b.bin AND u.cur), "
    "tot AS (SELECT lang, sum(n_ref) AS t_ref, sum(n_cur) AS t_cur "
    "  FROM cells GROUP BY 1) "
    "SELECT cells.lang, CAST(max(t_ref) AS BIGINT) AS n_ref, "
    "CAST(max(t_cur) AS BIGINT) AS n_cur, "
    f"round(sum(({_DOC_P} - {_DOC_Q}) * ln({_DOC_P} / {_DOC_Q})), 6) "
    "AS psi "
    "FROM cells JOIN tot USING (lang) GROUP BY cells.lang"
)

ORACLES["events_daily_burst"] = (
    "WITH daily AS (SELECT event_type, "
    "  CAST(epoch_ms(epoch_us(ts) // 1000) AS DATE) AS day, "
    "  CAST(count(*) AS BIGINT) AS v "
    "  FROM events GROUP BY 1, 2), "
    "st AS (SELECT event_type, day, v, "
    f"  count(*) OVER w AS n, sum(v) OVER w AS s, "
    f"  sum(v * v) OVER w AS ss FROM daily "
    f"  WINDOW w AS (PARTITION BY event_type ORDER BY day "
    f"    ROWS BETWEEN {BURST_LOOKBACK} PRECEDING AND 1 PRECEDING)) "
    "SELECT event_type, CAST(day AS VARCHAR) AS day, v AS n_events, "
    "round(CAST(v * n - s AS DOUBLE) "
    "  / sqrt(CAST(n * ss - s * s AS DOUBLE)), 6) AS z, "
    f"CASE WHEN abs(CAST(v * n - s AS DOUBLE) "
    f"  / sqrt(CAST(n * ss - s * s AS DOUBLE))) >= {BURST_CUTOFF} "
    "  THEN 'burst' ELSE 'normal' END AS flag "
    "FROM st WHERE n >= 3 AND n * ss - s * s > 0"
)

# the stream twin's counts merge by exact integer sum: report is
# bit-identical, oracle shared verbatim
ORACLES["events_daily_burst_stream"] = ORACLES["events_daily_burst"]
