"""Event-time windowed aggregation with watermarks (extension, §2.8).

Absent from the reference (it orders by arrival and serves raw rows),
but the natural next query a log-analytics user asks — error rates per
minute, container activity rollups — and the canonical Structured
Streaming pattern: event-time tumbling/sliding windows + watermark for
bounded state under late data.

At scale the state store holds one row per (window, key) — watermark
expiry is what keeps that bounded over an unbounded stream; without it
state grows forever. Window length and watermark delay are the only
tuning knobs a 1000-executor deployment needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def windowed_counts(
    stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("container_id",),
) -> DataFrame:
    """Tumbling (or sliding) per-key event counts with late-data bound.

    ``ts_col`` must be a real timestamp column (the logs table's ``ts``,
    derived from ts_nanos at ingest).
    """
    win = (F.window(ts_col, window, slide) if slide
           else F.window(ts_col, window))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n",
        )
    )

def streaming_dedup(stream: DataFrame, keys: list[str],
                    ts_col: str = "ts",
                    watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key only as long as
    the watermark can still admit a duplicate — state is bounded by
    (arrival rate x watermark), not by history. The streaming twin of
    X1 exact dedup."""
    return (
        stream.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )

def rank_topk(counts: DataFrame, k: int = 3,
              key: str = "event_type") -> DataFrame:
    """Rank finalized (window, key, n) rows to the top-k per window.

    Deterministic tie-break on the key. WindowGroupLimit keeps this a
    partial top-k per partition before the (tiny, one-row-per-window-
    key) shuffle.
    """
    from pyspark.sql.window import Window as W

    w = W.partitionBy("window_start", "window_end").orderBy(
        F.col("n").desc(), F.col(key))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )

def start_windowed_topk(stream: DataFrame, out_path: str,
                        checkpoint: str, k: int = 3,
                        window: str = "5 minutes",
                        watermark: str = "10 minutes",
                        ts_col: str = "ts",
                        key: str = "event_type"):
    """Streaming per-window top-k keys by count.

    Structured Streaming cannot rank inside a streaming aggregation,
    so this composes the two legal pieces: a watermarked windowed
    count in *append* mode — rows for a window are emitted exactly
    once, together, when the watermark passes window end — and a
    per-micro-batch ``rank_topk`` inside ``foreachBatch``. Because a
    window's counts finalize atomically in one batch, the per-batch
    ranking is globally correct; no cross-batch state is needed beyond
    what the windowed aggregation already keeps (one row per live
    window × key, watermark-bounded).

    At 100 TB/day the shuffle per batch carries only the finalized
    windows' count rows; the top-k rank partitions by window — a few
    thousand rows, never the stream.
    """
    counts = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), key, "n")
    )

    def _emit(batch: DataFrame, _bid: int) -> None:
        topk = rank_topk(batch, k, key)
        if not topk.isEmpty():
            topk.write.mode("append").parquet(out_path)

    return (
        counts.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_emit)
        .start()
    )

def windowed_distinct_sketch(stream: DataFrame,
                             id_col: str = "user_id",
                             window: str = "5 minutes",
                             watermark: str = "10 minutes",
                             ts_col: str = "ts",
                             lg_k: int = 12) -> DataFrame:
    """Distinct-``id_col`` estimate per event-time window via HLL
    sketches — the streaming twin of
    ``analytics.distinct_users_hll_rollup``.

    An exact streaming countDistinct would keep every id seen per
    live window in the state store (state grows with cardinality —
    exactly what kills unbounded streams); the sketch aggregation
    keeps a fixed 2^lg_k-register buffer per window instead, and
    Datasketches merging is order-independent, so estimates are
    IDENTICAL to the batch rollup over the same rows regardless of
    micro-batch boundaries (pinned in ``test_streaming_hll.py``).
    Emitted sketches stay mergeable downstream: coarser grains come
    from ``hll_union_agg`` over this output, never from re-reading
    the stream.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(F.hll_sketch_agg(id_col, F.lit(lg_k)).alias("sketch"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "sketch",
                F.hll_sketch_estimate("sketch").cast("long")
                .alias("est_distinct"))
    )


def windowed_value_quantile_sketch(stream: DataFrame,
                                   value_col: str = "value_c",
                                   window: str = "5 minutes",
                                   watermark: str = "10 minutes",
                                   ts_col: str = "ts",
                                   k: int = 200) -> DataFrame:
    """Value percentiles per event-time window via KLL sketches — the
    streaming twin of ``operators.sketches.value_quantile_rollup``.

    Exact streaming percentiles would buffer every value per live
    window in the state store; the KLL aggregation keeps an
    O(k·log n)-item sketch instead. Unlike HLL's register-max merge,
    KLL compaction is randomized, so the streaming estimate is not
    bit-identical to a batch pass over the same rows — but it carries
    the same normalized rank-error guarantee, which is what
    ``test_streaming_kll.py`` pins (vs exact per-window quantiles).
    Emitted sketches stay mergeable downstream: coarser grains come
    from ``kll_merge_agg_bigint`` over this output, never from
    re-reading the stream.
    """
    from logsqlite_spark.operators.sketches import _kll_quantiles
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(F.kll_sketch_agg_bigint(value_col, F.lit(k)).alias("sketch"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "sketch",
                F.kll_sketch_get_n_bigint("sketch").cast("long").alias("n"),
                *_kll_quantiles(F.col("sketch")))
    )


def windowed_topk_sketch(stream: DataFrame,
                         item_col: str = "event_type",
                         window: str = "5 minutes",
                         watermark: str = "10 minutes",
                         ts_col: str = "ts",
                         k: int = 32,
                         max_tracked: int = 64) -> DataFrame:
    """Heavy hitters per event-time window via frequent-items
    sketches — the streaming twin of
    ``operators.sketches.type_topk_rollup``, completing the streaming
    side of the four-family tier.

    An exact streaming per-window top-k keeps one counter per
    DISTINCT value in the state store (``streaming_window_topk`` does
    exactly that, fine for bounded key domains); this keeps a fixed
    ``max_tracked``-slot sketch per live window instead, the shape
    that survives unbounded item domains. Below capacity the sketch
    never evicts, so emitted counts are identical to a batch pass
    over the same rows regardless of micro-batch boundaries (the
    register-max argument HLL uses — pinned in
    ``test_streaming_topk.py``); above capacity estimates carry the
    ItemsSketch error bound. The emitted sketch column stays
    mergeable downstream via ``approx_top_k_combine`` (repartition(1)
    the tiny sketch table first — combine's partial buffer cannot
    serialize from an empty partition; see ``type_topk_rollup``).
    """
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(F.expr(f"approx_top_k_accumulate({item_col}, {max_tracked})")
             .alias("sketch"))
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "sketch",
        F.expr(f"approx_top_k_estimate(sketch, {k})").alias("topk"))


def windowed_quality_metrics(stream: DataFrame,
                             id_col: str = "user_id",
                             check_cols: tuple[str, ...] = ("value",),
                             window: str = "5 minutes",
                             watermark: str = "10 minutes",
                             ts_col: str = "ts",
                             lg_k: int = 12) -> DataFrame:
    """Streaming data-quality monitoring: the per-window counterpart
    of ``operators.checks.run_checks`` — row counts, per-column null
    counts, and an approximate uniqueness ratio for ``id_col``.

    Exact uniqueness needs count-distinct, which in streaming state
    is cardinality-sized; the HLL sketch keeps it fixed-size and
    order-independent (estimates identical to a batch pass over the
    same rows, same argument as ``windowed_distinct_sketch``). Null
    ratios are plain conditional aggregates — exact. This is the
    shape a pipeline alerts on: a window whose null ratio jumps or
    whose id uniqueness collapses is quarantined before publication.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("n"),
            F.hll_sketch_agg(id_col, F.lit(lg_k)).alias("_sk")]
    for c in check_cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1))
                    .cast("long").alias(f"n_null_{c}"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(*aggs)
        .withColumn("est_distinct_ids",
                    F.hll_sketch_estimate("_sk").cast("long"))
        .drop("_sk")
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "*")
        .drop("w")
    )


def windowed_user_theta(stream: DataFrame,
                        id_col: str = "user_id",
                        window: str = "5 minutes",
                        watermark: str = "10 minutes",
                        ts_col: str = "ts",
                        lg_k: int = 12) -> DataFrame:
    """Per-window Theta sketches of the distinct-id set — like
    ``windowed_distinct_sketch`` but the emitted sketches support
    INTERSECTION and DIFFERENCE downstream: window-over-window
    returning/new/churned users (``operators.sketches
    .retention_overlap``'s streaming feed) come from pairwise sketch
    ops over this output table, never from replaying the stream.
    State per live window is at most 2^lg_k retained hashes; theta
    merging is order-independent, so estimates equal a batch pass
    over the same rows (exact below 2^lg_k distinct — pinned in
    ``test_streaming_theta.py``)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(F.theta_sketch_agg(id_col, F.lit(lg_k)).alias("sketch"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "sketch",
                F.theta_sketch_estimate("sketch").cast("long")
                .alias("est_distinct"))
    )


def run_windowed_batch(logs: DataFrame, window: str = "1 hour",
                       keys: tuple[str, ...] = ("container_id",)) -> DataFrame:
    """Same rollup over the batch table (streaming/batch unification:
    one definition, two execution modes)."""
    return (
        logs.groupBy(F.window("ts", window).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), *keys, "n")
    )
