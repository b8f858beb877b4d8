"""Streaming per-window top-k: append-mode finalization + batch rank.

Pins the two properties the operator depends on: (1) a window's
counts are emitted exactly once, together, after the watermark passes
— so the per-batch ranking is globally correct; (2) the streaming
result equals the batch twin on finalized windows.
"""

import time

from pyspark.sql import functions as F

from logsqlite_spark.streaming.windows import rank_topk, start_windowed_topk

BASE = 1_704_067_200  # 2024-01-01T00:00:00Z seconds
M = 1_000_000


def _write(spark, path, rows):
    df = spark.createDataFrame(
        rows, "event_type string, ts_us long"
    ).withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")
    df.coalesce(1).write.mode("append").parquet(path)


def test_streaming_topk_matches_batch_on_finalized_windows(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # window 1 [00:00, 05:00): a=3 b=2 c=1 ; window 2 [05:00, 10:00): b=2 a=1
    w1 = [("a", (BASE + s) * M) for s in (10, 20, 30)] + \
         [("b", (BASE + s) * M) for s in (40, 50)] + \
         [("c", (BASE + 60) * M)]
    w2 = [("b", (BASE + 310) * M), ("b", (BASE + 320) * M),
          ("a", (BASE + 330) * M)]
    _write(spark, src, w1 + w2)
    # late sentinel 30 min on: advances the watermark past both windows
    _write(spark, src, [("z", (BASE + 1800) * M)])

    stream = (
        spark.readStream
        .schema("event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = start_windowed_topk(stream, out, ckpt, k=2,
                            window="5 minutes", watermark="1 minute")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r["window_start"].strftime("%H:%M"), r["event_type"], r["n"], r["rank"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        ("00:00", "a", 3, 1), ("00:00", "b", 2, 2),
        ("00:05", "a", 1, 2), ("00:05", "b", 2, 1),
    ]

    # batch twin over the same input, restricted to finalized windows
    batch_counts = (
        spark.read.parquet(src)
        .filter(F.col("ts") < F.timestamp_seconds(F.lit(BASE + 600)))
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "event_type", "n")
    )
    batch = sorted(
        (r["window_start"].strftime("%H:%M"), r["event_type"], r["n"], r["rank"])
        for r in rank_topk(batch_counts, 2).collect()
    )
    assert batch == got


def test_unfinalized_window_not_emitted(spark, tmp_path):
    src = str(tmp_path / "in2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    _write(spark, src, [("a", BASE * M), ("a", (BASE + 1) * M)])

    stream = (
        spark.readStream
        .schema("event_type string, ts timestamp")
        .parquet(src)
    )
    q = start_windowed_topk(stream, out, ckpt, k=1,
                            window="5 minutes", watermark="1 minute")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # watermark never passed the window end -> nothing finalized
    import os
    emitted = [f for f in os.listdir(out)] if os.path.isdir(out) else []
    assert not any(f.endswith(".parquet") for f in emitted)


def test_windowed_topk_sketch_matches_batch(spark, tmp_path):
    """Frequent-items streaming twin: per-window sketch counts over
    micro-batched input equal a batch pass over the same rows (below
    tracking capacity the sketch never evicts), and the emitted
    sketch column merges across windows via approx_top_k_combine."""
    from logsqlite_spark.streaming.windows import windowed_topk_sketch

    src = str(tmp_path / "in_fi")
    out = str(tmp_path / "out_fi")
    ckpt = str(tmp_path / "ckpt_fi")
    w1 = [("a", (BASE + s) * M) for s in (10, 20, 30)] + \
         [("b", (BASE + s) * M) for s in (40, 50)]
    w2 = [("b", (BASE + 310) * M), ("c", (BASE + 320) * M)]
    _write(spark, src, w1)
    _write(spark, src, w2)
    _write(spark, src, [("z", (BASE + 1800) * M)])

    stream = (
        spark.readStream
        .schema("event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (windowed_topk_sketch(stream, window="5 minutes",
                              watermark="1 minute")
         .writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .format("parquet").option("path", out).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(out).collect()
    got = {
        r["window_start"].strftime("%H:%M"):
            {e["item"]: e["count"] for e in r["topk"]}
        for r in rows
    }
    assert got["00:00"] == {"a": 3, "b": 2}
    assert got["00:05"] == {"b": 1, "c": 1}

    # downstream merge of the emitted sketches: overall counts
    # repartition(1): combine's partial buffer cannot serialize from
    # an empty partition (see type_topk_rollup) — the sketch table is
    # a handful of rows
    merged = (spark.read.parquet(out).repartition(1)
              .agg(F.expr("approx_top_k_estimate("
                          "approx_top_k_combine(sketch, 64), 32)")
                   .alias("e")).collect()[0]["e"])
    assert {x["item"]: x["count"] for x in merged} == \
        {"a": 3, "b": 3, "c": 1}
