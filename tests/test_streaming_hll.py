"""Streaming windowed HLL distinct sketches (streaming/windows.py).

Pins the property the operator's docstring claims: sketch merging is
order-independent, so the streaming estimate over N micro-batches is
IDENTICAL to a batch sketch over the same rows — not merely close.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logsqlite_spark.streaming.windows import windowed_distinct_sketch

BASE = 1_704_067_200  # 2024-01-01T00:00:00Z seconds
M = 1_000_000


def _write(spark, path, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts_us long"
    ).withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")
    df.coalesce(1).write.mode("append").parquet(path)


def test_streaming_sketch_equals_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    # two 5-minute windows; users overlap across files so micro-batch
    # boundaries cut through windows AND through duplicate ids
    f1 = [(u, (BASE + 10 * u) * M) for u in range(1, 12)]
    f2 = [(u, (BASE + 10 * u + 5) * M) for u in range(1, 12)]  # dups
    f3 = [(100 + u, (BASE + 300 + u) * M) for u in range(8)]
    _write(spark, src, f1)
    _write(spark, src, f2)
    _write(spark, src, f3)

    stream = (
        spark.readStream
        .schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (windowed_distinct_sketch(stream, window="5 minutes",
                                  watermark="1 minute")
         .drop("sketch")
         .writeStream.format("memory").queryName("hll_win")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = {(r["window_start"].isoformat(), r["est_distinct"])
               for r in spark.sql("select * from hll_win").collect()}
    finally:
        q.stop()

    batch = spark.read.parquet(src)
    want = {
        (r["w"]["start"].isoformat(), r["est"])
        for r in (
            batch.groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("s"))
            .select("w", F.hll_sketch_estimate("s").cast("long")
                    .alias("est"))
            .collect())
    }
    assert got == want and len(got) == 2
