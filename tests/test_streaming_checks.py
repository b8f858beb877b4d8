"""Streaming per-window quality metrics (streaming/windows.py).

Null counts are exact; the uniqueness estimate is an HLL sketch, so
the streaming result must be IDENTICAL to the batch twin over the
same rows regardless of micro-batch boundaries (register-max merge)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logsqlite_spark.streaming.windows import windowed_quality_metrics

BASE = 1_704_067_200
M = 1_000_000


def _write(spark, path, rows):
    df = spark.createDataFrame(
        rows, "user_id long, value double, ts_us long"
    ).withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")
    df.coalesce(1).write.mode("append").parquet(path)


def test_streaming_quality_metrics_equal_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    # two windows; dup user ids and nulls split across files so
    # micro-batch cuts cross both
    f1 = [(u % 7, float(u) if u % 5 else None, (BASE + u) * M)
          for u in range(40)]
    f2 = [(u % 11, None if u % 4 == 0 else 1.5, (BASE + 300 + u) * M)
          for u in range(30)]
    _write(spark, src, f1)
    _write(spark, src, f2)

    stream = (spark.readStream
              .schema("user_id long, value double, ts timestamp")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (windowed_quality_metrics(stream, window="5 minutes",
                                  watermark="1 minute")
         .writeStream.format("memory").queryName("qm_win")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = {r["window_start"].isoformat(): r
               for r in spark.sql("select * from qm_win").collect()}
    finally:
        q.stop()

    batch = spark.read.parquet(src)
    want = {
        r["w"]["start"].isoformat(): r
        for r in (batch.groupBy(F.window("ts", "5 minutes").alias("w"))
                  .agg(F.count(F.lit(1)).cast("long").alias("n"),
                       F.count(F.when(F.col("value").isNull(), 1))
                       .cast("long").alias("n_null_value"),
                       F.hll_sketch_estimate(
                           F.hll_sketch_agg("user_id", F.lit(12)))
                       .cast("long").alias("est"))
                  .collect())
    }
    assert set(got) == set(want) and len(got) == 2
    for w, b in want.items():
        s = got[w]
        assert (s["n"], s["n_null_value"], s["est_distinct_ids"]) == \
            (b["n"], b["n_null_value"], b["est"]), w
