"""Streaming EWMA ≡ batch EWMA: state resumes across micro-batches."""

import time

from pyspark.sql import functions as F

from logsqlite_spark.operators.anomaly import ewma_smooth
from logsqlite_spark.streaming.stateful import streaming_ewma

BASE = 1_704_067_200  # 2024-01-01T00:00:00Z seconds
M = 1_000_000


def _write(spark, path, rows):
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, value_c long"
    ).withColumn("ts", F.timestamp_micros("ts_us"))
    df.coalesce(1).write.mode("append").parquet(path)


def test_streaming_ewma_matches_batch_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    # batch 1: three events for u1, one for u2
    b1 = [(1, 1, (BASE + 1) * M, 100), (1, 2, (BASE + 2) * M, 300),
          (1, 3, (BASE + 3) * M, 500), (2, 4, (BASE + 1) * M, 700)]
    # batch 2 continues both keys — state must carry over
    b2 = [(1, 5, (BASE + 10) * M, 900), (2, 6, (BASE + 11) * M, 100)]
    _write(spark, src, b1)
    _write(spark, src, b2)

    stream = (spark.readStream
              .schema("user_id long, event_id long, ts_us long, "
                      "value_c long, ts timestamp")
              .option("maxFilesPerTrigger", "1")
              .parquet(src))
    name = f"sewma_{int(time.time() * 1000)}"
    q = (streaming_ewma(stream).writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
        got = {r["event_id"]: r["ewma_c"] for r in
               spark.sql(f"SELECT * FROM {name}").collect()}
    finally:
        q.stop()

    # batch twin over the concatenated input (same ts/event_id order)
    events = spark.createDataFrame(
        b1 + b2, "user_id long, event_id long, ts_us long, value_c long"
    ).withColumn("ts", F.timestamp_micros("ts_us") .cast("timestamp"))
    # ewma_smooth reads (ts div 1000) nanos->us; feed it the same µs
    batch_in = events.select(
        "event_id", F.col("user_id"),
        (F.col("ts_us") * 1000).alias("ts"),  # ts in nanos for ts div 1000
        (F.col("value_c").cast("double") / 100).alias("value"),
    )
    batch = {r["event_id"]: r["ewma_c"] for r in
             ewma_smooth(batch_in).collect()}
    assert got == batch and len(got) == 6
