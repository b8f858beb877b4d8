"""Streaming windowed Theta sketches (streaming/windows.py).

Pins the two contracts: (a) streaming estimates equal a batch theta
pass over the same rows regardless of micro-batch boundaries; (b) the
EMITTED sketches stay operable — intersecting consecutive windows'
sketches yields the exact returning-user count (exact mode), the
downstream computation HLL window sketches cannot do."""

from __future__ import annotations

from pyspark.sql import functions as F

from logsqlite_spark.streaming.windows import windowed_user_theta

BASE = 1_704_067_200
M = 1_000_000


def _write(spark, path, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts_us long"
    ).withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")
    df.coalesce(1).write.mode("append").parquet(path)


def test_streaming_theta_equals_batch_and_intersects(spark, tmp_path):
    src = str(tmp_path / "in")
    # window 1: users 1..11; window 2: users 8..19 (overlap 8..11),
    # duplicates split across files so micro-batch cuts cross windows
    f1 = [(u, (BASE + 10 * u) * M) for u in range(1, 12)]
    f2 = [(u, (BASE + 10 * u + 5) * M) for u in range(1, 12)]
    f3 = [(u, (BASE + 300 + u) * M) for u in range(8, 20)]
    for f in (f1, f2, f3):
        _write(spark, src, f)

    stream = (spark.readStream
              .schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (windowed_user_theta(stream, window="5 minutes",
                             watermark="1 minute")
         .writeStream.format("memory").queryName("theta_win")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "select * from theta_win order by window_start").collect()
    finally:
        q.stop()

    assert len(rows) == 2
    assert rows[0]["est_distinct"] == 11
    assert rows[1]["est_distinct"] == 12

    # batch parity on the same rows
    batch = (spark.read.parquet(src)
             .groupBy(F.window("ts", "5 minutes").alias("w"))
             .agg(F.theta_sketch_estimate(
                 F.theta_sketch_agg("user_id", F.lit(12)))
                 .cast("long").alias("est"))
             .orderBy("w.start").collect())
    assert [r["est"] for r in batch] == [11, 12]

    # the emitted sketches intersect: returning users across the two
    # windows == |{8..11}| = 4, computed WITHOUT touching the stream
    sk = spark.createDataFrame(
        [(rows[0]["sketch"],), (rows[1]["sketch"],)], "s binary")
    pair = sk.agg(F.collect_list("s").alias("ss")).select(
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("ss")[0], F.col("ss")[1]))
        .cast("long").alias("returning")).collect()[0]
    assert pair["returning"] == 4
