"""Streaming dedup (dropDuplicatesWithinWatermark) semantics."""

import time

import pytest
from pyspark.sql import functions as F

from logsqlite_spark.streaming.dedup import streaming_dedup_exact

BASE = 1_704_067_200  # 2024-01-01T00:00:00Z seconds
M = 1_000_000


def _write(spark, path, rows):
    df = spark.createDataFrame(
        rows, "container_id string, line string, ts_us long"
    ).withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")
    df.coalesce(1).write.mode("append").parquet(path)


def _run(spark, src, name):
    stream = (
        spark.readStream
        .schema("container_id string, line string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    deduped = streaming_dedup_exact(stream)
    return (deduped.writeStream.outputMode("append").format("memory")
            .queryName(name).start())


def test_redelivery_within_watermark_is_dropped(spark, tmp_path):
    src = str(tmp_path / "in")
    _write(spark, src, [("c1", "a\n", BASE * M), ("c1", "b\n", BASE * M + 1)])
    # same lines re-delivered 5s later (inside the 10m watermark),
    # plus one genuinely new line
    _write(spark, src, [("c1", "a\n", (BASE + 5) * M),
                        ("c1", "b\n", (BASE + 5) * M),
                        ("c1", "c\n", (BASE + 5) * M)])
    name = f"sdedup_{int(time.time() * 1000)}"
    q = _run(spark, src, name)
    try:
        q.processAllAvailable()
        got = sorted(r["line"] for r in
                     spark.sql(f"SELECT line FROM {name}").collect())
    finally:
        q.stop()
    assert got == ["a\n", "b\n", "c\n"]


def test_same_line_other_container_survives(spark, tmp_path):
    src = str(tmp_path / "in2")
    _write(spark, src, [("c1", "x\n", BASE * M), ("c2", "x\n", BASE * M)])
    name = f"sdedup_{int(time.time() * 1000)}"
    q = _run(spark, src, name)
    try:
        q.processAllAvailable()
        got = sorted((r["container_id"], r["line"]) for r in
                     spark.sql(f"SELECT * FROM {name}").collect())
    finally:
        q.stop()
    assert got == [("c1", "x\n"), ("c2", "x\n")]


def test_custom_key_cols(spark, tmp_path):
    src = str(tmp_path / "in3")
    _write(spark, src, [("c1", "p\n", BASE * M),
                        ("c1", "q\n", BASE * M + 1),
                        ("c1", "r\n", BASE * M + 2)])
    name = f"sdedup_{int(time.time() * 1000)}"
    stream = (
        spark.readStream
        .schema("container_id string, line string, ts timestamp")
        .parquet(src)
    )
    # dedup on container only: one row per container survives the window
    deduped = streaming_dedup_exact(stream, key_cols=["container_id"])
    q = (deduped.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
        n = spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0]["n"]
    finally:
        q.stop()
    assert n == 1
