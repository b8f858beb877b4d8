"""Custom stateful streaming operator (applyInPandasWithState sessions)."""

import time

import pytest
from pyspark.sql import functions as F

from logsqlite_spark.streaming.stateful import streaming_sessionize

BASE = 1_704_067_200  # 2024-01-01T00:00:00Z seconds

def _write_rows(spark, path, rows, mode="append"):
    df = spark.createDataFrame(rows, "container_id string, ts_us long") \
        .withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")
    df.coalesce(1).write.mode(mode).parquet(path)
    return df.schema

def test_streaming_sessions_close_on_gap(spark, tmp_path):
    src = str(tmp_path / "in")
    M = 1_000_000
    # session 1: three events 10s apart; then a 2h gap; session 2: one event
    rows1 = [("c1", (BASE + i * 10) * M) for i in range(3)]
    rows2 = [("c1", (BASE + 7200) * M)]
    # a much later row pushes the watermark far enough to time out session 2
    rows3 = [("c1", (BASE + 50_000) * M)]
    _write_rows(spark, src, rows1)

    stream = spark.readStream.schema("container_id string, ts timestamp") \
        .option("maxFilesPerTrigger", "1").parquet(src)
    sessions = streaming_sessionize(stream, gap_s=1800, watermark="1 minute")
    name = f"sess_{int(time.time()*1000)}"
    q = (sessions.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
        _write_rows(spark, src, rows2)
        q.processAllAvailable()
        _write_rows(spark, src, rows3)
        q.processAllAvailable()
        got = [(r["session_start"], r["session_end"], r["n_events"])
               for r in spark.sql(
                   f"SELECT * FROM {name} ORDER BY session_start").collect()]
    finally:
        q.stop()
    # session 1 closed by the 2h-later event; session 2 closed by timeout
    assert (BASE * M, (BASE + 20) * M, 3) == got[0]
    assert got[1][0] == (BASE + 7200) * M and got[1][2] == 1

def test_streaming_sessions_merge_late_arrivals(spark, tmp_path):
    src = str(tmp_path / "in")
    M = 1_000_000
    _write_rows(spark, src, [("c1", (BASE + 100) * M)])
    stream = spark.readStream.schema("container_id string, ts timestamp") \
        .option("maxFilesPerTrigger", "1").parquet(src)
    sessions = streaming_sessionize(stream, gap_s=1800, watermark="2 hours")
    name = f"late_{int(time.time()*1000)}"
    q = (sessions.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
        # late event BEFORE the open session's start, within the gap
        _write_rows(spark, src, [("c1", BASE * M)])
        q.processAllAvailable()
        # far-future event closes the (merged) session
        _write_rows(spark, src, [("c1", (BASE + 50_000) * M)])
        q.processAllAvailable()
        got = [(r["session_start"], r["session_end"], r["n_events"])
               for r in spark.sql(
                   f"SELECT * FROM {name} ORDER BY session_start").collect()]
    finally:
        q.stop()
    assert got[0] == (BASE * M, (BASE + 100) * M, 2)
