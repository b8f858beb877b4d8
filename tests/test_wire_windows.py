"""Wire-frame emit (S3/S8) + streaming event-time windows."""

import time

import pytest
from pyspark.sql import functions as F

from logsqlite_spark.operators.wire import stream_wire_frames, to_wire_frames
from logsqlite_spark.sources.frames import decode_frames
from logsqlite_spark.streaming.windows import run_windowed_batch, windowed_counts

@pytest.fixture()
def typed_logs(spark):
    rows = [
        (1, 1_000_000_000, "stdout", "hello\n", False, None, "c1"),
        (2, 2_000_000_000, "stderr", "oops\n", True, (False, "p1", 1), "c1"),
        (3, 3_000_000_000, "stdout", "bye\n", False, None, "c2"),
    ]
    return spark.createDataFrame(
        rows,
        "seq long, ts_nanos long, source string, line string, "
        "partial boolean, partial_meta struct<last:boolean,id:string,ordinal:int>, "
        "container_id string",
    )

def test_wire_roundtrip(typed_logs):
    out = {r["seq"]: r["frame"] for r in to_wire_frames(typed_logs).collect()}
    assert len(out) == 3
    [e1] = list(decode_frames(bytes(out[1])))
    assert e1.source == "stdout"
    assert e1.line == b"hello\n"
    assert e1.time_nano == 1_000_000_000
    [e2] = list(decode_frames(bytes(out[2])))
    assert e2.partial is True
    assert e2.partial_meta.id == "p1"
    assert e2.partial_meta.ordinal == 1

def test_wire_stream_ordered(typed_logs):
    seqs = [r["seq"] for r in stream_wire_frames(typed_logs)]
    assert seqs == [1, 2, 3]

def test_windowed_batch_rollup(spark):
    base = 1_704_067_200  # 2024-01-01T00:00:00Z
    rows = [(i, (base + i * 1200) * 10**9, "c%d" % (i % 2)) for i in range(6)]
    logs = spark.createDataFrame(rows, "seq long, ts_nanos long, container_id string") \
        .withColumn("ts", F.timestamp_micros(F.expr("ts_nanos div 1000")))
    out = run_windowed_batch(logs, window="1 hour")
    got = {(r["window_start"].isoformat(), r["container_id"]): r["n"]
           for r in out.collect()}
    # rows at 0,20,40 min (hour 0) and 60,80,100 min (hour 1), per parity
    assert got[("2024-01-01T00:00:00", "c0")] == 2
    assert got[("2024-01-01T00:00:00", "c1")] == 1
    assert got[("2024-01-01T01:00:00", "c0")] == 1
    assert got[("2024-01-01T01:00:00", "c1")] == 2

def test_streaming_dedup_within_watermark(spark, tmp_path):
    from logsqlite_spark.streaming.windows import streaming_dedup

    src = str(tmp_path / "din")
    base = 1_704_067_200
    rows = [(1, "a", base), (2, "b", base + 60), (3, "a", base + 120)]
    df = spark.createDataFrame(rows, "seq long, k string, t long") \
        .withColumn("ts", F.timestamp_micros(F.expr("t * 1000000"))).drop("t")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    deduped = streaming_dedup(stream, ["k"], watermark="1 hour")
    name = f"dd_{int(time.time()*1000)}"
    q = (deduped.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
        ks = sorted(r["k"] for r in spark.sql(f"SELECT * FROM {name}").collect())
    finally:
        q.stop()
    assert ks == ["a", "b"]  # duplicate 'a' within the watermark dropped

def test_windowed_stream_with_watermark(spark, tmp_path):
    src = str(tmp_path / "in")
    base = 1_704_067_200
    rows = [(i, (base + i * 60) * 10**9, "c1") for i in range(5)]
    df = spark.createDataFrame(rows, "seq long, ts_nanos long, container_id string") \
        .withColumn("ts", F.timestamp_micros(F.expr("ts_nanos div 1000")))
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    agg = windowed_counts(stream, window="2 minutes", watermark="5 minutes")
    name = f"win_{int(time.time()*1000)}"
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
        got = {r["window_start"].isoformat(): r["n"]
               for r in spark.sql(f"SELECT * FROM {name}").collect()}
    finally:
        q.stop()
    # 5 events one minute apart -> 2-minute tumbling windows of 2,2,1
    assert got == {"2024-01-01T00:00:00": 2, "2024-01-01T00:02:00": 2,
                   "2024-01-01T00:04:00": 1}
