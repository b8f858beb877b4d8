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

def test_streaming_partial_reassembly_across_batches(spark, tmp_path):
    from logsqlite_spark.streaming.stateful import streaming_reassemble_partials

    src = str(tmp_path / "pin")
    base_schema = ("seq long, ts_nanos long, source string, line string, "
                   "partial boolean, "
                   "partial_meta struct<last:boolean,id:string,ordinal:int>, "
                   "container_id string")
    T0 = BASE * 10**9
    full_schema = None

    def write(rows):
        nonlocal full_schema
        df = spark.createDataFrame(rows, base_schema).withColumn(
            "ts", F.timestamp_micros(F.expr("ts_nanos div 1000")))
        full_schema = df.schema
        df.coalesce(1).write.mode("append").parquet(src)

    # batch 1: first two fragments of line p1
    write([(1, T0 + 100, "stdout", "AAA\n", True, (False, "p1", 1), "c1"),
           (2, T0 + 101, "stdout", "BBB\n", True, (False, "p1", 2), "c1")])

    stream = spark.readStream.schema(full_schema) \
        .option("maxFilesPerTrigger", "1").parquet(src)
    out = streaming_reassemble_partials(stream)
    name = f"pr_{int(time.time()*1000)}"
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
        assert spark.sql(f"SELECT * FROM {name}").count() == 0  # still open
        # batch 2: the closing fragment arrives later
        write([(3, T0 + 102, "stdout", "CCC\n", True, (True, "p1", 3), "c1")])
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()
    assert len(rows) == 1
    assert rows[0]["line"] == "AAABBBCCC\n"
    assert rows[0]["seq"] == 1          # merged row takes first fragment's seq
    assert rows[0]["container_id"] == "c1"

def test_streaming_partial_flush_on_watermark_timeout(spark, tmp_path):
    from logsqlite_spark.streaming.stateful import streaming_reassemble_partials

    src = str(tmp_path / "pin2")
    base_schema = ("seq long, ts_nanos long, source string, line string, "
                   "partial boolean, "
                   "partial_meta struct<last:boolean,id:string,ordinal:int>, "
                   "container_id string")
    T0 = BASE * 10**9
    full_schema = None

    def write(rows):
        nonlocal full_schema
        df = spark.createDataFrame(rows, base_schema).withColumn(
            "ts", F.timestamp_micros(F.expr("ts_nanos div 1000")))
        full_schema = df.schema
        df.coalesce(1).write.mode("append").parquet(src)

    # an orphaned fragment whose 'last' never arrives
    write([(1, T0, "stdout", "ORPHAN\n", True, (False, "q1", 1), "c1")])
    stream = spark.readStream.schema(full_schema) \
        .option("maxFilesPerTrigger", "1").parquet(src)
    out = streaming_reassemble_partials(stream, flush_timeout_ms=1_000,
                                        watermark="1 second")
    name = f"pf_{int(time.time()*1000)}"
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
        # a far-future fragment on another key pushes the watermark
        write([(9, T0 + 3600 * 10**9, "stdout", "X\n", True,
                (False, "q2", 1), "c1")])
        q.processAllAvailable()
        q.processAllAvailable()
        lines = [r["line"] for r in spark.sql(f"SELECT * FROM {name}").collect()]
    finally:
        q.stop()
    assert lines == ["ORPHAN\n"]  # best-effort flush of the dead partial

def test_streaming_partial_trickle_extends_flush_deadline(spark, tmp_path):
    # fragments arriving farther apart than the flush timeout must keep
    # ONE state row (deadline from the NEWEST fragment), not be split
    # into two emitted rows by an early min-ts-based flush
    from logsqlite_spark.streaming.stateful import streaming_reassemble_partials

    src = str(tmp_path / "pin3")
    base_schema = ("seq long, ts_nanos long, source string, line string, "
                   "partial boolean, "
                   "partial_meta struct<last:boolean,id:string,ordinal:int>, "
                   "container_id string")
    T0 = BASE * 10**9
    S = 10**9
    full_schema = None

    def write(rows):
        nonlocal full_schema
        df = spark.createDataFrame(rows, base_schema).withColumn(
            "ts", F.timestamp_micros(F.expr("ts_nanos div 1000")))
        full_schema = df.schema
        df.coalesce(1).write.mode("append").parquet(src)

    write([(1, T0, "stdout", "AAA\n", True, (False, "p1", 1), "c1")])
    stream = spark.readStream.schema(full_schema) \
        .option("maxFilesPerTrigger", "1").parquet(src)
    out = streaming_reassemble_partials(stream, flush_timeout_ms=1_000,
                                        watermark="1 second")
    name = f"pt_{int(time.time()*1000)}"
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
        # 5s later (>> 1s timeout) the second fragment trickles in;
        # watermark advances to T0+4s, past the OLD min-based deadline
        write([(2, T0 + 5 * S, "stdout", "BBB\n", True,
                (False, "p1", 2), "c1")])
        q.processAllAvailable()
        # unrelated key triggers a batch that evaluates timeouts at
        # wm=T0+4s; p1's deadline is now T0+6s so it must survive
        write([(9, T0 + 5 * S, "stdout", "X\n", True,
                (False, "q2", 1), "c1")])
        q.processAllAvailable()
        assert [r["line"] for r in spark.sql(
            f"SELECT * FROM {name} WHERE partial_id = 'p1'").collect()] == []
        # the closing fragment completes the line — one merged row
        write([(3, T0 + 10 * S, "stdout", "CCC\n", True,
                (True, "p1", 3), "c1")])
        q.processAllAvailable()
        rows = spark.sql(
            f"SELECT * FROM {name} WHERE partial_id = 'p1'").collect()
    finally:
        q.stop()
    assert [r["line"] for r in rows] == ["AAABBBCCC\n"]
    assert rows[0]["ts_nanos"] == T0  # emitted ts stays the OLDEST fragment

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
