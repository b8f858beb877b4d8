"""Stream-stream interval join: matches in-window, timeouts detected."""

import time

from pyspark.sql import functions as F

from logsqlite_spark.streaming.joins import (
    correlate_streams, unmatched_requests)

BASE = 1_704_067_200  # 2024-01-01T00:00:00Z seconds
M = 1_000_000


def _write(spark, path, rows):
    df = spark.createDataFrame(
        rows, "req_id string, ts_us long"
    ).withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")
    df.coalesce(1).write.mode("append").parquet(path)


def _stream(spark, path):
    return (spark.readStream
            .schema("req_id string, ts timestamp")
            .parquet(path))


def test_in_window_pairs_match_with_exact_latency(spark, tmp_path):
    req_p, resp_p = str(tmp_path / "req"), str(tmp_path / "resp")
    _write(spark, req_p, [("a", BASE * M), ("b", (BASE + 10) * M),
                          ("c", (BASE + 20) * M)])
    _write(spark, resp_p, [
        ("a", (BASE + 2) * M),        # in window: latency 2s
        ("b", (BASE + 400) * M),      # 390s later: outside 5m window
        # c: never answered
        ("x", (BASE + 1) * M),        # response without request
    ])
    out = correlate_streams(_stream(spark, req_p), _stream(spark, resp_p))
    name = f"sj_{int(time.time() * 1000)}"
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
        got = sorted((r["req_id"], r["latency_us"]) for r in
                     spark.sql(f"SELECT * FROM {name}").collect())
    finally:
        q.stop()
    assert got == [("a", 2 * M)]


def test_unanswered_requests_emitted_after_watermark(spark, tmp_path):
    req_p, resp_p = str(tmp_path / "req2"), str(tmp_path / "resp2")
    _write(spark, req_p, [("a", BASE * M), ("c", (BASE + 1) * M)])
    _write(spark, resp_p, [("a", (BASE + 2) * M)])
    # advance both watermarks far past the join window so the
    # null-extended row for c is provably final
    _write(spark, req_p, [("zz", (BASE + 3600) * M)])
    _write(spark, resp_p, [("zz2", (BASE + 3600) * M)])

    out = unmatched_requests(_stream(spark, req_p), _stream(spark, resp_p))
    name = f"sj_{int(time.time() * 1000)}"
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
        got = {r["req_id"] for r in
               spark.sql(f"SELECT * FROM {name}").collect()}
    finally:
        q.stop()
    # c timed out; a was answered; zz may still be in-window (not final)
    assert "c" in got and "a" not in got


def test_stream_static_enrichment_sees_dim_updates(spark, tmp_path):
    from logsqlite_spark.streaming.joins import enrich_stream

    src = str(tmp_path / "ev")
    dim_p = str(tmp_path / "dim")
    _write(spark, src, [("c1", BASE * M)])
    spark.createDataFrame([("c1", "team-a"), ("c2", "team-b")],
                          "req_id string, owner string") \
        .write.mode("overwrite").parquet(dim_p)

    stream = _stream(spark, src)
    dim = spark.read.parquet(dim_p)
    out = enrich_stream(stream, dim, key="req_id")
    name = f"se_{int(time.time() * 1000)}"
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
        # c3 has no dim row yet: left_outer keeps it with a null owner
        _write(spark, src, [("c3", (BASE + 1) * M)])
        q.processAllAvailable()
        got = {(r["req_id"], r["owner"]) for r in
               spark.sql(f"SELECT req_id, owner FROM {name}").collect()}
    finally:
        q.stop()
    assert got == {("c1", "team-a"), ("c3", None)}
