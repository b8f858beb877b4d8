"""Streaming windowed KLL quantile sketches (streaming/windows.py).

KLL compaction is randomized, so unlike the HLL twin the streaming
estimate is not pinned bit-identical to batch; the contract is the
sketch's own guarantee — exact n per window, estimates drawn from the
stream, normalized rank error within epsilon — independent of how
micro-batch boundaries slice the windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logsqlite_spark.streaming.windows import windowed_value_quantile_sketch

BASE = 1_704_067_200  # 2024-01-01T00:00:00Z seconds
M = 1_000_000

_RANK_EPS = 0.04


def _write(spark, path, rows):
    df = spark.createDataFrame(
        rows, "value_c long, ts_us long"
    ).withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")
    df.coalesce(1).write.mode("append").parquet(path)


def test_streaming_kll_rank_error_per_window(spark, tmp_path):
    src = str(tmp_path / "in")
    # two 5-minute windows, values interleaved across three files so
    # micro-batch boundaries cut through both windows
    f1 = [(v * 7 % 500, (BASE + v) * M) for v in range(0, 200, 3)]
    f2 = [(v * 13 % 500, (BASE + v) * M) for v in range(1, 200, 3)]
    f3 = [(v * 3 % 500, (BASE + 300 + v % 250) * M) for v in range(150)]
    for f in (f1, f2, f3):
        _write(spark, src, f)

    stream = (
        spark.readStream
        .schema("value_c long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (windowed_value_quantile_sketch(stream, window="5 minutes",
                                        watermark="1 minute")
         .drop("sketch")
         .writeStream.format("memory").queryName("kll_win")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = {r["window_start"].isoformat(): r
               for r in spark.sql("select * from kll_win").collect()}
    finally:
        q.stop()

    batch = spark.read.parquet(src).collect()
    by_win: dict = {}
    for r in batch:
        win_start = r["ts"].replace(
            minute=(r["ts"].minute // 5) * 5, second=0, microsecond=0)
        by_win.setdefault(win_start.isoformat(), []).append(r["value_c"])

    assert set(got) == set(by_win) and len(got) == 2
    for w, vals in by_win.items():
        row = got[w]
        assert row["n"] == len(vals)
        svals = sorted(vals)
        for qt in (0.5, 0.9, 0.99):
            est = row[f"p{int(qt * 100)}_c"]
            assert est in vals, (w, qt, est)
            rank = sum(1 for v in svals if v <= est) / len(svals)
            assert abs(rank - qt) <= _RANK_EPS, (w, qt, est, rank)
