"""Relational extension operators: as-of join, range join, sessionize."""

import pytest
from pyspark.sql import functions as F

from logsqlite_spark.operators.relational import (
    asof_join,
    range_self_join_within,
    sessionize,
)

M = 1_000_000  # µs per second

@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, "A", 10 * M), (2, "A", 25 * M), (3, "B", 12 * M), (4, "A", 5 * M)],
        "trade_id long, sym string, ts_us long")
    quotes = spark.createDataFrame(
        [(100, "A", 5 * M), (101, "A", 20 * M), (102, "B", 30 * M)],
        "quote_id long, sym string, ts_us long")
    return trades, quotes

def test_asof_join_latest_at_or_before(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_ts="ts_us",
                    right_ts="ts_us", right_cols={"quote_id": "qid"})
    got = {r["trade_id"]: r["qid"] for r in out.collect()}
    assert got[1] == 100   # ts 10s -> quote at 5s
    assert got[2] == 101   # ts 25s -> quote at 20s
    assert got[3] is None  # B's only quote is later
    assert got[4] == 100   # inclusive: trade at 5s sees quote at 5s

def test_asof_join_row_count_preserved(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_ts="ts_us",
                    right_ts="ts_us", right_cols={"quote_id": "qid"})
    assert out.count() == trades.count()

def test_range_self_join(spark):
    df = spark.createDataFrame(
        [(1, "u", 0), (2, "u", 30 * M), (3, "u", 90 * M), (4, "v", 10 * M)],
        "id long, k string, ts_us long")
    out = range_self_join_within(df, key="k", ts_col="ts_us",
                                 id_col="id", window_s=60)
    pairs = {(r["a_id"], r["b_id"]) for r in out.collect()}
    # within 60s: (1,2) 30s apart, (2,3) 60s apart (inclusive); not (1,3)
    assert pairs == {(1, 2), (2, 3)}

def test_range_join_bucket_boundary(spark):
    # pair straddling a bucket boundary must still be found
    df = spark.createDataFrame(
        [(1, "u", 59 * M), (2, "u", 61 * M)], "id long, k string, ts_us long")
    out = range_self_join_within(df, key="k", ts_col="ts_us",
                                 id_col="id", window_s=60)
    assert {(r["a_id"], r["b_id"]) for r in out.collect()} == {(1, 2)}

def test_sessionize_gap_splits(spark):
    df = spark.createDataFrame(
        [(1, "u", 0), (2, "u", 10 * M), (3, "u", 2000 * M), (4, "u", 2010 * M),
         (5, "v", 0)],
        "id long, k string, ts_us long")
    out = sessionize(df, key="k", ts_col="ts_us", id_col="id", gap_s=1800)
    got = {r["id"]: r["session_id"] for r in out.collect()}
    assert got[1] == got[2] == 1
    assert got[3] == got[4] == 2  # 2000s gap > 1800s starts session 2
    assert got[5] == 1
