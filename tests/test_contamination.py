"""Contamination check semantics: planted overlap, clean docs, anti-join."""

from pyspark.sql import functions as F

from logsqlite_spark.operators.contamination import (
    contamination_check, decontaminate)

BENCH = [(100, "alpha beta gamma delta epsilon zeta")]
DOCS = [
    # full copy of the benchmark -> every benchmark 4-gram present
    (1, "prefix words alpha beta gamma delta epsilon zeta suffix"),
    # shares exactly one 4-gram (3/6 threshold not reached at 0.5: 1/3 < 0.5)
    (2, "alpha beta gamma delta other words here now"),
    # no overlap
    (3, "totally unrelated content with many words"),
]


def _dfs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    return docs, bench


def test_planted_copy_is_flagged(spark):
    docs, bench = _dfs(spark)
    got = {r["doc_id"]: r for r in
           contamination_check(docs, bench, n=4).collect()}
    # bench has 3 distinct 4-grams; doc 1 contains all of them
    assert got[1]["shared"] == 3 and got[1]["contaminated"]
    assert got[1]["bench_ngrams"] == 3
    # doc 2 shares one 4-gram: 1/3 < 0.5 -> not contaminated
    assert got[2]["shared"] == 1 and not got[2]["contaminated"]
    # doc 3 never meets the benchmark (inverted-index join, no pair row)
    assert 3 not in got


def test_decontaminate_removes_only_flagged(spark):
    docs, bench = _dfs(spark)
    kept = sorted(r["doc_id"] for r in
                  decontaminate(docs, bench, n=4).collect())
    assert kept == [2, 3]


def test_threshold_is_exact_rational(spark):
    docs, bench = _dfs(spark)
    # at threshold 1/3 the one-gram overlap is exactly at the boundary
    # (1 * 3 >= 1 * 3) -> flagged, proving >= in integer space
    got = {r["doc_id"]: r["contaminated"] for r in
           contamination_check(docs, bench, n=4, threshold=1 / 3).collect()}
    assert got[2] is True
