"""SQL scalar functions mirror the Python parsers bit-for-bit."""

import pytest

from logsqlite_spark.config import parse_duration_s, parse_size_bytes
from logsqlite_spark.functions.sqlfns import register_sql_functions
from logsqlite_spark.functions.time import rfc3339_to_nanos


@pytest.fixture(autouse=True)
def _register(spark):
    register_sql_functions(spark)


def _one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


def test_duration_matches_python_parser(spark):
    for lit in ("30d", "5m", "12h", "2w", "45s", "0s"):
        assert _one(spark, f"eng_duration_s('{lit}')") == parse_duration_s(lit)
    # the reference quirk: m is MINUTES
    assert _one(spark, "eng_duration_s('1m')") == 60
    # unknown suffix -> NULL (SQL's silent analogue of ConfigError)
    assert _one(spark, "eng_duration_s('5y')") is None


def test_size_matches_python_parser(spark):
    for lit in ("10M", "1g", "512k", "7b", "0k"):
        assert _one(spark, f"eng_size_bytes('{lit}')") == parse_size_bytes(lit)


def test_ts_nanos_matches_python_parser(spark):
    for lit in ("2024-01-10T00:00:00Z", "2024-01-10T00:00:00.5Z",
                "2024-01-10T12:34:56.123456789Z",
                "2024-01-10T00:00:00+02:00"):
        assert _one(spark, f"eng_ts_nanos('{lit}')") == rfc3339_to_nanos(lit)
    # unparseable -> NULL, the reference's silent-drop policy
    assert _one(spark, "eng_ts_nanos('not a time')") is None


def test_sql_functions_usable_in_engine_queries(spark):
    # the point of the surface: literals inside plain SQL over views
    got = _one(spark, "eng_ts_nanos('2024-01-10T00:00:00Z') "
                      "- eng_duration_s('1d') * 1000000000")
    assert got == rfc3339_to_nanos("2024-01-09T00:00:00Z")


def test_with_global_rank_exact_and_edge_cases(spark):
    from logsqlite_spark.functions.rank import with_global_rank

    df = spark.createDataFrame(
        [(3, 30), (1, 10), (2, 20), (4, 10)], "id long, v long")
    got = {r["id"]: (r["rn"], r["n"])
           for r in with_global_rank(df, ["v", "id"]).collect()}
    # total order (v, id): (10,1) (10,4) (20,2) (30,3)
    assert got == {1: (1, 4), 4: (2, 4), 2: (3, 4), 3: (4, 4)}

    one = spark.createDataFrame([(7, 5)], "id long, v long")
    r = with_global_rank(one, ["v", "id"]).collect()[0]
    assert (r["rn"], r["n"]) == (1, 1)

    empty = spark.createDataFrame([], "id long, v long")
    assert with_global_rank(empty, ["v", "id"]).count() == 0


def test_with_global_rank_single_materialization(spark):
    # ADVICE r4 #1: the offsets branch and the local-rank branch must
    # read ONE materialization of the range exchange — the plan should
    # show both consumers scanning the persisted relation, never two
    # independently-sampled range exchanges
    from pyspark.sql import functions as F

    from logsqlite_spark.functions.rank import with_global_rank

    df = spark.range(1000).select(
        (F.col("id") % 37).alias("v"), F.col("id"))
    out = with_global_rank(df, ["v", "id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2
    # ranks are a permutation of 1..n regardless of partitioning
    rows = out.collect()
    assert sorted(r["rn"] for r in rows) == list(range(1, 1001))
    assert all(r["n"] == 1000 for r in rows)


def test_with_global_rank_repeat_calls_keep_shared_cache_entry(spark):
    """r17 (VERDICT r16 #7): Spark's CacheManager keys cached data by
    canonicalized plan, so N identical with_global_rank calls share
    ONE cache entry — the persist bound must LRU by plan identity, not
    by call, or the (_PERSIST_KEEP+1)-th identical call unpersists the
    shared entry mid-run (the events_conversion_time rep spike)."""
    from pyspark.sql import functions as F

    from logsqlite_spark.functions import rank as R

    spark.catalog.clearCache()
    del R._PERSISTED[:]
    df = spark.range(500).select((F.col("id") % 13).alias("v"),
                                 F.col("id"))
    for _ in range(R._PERSIST_KEEP + 3):
        out = R.with_global_rank(df, ["v", "id"])
        assert out.count() == 500
        # the shared entry must still be cached after every call —
        # eviction of the live entry is exactly the thrash under test
        # (DataFrame.storageLevel consults the CacheManager: an
        # unpersisted plan reads back useMemory=False)
        assert R._PERSISTED[-1].storageLevel.useMemory
    # identical plans deduped: one slot used, no evictions happened
    assert len(R._PERSISTED) == 1
    del R._PERSISTED[:]
    spark.catalog.clearCache()
