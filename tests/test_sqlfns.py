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
