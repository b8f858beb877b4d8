"""Scalar function library (SURVEY.md §2.6)."""

from logsqlite_spark.functions.time import (
    DOCKER_TS_SENTINEL,
    normalize_read_params,
    rfc3339_to_nanos,
)

__all__ = ["DOCKER_TS_SENTINEL", "normalize_read_params", "rfc3339_to_nanos"]
