"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`logsqlite_spark.registry` — the engine's
driver-checkable query surface. See SURVEY.md §2 for the operator
inventory each query covers.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Full ReadLogs pipeline (SURVEY §3.1): since/until range filter +
    per-container tail + arrival-order return on the events table.
    """
    from logsqlite_spark import registry

    return registry.flagship(spark)

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from logsqlite_spark import registry

    return registry.queries()

def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    from logsqlite_spark import registry

    return registry.oracle_sql()
