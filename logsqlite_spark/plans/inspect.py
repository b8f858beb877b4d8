"""Helpers to assert the physical plan is the one we designed for.

The reference's performance story is one B-tree index (idx_ts,
logger.rs:147). Ours is Catalyst doing the equivalent for free — but
only if the plan actually shows it. These helpers turn ``.explain``
output into assertions the test suite enforces, so a regression that
breaks pushdown or broadcasts fails CI instead of shipping a 100x
slowdown at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )

def _executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()

def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if every fragment appears among PushedFilters of some scan."""
    plan = explain_str(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    return all(f in pushed for f in fragments)

def has_partition_filters(df: DataFrame, *fragments: str) -> bool:
    plan = explain_str(df)
    part = " ".join(re.findall(r"PartitionFilters: \[([^\]]*)\]", plan))
    return all(f in part for f in fragments)

def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (pruning check)."""
    plan = explain_str(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0].strip() for c in m.group(1).split(",") if c]

def has_take_ordered(df: DataFrame) -> bool:
    """Tail-N compiled to distributed top-k, not a global sort."""
    return "TakeOrderedAndProject" in _executed_plan(df)

def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in _executed_plan(df)

def wholestage_codegen_spans(df: DataFrame, execute: bool = True) -> int:
    """Number of WholeStageCodegen spans (wider = fewer JVM<->row breaks).

    Under AQE the final plan only exists after execution, so by default
    the DataFrame is materialized first.
    """
    plan = _executed_plan(df)
    if execute and "isFinalPlan=false" in plan:
        df.collect()  # finalize AQE on this same query execution
        plan = _executed_plan(df)
    # toString renders codegen spans as '*(N)' stage markers
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
