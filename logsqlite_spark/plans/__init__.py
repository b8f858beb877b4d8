"""Physical-plan introspection (SURVEY.md §4)."""

from logsqlite_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    has_partition_filters,
    has_pushed_filters,
    has_take_ordered,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_partition_filters",
    "has_pushed_filters",
    "has_take_ordered",
    "read_schema_columns",
    "wholestage_codegen_spans",
]
