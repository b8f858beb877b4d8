"""Log-line parsing operators (X6) — structured extraction from raw lines.

The reference stores lines opaquely; any analytics engine over logs
needs to project structure out of them. All JVM-side built-ins
(``get_json_object``, ``regexp_extract``, ``from_json``) — no Python in
the hot path, fully codegen'd, and the parse happens after predicate
pushdown so only surviving rows pay for it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def json_field(col: str | Column, path: str) -> Column:
    """Extract one JSON field as string (codegen'd JsonPath)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)

def parse_props(df: DataFrame, props_col: str = "props",
                schema: str = "k INT") -> DataFrame:
    """Parse a JSON props column into a typed struct column ``p``."""
    return df.withColumn("p", F.from_json(F.col(props_col), schema))

def extract_pattern(col: str | Column, pattern: str, group: int = 1) -> Column:
    """regexp_extract wrapper (syslog/k8s-style line dissection)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, pattern, group)


def mask_line(col: str | Column) -> Column:
    """Drain-lite variable masking: long hex runs (ids/uuids/hashes)
    then digit runs collapse to placeholders, leaving the constant
    skeleton of the line. Pure codegen regexes (hex first — a 16+-char
    hex id contains digit runs the second pass would shred)."""
    c = F.col(col) if isinstance(col, str) else col
    masked = F.regexp_replace(c, "[0-9a-f]{16,}", "<HEX>")
    return F.regexp_replace(masked, "\\d+", "<N>")


def log_templates(df: DataFrame, line_col: str = "props",
                  type_col: str = "event_type",
                  id_col: str = "event_id",
                  user_col: str = "user_id") -> DataFrame:
    """Log-template mining (Drain-lite): mask the variable parts of
    each line, then group by the constant skeleton — the \"what kinds
    of lines are in this log\" report every log-analytics engine grows.
    One map-side-combinable aggregation over the masked projection
    (the distinct-user count adds the standard partial-distinct
    Expand); masking is codegen, so the scan never leaves the JVM.
    The full tree-based Drain algorithm refines templates iteratively;
    the deterministic mask keeps this oracle-checkable and covers the
    id/counter/timestamp variability that dominates real logs."""
    return (
        df.select(
            F.col(type_col).cast("string").alias("event_type"),
            mask_line(line_col).alias("template"),
            F.col(id_col).cast("long").alias("__id"),
            F.col(user_col).cast("long").alias("__user"),
        )
        .groupBy("event_type", "template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("__user").cast("long").alias("n_users"),
            F.min("__id").cast("long").alias("first_event"),
        )
    )
