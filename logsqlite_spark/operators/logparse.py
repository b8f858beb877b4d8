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
