"""Single-scan column profiler (§2.8 extension, Deequ's profiler).

The companion to :mod:`operators.checks`: before declaring
constraints, a pipeline profiles the table — per-column completeness,
exact distinct count, numeric range — to learn what to constrain.
All columns profile in ONE aggregation pass: each column contributes
conditional aggregates to the same scan (the exact distinct counts
share it through Expand — one branch per distinct column), and a
``stack`` projection unpivots the metrics row to one row per column.
Per-column jobs would make profiling O(columns) scans of a 100 TB
table.

Numeric min/max are emitted as rounded doubles (exact for the integer
and plain-decimal columns profiled here) and string min/max as
strings, so the whole profile replays exactly in DuckDB — both
registry queries carry full oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logsqlite_spark.tables import table


def profile_table(df: DataFrame, numeric_cols: tuple[str, ...],
                  string_cols: tuple[str, ...],
                  exact_distinct: bool = True) -> DataFrame:
    """Profile the given columns in one aggregation over ``df``.

    Output per column: (column, n, n_null, n_distinct, min_num,
    max_num, min_str, max_str) — the num/str pair not applicable to
    the column's kind is NULL.

    ``exact_distinct=True`` (default, and what the DuckDB oracle
    replays) computes exact per-column distincts: still one scan, but
    the multi-distinct aggregation expands the input once per distinct
    column. At 100 TB profile with ``exact_distinct=False`` —
    ``approx_count_distinct`` (HLL++, ~2% error) keeps the aggregation
    a single no-Expand pass whose state is a fixed sketch per column,
    which is the right trade for a profile whose purpose is choosing
    constraints, not auditing them.
    """
    n_distinct = F.countDistinct if exact_distinct else \
        (lambda c: F.approx_count_distinct(c, 0.02).cast("long"))
    cols = [(c, "num") for c in numeric_cols] + \
        [(c, "str") for c in string_cols]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (c, kind) in enumerate(cols):
        aggs.append(F.count(F.when(F.col(c).isNull(), 1))
                    .alias(f"_null{i}"))
        aggs.append(n_distinct(c).alias(f"_dist{i}"))
        if kind == "num":
            aggs.append(F.round(F.min(F.col(c).cast("double")), 6)
                        .alias(f"_min{i}"))
            aggs.append(F.round(F.max(F.col(c).cast("double")), 6)
                        .alias(f"_max{i}"))
        else:
            aggs.append(F.min(c).alias(f"_min{i}"))
            aggs.append(F.max(c).alias(f"_max{i}"))
    metrics = df.agg(*aggs)
    parts = []
    for i, (c, kind) in enumerate(cols):
        mn_num = f"_min{i}" if kind == "num" else "cast(null as double)"
        mx_num = f"_max{i}" if kind == "num" else "cast(null as double)"
        mn_str = f"_min{i}" if kind == "str" else "cast(null as string)"
        mx_str = f"_max{i}" if kind == "str" else "cast(null as string)"
        parts.append(f"'{c}', _null{i}, _dist{i}, "
                     f"{mn_num}, {mx_num}, {mn_str}, {mx_str}")
    stacked = metrics.select(
        F.col("_n").cast("long").alias("n"),
        F.expr(f"stack({len(cols)}, {', '.join(parts)}) as "
               "(column, n_null, n_distinct, min_num, max_num, "
               "min_str, max_str)"))
    return stacked.select(
        "column", "n",
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_num", "max_num", "min_str", "max_str")


_EVENTS_NUM = ("event_id", "user_id", "value")
_EVENTS_STR = ("event_type",)
_DOCS_NUM = ("doc_id", "n_chars")
_DOCS_STR = ("lang", "source")


def _q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(table(spark, sf_dir, "events"),
                         _EVENTS_NUM, _EVENTS_STR)


def _q_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(table(spark, sf_dir, "documents"),
                         _DOCS_NUM, _DOCS_STR)


QUERIES = {
    "profile_events": _q_profile_events,
    "profile_documents": _q_profile_docs,
}


def _oracle(table_name: str, numeric_cols: tuple[str, ...],
            string_cols: tuple[str, ...]) -> str:
    rows = []
    for c in numeric_cols:
        rows.append(
            f"SELECT '{c}' AS column, CAST(count(*) AS BIGINT) AS n, "
            f"CAST(count(*) - count({c}) AS BIGINT) AS n_null, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"round(CAST(min({c}) AS DOUBLE), 6) AS min_num, "
            f"round(CAST(max({c}) AS DOUBLE), 6) AS max_num, "
            f"CAST(NULL AS VARCHAR) AS min_str, "
            f"CAST(NULL AS VARCHAR) AS max_str FROM {table_name}")
    for c in string_cols:
        rows.append(
            f"SELECT '{c}', CAST(count(*) AS BIGINT), "
            f"CAST(count(*) - count({c}) AS BIGINT), "
            f"CAST(count(DISTINCT {c}) AS BIGINT), "
            f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), "
            f"min({c}), max({c}) FROM {table_name}")
    return " UNION ALL ".join(rows)


ORACLES = {
    "profile_events": _oracle("events", _EVENTS_NUM, _EVENTS_STR),
    "profile_documents": _oracle("documents", _DOCS_NUM, _DOCS_STR),
}
