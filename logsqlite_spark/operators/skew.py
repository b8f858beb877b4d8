"""Skew-mitigation idioms: salted two-stage aggregation.

A hot key (one container producing most of the log volume — the
reference's single-writer-per-container model makes this common) sends
its entire partition to ONE reducer in a naive groupBy. Salting splits
the hot key across ``n_salt`` sub-keys for the first (heavy) shuffle,
then re-aggregates the tiny per-salt partials — the second shuffle
carries ``keys x n_salt`` rows, not data volume.

The salt must be a DETERMINISTIC function of the row (not ``rand()``):
Spark may recompute a stage after partial failure, and a
nondeterministic salt would re-bucket rows between attempts, corrupting
counts. ``pmod(hash(salt_col), n)`` re-executes identically.

These helpers exist alongside AQE's automatic skew-join splitting
(spark.sql.adaptive.skewJoin) because AQE only splits JOIN partitions;
a skewed *aggregation* still funnels one key to one task without
salting. Results are provably identical to the unsalted aggregate —
the registry row's oracle is the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from logsqlite_spark.tables import table


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, str],
               salt_col: str | Column, n_salt: int = 16) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) -> groupBy(keys).

    ``aggs`` maps output column -> one of 'count' | 'sum:<col>' |
    'max:<col>' | 'min:<col>' (the re-associable aggregates; avg is
    sum/count composed by the caller). ``salt_col`` is any
    deterministic expression with per-row spread (a seq, an id).
    """
    salt = F.pmod(F.hash(F.col(salt_col) if isinstance(salt_col, str)
                         else salt_col), F.lit(n_salt))
    stage1_aggs, stage2_aggs = [], []
    for out, spec in aggs.items():
        if spec == "count":
            stage1_aggs.append(F.count(F.lit(1)).alias(f"__{out}"))
            stage2_aggs.append(F.sum(f"__{out}").cast("long").alias(out))
        else:
            op, col = spec.split(":", 1)
            fn = {"sum": F.sum, "max": F.max, "min": F.min}[op]
            stage1_aggs.append(fn(col).alias(f"__{out}"))
            outer = F.sum if op == "sum" else fn
            stage2_aggs.append(outer(f"__{out}").alias(out))
    return (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*stage1_aggs)
        .groupBy(*keys)
        .agg(*stage2_aggs)
    )


def _q_salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-container line counts + byte volume via the salted path —
    oracle-identical to the plain GROUP BY (that IS the point)."""
    from logsqlite_spark.tables import events_as_logs

    logs = events_as_logs(spark, sf_dir).withColumn(
        "line_len", F.length("line").cast("long"))
    out = salted_agg(
        logs, ["container_id"],
        {"n_lines": "count", "total_bytes": "sum:line_len",
         "max_seq": "max:seq"},
        salt_col="seq",
    )
    return out.select(
        "container_id", F.col("n_lines").cast("long"),
        F.col("total_bytes").cast("long"), F.col("max_seq").cast("long"))


QUERIES = {
    "count_per_container_salted": _q_salted_counts,
}

ORACLES = {
    # the UNSALTED aggregate: salting must not change any value
    "count_per_container_salted": (
        "SELECT CAST(user_id AS VARCHAR) AS container_id, "
        "count(*) AS n_lines, "
        "CAST(sum(length(props) + 1) AS BIGINT) AS total_bytes, "
        "max(event_id) AS max_seq FROM events "
        "GROUP BY CAST(user_id AS VARCHAR)"
    ),
}
