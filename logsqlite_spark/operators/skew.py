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


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_col: str | Column, n_salt: int = 16) -> DataFrame:
    """Skew-proof equi-join: salt the big side PER ROW, replicate the
    small side across all salts, join on (key, salt).

    The classic manual skew-join: a hot key's rows scatter over
    ``n_salt`` shuffle buckets instead of funnelling into one task;
    the small side pays ``n_salt×`` duplication, which is cheap
    precisely because it is small. The salt MUST be a per-row
    function (``salt_col`` — a seq/id with spread), NOT a function of
    the join key: hashing the key would give every row of the hot key
    the same salt and spread nothing. Each big row lands in exactly
    one bucket and meets each matching small row exactly once there,
    so the result is provably identical to the plain join.

    AQE's skew-join split (OptimizeSkewedJoin) handles most of this
    automatically for *sort-merge* joins; the manual salt remains the
    tool when AQE is off (streaming foreachBatch plans) or the split
    must be deterministic across stage retries. Like ``salted_agg``,
    the salt is ``pmod(hash(...), n)`` of a real column — never
    ``rand()``, which re-buckets rows between task attempts.
    """
    salt = F.pmod(F.hash(F.col(salt_col) if isinstance(salt_col, str)
                         else salt_col), F.lit(n_salt))
    big_s = big.withColumn("__salt", salt)
    small_s = (
        small.withColumn(
            "__salt", F.explode(F.expr(f"sequence(0, {n_salt - 1})")))
    )
    return (big_s.join(small_s, [key, "__salt"]).drop("__salt"))


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


def _q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event age vs the user's first event, via the salted join —
    oracle-identical to the plain join (that IS the point)."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("ts div 1000").alias("ts_us"))
    dim = ev.groupBy("user_id").agg(F.min("ts_us").alias("first_ts_us"))
    out = salted_join(ev, dim, "user_id", salt_col="event_id")
    return out.select(
        F.col("event_id").cast("long"), F.col("user_id").cast("long"),
        (F.col("ts_us") - F.col("first_ts_us")).cast("long").alias("age_us"))


QUERIES = {
    "count_per_container_salted": _q_salted_counts,
    "events_salted_join": _q_salted_join,
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
    # the UNSALTED join: salting must not change any value
    "events_salted_join": (
        "WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us "
        "FROM events), "
        "dim AS (SELECT user_id, min(ts_us) AS first_ts_us FROM ev "
        "GROUP BY user_id) "
        "SELECT ev.event_id, ev.user_id, "
        "CAST(ev.ts_us - dim.first_ts_us AS BIGINT) AS age_us "
        "FROM ev JOIN dim USING (user_id)"
    ),
}
