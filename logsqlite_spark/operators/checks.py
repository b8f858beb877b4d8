"""Declarative data-quality constraint verification (§2.8 extension).

Deequ-style (Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB 2018 — public): a pipeline guards its tables with
a declared constraint suite — completeness, uniqueness, value bounds,
accepted-value sets, pattern conformity — and the engine verifies the
WHOLE suite in one pass. This is the admission gate a 100 TB ingest
runs before publishing a snapshot; per-constraint scans would make it
O(checks) scans.

Execution shape: every constraint compiles to a conditional aggregate
over the SAME scan — one aggregation job produces a single metrics
row (distinct-count constraints ride the same scan via Expand), and a
``stack`` projection unpivots it into one row per constraint with the
metric, its bound, and the verdict. Adding a constraint adds a column
to the agg, never a pass over the data.

Determinism: metrics are exact counts/ratios (rounded at emission) —
fully DuckDB-replayable, so both suite queries carry complete oracles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logsqlite_spark.tables import table


class Check:
    """One constraint: a metric expression over the scan plus the
    predicate its value must satisfy.

    ``metric_sql`` is a Spark-SQL aggregate expression producing a
    DOUBLE; ``op`` is one of ``>= <= ==``; ``bound`` the threshold.
    """

    def __init__(self, name: str, metric_sql: str, op: str, bound: float):
        if op not in (">=", "<=", "=="):
            raise ValueError(f"unsupported op {op!r}")
        self.name, self.metric_sql, self.op, self.bound = \
            name, metric_sql, op, bound

    def passed_expr(self, metric):
        if self.op == ">=":
            return metric >= F.lit(self.bound)
        if self.op == "<=":
            return metric <= F.lit(self.bound)
        return metric == F.lit(self.bound)


def completeness(name: str, col: str, bound: float = 1.0) -> Check:
    """Fraction of rows with a non-null ``col``."""
    return Check(name,
                 f"cast(count({col}) as double) / nullif(count(*), 0)",
                 ">=", bound)


def uniqueness(name: str, col: str) -> Check:
    """Distinctness: ``count(distinct col) / count(col)`` — equals 1.0
    iff every value occurs exactly once, i.e. the primary-key
    property, which is what the ``== 1.0`` bound tests. (This is
    Deequ's *distinctness*; its exactly-once *uniqueness* ratio needs
    per-value counts — a groupBy, not a conditional aggregate — and
    would break the one-pass contract. At any bound other than 1.0
    the two metrics diverge; don't loosen the bound expecting
    exactly-once semantics.)"""
    return Check(name,
                 f"cast(count(distinct {col}) as double) / nullif(count({col}), 0)",
                 "==", 1.0)


def _sq(s: str) -> str:
    """Single-quote a string literal for SQL interpolation, doubling
    embedded quotes — user-supplied names/values land inside SQL text.

    Quote-doubling covers standard SQL (DuckDB oracles, and Spark's
    IN-list below). Backslashes are rejected at the `in_set` boundary
    instead of escaped: Spark string literals are backslash-escaped by
    default while DuckDB's are not, so no single spelling evaluates
    identically in both engines — a loud error beats a value that
    silently means different things to the query and its oracle."""
    return "'" + s.replace("'", "''") + "'"


def in_set(name: str, col: str, values: Sequence[str],
           bound: float = 1.0) -> Check:
    for v in values:
        if "\\" in v:
            raise ValueError(
                "in_set values must not contain backslashes (Spark and "
                f"DuckDB escape string literals differently): {v!r}")
    quoted = ", ".join(_sq(v) for v in values)
    return Check(
        name,
        f"cast(count_if({col} in ({quoted})) as double) "
        f"/ nullif(count({col}), 0)",
        ">=", bound)


def bound_metric(name: str, metric_sql: str, op: str,
                 bound: float) -> Check:
    """Raw-aggregate constraint (min/max/avg bounds, row counts)."""
    return Check(name, f"cast({metric_sql} as double)", op, bound)


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Verify the suite in ONE aggregation over ``df`` (module
    docstring). Output: (check_name, metric, bound, passed) per
    constraint, in suite order.

    The verdict is computed on the UNROUNDED metric — rounding first
    would let one duplicate id in 3M rows round a 0.99999967
    distinctness up to the 1.0 bound and pass, exactly at the scale
    the gate exists for; the 6-decimal rounding is display/oracle
    only. A NULL metric (empty table, all-NULL column) is a FAILED
    constraint, not an unknown: ``passed`` is coalesced to false so
    ``filter(~passed)`` gates can't be sneaked past by an empty
    snapshot."""
    metrics = df.agg(*[
        F.expr(c.metric_sql).alias(f"_m{i}")
        for i, c in enumerate(checks)
    ])
    # names go in as F.lit COLUMNS, not SQL literals — immune to any
    # literal-escaping differences (quotes, backslashes)
    rows = metrics.select(
        F.stack(F.lit(len(checks)),
                *[x for i, c in enumerate(checks)
                  for x in (F.lit(c.name), F.col(f"_m{i}"))])
        .alias("check_name", "raw"))
    bound_map = F.create_map(*[
        x for c in checks for x in (F.lit(c.name), F.lit(float(c.bound)))])
    # per-row verdicts: ops differ per check, so rebuild via CASE
    verdict = None
    for c in checks:
        cond = (F.col("check_name") == c.name) & \
            c.passed_expr(F.col("raw"))
        verdict = cond if verdict is None else (verdict | cond)
    return rows.select(
        "check_name",
        F.round(F.col("raw"), 6).cast("double").alias("metric"),
        bound_map[F.col("check_name")].alias("bound"),
        F.coalesce(verdict, F.lit(False)).alias("passed"))


def run_checks_grouped(df: DataFrame, checks: Sequence[Check],
                       keys: Sequence[str]) -> DataFrame:
    """Per-group constraint verification — the suite evaluated for
    every value of ``keys`` (per source, per container, per day) in
    the SAME single aggregation pass: one groupBy carries every
    constraint's conditional aggregate, then the per-group metrics
    row unpivots exactly like :func:`run_checks`. This is how a
    pipeline finds that ONE upstream feed is broken while the global
    suite still passes (the global ratios dilute a single bad
    source). Same verdict contract: unrounded metrics, NULL fails
    closed."""
    metrics = df.groupBy(*keys).agg(*[
        F.expr(c.metric_sql).alias(f"_m{i}")
        for i, c in enumerate(checks)
    ])
    rows = metrics.select(
        *keys,
        F.stack(F.lit(len(checks)),
                *[x for i, c in enumerate(checks)
                  for x in (F.lit(c.name), F.col(f"_m{i}"))])
        .alias("check_name", "raw"))
    bound_map = F.create_map(*[
        x for c in checks for x in (F.lit(c.name), F.lit(float(c.bound)))])
    verdict = None
    for c in checks:
        cond = (F.col("check_name") == c.name) & \
            c.passed_expr(F.col("raw"))
        verdict = cond if verdict is None else (verdict | cond)
    return rows.select(
        *keys, "check_name",
        F.round(F.col("raw"), 6).cast("double").alias("metric"),
        bound_map[F.col("check_name")].alias("bound"),
        F.coalesce(verdict, F.lit(False)).alias("passed"))


EVENTS_CHECKS: tuple[Check, ...] = (
    completeness("user_id_complete", "user_id"),
    completeness("ts_complete", "ts"),
    completeness("value_complete", "value"),
    uniqueness("event_id_unique", "event_id"),
    in_set("event_type_known", "event_type",
           ("view", "click", "purchase", "signup", "error")),
    bound_metric("value_non_negative", "min(value)", ">=", 0.0),
    bound_metric("value_below_cap", "max(value)", "<=", 10_000.0),
    bound_metric("row_count_min", "count(*)", ">=", 1.0),
)

DOCUMENTS_CHECKS: tuple[Check, ...] = (
    completeness("doc_id_complete", "doc_id"),
    completeness("text_complete", "text"),
    uniqueness("doc_id_unique", "doc_id"),
    bound_metric("text_min_length", "min(length(text))", ">=", 1.0),
    completeness("lang_mostly_present", "lang", 0.9),
    bound_metric("n_chars_consistent",
                 "cast(count_if(n_chars = length(text)) as double) "
                 "/ nullif(count(*), 0)", ">=", 0.0),
)


def _q_events_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("double"))
    return run_checks(ev, EVENTS_CHECKS)


def _q_docs_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_checks(table(spark, sf_dir, "documents"), DOCUMENTS_CHECKS)


DRIFT_THRESHOLD = 0.5


def metric_drift(events: DataFrame,
                 threshold: float = DRIFT_THRESHOLD) -> DataFrame:
    """Day-over-day metric drift — the temporal face of the quality
    gate: per-day row count, distinct users, and value mass, each
    compared against the previous day; a relative change beyond
    ``threshold`` flags the day for quarantine. A broken upstream
    rarely fails a static constraint (the rows it ships are
    well-formed); what it breaks is VOLUME and MIX, which only a
    drift check sees.

    Shape: one scan into per-day aggregates (value mass summed in
    exact integer cents — FP sums would be partition-order-dependent
    and unhashable), then a lag window over O(days) rows. The window
    is trivially small; the scan is the only data-sized cost.
    """
    day = F.to_date(F.timestamp_micros(F.expr("ts div 1000")))
    per_day = (
        events.select(day.alias("day"), "user_id",
                      F.expr("cast(floor(cast(value as double) * 100 "
                             "+ 0.5) as bigint)").alias("value_c"))
        .where(F.col("day").isNotNull())
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.countDistinct("user_id").cast("long").alias("n_users"),
             F.sum("value_c").cast("long").alias("sum_value_c"))
    )
    from pyspark.sql import Window
    w = Window.orderBy("day")
    # Divide by nullif(lag, 0): a previous day with zero mass (all-null
    # or all-zero values) must yield rel=NULL -> drift coalesces false,
    # not an ANSI DIVIDE_BY_ZERO that kills the whole query. Mirrored
    # in the DuckDB oracle below.
    rel = lambda c: F.round(  # noqa: E731
        F.abs(F.col(c) - F.lag(c).over(w)).cast("double")
        / F.nullif(F.lag(c).over(w).cast("double"), F.lit(0.0)), 6)
    out = per_day.select(
        F.col("day").cast("string").alias("day"),
        "n", "n_users", "sum_value_c",
        rel("n").alias("rel_n"),
        rel("n_users").alias("rel_users"),
        rel("sum_value_c").alias("rel_value"))
    return out.withColumn(
        "drift",
        F.coalesce((F.col("rel_n") > threshold)
                   | (F.col("rel_users") > threshold)
                   | (F.col("rel_value") > threshold), F.lit(False)))


def _q_metric_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metric_drift(table(spark, sf_dir, "events"))


def _q_checks_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_checks_grouped(table(spark, sf_dir, "documents"),
                              DOCUMENTS_CHECKS, ["source"])


QUERIES = {
    "quality_checks_events": _q_events_checks,
    "quality_checks_documents": _q_docs_checks,
    "quality_checks_by_source": _q_checks_by_source,
    "metric_drift_events": _q_metric_drift,
}


def _oracle(table_name: str, checks: Sequence[Check],
            rewrites: dict[str, str] | None = None,
            keys: Sequence[str] = ()) -> str:
    """Replay the suite in DuckDB: same one-agg + unpivot shape —
    verdict on the UNROUNDED metric, NULL coalesced to false, rounding
    display-only (the run_checks contract). ``keys`` mirrors
    run_checks_grouped."""
    rewrites = rewrites or {}
    key_cols = "".join(f"{k}, " for k in keys)
    cols = key_cols + ", ".join(
        f"CAST({rewrites.get(c.name, c.metric_sql)} AS DOUBLE) AS m{i}"
        for i, c in enumerate(checks))
    group = f" GROUP BY {', '.join(keys)}" if keys else ""
    rows = " UNION ALL ".join(
        f"SELECT {key_cols}{_sq(c.name)} AS check_name, "
        f"round(m{i}, 6) AS metric, "
        f"CAST({float(c.bound)} AS DOUBLE) AS bound, "
        f"COALESCE(m{i} {'=' if c.op == '==' else c.op} {float(c.bound)}, "
        f"FALSE) AS passed "
        f"FROM agg"
        for i, c in enumerate(checks))
    return f"WITH agg AS (SELECT {cols} FROM {table_name}{group}) {rows}"


# DuckDB has no count_if; spell the conditional counts portably
_O_REWRITES_EVENTS = {
    "event_type_known": (
        "cast(count(*) FILTER (event_type IN ('view', 'click', "
        "'purchase', 'signup', 'error')) AS DOUBLE) "
        "/ nullif(count(event_type), 0)"),
}
_O_REWRITES_DOCS = {
    "n_chars_consistent": (
        "cast(count(*) FILTER (n_chars = length(text)) AS DOUBLE) "
        "/ nullif(count(*), 0)"),
}

ORACLES = {
    "quality_checks_events": _oracle("events", EVENTS_CHECKS,
                                     _O_REWRITES_EVENTS),
    "quality_checks_documents": _oracle("documents", DOCUMENTS_CHECKS,
                                        _O_REWRITES_DOCS),
    "quality_checks_by_source": _oracle("documents", DOCUMENTS_CHECKS,
                                        _O_REWRITES_DOCS,
                                        keys=("source",)),
    "metric_drift_events": (
        "WITH pd AS (SELECT CAST(ts AS DATE) AS day, "
        "  CAST(count(*) AS BIGINT) AS n, "
        "  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
        "  CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) "
        "    AS BIGINT)) AS BIGINT) AS sum_value_c "
        "  FROM events WHERE ts IS NOT NULL GROUP BY day), "
        "rel AS (SELECT day, n, n_users, sum_value_c, "
        "  round(CAST(abs(n - lag(n) OVER (ORDER BY day)) AS DOUBLE) "
        "    / nullif(lag(n) OVER (ORDER BY day), 0), 6) AS rel_n, "
        "  round(CAST(abs(n_users - lag(n_users) OVER (ORDER BY day)) "
        "    AS DOUBLE) / nullif(lag(n_users) OVER (ORDER BY day), 0), 6) "
        "    AS rel_users, "
        "  round(CAST(abs(sum_value_c - lag(sum_value_c) "
        "    OVER (ORDER BY day)) AS DOUBLE) "
        "    / nullif(lag(sum_value_c) OVER (ORDER BY day), 0), 6) "
        "    AS rel_value "
        "  FROM pd) "
        "SELECT CAST(day AS VARCHAR) AS day, n, n_users, sum_value_c, "
        "rel_n, rel_users, rel_value, "
        f"COALESCE(rel_n > {DRIFT_THRESHOLD} "
        f"OR rel_users > {DRIFT_THRESHOLD} "
        f"OR rel_value > {DRIFT_THRESHOLD}, FALSE) AS drift FROM rel"
    ),
}
