"""Relational extension operators Spark lacks natively (SURVEY.md §2.8).

The reference never joins (single-table engine), but a log-analytics
engine at 100 TB needs the temporal-relational toolkit. Each operator
here is a *composition of built-in DataFrame ops* (option (a) of the
custom-operator ladder) — no UDFs, no cross products:

- **as-of join**: the union-tag + running-last trick — O(n log n) via
  one window over the unioned streams instead of a per-row lookup
  (the standard distributed as-of; DuckDB's native ASOF JOIN is the
  oracle).
- **range join**: bucketize the range key, equi-join on (key, bucket)
  with neighbor-bucket expansion, then filter the exact predicate —
  turns an inequality join into a shuffle-friendly equi-join
  (Catalyst would otherwise fall back to BroadcastNestedLoopJoin).
- **sessionization**: lag + cumulative-sum window (gap > threshold
  starts a session).

Determinism for oracles: all temporal comparisons run at µs
granularity on both engines; ties break on event id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logsqlite_spark.session import ensure_engine_confs
from logsqlite_spark.tables import table

SESSION_GAP_S = 1800
RANGE_WINDOW_S = 3600
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
) -> DataFrame:
    """For each left row, the latest right row with ts <= left ts,
    per ``on`` key. Right rows sort before left rows at equal ts
    (inclusive as-of).

    One union + one window; shuffle = hash on ``on``. No per-row
    probes, no nested-loop join — this is the shape that survives
    100 TB.
    """
    l_tagged = left.withColumn("__tag", F.lit(1)).withColumn(
        "__ts", F.col(left_ts))
    r_tagged = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__ts"),
            *[F.col(src).alias(dst) for src, dst in right_cols.items()],
        )
        .withColumn("__tag", F.lit(0))
    )
    cols = set(l_tagged.columns) | set(r_tagged.columns)
    l_full = l_tagged.select(
        *[F.col(c) if c in l_tagged.columns else F.lit(None).alias(c)
          for c in cols])
    r_full = r_tagged.select(
        *[F.col(c) if c in r_tagged.columns else F.lit(None).alias(c)
          for c in cols])
    u = l_full.unionByName(r_full)
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for dst in right_cols.values():
        u = u.withColumn(dst, F.last(dst, ignorenulls=True).over(w))
    return u.filter(F.col("__tag") == 1).drop("__tag", "__ts")

def range_self_join_within(
    df: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    window_s: int,
) -> DataFrame:
    """Pairs of rows with the same key whose ts differ by <= window_s.

    Bucket trick: b = ts div window; a qualifying pair is always in the
    same or adjacent buckets, so join on (key, bucket expanded to
    {b-1, b, b+1}) and filter exactly. Equi-join -> hash shuffle; the
    3x expansion is on ONE side only.
    """
    w_us = window_s * 1_000_000
    base = df.select(
        F.col(key), F.col(id_col),
        F.col(ts_col).alias("__us"),
        (F.col(ts_col) / w_us).cast("long").alias("__b"),
    )
    expanded = base.withColumn(
        "__b", F.explode(F.array(F.col("__b") - 1, F.col("__b"),
                                 F.col("__b") + 1)))
    a, b = expanded.alias("a"), base.alias("b")
    return (
        a.join(b, (F.col(f"a.{key}") == F.col(f"b.{key}"))
               & (F.col("a.__b") == F.col("b.__b")))
        .filter(
            (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.abs(F.col("a.__us") - F.col("b.__us")) <= w_us)
        )
        .select(
            F.col(f"a.{key}").alias(key),
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
        )
        .distinct()
    )

def sessionize(
    df: DataFrame, key: str, ts_col: str, id_col: str,
    gap_s: int = SESSION_GAP_S,
) -> DataFrame:
    """Assign session ids: a row starts a new session when its gap
    from the previous row (per key, event-time order) exceeds gap_s."""
    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    gap_us = gap_s * 1_000_000
    return (
        df.withColumn("__prev", F.lag(ts_col).over(w))
        .withColumn(
            "__new",
            (F.col("__prev").isNull()
             | ((F.col(ts_col) - F.col("__prev")) > gap_us)).cast("int"),
        )
        .withColumn("session_id", F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .drop("__prev", "__new")
    )

# ---------------------------------------------------------------------------
# registry wiring (events at µs granularity on both engines)

def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_confs(spark)
    e = table(spark, sf_dir, "events")
    return e.withColumn("ts_us", F.expr("ts div 1000"))

def _q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_us(spark, sf_dir)
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_us")
    signups = e.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts_us")
    out = asof_join(
        errors, signups, on="user_id", left_ts="ts_us", right_ts="ts_us",
        right_cols={"event_id": "signup_event_id", "ts_us": "signup_ts_us"},
    )
    return out.select(
        F.col("event_id").cast("long"),
        F.col("user_id").cast("long"),
        F.col("signup_event_id").cast("long"),
        F.col("signup_ts_us").cast("long"),
    )

def _q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_us(spark, sf_dir)
    return range_self_join_within(
        e, key="user_id", ts_col="ts_us", id_col="event_id",
        window_s=RANGE_WINDOW_S,
    ).select(F.col("user_id").cast("long"),
             F.col("a_id").cast("long"), F.col("b_id").cast("long"))

def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_us(spark, sf_dir)
    s = sessionize(e, key="user_id", ts_col="ts_us", id_col="event_id")
    return s.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )

def _q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_us(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )

def _q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_us(spark, sf_dir)
    out = (
        e.groupBy(F.col("user_id").cast("long").alias("user_id"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.round(F.sum("value"), 4))
    )
    return out

QUERIES = {
    "asof_join_signup": _q_asof,
    "range_join_1h": _q_range_join,
    "sessionize_30m": _q_sessionize,
    "distinct_users": _q_distinct_users,
    "pivot_value_by_type": _q_pivot,
}

ORACLES = {
    "asof_join_signup": (
        "SELECT e.event_id, e.user_id, s.event_id AS signup_event_id, "
        "  epoch_us(s.ts) AS signup_ts_us "
        "FROM (SELECT * FROM events WHERE event_type = 'error') e "
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s "
        "ON e.user_id = s.user_id AND epoch_us(e.ts) >= epoch_us(s.ts)"
    ),
    "range_join_1h": (
        "SELECT DISTINCT a.user_id, a.event_id AS a_id, b.event_id AS b_id "
        "FROM events a JOIN events b "
        "ON a.user_id = b.user_id AND a.event_id < b.event_id "
        "AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 3600000000"
    ),
    "sessionize_30m": (
        "WITH g AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, "
        "  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev "
        "  FROM events), "
        "s AS (SELECT user_id, "
        "  CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS new_s "
        "  FROM g) "
        "SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, "
        "count(*) AS n_events FROM s GROUP BY user_id"
    ),
    "distinct_users": (
        "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
        "count(*) AS n_events FROM events GROUP BY event_type"
    ),
    "pivot_value_by_type": (
        "SELECT user_id, "
        + ", ".join(
            f"round(sum(CASE WHEN event_type = '{t}' THEN value END), 4) AS {t}"
            for t in EVENT_TYPES
        )
        + " FROM events GROUP BY user_id"
    ),
}
