"""Reference-parity query callables + oracles (SURVEY.md §2.2-2.6).

Moved out of registry.py (VERDICT r11 #3): registry.py churns every
round for module WIRING (new operator imports, queries()/oracle_sql()
plumbing), and the stamp-freshness audit works at file granularity —
so parity queries defined there were marked stale every round for
changes that could not affect them.  This module holds ONLY the
parity query callables, their constants, and their oracle SQL; it
changes only when a parity query's semantics change.

Aliasing/typing contract is registry.py's docstring; reference
behaviors cited per-query (logger.rs / cleaner.rs file:line in the
operator modules these compose).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logsqlite_spark.operators import read as R
from logsqlite_spark.operators import retention as RET
from logsqlite_spark.session import ensure_engine_confs
from logsqlite_spark.tables import table

# ---------------------------------------------------------------------------
# Fixed literals (events span 2024-01-01 .. 2024-01-30 at every SF;
# second-aligned so µs truncation can't move rows across the bound).
SINCE = "2024-01-10T00:00:00Z"
UNTIL = "2024-01-20T00:00:00Z"
SINCE_NS = 1704844800 * 1_000_000_000  # 2024-01-10T00:00:00Z
UNTIL_NS = 1705708800 * 1_000_000_000  # 2024-01-20T00:00:00Z
RETENTION_CUTOFF = "2024-01-25T00:00:00Z"
RETENTION_CUTOFF_NS = 1706140800 * 1_000_000_000
CURSOR = 500
TAIL_N = 100
TAIL_PER_CONTAINER_N = 7
KEEP_LAST_N = 300
CONTAINER = "7"

_LOG_COLS = dict(ts_col="ts", seq_col="event_id", container_col="user_id")

def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_confs(spark)
    return table(spark, sf_dir, "events")

def _project_log(df: DataFrame) -> DataFrame:
    """Canonical output projection for log-read queries."""
    return df.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.expr("ts div 1000").cast("long").alias("ts_us"),
    )

_LOG_PROJ_SQL = (
    "event_id, user_id, event_type, value, epoch_us(ts) AS ts_us"
)

# ---------------------------------------------------------------------------
# Reference-parity queries (SURVEY.md §2.2-2.4)

def q_read_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P6: docker sentinels + tail=-1 normalize to a bare scan
    df = R.read_logs(_events(spark, sf_dir),
                     since="0001-01-01T00:00:00Z",
                     until="0001-01-01T00:00:00Z",
                     tail=-1, ordered=False, **_LOG_COLS)
    return _project_log(df)

def q_read_since(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = R.read_logs(_events(spark, sf_dir), since=SINCE, ordered=False, **_LOG_COLS)
    return _project_log(df)

def q_read_until(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = R.read_logs(_events(spark, sf_dir), until=UNTIL, ordered=False, **_LOG_COLS)
    return _project_log(df)

def q_read_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = R.read_logs(_events(spark, sf_dir), since=SINCE, until=UNTIL,
                     ordered=False, **_LOG_COLS)
    return _project_log(df)

def q_read_range_container(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir).filter(F.col("user_id") == int(CONTAINER))
    df = R.read_logs(df, since=SINCE, until=UNTIL, ordered=False, **_LOG_COLS)
    return _project_log(df)

def q_read_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P5: keyset resume — seq >= cursor AND ts <= until
    df = R.read_logs(_events(spark, sf_dir), until=UNTIL, cursor=CURSOR,
                     ordered=False, **_LOG_COLS)
    return _project_log(df)

def q_read_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    # L3 global top-k: TakeOrderedAndProject, no full sort
    df = R.tail_global(_events(spark, sf_dir), TAIL_N, seq_col="event_id")
    return _project_log(df)

def q_read_tail_per_container(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = R.tail_per_container(_events(spark, sf_dir), TAIL_PER_CONTAINER_N,
                              seq_col="event_id", container_col="user_id")
    return _project_log(df)

def q_read_tail_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # reference semantics: tail is resolved AFTER since/until filters;
    # single-container frame, so the tail is a global top-k within it
    df = R.tail_global(
        R.apply_read_filters(
            _events(spark, sf_dir).filter(F.col("user_id") == int(CONTAINER)),
            since_nanos=SINCE_NS, until_nanos=UNTIL_NS, **_LOG_COLS),
        20, seq_col="event_id")
    return _project_log(df)

def q_count_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1 — keep it a DataFrame for the harness
    df = R.apply_read_filters(_events(spark, sf_dir), since_nanos=SINCE_NS,
                              until_nanos=UNTIL_NS, cursor=CURSOR, **_LOG_COLS)
    return df.agg(F.count(F.lit(1)).cast("long").alias("n"))

def q_count_per_container(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = R.count_per_container(_events(spark, sf_dir), container_col="user_id")
    return df.select(F.col("user_id").cast("long"),
                     F.col("n_lines").cast("long"))

def q_retention_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P7 survivors: ts >= now-age (strict < deletes)
    df = RET.retention_survivors(
        _events(spark, sf_dir), now_nanos=RETENTION_CUTOFF_NS,
        cleanup_age_s=0, **_LOG_COLS)
    return df.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.count(F.lit(1)).cast("long").alias("kept"),
        F.min("event_id").cast("long").alias("min_seq"),
        F.max("event_id").cast("long").alias("max_seq"))

def q_retention_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P8 survivors: last N per container; boundary row survives
    df = RET.retention_survivors(
        _events(spark, sf_dir), cleanup_max_lines=KEEP_LAST_N, **_LOG_COLS)
    return df.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.count(F.lit(1)).cast("long").alias("kept"),
        F.min("event_id").cast("long").alias("min_seq"),
        F.max("event_id").cast("long").alias("max_seq"))

def q_retention_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P9: survive = ts >= cutoff AND within last N (delete is the OR)
    df = RET.retention_survivors(
        _events(spark, sf_dir), now_nanos=RETENTION_CUTOFF_NS,
        cleanup_age_s=0, cleanup_max_lines=KEEP_LAST_N, **_LOG_COLS)
    return df.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.count(F.lit(1)).cast("long").alias("kept"),
        F.min("event_id").cast("long").alias("min_seq"),
        F.max("event_id").cast("long").alias("max_seq"))

def q_logparse_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # X6: JSON field extraction, JVM-side JsonPath
    df = _events(spark, sf_dir)
    return df.select(
        F.col("event_id").cast("long"),
        F.get_json_object("props", "$.k").cast("int").alias("k"))

def q_logparse_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # X6: schema-projected JSON parse — from_json with an explicit
    # schema stays in codegen and, unlike per-path JsonPath probes,
    # parses the document ONCE however many fields are pulled; the
    # 100 TB default for structured props columns.
    df = _events(spark, sf_dir)
    parsed = F.from_json("props", "k INT")
    return df.select(
        F.col("event_id").cast("long"),
        parsed.getField("k").cast("int").alias("k"))

def q_logparse_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    return df.select(
        F.col("event_id").cast("long"),
        F.regexp_extract("props", '"k": (\\d+)', 1).cast("int").alias("k"))

def q_log_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # X6: Drain-lite template mining — mask variable parts, group by
    # the constant skeleton
    from logsqlite_spark.operators.logparse import log_templates

    return log_templates(_events(spark, sf_dir))

def q_wire_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S3/S8 wire-parity path over the events-as-logs mapping. The
    # emitted n_bytes hash-matches a DuckDB varint-arithmetic oracle
    # (round 13); the frame BYTES themselves are pytest round-tripped.
    from logsqlite_spark.operators.wire import to_wire_frames
    from logsqlite_spark.tables import events_as_logs

    logs = events_as_logs(spark, sf_dir)
    return to_wire_frames(logs).select(
        "container_id", F.col("seq").cast("long"),
        F.length("frame").cast("int").alias("n_bytes"))

def q_reassemble_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    # partial-log reassembly over events-as-logs (no partials in the
    # synthetic table, so this is the pass-through path; merge
    # semantics are pytest-covered) — oracle: whole lines unchanged.
    from logsqlite_spark.operators.partials import reassemble_partials
    from logsqlite_spark.tables import events_as_logs

    logs = (
        events_as_logs(spark, sf_dir)
        .withColumn("ts_nanos", F.col("ts_nanos").cast("long"))
        .withColumn("partial", F.lit(False))
        .withColumn("partial_meta", F.lit(None).cast(
            "struct<last:boolean,id:string,ordinal:int>"))
    )
    out = reassemble_partials(logs)
    return out.select(
        F.col("container_id"), F.col("seq").cast("long"),
        F.col("line"))

def q_events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # event-time daily rollup (extension beyond reference — SURVEY §2.8)
    df = _events(spark, sf_dir)
    day = F.to_date(F.timestamp_micros(F.expr("ts div 1000"))).alias("day")
    return (df.groupBy(day, "event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value")))

def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multi-dimensional rollup (CUBE) — beyond the reference's surface;
    # grouping-id coalesced to 'ALL' labels for a portable result
    df = _events(spark, sf_dir)
    day = F.to_date(F.timestamp_micros(F.expr("ts div 1000"))).alias("day")
    return (
        df.cube(day, "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.coalesce(F.col("day").cast("string"), F.lit("ALL")).alias("day"),
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            "n",
        )
    )

ORACLES = {
    "read_all": f"SELECT {_LOG_PROJ_SQL} FROM events",
    "read_since": f"SELECT {_LOG_PROJ_SQL} FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'",
    "read_until": f"SELECT {_LOG_PROJ_SQL} FROM events WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'",
    "read_range": (
        f"SELECT {_LOG_PROJ_SQL} FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-20 00:00:00'"
    ),
    "read_range_container": (
        f"SELECT {_LOG_PROJ_SQL} FROM events WHERE user_id = {CONTAINER} "
        "AND ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-20 00:00:00'"
    ),
    "read_cursor": (
        f"SELECT {_LOG_PROJ_SQL} FROM events "
        f"WHERE event_id >= {CURSOR} AND ts <= TIMESTAMP '2024-01-20 00:00:00'"
    ),
    "read_tail": (
        f"SELECT {_LOG_PROJ_SQL} FROM events ORDER BY event_id DESC LIMIT {TAIL_N}"
    ),
    "read_tail_per_container": (
        f"SELECT {_LOG_PROJ_SQL} FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn"
        f"  FROM events) WHERE rn <= {TAIL_PER_CONTAINER_N}"
    ),
    "read_tail_range": (
        f"SELECT {_LOG_PROJ_SQL} FROM events WHERE user_id = {CONTAINER} "
        "AND ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-20 00:00:00' "
        "ORDER BY event_id DESC LIMIT 20"
    ),
    "count_filtered": (
        f"SELECT count(*) AS n FROM events WHERE event_id >= {CURSOR} "
        "AND ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-20 00:00:00'"
    ),
    "count_per_container": (
        "SELECT user_id, count(*) AS n_lines FROM events GROUP BY user_id"
    ),
    "retention_age": (
        "SELECT user_id, count(*) AS kept, min(event_id) AS min_seq, max(event_id) AS max_seq "
        "FROM events WHERE ts >= TIMESTAMP '2024-01-25 00:00:00' GROUP BY user_id"
    ),
    "retention_keep_last": (
        "SELECT user_id, count(*) AS kept, min(event_id) AS min_seq, max(event_id) AS max_seq "
        "FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn "
        f"      FROM events) WHERE rn <= {KEEP_LAST_N} GROUP BY user_id"
    ),
    "retention_combined": (
        "SELECT user_id, count(*) AS kept, min(event_id) AS min_seq, max(event_id) AS max_seq "
        "FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn "
        f"      FROM events) WHERE rn <= {KEEP_LAST_N} "
        "AND ts >= TIMESTAMP '2024-01-25 00:00:00' GROUP BY user_id"
    ),
    "logparse_json": (
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events"
    ),
    "logparse_typed": (
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events"
    ),
    "logparse_regex": (
        "SELECT event_id, CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS INT) AS k FROM events"
    ),
    "log_templates": (
        "SELECT CAST(event_type AS VARCHAR) AS event_type, "
        "regexp_replace(regexp_replace(props, '[0-9a-f]{16,}', '<HEX>', 'g'), "
        "'\\d+', '<N>', 'g') AS template, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
        "CAST(min(event_id) AS BIGINT) AS first_event "
        "FROM events GROUP BY 1, 2"
    ),
    "events_window_agg": (
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, "
        "count(*) AS n, round(sum(value), 4) AS sum_value "
        "FROM events GROUP BY 1, 2"
    ),
    # wire_frames emits (container_id, seq, n_bytes): the frame BYTES
    # are pytest round-tripped, but the LENGTH is pure protobuf varint
    # arithmetic DuckDB replays exactly — 4-byte BE prefix + per-field
    # (1 tag byte + varint(len) + len) for source/line and (1 tag byte
    # + varint(time_nano)) for ts, fields skipped when falsy exactly
    # like encode_log_entry (sources/frames.py). varint_len(x) =
    # ceil(bitlength(x)/7). A wrong length ⇒ a wrong frame, so this
    # certifies the vectorized encoder's framing end-to-end.
    "wire_frames": (
        "WITH e AS (SELECT CAST(user_id AS VARCHAR) AS container_id, "
        "  event_id AS seq, strlen(event_type) AS sl, "
        "  strlen(concat(props, chr(10))) AS ll, epoch_ns(ts) AS tn "
        "  FROM events) "
        "SELECT container_id, CAST(seq AS BIGINT) AS seq, CAST(4 "
        "  + CASE WHEN sl > 0 THEN 1 + floor((length(bin(sl)) + 6) / 7) "
        "    + sl ELSE 0 END "
        "  + CASE WHEN tn <> 0 THEN 1 + floor((length(bin(tn)) + 6) / 7) "
        "    ELSE 0 END "
        "  + CASE WHEN ll > 0 THEN 1 + floor((length(bin(ll)) + 6) / 7) "
        "    + ll ELSE 0 END AS INT) AS n_bytes FROM e"
    ),
    "reassemble_partials": (
        "SELECT CAST(user_id AS VARCHAR) AS container_id, event_id AS seq, "
        "concat(props, chr(10)) AS line FROM events"
    ),
    "cube_counts": (
        "SELECT coalesce(CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR), 'ALL') AS day, "
        "coalesce(event_type, 'ALL') AS event_type, count(*) AS n "
        "FROM events GROUP BY CUBE (CAST(date_trunc('day', ts) AS DATE), event_type)"
    ),
}

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "read_all": q_read_all,
    "read_since": q_read_since,
    "read_until": q_read_until,
    "read_range": q_read_range,
    "read_range_container": q_read_range_container,
    "read_cursor": q_read_cursor,
    "read_tail": q_read_tail,
    "read_tail_per_container": q_read_tail_per_container,
    "read_tail_range": q_read_tail_range,
    "count_filtered": q_count_filtered,
    "count_per_container": q_count_per_container,
    "retention_age": q_retention_age,
    "retention_keep_last": q_retention_keep_last,
    "retention_combined": q_retention_combined,
    "logparse_json": q_logparse_json,
    "logparse_typed": q_logparse_typed,
    "logparse_regex": q_logparse_regex,
    "log_templates": q_log_templates,
    "events_window_agg": q_events_window_agg,
    "wire_frames": q_wire_frames,  # length-oracled; bytes in pytest
    "reassemble_partials": q_reassemble_partials,
    "cube_counts": q_cube_counts,
}

