"""Stream-stream correlation: watermarked interval join.

The log-analytics use case: pair request lines with their response
lines (same correlation key) arriving on two live streams, where the
response must land within a bounded interval of the request. This is
Structured Streaming's stream-stream inner join — both sides buffer
state, and the watermark + the *time-interval join condition* together
let Spark evict a buffered row once no future match can exist, so
state is O(arrival rate × interval), not O(stream history). Without
the interval bound on the event-time columns the state never drains —
the condition is load-bearing, not decoration.

Batch twin: ``operators/relational.py`` as-of / range joins compute
the same correlation over the at-rest table (one definition of
"matches within T", two execution modes).

Reference parity: none (logsqlite serves single streams); this is
part of the engine-extension streaming surface (SURVEY §2.5 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WITHIN = "5 minutes"


def correlate_streams(requests: DataFrame, responses: DataFrame,
                      key: str = "req_id",
                      ts_col: str = "ts",
                      within: str = DEFAULT_WITHIN) -> DataFrame:
    """Inner-join two streams on ``key`` where the response event-time
    falls in ``[request ts, request ts + within]``.

    Both inputs must be streaming DataFrames with ``ts_col`` as a real
    timestamp. Output columns: key, request ts, response ts, latency
    in microseconds (exact integer arithmetic on epoch-micros).
    """
    q = (requests.withWatermark(ts_col, within)
         .select(F.col(key).alias("k"),
                 F.col(ts_col).alias("req_ts")))
    p = (responses.withWatermark(ts_col, within)
         .select(F.col(key).alias("resp_k"),
                 F.col(ts_col).alias("resp_ts")))
    joined = q.join(
        p,
        F.expr(f"k = resp_k AND resp_ts >= req_ts "
               f"AND resp_ts <= req_ts + interval {within}"),
    )
    lat = (F.unix_micros(F.col("resp_ts"))
           - F.unix_micros(F.col("req_ts"))).cast("long")
    return joined.select(
        F.col("k").alias(key), "req_ts", "resp_ts",
        lat.alias("latency_us"),
    )


def enrich_stream(stream: DataFrame, dim: DataFrame,
                  key: str = "container_id",
                  how: str = "left_outer") -> DataFrame:
    """Stream-static enrichment: join a live stream against an at-rest
    dimension (config table, container metadata, user profile).

    Unlike stream-stream, the static side needs no watermark and no
    state — each micro-batch plans a fresh join against the CURRENT
    dimension snapshot, so a dimension update (manifest flip) is
    picked up at the next batch without restarting the query. Spark
    broadcasts the dim when it fits; left_outer keeps stream rows
    whose key has no dimension row yet (arrival order is unpredictable
    in log pipelines).
    """
    return stream.join(dim, key, how)


def unmatched_requests(requests: DataFrame, responses: DataFrame,
                       key: str = "req_id",
                       ts_col: str = "ts",
                       within: str = DEFAULT_WITHIN) -> DataFrame:
    """Requests that never got a response inside the interval — a LEFT
    OUTER stream-stream join; the null-extended row is emitted only
    once the watermark proves no match can still arrive (timeout
    detection, the streaming twin of the batch anti-join)."""
    q = (requests.withWatermark(ts_col, within)
         .select(F.col(key).alias("k"),
                 F.col(ts_col).alias("req_ts")))
    p = (responses.withWatermark(ts_col, within)
         .select(F.col(key).alias("resp_k"),
                 F.col(ts_col).alias("resp_ts")))
    joined = q.join(
        p,
        F.expr(f"k = resp_k AND resp_ts >= req_ts "
               f"AND resp_ts <= req_ts + interval {within}"),
        "left_outer",
    )
    return (joined.filter(F.col("resp_ts").isNull())
            .select(F.col("k").alias(key), "req_ts"))
