"""Partial-log reassembly — multiline log lines split by Docker.

The reference's data model carries ``partial`` +
``partial_log_metadata{last, id, ordinal}`` (/root/reference/src/entry.proto:9-17)
but stores fragments as-is; reassembly is left to the consumer. A
query engine should offer it as an operator: group fragments by
(container, partial id), order by ordinal, concatenate.

Batch shape: one hash shuffle on the partial id; complete lines pass
through untouched (union, no window over them). At 100 TB partial
groups are tiny (a long line split into a handful of 16 KB chunks) —
the aggregation is map-side combinable and skew-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def reassemble_partials(logs: DataFrame) -> DataFrame:
    """Merge partial-fragment runs into whole lines.

    Output schema matches the input minus ``partial``/``partial_meta``
    (every surviving row is a whole line); the merged row inherits the
    first fragment's seq/ts (arrival position of the line's start).
    """
    whole = logs.filter(~F.coalesce(F.col("partial"), F.lit(False))).select(
        "container_id", "seq", "ts_nanos", "source", "line"
    )
    frags = logs.filter(F.coalesce(F.col("partial"), F.lit(False)))
    merged = (
        frags.groupBy("container_id", F.col("partial_meta.id").alias("__pid"))
        .agg(
            F.min("seq").alias("seq"),
            F.min("ts_nanos").alias("ts_nanos"),
            F.first("source").alias("source"),
            # order fragments by ordinal inside the collected array —
            # deterministic regardless of arrival partitioning. Each
            # stored fragment carries the canonicalization newline
            # (logger.rs:123); strip it so the merged line has one.
            F.concat(
                F.expr(
                    "concat_ws('', transform(array_sort(collect_list(struct("
                    "partial_meta.ordinal as o, "
                    "regexp_replace(line, '\\n$', '') as l))), x -> x.l))"
                ),
                F.lit("\n"),
            ).alias("line"),
        )
        .drop("__pid")
    )
    return whole.unionByName(merged)
