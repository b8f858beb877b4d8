"""Loaders for the driver-provided testdata tables (TESTDATA.md).

``events.parquet`` carries TIMESTAMP(NANOS) which Spark reads as a
LongType of epoch-nanos under ``spark.sql.legacy.parquet.nanosAsLong``
— exactly the engine's native ``ts_nanos`` representation.

``events_as_logs`` maps the events table onto the engine's logs model
(FIXTURES.md role mapping): ``event_id`` = arrival ``seq``, ``ts`` =
``ts_nanos``, ``user_id`` = ``container_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logsqlite_spark.session import ensure_engine_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        ensure_engine_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

def events_as_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table viewed through the engine's logs schema."""
    e = table(spark, sf_dir, "events")
    return e.select(
        F.col("event_id").alias("seq"),
        F.col("ts").alias("ts_nanos"),
        F.col("user_id").cast("string").alias("container_id"),
        F.col("event_type").alias("source"),
        F.concat(F.col("props"), F.lit("\n")).alias("line"),
        F.col("value"),
    )
